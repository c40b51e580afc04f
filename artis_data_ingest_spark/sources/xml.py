"""XML corpus ingest — stdlib ``xml.etree`` only.

XML is how the canonical LLM corpora actually arrive: MediaWiki dumps
(``<page><title>…<revision><text>``), sitemaps, RSS/Atom feeds, arXiv
OAI harvests.  This container ships no spark-xml jar, so the mapping
is implemented directly:

  * ``read_xml(spark, dir, row_tag, fields)`` — ``binaryFile`` scan
    (one task per document, same parallelism story as zip/mbox: XML
    has no split points without a format-specific index) →
    Arrow-batched ``mapInPandas`` walks each document with
    ``ElementTree.iterparse`` and emits one row per ``row_tag``
    element.  ``iterparse`` + ``elem.clear()`` keeps memory at
    O(one row element), not O(document) — a multi-GB dump streams.
  * ``fields`` maps output columns to RELATIVE PATHS under the row
    element — ``"title"``, ``"revision/text"``, ``"@id"`` (attribute
    of the row element), ``"revision/@timestamp"`` — resolved
    namespace-insensitively (MediaWiki dumps carry a default
    namespace; requiring callers to spell
    ``{http://…/export-0.11/}title`` would be cruelty).
  * Malformed documents yield zero rows plus a ``_corrupt`` row
    carrying the file name (the PERMISSIVE contract shared with the
    JSONL/media/mailbox sources).

Reference tie-in: the reference scrapes whatever markup its upstreams
publish (html via XPath, sources/html.py); XML row extraction is the
same capability for the dump-shaped half of the web.
"""

from __future__ import annotations

import io
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .files import transparent_decompress

_NS_RE = re.compile(r"\{[^}]*\}")


def _local(tag: str) -> str:
    return _NS_RE.sub("", tag)


def _extract(elem, path: str) -> str | None:
    """Resolve a relative path of local names (+ optional trailing
    ``@attr``) under ``elem``; first match wins."""
    parts = path.split("/")
    attr = None
    if parts[-1].startswith("@"):
        attr = parts[-1][1:]
        parts = parts[:-1]
    cur = [elem]
    for p in parts:
        nxt = []
        for e in cur:
            nxt.extend(c for c in e if _local(c.tag) == p)
        cur = nxt
        if not cur:
            return None
    target = cur[0] if cur else elem if attr else None
    if attr is not None:
        holder = cur[0] if parts else elem
        for k, v in holder.attrib.items():
            if _local(k) == attr:
                return v
        return None
    return target.text if target is not None else None


def parse_xml_rows(
    blob: bytes, row_tag: str, fields: dict[str, str]
) -> tuple[list[dict], bool]:
    """→ (rows, ok).  Streams with iterparse; clears consumed
    elements so memory stays O(row)."""
    import xml.etree.ElementTree as ET

    rows: list[dict] = []
    try:
        root = None
        for event, elem in ET.iterparse(
            io.BytesIO(blob), events=("start", "end")
        ):
            if event == "start":
                if root is None:
                    root = elem
                continue
            if _local(elem.tag) == row_tag:
                rows.append(
                    {col: _extract(elem, path)
                     for col, path in fields.items()}
                )
                elem.clear()
        return rows, True
    except ET.ParseError:
        return rows, False


def read_xml(
    spark: SparkSession,
    in_dir: str,
    row_tag: str,
    fields: dict[str, str],
    glob: str = "*.{xml,xml.gz,xml.bz2,xml.xz}",
) -> DataFrame:
    """One row per ``row_tag`` element across every matching file.
    Output: one string column per ``fields`` key, plus ``_source``
    (file name) and ``_corrupt`` (true on the sentinel row a
    malformed document contributes after its salvageable prefix)."""
    cols = list(fields.keys())
    schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in cols]
        + [T.StructField("_source", T.StringType()),
           T.StructField("_corrupt", T.BooleanType())]
    )
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            out: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                rows, ok = parse_xml_rows(
                    transparent_decompress(bytes(blob)), row_tag,
                    fields,
                )
                for r in rows:
                    r["_source"] = name
                    r["_corrupt"] = False
                    out.append(r)
                if not ok:
                    out.append(
                        {**{c: None for c in cols},
                         "_source": name, "_corrupt": True}
                    )
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out]
                 for f in schema.fields}
            )

    return files.mapInPandas(_parse, schema=schema)
