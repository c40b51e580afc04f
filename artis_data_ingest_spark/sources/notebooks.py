"""Jupyter notebook (.ipynb) corpus ingest — stdlib json only.

Notebooks are a staple of CODE-model pretraining (the GitHub corpus
is full of them) and arrive as nbformat-4 JSON: a ``cells`` list
where each cell has ``cell_type`` (code / markdown / raw),
``source`` (a string OR a list of line strings — both spellings are
legal and both appear in the wild), code cells an
``execution_count`` and an ``outputs`` list (which training
pipelines usually DROP — outputs are huge, noisy, and often contain
PII-bearing tracebacks), plus notebook-level ``metadata`` naming the
kernel/language.

Spark mapping: ``binaryFile`` scan of ``*.ipynb`` → Arrow-batched
``mapInPandas`` → one row per CELL in document order, with the
flattened source, line/char counts, an output count (so a curation
policy can keep or drop executed cells), and the notebook's language.
Malformed JSON yields one ``_corrupt`` row per file (the PERMISSIVE
contract shared with JSONL/XML/mbox/EPUB).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .files import transparent_decompress

NOTEBOOK_SCHEMA = T.StructType([
    T.StructField("notebook", T.StringType()),
    T.StructField("language", T.StringType()),
    T.StructField("cell_pos", T.LongType()),
    T.StructField("cell_type", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_lines", T.LongType()),
    T.StructField("n_chars", T.LongType()),
    T.StructField("n_outputs", T.LongType()),
    T.StructField("execution_count", T.LongType()),
    T.StructField("_corrupt", T.BooleanType()),
])


def _flatten_source(src) -> str:
    # nbformat allows both "line1\nline2" and ["line1\n", "line2"]
    if isinstance(src, list):
        return "".join(str(s) for s in src)
    return str(src or "")


def parse_notebook(blob: bytes) -> list[dict]:
    nb = json.loads(blob.decode("utf-8"))
    lang = (
        (nb.get("metadata") or {})
        .get("language_info", {})
        .get("name")
    ) or (
        (nb.get("metadata") or {})
        .get("kernelspec", {})
        .get("language")
    )
    rows = []
    for pos, cell in enumerate(nb.get("cells") or [], 1):
        src = _flatten_source(cell.get("source"))
        ec = cell.get("execution_count")
        rows.append({
            "language": lang,
            "cell_pos": pos,
            "cell_type": str(cell.get("cell_type") or "unknown"),
            "source": src,
            "n_lines": src.count("\n") + (1 if src else 0),
            "n_chars": len(src),
            "n_outputs": len(cell.get("outputs") or []),
            "execution_count": int(ec) if ec is not None else None,
            "_corrupt": False,
        })
    return rows


def read_notebooks(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per cell across every ``*.ipynb`` under ``in_dir``."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter",
                "*.{ipynb,ipynb.gz,ipynb.bz2,ipynb.xz}")
        .load(in_dir)
        .select("path", "content")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        for pdf in batches:
            out: list[dict] = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = os.path.basename(path)
                try:
                    for row in parse_notebook(
                        transparent_decompress(bytes(blob))
                    ):
                        row["notebook"] = name
                        out.append(row)
                except Exception:
                    out.append({
                        "notebook": name, "language": None,
                        "cell_pos": None, "cell_type": None,
                        "source": None, "n_lines": None,
                        "n_chars": None, "n_outputs": None,
                        "execution_count": None, "_corrupt": True,
                    })
            yield pd.DataFrame(
                {f.name: [r.get(f.name) for r in out]
                 for f in NOTEBOOK_SCHEMA.fields}
            )

    return files.mapInPandas(_parse, schema=NOTEBOOK_SCHEMA)
