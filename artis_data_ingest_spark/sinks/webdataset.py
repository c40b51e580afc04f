"""WebDataset-style tar-shard corpus sink + source (SURVEY.md §2.11).

WebDataset (tar shards whose members group by a common key stem —
``{key}.txt``, ``{key}.json``, ``{key}.jpg`` …) is the de-facto
interchange layout for large multimodal training corpora: a plain tar
streams sequentially (no random-access penalty on object stores), and
the SHARD is the unit of parallelism for both writers and readers.

Spark mapping:
  * write — docs get a deterministic ``shard = doc_id // docs_per_shard``,
    one ``repartition`` on the shard id co-locates each shard's rows,
    and ``foreachPartition`` streams one ``shard-NNNNN.tar`` per shard
    with stdlib ``tarfile`` (members sorted by key, zeroed mtime/uid —
    byte-deterministic output).  Writes land under ``_tmp-`` names and
    rename into place, so a killed task never leaves a torn shard
    visible; the driver stamps ``_SUCCESS`` last.
  * read — ``binaryFile`` scan of ``*.tar`` (one row per shard: the
    format's own parallelism unit, same story as the zip source) →
    Arrow-batched ``mapInPandas`` untars members and regroups them by
    key stem into one row per document.

At 100 TB nothing here is driver-bound: shard count scales the write
and the read, and each task holds ONE shard in memory (size it with
``docs_per_shard`` upstream).
"""

from __future__ import annotations

import io
import json
import os
import tarfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WDS_DOC_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        # multimodal members ({key}.jpg, {key}.wav, ...) surfaced by
        # extension; empty map for text-only shards
        T.StructField(
            "extras", T.MapType(T.StringType(), T.BinaryType())
        ),
    ]
)


def write_webdataset(
    docs: DataFrame,
    out_dir: str,
    docs_per_shard: int = 100,
    binary_cols: tuple[str, ...] = (),
) -> int:
    """Write ``(doc_id, text, lang, source)`` rows as WebDataset tar
    shards under ``out_dir``; returns the shard count.  Deterministic:
    member order is sorted by doc_id, tar metadata is zeroed, and the
    shard assignment is pure arithmetic on doc_id — two runs produce
    byte-identical shards.

    ``binary_cols`` names binary columns written as ``{key}.{col}``
    members next to the text/json pair — the WebDataset multimodal
    convention (a .jpg/.wav payload traveling WITH its caption in the
    same sequentially-readable shard, so training readers never do a
    second lookup)."""
    # exact integer FLOOR division, matching the documented
    # ``doc_id // docs_per_shard`` semantics: double division + cast
    # loses precision above 2^53 and truncates toward zero for negative
    # ids (yielding malformed 'shard--0001' names).  Spark's ``div`` is
    # truncating, so correct it by 1 when a negative id leaves a
    # remainder — all-bigint, no doubles anywhere.
    n = int(docs_per_shard)
    shard_col = F.expr(
        f"(doc_id div {n}) - CASE WHEN doc_id % {n} < 0 THEN 1 ELSE 0 END"
    ).cast("bigint")
    prepared = docs.select(
        shard_col.alias("shard"), "doc_id", "text", "lang", "source",
        *binary_cols,
    ).repartition("shard")
    os.makedirs(out_dir, exist_ok=True)
    n_shards = prepared.select("shard").distinct().count()

    def _write(rows) -> None:
        by_shard: dict[int, list] = {}
        for r in rows:
            by_shard.setdefault(int(r["shard"]), []).append(r)
        for shard, members in by_shard.items():
            buf = io.BytesIO()
            with tarfile.open(fileobj=buf, mode="w") as tar:
                for r in sorted(members, key=lambda x: int(x["doc_id"])):
                    key = f"{int(r['doc_id']):08d}"
                    txt = (r["text"] or "").encode()
                    meta = json.dumps(
                        {"lang": r["lang"], "source": r["source"]},
                        sort_keys=True,
                    ).encode()
                    members_out = [
                        (f"{key}.txt", txt),
                        (f"{key}.json", meta),
                    ]
                    for col in binary_cols:
                        if r[col] is not None:
                            members_out.append(
                                (f"{key}.{col}", bytes(r[col]))
                            )
                    for name, payload in members_out:
                        info = tarfile.TarInfo(name=name)
                        info.size = len(payload)
                        info.mtime = 0
                        tar.addfile(info, io.BytesIO(payload))
            final = os.path.join(out_dir, f"shard-{shard:05d}.tar")
            tmp = os.path.join(out_dir, f"_tmp-shard-{shard:05d}.tar")
            with open(tmp, "wb") as f:
                f.write(buf.getvalue())
            os.replace(tmp, final)  # atomic: no torn shard visible

    prepared.foreachPartition(_write)
    # driver stamps completion AFTER every task finished
    with open(os.path.join(out_dir, "_SUCCESS"), "w"):
        pass
    return n_shards


def read_webdataset(spark: SparkSession, in_dir: str) -> DataFrame:
    """One row per document from a directory of WebDataset tar shards:
    binaryFile scan (one task per shard) → stdlib untar → member
    regroup by key stem.  Non-text member extensions (.jpg, .wav, …)
    surface in the ``extras`` map as raw bytes — the multimodal payload
    rides the same row as its caption; a key missing ``.txt`` yields a
    null text rather than a dropped row."""

    tars = spark.read.format("binaryFile").load(
        os.path.join(in_dir, "*.tar")
    )

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                shard = path.rsplit("/", 1)[-1]
                docs: dict[str, dict] = {}
                with tarfile.open(
                    fileobj=io.BytesIO(bytes(blob)), mode="r"
                ) as tar:
                    for m in tar.getmembers():
                        if not m.isfile():
                            continue
                        stem, dot, ext = m.name.rpartition(".")
                        if not dot:
                            continue
                        payload = tar.extractfile(m).read()
                        slot = docs.setdefault(stem, {"extras": {}})
                        if ext == "txt":
                            slot["text"] = payload.decode()
                        elif ext == "json":
                            slot.update(json.loads(payload))
                        else:
                            slot["extras"][ext] = payload
                for stem, d in sorted(docs.items()):
                    recs.append(
                        (
                            shard,
                            int(stem),
                            d.get("text"),
                            d.get("lang"),
                            d.get("source"),
                            d["extras"],
                        )
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "shard", "doc_id", "text", "lang", "source", "extras",
                ],
            )

    return tars.select("path", "content").mapInPandas(
        _parse, WDS_DOC_SCHEMA
    )
