"""Streaming inverted-index maintenance (SURVEY.md §2.10 × §2.11).

The streaming twin of ``plans/retrieval.py:q_index_delta_merge``: a
training corpus doesn't arrive atomically — document files land over
hours — and the retrieval index that backs contamination lookups and
near-dup mining should advance with each arrival, not wait for a
nightly rebuild. This module watches a directory of document parquet
files as a Structured Streaming source and, per micro-batch, builds the
arriving docs' partial index and merges it ALGEBRAICALLY into the
persisted index: disjoint doc sets (each file is ingested exactly once
— the file source's contract) make df and total_tf additive and
postings a sorted disjoint union, so no base text is ever rescanned.

Snapshots land under ``index_path/batch_id=N`` (the idempotent
per-batch layout of ``streaming/sink.py``): a replayed batch overwrites
its own snapshot, never duplicates, and ``current_index`` reads the
highest batch id. Stream == batch parity is pinned by test: the final
snapshot equals the one-shot full build row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.retrieval import merge_indexes, partial_index

_DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def _list_batch_ids(spark: SparkSession, index_path: str) -> list[int]:
    """Committed snapshot batch ids under ``index_path``, discovered
    through the Hadoop FileSystem API — the SAME filesystem Spark
    writes snapshots to.  A driver-local ``pathlib`` probe (the pre-r7
    implementation) silently returns nothing on HDFS/S3 deployments,
    collapsing the maintained index to the latest batch's partial
    index; resolving via ``Path.getFileSystem`` honors the path's
    scheme (file://, hdfs://, s3a://) wherever the job runs."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(index_path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(hpath):
        return []
    ids = []
    for st in fs.listStatus(hpath):
        name = st.getPath().getName()
        if name.startswith("batch_id="):
            ids.append(int(name.split("=", 1)[1]))
    return sorted(ids)


def current_index(
    spark: SparkSession, index_path: str, before: int | None = None
) -> DataFrame | None:
    """Latest committed snapshot, or None before the first batch.

    ``before`` bounds the lookup to batch ids strictly below it — the
    replay guard: when batch N re-runs after a crash, its predecessor
    is the latest snapshot with id < N, NOT batch N's own (possibly
    half-written) snapshot, which would double-count its documents."""
    batches = [
        b
        for b in _list_batch_ids(spark, index_path)
        if before is None or b < before
    ]
    if not batches:
        return None
    return spark.read.parquet(f"{index_path}/batch_id={batches[-1]}")


def stream_index_maintenance(
    spark: SparkSession,
    docs_dir: str,
    index_path: str,
    checkpoint: str,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the incremental index maintainer.

    Per micro-batch: partial-index the arriving documents, merge with
    the previous snapshot (one term-keyed shuffle — the index is
    vocabulary-bounded, far smaller than the corpus), and write the new
    snapshot under ``batch_id=N``. ``trigger_once`` (availableNow) is
    the scheduled-incremental mode; the checkpoint carries progress so
    the next run only sees newly landed files.
    """
    stream = (
        spark.readStream.schema(_DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(docs_dir)
    )

    def _advance(batch_df: DataFrame, batch_id: int) -> None:
        part = partial_index(batch_df)
        prev = current_index(spark, index_path, before=batch_id)
        merged = part if prev is None else merge_indexes(prev, part)
        merged.write.mode("overwrite").parquet(
            f"{index_path}/batch_id={batch_id}"
        )

    w = (
        stream.writeStream.foreachBatch(_advance)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()
