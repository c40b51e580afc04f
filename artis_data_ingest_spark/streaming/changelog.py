"""Incremental file-arrival changelog (SURVEY.md §2.10 × §3.2): the
reference's snapshot diff (``assess_changes.qmd:82-114``) driven by a
STREAMING file source instead of a one-shot directory listing.

A 100 TB ingest doesn't receive the new snapshot atomically — files
land over hours.  This module watches the new-snapshot directory as a
Structured Streaming ``binaryFile`` source (checkpointed, so restarts
resume where they left off) and, per micro-batch, standardizes the
arriving file names and aligns them against the OLD snapshot's static
inventory — the same key chain (F1-F6) and align semantics (J1) as the
batch ``file_level_log``, reusing those operators inside
``foreachBatch``.  Each batch's rows land in the idempotent per-batch
parquet sink (replays overwrite, never duplicate).

Statuses emitted incrementally: ``added`` (no old-side match) and
``changed``/``unchanged`` (old-side match, by size delta).  ``removed``
is not knowable from arrivals — an old file is only known missing when
the stream is done — so ``removed_files`` is the end-of-stream
reconciliation: the old inventory anti-joined against everything the
sink accumulated.  Batch/stream parity is pinned by test: sink rows +
reconciliation == the batch ``file_level_log`` verdict row-for-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.strings import basename, standardize_key
from ..sources.files import file_inventory
from .sink import batch_writer

_BINARYFILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _arrivals_inventory(batch_df: DataFrame) -> DataFrame:
    """The arriving micro-batch as an inventory table — same derivation
    as ``sources.files.file_inventory`` (basename, size_mb,
    standardized key) so stream and batch keys align exactly."""
    return batch_df.select(
        F.col("path").alias("full_path"),
        basename("path").alias("files"),
        (F.col("length") / 1e6).alias("size_mb"),
        standardize_key("path").alias("files_std"),
    )


def stream_file_changes(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    out_path: str,
    checkpoint: str,
    name_regex: str | None = None,
    max_files_per_trigger: int = 1,
    trigger_once: bool = True,
):
    """Start the incremental changelog stream.

    Per micro-batch: arriving new-snapshot files left-join the static
    old inventory on ``files_std`` (the old side is a file-listing
    table — metadata-small at any data scale, so Catalyst broadcasts
    it) and the verdict rows are written idempotently under
    ``out_path/batch_id=N``.  ``max_files_per_trigger`` bounds batch
    size; ``trigger_once`` (availableNow) is the scheduled-incremental
    mode — the checkpoint carries progress across runs, so the next
    invocation processes only files that arrived since.
    """
    old_inv = file_inventory(spark, old_dir, name_regex).select(
        "files_std",
        F.col("full_path").alias("old"),
        F.col("size_mb").alias("size_old_mb"),
    )
    reader = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    stream = reader.load(new_dir)
    write_batch = batch_writer(out_path)

    def _assess(batch_df: DataFrame, batch_id: int) -> None:
        inv = _arrivals_inventory(batch_df)
        if name_regex:
            inv = inv.filter(F.col("files").rlike(name_regex))
        log = (
            inv.join(F.broadcast(old_inv), on="files_std", how="left")
            .select(
                "files_std",
                F.col("full_path").alias("new"),
                "old",
                F.col("old").isNotNull().alias("exists_in_old"),
                F.lit(True).alias("exists_in_new"),
                "size_old_mb",
                F.col("size_mb").alias("size_new_mb"),
                F.when(
                    F.col("old").isNotNull(),
                    F.col("size_mb") - F.col("size_old_mb"),
                )
                .otherwise(F.lit(None).cast("double"))
                .alias("size_change_mb"),
            )
            .withColumn(
                "status",
                F.when(~F.col("exists_in_old"), "added")
                .when(F.col("size_change_mb") != 0.0, "changed")
                .otherwise("unchanged"),
            )
        )
        write_batch(log, batch_id)

    w = (
        stream.writeStream.foreachBatch(_assess)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def removed_files(
    spark: SparkSession,
    old_dir: str,
    out_path: str,
    name_regex: str | None = None,
) -> DataFrame:
    """End-of-stream reconciliation: old-snapshot files never seen by
    the stream — the ``exists_in_new = false`` rows of the batch
    changelog, with the same column layout so the union of sink +
    reconciliation reproduces ``file_level_log`` exactly."""
    old_inv = file_inventory(spark, old_dir, name_regex)
    try:
        seen = spark.read.parquet(out_path).select("files_std").distinct()
    except Exception:
        # no batch has landed yet (sink path absent): every old-side
        # file is, as of now, unseen — the correct degenerate verdict
        seen = spark.createDataFrame([], "files_std string")
    return (
        old_inv.join(seen, on="files_std", how="left_anti")
        .select(
            "files_std",
            F.lit(None).cast("string").alias("new"),
            F.col("full_path").alias("old"),
            F.lit(True).alias("exists_in_old"),
            F.lit(False).alias("exists_in_new"),
            F.col("size_mb").alias("size_old_mb"),
            F.lit(None).cast("double").alias("size_new_mb"),
            F.lit(None).cast("double").alias("size_change_mb"),
            F.lit("removed").alias("status"),
        )
    )
