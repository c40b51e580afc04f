"""Streaming → parquet sink via foreachBatch (SURVEY.md §2.10).

Structured Streaming's parquet sink is append-only; production
pipelines use ``foreachBatch`` for idempotent replays: each micro-batch
writes (overwrite) into its own ``batch_id=N`` directory, so a batch
replayed after a failure rewrites the same directory instead of
duplicating rows — exactly-once table output on top of at-least-once
delivery, with the checkpoint carrying the batch progression.

Readers get the batch id as a normal hive partition column (pruneable),
and a compaction job can fold old batch directories into date
partitions with ``sinks/parquet.write_partitioned``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def batch_writer(path: str):
    """foreachBatch callback: idempotent per-batch overwrite."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{path}/batch_id={batch_id}"
        )

    return _write


def start_parquet_stream(
    stream_df: DataFrame,
    path: str,
    checkpoint: str,
    trigger_once: bool = True,
):
    """Wire a streaming DataFrame to the idempotent parquet sink.
    ``trigger_once`` processes all available input then stops — the
    batch-incremental mode a scheduled 100 TB ingest job runs in."""
    w = (
        stream_df.writeStream.foreachBatch(batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_once:
        w = w.trigger(availableNow=True)
    return w.start()


def compact_batches(
    spark,
    src: str,
    dst: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Fold the sink's accumulated ``batch_id=N`` directories into a
    properly partitioned table (the compaction job the docstring above
    promises): read everything, drop the ingestion-batch column, and
    rewrite via the partitioned writer. Run on a schedule, this bounds
    small-file growth from frequent micro-batches; the sink keeps
    accepting new batches into ``src`` meanwhile, and the next
    compaction run picks them up (overwrite keeps the job idempotent).
    """
    from ..sinks.parquet import write_partitioned

    df = spark.read.parquet(src).drop("batch_id")
    write_partitioned(df, dst, partition_cols, sort_cols=sort_cols)
