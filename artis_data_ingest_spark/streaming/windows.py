"""Structured Streaming layer (SURVEY.md §2.10 — north-star extension;
the reference has no streaming constructs, its closest analog being
version-over-version batch diffing).

Design: each streaming aggregation is the *same* logical transformation
as its batch twin in ``plans/events_time.py`` — one function builds the
aggregation, and either a batch DataFrame or a readStream DataFrame
flows through it. That guarantees the batch-mode oracle checks validate
the exact logic the stream runs, and Structured Streaming's incremental
execution of the identical plan is what Spark itself guarantees.

Watermarking: ``with_watermark`` bounds state for late data; events
later than the watermark are dropped (late-data policy of the driver's
north star). ``dedup_stream`` uses dropDuplicatesWithinWatermark —
streaming exact-dedup with bounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, width: str = "10 minutes") -> DataFrame:
    """Tumbling-window count/sum — works on batch and streaming inputs."""
    return (
        events.groupBy(F.window("ts", width).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame, width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    return (
        events.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def with_watermark(events: DataFrame, delay: str = "15 minutes") -> DataFrame:
    """Event-time watermark: bounds aggregation state and defines the
    late-data drop point. No-op on batch DataFrames (batch has no state
    to bound), so the same pipeline definition serves both modes."""
    return events.withWatermark("ts", delay)


def dedup_stream(events: DataFrame, keys: list[str], delay: str = "15 minutes") -> DataFrame:
    """Streaming exact-dedup with bounded state: duplicates arriving
    within the watermark horizon are dropped; state for older keys is
    reclaimed. (Batch twin: dropDuplicates.)"""
    if events.isStreaming:
        return events.withWatermark("ts", delay).dropDuplicatesWithinWatermark(keys)
    return events.dropDuplicates(keys)


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, mode: str = "update"
):
    """Wire a windowed aggregation to an in-memory sink for tests/demos.
    Returns the StreamingQuery; caller awaits + stops it."""
    return (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(mode)
        .start()
    )


def interval_join_streams(
    purchases: DataFrame,
    clicks: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: each purchase
    joins the same user's clicks in the preceding ``max_gap``. Both
    sides carry watermarks and the join condition bounds event time on
    both sides, so Spark can expire join state — the requirement for an
    unbounded stream-stream join to run with finite memory. Works
    identically on batch inputs (watermarks are no-ops there).
    """
    p = purchases.select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    ).withWatermark("p_ts", watermark)
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("c_ts"),
        F.col("value").alias("click_value"),
    ).withWatermark("c_ts", watermark)
    return p.join(
        c,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {max_gap}")),
    ).select("p_id", "p_user", "p_ts", "c_ts", "click_value")


def enrich_with_dim(stream: DataFrame, dim: DataFrame, key: str) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins the static
    dimension; no stream state is kept (the static side is re-resolved
    per batch, so a dim refresh is picked up on the next trigger). The
    dimension is marked broadcast — at 100 TB of stream this is the
    only sane shape: the fact micro-batch never shuffles, each executor
    streams rows past a hashed copy of the dim. Works identically on a
    batch input for oracle twinning.
    """
    return stream.join(F.broadcast(dim), on=key, how="left")
