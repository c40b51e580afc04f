"""Single-pass data-quality observation: piggyback DQ counters on a
query's own action via ``DataFrame.observe`` so profiling a 100 TB scan
costs ZERO extra passes — the metrics ride the rows the job reads
anyway, aggregated on the executors and delivered to the driver as a
listener event.

This is the scale companion to q_dq_report (a dedicated profiling
query): q_dq_report answers "profile this table", observe answers
"while you run the real job, also tell me what flowed through".  The
reference's equivalent is the row-count/`nrow` accounting sprinkled
through assess_changes.qmd:145-147 — done there with extra passes over
each table; Spark's observation API folds it into the existing one.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def with_dq_observation(
    df: DataFrame,
    name: str = "dq",
    null_cols: Sequence[str] = (),
    nonpos_cols: Sequence[str] = (),
    distinct_cols: Sequence[str] = (),
) -> tuple[DataFrame, Observation]:
    """Attach row-count / null-count / non-positive-count /
    approx-distinct observations to ``df``.

    Returns ``(observed_df, observation)``; run any action on a plan
    built from ``observed_df``, then read ``observation.get`` (blocks
    until the action finishes).  Only aggregates Spark can compute as
    running executor-side accumulators are allowed (no sorts, no
    distinct — approx_count_distinct is the sketch-backed stand-in).
    """
    metrics = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}")
        )
    for c in nonpos_cols:
        metrics.append(
            F.sum((F.col(c) <= 0).cast("bigint")).alias(f"nonpos_{c}")
        )
    for c in distinct_cols:
        metrics.append(
            F.approx_count_distinct(c).alias(f"approx_distinct_{c}")
        )
    obs = Observation(name)
    return df.observe(obs, *metrics), obs


def partition_profile(df: DataFrame) -> DataFrame:
    """Skew diagnostic: one row per physical partition with its row
    count — the first thing to look at when a stage straggles.  The
    profile is partition-count-bounded (a 100 TB table with 100k
    partitions yields 100k rows), and computing it is one map-side
    count per partition plus a tiny shuffle of the per-partition rows.
    Read it next to ``spark.sql.files.maxPartitionBytes`` and the
    shuffle-partition setting: a heavy tail here means salting or AQE
    skew handling before the next join/agg.
    """
    return (
        df.withColumn("_pp_pid", F.spark_partition_id())
        .groupBy("_pp_pid")
        .count()
        .select(
            F.col("_pp_pid").alias("partition_id"),
            F.col("count").alias("n_rows"),
        )
    )
