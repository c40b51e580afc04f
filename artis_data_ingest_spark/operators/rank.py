"""Distributed global ranking without a single-partition exchange.

``Window.orderBy(...)`` with no partition key is the classic Spark
scale-killer: every row funnels through ONE reducer.  The scalable
construction (the terasort recipe applied to ranking):

  1. ``repartitionByRange`` on the order key — a sampled range
     partitioner; equal keys always land in the same partition, so
     per-partition key sets are disjoint and ordered between
     partitions;
  2. one bounded job counts the DISTINCT keys per partition
     (collect is bounded by the partition count, not the data);
  3. dense_rank within each partition (windowed by the partition id)
     plus the cumulative offset of earlier partitions.

The result is bit-identical to the global window dense_rank (pinned by
test) while the biggest exchange anywhere is the range shuffle itself.
Cost: two shuffles (range + pid-hash for the window) and one bounded
count job.  This primitive is what corpus-global ordering problems
(global suffix-array doubling, corpus-wide score ranking) need where
the repo's group-bounded windows don't apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def distributed_dense_rank(
    df: DataFrame,
    order_cols: list[str],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append bigint ``out`` = global dense rank of ``order_cols``
    (ascending, nulls first per Spark default) without any
    single-partition exchange."""
    sess = df.sparkSession
    n_parts = num_partitions or sess.sparkContext.defaultParallelism
    # localCheckpoint pins ONE sampled range partitioning: the bounds
    # job and the ranking job must see the SAME boundaries (range
    # partitioning re-samples per job otherwise — offsets would be
    # computed against a different partitioning than they're applied to)
    rp = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_ddr_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    # bounded: one row per partition.  countDistinct over the bare
    # columns would SKIP tuples containing any NULL (SQL COUNT DISTINCT
    # semantics), dropping the nulls-first group from the cumulative
    # offsets; wrapping in struct() makes the tuple itself non-null so
    # null-keyed groups are counted exactly like the window dense_rank
    # sees them.
    counts = (
        rp.groupBy("_ddr_pid")
        .agg(F.countDistinct(F.struct(*order_cols)).alias("c"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(counts, key=lambda r: r["_ddr_pid"]):
        offsets[row["_ddr_pid"]] = acc
        acc += row["c"]
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "_ddr_pid int, _ddr_off bigint",
        )
    )
    w = Window.partitionBy("_ddr_pid").orderBy(*order_cols)
    return (
        rp.join(off_df, "_ddr_pid")
        .withColumn(
            out,
            (F.dense_rank().over(w).cast("bigint") + F.col("_ddr_off")),
        )
        .drop("_ddr_pid", "_ddr_off")
    )


def distributed_running_sum(
    df: DataFrame,
    order_cols: list[str],
    val_col: str,
    out: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append bigint ``out`` = inclusive running sum of ``val_col`` in
    global ``order_cols`` order, without any single-partition exchange
    — the same terasort recipe as ``distributed_dense_rank``: one
    pinned range partitioning, a bounded per-partition-total collect,
    and a within-partition window plus broadcast offsets.  This is
    what global-order prefix-sum problems (sequence packing over one
    corpus-wide order, global quantile assignment) need where
    ``Window.orderBy`` with no partition key funnels every row through
    ONE reducer."""
    sess = df.sparkSession
    n_parts = num_partitions or sess.sparkContext.defaultParallelism
    rp = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("_drs_pid", F.spark_partition_id())
        .localCheckpoint()
    )
    totals = (
        rp.groupBy("_drs_pid")
        .agg(F.sum(F.col(val_col).cast("bigint")).alias("s"))
        .collect()
    )
    offsets = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_drs_pid"]):
        offsets[row["_drs_pid"]] = acc
        acc += row["s"] or 0
    off_df = F.broadcast(
        sess.createDataFrame(
            [(pid, off) for pid, off in offsets.items()],
            "_drs_pid int, _drs_off bigint",
        )
    )
    w = (
        Window.partitionBy("_drs_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rp.join(off_df, "_drs_pid")
        .withColumn(
            out,
            F.sum(F.col(val_col).cast("bigint")).over(w) + F.col("_drs_off"),
        )
        .drop("_drs_pid", "_drs_off")
    )
