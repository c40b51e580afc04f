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
