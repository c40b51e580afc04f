"""Bucketed (pre-shuffled) table layout for co-located joins
(SURVEY.md §7.2 milestone 10).

A 100 TB fact⨝fact join (lineitem⨝orders on orderkey) shuffles both
sides every run. Writing both tables bucketed by the join key moves
that shuffle to write time, once: subsequent joins read co-located
buckets and Catalyst plans a shuffle-free sort-merge join.

`bucketize` persists fixture tables into the session's warehouse as
bucketed managed tables; `bucketed_join_plan` demonstrates (and the
plan test asserts) that the resulting join has no Exchange on either
side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a managed table bucketed+sorted by ``key``.

    On a cluster this is the one-time layout job; n_buckets is chosen
    so each bucket is a healthy task size (~128-512 MB) at target
    scale.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    # a crashed prior write can leave the managed location behind with
    # no catalog entry — clear it via the Hadoop FS API
    jvm = spark.sparkContext._jvm
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table}")
    fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    planner produces a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key)
