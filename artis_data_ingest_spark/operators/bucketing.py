"""Bucketed (pre-shuffled) table layout for co-located joins
(SURVEY.md §7.2 milestone 10).

A 100 TB fact⨝fact join (lineitem⨝orders on orderkey) shuffles both
sides every run. Writing both tables bucketed by the join key moves
that shuffle to write time, once: subsequent joins read co-located
buckets and Catalyst plans a shuffle-free sort-merge join, and
aggregations on the bucket key skip their exchange too.

`bucketize` persists tables as bucketed managed (or external, via
``path``) tables; `bucketed_join` demonstrates (and the plan tests
assert) that the resulting join has no Exchange on either side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def bucketize(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str | Sequence[str],
    n_buckets: int = 8,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a table bucketed+sorted by ``key`` (one or
    more columns).

    On a cluster this is the one-time layout job; n_buckets is chosen
    so each bucket is a healthy task size (~128-512 MB) at target
    scale. The pre-write ``repartition(n_buckets, keys)`` aligns task
    partitioning with bucket assignment (both hash the key columns),
    so each task writes exactly one bucket → one file per bucket
    instead of ``tasks × buckets`` fragments — the small-files failure
    mode that kills file listing at scale. ``path`` makes the table
    external (data at that location) instead of managed.
    """
    keys = [key] if isinstance(key, str) else list(key)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    if path is None:
        # a crashed prior write can leave the managed location behind
        # with no catalog entry — clear it via the Hadoop FS API
        jvm = spark.sparkContext._jvm
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        loc = jvm.org.apache.hadoop.fs.Path(f"{warehouse}/{table}")
        fs = loc.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        if fs.exists(loc):
            fs.delete(loc, True)
    writer = (
        df.repartition(n_buckets, *keys)
        .write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key —
    planner produces a shuffle-free sort-merge join."""
    return spark.table(left_table).join(spark.table(right_table), key)
