"""Partitioned parquet writer (SURVEY.md §7.2 milestone 10 — scale
hardening). The reference's only persistent outputs are downloaded raw
files and rendered reports; a 100 TB engine needs a real table sink:

  * hive-style partition layout so readers get partition pruning for
    free (`PartitionFilters` in the scan, only matching dirs listed);
  * small-file control: repartition by the partition columns before the
    write so each partition directory gets ~1 file per shuffle slot
    instead of `num_tasks × num_partitions` fragments, plus an optional
    `maxRecordsPerFile` cap for the opposite (giant-file) failure mode;
  * optional within-file sort to improve parquet min/max zone-map
    filtering on high-selectivity columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    files_per_partition: int = 1,
    sort_cols: list[str] | None = None,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as a hive-partitioned parquet table.

    Hash-repartitioning on the partition columns sends each directory's
    rows to exactly one task → exactly one file per directory. For hot
    partitions that would make one giant file, ``files_per_partition``
    adds a deterministic salt (hash of the data columns) to the shuffle
    key, splitting each directory across that many writer tasks.
    ``sort_cols`` adds a sortWithinPartitions so parquet row-group
    min/max statistics are tight for zone-map skipping on read.
    """
    keys = [F.col(c) for c in partition_cols]
    if files_per_partition > 1:
        data_cols = [c for c in df.columns if c not in partition_cols]
        keys.append(
            F.pmod(
                F.hash(*[F.col(c) for c in data_cols]),
                F.lit(files_per_partition),
            )
        )
        # pin the partition count: an unnumbered repartition lets AQE
        # coalesce small shuffles back to one task, merging the salted
        # splits we just asked for
        n = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
        out = df.repartition(n, *keys)
    elif keys:
        out = df.repartition(*keys)
    else:
        out = df
    if sort_cols:
        out = out.sortWithinPartitions(*partition_cols, *sort_cols)
    writer = out.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; filters on partition columns prune
    directories before any data file is opened (basePath inference is
    automatic for hive-style layouts)."""
    return spark.read.parquet(path)
