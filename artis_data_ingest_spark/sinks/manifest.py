"""File-level data-skipping manifest (min/max zone maps per file).

The table-format pattern (Delta/Iceberg manifest files, Parquet footer
zone maps lifted to the planning layer): a 100 TB table is thousands of
files, and a selective range query should not even LIST the files whose
[min, max] envelope can't intersect the predicate — pruning must happen
on metadata before any data file opens. Parquet row-group statistics do
this per-file at read time; a manifest does it at PLAN time, shrinking
the file list itself and composing with hive partition pruning (prune
directories first, then files inside surviving directories).

Pairs with `write_partitioned(sort_cols=...)`: within-file sorting makes
the per-file envelopes tight (disjoint in the sorted column), which is
what turns a min/max manifest from "keeps everything" into "skips
almost everything".

All ops here are metadata-scale by design: the manifest has one row per
FILE (built in one distributed aggregate over `_metadata.file_path`),
and the only ``collect()`` is over that file-count-bounded relation —
the same bounded-metadata class as `dataset_diff`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_manifest(
    spark: SparkSession, path: str, stat_cols: list[str]
) -> DataFrame:
    """One row per data file: row count plus min/max/null-count per
    stat column. A single distributed pass grouped on the hidden
    ``_metadata.file_path`` column — no per-file driver loop, no
    footer parsing; at 100 TB this runs once at write/commit time and
    persists next to the table."""
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in stat_cols:
        aggs += [
            F.min(c).alias(f"min_{c}"),
            F.max(c).alias(f"max_{c}"),
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}"),
        ]
    return (
        df.select(F.col("_metadata.file_path").alias("file"), *stat_cols)
        .groupBy("file")
        .agg(*aggs)
    )


def prune_files(
    manifest: DataFrame, col: str, lo, hi
) -> list[str]:
    """Files whose [min, max] envelope intersects [lo, hi]. A file of
    all-null values has NULL min/max — it cannot satisfy a range
    predicate, so it prunes away (matching parquet zone-map
    semantics). Driver-side collect is bounded by file count."""
    keep = ~(
        (F.col(f"max_{col}") < F.lit(lo))
        | (F.col(f"min_{col}") > F.lit(hi))
    )
    return [
        r.file
        for r in manifest.filter(keep).select("file").collect()
    ]


def read_pruned(
    spark: SparkSession,
    path: str,
    manifest: DataFrame,
    col: str,
    lo,
    hi,
) -> DataFrame:
    """Range scan through the manifest: plan-time file pruning, then
    the residual predicate still applies inside surviving files (the
    envelope test is necessary, not sufficient). Returns an empty
    DataFrame with the table schema when every file prunes."""
    files = prune_files(manifest, col, lo, hi)
    base = spark.read.parquet(path)
    if not files:
        return base.filter(F.lit(False))
    # basePath keeps hive partition-directory columns derivable when
    # reading leaf files directly — without it, partition columns come
    # back NULL on a partitioned layout
    return (
        spark.read.schema(base.schema)
        .option("basePath", path)
        .parquet(*files)
        .filter(F.col(col).between(F.lit(lo), F.lit(hi)))
    )
