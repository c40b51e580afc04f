"""End-to-end snapshot changelog — the reference's flagship pipeline
(``assess_changes.qmd`` entry point 2, SURVEY.md §3.2) rebuilt Spark-
first.

Stages (mirroring qmd chunk order):
  1. inventory both snapshot roots (binaryFile listing, S5-S7)
  2. standardize filename keys (F1-F6)
  3. full-outer align old vs new with existence flags + size deltas
     (J1, assess_changes.qmd:97-114)
  4. pair filter: both present + same data format (P4/P5, qmd:117-123)
  5. deep diff each pair: counts / schema / types (U1, qmd:127-185) —
     driver-orchestrated sub-plans, results unioned into one DataFrame

Stages 1-4 are one lazy plan; stage 5 is a driver loop creating a
sub-plan per file pair (the reference's ``map2(compare_files)``), which
is the right shape because each row *names two datasets* — see
SURVEY.md §7.3 #3.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.files import file_inventory, read_csv_inferred
from .diff import dataset_diff, size_delta, snapshot_align


def file_level_log(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    name_regex: str | None = None,
) -> DataFrame:
    """Stages 1-3: the aligned file-level changelog
    (FIXTURES.md B2 schema)."""
    old = file_inventory(spark, old_dir, name_regex)
    new = file_inventory(spark, new_dir, name_regex)
    aligned = snapshot_align(
        old, new, key="files_std", value_cols=["full_path", "size_mb"]
    )
    return size_delta(aligned, "size_mb_old", "size_mb_new").select(
        "files_std",
        F.col("full_path_new").alias("new"),
        F.col("full_path_old").alias("old"),
        "exists_in_old",
        "exists_in_new",
        F.col("size_mb_old").alias("size_old_mb"),
        F.col("size_mb_new").alias("size_new_mb"),
        "size_change_mb",
    )


def comparable_pairs(log: DataFrame) -> DataFrame:
    """Stage 4 (qmd:117-123): both sides present and format-matched
    (csv-csv or xlsx-xlsx), the P4 compound predicate."""
    csv = lambda c: F.col(c).rlike(r"(?i)\.csv$")  # noqa: E731
    xlsx = lambda c: F.col(c).rlike(r"(?i)\.xlsx?$")  # noqa: E731
    return log.filter(
        F.col("exists_in_old")
        & F.col("exists_in_new")
        & ((csv("old") & csv("new")) | (xlsx("old") & xlsx("new")))
    )


def default_pair_reader(spark: SparkSession, path: str) -> DataFrame:
    """Per-extension dispatch mirroring the reference's ``compare_files``
    reader choice (assess_changes.qmd:127-139): ``fread`` for csv,
    ``read_xlsx(skip = 1)`` for xlsx.  Anything else is a loud error —
    ``comparable_pairs`` only admits csv-csv / xlsx-xlsx pairs, so an
    unknown extension here means a caller bug, not data."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return read_csv_inferred(spark, path)
    if lower.endswith(".xlsx"):
        from ..sources.excel import read_excel

        return read_excel(spark, path, skip_rows=1)
    if lower.endswith(".xls"):
        raise ValueError(
            f"legacy binary .xls is not supported (OOXML .xlsx only): {path!r}"
        )
    raise ValueError(f"no reader for file extension of {path!r}")


def assess_changes(
    spark: SparkSession,
    old_dir: str,
    new_dir: str,
    name_regex: str | None = None,
    reader=None,
) -> tuple[DataFrame, DataFrame]:
    """Full pipeline: returns (file_level_log, pair_diffs).

    ``pair_diffs`` has one row per comparable pair with the full
    dataset_diff struct columns flattened beside the key (the
    reference's ``unnest_wider(comparison)``, qmd:182-185).
    """
    reader = reader or (lambda p: default_pair_reader(spark, p))
    log = file_level_log(spark, old_dir, new_dir, name_regex)
    pairs = comparable_pairs(log).select("files_std", "old", "new").collect()

    diffs = []
    for row in pairs:
        d = dataset_diff(spark, reader(row.old), reader(row.new))
        diffs.append(d.withColumn("files_std", F.lit(row.files_std)))
    if not diffs:
        empty = dataset_diff(
            spark, spark.range(0), spark.range(0)
        ).withColumn("files_std", F.lit(""))
        return log, empty.limit(0)
    pair_diffs = functools.reduce(DataFrame.unionByName, diffs)
    return log, pair_diffs.select("files_std", *[c for c in pair_diffs.columns if c != "files_std"])
