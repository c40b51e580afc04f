"""Snapshot-diff operators — the reference's core capability.

The reference aligns two directory snapshots of files by a standardized
name key, flags presence on each side, computes size deltas, then deep-
diffs each aligned pair at row-count/schema/type level
(``assess_changes.qmd:82-185``). Here that becomes:

  * ``union_tag``        — E2: tagged UNION ALL of two listings
  * ``snapshot_align``   — J1: full-outer join on the standardized key
                           (the reference spells it ``pivot_wider``)
  * ``pivot_align``      — J1 literal form: groupBy().pivot().agg(first)
  * ``dataset_diff``     — U1: driver-orchestrated metadata diff of two
                           DataFrames (counts, added/removed columns,
                           per-column type changes) emitted as a 1-row
                           DataFrame with array/struct columns

Scale notes: `snapshot_align` joins two *file-listing* tables — small
even when the data they point at is 100 TB — so Catalyst broadcast
handles them. ``dataset_diff`` triggers two ``count()`` jobs (full
scans); everything else it reads is schema metadata, free at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def union_tag(
    new_df: DataFrame, old_df: DataFrame, tag_col: str = "directory"
) -> DataFrame:
    """E2 — union with provenance tag (assess_changes.qmd:82-86):
    ``tibble(files = c(new, old), directory = rep(c("new","old")))``."""
    return new_df.withColumn(tag_col, F.lit("new")).unionByName(
        old_df.withColumn(tag_col, F.lit("old"))
    )


def snapshot_align(
    old_df: DataFrame,
    new_df: DataFrame,
    key: str,
    value_cols: list[str] | None = None,
) -> DataFrame:
    """J1 — align old vs new rows per key; absent side → NULL.

    Idiomatic-Spark form of the reference's ``pivot_wider(id_cols =
    files_std, names_from = directory, values_from = full_path)``
    (assess_changes.qmd:97-103) plus the existence flags of
    ``:104-106``: a full-outer join keeps Catalyst free to pick
    broadcast/SMJ and needs no wide shuffle of a stacked table.
    """
    value_cols = value_cols or [c for c in old_df.columns if c != key]
    o = old_df.select(key, *[F.col(c).alias(f"{c}_old") for c in value_cols])
    n = new_df.select(key, *[F.col(c).alias(f"{c}_new") for c in value_cols])
    probe = value_cols[0]
    return (
        o.join(n, on=key, how="full_outer")
        .withColumn("exists_in_old", F.col(f"{probe}_old").isNotNull())
        .withColumn("exists_in_new", F.col(f"{probe}_new").isNotNull())
    )


def pivot_align(
    stacked: DataFrame,
    key: str,
    tag_col: str = "directory",
    value_col: str = "full_path",
    tags: tuple[str, str] = ("new", "old"),
) -> DataFrame:
    """J1 literal form — ``groupBy(key).pivot(directory).agg(first)``.

    The reference's pivot silently assumes one value per (key, tag)
    cell (SURVEY.md §4.3 trap: R would emit list-cols on dupes, Spark
    ``first`` silently picks one). We use ``max`` instead of ``first``
    so the result is deterministic even on dirty input.
    """
    return (
        stacked.groupBy(key)
        .pivot(tag_col, list(tags))
        .agg(F.max(value_col))
    )


def size_delta(aligned: DataFrame, size_old: str, size_new: str) -> DataFrame:
    """Size-delta annotation (assess_changes.qmd:107-114): sizes only
    where the side exists, delta only where both do (P11 conditionals).
    """
    both = F.col("exists_in_old") & F.col("exists_in_new")
    return aligned.withColumn(
        "size_change_mb",
        F.when(both, F.col(size_new) - F.col(size_old)).otherwise(
            F.lit(None).cast("double")
        ),
    )


_DATASET_DIFF_SCHEMA = T.StructType(
    [
        T.StructField("nrow_old", T.LongType()),
        T.StructField("nrow_new", T.LongType()),
        T.StructField("row_diff", T.LongType()),
        T.StructField("ncol_old", T.IntegerType()),
        T.StructField("ncol_new", T.IntegerType()),
        T.StructField("added_cols", T.ArrayType(T.StringType())),
        T.StructField("removed_cols", T.ArrayType(T.StringType())),
        T.StructField(
            "type_changes",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("column", T.StringType()),
                        T.StructField("old_type", T.StringType()),
                        T.StructField("new_type", T.StringType()),
                    ]
                )
            ),
        ),
    ]
)


def dataset_diff(
    spark: SparkSession, old_df: DataFrame, new_df: DataFrame
) -> DataFrame:
    """U1 — ``compare_files`` (assess_changes.qmd:127-176) as a
    driver-orchestrated metadata op, NOT a UDF (SURVEY.md §7.3 #3):
    each comparison names two *datasets*, so schema introspection is
    driver-side metadata and only the row counts touch data.

    Returns a 1-row DataFrame mirroring the reference's named list:
    row counts/diff (qmd:145-147), added/removed columns via set
    difference of names (qmd:151-158), and the nested per-column
    type-change table (qmd:160-174) as ``array<struct>``.
    """
    old_types = dict(old_df.dtypes)
    new_types = dict(new_df.dtypes)
    added = sorted(set(new_types) - set(old_types))
    removed = sorted(set(old_types) - set(new_types))
    common = sorted(set(old_types) & set(new_types))
    type_changes = [
        {"column": c, "old_type": old_types[c], "new_type": new_types[c]}
        for c in common
        if old_types[c] != new_types[c]
    ]
    # The two counts are the only data-touching actions; at 100 TB both
    # are metadata-only for Parquet (row-group counts), which Spark
    # serves without reading data pages.
    nrow_old, nrow_new = old_df.count(), new_df.count()
    row = {
        "nrow_old": nrow_old,
        "nrow_new": nrow_new,
        "row_diff": nrow_new - nrow_old,
        "ncol_old": len(old_types),
        "ncol_new": len(new_types),
        "added_cols": added,
        "removed_cols": removed,
        "type_changes": type_changes,
    }
    return spark.createDataFrame([row], schema=_DATASET_DIFF_SCHEMA)


def column_set_diff(
    old_df: DataFrame, new_df: DataFrame, col: str, alias: str
) -> DataFrame:
    """E3 — values of ``col`` present in old but not new
    (``setdiff(unique(old$c), unique(new$c))``,
    assess_changes.qmd:335-338). R setdiff is distinct, so ``except``
    (distinct), not ``exceptAll`` (SURVEY.md §4.3)."""
    return (
        old_df.select(F.col(col).alias(alias))
        .distinct()
        .exceptAll(new_df.select(F.col(col).alias(alias)).distinct())
    )
