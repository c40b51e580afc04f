"""Parquet fixture-table loaders (SURVEY.md §2.1 S14).

The reference ingests CSV/XLSX/zip snapshots eagerly with inferred
schemas (``assess_changes.qmd:128-139``); our at-rest format is Parquet,
which gives Catalyst column pruning + predicate pushdown for free — the
two optimizations the reference's read-everything ``fread`` lacks
(SURVEY.md §4.1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy scan of one fixture table.

    At 100 TB these would be partitioned/bucketed datasets; a plain
    ``spark.read.parquet`` still scales because file listing and split
    planning are distributed, and filters/projections applied downstream
    push into the scan (verify with ``.explain``: ``PushedFilters``,
    ``ReadSchema``).
    """
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
