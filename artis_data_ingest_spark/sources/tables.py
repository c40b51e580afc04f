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
from pyspark.sql import functions as F

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
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) parquet, which Spark rejects.
        # Read nanos as long, then floor-convert to microsecond
        # timestamps (integer DIV — double math would lose precision
        # above 2^53 ns). DuckDB's CAST(ts AS TIMESTAMP) truncates the
        # same way, so oracle comparisons stay exact.
        try:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        except Exception:
            # Spark can refuse runtime changes to this static-ish conf
            # (AnalysisException: CANNOT_MODIFY_CONFIG) once a query ran;
            # harmless either way — the dtype dispatch below handles both
            # the bigint (conf took effect) and timestamp outcomes.
            pass
        df = spark.read.parquet(path)
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            # pyspark 4.x may infer parquet timestamps as TIMESTAMP_NTZ,
            # which unix_micros() and streaming watermarks reject. Session
            # tz is pinned UTC, so the cast is value-identical and the
            # DuckDB oracle (naive timestamps) still matches.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
