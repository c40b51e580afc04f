"""Bucketed table sink — co-located joins and aggregations at rest.

The single biggest shuffle eliminator at 100 TB: a fact table written
with ``bucketBy(N, key)`` is hash-partitioned *on disk*, so every
subsequent equi-join or aggregation on that key reads the buckets
back co-partitioned and skips the exchange entirely (``sortBy`` keeps
the residual merge-join sort partition-local and cheap; Spark 4 still
plans the local sort node). For the repeated snapshot-vs-snapshot
comparisons the reference runs (assess_changes.qmd:200-260 — the same
join key every month), bucketing both snapshots turns each comparison
from two full shuffles into a zero-exchange zip of bucket pairs.

Scale notes:
  * Pick N buckets ≈ total cluster cores × small factor; both sides of
    a co-located join must share N and the bucket columns.
  * Bucketed tables go through the session catalog (``saveAsTable``) —
    with the default in-memory catalog the data lives at ``path`` and
    the catalog entry is session-scoped; on a cluster this is the
    metastore entry every reader shares.
  * One writer task per bucket: we repartition on the bucket columns
    first so the writer doesn't create ``tasks × buckets`` files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save ``df`` as a bucketed (and optionally sort-ordered) table.

    ``path`` makes it an external table (data at that location); omit
    for a managed table under ``spark.sql.warehouse.dir``.
    """
    out = df.repartition(n_buckets, *bucket_cols)
    writer = out.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.format("parquet").saveAsTable(name)


def read_table(spark: SparkSession, name: str) -> DataFrame:
    """Catalog read; bucketing metadata rides along, so joins/aggs on
    the bucket columns plan without an Exchange."""
    return spark.table(name)
