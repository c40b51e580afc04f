"""Parquet FOOTER inspector — distributed row-group / column-chunk
metadata as a DataFrame.

The operational companion to every parquet-backed surface in this
engine (manifest skipping, OPTIMIZE sizing, Z-order verification,
lake-table debugging): before touching data, a pipeline operator
asks "how many row groups, how big, how well does each column
compress, where are the stats?" — the footer answers all of it for
the cost of a few KB per file.  Real 100 TB table maintenance is
driven off exactly this scan (compaction picks small files, skipping
audits read min/max envelopes).

One task per file over a distributed path list; each worker reads
ONLY the footer via pyarrow (no data pages).  Output: one row per
(file, row group, column chunk) with counts, encoded sizes, and the
min/max stats when present.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

_SCHEMA = (
    "file string, row_group int, col_name string, "
    "num_values bigint, compressed_bytes bigint, "
    "uncompressed_bytes bigint, has_stats boolean, "
    "stats_min string, stats_max string"
)


def parquet_footers(
    spark: SparkSession, paths: list[str]
) -> DataFrame:
    """Footer metadata rows for many parquet files (one footer read
    per task, data pages never touched)."""
    import pandas as pd

    if not paths:
        raise ValueError("parquet_footers: empty path list")
    resolved = sorted(os.path.abspath(p) for p in paths)

    def scan(batches):
        import pyarrow.parquet as pq

        cols = [
            "file", "row_group", "col_name", "num_values",
            "compressed_bytes", "uncompressed_bytes", "has_stats",
            "stats_min", "stats_max",
        ]
        for pdf in batches:
            rows = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                base = os.path.basename(path)
                for rg in range(md.num_row_groups):
                    g = md.row_group(rg)
                    for ci in range(g.num_columns):
                        c = g.column(ci)
                        st = c.statistics
                        has = bool(st is not None and st.has_min_max)
                        rows.append((
                            base, rg, c.path_in_schema,
                            c.num_values, c.total_compressed_size,
                            c.total_uncompressed_size, has,
                            str(st.min) if has else None,
                            str(st.max) if has else None,
                        ))
            yield pd.DataFrame(rows, columns=cols)

    n_parts = max(1, min(len(resolved), 32))
    return (
        spark.createDataFrame([(p,) for p in resolved], "path string")
        .repartition(n_parts)
        .mapInPandas(scan, _SCHEMA)
    )
