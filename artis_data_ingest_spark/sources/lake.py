"""Format-autodetecting LAKE TABLE views — the SQL naming layer over
every table format this engine reads: external Delta Lake, Apache
Iceberg, Apache Hudi, and its own versioned tables.

r14 gave the engine's internal versioned tables a SQL surface
(sinks/versioned.py sql_view); this module extends it to the three
external formats (r14 VERDICT task 8), so a data engineer can point
``lake_view`` at ANY table directory in the warehouse — without
knowing or caring which engine wrote it — and then join snapshots and
change feeds in one plain ``spark.sql`` statement.  Detection is the
same marker each format's own runtime uses:

  * ``_delta_log/``          → Delta Lake (sources/delta.py)
  * ``metadata/*.metadata.json`` → Iceberg (sources/iceberg.py)
  * ``.hoodie/``             → Hudi (sources/hudi.py)
  * ``_manifests/``          → this engine's versioned tables
                               (sinks/versioned.py)

The unified options map onto each format's native time-travel /
change-feed notion; combinations a format cannot express REFUSE
loudly rather than approximating (a Hudi change feed without the
metadata table simply is not recorded — returning a snapshot diff
would silently change semantics).

Scale posture: a view is exactly the DataFrame its format reader
builds — the log/manifest/timeline walk is driver-side metadata and
the data path one distributed scan; Catalyst plans joins across the
registered views like any other relations (broadcast for small
sides, shuffle-hash across facts).

Reference tie-in: the reference's collaborators consume its outputs
as plain tables (assess_changes.qmd renders from what is effectively
a snapshot query); this is that consumption surface, format-blind.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


class LakeFormatError(ValueError):
    """Directory is not a recognizable lake table."""


def detect_lake_format(table_dir: str) -> str:
    """→ ``'delta' | 'iceberg' | 'hudi' | 'versioned'`` by the layout
    marker each format's own runtime keys on.  Ambiguity (two markers
    present) and no-marker both refuse — guessing would silently read
    the wrong snapshot lineage."""
    if not os.path.isdir(table_dir):
        raise LakeFormatError(f"not a directory: {table_dir}")
    found = []
    if os.path.isdir(os.path.join(table_dir, "_delta_log")):
        found.append("delta")
    if glob.glob(os.path.join(table_dir, "metadata",
                              "*.metadata.json")):
        found.append("iceberg")
    if os.path.isdir(os.path.join(table_dir, ".hoodie")):
        found.append("hudi")
    if os.path.isdir(os.path.join(table_dir, "_manifests")):
        found.append("versioned")
    if not found:
        raise LakeFormatError(
            f"no lake-format marker under {table_dir} (expected one "
            "of _delta_log/, metadata/*.metadata.json, .hoodie/, "
            "_manifests/)"
        )
    if len(found) > 1:
        raise LakeFormatError(
            f"ambiguous table layout under {table_dir}: markers for "
            f"{found} all present — pass fmt= explicitly"
        )
    return found[0]


def lake_read(
    spark: SparkSession,
    table_dir: str,
    fmt: str | None = None,
    version: int | str | None = None,
    changes_since: int | None = None,
) -> DataFrame:
    """Read any lake table through one signature.

    ``version`` pins time travel in the format's own coordinates —
    Delta commit version, Iceberg snapshot id, Hudi instant string,
    internal version number.  ``changes_since`` switches to the
    format's change feed: Delta CDF rows after that commit version,
    Iceberg incremental appends after that snapshot id, the internal
    cdc_feed after that version; Hudi refuses (without the metadata
    table the feed is not recorded).  The two options are exclusive,
    like ``sql_view``'s."""
    if version is not None and changes_since is not None:
        raise ValueError("version is exclusive with changes_since")
    fmt = fmt or detect_lake_format(table_dir)
    if fmt == "delta":
        from .delta import read_delta, read_delta_cdf

        if changes_since is not None:
            return read_delta_cdf(
                spark, table_dir, starting_version=int(changes_since)
            )
        return read_delta(
            spark, table_dir,
            version=None if version is None else int(version),
        )
    if fmt == "iceberg":
        from .iceberg import read_iceberg, read_iceberg_appends

        if changes_since is not None:
            return read_iceberg_appends(
                spark, table_dir, from_snapshot=int(changes_since)
            )
        return read_iceberg(
            spark, table_dir,
            snapshot_id=None if version is None else int(version),
        )
    if fmt == "hudi":
        from .hudi import read_hudi

        if changes_since is not None:
            raise LakeFormatError(
                "Hudi change feeds need the metadata table this "
                "reader does not implement — read a snapshot and "
                "diff, or use the COW/MOR snapshot view"
            )
        return read_hudi(
            spark, table_dir,
            as_of_instant=None if version is None else str(version),
        )
    if fmt == "versioned":
        from ..sinks.versioned import cdc_feed, read_version

        if changes_since is not None:
            return cdc_feed(spark, table_dir, since=int(changes_since))
        return read_version(
            spark, table_dir,
            version=None if version is None else int(version),
        )
    raise LakeFormatError(f"unknown lake format {fmt!r}")


def lake_view(
    spark: SparkSession,
    table_dir: str,
    name: str,
    fmt: str | None = None,
    version: int | str | None = None,
    changes_since: int | None = None,
) -> DataFrame:
    """Register any lake table as a TEMP VIEW so plain
    ``spark.sql("SELECT ... FROM name")`` works over it — format
    autodetected, options as in :func:`lake_read`.  Same snapshot
    semantics as ``sql_view``: the view captures the state resolved
    NOW; re-register to advance (``createOrReplaceTempView`` swaps
    atomically), use the streaming feeds for a live subscription.
    Returns the registered DataFrame."""
    df = lake_read(
        spark, table_dir, fmt=fmt, version=version,
        changes_since=changes_since,
    )
    df.createOrReplaceTempView(name)
    return df
