"""Versioned-table CHANGE-FEED as a first-class Structured Streaming
SOURCE, via the PySpark 4 Python Data Source API — the read half of
the loop whose write half already exists (streaming/sink.py commits
micro-batches INTO versioned tables; this streams the commits back
OUT).  ``spark.readStream.format("versioned_feed")`` turns every
downstream consumer — the feed-driven index maintenance, the CDC MERGE
sink, a quality-scoring pipeline — into a plain streaming query with
engine-managed, checkpointed offsets instead of a hand-rolled cursor
file.

Design (scale-shaped, not driver-shaped):

  * OFFSETS are versions: ``{"version": N}`` means "everything up to
    and including commit N has been emitted".  initialOffset honours a
    ``startingVersion`` option (default: just before
    ``earliest_feed_version``, i.e. the full resolvable feed) or
    ``startingTimestamp`` (resolved via :func:`version_at` — the
    timestamp cursor, r12);
  * each micro-batch covers the versions committed since the last
    offset; ``partitions(start, end)`` expands them into ONE INPUT
    PARTITION PER DELTA FILE (``version_delta_files`` — the same
    append/overwrite/merge/restore/compact semantics as
    ``change_feed``), so executors read files in parallel exactly like
    a parquet scan: the driver touches manifests only, never data;
  * ``read(partition)`` runs executor-side: pyarrow reads the one
    parquet file and yields tuples in declared-schema order (columns a
    pre-evolution file lacks yield None — mergeSchema tolerance),
    with ``_version`` appended — the same tagging contract as
    ``change_feed``;
  * exactly-once: offsets live in the query's checkpoint; a restarted
    stream resumes after the last committed version, and a feed range
    expired by retention raises (RetentionError semantics) rather than
    silently skipping — a CDC consumer must never believe it caught
    up across a hole.

The schema is derived from the LATEST version's parquet footers
(unified across files in first-appearance order, so schema evolution
surfaces new columns) — a driver-side metadata read, bounded by file
count.  A BATCH reader is registered too (``spark.read.format(
"versioned_feed")``): the current full state, or ``version``/
``asOfTimestamp`` options for time travel, again one partition per
file.
"""

from __future__ import annotations

#: pyarrow type name prefixes → Spark SQL DDL types (the common
#: subset our segments actually contain; anything else errors loudly
#: at schema time rather than corrupting rows at read time).
_TYPE_MAP = {
    "int8": "tinyint",
    "int16": "smallint",
    "int32": "int",
    "int64": "bigint",
    "float": "float",
    "double": "double",
    "string": "string",
    "large_string": "string",
    "bool": "boolean",
    "date32": "date",
    "binary": "binary",
    "large_binary": "binary",
}


def _spark_type(arrow_type) -> str:
    name = str(arrow_type)
    if name.startswith("timestamp"):
        return "timestamp"
    if name.startswith("decimal"):
        return name  # decimal(p, s) spells identically
    try:
        return _TYPE_MAP[name]
    except KeyError:
        raise ValueError(
            f"versioned_feed: unsupported parquet type {name!r}"
        ) from None


def _unified_schema(files: list[str]) -> list[tuple[str, str]]:
    """(name, spark_ddl_type) unified across the files' footers in
    first-appearance order — footer reads only, no data pages."""
    import pyarrow.parquet as pq

    fields: list[tuple[str, str]] = []
    seen: set[str] = set()
    for f in files:
        for field in pq.read_schema(f):
            if field.name not in seen:
                seen.add(field.name)
                fields.append((field.name, _spark_type(field.type)))
    return fields


def _schema_ddl(fields: list[tuple[str, str]]) -> str:
    cols = ", ".join(f"`{n}` {t}" for n, t in fields)
    return f"{cols}, `_version` bigint"


def _read_file_rows(path: str, field_names: list[str], version: int):
    """Executor-side: yield tuples for one delta file in declared
    column order (+ _version); columns absent from this file's footer
    (pre-evolution segments) yield None."""
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    present = set(table.schema.names)
    cols = [
        table.column(n).to_pylist() if n in present else None
        for n in field_names
    ]
    n_rows = table.num_rows
    for i in range(n_rows):
        yield tuple(
            (c[i] if c is not None else None) for c in cols
        ) + (version,)


class _FilePartition:
    """One delta file of one version — the parallelism unit."""

    def __init__(self, path: str, version: int):
        self.path = path
        self.version = version


def _delta_partitions(
    table_dir: str, after: int, upto: int
) -> list[_FilePartition]:
    from ..sinks.versioned import list_versions, version_delta_files

    parts: list[_FilePartition] = []
    for v in list_versions(table_dir):
        if after < v <= upto:
            for f in version_delta_files(table_dir, v):
                parts.append(_FilePartition(f, v))
    return parts


def _make_datasource_class():
    """Build the DataSource class lazily: pyspark.sql.datasource is a
    PySpark-4-only module, and constructing the class at import time
    would make this module un-importable on older runtimes."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    class _Part(InputPartition):
        def __init__(self, path: str, version: int):
            self.path = path
            self.version = version

    class _FeedStreamReader(DataSourceStreamReader):
        def __init__(self, table_dir: str, fields, options):
            self._dir = table_dir
            self._fields = fields
            self._names = [n for n, _ in fields]
            self._options = options

        def initialOffset(self) -> dict:
            from ..sinks.versioned import (
                earliest_feed_version,
                version_at,
            )

            sv = self._options.get("startingVersion")
            if sv is not None:
                return {"version": int(sv)}
            st = self._options.get("startingTimestamp")
            if st is not None:
                try:
                    return {"version": version_at(self._dir, float(st))}
                except FileNotFoundError:
                    pass  # predates the table: full feed
            return {"version": earliest_feed_version(self._dir) - 1}

        def latestOffset(self) -> dict:
            from ..sinks.versioned import latest_version

            cur = latest_version(self._dir)
            if cur is None:
                raise FileNotFoundError(f"no versions in {self._dir}")
            return {"version": cur}

        def partitions(self, start: dict, end: dict):
            from ..sinks.versioned import (
                RetentionError,
                earliest_feed_version,
            )

            lo = int(start["version"])
            if lo + 1 < earliest_feed_version(self._dir):
                raise RetentionError(
                    f"stream cursor v{lo} is out of retention; "
                    f"earliest valid startingVersion is "
                    f"{earliest_feed_version(self._dir) - 1}"
                )
            return [
                _Part(p.path, p.version)
                for p in _delta_partitions(
                    self._dir, lo, int(end["version"])
                )
            ]

        def read(self, partition):
            yield from _read_file_rows(
                partition.path, self._names, partition.version
            )

        def commit(self, end: dict) -> None:
            pass  # offsets live in the query checkpoint

    class _SnapshotReader(DataSourceReader):
        def __init__(self, table_dir: str, fields, options):
            self._dir = table_dir
            self._fields = fields
            self._names = [n for n, _ in fields]
            self._options = options

        def _version(self) -> int:
            from ..sinks.versioned import latest_version, version_at

            v = self._options.get("version")
            if v is not None:
                return int(v)
            ts = self._options.get("asOfTimestamp")
            if ts is not None:
                return version_at(self._dir, float(ts))
            cur = latest_version(self._dir)
            if cur is None:
                raise FileNotFoundError(f"no versions in {self._dir}")
            return cur

        def partitions(self):
            from ..sinks.versioned import _read_manifest

            v = self._version()
            return [
                _Part(f, v) for f in _read_manifest(self._dir, v)["files"]
            ]

        def read(self, partition):
            yield from _read_file_rows(
                partition.path, self._names, partition.version
            )

    class VersionedFeedDataSource(DataSource):
        """``format("versioned_feed")``: stream a versioned table's
        change feed (readStream) or scan a snapshot (read).  Options:
        ``path`` (the table dir), ``startingVersion`` /
        ``startingTimestamp`` (stream), ``version`` /
        ``asOfTimestamp`` (batch)."""

        @classmethod
        def name(cls) -> str:
            return "versioned_feed"

        def _table_dir(self) -> str:
            d = self.options.get("path") or self.options.get("tableDir")
            if not d:
                raise ValueError(
                    "versioned_feed needs .option('path', <table_dir>) "
                    "or .load(<table_dir>)"
                )
            return d

        def _fields(self):
            from ..sinks.versioned import _read_manifest, latest_version

            d = self._table_dir()
            cur = latest_version(d)
            if cur is None:
                raise FileNotFoundError(f"no versions in {d}")
            return _unified_schema(_read_manifest(d, cur)["files"])

        def schema(self) -> str:
            return _schema_ddl(self._fields())

        def streamReader(self, schema):
            return _FeedStreamReader(
                self._table_dir(), self._fields(), self.options
            )

        def reader(self, schema):
            return _SnapshotReader(
                self._table_dir(), self._fields(), self.options
            )

    return VersionedFeedDataSource


def register_versioned_feed(spark) -> None:
    """Register the ``versioned_feed`` data source on this session.
    Idempotent — re-registration replaces the previous class."""
    spark.dataSource.register(_make_datasource_class())


__all__ = ["register_versioned_feed"]
