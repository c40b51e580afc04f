"""``hudi_feed`` — Structured Streaming source over EXTERNAL Hudi
tables (the streaming half of sources/hudi.py, completing the lake
streaming trifecta next to streaming/delta_feed.py and
streaming/iceberg_feed.py).

``spark.readStream.format("hudi_feed").option("path", dir).load()``
tails a Hudi table the way the hudi-spark runtime's incremental
streaming read does: offsets are positions in the COMPLETED timeline
(requested/inflight instants are invisible — the same torn-write rule
as the batch reader), and each micro-batch emits exactly the rows
WRITTEN AT one or more instants, identified by the per-row
``_hoodie_commit_time`` meta column:

  * a COW upsert slice contains rewritten old rows next to the new
    ones — the commit-time filter keeps only rows stamped with the
    batch's instant, so rewrites are NOT re-emitted;
  * compaction and clustering produce slices whose rows all carry
    their ORIGINAL commit times — those instants emit nothing, which
    is what makes table maintenance stream-safe (the dataChange=false
    analog of the Delta feed);
  * merge-on-read deltacommits are read from the log files' Avro data
    blocks (sources/hudi_log.py — pure-Python decode, runs in the
    worker with no session);
  * DELETE blocks do not surface — Hudi's incremental format without
    the CDC feature cannot represent deletes (the same documented
    boundary as ``read_hudi_incremental``); consumers needing deletes
    must diff snapshots.

A table written with ``hoodie.populate.meta.fields=false`` (no
``_hoodie_commit_time`` column) refuses at stream construction —
without the cursor column, upsert rewrites would be re-emitted as
phantom inserts.

Options: ``startingInstant`` (tail only instants strictly AFTER this
one; default replay from the beginning), ``maxFilesPerTrigger``.

Scale: ``latestOffset`` is one timeline listing; ``partitions``
walks file names plus log-block HEADERS (framing only, content not
decoded) on the driver; each input partition is one base or log
file read by one worker task.
"""

from __future__ import annotations

import os

from ..sources.hudi import (
    HudiProtocolError,
    _BASE_RE,
    _LOG_RE,
    _completed_instants,
)

_ARROW_DDL = {
    "int8": "tinyint", "int16": "smallint", "int32": "int",
    "int64": "bigint", "float": "float", "double": "double",
    "string": "string", "large_string": "string", "bool": "boolean",
    "date32[day]": "date", "binary": "binary",
}


def _ddl_from_arrow(arrow_type) -> str:
    s = str(arrow_type)
    if s in _ARROW_DDL:
        return _ARROW_DDL[s]
    if s.startswith("timestamp[us, tz="):
        return "timestamp"
    if s.startswith("timestamp["):
        return "timestamp_ntz"
    if s.startswith("decimal128("):
        return "decimal(" + s[11:]
    raise HudiProtocolError(
        f"hudi_feed: unsupported column type {s!r} (scalar columns "
        "only)"
    )


def _stream_fields(table_dir: str) -> list[tuple[str, str]]:
    """(name, ddl) from the arrow schema of one base file — the
    session-less twin of the batch reader's schema inference."""
    import pyarrow.parquet as pq

    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for name in sorted(files):
            if _BASE_RE.match(name) and name.endswith(".parquet"):
                schema = pq.read_schema(os.path.join(root, name))
                fields = [
                    (f.name, _ddl_from_arrow(f.type)) for f in schema
                ]
                if "_hoodie_commit_time" not in {
                    n for n, _ in fields
                }:
                    raise HudiProtocolError(
                        "hudi_feed needs the _hoodie_commit_time "
                        "meta column (table written with hoodie."
                        "populate.meta.fields=false?) — without the "
                        "per-row cursor, upsert rewrites would "
                        "re-emit"
                    )
                return fields
    raise HudiProtocolError(f"no base files under {table_dir}")


def _log_block_instants(path: str) -> set[str]:
    """Instants present in one log file's block headers — framing
    walk only, block content never decoded."""
    from ..sources.hudi_log import INSTANT_TIME, decode_blocks

    with open(path, "rb") as fh:
        data = fh.read()
    out = set()
    for blk in decode_blocks(data):
        inst = blk["headers"].get(INSTANT_TIME)
        if inst is not None:
            out.add(inst)
    return out


def _instant_files(table_dir: str, instant: str) -> list[tuple]:
    """[(kind, path)] of files carrying rows written at ``instant`` —
    base slices by file-name instant, log files by block headers."""
    out = []
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for name in sorted(files):
            m = _BASE_RE.match(name)
            if m and name.endswith(".parquet"):
                if m.group("instant") == instant:
                    out.append(("base", os.path.join(root, name)))
                continue
            lm = _LOG_RE.match(name)
            if lm and instant in _log_block_instants(
                os.path.join(root, name)
            ):
                out.append(("log", os.path.join(root, name)))
    return out


def _make_hudi_feed_class():
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceStreamReader,
        InputPartition,
    )

    class _HudiFile(InputPartition):
        def __init__(self, kind, path, instant):
            self.kind = kind
            self.path = path
            self.instant = instant

    class _HudiFeedStreamReader(DataSourceStreamReader):
        def __init__(self, table_dir, fields, options):
            self._dir = table_dir
            self._fields = fields
            self._starting = options.get("startingInstant")
            self._max_files = int(options.get("maxFilesPerTrigger", 0))

        def _timeline(self) -> list[str]:
            return [i for i, _ in _completed_instants(self._dir)]

        def _start_index(self, log: list[str]) -> int:
            if self._starting is None:
                return -1
            s = str(self._starting)
            if s not in log:
                raise HudiProtocolError(
                    f"startingInstant {s} not in the completed "
                    "timeline"
                )
            return log.index(s)

        def initialOffset(self) -> dict:
            return {"index": self._start_index(self._timeline())}

        def latestOffset(self) -> dict:
            log = self._timeline()
            latest = len(log) - 1
            if self._max_files:
                # admission control pacing.  MEASURED (PySpark
                # 4.1): the streaming runner NEVER invokes
                # ``commit`` on python stream readers, so pacing
                # off committed offsets pins the stream at the
                # first capped offset forever.  Pace off the
                # offsets THIS instance already emitted instead:
                # Spark plans (checkpointed start, emitted end]
                # batches, so every trigger advances one cap
                # window; after a restart the counter resets and a
                # few empty triggers re-sync (exactly-once holds —
                # partitions() is driven by Spark's checkpointed
                # start either way).
                cur = getattr(
                    self, "_paced", self._start_index(log)
                )
                taken, last = 0, cur
                for i in range(cur + 1, len(log)):
                    n = len(_instant_files(self._dir, log[i]))
                    if taken and taken + n > self._max_files:
                        break
                    taken += n
                    last = i
                    if taken >= self._max_files:
                        break
                out = last if taken else latest
                self._paced = max(cur, out)
                return {"index": out}
            return {"index": latest}

        def partitions(self, start: dict, end: dict):
            log = self._timeline()
            out = []
            for i in range(int(start["index"]) + 1,
                           int(end["index"]) + 1):
                for kind, path in _instant_files(self._dir, log[i]):
                    out.append(_HudiFile(kind, path, log[i]))
            return out

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            from ..sources.hudi_log import log_records

            names = [n for n, _ in self._fields]
            target = pa.schema(
                [pa.field(n, _arrow_type(t))
                 for n, t in self._fields]
            )
            if partition.kind == "base":
                tbl = pq.read_table(partition.path)
                tbl = tbl.filter(
                    pc.equal(tbl["_hoodie_commit_time"],
                             partition.instant)
                )
                tbl = tbl.select(names).cast(target)
            else:
                with open(partition.path, "rb") as fh:
                    data = fh.read()
                recs = [
                    rec
                    for _inst, _seq, is_del, rec in log_records(
                        data, {partition.instant}, partition.instant
                    )
                    if not is_del
                    and rec.get("_hoodie_commit_time")
                    == partition.instant
                ]
                tbl = pa.table(
                    {n: [r.get(n) for r in recs] for n in names},
                    schema=target,
                )
            yield from tbl.to_batches()

        def commit(self, end: dict) -> None:
            self._committed = int(end["index"])

    class HudiFeedDataSource(DataSource):
        """``format("hudi_feed")``: stream a Hudi table's committed
        write tail by per-row commit time."""

        @classmethod
        def name(cls) -> str:
            return "hudi_feed"

        def _table_dir(self) -> str:
            d = self.options.get("path")
            if not d:
                raise ValueError(
                    "hudi_feed needs .option('path', <table_dir>)"
                )
            return d

        def schema(self) -> str:
            fields = _stream_fields(self._table_dir())
            return ", ".join(f"`{n}` {t}" for n, t in fields)

        def streamReader(self, schema):
            return _HudiFeedStreamReader(
                self._table_dir(),
                _stream_fields(self._table_dir()),
                self.options,
            )

    return HudiFeedDataSource


def _arrow_type(ddl: str):
    import pyarrow as pa

    table = {
        "tinyint": pa.int8(), "smallint": pa.int16(),
        "int": pa.int32(), "bigint": pa.int64(),
        "float": pa.float32(), "double": pa.float64(),
        "string": pa.string(), "boolean": pa.bool_(),
        "date": pa.date32(), "binary": pa.binary(),
        "timestamp": pa.timestamp("us", tz="UTC"),
        "timestamp_ntz": pa.timestamp("us"),
    }
    if ddl in table:
        return table[ddl]
    if ddl.startswith("decimal("):
        p, s = ddl[8:-1].split(",")
        return pa.decimal128(int(p), int(s))
    raise HudiProtocolError(f"no arrow mapping for {ddl!r}")


def register_hudi_feed(spark) -> None:
    """Register ``hudi_feed`` on this session (idempotent)."""
    try:
        spark.dataSource.register(_make_hudi_feed_class())
    except Exception as e:  # noqa: BLE001
        if "DATA_SOURCE_ALREADY_EXISTS" not in str(e):
            raise
