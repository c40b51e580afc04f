"""Delta Lake table READER — interop with external Delta tables.

This repo has its own versioned-table format (sinks/versioned.py,
manifest-JSON based, full DML).  Real lakes, however, are full of
tables written by OTHER engines in the open Delta Lake format, and a
100 TB ingest must read them in place — no conversion pass, no
delta-spark jar (this image ships none).  This module implements the
read path of the public Delta transaction-log protocol
(https://github.com/delta-io/delta/blob/master/PROTOCOL.md):

  * ``_delta_log/{version:020d}.json`` — newline-delimited JSON
    actions (``metaData``, ``protocol``, ``add``, ``remove``,
    ``commitInfo``); the table state at version V is the accumulated
    set of ``add`` actions minus ``remove`` actions over versions
    0..V, with the LATEST ``metaData`` winning.
  * ``_delta_log/_last_checkpoint`` + ``{v:020d}.checkpoint.parquet``
    (single or multi-part ``.checkpoint.{i:010d}.{n:010d}.parquet``)
    — a parquet materialization of the state at v, so reconstruction
    replays only the JSON commits AFTER the newest checkpoint ≤ the
    requested version instead of the whole history (the same
    O(versions)→O(delta) trick our own ``write_checkpoint`` plays).

Scale posture: log replay is a driver-side walk over SMALL metadata
(same as delta-spark's Snapshot construction); data stays distributed.
Partition columns are NOT stored in Delta data files — each ``add``
carries ``partitionValues`` — so the scan reads all live files in ONE
``spark.read.parquet`` (split planning intact, pushdown intact for
non-partition predicates) and re-attaches partition values by a
BROADCAST join on ``_metadata.file_path``, never a per-file union of
scans.  Column-mapping mode ``name`` (physical parquet names differ
from logical) is honoured by renaming after the scan.  Deletion
vectors — the row-level delete encoding modern Databricks writers
emit by default — are fully decoded (sources/roaring.py implements
the public RoaringBitmapArray + Z85 formats) and masked by a
broadcast (file, row position) anti-join, the same mechanism our own
versioned tables use; ``delete_delta_where`` writes them too, so
exported tables get O(delta) row deletes.  Writer features beyond
the protocol implemented here are refused loudly.

Reference tie-in: the reference reads whatever format its upstream
publishes (artis-data-ingest clean_fao.qmd ingests FAO's workbook
exports verbatim); Delta is today's equivalent for lake-resident
upstreams.
"""

from __future__ import annotations

import json
import os
import re
from urllib.parse import unquote

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class DeltaProtocolError(ValueError):
    """Table requires protocol features this reader does not implement."""


_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_ONE_RE = re.compile(r"^(\d{20})\.checkpoint\.parquet$")
_CKPT_MULTI_RE = re.compile(
    r"^(\d{20})\.checkpoint\.(\d{10})\.(\d{10})\.parquet$"
)

# Read the log's parquet checkpoints with a tolerant explicit schema:
# engines add extra fields freely, and we need only these.
_MAX_READER_VERSION = 3  # 3 only when readerFeatures ⊆ supported
_SUPPORTED_READER_FEATURES = {"columnMapping", "timestampNtz",
                              "deletionVectors", "v2Checkpoint"}
# deletionVectors as a FEATURE is tolerated (the table may have none
# live); any live file actually carrying a DV is refused per-file.


def _list_log(table_dir: str) -> tuple[list[int], dict]:
    log_dir = os.path.join(table_dir, "_delta_log")
    if not os.path.isdir(log_dir):
        raise DeltaProtocolError(f"no _delta_log under {table_dir}")
    commits: list[int] = []
    ckpts: dict[int, list[str]] = {}
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            commits.append(int(m.group(1)))
            continue
        m = _CKPT_ONE_RE.match(name) or _CKPT_MULTI_RE.match(name)
        if m:
            ckpts.setdefault(int(m.group(1)), []).append(
                os.path.join(log_dir, name)
            )
    return sorted(commits), ckpts


def _read_commit(path: str) -> list[dict]:
    with open(path, encoding="utf-8") as fh:
        return [json.loads(line) for line in fh if line.strip()]


def _checkpoint_actions(
    spark: SparkSession | None, paths: list[str]
) -> list[dict]:
    """Checkpoint parquet → action dicts (adds + metaData + protocol).

    Checkpoints are metadata-sized (one row per live file); collecting
    them on the driver is exactly what delta-spark's state
    reconstruction does before the DATA scan is planned.  With
    ``spark=None`` the rows come through pyarrow instead — the
    ``delta_feed`` stream reader lives in a session-less worker
    process."""
    out: list[dict] = []
    keep = ("add", "remove", "metaData", "protocol")

    def _undo_maps(d: dict) -> dict:
        # pyarrow renders parquet MAP columns as [(k, v), ...] pair
        # lists; downstream consumers expect protocol-JSON dicts
        for k in ("partitionValues", "configuration"):
            if isinstance(d.get(k), list):
                d[k] = dict(d[k])
        return d

    if spark is None:
        import pyarrow.parquet as pq

        for p in paths:
            tbl = pq.read_table(p)
            cols = [c for c in keep if c in tbl.schema.names]
            for row in tbl.select(cols).to_pylist():
                for k, v in row.items():
                    if v is not None:
                        out.append({k: _undo_maps(v)})
        return out
    df = spark.read.parquet(*paths)
    cols = set(df.columns)
    for row in df.select(*[c for c in keep if c in cols]).collect():
        d = row.asDict(recursive=True)
        for k, v in d.items():
            if v is not None:
                out.append({k: v})
    return out


def _snapshot_state(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> tuple[dict, dict, int, dict]:
    """Reconstruct (live add-actions by path, metaData, version,
    protocol) — protocol is the LATEST protocol action replayed, kept
    verbatim so writers (checkpoints) can re-publish it without
    downgrading a table's declared reader/writer requirements."""
    commits, ckpts = _list_log(table_dir)
    if not commits and not ckpts:
        raise DeltaProtocolError(f"empty _delta_log under {table_dir}")
    latest = max(commits) if commits else max(ckpts)
    v = latest if version is None else int(version)
    if v not in commits and v not in ckpts:
        raise DeltaProtocolError(
            f"version {v} not present in the log (have 0..{latest})"
        )
    base = max((c for c in ckpts if c <= v), default=None)
    actions: list[dict] = []
    if base is not None:
        actions.extend(_checkpoint_actions(spark, sorted(ckpts[base])))
        replay = [c for c in commits if base < c <= v]
    else:
        replay = [c for c in commits if c <= v]
    log_dir = os.path.join(table_dir, "_delta_log")
    for c in replay:
        actions.extend(_read_commit(os.path.join(log_dir, f"{c:020d}.json")))

    adds: dict[str, dict] = {}
    meta: dict | None = None
    protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
    for a in actions:
        if "protocol" in a and a["protocol"]:
            p = a["protocol"]
            protocol = p
            mrv = int(p.get("minReaderVersion", 1))
            feats = set(p.get("readerFeatures") or [])
            if mrv > _MAX_READER_VERSION or (
                mrv >= 3 and not feats <= _SUPPORTED_READER_FEATURES
            ):
                raise DeltaProtocolError(
                    f"table needs minReaderVersion={mrv} "
                    f"readerFeatures={sorted(feats)}; this reader "
                    f"supports ≤{_MAX_READER_VERSION} with "
                    f"{sorted(_SUPPORTED_READER_FEATURES)}"
                )
        if "metaData" in a and a["metaData"]:
            meta = a["metaData"]
        if "add" in a and a["add"]:
            add = a["add"]
            adds[unquote(add["path"])] = add
        if "remove" in a and a["remove"]:
            adds.pop(unquote(a["remove"]["path"]), None)
    if meta is None:
        raise DeltaProtocolError("log has no metaData action")
    return adds, meta, v, protocol


def _logical_schema(meta: dict) -> tuple[T.StructType, dict[str, str]]:
    """metaData.schemaString → (logical Spark schema,
    physical→logical rename map for columnMapping.mode=name)."""
    schema = T.StructType.fromJson(json.loads(meta["schemaString"]))
    conf = meta.get("configuration") or {}
    mode = conf.get("delta.columnMapping.mode", "none")
    renames: dict[str, str] = {}
    if mode == "name":
        for f in schema.fields:
            md = f.metadata or {}
            phys = md.get("delta.columnMapping.physicalName")
            if phys and phys != f.name:
                renames[phys] = f.name
    elif mode not in ("none", ""):
        raise DeltaProtocolError(
            f"columnMapping.mode={mode!r} not supported (none/name only)"
        )
    return schema, renames


def _dv_payload(table_dir: str, dv: dict) -> bytes:
    """``deletionVector`` descriptor → payload bytes (magic + portable
    RoaringBitmapArray), per PROTOCOL.md storage variants."""
    from .roaring import read_dv_entry, z85_decode

    st = dv.get("storageType")
    size = int(dv.get("sizeInBytes") or 0)
    ref = dv.get("pathOrInlineDv") or ""
    if st == "i":
        return z85_decode(ref, size)
    if st == "u":
        # [optional random prefix]<20-char Z85 uuid>
        import uuid as _uuid

        prefix, z = ref[:-20], ref[-20:]
        u = _uuid.UUID(bytes=z85_decode(z, 16))
        path = os.path.join(
            table_dir, *((prefix,) if prefix else ()),
            f"deletion_vector_{u}.bin",
        )
        return read_dv_entry(path, int(dv.get("offset") or 1), size)
    if st == "p":
        path = re.sub(r"^file:/+", "/", ref)
        return read_dv_entry(path, int(dv.get("offset") or 1), size)
    raise DeltaProtocolError(f"unknown DV storageType {st!r}")


def _dv_positions(table_dir: str, dv: dict) -> list[int]:
    """Decode one file's deletion vector → sorted deleted row indexes,
    cardinality-checked against the add action's claim."""
    from .roaring import deserialize_dv

    positions = deserialize_dv(_dv_payload(table_dir, dv))
    want = dv.get("cardinality")
    if want is not None and int(want) != len(positions):
        raise DeltaProtocolError(
            f"DV cardinality mismatch: action says {want}, bitmap "
            f"holds {len(positions)}"
        )
    return positions


def _apply_deletion_vectors(
    spark: SparkSession, table_dir: str, adds: dict, df: DataFrame
) -> DataFrame:
    """Mask DV-deleted rows: decode each live file's RoaringBitmap
    (driver-side, per-file METADATA — the same materialization
    delta-spark's scan driver performs) and anti-join the scan on
    (file path, row position) — the identical broadcast mechanism our
    own versioned tables (sinks/versioned.py) and Iceberg position
    deletes use, so the data path stays one distributed scan.

    ``df`` must already carry ``__dl_path`` (normalized file path) and
    ``__dl_pos`` (row index) — captured once at the scan, because the
    ``_metadata`` pseudo-column is only resolvable directly on the
    scan relation.  ``__dl_pos`` is consumed; ``__dl_path`` is left
    for the partition-value join to reuse."""
    import pandas as pd

    dv_adds = [(p, a) for p, a in adds.items()
               if a.get("deletionVector")]
    if not dv_adds:
        return df.drop("__dl_pos")
    paths, poss = [], []
    for rel, a in dv_adds:
        ap = rel if os.path.isabs(rel) else os.path.join(table_dir, rel)
        ap = os.path.abspath(ap)
        for pos in _dv_positions(table_dir, a["deletionVector"]):
            paths.append(ap)
            poss.append(pos)
    dels = spark.createDataFrame(
        pd.DataFrame({"__dl_path": paths,
                      "__dl_pos": pd.array(poss, dtype="int64")})
    )
    return (
        df.join(F.broadcast(dels), ["__dl_path", "__dl_pos"],
                "left_anti")
        .drop("__dl_pos")
    )


def _partition_cast(dt: T.DataType, raw):
    """Delta serializes partitionValues as strings; re-cast per type."""
    col = F.lit(raw)
    if raw is None:
        return F.lit(None).cast(dt)
    return col.cast(dt)


def read_delta(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
) -> DataFrame:
    """Scan an external Delta Lake table (optionally at a pinned
    ``version``) into a DataFrame with the table's LOGICAL schema.

    One distributed parquet scan over the live files; partition
    columns re-attached via a broadcast ``_metadata.file_path`` join;
    physical→logical renames applied for name-mode column mapping;
    deletion vectors (inline Z85, UUID sidecar, or absolute-path —
    the format modern Databricks writers emit by default) decoded
    driver-side and masked by a broadcast (file, row position)
    anti-join."""
    adds, meta, _, _proto = _snapshot_state(spark, table_dir, version)
    schema, renames = _logical_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])

    if not adds:
        return spark.createDataFrame([], schema)

    paths = [
        p if os.path.isabs(p) else os.path.join(table_dir, p)
        for p in adds
    ]
    df = spark.read.parquet(*paths)
    has_dv = any(a.get("deletionVector") for a in adds.values())
    if has_dv or part_cols:
        # capture the _metadata pseudo-columns ONCE at the scan —
        # they are only resolvable directly on the scan relation
        df = df.withColumn(
            "__dl_path",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ),
        )
    if has_dv:
        df = df.withColumn("__dl_pos", F.col("_metadata.row_index"))
        df = _apply_deletion_vectors(spark, table_dir, adds, df)
    for phys, logical in renames.items():
        if phys in df.columns:
            df = df.withColumnRenamed(phys, logical)

    if part_cols:
        # one small row per live file: (absolute path, partition values)
        by_type = {f.name: f.dataType for f in schema.fields}
        pv_rows = []
        for rel, a in adds.items():
            ap = rel if os.path.isabs(rel) else os.path.join(table_dir, rel)
            pv = a.get("partitionValues") or {}
            pv_rows.append(
                (os.path.abspath(ap),) + tuple(pv.get(c) for c in part_cols)
            )
        pv_schema = T.StructType(
            [T.StructField("__dl_path", T.StringType())]
            + [T.StructField(f"__dl_{c}", T.StringType())
               for c in part_cols]
        )
        pv_df = spark.createDataFrame(pv_rows, pv_schema)
        df = df.join(F.broadcast(pv_df), "__dl_path", "left")
        for c in part_cols:
            df = df.withColumn(
                c, F.col(f"__dl_{c}").cast(by_type[c])
            ).drop(f"__dl_{c}")

    # present in the table's declared column order
    return df.select(*[f.name for f in schema.fields])


def write_delta(
    df: DataFrame,
    table_dir: str,
    mode: str = "error",
    partition_by: tuple[str, ...] = (),
) -> int:
    """Write/extend an external-format Delta Lake table (the EXPORT
    half of the interop story: hand the result to any engine with a
    Delta connector).  Returns the committed version.

    * ``mode="error"`` — create version 0; refuse if a log exists.
    * ``mode="append"`` — add files as the next version (Delta's
      append-never-conflicts commit: adds only).
    * ``mode="overwrite"`` — next version removes every previously
      live file and adds the new ones (one atomic commit).

    Data is written DISTRIBUTED by a normal partitioned parquet write
    into a staging dir, then renamed into the table keeping the
    ``col=value`` directory layout; per the protocol, partition
    columns are carried in each add's ``partitionValues`` and NOT in
    the data files (Spark's partitioned write already strips them).
    The driver then writes one JSON commit: ``protocol`` +
    ``metaData`` (version 0 only) + ``add`` actions with
    ``numRecords`` stats from the parquet footers — O(files) driver
    metadata, the same bound as any Delta writer's commit phase.
    Commit files are created with O_EXCL so two racing writers cannot
    publish the same version."""
    import shutil
    import uuid

    import pyarrow.parquet as pq

    if mode not in ("error", "append", "overwrite"):
        raise ValueError(f"unsupported mode {mode!r}")
    log_dir = os.path.join(table_dir, "_delta_log")
    exists = os.path.isdir(log_dir) and any(
        _COMMIT_RE.match(f) for f in os.listdir(log_dir)
    )
    if exists and mode == "error":
        raise DeltaProtocolError(
            f"{table_dir} already holds a Delta log (use mode="
            "'append'/'overwrite')"
        )
    if not exists and mode in ("append", "overwrite"):
        mode = "error"  # first write of a fresh table is a create
    os.makedirs(log_dir, exist_ok=True)

    prior_adds: dict[str, dict] = {}
    version = 0
    if exists:
        commits, _ = _list_log(table_dir)
        version = max(commits) + 1
        # schema + partitioning enforcement (Delta refuses both too):
        # an append that silently changed either would corrupt every
        # later snapshot read
        prior_adds, prior_meta, _, _proto = _snapshot_state(
            df.sparkSession, table_dir, None
        )
        declared, _ = _logical_schema(prior_meta)
        want = [(f.name, f.dataType.simpleString())
                for f in declared.fields]
        have = [(f.name, f.dataType.simpleString())
                for f in df.schema.fields]
        if have != want:
            raise DeltaProtocolError(
                f"schema mismatch vs the table's metaData: writing "
                f"{have}, table declares {want}"
            )
        prior_parts = tuple(prior_meta.get("partitionColumns") or [])
        if tuple(partition_by) != prior_parts:
            raise DeltaProtocolError(
                f"partitioning mismatch: table is partitioned by "
                f"{list(prior_parts)}, write says {list(partition_by)}"
            )
        if mode != "overwrite":
            prior_adds = {}

    stage = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(stage)

    # move part files into the table, keeping col=value dirs
    adds: list[dict] = []
    for root, _dirs, files in os.walk(stage):
        for i, name in enumerate(sorted(files)):
            if not name.endswith(".parquet"):
                continue
            reldir = os.path.relpath(root, stage)
            reldir = "" if reldir == "." else reldir
            final_name = f"part-{version:05d}-{uuid.uuid4().hex}.parquet"
            rel = os.path.join(reldir, final_name) if reldir \
                else final_name
            dst = os.path.join(table_dir, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.replace(os.path.join(root, name), dst)
            pv = {}
            for seg in reldir.split(os.sep):
                if "=" in seg:
                    k, _, v = seg.partition("=")
                    pv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" \
                        else unquote(v)
            adds.append({"add": {
                "path": rel.replace(os.sep, "/"),
                "partitionValues": pv,
                "size": os.path.getsize(dst),
                "modificationTime": int(os.path.getmtime(dst) * 1000),
                "dataChange": True,
                "stats": json.dumps(
                    {"numRecords": pq.ParquetFile(dst).metadata.num_rows}
                ),
            }})
    shutil.rmtree(stage, ignore_errors=True)

    actions: list[dict] = [{"commitInfo": {
        "timestamp": int(os.path.getmtime(table_dir) * 1000),
        "operation": "WRITE" if mode != "overwrite" else "OVERWRITE",
        "operationParameters": {"mode": mode},
    }}]
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append({"metaData": {
            "id": uuid.uuid4().hex,
            "format": {"provider": "parquet", "options": {}},
            "schemaString": df.schema.json(),
            "partitionColumns": list(partition_by),
            "configuration": {},
            "createdTime": int(os.path.getmtime(table_dir) * 1000),
        }})
    if mode == "overwrite":
        for rel in prior_adds:
            actions.append({"remove": {
                "path": rel, "dataChange": True,
                "deletionTimestamp":
                    int(os.path.getmtime(table_dir) * 1000),
            }})
    actions.extend(adds)
    commit_path = os.path.join(log_dir, f"{version:020d}.json")
    # O_EXCL publication: the version number IS the lock
    with open(commit_path, "x") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return version


def delete_delta_where(
    spark: SparkSession, table_dir: str, condition: str
) -> int:
    """Row-level DELETE on an external Delta table via DELETION
    VECTORS — O(deleted rows), never a rewrite of the surviving rows
    (the same trade our internal versioned tables make in
    sinks/versioned.py:delete_where).  Returns the committed version
    (unchanged if nothing matched).

    Mechanics per PROTOCOL.md: the matching (file, row position)
    pairs are found by ONE distributed scan with the predicate pushed
    to parquet; per affected file the new bitmap = old DV ∪ new
    positions is RoaringBitmap-serialized into a fresh
    ``deletion_vector_<uuid>.bin`` sidecar (storageType 'u'), and the
    commit replaces each touched ``add`` with an identical one
    carrying the new DV (``remove`` + ``add``, ``dataChange=true``).
    Files whose every row is deleted are plainly removed.  The first
    DV commit upgrades the protocol to (3, 7) with the
    ``deletionVectors`` reader+writer feature — exactly what
    delta-spark publishes when DVs first appear on a table.

    Driver memory holds the matched positions (the same bound as
    delta-spark's DV writer, which materializes per-file bitmaps on
    the driver before committing); deletes are assumed delta-sized
    relative to the table, which is what makes DVs the right encoding
    in the first place."""
    import uuid as _uuid

    import pyarrow.parquet as pq

    from .roaring import append_dv_entry, serialize_dv, z85_encode

    adds, meta, version, protocol = _snapshot_state(
        spark, table_dir, None
    )
    schema, renames = _logical_schema(meta)
    if renames:
        raise DeltaProtocolError(
            "delete_delta_where does not support column-mapping "
            "tables (physical/logical name split)"
        )
    part_cols = list(meta.get("partitionColumns") or [])
    by_type = {f.name: f.dataType for f in schema.fields}
    if not adds:
        return version

    abs_of = {
        rel: os.path.abspath(
            rel if os.path.isabs(rel) else os.path.join(table_dir, rel)
        )
        for rel in adds
    }
    df = spark.read.parquet(*abs_of.values())
    df = df.withColumn(
        "__dl_path",
        F.regexp_replace(F.col("_metadata.file_path"), "^file:/+", "/"),
    ).withColumn("__dl_pos", F.col("_metadata.row_index"))
    if part_cols:
        pv_rows = [
            (abs_of[rel],)
            + tuple((a.get("partitionValues") or {}).get(c)
                    for c in part_cols)
            for rel, a in adds.items()
        ]
        pv_schema = T.StructType(
            [T.StructField("__dl_path", T.StringType())]
            + [T.StructField(f"__pv_{c}", T.StringType())
               for c in part_cols]
        )
        df = df.join(
            F.broadcast(spark.createDataFrame(pv_rows, pv_schema)),
            "__dl_path", "left",
        )
        for c in part_cols:
            df = df.withColumn(
                c, F.col(f"__pv_{c}").cast(by_type[c])
            ).drop(f"__pv_{c}")
    matched = df.where(condition).select("__dl_path", "__dl_pos")
    by_file: dict[str, list[int]] = {}
    for r in matched.collect():
        by_file.setdefault(r["__dl_path"], []).append(r["__dl_pos"])
    if not by_file:
        return version

    rel_of = {ap: rel for rel, ap in abs_of.items()}
    dv_name = f"deletion_vector_{_uuid.uuid4()}.bin"
    dv_path = os.path.join(table_dir, dv_name)
    dv_ref = z85_encode(
        _uuid.UUID(dv_name[len("deletion_vector_"):-4]).bytes
    )
    actions: list[dict] = [{"commitInfo": {
        "timestamp": int(os.path.getmtime(table_dir) * 1000),
        "operation": "DELETE",
        "operationParameters": {"predicate": condition},
    }}]
    feats = set(protocol.get("readerFeatures") or [])
    wfeats = set(protocol.get("writerFeatures") or [])
    if int(protocol.get("minReaderVersion", 1)) < 3 or \
            "deletionVectors" not in feats:
        actions.append({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": sorted(feats | {"deletionVectors"}),
            "writerFeatures": sorted(wfeats | {"deletionVectors"}),
        }})
    new_version = version + 1
    wrote_dv = False
    for ap, fresh in sorted(by_file.items()):
        rel = rel_of[ap]
        old = adds[rel]
        old_dv = old.get("deletionVector")
        positions = set(fresh)
        if old_dv:
            positions |= set(_dv_positions(table_dir, old_dv))
        stats = old.get("stats")
        n_rows = None
        if stats:
            try:
                n_rows = json.loads(stats).get("numRecords")
            except (ValueError, AttributeError):
                n_rows = None
        if n_rows is None:
            n_rows = pq.ParquetFile(ap).metadata.num_rows
        actions.append({"remove": {
            "path": rel, "dataChange": True,
            "deletionTimestamp":
                int(os.path.getmtime(table_dir) * 1000),
            **({"deletionVector": old_dv} if old_dv else {}),
        }})
        if len(positions) >= int(n_rows):
            continue  # every row dead: plain remove, no re-add
        payload = serialize_dv(sorted(positions))
        offset = append_dv_entry(dv_path, payload)
        wrote_dv = True
        new_add = {
            k: v for k, v in old.items() if k != "deletionVector"
        }
        new_add.update({
            "dataChange": True,
            "deletionVector": {
                "storageType": "u",
                "pathOrInlineDv": dv_ref,
                "offset": offset,
                "sizeInBytes": len(payload),
                "cardinality": len(positions),
            },
        })
        actions.append({"add": new_add})
    if not wrote_dv and os.path.exists(dv_path):
        os.remove(dv_path)
    commit_path = os.path.join(
        table_dir, "_delta_log", f"{new_version:020d}.json"
    )
    with open(commit_path, "x") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version


def read_delta_changes(
    spark: SparkSession,
    table_dir: str,
    starting_version: int,
    ending_version: int | None = None,
) -> DataFrame:
    """Incremental ingest from an external Delta table: the rows
    APPENDED in versions ``(starting_version, ending_version]``, each
    tagged ``_commit_version`` — the cursor-driven tailing read a
    continuous 100 TB pipeline runs on a lake-resident upstream
    (Delta's own streaming source semantics for append-only tables).

    Versions whose ``remove`` actions carry ``dataChange=true``
    (DELETE, MERGE rewrites) REFUSE loudly: their adds are rewritten
    old rows, and silently re-ingesting them would duplicate data
    downstream — the caller must fall back to a snapshot diff (or the
    table's CDF) across that version.  ``dataChange=false`` versions
    (OPTIMIZE bin-packing) are SKIPPED entirely, matching Delta's
    streaming-source semantics — compaction rearranges bytes, not
    rows.  Metadata-only versions contribute nothing.  A log whose
    floor has been checkpointed past the caller's cursor refuses
    (leading gaps lose data exactly like mid-range ones).

    One distributed parquet scan over ALL appended files across the
    version range; per-file version + partition values re-attached by
    a broadcast ``_metadata.file_path`` join."""
    commits, _ = _list_log(table_dir)
    if not commits:
        raise DeltaProtocolError(f"empty _delta_log under {table_dir}")
    latest = max(commits)
    end = latest if ending_version is None else int(ending_version)
    if end > latest:
        raise DeltaProtocolError(
            f"ending_version {end} beyond latest {latest}"
        )
    # schema/partitioning from the snapshot state at `end`
    _, meta, _, _proto = _snapshot_state(spark, table_dir, end)
    schema, renames = _logical_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    by_type = {f.name: f.dataType for f in schema.fields}

    log_dir = os.path.join(table_dir, "_delta_log")
    wanted = [c for c in commits if starting_version < c <= end]
    # A leading gap is just as lossy as a mid-range one: if the log
    # floor sits ABOVE the caller's cursor + 1, versions (cursor,
    # floor) were checkpointed away and their appended rows cannot be
    # reconstructed from JSON commits at all.  The only legitimate
    # clamp is a negative cursor up to the table's version 0.
    first_needed = max(starting_version + 1, 0)
    if min(commits) > first_needed:
        raise DeltaProtocolError(
            f"commit JSONs for versions {first_needed}.."
            f"{min(commits) - 1} are gone (log floor is "
            f"{min(commits)}); silently skipping them would lose "
            "data.  Re-sync from a snapshot read instead"
        )
    expect = list(range(max(starting_version + 1, min(commits)),
                        end + 1))
    if wanted != expect:
        missing = sorted(set(expect) - set(wanted))
        raise DeltaProtocolError(
            f"commit JSONs missing for versions {missing[:5]} in the "
            "tail range — they were likely checkpointed away and "
            "cleaned; silently skipping them would lose data.  "
            "Re-sync from a snapshot read instead"
        )
    file_rows: list[tuple] = []
    for v in wanted:
        actions = _read_commit(os.path.join(log_dir, f"{v:020d}.json"))
        # dataChange=false actions (OPTIMIZE bin-packing) rearrange
        # bytes without changing rows — Delta's streaming source skips
        # them, which is exactly what makes OPTIMIZE stream-safe.
        removes = [
            a for a in actions
            if a.get("remove") and a["remove"].get("dataChange", True)
        ]
        if removes:
            raise DeltaProtocolError(
                f"version {v} contains {len(removes)} remove action(s) "
                "— not an append-only commit; re-sync from a snapshot "
                "diff instead of the append tail"
            )
        for a in actions:
            add = a.get("add")
            if not add or not add.get("dataChange", True):
                continue
            if add.get("deletionVector"):
                raise DeltaProtocolError(
                    f"version {v} adds a file with a deletion vector"
                )
            rel = unquote(add["path"])
            ap = rel if os.path.isabs(rel) else os.path.join(
                table_dir, rel
            )
            pv = add.get("partitionValues") or {}
            file_rows.append(
                (os.path.abspath(ap), v)
                + tuple(pv.get(c) for c in part_cols)
            )

    out_cols = [f.name for f in schema.fields] + ["_commit_version"]
    if not file_rows:
        empty = T.StructType(
            schema.fields + [T.StructField("_commit_version",
                                           T.LongType())]
        )
        return spark.createDataFrame([], empty)

    df = spark.read.parquet(*[r[0] for r in file_rows])
    for phys, logical in renames.items():
        if phys in df.columns:
            df = df.withColumnRenamed(phys, logical)
    pv_schema = T.StructType(
        [T.StructField("__dl_path", T.StringType()),
         T.StructField("_commit_version", T.LongType())]
        + [T.StructField(f"__dl_{c}", T.StringType())
           for c in part_cols]
    )
    pv_df = spark.createDataFrame(file_rows, pv_schema)
    df = (
        df.withColumn(
            "__dl_path",
            F.regexp_replace(
                F.col("_metadata.file_path"), "^file:/+", "/"
            ),
        )
        .join(F.broadcast(pv_df), "__dl_path", "left")
    )
    for c in part_cols:
        df = df.withColumn(
            c, F.col(f"__dl_{c}").cast(by_type[c])
        ).drop(f"__dl_{c}")
    return df.drop("__dl_path").select(*out_cols)


def read_delta_cdf(
    spark: SparkSession,
    table_dir: str,
    starting_version: int,
    ending_version: int | None = None,
) -> DataFrame:
    """EXACT change feed from an external Delta table — the protocol's
    Change Data Feed read path (`table_changes`): versions that carry
    ``cdc`` actions are read from their ``_change_data`` files (which
    store ``_change_type`` — update_preimage / update_postimage /
    delete / insert — alongside the data columns); add-only versions
    surface their added rows as inserts; versions that remove files
    WITHOUT cdc actions refuse loudly (the change information simply
    isn't recorded — Delta raises there too).

    Output = data columns + ``_change_type`` + ``_commit_version``.
    One distributed scan per file class (cdc files vs add files),
    partition values and version tags re-attached by broadcast
    ``_metadata.file_path`` joins — O(changed data), never a snapshot
    rescan."""
    commits, _ = _list_log(table_dir)
    if not commits:
        raise DeltaProtocolError(f"empty _delta_log under {table_dir}")
    latest = max(commits)
    end = latest if ending_version is None else int(ending_version)
    _, meta, _, _proto = _snapshot_state(spark, table_dir, min(end, latest))
    schema, renames = _logical_schema(meta)
    part_cols = list(meta.get("partitionColumns") or [])
    by_type = {f.name: f.dataType for f in schema.fields}
    log_dir = os.path.join(table_dir, "_delta_log")

    cdc_rows: list[tuple] = []   # (abs_path, version, *pv)
    add_rows: list[tuple] = []
    for v in [c for c in commits if starting_version < c <= end]:
        actions = _read_commit(os.path.join(log_dir, f"{v:020d}.json"))
        cdcs = [a["cdc"] for a in actions if a.get("cdc")]
        # dataChange=false commits (OPTIMIZE) change no rows — the
        # change feed skips them, same as the append tail does.
        adds = [
            a["add"] for a in actions
            if a.get("add") and a["add"].get("dataChange", True)
        ]
        removes = [
            a for a in actions
            if a.get("remove") and a["remove"].get("dataChange", True)
        ]
        if cdcs:
            for c in cdcs:
                rel = unquote(c["path"])
                ap = rel if os.path.isabs(rel) else os.path.join(
                    table_dir, rel
                )
                pv = c.get("partitionValues") or {}
                cdc_rows.append(
                    (os.path.abspath(ap), v)
                    + tuple(pv.get(p) for p in part_cols)
                )
        elif removes:
            raise DeltaProtocolError(
                f"version {v} changes data without cdc actions — the "
                "change feed is not recorded there (enable "
                "delta.enableChangeDataFeed on the writer)"
            )
        else:
            for a in adds:
                rel = unquote(a["path"])
                ap = rel if os.path.isabs(rel) else os.path.join(
                    table_dir, rel
                )
                pv = a.get("partitionValues") or {}
                add_rows.append(
                    (os.path.abspath(ap), v)
                    + tuple(pv.get(p) for p in part_cols)
                )

    out_cols = (
        [f.name for f in schema.fields]
        + ["_change_type", "_commit_version"]
    )
    empty_schema = T.StructType(
        schema.fields
        + [T.StructField("_change_type", T.StringType()),
           T.StructField("_commit_version", T.LongType())]
    )

    def attach(rows: list[tuple], df: DataFrame) -> DataFrame:
        pv_schema = T.StructType(
            [T.StructField("__dl_path", T.StringType()),
             T.StructField("_commit_version", T.LongType())]
            + [T.StructField(f"__dl_{c}", T.StringType())
               for c in part_cols]
        )
        pv_df = spark.createDataFrame(rows, pv_schema)
        df = (
            df.withColumn(
                "__dl_path",
                F.regexp_replace(
                    F.col("_metadata.file_path"), "^file:/+", "/"
                ),
            )
            .join(F.broadcast(pv_df), "__dl_path", "left")
        )
        for c in part_cols:
            df = df.withColumn(
                c, F.col(f"__dl_{c}").cast(by_type[c])
            ).drop(f"__dl_{c}")
        for phys, logical in renames.items():
            if phys in df.columns:
                df = df.withColumnRenamed(phys, logical)
        return df.drop("__dl_path")

    parts: list[DataFrame] = []
    if cdc_rows:
        df = attach(
            cdc_rows, spark.read.parquet(*[r[0] for r in cdc_rows])
        )
        parts.append(df.select(*out_cols))
    if add_rows:
        df = attach(
            add_rows, spark.read.parquet(*[r[0] for r in add_rows])
        ).withColumn("_change_type", F.lit("insert"))
        parts.append(df.select(*out_cols))
    if not parts:
        return spark.createDataFrame([], empty_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def compact_delta(
    spark: SparkSession,
    table_dir: str,
    target_files: int = 1,
    zorder_by: tuple[str, ...] = (),
) -> int:
    """OPTIMIZE for exported Delta tables: rewrite the current
    snapshot's files into ``target_files`` larger ones as one commit
    (removes + adds with ``dataChange=false``, Delta's bin-packing
    convention — streams tailing the table skip it as a no-data
    version... and OUR tail does too, because dataChange=false adds
    paired with removes refuse under the rewrite rule).  Older
    versions stay readable until ``vacuum_delta`` reclaims them.

    ``zorder_by`` (r15) is Delta's ``OPTIMIZE ZORDER BY``: NUMERIC
    columns are bucketed onto a min/max-scaled grid (one aggregate
    pass; uniform buckets — the documented simplification vs Delta's
    range-partition-id buckets, weaker under heavy skew), their bits
    Morton-interleaved (operators/zorder.py, pure codegen
    expressions), and the rewrite range-partitions + sorts on that
    key — so every output file has a tight min/max envelope in ALL
    the named dimensions and any stats-pruning reader (including
    other engines) skips files on any of them."""
    import uuid

    import pyarrow.parquet as pq

    adds, meta, version, _proto = _snapshot_state(spark, table_dir, None)
    if not adds:
        raise DeltaProtocolError("nothing to compact: no live files")
    df = read_delta(spark, table_dir)
    part_cols = list(meta.get("partitionColumns") or [])
    if part_cols:
        raise DeltaProtocolError(
            "compact_delta handles unpartitioned exports; compact "
            "partitioned tables per-partition upstream"
        )
    stage = os.path.join(table_dir, f"_staging-{uuid.uuid4().hex[:12]}")
    n_out = max(1, int(target_files))
    if zorder_by:
        from ..operators.zorder import bucket, zvalue_n

        numeric = {
            f.name for f in df.schema.fields
            if f.dataType.simpleString() in (
                "tinyint", "smallint", "int", "bigint", "float",
                "double",
            ) or f.dataType.simpleString().startswith("decimal(")
        }
        bad = [c for c in zorder_by if c not in numeric]
        if bad:
            raise DeltaProtocolError(
                f"zorder_by supports numeric columns only; {bad} "
                "are not (bucket strings/dates upstream)"
            )
        bits = min(8, 63 // len(zorder_by))
        agg = df.agg(*[
            f(F.col(c).cast("double")).alias(f"{which}_{c}")
            for c in zorder_by
            for which, f in (("lo", F.min), ("hi", F.max))
        ]).first()
        grid = []
        for c in zorder_by:
            lo = float(agg[f"lo_{c}"])
            hi = float(agg[f"hi_{c}"])
            width = max((hi - lo) / (1 << bits), 1e-12)
            grid.append(
                bucket(F.col(c).cast("double"), lo, width, bits)
            )
        df = (
            df.withColumn("__dz", zvalue_n(grid, bits))
            .repartitionByRange(n_out, "__dz")
            .sortWithinPartitions("__dz")
            .drop("__dz")
        )
        df.write.mode("overwrite").parquet(stage)
    else:
        df.coalesce(n_out).write.mode("overwrite").parquet(stage)
    actions: list[dict] = [{"commitInfo": {
        "timestamp": int(os.path.getmtime(table_dir) * 1000),
        "operation": "OPTIMIZE",
    }}]
    new_version = version + 1
    for i, name in enumerate(sorted(os.listdir(stage))):
        if not name.endswith(".parquet"):
            continue
        rel = f"part-{new_version:05d}-{uuid.uuid4().hex}.parquet"
        dst = os.path.join(table_dir, rel)
        os.replace(os.path.join(stage, name), dst)
        md = pq.ParquetFile(dst).metadata
        stats: dict = {"numRecords": md.num_rows}
        if zorder_by:
            # per-file min/max for the clustered columns — the
            # envelope any stats-pruning reader skips files on
            lows: dict[str, float] = {}
            highs: dict[str, float] = {}
            idx = {
                md.schema.column(i).name: i
                for i in range(md.num_columns)
            }
            for c in zorder_by:
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    if st is None or not st.has_min_max:
                        continue
                    lows[c] = min(lows.get(c, st.min), st.min)
                    highs[c] = max(highs.get(c, st.max), st.max)
            if lows:
                stats["minValues"] = lows
                stats["maxValues"] = highs
        actions.append({"add": {
            "path": rel, "partitionValues": {},
            "size": os.path.getsize(dst),
            "modificationTime": int(os.path.getmtime(dst) * 1000),
            "dataChange": False,
            "stats": json.dumps(stats),
        }})
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    for rel in adds:
        actions.append({"remove": {
            "path": rel, "dataChange": False,
            "deletionTimestamp":
                int(os.path.getmtime(table_dir) * 1000),
        }})
    with open(os.path.join(
        table_dir, "_delta_log", f"{new_version:020d}.json"
    ), "x") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return new_version


def vacuum_delta(
    spark: SparkSession,
    table_dir: str,
    dry_run: bool = False,
    retention_hours: float = 168.0,
    force: bool = False,
) -> list[str]:
    """VACUUM for exported Delta tables: delete data files on disk
    that the CURRENT snapshot no longer references (superseded by
    overwrites/compactions) AND are older than ``retention_hours``
    (default 7 days, Delta's own default).  Returns the deleted (or,
    with ``dry_run``, the would-be-deleted) relative paths.

    The retention window is a safety interlock, not a nicety:
    ``write_delta`` moves data files into the table BEFORE publishing
    the commit JSON, so a zero-retention vacuum racing an in-flight
    writer would delete files the about-to-publish commit references,
    corrupting the table — and concurrent snapshot readers of older
    versions break the same way.  ``retention_hours <= 0`` therefore
    refuses unless ``force=True`` (safe only when no writer or
    time-travel reader can be active).  Time travel to versions
    needing the reclaimed files stops working afterwards — the same
    contract as Delta's VACUUM."""
    import time

    if retention_hours <= 0 and not force:
        raise DeltaProtocolError(
            "vacuum with retention_hours<=0 can race an in-flight "
            "writer (data files land before the commit JSON) and "
            "breaks concurrent snapshot readers; pass force=True "
            "only when the table is known quiescent"
        )
    cutoff = time.time() - max(retention_hours, 0.0) * 3600.0
    adds, _, _, _proto = _snapshot_state(spark, table_dir, None)
    live = {
        os.path.abspath(
            p if os.path.isabs(p) else os.path.join(table_dir, p)
        )
        for p in adds
    }
    doomed: list[str] = []
    for root, dirs, files in os.walk(table_dir):
        dirs[:] = [d for d in dirs
                   if d not in ("_delta_log", "_change_data")
                   and not d.startswith("_staging-")]
        for name in files:
            if not name.endswith(".parquet"):
                continue
            ap = os.path.abspath(os.path.join(root, name))
            if ap not in live and os.path.getmtime(ap) <= cutoff:
                doomed.append(os.path.relpath(ap, table_dir))
    if not dry_run:
        for rel in doomed:
            os.remove(os.path.join(table_dir, rel))
    return sorted(doomed)


def write_delta_checkpoint(spark: SparkSession, table_dir: str) -> int:
    """Materialize the current snapshot state as a protocol
    checkpoint (``{v:020d}.checkpoint.parquet`` + ``_last_checkpoint``)
    so readers of an exported table replay O(delta) JSON commits
    instead of the whole history — the scale half of ``write_delta``.
    Returns the checkpointed version."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, meta, v, protocol = _snapshot_state(spark, table_dir, None)
    rows = []
    rows.append({"add": None, "metaData": {
        "id": meta.get("id"),
        "schemaString": meta["schemaString"],
        "partitionColumns": list(meta.get("partitionColumns") or []),
        "configuration": dict(meta.get("configuration") or {}),
    }, "protocol": None})
    # the REPLAYED protocol, verbatim — re-synthesizing (1,2) here
    # would downgrade e.g. a minReaderVersion=3 deletion-vector table
    # in the eyes of every engine that reconstructs from this
    # checkpoint
    rows.append({"add": None, "metaData": None, "protocol": {
        "minReaderVersion": int(protocol.get("minReaderVersion", 1)),
        "minWriterVersion": int(protocol.get("minWriterVersion", 2)),
        "readerFeatures": protocol.get("readerFeatures"),
        "writerFeatures": protocol.get("writerFeatures"),
    }})
    for rel, a in adds.items():
        dv = a.get("deletionVector")
        rows.append({"add": {
            "path": rel,
            "partitionValues": dict(a.get("partitionValues") or {}),
            "size": int(a.get("size") or 0),
            "modificationTime": int(a.get("modificationTime") or 0),
            "dataChange": False,
            # preserved verbatim: dropping a live DV here would make
            # every checkpoint-based reconstruction silently resurrect
            # the deleted rows
            "deletionVector": None if not dv else {
                "storageType": dv.get("storageType"),
                "pathOrInlineDv": dv.get("pathOrInlineDv"),
                "offset": dv.get("offset"),
                "sizeInBytes": dv.get("sizeInBytes"),
                "cardinality": dv.get("cardinality"),
            },
        }, "metaData": None, "protocol": None})
    dv_t = pa.struct([
        ("storageType", pa.string()),
        ("pathOrInlineDv", pa.string()),
        ("offset", pa.int32()),
        ("sizeInBytes", pa.int32()),
        ("cardinality", pa.int64()),
    ])
    add_t = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
        ("deletionVector", dv_t),
    ])
    meta_t = pa.struct([
        ("id", pa.string()), ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", pa.map_(pa.string(), pa.string())),
    ])
    proto_t = pa.struct([
        ("minReaderVersion", pa.int32()),
        ("minWriterVersion", pa.int32()),
        ("readerFeatures", pa.list_(pa.string())),
        ("writerFeatures", pa.list_(pa.string())),
    ])

    def _map_ready(r):
        # pa.map_ wants pair lists, not dicts
        out = dict(r)
        if out["add"]:
            out["add"] = dict(out["add"])
            out["add"]["partitionValues"] = list(
                out["add"]["partitionValues"].items()
            )
        if out["metaData"]:
            out["metaData"] = dict(out["metaData"])
            out["metaData"]["configuration"] = list(
                out["metaData"]["configuration"].items()
            )
        return out

    tbl = pa.Table.from_pylist(
        [_map_ready(r) for r in rows],
        schema=pa.schema([
            ("add", add_t), ("metaData", meta_t), ("protocol", proto_t)
        ]),
    )
    log_dir = os.path.join(table_dir, "_delta_log")
    pq.write_table(
        tbl, os.path.join(log_dir, f"{v:020d}.checkpoint.parquet")
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as fh:
        json.dump({"version": v, "size": len(rows)}, fh)
    return v


def delta_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """One row per commit: version, timestamp, operation, add/remove
    counts — Delta's DESCRIBE HISTORY from the JSON log alone."""
    commits, _ = _list_log(table_dir)
    log_dir = os.path.join(table_dir, "_delta_log")
    rows = []
    for c in commits:
        acts = _read_commit(os.path.join(log_dir, f"{c:020d}.json"))
        info = next(
            (a["commitInfo"] for a in acts if a.get("commitInfo")), {}
        )
        rows.append(
            (
                c,
                int(info.get("timestamp") or 0),
                str(info.get("operation") or ""),
                sum(1 for a in acts if a.get("add")),
                sum(1 for a in acts if a.get("remove")),
            )
        )
    return spark.createDataFrame(
        rows,
        "version long, timestamp_ms long, operation string, "
        "n_added long, n_removed long",
    )
