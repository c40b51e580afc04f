"""Iceberg interop reader tests (sources/iceberg.py).

Fixtures are assembled per the public Iceberg table spec: metadata
JSON written literally, manifest-list/manifest files as real Avro
OCFs.  The Avro layer itself is independently spec-pinned byte-by-
byte in tests/test_avro.py, so using encode_ocf here to author the
manifests does not let a self-consistent reader+writer pair hide a
spec deviation at the TABLE level — every path, status code, and
content flag below is written against the spec's tables, not against
the reader.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import types as T

from artis_data_ingest_spark.sources.avro_ocf import encode_ocf
from artis_data_ingest_spark.sources.iceberg import (
    IcebergProtocolError,
    iceberg_snapshots,
    read_iceberg,
)

_MANIFEST_ENTRY_T = T.StructType([
    T.StructField("status", T.IntegerType(), False),
    T.StructField("snapshot_id", T.LongType(), True),
    T.StructField("data_file", T.StructType([
        T.StructField("content", T.IntegerType(), True),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("file_format", T.StringType(), False),
        T.StructField("record_count", T.LongType(), False),
        T.StructField("file_size_in_bytes", T.LongType(), False),
    ]), False),
])

_MANIFEST_LIST_T = T.StructType([
    T.StructField("manifest_path", T.StringType(), False),
    T.StructField("manifest_length", T.LongType(), False),
    T.StructField("partition_spec_id", T.IntegerType(), False),
    T.StructField("content", T.IntegerType(), True),
    T.StructField("added_snapshot_id", T.LongType(), True),
])

_FIELDS = [
    {"id": 1, "name": "id", "required": False, "type": "long"},
    {"id": 2, "name": "name", "required": False, "type": "string"},
]


def _write_avro_file(path: str, rows: list[dict], schema) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(encode_ocf(rows, schema))


def _data_file(table: str, rel: str, pdf: pd.DataFrame) -> dict:
    path = os.path.join(table, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pdf.to_parquet(path, index=False)
    return {"content": 0, "file_path": f"file://{path}",
            "file_format": "PARQUET", "record_count": len(pdf),
            "file_size_in_bytes": os.path.getsize(path)}


def _manifest(table: str, name: str, entries: list[dict]) -> dict:
    path = os.path.join(table, "metadata", name)
    _write_avro_file(path, entries, _MANIFEST_ENTRY_T)
    return {"manifest_path": f"file://{path}",
            "manifest_length": os.path.getsize(path),
            "partition_spec_id": 0, "content": 0,
            "added_snapshot_id": 1}


def _two_snapshot_table(tmp_path) -> str:
    """snap 100: files A,B.  snap 200: B deleted, C added, plus a
    position-delete file removing row 0 of A."""
    t = str(tmp_path / "ib")
    a = _data_file(t, "data/a.parquet",
                   pd.DataFrame({"id": [1, 2], "name": ["x", "y"]}))
    b = _data_file(t, "data/b.parquet",
                   pd.DataFrame({"id": [3], "name": ["z"]}))
    c = _data_file(t, "data/c.parquet",
                   pd.DataFrame({"id": [4], "name": ["w"]}))

    m1 = _manifest(t, "m1.avro", [
        {"status": 1, "snapshot_id": 100, "data_file": a},
        {"status": 1, "snapshot_id": 100, "data_file": b},
    ])
    _write_avro_file(os.path.join(t, "metadata", "snap-100.avro"),
                     [m1], _MANIFEST_LIST_T)

    # snapshot 200's manifest: A existing, B DELETED, C added
    m2 = _manifest(t, "m2.avro", [
        {"status": 0, "snapshot_id": 100, "data_file": a},
        {"status": 2, "snapshot_id": 200, "data_file": b},
        {"status": 1, "snapshot_id": 200, "data_file": c},
    ])
    # position-delete file: remove row 0 of A (id=1)
    del_pdf = pd.DataFrame({
        "file_path": [a["file_path"]], "pos": [0],
    })
    dpath = os.path.join(t, "data", "del-1.parquet")
    del_pdf.to_parquet(dpath, index=False)
    ddf = {"content": 1, "file_path": f"file://{dpath}",
           "file_format": "PARQUET", "record_count": 1,
           "file_size_in_bytes": os.path.getsize(dpath)}
    m3 = _manifest(t, "m3.avro", [
        {"status": 1, "snapshot_id": 200, "data_file": ddf},
    ])
    m3["content"] = 1  # delete manifest
    _write_avro_file(os.path.join(t, "metadata", "snap-200.avro"),
                     [m2, m3], _MANIFEST_LIST_T)

    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000001",
        "location": f"file://{t}",
        "current-snapshot-id": 200,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": _FIELDS}],
        "current-schema-id": 0,
        "snapshots": [
            {"snapshot-id": 100, "timestamp-ms": 1,
             "summary": {"operation": "append"},
             "manifest-list": f"file://{t}/metadata/snap-100.avro"},
            {"snapshot-id": 200, "timestamp-ms": 2,
             "summary": {"operation": "overwrite"},
             "manifest-list": f"file://{t}/metadata/snap-200.avro"},
        ],
    }
    os.makedirs(os.path.join(t, "metadata"), exist_ok=True)
    with open(os.path.join(t, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(t, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    return t


def test_current_snapshot_applies_status_and_position_deletes(
    spark, tmp_path
):
    t = _two_snapshot_table(tmp_path)
    got = {tuple(r) for r in read_iceberg(spark, t).collect()}
    # A minus row 0 (id=1 deleted), B gone (status DELETED), C added
    assert got == {(2, "y"), (4, "w")}


def test_pinned_older_snapshot(spark, tmp_path):
    t = _two_snapshot_table(tmp_path)
    got = {tuple(r)
           for r in read_iceberg(spark, t, snapshot_id=100).collect()}
    assert got == {(1, "x"), (2, "y"), (3, "z")}


def test_unknown_snapshot_raises(spark, tmp_path):
    t = _two_snapshot_table(tmp_path)
    with pytest.raises(IcebergProtocolError, match="snapshot 777"):
        read_iceberg(spark, t, snapshot_id=777)


def test_snapshots_listing(spark, tmp_path):
    t = _two_snapshot_table(tmp_path)
    rows = {r["snapshot_id"]: r
            for r in iceberg_snapshots(spark, t).collect()}
    assert rows[100]["operation"] == "append"
    assert rows[200]["is_current"] and not rows[100]["is_current"]


def test_version_hint_selects_metadata_version(spark, tmp_path):
    t = _two_snapshot_table(tmp_path)
    # a NEWER metadata file exists but the hint still names v1 —
    # the hint must win (spec: version-hint.text is authoritative
    # for the filesystem catalog)
    meta_dir = os.path.join(t, "metadata")
    with open(os.path.join(meta_dir, "v1.metadata.json")) as fh:
        meta = json.load(fh)
    meta["current-snapshot-id"] = 100
    with open(os.path.join(meta_dir, "v2.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    got = {tuple(r) for r in read_iceberg(spark, t).collect()}
    assert got == {(2, "y"), (4, "w")}  # still v1's current (snap 200)
    with open(os.path.join(meta_dir, "version-hint.text"), "w") as fh:
        fh.write("2")
    got2 = {tuple(r) for r in read_iceberg(spark, t).collect()}
    assert got2 == {(1, "x"), (2, "y"), (3, "z")}  # v2 pins snap 100


def test_format_version_1_inline_schema(spark, tmp_path):
    t = str(tmp_path / "ibv1")
    a = _data_file(t, "data/a.parquet",
                   pd.DataFrame({"id": [7], "name": ["v1"]}))
    m = _manifest(t, "m1.avro",
                  [{"status": 1, "snapshot_id": 1, "data_file": a}])
    _write_avro_file(os.path.join(t, "metadata", "snap-1.avro"),
                     [m], _MANIFEST_LIST_T)
    meta = {
        "format-version": 1,
        "location": f"file://{t}",
        "current-snapshot-id": 1,
        "schema": {"type": "struct", "fields": _FIELDS},
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1,
             "manifest-list": f"file://{t}/metadata/snap-1.avro"},
        ],
    }
    with open(os.path.join(t, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    assert [tuple(r) for r in read_iceberg(spark, t).collect()] == \
        [(7, "v1")]


def test_equality_delete_without_ids_refused(spark, tmp_path):
    t = _two_snapshot_table(tmp_path)
    meta_dir = os.path.join(t, "metadata")
    eq = {"content": 2, "file_path": f"file://{t}/data/eq.parquet",
          "file_format": "PARQUET", "record_count": 1,
          "file_size_in_bytes": 1}
    m = _manifest(t, "meq.avro",
                  [{"status": 1, "snapshot_id": 200, "data_file": eq}])
    lst = os.path.join(meta_dir, "snap-200.avro")
    # rebuild snap-200's manifest list with the equality manifest added
    from artis_data_ingest_spark.sources.avro_ocf import decode_ocf

    with open(lst, "rb") as fh:
        _, rows = decode_ocf(fh.read())
    rows.append(m)
    _write_avro_file(lst, rows, _MANIFEST_LIST_T)
    with pytest.raises(IcebergProtocolError, match="equality_ids"):
        read_iceberg(spark, t)


# spec-complete manifest shapes for equality-delete fixtures:
# sequence numbers on both levels, equality_ids on the data_file
_ENTRY_SEQ_T = T.StructType([
    T.StructField("status", T.IntegerType(), False),
    T.StructField("snapshot_id", T.LongType(), True),
    T.StructField("sequence_number", T.LongType(), True),
    T.StructField("data_file", T.StructType([
        T.StructField("content", T.IntegerType(), True),
        T.StructField("file_path", T.StringType(), False),
        T.StructField("file_format", T.StringType(), False),
        T.StructField("record_count", T.LongType(), False),
        T.StructField("file_size_in_bytes", T.LongType(), False),
        T.StructField("equality_ids",
                      T.ArrayType(T.IntegerType()), True),
    ]), False),
])

_LIST_SEQ_T = T.StructType([
    T.StructField("manifest_path", T.StringType(), False),
    T.StructField("manifest_length", T.LongType(), False),
    T.StructField("partition_spec_id", T.IntegerType(), False),
    T.StructField("content", T.IntegerType(), True),
    T.StructField("sequence_number", T.LongType(), True),
    T.StructField("added_snapshot_id", T.LongType(), True),
])


def _eq_delete_table(tmp_path) -> str:
    """The Flink-CDC upsert shape: snap 100 (seq 1) adds file A
    (ids 1,2,3).  snap 200 (seq 2) carries an equality delete on
    column ``id`` for ids {2, 4} AND a new data file B re-inserting
    id 2 and adding id 4 — both at seq 2, so per the strictly-less
    rule the delete hits only A's rows."""
    t = str(tmp_path / "ibeq")
    a = _data_file(t, "data/a.parquet",
                   pd.DataFrame({"id": [1, 2, 3],
                                 "name": ["x", "y", "z"]}))
    b = _data_file(t, "data/b.parquet",
                   pd.DataFrame({"id": [2, 4],
                                 "name": ["y2", "w"]}))
    eq_pdf = pd.DataFrame({"id": [2, 4]})
    epath = os.path.join(t, "data", "eq-1.parquet")
    eq_pdf.to_parquet(epath, index=False)
    e = {"content": 2, "file_path": f"file://{epath}",
         "file_format": "PARQUET", "record_count": 2,
         "file_size_in_bytes": os.path.getsize(epath),
         "equality_ids": [1]}

    def _mf(name, entries, content, seq):
        for en in entries:  # encoder wants every struct key present
            en["data_file"].setdefault("equality_ids", None)
        path = os.path.join(t, "metadata", name)
        _write_avro_file(path, entries, _ENTRY_SEQ_T)
        return {"manifest_path": f"file://{path}",
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "added_snapshot_id": 1}

    m1 = _mf("m1.avro",
             [{"status": 1, "snapshot_id": 100,
               "sequence_number": 1, "data_file": a}], 0, 1)
    _write_avro_file(os.path.join(t, "metadata", "snap-100.avro"),
                     [m1], _LIST_SEQ_T)
    m2 = _mf("m2.avro", [
        {"status": 0, "snapshot_id": 100, "sequence_number": 1,
         "data_file": a},
        # B's entry leaves sequence_number null → INHERITED from the
        # manifest list row (the v2 inheritance rule)
        {"status": 1, "snapshot_id": 200, "sequence_number": None,
         "data_file": b},
    ], 0, 2)
    m3 = _mf("m3.avro",
             [{"status": 1, "snapshot_id": 200,
               "sequence_number": 2, "data_file": e}], 1, 2)
    _write_avro_file(os.path.join(t, "metadata", "snap-200.avro"),
                     [m2, m3], _LIST_SEQ_T)
    meta = {
        "format-version": 2,
        "table-uuid": "00000000-0000-0000-0000-000000000002",
        "location": f"file://{t}",
        "current-snapshot-id": 200,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": _FIELDS}],
        "current-schema-id": 0,
        "snapshots": [
            {"snapshot-id": 100, "timestamp-ms": 1,
             "summary": {"operation": "append"},
             "manifest-list": f"file://{t}/metadata/snap-100.avro"},
            {"snapshot-id": 200, "timestamp-ms": 2,
             "summary": {"operation": "overwrite"},
             "manifest-list": f"file://{t}/metadata/snap-200.avro"},
        ],
    }
    with open(os.path.join(t, "metadata", "v1.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(t, "metadata", "version-hint.text"),
              "w") as fh:
        fh.write("1")
    return t


def test_equality_deletes_apply_with_sequence_scoping(spark, tmp_path):
    t = _eq_delete_table(tmp_path)
    got = {tuple(r) for r in read_iceberg(spark, t).collect()}
    # A loses id 2 (seq 1 < 2); B survives whole (seq 2 NOT < 2):
    # the upsert row y2 and the fresh id 4 both live
    assert got == {(1, "x"), (3, "z"), (2, "y2"), (4, "w")}
    # pinned old snapshot: no deletes yet
    got100 = {tuple(r)
              for r in read_iceberg(spark, t, snapshot_id=100).collect()}
    assert got100 == {(1, "x"), (2, "y"), (3, "z")}


def test_equality_delete_multi_column_and_nulls(spark, tmp_path):
    """Multi-column equality_ids match with IS NOT DISTINCT FROM
    semantics: a null in the delete row matches a null in the data."""
    t = str(tmp_path / "ibeqn")
    a = _data_file(t, "data/a.parquet", pd.DataFrame({
        "id": [1, 1, 2], "name": ["x", None, "x"],
    }))
    import pyarrow as pa
    import pyarrow.parquet as pq

    epath = os.path.join(t, "data", "eq.parquet")
    pq.write_table(
        pa.table({"id": pa.array([1], pa.int64()),
                  "name": pa.array([None], pa.string())}),
        epath,
    )
    e = {"content": 2, "file_path": f"file://{epath}",
         "file_format": "PARQUET", "record_count": 1,
         "file_size_in_bytes": os.path.getsize(epath),
         "equality_ids": [1, 2]}

    def _mf(name, entries, content, seq):
        for en in entries:  # encoder wants every struct key present
            en["data_file"].setdefault("equality_ids", None)
        path = os.path.join(t, "metadata", name)
        _write_avro_file(path, entries, _ENTRY_SEQ_T)
        return {"manifest_path": f"file://{path}",
                "manifest_length": os.path.getsize(path),
                "partition_spec_id": 0, "content": content,
                "sequence_number": seq, "added_snapshot_id": 1}

    m1 = _mf("m1.avro",
             [{"status": 1, "snapshot_id": 1, "sequence_number": 1,
               "data_file": a}], 0, 1)
    m2 = _mf("m2.avro",
             [{"status": 1, "snapshot_id": 2, "sequence_number": 2,
               "data_file": e}], 1, 2)
    _write_avro_file(os.path.join(t, "metadata", "snap-2.avro"),
                     [m1, m2], _LIST_SEQ_T)
    meta = {
        "format-version": 2, "location": f"file://{t}",
        "current-snapshot-id": 2,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": _FIELDS}],
        "current-schema-id": 0,
        "snapshots": [{"snapshot-id": 2, "timestamp-ms": 1,
                       "manifest-list":
                       f"file://{t}/metadata/snap-2.avro"}],
    }
    with open(os.path.join(t, "metadata", "v1.metadata.json"),
              "w") as fh:
        json.dump(meta, fh)
    got = {tuple(r) for r in read_iceberg(spark, t).collect()}
    # only (1, NULL) dies; (1, x) and (2, x) survive
    assert got == {(1, "x"), (2, "x")}


def test_incremental_appends_refuse_new_equality_deletes(
    spark, tmp_path
):
    from artis_data_ingest_spark.sources.iceberg import (
        read_iceberg_appends,
    )

    t = _eq_delete_table(tmp_path)
    with pytest.raises(IcebergProtocolError, match="equality-delete"):
        read_iceberg_appends(spark, t, from_snapshot=100)


def test_non_parquet_file_refused(spark, tmp_path):
    t = str(tmp_path / "iborc")
    a = _data_file(t, "data/a.parquet",
                   pd.DataFrame({"id": [1], "name": ["x"]}))
    a["file_format"] = "ORC"
    m = _manifest(t, "m1.avro",
                  [{"status": 1, "snapshot_id": 1, "data_file": a}])
    _write_avro_file(os.path.join(t, "metadata", "snap-1.avro"),
                     [m], _MANIFEST_LIST_T)
    meta = {
        "format-version": 2, "location": f"file://{t}",
        "current-snapshot-id": 1,
        "schemas": [{"schema-id": 0, "type": "struct",
                     "fields": _FIELDS}],
        "current-schema-id": 0,
        "snapshots": [{"snapshot-id": 1, "timestamp-ms": 1,
                       "manifest-list":
                       f"file://{t}/metadata/snap-1.avro"}],
    }
    with open(os.path.join(t, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with pytest.raises(IcebergProtocolError, match="ORC"):
        read_iceberg(spark, t)


def test_type_mapping_decimal_date_timestamptz():
    from artis_data_ingest_spark.sources.iceberg import (
        _iceberg_type_to_spark,
    )

    st = _iceberg_type_to_spark({
        "type": "struct",
        "fields": [
            {"id": 1, "name": "d", "required": True,
             "type": "decimal(12, 3)"},
            {"id": 2, "name": "dt", "required": False, "type": "date"},
            {"id": 3, "name": "ts", "required": False,
             "type": "timestamptz"},
            {"id": 4, "name": "tsn", "required": False,
             "type": "timestamp"},
            {"id": 5, "name": "xs", "required": False,
             "type": {"type": "list", "element": "long",
                      "element-required": True}},
        ],
    })
    assert st["d"].dataType == T.DecimalType(12, 3)
    assert not st["d"].nullable
    assert st["dt"].dataType == T.DateType()
    assert st["ts"].dataType == T.TimestampType()
    assert st["tsn"].dataType == T.TimestampNTZType()
    assert st["xs"].dataType == T.ArrayType(T.LongType(),
                                            containsNull=False)


def test_missing_metadata_raises(spark, tmp_path):
    with pytest.raises(IcebergProtocolError, match="metadata"):
        read_iceberg(spark, str(tmp_path))


# --------------------------------------------------------------------------
# writer (export half)
# --------------------------------------------------------------------------


def test_write_iceberg_roundtrip_and_append(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        read_iceberg_appends,
        write_iceberg,
    )

    t = str(tmp_path / "out")
    s1 = write_iceberg(
        spark.createDataFrame([(1, "a"), (2, "b")],
                              "id long, s string").repartition(2), t)
    s2 = write_iceberg(
        spark.createDataFrame([(3, "c")], "id long, s string"), t,
        mode="append")
    assert (s1, s2) == (1, 2)
    assert {tuple(r) for r in read_iceberg(spark, t).collect()} == \
        {(1, "a"), (2, "b"), (3, "c")}
    # the prior snapshot stays readable (manifests carried forward)
    assert {tuple(r)
            for r in read_iceberg(spark, t, snapshot_id=1).collect()} \
        == {(1, "a"), (2, "b")}
    tail = read_iceberg_appends(spark, t, from_snapshot=1)
    assert [tuple(r) for r in tail.collect()] == [(3, "c")]
    snaps = {r["snapshot_id"]: r
             for r in iceberg_snapshots(spark, t).collect()}
    assert snaps[2]["is_current"] and not snaps[1]["is_current"]


def test_write_iceberg_mode_error_refuses_existing(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import write_iceberg

    t = str(tmp_path / "oute")
    write_iceberg(spark.createDataFrame([(1,)], "id long"), t)
    with pytest.raises(IcebergProtocolError, match="already holds"):
        write_iceberg(spark.createDataFrame([(2,)], "id long"), t)


def test_write_iceberg_unsupported_type_refuses(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import write_iceberg

    df = spark.createDataFrame([([1, 2],)], "xs array<int>")
    with pytest.raises(IcebergProtocolError, match="no Iceberg"):
        write_iceberg(df, str(tmp_path / "outt"))


# --------------------------------------------------------------------------
# iceberg_feed Structured Streaming source
# --------------------------------------------------------------------------


def _run_ib_feed(spark, table, sink, ckpt, **opts):
    from artis_data_ingest_spark.streaming.iceberg_feed import (
        register_iceberg_feed,
    )

    register_iceberg_feed(spark)
    reader = spark.readStream.format("iceberg_feed").option(
        "path", table
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    return spark.read.parquet(sink)


def test_iceberg_feed_streams_appends_exactly_once(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import write_iceberg

    t = str(tmp_path / "ibf")
    write_iceberg(spark.createDataFrame([(1, "a")],
                                        "id long, s string"), t)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    out = _run_ib_feed(spark, t, sink, ckpt)
    assert {tuple(r) for r in out.collect()} == {(1, "a", 1)}
    write_iceberg(spark.createDataFrame([(2, "b")],
                                        "id long, s string"), t,
                  mode="append")
    out2 = _run_ib_feed(spark, t, sink, ckpt)  # same checkpoint
    assert {tuple(r) for r in out2.collect()} == \
        {(1, "a", 1), (2, "b", 2)}


def test_iceberg_feed_refuses_non_append_history(spark, tmp_path):
    from pyspark.errors.exceptions.captured import (
        StreamingQueryException,
    )

    t = _two_snapshot_table(tmp_path)  # 100→200 hop is non-append
    with pytest.raises(StreamingQueryException, match="append"):
        _run_ib_feed(spark, t, str(tmp_path / "s"),
                     str(tmp_path / "c"))


def test_iceberg_feed_starting_snapshot_skips_history(spark,
                                                      tmp_path):
    t = _two_snapshot_table(tmp_path)
    _append_snapshot_300(t)
    out = _run_ib_feed(spark, t, str(tmp_path / "s"),
                       str(tmp_path / "c"),
                       startingSnapshotId="200")
    assert {tuple(r) for r in out.collect()} == \
        {(8, "n8", 300), (9, "n9", 300)}


# --------------------------------------------------------------------------
# incremental append tailing
# --------------------------------------------------------------------------


def _append_snapshot_300(t: str) -> None:
    """Extend the two-snapshot fixture with an append-only snap 300."""
    d = _data_file(t, "data/d.parquet",
                   pd.DataFrame({"id": [8, 9], "name": ["n8", "n9"]}))
    m4 = _manifest(t, "m4.avro", [
        {"status": 1, "snapshot_id": 300, "data_file": d},
    ])
    from artis_data_ingest_spark.sources.avro_ocf import decode_ocf

    with open(os.path.join(t, "metadata", "snap-200.avro"), "rb") as fh:
        _, prev = decode_ocf(fh.read())
    _write_avro_file(os.path.join(t, "metadata", "snap-300.avro"),
                     prev + [m4], _MANIFEST_LIST_T)
    mpath = os.path.join(t, "metadata", "v1.metadata.json")
    with open(mpath) as fh:
        meta = json.load(fh)
    meta["snapshots"].append(
        {"snapshot-id": 300, "timestamp-ms": 3,
         "summary": {"operation": "append"},
         "manifest-list": f"file://{t}/metadata/snap-300.avro"})
    meta["current-snapshot-id"] = 300
    with open(mpath, "w") as fh:
        json.dump(meta, fh)


def test_appends_between_snapshots(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        read_iceberg_appends,
    )

    t = _two_snapshot_table(tmp_path)
    _append_snapshot_300(t)
    tail = read_iceberg_appends(spark, t, from_snapshot=200)
    assert {tuple(r) for r in tail.collect()} == {(8, "n8"), (9, "n9")}
    # same from/to → empty, schema intact
    none = read_iceberg_appends(spark, t, from_snapshot=300,
                                to_snapshot=300)
    assert none.count() == 0 and none.columns == ["id", "name"]


def test_appends_refuse_non_append_evolution(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        read_iceberg_appends,
    )

    t = _two_snapshot_table(tmp_path)
    # 100→200 drops file B and adds position deletes — both non-append
    with pytest.raises(IcebergProtocolError, match="dropped"):
        read_iceberg_appends(spark, t, from_snapshot=100,
                             to_snapshot=200)


def test_write_iceberg_append_enforces_schema(spark, tmp_path):
    """An append whose (name, type) list drifted from the table's
    current schema must refuse (mirrors write_delta): silently mixing
    schemas makes later reads fail confusingly or null-fill."""
    from artis_data_ingest_spark.sources.iceberg import (
        IcebergProtocolError,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "enf")
    write_iceberg(
        spark.createDataFrame([(1, "a")], "id long, s string"), t
    )
    with pytest.raises(IcebergProtocolError, match="schema mismatch"):
        write_iceberg(spark.createDataFrame([(2,)], "id long"), t,
                      mode="append")
    with pytest.raises(IcebergProtocolError, match="schema mismatch"):
        write_iceberg(
            spark.createDataFrame([(2, "b")], "id long, renamed string"),
            t, mode="append")
    with pytest.raises(IcebergProtocolError, match="schema mismatch"):
        write_iceberg(
            spark.createDataFrame([(2, 3)], "id long, s long"),
            t, mode="append")
    # conforming append still lands
    write_iceberg(
        spark.createDataFrame([(2, "b")], "id long, s string"), t,
        mode="append")
    assert read_iceberg(spark, t).count() == 2


def test_write_iceberg_partitioned_identity(spark, tmp_path):
    """Identity-transform partitioned writes: col=value layout,
    columns retained in the data files, typed partition tuples in
    the manifests, spec recorded, appends enforce the spec."""
    from artis_data_ingest_spark.sources.avro_ocf import decode_ocf
    from artis_data_ingest_spark.sources.iceberg import (
        read_iceberg_appends,
        write_iceberg,
    )

    t = str(tmp_path / "ibp")
    df = spark.range(0, 30).selectExpr(
        "id", "cast(id % 3 as string) as g"
    )
    s1 = write_iceberg(df, t, partition_by=("g",))
    got = read_iceberg(spark, t)
    assert got.count() == 30
    assert set(got.columns) == {"id", "g"}          # g kept in data
    assert got.where("g = '2'").count() == 10       # predicate read
    assert sorted(os.listdir(os.path.join(t, "data"))) == \
        ["g=0", "g=1", "g=2"]
    # manifest entries carry typed partition tuples
    import glob

    m = sorted(glob.glob(os.path.join(t, "metadata", "m-*.avro")))[0]
    with open(m, "rb") as fh:
        _, entries = decode_ocf(fh.read())
    parts = {e["data_file"]["partition"]["g"] for e in entries}
    assert parts == {"0", "1", "2"}
    # the spec is recorded with identity transform + convention ids
    meta = json.load(open(os.path.join(t, "metadata",
                                       "v1.metadata.json")))
    (spec,) = meta["partition-specs"]
    assert spec["fields"] == [{"name": "g", "transform": "identity",
                               "source-id": 2, "field-id": 1000}]
    # append keeps working and is incrementally readable
    df2 = spark.range(30, 42).selectExpr(
        "id", "cast(id % 3 as string) as g"
    )
    write_iceberg(df2, t, mode="append", partition_by=("g",))
    assert read_iceberg(spark, t).count() == 42
    assert read_iceberg_appends(spark, t, from_snapshot=s1).count() == 12
    # partitioning drift refuses both ways
    with pytest.raises(IcebergProtocolError, match="partitioning"):
        write_iceberg(df2, t, mode="append")
    t2 = str(tmp_path / "ibp2")
    write_iceberg(df, t2)
    with pytest.raises(IcebergProtocolError, match="partitioning"):
        write_iceberg(df2, t2, mode="append", partition_by=("g",))


def test_write_iceberg_partition_type_guards(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import write_iceberg

    t = str(tmp_path / "ibpt")
    df = spark.range(3).selectExpr("id", "id * 0.5 as v")
    with pytest.raises(IcebergProtocolError, match="identity"):
        write_iceberg(df, t, partition_by=("v",))
    with pytest.raises(IcebergProtocolError, match="absent"):
        write_iceberg(df, t, partition_by=("nope",))


# --------------------------------------------------------------------------
# delete_iceberg_where — position-delete writes
# --------------------------------------------------------------------------


def test_delete_where_masks_rows_and_time_travels(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        delete_iceberg_where,
        iceberg_snapshots,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibdel")
    df = spark.range(20).selectExpr("id", "id % 4 as g")
    s1 = write_iceberg(df.repartition(3), t)
    s2 = delete_iceberg_where(spark, t, "g = 1")
    assert s2 == s1 + 1
    got = {r["id"] for r in read_iceberg(spark, t).collect()}
    assert got == {i for i in range(20) if i % 4 != 1}
    # time travel: the pre-delete snapshot still has every row
    assert read_iceberg(spark, t, snapshot_id=s1).count() == 20
    ops = {r["snapshot_id"]: r["operation"]
           for r in iceberg_snapshots(spark, t).collect()}
    assert ops[s2] == "delete"


def test_delete_where_stacks_and_counts_exactly(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        delete_iceberg_where,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibdel2")
    df = spark.range(30).selectExpr("id", "id % 5 as g")
    write_iceberg(df.repartition(2), t)
    delete_iceberg_where(spark, t, "g = 0")
    # second delete over an overlapping predicate: rows already
    # position-deleted are masked before matching, so this commits
    # only the g=2 rows
    s3 = delete_iceberg_where(spark, t, "g IN (0, 2)")
    got = {r["id"] for r in read_iceberg(spark, t).collect()}
    assert got == {i for i in range(30) if i % 5 not in (0, 2)}
    # the second delete file lists exactly the g=2 rows
    import glob
    import pyarrow.parquet as pq

    dels = sorted(glob.glob(os.path.join(t, "data", "delete-*")))
    assert len(dels) == 2
    assert pq.read_table(dels[-1]).num_rows == 6


def test_delete_where_no_match_is_noop(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        delete_iceberg_where,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibdel3")
    df = spark.range(5).selectExpr("id")
    s1 = write_iceberg(df, t)
    assert delete_iceberg_where(spark, t, "id > 100") == s1
    assert read_iceberg(spark, t).count() == 5


def test_delete_where_appends_after_delete(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        delete_iceberg_where,
        read_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibdel4")
    df = spark.range(10).selectExpr("id")
    write_iceberg(df, t)
    delete_iceberg_where(spark, t, "id < 3")
    write_iceberg(
        spark.range(100, 103).selectExpr("id"), t, mode="append"
    )
    got = {r["id"] for r in read_iceberg(spark, t).collect()}
    assert got == set(range(3, 10)) | {100, 101, 102}


# --------------------------------------------------------------------------
# expire_iceberg_snapshots + vacuum_iceberg — maintenance lifecycle
# --------------------------------------------------------------------------


def test_expire_then_vacuum_reclaims_only_expired(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        read_iceberg,
        vacuum_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibgc")
    s1 = write_iceberg(
        spark.range(4).selectExpr("id"), t
    )
    s2 = write_iceberg(
        spark.range(10, 13).selectExpr("id"), t, mode="append"
    )
    # nothing unreferenced yet: dry-run vacuum with force finds none
    assert vacuum_iceberg(t, dry_run=True, retention_hours=0,
                          force=True) == []
    expired = expire_iceberg_snapshots(t, keep_last=1)
    assert expired == [s1]
    # current snapshot still reads fine; time travel to s1 is gone
    assert read_iceberg(spark, t).count() == 7
    with pytest.raises(IcebergProtocolError, match="not in the log"):
        read_iceberg(spark, t, snapshot_id=s1)
    # s2 (append) still references s1's data files, so vacuum keeps
    # them; only s1's now-unreferenced manifest list goes
    doomed = vacuum_iceberg(t, retention_hours=0, force=True)
    assert all(d.endswith(".avro") for d in doomed)
    assert read_iceberg(spark, t).count() == 7
    assert s2 == read_iceberg(spark, t).count() - 5  # s2 == 2


def test_vacuum_reclaims_overwritten_files(spark, tmp_path):
    import os

    from artis_data_ingest_spark.sources.iceberg import (
        delete_iceberg_where,
        expire_iceberg_snapshots,
        read_iceberg,
        vacuum_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibgc2")
    write_iceberg(spark.range(6).selectExpr("id"), t)
    delete_iceberg_where(spark, t, "id < 2")
    n_before = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(t, "data"))
    )
    expire_iceberg_snapshots(t, keep_last=1)
    doomed = vacuum_iceberg(t, retention_hours=0, force=True)
    # the delete snapshot still references the original data file
    # (position deletes point into it) — nothing from data/ may go
    assert not any(d.startswith("data/") and "delete-" not in d
                   for d in doomed)
    assert {r["id"] for r in read_iceberg(spark, t).collect()} == \
        {2, 3, 4, 5}
    n_after = sum(
        len(fs) for _, _, fs in os.walk(os.path.join(t, "data"))
    )
    assert n_after == n_before


def test_vacuum_retention_interlock(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        vacuum_iceberg,
        write_iceberg,
    )

    t = str(tmp_path / "ibgc3")
    write_iceberg(spark.range(3).selectExpr("id"), t)
    write_iceberg(spark.range(3).selectExpr("id"), t, mode="append")
    with pytest.raises(IcebergProtocolError, match="quiescent"):
        vacuum_iceberg(t, retention_hours=0)
    expire_iceberg_snapshots(t, keep_last=1)
    # fresh files sit inside the retention window: default vacuum
    # deletes nothing even though a manifest list is unreferenced
    assert vacuum_iceberg(t) == []


def test_expire_guards(spark, tmp_path):
    from artis_data_ingest_spark.sources.iceberg import (
        expire_iceberg_snapshots,
        write_iceberg,
    )

    t = str(tmp_path / "ibgc4")
    write_iceberg(spark.range(2).selectExpr("id"), t)
    with pytest.raises(ValueError, match=">= 1"):
        expire_iceberg_snapshots(t, keep_last=0)
    assert expire_iceberg_snapshots(t, keep_last=5) == []
