"""Arrow IPC source/sink (sources/arrow_ipc.py)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.feather as feather
import pyarrow.ipc as ipc
import pytest

from artis_data_ingest_spark.sources.arrow_ipc import (
    ArrowIpcError,
    read_arrow_ipc,
    write_arrow_ipc,
)


def _file_fixture(path: str, ids, tag: str) -> str:
    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "tag": pa.array([tag] * len(ids), pa.string()),
    })
    feather.write_feather(tbl, path, compression="uncompressed")
    return path


def _stream_fixture(path: str, ids, tag: str) -> str:
    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "tag": pa.array([tag] * len(ids), pa.string()),
    })
    with pa.OSFile(path, "wb") as sink, \
            ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return path


def test_reads_file_and_stream_framings_together(spark, tmp_path):
    p1 = _file_fixture(str(tmp_path / "a.arrow"), [1, 2], "f")
    p2 = _stream_fixture(str(tmp_path / "b.arrows"), [3], "s")
    rows = {(r["id"], r["tag"], r["_source"])
            for r in read_arrow_ipc(spark, [p1, p2]).collect()}
    assert rows == {(1, "f", "a.arrow"), (2, "f", "a.arrow"),
                    (3, "s", "b.arrows")}


def test_glob_input(spark, tmp_path):
    _file_fixture(str(tmp_path / "x1.arrow"), [1], "a")
    _file_fixture(str(tmp_path / "x2.arrow"), [2], "b")
    df = read_arrow_ipc(spark, str(tmp_path / "x*.arrow"))
    assert df.count() == 2


def test_list_columns_roundtrip(spark, tmp_path):
    p = str(tmp_path / "emb.arrow")
    tbl = pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 2.0], [3.0, 4.0]],
                              pa.list_(pa.float32())),
    })
    feather.write_feather(tbl, p, compression="uncompressed")
    df = read_arrow_ipc(spark, [p])
    assert dict(df.dtypes)["embedding"] == "array<float>"
    got = {(r["vec_id"], tuple(r["embedding"]))
           for r in df.collect()}
    assert got == {(1, (1.0, 2.0)), (2, (3.0, 4.0))}


def test_schema_drift_refuses(spark, tmp_path):
    p1 = _file_fixture(str(tmp_path / "a.arrow"), [1], "x")
    p2 = str(tmp_path / "b.arrow")
    feather.write_feather(
        pa.table({"id": pa.array([2], pa.int32())}), p2,
        compression="uncompressed",
    )
    with pytest.raises(Exception, match="drifted"):
        read_arrow_ipc(spark, [p1, p2]).collect()


def test_not_arrow_refuses(spark, tmp_path):
    p = str(tmp_path / "bad.arrow")
    with open(p, "wb") as fh:
        fh.write(b"PK\x03\x04 definitely a zip, not arrow")
    with pytest.raises(ArrowIpcError, match="not an Arrow IPC"):
        read_arrow_ipc(spark, [p])


def test_sink_roundtrip_both_framings(spark, tmp_path):
    df = spark.range(100).selectExpr(
        "id", "cast(id % 7 as string) as g",
        "array(cast(id as float), cast(id * 2 as float)) as v",
    )
    for stream in (False, True):
        out = str(tmp_path / ("s" if stream else "f"))
        n = write_arrow_ipc(df.repartition(4), out, stream=stream)
        assert n == 4
        assert os.path.exists(os.path.join(out, "_SUCCESS"))
        ext = "arrows" if stream else "arrow"
        back = read_arrow_ipc(
            spark, os.path.join(out, f"part-*.{ext}")
        )
        assert back.count() == 100
        got = {(r["id"], r["g"], tuple(r["v"]))
               for r in back.collect()}
        assert (5, "5", (5.0, 10.0)) in got


def test_sink_compression_zstd(spark, tmp_path):
    df = spark.range(1000).selectExpr(
        "id", "repeat('a', 100) as pad"
    )
    plain = str(tmp_path / "plain")
    comp = str(tmp_path / "comp")
    write_arrow_ipc(df.coalesce(1), plain)
    write_arrow_ipc(df.coalesce(1), comp, compression="zstd")
    sz = lambda d: sum(  # noqa: E731
        os.path.getsize(os.path.join(d, f))
        for f in os.listdir(d) if f.endswith(".arrow")
    )
    assert sz(comp) < sz(plain)
    assert read_arrow_ipc(
        spark, os.path.join(comp, "part-*.arrow")
    ).count() == 1000
