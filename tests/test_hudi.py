"""Hudi COW interop reader tests (sources/hudi.py).

Fixtures are laid out by hand per the public Hudi storage spec —
timeline files written literally, base files named
``{fileId}_{writeToken}_{instant}.parquet`` — so the reader is tested
against the documented layout, not against any writer of ours.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from artis_data_ingest_spark.sources.hudi import (
    HudiProtocolError,
    hudi_timeline,
    read_hudi,
)


def _commit(t: str, instant: str, kind: str = "commit",
            body: dict | None = None) -> None:
    hoodie = os.path.join(t, ".hoodie")
    os.makedirs(hoodie, exist_ok=True)
    with open(os.path.join(hoodie, f"{instant}.{kind}"), "w") as fh:
        json.dump(body or {}, fh)


def _base_file(t: str, part: str, file_id: str, instant: str,
               pdf: pd.DataFrame, token: str = "1-0-1") -> None:
    d = os.path.join(t, part) if part else t
    os.makedirs(d, exist_ok=True)
    pdf.to_parquet(
        os.path.join(d, f"{file_id}_{token}_{instant}.parquet"),
        index=False,
    )


def _cow_table(tmp_path) -> str:
    """fg-a: slice @001 (ids 1,2) superseded by slice @003 (ids 1,2,9);
    fg-b: slice @002 (id 3).  An UNCOMMITTED slice of fg-b @004 sits
    on disk with only an inflight marker."""
    t = str(tmp_path / "hudi")
    _base_file(t, "", "fg-a", "001",
               pd.DataFrame({"id": [1, 2], "v": ["x", "y"]}))
    _commit(t, "001")
    _base_file(t, "", "fg-b", "002",
               pd.DataFrame({"id": [3], "v": ["z"]}))
    _commit(t, "002")
    _base_file(t, "", "fg-a", "003",
               pd.DataFrame({"id": [1, 2, 9], "v": ["x2", "y2", "n"]}))
    _commit(t, "003")
    # torn write: data present, instant not completed
    _base_file(t, "", "fg-b", "004",
               pd.DataFrame({"id": [99], "v": ["torn"]}))
    hoodie = os.path.join(t, ".hoodie")
    with open(os.path.join(hoodie, "004.commit.inflight"), "w"):
        pass
    return t


def test_latest_snapshot_newest_slice_per_group(spark, tmp_path):
    t = _cow_table(tmp_path)
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {(1, "x2"), (2, "y2"), (9, "n"), (3, "z")}


def test_uncommitted_slice_is_invisible(spark, tmp_path):
    t = _cow_table(tmp_path)
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert (99, "torn") not in got
    # completing the instant makes it the newest fg-b slice
    _commit(t, "004")
    got2 = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert (99, "torn") in got2 and (3, "z") not in got2


def test_time_travel_as_of_instant(spark, tmp_path):
    t = _cow_table(tmp_path)
    got = {tuple(r)
           for r in read_hudi(spark, t, as_of_instant="002").collect()}
    assert got == {(1, "x"), (2, "y"), (3, "z")}
    with pytest.raises(HudiProtocolError, match="no completed"):
        read_hudi(spark, t, as_of_instant="000")


def test_replacecommit_kills_file_group(spark, tmp_path):
    t = _cow_table(tmp_path)
    # clustering: fg-a replaced by fg-c at instant 005
    _base_file(t, "", "fg-c", "005",
               pd.DataFrame({"id": [7], "v": ["clustered"]}))
    _commit(t, "005", kind="replacecommit",
            body={"partitionToReplaceFileIds": {"": ["fg-a"]}})
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {(7, "clustered"), (3, "z")}
    # time travel BEFORE the replace still sees fg-a
    old = {tuple(r)
           for r in read_hudi(spark, t, as_of_instant="003").collect()}
    assert (1, "x2") in old


def test_partitioned_layout(spark, tmp_path):
    t = str(tmp_path / "hudip")
    _base_file(t, "region=eu", "fg-1", "001",
               pd.DataFrame({"id": [1], "region": ["eu"]}))
    _base_file(t, "region=us", "fg-2", "001",
               pd.DataFrame({"id": [2], "region": ["us"]}))
    _commit(t, "001")
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {(1, "eu"), (2, "us")}


def test_log_for_unseen_base_slice_is_invisible(spark, tmp_path):
    """A log file tied to a base instant that never committed belongs
    to a torn slice — skipped, like the torn base file itself."""
    t = _cow_table(tmp_path)
    with open(os.path.join(
        t, ".fg-b_20240101.log.1_1-0-1"
    ), "wb") as fh:
        fh.write(b"whatever: never read")
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {(1, "x2"), (2, "y2"), (9, "n"), (3, "z")}


# --------------------------------------------------------------------------
# merge-on-read (r15): log codec framing + snapshot merge semantics
# --------------------------------------------------------------------------

from pyspark.sql import types as T  # noqa: E402

_MOR_SCHEMA = T.StructType([
    T.StructField("_hoodie_record_key", T.StringType(), True),
    T.StructField("v", T.StringType(), True),
])


def test_hudi_log_codec_framing_roundtrip():
    from artis_data_ingest_spark.sources.hudi_log import (
        AVRO_DATA_BLOCK,
        DELETE_BLOCK,
        INSTANT_TIME,
        HudiLogError,
        decode_blocks,
        encode_block,
        log_records,
    )

    b1 = encode_block(AVRO_DATA_BLOCK, {INSTANT_TIME: "002"}, b"abc")
    b2 = encode_block(DELETE_BLOCK, {INSTANT_TIME: "003"}, b"xyz")
    blocks = decode_blocks(b1 + b2)
    assert [b["type"] for b in blocks] == [AVRO_DATA_BLOCK,
                                           DELETE_BLOCK]
    assert blocks[0]["headers"][INSTANT_TIME] == "002"
    assert blocks[1]["content"] == b"xyz"
    # framing fields are spec-shaped: magic then int64 BE total
    assert b1[:6] == b"#HUDI#"
    import struct

    (total,) = struct.unpack(">q", b1[6:14])
    assert total == len(b1) - 14
    with pytest.raises(HudiLogError, match="magic"):
        decode_blocks(b"not a log")
    # instant gating: uncommitted / beyond-ceiling blocks invisible
    from artis_data_ingest_spark.sources.hudi_log import write_log_file
    import tempfile

    p = os.path.join(tempfile.mkdtemp(), "f.log")
    write_log_file(p, [
        ("data", "002", [{"_hoodie_record_key": "k1", "v": "a"}],
         _MOR_SCHEMA),
        ("data", "004", [{"_hoodie_record_key": "k2", "v": "b"}],
         _MOR_SCHEMA),
    ])
    data = open(p, "rb").read()
    recs = log_records(data, {"002", "004"}, "003")
    assert [r[3]["_hoodie_record_key"] for r in recs] == ["k1"]
    recs = log_records(data, {"002"}, "zzz")  # 004 not committed
    assert [r[3]["_hoodie_record_key"] for r in recs] == ["k1"]


def _mor_table(tmp_path) -> str:
    """fg-a base @001 (k1 x, k2 y, k3 z); deltacommit 002 upserts
    k2→y2 and inserts k4 w; deltacommit 003 deletes k3 and upserts
    k2→y3 (two log files against the same base slice)."""
    from artis_data_ingest_spark.sources.hudi_log import write_log_file

    t = str(tmp_path / "mor")
    _base_file(t, "", "fg-a", "001", pd.DataFrame({
        "_hoodie_record_key": ["k1", "k2", "k3"],
        "v": ["x", "y", "z"],
    }))
    _commit(t, "001")
    write_log_file(os.path.join(t, ".fg-a_001.log.1_1-0-1"), [
        ("data", "002",
         [{"_hoodie_record_key": "k2", "v": "y2"},
          {"_hoodie_record_key": "k4", "v": "w"}], _MOR_SCHEMA),
    ])
    _commit(t, "002", kind="deltacommit")
    write_log_file(os.path.join(t, ".fg-a_001.log.2_1-0-1"), [
        ("delete", "003", ["k3"]),
        ("data", "003",
         [{"_hoodie_record_key": "k2", "v": "y3"}], _MOR_SCHEMA),
    ])
    _commit(t, "003", kind="deltacommit")
    return t


def test_merge_on_read_upserts_and_deletes(spark, tmp_path):
    t = _mor_table(tmp_path)
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {("k1", "x"), ("k2", "y3"), ("k4", "w")}


def test_merge_on_read_time_travel(spark, tmp_path):
    t = _mor_table(tmp_path)
    at2 = {tuple(r)
           for r in read_hudi(spark, t, as_of_instant="002").collect()}
    assert at2 == {("k1", "x"), ("k2", "y2"), ("k3", "z"),
                   ("k4", "w")}
    at1 = {tuple(r)
           for r in read_hudi(spark, t, as_of_instant="001").collect()}
    assert at1 == {("k1", "x"), ("k2", "y"), ("k3", "z")}


def test_merge_on_read_uncommitted_log_block_invisible(spark,
                                                       tmp_path):
    from artis_data_ingest_spark.sources.hudi_log import write_log_file

    t = _mor_table(tmp_path)
    # a third log file whose instant is only INFLIGHT
    write_log_file(os.path.join(t, ".fg-a_001.log.3_1-0-1"), [
        ("data", "004",
         [{"_hoodie_record_key": "k1", "v": "torn"}], _MOR_SCHEMA),
    ])
    with open(os.path.join(t, ".hoodie",
                           "004.deltacommit.inflight"), "w"):
        pass
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert ("k1", "torn") not in got
    assert ("k1", "x") in got
    # completing it flips the row
    _commit(t, "004", kind="deltacommit")
    got2 = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert ("k1", "torn") in got2


def test_merge_on_read_compaction_supersedes_logs(spark, tmp_path):
    """A compaction commit writes a new base slice; logs tied to the
    OLD base instant are folded in and must not re-apply."""
    t = _mor_table(tmp_path)
    _base_file(t, "", "fg-a", "005", pd.DataFrame({
        "_hoodie_record_key": ["k1", "k2", "k4"],
        "v": ["x", "y3", "w"],
    }))
    _commit(t, "005")  # compaction completes as a commit
    got = {tuple(r) for r in read_hudi(spark, t).collect()}
    assert got == {("k1", "x"), ("k2", "y3"), ("k4", "w")}


def test_merge_on_read_corrupt_log_fails_loudly(spark, tmp_path):
    t = _mor_table(tmp_path)
    with open(os.path.join(t, ".fg-a_001.log.9_1-0-1"), "wb") as fh:
        fh.write(b"garbage that matches no magic")
    with pytest.raises(Exception, match="magic"):
        read_hudi(spark, t).collect()


def test_timeline_listing(spark, tmp_path):
    t = _cow_table(tmp_path)
    rows = {r["instant"]: r["kind"]
            for r in hudi_timeline(spark, t).collect()}
    assert rows == {"001": "commit", "002": "commit", "003": "commit"}


def test_missing_hoodie_raises(spark, tmp_path):
    with pytest.raises(HudiProtocolError, match=".hoodie"):
        read_hudi(spark, str(tmp_path))


# --------------------------------------------------------------------------
# incremental reads + hudi_feed streaming source
# --------------------------------------------------------------------------

_INC_SCHEMA = T.StructType([
    T.StructField("_hoodie_record_key", T.StringType(), True),
    T.StructField("_hoodie_commit_time", T.StringType(), True),
    T.StructField("v", T.StringType(), True),
])


def _inc_table(tmp_path) -> str:
    """Commit-time-stamped table: base @001 (k1 x, k2 y); COW upsert
    slice @002 rewrites the group with k2→y2 (stamped 002) and k3 w
    (new, stamped 002) while k1 keeps its 001 stamp; deltacommit 003
    log-upserts k1→x3."""
    from artis_data_ingest_spark.sources.hudi_log import write_log_file

    t = str(tmp_path / "inc")
    _base_file(t, "", "fg-a", "001", pd.DataFrame({
        "_hoodie_record_key": ["k1", "k2"],
        "_hoodie_commit_time": ["001", "001"],
        "v": ["x", "y"],
    }))
    _commit(t, "001")
    _base_file(t, "", "fg-a", "002", pd.DataFrame({
        "_hoodie_record_key": ["k1", "k2", "k3"],
        "_hoodie_commit_time": ["001", "002", "002"],
        "v": ["x", "y2", "w"],
    }))
    _commit(t, "002")
    write_log_file(os.path.join(t, ".fg-a_002.log.1_1-0-1"), [
        ("data", "003",
         [{"_hoodie_record_key": "k1", "_hoodie_commit_time": "003",
           "v": "x3"}], _INC_SCHEMA),
    ])
    _commit(t, "003", kind="deltacommit")
    return t


def test_incremental_windows(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi import (
        read_hudi_incremental,
    )

    t = _inc_table(tmp_path)
    after1 = {(r["_hoodie_record_key"], r["v"])
              for r in read_hudi_incremental(spark, t, "001").collect()}
    assert after1 == {("k1", "x3"), ("k2", "y2"), ("k3", "w")}
    only2 = {(r["_hoodie_record_key"], r["v"])
             for r in read_hudi_incremental(
                 spark, t, "001", "002").collect()}
    assert only2 == {("k2", "y2"), ("k3", "w")}
    assert read_hudi_incremental(spark, t, "003").count() == 0


def test_incremental_refuses_without_meta_column(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi import (
        read_hudi_incremental,
    )

    t = _cow_table(tmp_path)
    with pytest.raises(HudiProtocolError, match="_hoodie_commit_time"):
        read_hudi_incremental(spark, t, "001")


def _run_hudi_feed(spark, table, sink, ckpt, **opts):
    from artis_data_ingest_spark.streaming.hudi_feed import (
        register_hudi_feed,
    )

    register_hudi_feed(spark)
    reader = spark.readStream.format("hudi_feed").option("path", table)
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


def test_hudi_feed_emits_rows_once_per_instant(spark, tmp_path):
    t = _inc_table(tmp_path)
    out = _run_hudi_feed(spark, t, str(tmp_path / "s"),
                         str(tmp_path / "c"))
    got = {(r["_hoodie_record_key"], r["_hoodie_commit_time"], r["v"])
           for r in out.collect()}
    # 001 base rows once (the 002 rewrite must NOT re-emit k1),
    # 002's stamped rows, 003's log upsert
    assert got == {
        ("k1", "001", "x"), ("k2", "001", "y"),
        ("k2", "002", "y2"), ("k3", "002", "w"),
        ("k1", "003", "x3"),
    }


def test_hudi_feed_resume_is_exactly_once(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi_log import write_log_file

    t = _inc_table(tmp_path)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    n_first = _run_hudi_feed(spark, t, sink, ckpt).count()
    assert n_first == 5
    write_log_file(os.path.join(t, ".fg-a_002.log.2_1-0-1"), [
        ("data", "004",
         [{"_hoodie_record_key": "k4", "_hoodie_commit_time": "004",
           "v": "q"}], _INC_SCHEMA),
    ])
    _commit(t, "004", kind="deltacommit")
    out = _run_hudi_feed(spark, t, sink, ckpt)  # same checkpoint
    rows = sorted(
        (r["_hoodie_record_key"], r["_hoodie_commit_time"])
        for r in out.collect()
    )
    assert len(rows) == 6
    assert ("k4", "004") in rows


def test_hudi_feed_starting_instant_skips_history(spark, tmp_path):
    t = _inc_table(tmp_path)
    out = _run_hudi_feed(spark, t, str(tmp_path / "s"),
                         str(tmp_path / "c"), startingInstant="002")
    got = {(r["_hoodie_record_key"], r["v"]) for r in out.collect()}
    assert got == {("k1", "x3")}


def test_hudi_feed_refuses_without_meta_column(spark, tmp_path):
    from artis_data_ingest_spark.streaming.hudi_feed import (
        register_hudi_feed,
    )

    t = _cow_table(tmp_path)
    register_hudi_feed(spark)
    with pytest.raises(Exception, match="_hoodie_commit_time"):
        (spark.readStream.format("hudi_feed").option("path", t)
         .load())


# --------------------------------------------------------------------------
# write_hudi — COW writer
# --------------------------------------------------------------------------


def test_write_hudi_create_and_read_back(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi import (
        read_hudi,
        write_hudi,
    )

    t = str(tmp_path / "wh")
    df = spark.range(10).selectExpr("id", "cast(id % 3 as string) g")
    inst = write_hudi(df, t, record_key="id", n_file_groups=3)
    assert inst == f"{1:017d}"
    back = read_hudi(spark, t)
    assert {(r["id"], r["g"]) for r in back.collect()} == {
        (i, str(i % 3)) for i in range(10)
    }
    assert set(back.columns) >= {"_hoodie_record_key",
                                 "_hoodie_commit_time"}
    # one base file per file group
    files = [f for f in os.listdir(t) if f.endswith(".parquet")]
    assert len(files) == 3


def test_write_hudi_upsert_rewrites_only_touched_groups(spark,
                                                        tmp_path):
    from artis_data_ingest_spark.sources.hudi import (
        read_hudi,
        read_hudi_incremental,
        write_hudi,
    )

    t = str(tmp_path / "whu")
    df = spark.range(12).selectExpr("id", "cast(id as string) v")
    i1 = write_hudi(df, t, record_key="id", n_file_groups=4)
    upd = spark.createDataFrame(
        [(3, "three!"), (100, "new")], "id bigint, v string"
    )
    i2 = write_hudi(upd, t, mode="upsert")
    assert int(i2) == int(i1) + 1
    back = {(r["id"], r["v"], r["_hoodie_commit_time"])
            for r in read_hudi(spark, t).collect()}
    assert (3, "three!", i2) in back
    assert (100, "new", i2) in back
    # survivors keep their ORIGINAL commit time
    assert (4, "4", i1) in back
    assert len(back) == 13
    # incremental after i1 sees exactly the upsert
    inc = {(r["id"], r["v"])
           for r in read_hudi_incremental(spark, t, i1).collect()}
    assert inc == {(3, "three!"), (100, "new")}
    # untouched groups were NOT rewritten (still exactly 4 + touched)
    files = [f for f in os.listdir(t) if f.endswith(".parquet")]
    n_touched = len({f.split("_")[0] for f in files
                     if f.endswith(f"{i2}.parquet")})
    assert n_touched < 4
    # time travel to i1 shows the original rows
    at1 = {(r["id"], r["v"])
           for r in read_hudi(spark, t, as_of_instant=i1).collect()}
    assert (3, "3") in at1 and (100, "new") not in at1


def test_write_hudi_guards(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi import write_hudi

    t = str(tmp_path / "whg")
    df = spark.range(3).selectExpr("id", "cast(id as string) v")
    write_hudi(df, t, record_key="id")
    with pytest.raises(HudiProtocolError, match="already holds"):
        write_hudi(df, t, record_key="id")
    with pytest.raises(HudiProtocolError, match="record_key drift"):
        write_hudi(df, t, record_key="v", mode="upsert")
    with pytest.raises(HudiProtocolError, match="schema drift"):
        write_hudi(
            spark.range(2).selectExpr("id", "id * 2 as w"), t,
            mode="upsert",
        )
    with pytest.raises(HudiProtocolError, match="absent"):
        write_hudi(df.drop("id"), str(tmp_path / "x"),
                   record_key="id")


def test_write_hudi_roundtrips_through_lake_view(spark, tmp_path):
    from artis_data_ingest_spark.sources.hudi import write_hudi
    from artis_data_ingest_spark.sources.lake import lake_view

    t = str(tmp_path / "whl")
    write_hudi(
        spark.range(5).selectExpr("id", "cast(id as string) v"),
        t, record_key="id",
    )
    lake_view(spark, t, "wh_view")  # autodetected as hudi
    assert spark.sql(
        "SELECT COUNT(*) n FROM wh_view"
    ).collect()[0]["n"] == 5


def test_hudi_feed_max_files_per_trigger_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 splits the backlog across micro-batches
    (steady-state processingTime trigger — under availableNow the
    end offset is resolved once, so the cap bounds the whole run);
    every row still lands exactly once."""
    import glob as _glob
    import time

    from artis_data_ingest_spark.streaming.hudi_feed import (
        register_hudi_feed,
    )

    t = _inc_table(tmp_path)
    sink, ckpt = str(tmp_path / "s"), str(tmp_path / "c")
    register_hudi_feed(spark)
    q = (
        spark.readStream.format("hudi_feed").option("path", t)
        .option("maxFilesPerTrigger", "1").load()
        .writeStream.format("parquet").option("path", sink)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second").start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            try:
                if spark.read.parquet(sink).count() >= 5:
                    break
            except Exception:  # noqa: BLE001 - sink not created yet
                pass
            time.sleep(1)
    finally:
        q.stop()
    rows = {(r["_hoodie_record_key"], r["_hoodie_commit_time"])
            for r in spark.read.parquet(sink).collect()}
    assert rows == {("k1", "001"), ("k2", "001"), ("k2", "002"),
                    ("k3", "002"), ("k1", "003")}
    # the cap forced more than one committed micro-batch
    offsets = _glob.glob(os.path.join(ckpt, "offsets", "*"))
    assert len(offsets) >= 2
