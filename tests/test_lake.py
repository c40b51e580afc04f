"""Format-autodetecting lake views (sources/lake.py).

Each format's marker directory is laid out by hand (or via the
repo's own writers) and the unified ``lake_read``/``lake_view``
surface is checked against the format-native readers it dispatches
to — detection, refusal boundaries, and the SQL naming layer.
"""

from __future__ import annotations

import os

import pytest

from artis_data_ingest_spark.sources.lake import (
    LakeFormatError,
    detect_lake_format,
    lake_read,
    lake_view,
)


def _mk(d: str, *parts: str) -> None:
    os.makedirs(os.path.join(d, *parts), exist_ok=True)


def test_detection_by_marker(tmp_path):
    d = str(tmp_path / "d")
    _mk(d, "_delta_log")
    assert detect_lake_format(d) == "delta"
    i = str(tmp_path / "i")
    _mk(i, "metadata")
    with open(os.path.join(i, "metadata", "v1.metadata.json"),
              "w") as fh:
        fh.write("{}")
    assert detect_lake_format(i) == "iceberg"
    h = str(tmp_path / "h")
    _mk(h, ".hoodie")
    assert detect_lake_format(h) == "hudi"
    v = str(tmp_path / "v")
    _mk(v, "_manifests")
    assert detect_lake_format(v) == "versioned"


def test_detection_refuses_no_marker_and_ambiguity(tmp_path):
    with pytest.raises(LakeFormatError, match="no lake-format"):
        detect_lake_format(str(tmp_path))
    with pytest.raises(LakeFormatError, match="not a directory"):
        detect_lake_format(str(tmp_path / "absent"))
    d = str(tmp_path / "both")
    _mk(d, "_delta_log")
    _mk(d, ".hoodie")
    with pytest.raises(LakeFormatError, match="ambiguous"):
        detect_lake_format(d)


def test_version_exclusive_with_changes_since(spark, tmp_path):
    d = str(tmp_path / "d")
    _mk(d, "_delta_log")
    with pytest.raises(ValueError, match="exclusive"):
        lake_read(spark, d, version=1, changes_since=0)


def test_versioned_roundtrip_and_view(spark, tmp_path):
    from artis_data_ingest_spark.sinks.versioned import commit

    t = str(tmp_path / "vt")
    df = spark.range(5).withColumnRenamed("id", "k")
    commit(df, t)
    got = lake_read(spark, t)  # autodetected as 'versioned'
    assert sorted(r["k"] for r in got.collect()) == [0, 1, 2, 3, 4]
    lake_view(spark, t, "lv_t")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM lv_t"
    ).collect()[0]["n"] == 5


def test_versioned_changes_since_is_cdc(spark, tmp_path):
    from artis_data_ingest_spark.sinks.versioned import commit

    t = str(tmp_path / "vt")
    commit(spark.range(3).withColumnRenamed("id", "k"), t)
    commit(spark.createDataFrame([(7,)], "k bigint"), t,
           mode="append")
    feed = lake_read(spark, t, changes_since=0)
    rows = {(r["k"], r["_change_type"], r["_version"])
            for r in feed.collect()}
    assert rows == {(7, "insert", 1)}


def test_delta_snapshot_and_cdf_views(spark, tmp_path):
    from artis_data_ingest_spark.sources.delta import write_delta

    t = str(tmp_path / "dl")
    write_delta(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        t,
    )
    write_delta(
        spark.createDataFrame([(3, "c")], "k int, v string"),
        t, mode="append",
    )
    assert detect_lake_format(t) == "delta"
    lake_view(spark, t, "lv_delta")
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM lv_delta"
    ).collect()[0]["n"] == 3
    pinned = lake_read(spark, t, version=0)
    assert pinned.count() == 2
    feed = lake_read(spark, t, changes_since=0)
    assert {(r["k"], r["_change_type"]) for r in feed.collect()} == {
        (3, "insert")
    }


def test_hudi_changes_since_refuses(spark, tmp_path):
    h = str(tmp_path / "h")
    _mk(h, ".hoodie")
    with pytest.raises(LakeFormatError, match="change feed"):
        lake_read(spark, h, changes_since=0)


def test_unknown_fmt_refuses(spark, tmp_path):
    with pytest.raises(LakeFormatError, match="unknown lake format"):
        lake_read(spark, str(tmp_path), fmt="bogus")
