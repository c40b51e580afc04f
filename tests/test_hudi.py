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


def test_merge_on_read_log_refused(spark, tmp_path):
    t = _cow_table(tmp_path)
    with open(os.path.join(
        t, ".fg-b_20240101.log.1_1-0-1"
    ), "wb") as fh:
        fh.write(b"avro log block")
    with pytest.raises(HudiProtocolError, match="merge-on-read"):
        read_hudi(spark, t)


def test_timeline_listing(spark, tmp_path):
    t = _cow_table(tmp_path)
    rows = {r["instant"]: r["kind"]
            for r in hudi_timeline(spark, t).collect()}
    assert rows == {"001": "commit", "002": "commit", "003": "commit"}


def test_missing_hoodie_raises(spark, tmp_path):
    with pytest.raises(HudiProtocolError, match=".hoodie"):
        read_hudi(spark, str(tmp_path))
