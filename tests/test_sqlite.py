"""SQLite database-file ingest (sources/sqlite_db.py)."""

from __future__ import annotations

import os
import sqlite3

import pytest

from artis_data_ingest_spark.sources.sqlite_db import (
    SqliteIngestError,
    read_sqlite,
    sqlite_inventory,
)


def _mk_db(path: str, n: int, offset: int = 0,
           extra_table: bool = False) -> str:
    con = sqlite3.connect(path)
    con.execute(
        "CREATE TABLE docs (doc_id INTEGER, title TEXT, score REAL,"
        " payload BLOB)"
    )
    con.executemany(
        "INSERT INTO docs VALUES (?, ?, ?, ?)",
        [(offset + i, f"t{offset + i}", (offset + i) / 2.0,
          bytes([i % 256]))
         for i in range(n)],
    )
    if extra_table:
        con.execute("CREATE TABLE meta (k TEXT, v TEXT)")
        con.execute("INSERT INTO meta VALUES ('a', 'b')")
    con.commit()
    con.close()
    return path


def test_read_across_files_with_source_tag(spark, tmp_path):
    p1 = _mk_db(str(tmp_path / "a.db"), 3)
    p2 = _mk_db(str(tmp_path / "b.db"), 2, offset=10)
    df = read_sqlite(spark, [p1, p2], "docs")
    rows = {(r["doc_id"], r["title"], r["score"], r["_source"])
            for r in df.collect()}
    assert (0, "t0", 0.0, "a.db") in rows
    assert (11, "t11", 5.5, "b.db") in rows
    assert len(rows) == 5
    # affinity mapping: INTEGER->bigint, TEXT->string, REAL->double,
    # BLOB->binary
    assert dict(df.dtypes)["doc_id"] == "bigint"
    assert dict(df.dtypes)["payload"] == "binary"


def test_inventory_lists_tables(spark, tmp_path):
    p1 = _mk_db(str(tmp_path / "a.db"), 4, extra_table=True)
    p2 = _mk_db(str(tmp_path / "b.db"), 1)
    inv = {(os.path.basename(r["path"]), r["table"], r["n_rows"])
           for r in sqlite_inventory(spark, [p1, p2]).collect()}
    assert inv == {("a.db", "docs", 4), ("a.db", "meta", 1),
                   ("b.db", "docs", 1)}


def test_nulls_roundtrip(spark, tmp_path):
    p = str(tmp_path / "n.db")
    con = sqlite3.connect(p)
    con.execute("CREATE TABLE docs (doc_id INTEGER, title TEXT)")
    con.execute("INSERT INTO docs VALUES (1, NULL)")
    con.execute("INSERT INTO docs VALUES (NULL, 'x')")
    con.commit()
    con.close()
    rows = {(r["doc_id"], r["title"])
            for r in read_sqlite(spark, [p], "docs").collect()}
    assert rows == {(1, None), (None, "x")}


def test_not_a_database_fails_loudly(spark, tmp_path):
    bad = str(tmp_path / "bad.db")
    with open(bad, "wb") as fh:
        fh.write(b"this is not sqlite at all, not even close......")
    with pytest.raises(Exception, match="not a SQLite database"):
        read_sqlite(spark, [bad], "docs").collect()


def test_missing_table_fails_loudly(spark, tmp_path):
    p = _mk_db(str(tmp_path / "a.db"), 1)
    with pytest.raises(SqliteIngestError, match="not found"):
        read_sqlite(spark, [p], "nope")
    p2 = str(tmp_path / "b.db")
    con = sqlite3.connect(p2)
    con.execute("CREATE TABLE other (x INTEGER)")
    con.commit()
    con.close()
    # schema comes from the first file; the second lacks the table
    with pytest.raises(Exception, match="lacks columns"):
        read_sqlite(spark, [p, p2], "docs").collect()


def test_source_never_mutated(spark, tmp_path):
    p = _mk_db(str(tmp_path / "a.db"), 2)
    before = open(p, "rb").read()
    read_sqlite(spark, [p], "docs").collect()
    assert open(p, "rb").read() == before
    assert not os.path.exists(p + "-journal")
    assert not os.path.exists(p + "-wal")
