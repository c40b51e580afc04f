"""Pins for functions/hash_oracle.py: the generated DuckDB SQL must
reproduce Spark's F.hash (Murmur3_x86_32, seed 42) and F.xxhash64
(XXH64, seed 42) bit-for-bit — these oracles are what lets the
engine-specific q_minhash_neardup / q_simhash_neardup candidate sets be
value-hash-checked against DuckDB at all."""

from __future__ import annotations

import random

import duckdb
from pyspark.sql import functions as F

from artis_data_ingest_spark.functions.hash_oracle import (
    murmur3_ascii_sql,
    murmur3_tail_layers,
    spark_hash_long_chain_sql,
    xxhash64_ascii_layers,
    xxhash64_ascii_sql,
)

SF_DIR = "/root/testdata/sf0.001"


def _rand_strs(n: int, max_len: int = 31) -> list[str]:
    rnd = random.Random(20240815)
    out = ["", "a", "ab", "abc", "abcd", "abcdefgh", "abcdefghi", "x" * 31]
    out += [
        "".join(
            chr(rnd.randint(32, 126)) for _ in range(rnd.randint(0, max_len))
        )
        for _ in range(n)
    ]
    return out


def test_murmur3_and_xxhash64_match_spark_on_random_ascii(spark):
    strs = _rand_strs(60)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(strs)], "i int, s string")
    want = {
        r["i"]: (r["h"], r["x"])
        for r in df.select(
            "i", F.hash("s").alias("h"), F.xxhash64("s").alias("x")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, s VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(strs)))
    got_m = dict(
        con.execute(f"SELECT i, {murmur3_ascii_sql('s')} FROM t").fetchall()
    )
    layered = xxhash64_ascii_layers("SELECT i, s FROM t", "s", ["i"])
    got_x = dict(con.execute(layered).fetchall())
    got_x2 = dict(
        con.execute(f"SELECT i, {xxhash64_ascii_sql('s')} FROM t").fetchall()
    )
    for i, (h, x) in want.items():
        assert got_m[i] == h, (strs[i], got_m[i], h)
        assert got_x[i] == x, (strs[i], got_x[i], x)
        assert got_x2[i] == x


def test_murmur3_tail_layers_matches_spark_on_3grams(spark):
    strs = [s for s in _rand_strs(30) if len(s) >= 3]
    grams = sorted({s[i : i + 3] for s in strs for i in range(len(s) - 2)})
    df = spark.createDataFrame([(i, g) for i, g in enumerate(grams)], "i int, g string")
    want = {r["i"]: r["h"] for r in df.select("i", F.hash("g").alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, g VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(grams)))
    sql = murmur3_tail_layers(
        "SELECT i, g FROM t",
        [f"unicode(substring(g, {j}, 1))" for j in (1, 2, 3)],
        ["i", "g"],
    )
    got = {r[0]: r[2] for r in con.execute(sql).fetchall()}
    assert got == want


def test_long_chain_matches_spark_hash_array(spark):
    arrs = [
        [1, 2, 3, 4],
        [0, 0, 0, 0],
        [2147483646, 123, 1215752237, 7],
        [-1, -2147483648, 5, 2147483648],
        [2**62, -(2**62), 42, -42],
    ]
    df = spark.createDataFrame([(i, a) for i, a in enumerate(arrs)], "i int, a array<long>")
    want = {r["i"]: r["h"] for r in df.select("i", F.hash("a").alias("h")).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(i INT, a BIGINT[])")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(arrs)))
    expr = spark_hash_long_chain_sql("a")
    got = dict(con.execute(f"SELECT i, {expr} FROM t").fetchall())
    for i, h in want.items():
        # generator returns the unsigned 32-bit representative
        assert got[i] == (h & 0xFFFFFFFF), (arrs[i], got[i], h)


def test_fixture_corpus_is_ascii_and_tokens_fit_short_path():
    # the oracle's documented scope: ASCII text, whitespace tokens
    # < 32 bytes (XXH64 short path).  If the fixture generator ever
    # changes, this pin fails before the gate silently diverges.
    con = duckdb.connect()
    n_nonascii, max_tok = con.execute(
        f"""
        SELECT
          SUM(CASE WHEN regexp_matches(text, '^[\\x20-\\x7e\\t\\n\\r]*$')
                   THEN 0 ELSE 1 END),
          MAX(length(tk))
        FROM (
          SELECT text, UNNEST(string_split_regex(trim(lower(text)),
                              '[ \\t\\n\\r\\f\\x0B]+')) AS tk
          FROM '{SF_DIR}/documents.parquet'
        )
        """
    ).fetchone()
    assert n_nonascii == 0
    assert max_tok < 32
