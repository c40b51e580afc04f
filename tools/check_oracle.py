"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet fixtures, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
stringified tuple).

Both sides are fetched through the pandas/arrow path (``df.toPandas()``
for Spark, ``res.df()`` for DuckDB) to reproduce the driver's type
coercion: DuckDB ``SUM(BIGINT)`` yields HUGEINT which pandas renders as
float64, so an oracle that forgets ``CAST(... AS BIGINT)`` hashes
``498223.0`` against Spark's ``498223`` and fails — exactly as it does
on the driver.  The previous ``fetchall()`` path returned Python ints
and silently masked that class of bug (CORRECTNESS_r01's 5 failures).

Known blind spots (deliberate, mirroring the driver's coercion):
``_norm_cell`` folds float NaN into '<NULL>' and renders midnight
timestamps as bare dates, so a genuine NaN-vs-NULL or TIMESTAMP-vs-DATE
divergence between Spark and the oracle is invisible here — the pandas
fetch path already conflates them before we see the values.

Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from artis_data_ingest_spark import plans  # noqa: E402
from artis_data_ingest_spark.session import get_spark  # noqa: E402
from artis_data_ingest_spark.sources.tables import TABLES  # noqa: E402


def _norm_cell(v) -> str:
    # Missing values: None, NaN, NaT, pd.NA all hash identically — the
    # pandas fetch turns SQL NULL in numeric columns into NaN, so NaN
    # must equal Spark's None.
    if v is None or v is pd.NaT:
        return "<NULL>"
    if isinstance(v, float):  # covers np.float64 (subclass)
        f = float(v)
        if math.isnan(f):
            return "<NULL>"
        if f == 0.0:
            f = 0.0
        return repr(f)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, np.ndarray):
        return "[" + ",".join(_norm_cell(x) for x in v.tolist()) + "]"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    if isinstance(v, (pd.Timestamp, dt.datetime)):
        # DuckDB DATE comes back as midnight Timestamp while Spark
        # returns datetime.date — render both as the bare date.
        s = str(v)
        return s[:10] if s.endswith(" 00:00:00") else s
    try:
        if pd.isna(v):  # pd.NA and friends
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x01".join(_norm_cell(row[i]) for i in order) for row in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\x02")
    return h.hexdigest()


def _pandas_rows(pdf: pd.DataFrame) -> list[tuple]:
    return [tuple(r) for r in pdf.itertuples(index=False, name=None)]


def main() -> int:
    argv = sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    names = [a for a in argv if "/" not in a]
    known = plans.all_queries()
    unknown = [n for n in names if n not in known]
    if unknown:
        print(f"unknown queries: {unknown}; known: {sorted(known)}")
        return 2

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    spark = get_spark("check-oracle")
    registry = plans.all_queries()
    targets = names or list(registry)

    n_pass = n_fail = n_rows_only = 0
    failed: list[str] = []
    for name in targets:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            spdf = sdf.toPandas()
            scols = list(spdf.columns)
            srows = _pandas_rows(spdf)
            # the external driver canonicalizes through pandas
            # sort_values, which raises on unhashable (list/struct)
            # cells — reproduce that here so a driver-incompatible
            # output schema fails locally (CORRECTNESS_r02's
            # q_dataset_diff burned a driver slot exactly this way)
            if len(spdf):
                spdf.sort_values(by=scols)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark/canonicalize error: {e}")
            n_fail += 1
            failed.append(name)
            continue
        if q.oracle is None:
            print(f"ROWS  {name}: {len(srows)} rows (rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            opdf = con.execute(q.oracle).df()
            ocols = list(opdf.columns)
            orows = _pandas_rows(opdf)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            failed.append(name)
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sh, oh = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            if sh != oh:
                problems.append("value-hash mismatch")
                # show first differing row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                srt = sorted(
                    tuple(_norm_cell(r[i]) for i in order_s) for r in srows
                )
                ort = sorted(
                    tuple(_norm_cell(r[i]) for i in order_o) for r in orows
                )
                for a, b in zip(srt, ort):
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(f"      {p}")
            n_fail += 1
            failed.append(name)
        else:
            print(f"PASS  {name}: {len(srows)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    if failed:
        print("failed: " + " ".join(failed))
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
