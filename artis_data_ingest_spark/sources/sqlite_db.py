"""SQLite database-file ingest — stdlib ``sqlite3``, one task per
database file.

SQLite files are a surprisingly common corpus substrate: app exports
(messaging histories, browser profiles, fitness trackers), research
releases (many HuggingFace-era scrape dumps ship .sqlite sidecars),
and embedded-device logs all arrive as ``.db``/``.sqlite`` files.  No
JDBC jar or external driver is needed — Python's own ``sqlite3``
module reads the format — so the engine ingests them directly:

  * :func:`sqlite_inventory` — one row per (file, table, n_rows):
    the scouting pass over a directory of unknown databases.
  * :func:`read_sqlite` — the rows of one named table across MANY
    database files as a single DataFrame, tagged ``_source``;
    schema inferred once driver-side from the first file's declared
    column types (SQLite affinity rules: INT* → bigint,
    CHAR/CLOB/TEXT → string, BLOB/empty → binary, REAL/FLOA/DOUB →
    double, other/NUMERIC → string — the lossless choice for
    SQLite's dynamically-typed storage), or supplied explicitly.

Files that are not SQLite databases, or that lack the requested
table, fail LOUDLY with the file's path in the message — a corpus
walk must never silently drop a shard.

Scale posture: the file list is distributed and each worker opens
its database directly with the stdlib driver (same pattern as the
Hudi log reader — a SQLite file must be a local file to mmap, so on
an object store the task localizes it first; there is no record-
level split of one database, the FILE is the parallelism unit, which
matches how these corpora arrive: many small-to-medium databases).
Predicates/projections run in Spark after the scan — SQLite does no
distributed pushdown.
"""

from __future__ import annotations

import os
import sqlite3

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


class SqliteIngestError(ValueError):
    """File is not a readable SQLite database / table is absent."""


def _connect_ro(path: str) -> sqlite3.Connection:
    if not os.path.isfile(path):
        raise SqliteIngestError(f"no such database file: {path}")
    # immutable read-only URI: no locks, no journal recovery — the
    # ingest never mutates the source and parallel readers are safe
    con = sqlite3.connect(
        f"file:{path}?mode=ro&immutable=1", uri=True
    )
    try:
        con.execute("SELECT 1 FROM sqlite_schema LIMIT 1")
    except sqlite3.DatabaseError as ex:
        con.close()
        raise SqliteIngestError(
            f"{path} is not a SQLite database: {ex}"
        ) from ex
    return con


def _affinity_type(declared: str | None) -> T.DataType:
    d = (declared or "").upper()
    if "INT" in d:
        return T.LongType()
    if "CHAR" in d or "CLOB" in d or "TEXT" in d:
        return T.StringType()
    if d == "" or "BLOB" in d:
        return T.BinaryType()
    if "REAL" in d or "FLOA" in d or "DOUB" in d:
        return T.DoubleType()
    return T.StringType()  # NUMERIC & friends: lossless as text


def _table_schema(path: str, table: str) -> T.StructType:
    with _connect_ro(path) as con:
        cols = con.execute(
            "SELECT name, type FROM pragma_table_info(?)", (table,)
        ).fetchall()
    if not cols:
        raise SqliteIngestError(
            f"table {table!r} not found in {path}"
        )
    return T.StructType(
        [T.StructField(n, _affinity_type(t), True) for n, t in cols]
    )


def sqlite_inventory(
    spark: SparkSession, db_paths: list[str]
) -> DataFrame:
    """(path, table, n_rows) across many database files — the
    scouting scan; runs distributed, one task per file."""
    import pandas as pd

    def scan(batches):
        for pdf in batches:
            rows = {"path": [], "table": [], "n_rows": []}
            for path in pdf["path"]:
                with _connect_ro(path) as con:
                    names = [
                        r[0] for r in con.execute(
                            "SELECT name FROM sqlite_schema WHERE "
                            "type='table' AND name NOT LIKE "
                            "'sqlite_%' ORDER BY name"
                        )
                    ]
                    for t in names:
                        (n,) = con.execute(
                            f'SELECT COUNT(*) FROM "{t}"'
                        ).fetchone()
                        rows["path"].append(path)
                        rows["table"].append(t)
                        rows["n_rows"].append(n)
            yield pd.DataFrame(rows)

    paths = sorted(os.path.abspath(p) for p in db_paths)
    n_parts = max(1, min(len(paths), 32))
    return (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(
            scan, "path string, table string, n_rows bigint"
        )
    )


def read_sqlite(
    spark: SparkSession,
    db_paths: list[str],
    table: str,
    schema: T.StructType | None = None,
) -> DataFrame:
    """Rows of ``table`` across many SQLite files as one DataFrame
    (+ ``_source`` = file basename).  Values are coerced to the
    inferred/declared column types; a value that cannot coerce
    (SQLite stores are dynamically typed) fails loudly with file and
    column named."""
    import pandas as pd

    if not db_paths:
        raise SqliteIngestError("read_sqlite: empty db_paths")
    paths = sorted(os.path.abspath(p) for p in db_paths)
    if schema is None:
        schema = _table_schema(paths[0], table)
    out_schema = T.StructType(
        list(schema.fields)
        + [T.StructField("_source", T.StringType(), False)]
    )
    names = [f.name for f in schema.fields]
    casts = []
    for f in schema.fields:
        if isinstance(f.dataType, T.LongType):
            casts.append("Int64")
        elif isinstance(f.dataType, T.DoubleType):
            casts.append("float64")
        else:
            casts.append(None)
    quoted = ", ".join(f'"{n}"' for n in names)

    def load(batches):
        for pdf in batches:
            for path in pdf["path"]:
                with _connect_ro(path) as con:
                    present = {
                        r[0] for r in con.execute(
                            "SELECT name FROM pragma_table_info(?)",
                            (table,),
                        )
                    }
                    missing = [n for n in names if n not in present]
                    if missing:
                        raise SqliteIngestError(
                            f"{path}: table {table!r} lacks columns "
                            f"{missing}"
                        )
                    cur = con.execute(
                        f'SELECT {quoted} FROM "{table}"'
                    )
                    data = cur.fetchall()
                out = pd.DataFrame(data, columns=names)
                for n, c in zip(names, casts):
                    if c is not None and len(out):
                        try:
                            out[n] = out[n].astype(c)
                        except (TypeError, ValueError) as ex:
                            raise SqliteIngestError(
                                f"{path}: column {n!r} holds values "
                                f"that do not coerce to the table "
                                f"schema: {ex}"
                            ) from ex
                out["_source"] = os.path.basename(path)
                yield out

    n_parts = max(1, min(len(paths), 32))
    return (
        spark.createDataFrame([(p,) for p in paths], "path string")
        .repartition(n_parts)
        .mapInPandas(load, out_schema)
    )
