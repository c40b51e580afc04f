"""Z-order (Morton curve) layout keys: multi-dimensional data skipping.

A file sorted on ONE column gives tight min/max envelopes (and thus
manifest pruning, `sinks/manifest.py`) on that column only — a range
predicate on any other column keeps every file. Interleaving the bits
of two bucketed dimensions into a Morton code and sorting on THAT gives
every file locality in BOTH dimensions: a 2-D box query prunes on
either column's envelope. This is Delta/Iceberg `OPTIMIZE ZORDER BY`;
here it is a pure Catalyst expression (shift/and/or — codegen, no UDF)
fed to `write_partitioned(sort_cols=...)` or `sortWithinPartitions`.

Both a Spark Column builder and the equivalent SQL-text builder are
provided (the `standardize_key_sql` pattern) so the oracle computes the
identical integer, bit for bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket(col: Column, lo: float, width: float, bits: int = 8) -> Column:
    """Clamp a numeric column into the 0 .. 2**bits - 1 integer grid."""
    hi = (1 << bits) - 1
    b = F.floor((col - F.lit(lo)) / F.lit(width)).cast("bigint")
    return F.least(F.greatest(b, F.lit(0).cast("bigint")), F.lit(hi).cast("bigint"))


def bucket_sql(expr: str, lo: float, width: float, bits: int = 8) -> str:
    hi = (1 << bits) - 1
    return (
        f"LEAST(GREATEST(CAST(FLOOR(({expr} - {lo}) / {width}) AS BIGINT),"
        f" CAST(0 AS BIGINT)), CAST({hi} AS BIGINT))"
    )


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of two grid coordinates (x gets even bit
    positions, y odd): a pure shift/and/or expression tree — 2*bits
    terms, whole-stage codegen'd, no Python."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"
