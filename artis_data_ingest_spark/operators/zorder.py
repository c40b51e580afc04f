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

from collections.abc import Sequence

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


def zvalue_n(cols: "Sequence[Column]", bits: int = 8) -> Column:
    """Morton interleave of k grid coordinates (r13 — Delta's
    ``OPTIMIZE ZORDER BY`` takes arbitrarily many columns): column j
    occupies bit positions j, j+k, j+2k, … so every dimension's bits
    spread evenly through the key and each file's envelope is narrow
    in ALL k dimensions.  A pure shift/and/or expression tree —
    k*bits terms, whole-stage codegen'd, no Python.  k*bits must fit
    a signed 64-bit key (<= 63)."""
    k = len(cols)
    if k < 1:
        raise ValueError("zvalue_n needs at least one column")
    if k * bits > 63:
        raise ValueError(
            f"{k} dims x {bits} bits = {k * bits} key bits; "
            "must be <= 63 (reduce bits per dimension)"
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return z


def zvalue_n_sql(exprs: "Sequence[str]", bits: int = 8) -> str:
    k = len(exprs)
    if k < 1 or k * bits > 63:
        raise ValueError(f"bad zvalue shape: {k} dims x {bits} bits")
    terms = []
    for i in range(bits):
        for j, e in enumerate(exprs):
            terms.append(f"((({e} >> {i}) & 1) << {i * k + j})")
    return "(" + " | ".join(terms) + ")"


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton interleave of two grid coordinates (x gets even bit
    positions, y odd) — the k=2 case of :func:`zvalue_n`."""
    return zvalue_n([x, y], bits)


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    return zvalue_n_sql([x, y], bits)
