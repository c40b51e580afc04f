"""Deterministic numeric aggregation helpers.

Floating-point sums are order-dependent; Spark's shuffle order differs
run-to-run and engine-to-engine, so ``SUM(double)`` can never hash-match
an oracle bit-for-bit. The fixture money/value columns are exact
2-decimal values, so we aggregate in DECIMAL (exact, associative,
order-independent) and cast the final result back to DOUBLE — bit-
identical in Spark and DuckDB regardless of partitioning. This costs a
few % over native double sums but buys run-to-run determinism, which a
100 TB pipeline wants anyway (reproducible metrics across retries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Precisions chosen so products stay within DECIMAL(38) without
# precision-loss truncation in either engine:
#   money(12,2) * frac(5,2) -> (18,4); * frac(5,2) again -> (24,6);
#   SUM adds +10 precision -> (34,6) < 38.  (Spark & DuckDB agree.)
MONEY = "decimal(12,2)"
FRAC = "decimal(4,2)"


def dec(col: str | Column, typ: str = MONEY) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(typ)


def dsum(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """Exact decimal sum surfaced as double."""
    return F.sum(dec(col, typ)).cast("double").alias(alias)


def davg(col: str | Column, alias: str, typ: str = MONEY) -> Column:
    """Exact-sum / count average: double division of identical inputs is
    itself deterministic, so this matches DuckDB bit-for-bit too."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec(c, typ)).cast("double") / F.count(c)).alias(alias)


def oracle_dsum(expr: str, alias: str, typ: str = MONEY) -> str:
    return f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) AS {alias}"


def oracle_davg(expr: str, alias: str, typ: str = MONEY) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS {typ})) AS DOUBLE) / COUNT({expr}) AS {alias}"
    )
