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

import pandas as pd
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


# ---------------------------------------------------------------------------
# Deterministic fixed-point base-2 logarithm (shift-and-square), for
# log-free rational scoring (the unigram-LM perplexity filter).
# Floating log/exp can never hash-match across engines; this computes
# an integer qlog2(x) ~= 2^B * log2(x) using only int64 multiply /
# compare / shift — bit-identical in Spark and DuckDB regardless of
# partitioning, BY CONSTRUCTION (both engines evaluate the same
# integer recurrence):
#
#   e = floor(log2 x) = length(bin(x)) - 1
#   t = (x * 2^P) >> e                 -- mantissa in [2^P, 2^(P+1))
#   repeat B times:  u = t*t;  bit = (u >= 2^(2P+1));
#                    t = u div 2^(P+bit);  frac = 2*frac + bit
#   qlog2(x) = e * 2^B + frac
#
# Truncating t each round makes this an approximation of true log2
# (abs error a few ulp in the 2^-B place), but an IDENTICAL one in
# both engines: max intermediate u < 2^(2P+2) = 2^58 at P=28, all
# int64.  Monotone non-decreasing in x.  Cost: B multiplies per
# DISTINCT input value — always apply to a distinct-values table,
# never per corpus row.
# ---------------------------------------------------------------------------

QLOG2_FRAC_BITS = 20
QLOG2_MANT_BITS = 28


def with_qlog2(df, incol: str, outcol: str,
               frac_bits: int = QLOG2_FRAC_BITS,
               mant_bits: int = QLOG2_MANT_BITS):
    """Spark side: append bigint column ``outcol`` = qlog2(incol) to
    ``df``.  Requires 1 <= incol < 2^(63 - mant_bits).  Cheap enough
    to apply INLINE on artifact-sized frames (r16): the vectorized
    recurrence below costs ~B numpy ops per row, so evaluating it over
    a vocabulary directly beats building a distinct-values table and
    joining back (which added a shuffle + a checkpoint job per LM
    artifact build — measured 2.3x on lm_perplexity_buckets).  Keep
    the distinct-table form only when the input is corpus-sized.

    Implementation (r12): a vectorized Arrow pandas UDF running the
    identical int64 recurrence in numpy.  The previous form — a
    B-round unrolled withColumn chain — produced a 100+-node
    expression tree whose ANALYSIS + codegen cost ~1-2 s of driver
    time per query regardless of row count (measured: 67 rows took
    1.6 s warm), which dominated every LM artifact build.  The UDF is
    one plan node; the integer ops (frexp-exact exponent below 2^53,
    shift-and-square with positive-value div == shift) are
    bit-identical to the SQL recurrence in qlog2_duck_cte, pinned by
    tests/test_properties.py against an independent pure-Python
    mirror."""
    from pyspark.sql.functions import pandas_udf

    B, P = frac_bits, mant_bits
    hi = 1 << (2 * P + 1)

    @pandas_udf("bigint")
    def _ql(xs: pd.Series) -> pd.Series:
        import numpy as np

        mask = xs.notna()
        x = xs[mask].to_numpy(dtype=np.int64)
        # e = floor(log2 x): frexp is exact for x < 2^53 (contract
        # bounds x < 2^35); frexp(x) = (m, exp) with m in [0.5, 1)
        _, ex = np.frexp(x.astype(np.float64))
        e = ex.astype(np.int64) - 1
        t = (x << P) >> e
        f = np.zeros_like(t)
        for _ in range(B):
            u = t * t  # < 2^(2P+2) = 2^58: stays in int64
            b = (u >= hi).astype(np.int64)
            # u is positive, so truncating div == right shift
            t = u >> (P + b)
            f = f * 2 + b
        out = pd.Series(e * (1 << B) + f, index=xs[mask].index)
        return out.reindex(xs.index)

    c = F.col(incol).cast("bigint")
    return df.withColumn(outcol, _ql(c))


def qlog2_duck_cte(src: str, xcol: str, prefix: str = "ql",
                   frac_bits: int = QLOG2_FRAC_BITS,
                   mant_bits: int = QLOG2_MANT_BITS) -> tuple[str, str]:
    """DuckDB side: returns (cte_text, final_name) where cte_text is a
    chain of CTE clauses (to splice after a WITH) computing the same
    recurrence over every row of CTE/table ``src``; the final CTE
    ``{prefix}_out`` has all of src's columns plus bigint ``qlog2``.
    Identical integer ops to with_qlog2 — the determinism argument."""
    B, P = frac_bits, mant_bits
    hi = 1 << (2 * P + 1)
    steps = [
        f"{prefix}_0 AS (SELECT *, "
        f"CAST(length(bin(CAST({xcol} AS BIGINT))) - 1 AS BIGINT) AS e_, "
        f"(CAST({xcol} AS BIGINT) * {1 << P}) >> "
        f"(length(bin(CAST({xcol} AS BIGINT))) - 1) AS t_, "
        f"CAST(0 AS BIGINT) AS f_ FROM {src})"
    ]
    for i in range(1, B + 1):
        steps.append(
            f"{prefix}_{i} AS (SELECT * REPLACE("
            f"CASE WHEN t_ * t_ >= {hi} THEN (t_ * t_) // {1 << (P + 1)} "
            f"ELSE (t_ * t_) // {1 << P} END AS t_, "
            f"f_ * 2 + CASE WHEN t_ * t_ >= {hi} THEN 1 ELSE 0 END AS f_) "
            f"FROM {prefix}_{i - 1})"
        )
    steps.append(
        f"{prefix}_out AS (SELECT * EXCLUDE (e_, t_, f_), "
        f"e_ * {1 << B} + f_ AS qlog2 FROM {prefix}_{B})"
    )
    return ",\n".join(steps), f"{prefix}_out"
