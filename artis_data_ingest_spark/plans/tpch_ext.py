"""Extended star-schema analytics: the remaining classic TPC-H shapes.

Round 6 widens the analytic surface beyond q1/q3/q5/q6 with the join
and aggregation patterns the first four don't exercise:

  * q4  — EXISTS-style semi join with a NON-equi residual condition
           (l_shipdate > o_orderdate inside the semi join).
  * q10 — 4-way fact-to-dim join + top-k by aggregate with full
           tie-break ordering (deterministic LIMIT).
  * q12 — conditional aggregation (CASE inside SUM) after an equi join.
  * q14 — global conditional-ratio aggregate (single-row result).
  * q18 — HAVING-filtered aggregate joined back to its fact table
           (self-referencing two-pass shape).
  * q19 — disjunctive multi-column predicates across a join
           (OR-of-ANDs; partial pushdown + post-join residual filter).

Like `tpch.py`, these rebuild the reference's grouped-summary /
join-and-compare reporting shape (assess_changes.qmd:145-147,
assess_changes.qmd:200-260 value comparisons across aligned tables) as
real distributed plans.

Scale notes (100 TB):
  * All dimension sides (part, customer, nation) are explicitly
    broadcast; the fact side (lineitem/orders) never shuffles for a
    dim join.
  * q4's semi join carries its non-equi residual inside the join
    condition, so Spark evaluates it during the hash probe — no
    post-join blow-up.
  * q18's two-pass shape shuffles lineitem once on l_orderkey for the
    aggregate; the join back to orders reuses the same key, and AQE
    coalesces the tiny HAVING-survivor side into a broadcast.
  * q10/q18 top-k: `ORDER BY agg DESC, unique_key LIMIT k` is a
    TakeOrderedAndProject — partial top-k per partition, only k rows
    per partition reach the driver-side merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import FRAC, MONEY, dec, dsum, oracle_dsum
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# q4 — order-priority count over an EXISTS (semi join with residual).
# ---------------------------------------------------------------------------

_Q4_LO, _Q4_HI = "1996-01-01 00:00:00", "1996-10-01 00:00:00"

_Q4_ORACLE = f"""
SELECT
  o_orderpriority,
  COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '{_Q4_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q4_HI}'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@register(
    "q4_priority_exists",
    oracle=_Q4_ORACLE,
    doc="TPC-H Q4 shape: EXISTS semi join with a non-equi residual "
    "(l_shipdate > o_orderdate evaluated inside the semi join), then "
    "count per priority. The residual rides the hash probe — no "
    "post-join inflation.",
)
def q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q4_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q4_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# q10 — returned-item revenue per customer, deterministic top-20.
# ---------------------------------------------------------------------------

_Q10_LO, _Q10_HI = "1996-01-01 00:00:00", "1996-07-01 00:00:00"

_Q10_ORACLE = f"""
SELECT
  c.c_custkey,
  c.c_name,
  n.n_name AS nation_name,
  CAST(SUM(CAST(l.l_extendedprice AS {MONEY})
           * (CAST(1 AS {FRAC}) - CAST(l.l_discount AS {FRAC}))) AS DOUBLE)
    AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '{_Q10_LO}'
  AND o.o_orderdate < TIMESTAMP '{_Q10_HI}'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register(
    "q10_returned_revenue",
    oracle=_Q10_ORACLE,
    doc="TPC-H Q10 shape: 4-way join (two broadcast dims), grouped "
    "revenue over returned items, top-20 with unique-key tie-break so "
    "the LIMIT is deterministic (TakeOrderedAndProject — only k rows "
    "per partition reach the merge).",
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(_Q10_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(_Q10_HI).cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    one = F.lit(1).cast(FRAC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # scales: no hint
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation_name"))
        .agg(F.sum(disc_price).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12 — conditional aggregation (CASE-in-SUM) after an equi join.
# ---------------------------------------------------------------------------

_Q12_LO, _Q12_HI = "1996-01-01 00:00:00", "1997-01-01 00:00:00"
_HIGH = ("1-URGENT", "2-HIGH")

_Q12_ORACLE = f"""
SELECT
  l.l_returnflag AS return_flag,
  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
           THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q12_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q12_HI}'
GROUP BY l.l_returnflag
ORDER BY return_flag
"""


@register(
    "q12_priority_class",
    oracle=_Q12_ORACLE,
    doc="TPC-H Q12 shape: equi join then conditional aggregation — "
    "CASE inside SUM splits line counts into high/low priority classes "
    "in one pass (no second scan, no pivot).",
)
def q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q12_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q12_HI).cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin(*_HIGH)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("return_flag")
    )


# ---------------------------------------------------------------------------
# q14 — promo revenue ratio (global conditional aggregate, 1 row).
# ---------------------------------------------------------------------------

_Q14_LO, _Q14_HI = "1996-01-01 00:00:00", "1996-02-01 00:00:00"

# Both engines compute CAST(promo AS DOUBLE) * 100.0 / CAST(total AS
# DOUBLE): identical decimal sums, then identical IEEE double ops —
# bit-reproducible.
_Q14_ORACLE = f"""
SELECT
  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
           THEN CAST(l.l_extendedprice AS {MONEY})
                * (CAST(1 AS {FRAC}) - CAST(l.l_discount AS {FRAC}))
           ELSE CAST(0 AS {MONEY}) END) AS DOUBLE) * 100.0
  / CAST(SUM(CAST(l.l_extendedprice AS {MONEY})
             * (CAST(1 AS {FRAC}) - CAST(l.l_discount AS {FRAC}))) AS DOUBLE)
    AS promo_revenue_pct,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '{_Q14_LO}'
  AND l.l_shipdate < TIMESTAMP '{_Q14_HI}'
"""


@register(
    "q14_promo_revenue",
    oracle=_Q14_ORACLE,
    doc="TPC-H Q14 shape: broadcast dim join + global conditional-ratio "
    "aggregate. Decimal partial sums keep the ratio bit-reproducible "
    "across partitionings.",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_Q14_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_Q14_HI).cast("timestamp"))
    )
    one = F.lit(1).cast(FRAC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    promo = F.when(F.col("p_type") == "PROMO", disc_price).otherwise(
        F.lit(0).cast(MONEY)
    )
    # part scales with SF: no broadcast hint (optimizer decides; SMJ at 100 TB)
    return li.join(p, F.col("l_partkey") == F.col("p_partkey")).agg(
        (
            F.sum(promo).cast("double")
            * F.lit(100.0)
            / F.sum(disc_price).cast("double")
        ).alias("promo_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# q18 — large-quantity orders (HAVING aggregate joined back to facts).
# ---------------------------------------------------------------------------

_Q18_MIN_QTY = 250

_Q18_ORACLE = f"""
WITH big AS (
  SELECT l_orderkey, {oracle_dsum('l_quantity', 'total_qty')}
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS {MONEY})) > {_Q18_MIN_QTY}
)
SELECT
  c.c_custkey,
  c.c_name,
  o.o_orderkey,
  o.o_orderdate,
  o.o_totalprice,
  big.total_qty
FROM big
JOIN orders o ON big.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 20
"""


@register(
    "q18_large_orders",
    oracle=_Q18_ORACLE,
    doc="TPC-H Q18 shape: HAVING-filtered aggregate over the fact table "
    "joined back to orders+customer, deterministic top-20. The "
    "survivor side is tiny after HAVING — AQE broadcasts it.",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > _Q18_MIN_QTY)
        .select("l_orderkey", F.col("_qty_dec").cast("double").alias("total_qty"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))  # scales: no hint
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q19 — disjunctive multi-column predicates across a join (OR-of-ANDs).
# ---------------------------------------------------------------------------

_Q19_ORACLE = f"""
SELECT
  CAST(SUM(CAST(l.l_extendedprice AS {MONEY})
           * (CAST(1 AS {FRAC}) - CAST(l.l_discount AS {FRAC}))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 40
       AND l.l_quantity BETWEEN 20 AND 30)
"""


@register(
    "q19_disjunctive_pred",
    oracle=_Q19_ORACLE,
    doc="TPC-H Q19 shape: OR-of-ANDs predicate spanning both join "
    "sides. Single-side conjuncts (brand/size on part, quantity "
    "bounds on lineitem) are derivable for pushdown; the cross-side "
    "residual evaluates during the broadcast-hash probe.",
)
def q19_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    arm = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    pred = (
        arm("Brand#12", 15, 1, 11)
        | arm("Brand#23", 25, 10, 20)
        | arm("Brand#34", 40, 20, 30)
    )
    one = F.lit(1).cast(FRAC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))  # scales: no hint
        .filter(pred)
        .agg(
            F.sum(disc_price).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
