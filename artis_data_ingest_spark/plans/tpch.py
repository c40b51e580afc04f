"""Star-schema analytics queries (SURVEY.md §2.3 J3, §2.4 A5, §2.7 W2).

These fill the GAP rows of the operator inventory: grouped hash
aggregation, broadcast/sort-merge equi joins, semi/anti joins, window
top-k, rollup. All pure DataFrame builtins — Catalyst picks
partial+final aggregation and join strategy; AQE re-plans at runtime.

Scale notes (100 TB):
  * Broadcast-hint policy (r7): explicit ``F.broadcast`` ONLY on
    relations whose size is constant in SF — nation (25 rows), region
    (5), single-row scalar aggregates.  SF-PROPORTIONAL dims (customer,
    supplier, part, and aggregates over them) carry NO hint: the
    optimizer broadcasts them while they fit the threshold (so fixture
    plans are unchanged) and falls back to a shuffled sort-merge join
    at 100 TB, where a forced broadcast would OOM the driver.  The SMJ
    fallback is pinned result-identical for all 22 queries by
    tests/test_plans.py::test_tpch_smj_fallback_parity.
  * Aggregations run partial (map-side) first automatically; group-by
    keys here are low-cardinality, so the shuffle after partial agg is
    tiny regardless of input size.
  * Filters are applied before joins so they push into the Parquet scan
    (``PushedFilters`` in ``.explain``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import FRAC, MONEY, davg, dec, dsum, oracle_davg, oracle_dsum
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# q1 — pricing summary (flagship).  Scan → filter → hash agg → sort.
# ---------------------------------------------------------------------------

_Q1_CUTOFF = "1998-09-02 00:00:00"

_Q1_ORACLE = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {oracle_dsum('l_quantity', 'sum_qty')},
  {oracle_dsum('l_extendedprice', 'sum_base_price')},
  CAST(SUM(CAST(l_extendedprice AS {MONEY})
           * (CAST(1 AS {FRAC}) - CAST(l_discount AS {FRAC}))) AS DOUBLE)
    AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS {MONEY})
           * (CAST(1 AS {FRAC}) - CAST(l_discount AS {FRAC}))
           * (CAST(1 AS {FRAC}) + CAST(l_tax AS {FRAC}))) AS DOUBLE)
    AS sum_charge,
  {oracle_davg('l_quantity', 'avg_qty')},
  {oracle_davg('l_extendedprice', 'avg_price')},
  CAST(SUM(CAST(l_discount AS {FRAC})) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@register(
    "q1_pricing_summary",
    oracle=_Q1_ORACLE,
    doc="TPC-H Q1-style pricing summary: filter → groupBy → 8 aggregates → sort. "
    "Rebuilds the reference's grouped-summary reporting shape "
    "(assess_changes.qmd:145-147 row counts per pair) as a real hash aggregate.",
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(FRAC)
    disc_price = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    charge = disc_price * (one + dec("l_tax", FRAC))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", FRAC),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# q5-style — multi-way broadcast join: revenue by region.
# ---------------------------------------------------------------------------

_Q5_ORACLE = f"""
SELECT
  r.r_name AS region_name,
  CAST(SUM(CAST(l.l_extendedprice AS {MONEY})
           * (CAST(1 AS {FRAC}) - CAST(l.l_discount AS {FRAC}))) AS DOUBLE)
    AS revenue,
  COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY r.r_name
ORDER BY region_name
"""


@register(
    "q5_revenue_by_region",
    oracle=_Q5_ORACLE,
    doc="Star join lineitem⨝orders⨝customer⨝nation⨝region with broadcast dims "
    "(SURVEY.md §2.3 J3). Date filter applied pre-join for scan pushdown.",
    bench=True,
)
def q5_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    one = F.lit(1).cast(FRAC)
    revenue_term = dec("l_extendedprice") * (one - dec("l_discount", FRAC))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # nation/region are CONSTANT-size (25/5 rows at every SF) so the
        # broadcast hint is always safe; customer SCALES with SF, so no
        # hint — the optimizer (threshold/AQE) broadcasts it at small SF
        # and falls back to a shuffled sort-merge join at 100 TB, where a
        # forced broadcast would OOM the driver (SMJ parity pinned in
        # tests/test_plans.py).
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.sum(revenue_term).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("region_name")
    )


# ---------------------------------------------------------------------------
# Grouped aggregation with multiple measures (A5).
# ---------------------------------------------------------------------------

_GROUPED_ORACLE = f"""
SELECT
  o_orderpriority,
  o_orderstatus,
  COUNT(*) AS n_orders,
  {oracle_dsum('o_totalprice', 'sum_total')},
  CAST(MIN(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS min_total,
  CAST(MAX(CAST(o_totalprice AS {MONEY})) AS DOUBLE) AS max_total,
  COUNT(DISTINCT o_custkey) AS n_customers
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus
"""


@register(
    "q_grouped_agg",
    oracle=_GROUPED_ORACLE,
    doc="Multi-measure grouped hash agg incl. COUNT DISTINCT (SURVEY.md A2/A5). "
    "At 100 TB countDistinct shuffles by (group, value) then by group — "
    "prefer approx_count_distinct (q_approx_distinct) when exactness is optional.",
)
def q_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_total"),
            F.min(dec("o_totalprice")).cast("double").alias("min_total"),
            F.max(dec("o_totalprice")).cast("double").alias("max_total"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .orderBy("o_orderpriority", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Semi / anti joins (J3).
# ---------------------------------------------------------------------------


@register(
    "q_semi_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
)
ORDER BY c_custkey
""",
    doc="Left-semi join: customers having a >400k order (SURVEY.md J3). "
    "Semi joins ship only the join key of the probe side — at scale, "
    "prefer them over inner-join+distinct.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    big_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_totalprice") > 400000
    )
    return (
        cust.join(big_orders, cust.c_custkey == big_orders.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "q_anti_join",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey
    AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
)
ORDER BY c_custkey
""",
    doc="Left-anti join: customers with no order since 2000 (SURVEY.md J3).",
)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# Window top-k (W2).
# ---------------------------------------------------------------------------


@register(
    "q_topk_window",
    oracle="""
SELECT c_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_custkey
           ORDER BY o.o_totalprice DESC, o.o_orderkey
         ) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rn <= 3
ORDER BY c_custkey, rn
""",
    doc="Top-3 orders per customer via ranking window (SURVEY.md W2). "
    "Deterministic tie-break on o_orderkey. At scale the window shuffles "
    "once on the partition key; rank+filter avoids a global sort.",
    bench=True,
)
def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    w = (
        Window.partitionBy("c_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        # customer scales with SF: no broadcast hint (see q5 note)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("c_custkey", "rn")
    )


# ---------------------------------------------------------------------------
# Rollup (A5 grouping sets).
# ---------------------------------------------------------------------------


@register(
    "q_rollup",
    oracle=f"""
SELECT
  o_orderstatus,
  o_orderpriority,
  COUNT(*) AS n_orders,
  {oracle_dsum('o_totalprice', 'sum_total')}
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    doc="ROLLUP grouping sets over orders (SURVEY.md A5).",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Cube (A5).
# ---------------------------------------------------------------------------


@register(
    "q_cube",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
    doc="CUBE grouping sets over lineitem flags (SURVEY.md A5).",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n_items"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


# ---------------------------------------------------------------------------
# Approximate count distinct (A2 at-scale variant) — rows-only (approx
# algorithms differ across engines, so no value oracle).
# ---------------------------------------------------------------------------


@register(
    "q_approx_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_orderkey) AS exact_orders,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(DISTINCT l_suppkey) AS exact_suppliers,
       TRUE AS orders_within_tol,
       TRUE AS parts_within_tol
FROM lineitem
""",
    doc="HLL++ approx_count_distinct over lineitem keys (SURVEY.md A2 "
    "scale path). The HLL estimates themselves are engine-specific, so "
    "the query emits exact counts plus |approx-exact|/exact < 0.1 "
    "verdicts (rsd=0.02, 5-sigma headroom; the sketch is deterministic "
    "for fixed data) — the oracle hash-matches exact counts and "
    "literal TRUE bounds, turning the HLL path into a hard signal "
    "instead of a rows-only check.",
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")

    def _within(approx, exact):
        rel = F.abs(approx.cast("double") / exact.cast("double") - 1.0)
        return rel < 0.1

    agg = li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("a_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_suppliers"),
    )
    return agg.select(
        "exact_orders",
        "exact_parts",
        "exact_suppliers",
        _within(F.col("a_orders"), F.col("exact_orders")).alias(
            "orders_within_tol"
        ),
        _within(F.col("a_parts"), F.col("exact_parts")).alias(
            "parts_within_tol"
        ),
    )


# ---------------------------------------------------------------------------
# q3 — shipping priority.  Broadcast-filtered dim → two fact joins →
# agg → deterministic top-10.
# ---------------------------------------------------------------------------

_Q3_DATE = "1998-06-30 00:00:00"


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS {MONEY})
                * (CAST(1 AS {FRAC}) - CAST(l_discount AS {FRAC}))) AS DOUBLE)
         AS revenue,
       strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
       o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3-style shipping priority (o_orderpriority stands in "
    "for the fixture's missing o_shippriority): segment-filtered "
    "customers broadcast into orders, orders joined to lineitem, "
    "revenue per order, deterministic (revenue DESC, key) top-10. "
    "Both date filters push into the fact scans; the only wide "
    "shuffle is the final aggregation on l_orderkey.",
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < _Q3_DATE
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > _Q3_DATE
    )
    one = F.lit(1).cast(FRAC)
    return (
        li.join(
            orders.join(
                cust.select("c_custkey"),  # scales with SF: no hint
                F.col("o_custkey") == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice") * (one - dec("l_discount", FRAC)))
            .cast("double")
            .alias("revenue")
        )
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# q6 — forecast revenue.  The pure-pushdown query: every predicate
# reaches the scan; no join, no wide shuffle at all.
# ---------------------------------------------------------------------------


@register(
    "q6_forecast_revenue",
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice AS {MONEY})
              * CAST(l_discount AS {FRAC})) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6-style revenue-change forecast: conjunctive range "
    "predicates on three columns, one global aggregate. The canonical "
    "pushdown showcase — all four predicates reach the parquet scan "
    "(PushedFilters) and row-group statistics skip non-matching chunks "
    "before any page decode; the 'shuffle' is a single-row partial-agg "
    "merge.",
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice") * dec("l_discount", FRAC))
        .cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )
