"""Scale-pattern and remaining-gap queries: salted aggregation, as-of
join, explode/wordcount, arg-min/max, month rollup, plan-time branching
(SURVEY.md R3, A4, J4, P12, §7.2 milestone 10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import dsum, oracle_dsum
from ..operators.scale import asof_join, salted_agg
from ..sources.tables import load_table
from .registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


@register(
    "q_salted_agg",
    oracle=f"""
SELECT l_returnflag,
       COUNT(*) AS n_items,
       {oracle_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Skew-safe two-level aggregation (salt → partial agg → combine): "
    "3 grouping keys over the whole fact table is the worst-case skew "
    "shape; salting bounds any reducer at ~1/16 of a key. Result is "
    "bit-identical to the direct aggregation (decimal sums are "
    "associative), which is exactly what the oracle checks.",
)
def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key="l_returnflag",
        aggs={
            "n_items": (F.count(F.lit(1)), "sum"),
            "sum_qty": (
                F.sum(F.col("l_quantity").cast("decimal(12,2)")),
                "sum",
            ),
        },
        n_salts=16,
    )
    return out.withColumn("sum_qty", F.col("sum_qty").cast("double")).orderBy(
        "l_returnflag"
    )


@register(
    "q_asof_join",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '{_TS_FMT_SQL}') AS purchase_ts,
       strftime(c.ts, '{_TS_FMT_SQL}') AS asof_ts,
       c.value AS asof_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
ORDER BY event_id
""",
    doc="As-of join (SURVEY.md J4 — absent in reference AND core Spark): "
    "each purchase gets the user's most recent prior-or-equal click. "
    "Implemented as union-tag + ordered window carry-forward: one "
    "shuffle on user_id, no inequality-join explosion. Oracle: DuckDB's "
    "native ASOF JOIN.",
)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases, clicks, key="user_id", ts="ts", right_cols=["ts", "value"]
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("asof_ts", _TS_FMT).alias("asof_ts"),
        F.col("asof_value"),
    ).orderBy("event_id")


@register(
    "q_token_freq",
    oracle="""
SELECT token, COUNT(*) AS n
FROM (
  SELECT UNNEST(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS token
  FROM documents
)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
    doc="Wordcount top-20 via explode (SURVEY.md R3): split → explode → "
    "hash agg → deterministic (n DESC, token) top-k. The classic "
    "shuffle-then-limit shape; at scale the partial agg collapses "
    "the explosion before the shuffle.",
    bench=True,
)
def q_token_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            F.explode(F.split(F.trim(F.col("text")), r"[ \t\n\r\f\x0B]+")).alias("token")
        )
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(20)
    )


@register(
    "q_argminmax",
    oracle="""
SELECT c_mktsegment,
       arg_max(c_name, c_custkey) AS latest_customer,
       arg_min(c_name, c_custkey) AS earliest_customer,
       COUNT(*) AS n
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
    doc="Arg-min/arg-max aggregates (SURVEY.md A4 family): per segment, "
    "the names at the extreme custkeys (unique ordering key → "
    "deterministic).",
)
def q_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.max_by("c_name", "c_custkey").alias("latest_customer"),
            F.min_by("c_name", "c_custkey").alias("earliest_customer"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "q_monthly_orders",
    oracle=f"""
SELECT strftime(date_trunc('month', o_orderdate), '{_TS_FMT_SQL}') AS month,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_total')}
FROM orders
GROUP BY 1
ORDER BY month
""",
    doc="Month-grain rollup over the orders fact (date_trunc family). "
    "The grouping expression is the natural at-rest partition key for "
    "a 100 TB orders table (partition pruning on month).",
)
def q_monthly_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.date_format(F.date_trunc("month", "o_orderdate"), _TS_FMT).alias(
                "month"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "sum_total"),
        )
        .orderBy("month")
    )


@register(
    "q_era_branch",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS n
FROM orders
WHERE CASE WHEN (SELECT max(o_orderdate) FROM orders)
                >= TIMESTAMP '2000-01-01 00:00:00'
           THEN o_orderpriority IN ('1-URGENT', '2-HIGH')
           ELSE o_orderpriority IN ('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
      END
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    doc="Plan-construction-time branching (SURVEY.md P12 — the "
    "reference's era-dependent filter, assess_changes.qmd:298-317): a "
    "cheap driver-side probe (max order date) picks which filter the "
    "plan gets; the chosen branch pushes into the scan like any static "
    "predicate. Oracle folds the same branch into a scalar subquery.",
)
def q_era_branch(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    max_date = orders.agg(F.max("o_orderdate")).collect()[0][0]
    if max_date is not None and max_date.year >= 2000:
        keep = ["1-URGENT", "2-HIGH"]
    else:
        keep = ["3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    return (
        orders.filter(F.col("o_orderpriority").isin(keep))
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_asof_forward",
    oracle=f"""
WITH p AS (
  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       p.user_id,
       strftime(p.ts, '{_TS_FMT_SQL}') AS purchase_ts,
       strftime(c.ts, '{_TS_FMT_SQL}') AS next_ts,
       c.value AS next_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts <= c.ts
ORDER BY event_id
""",
    doc="Forward as-of join (SURVEY.md J4): each purchase gets the "
    "user's next click at-or-after it — the inverse traversal of "
    "q_asof_join, same single-shuffle window mechanics (descending "
    "carry). Oracle: DuckDB ASOF with the <= comparator.",
)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        purchases,
        clicks,
        key="user_id",
        ts="ts",
        right_cols=["ts", "value"],
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", _TS_FMT).alias("purchase_ts"),
        F.date_format("asof_ts", _TS_FMT).alias("next_ts"),
        F.col("asof_value").alias("next_value"),
    ).orderBy("event_id")
