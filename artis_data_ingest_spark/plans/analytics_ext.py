"""Analytics-surface extensions: range/band join, exact percentiles,
moving-average window frames, GROUPING SETS, and the oracle-checked
flat schema-diff view (SURVEY.md J4, A5, W2, U1/§7.2 milestone 3).

These fill the remaining GAP rows of SURVEY.md §2 that the star-schema
and reference-core modules don't cover: non-equi joins, percentile
aggregates, bounded window frames, and arbitrary grouping sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.numeric import dsum, oracle_dsum
from ..operators.diff import dataset_diff
from ..sources.tables import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Range (band) join — SURVEY.md J4's interval-join shape.
# ---------------------------------------------------------------------------

_BANDS = [
    ("low", 0.0, 10.0),
    ("mid", 10.0, 100.0),
    ("high", 100.0, 1000.0),
]


@register(
    "q_range_join",
    oracle=f"""
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 10.0), ('mid', 10.0, 100.0), ('high', 100.0, 1000.0)
)
SELECT b.band,
       COUNT(*) AS n_events,
       {oracle_dsum('e.value', 'sum_value')}
FROM events e
JOIN bands b ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band
ORDER BY b.band
""",
    doc="Range/interval join (SURVEY.md J4 — absent in reference): bin "
    "the events fact against a tiny bands dimension on value ∈ [lo, hi). "
    "The small side is broadcast, so the non-equi join is a broadcast "
    "nested-loop over 3 rows per event — the idiomatic 100 TB shape for "
    "banding joins (never shuffle the fact for a 3-row dimension).",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        _BANDS,
        T.StructType(
            [
                T.StructField("band", T.StringType()),
                T.StructField("lo", T.DoubleType()),
                T.StructField("hi", T.DoubleType()),
            ]
        ),
    )
    return (
        ev.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .orderBy("band")
    )


# ---------------------------------------------------------------------------
# Exact percentiles — A5 family (reference has only count/count-distinct).
# ---------------------------------------------------------------------------


@register(
    "q_percentiles",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.25), 6) AS p25,
       round(quantile_cont(l_quantity, 0.50), 6) AS p50,
       round(quantile_cont(l_quantity, 0.75), 6) AS p75,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Exact interpolated percentiles per group (SURVEY.md A5 family). "
    "Spark's `percentile` and DuckDB's `quantile_cont` share linear-"
    "interpolation semantics. At 100 TB the drop-in scale path is "
    "`percentile_approx` (t-digest sketch, mergeable map-side) — kept "
    "exact here so the oracle can hash-match.",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.element_at(pct, 1), 6).alias("p25"),
            F.round(F.element_at(pct, 2), 6).alias("p50"),
            F.round(F.element_at(pct, 3), 6).alias("p75"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Moving average over a bounded window frame — W2.
# ---------------------------------------------------------------------------


@register(
    "q_moving_avg",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER w AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY o_custkey, o_orderkey
""",
    doc="Bounded-frame moving average (SURVEY.md W2: frames): 3-row "
    "trailing mean of order totals per customer, ordered by the unique "
    "orderkey (deterministic). Decimal sum / count keeps the value "
    "order-independent so it hash-matches the oracle. One shuffle on "
    "o_custkey; frames add no extra exchange.",
)
def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        (
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .over(w)
            .cast("double")
            / F.count(F.lit(1)).over(w)
        ).alias("moving_avg_price"),
    ).orderBy("o_custkey", "o_orderkey")


# ---------------------------------------------------------------------------
# GROUPING SETS — A5 (generalizes the rollup/cube queries).
# ---------------------------------------------------------------------------


@register(
    "q_grouping_sets",
    oracle=f"""
SELECT o_orderstatus,
       o_orderpriority,
       COUNT(*) AS n_orders,
       {oracle_dsum('o_totalprice', 'sum_total')}
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
    doc="Arbitrary GROUPING SETS (SURVEY.md A5): per (status, priority), "
    "per status, and grand total in one pass — Catalyst expands to a "
    "single shuffle with a grouping-id column rather than three scans.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
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
# Flat schema-diff view — oracle-checked slice of dataset_diff (U1).
# ---------------------------------------------------------------------------


@register(
    "q_schema_diff_flat",
    oracle="""
WITH oldc AS (
  SELECT regexp_replace(column_name, '^s_', '') AS col
  FROM (DESCRIBE supplier)
), newc AS (
  SELECT regexp_replace(column_name, '^c_', '') AS col
  FROM (DESCRIBE customer)
)
SELECT 'added' AS change, col FROM (SELECT col FROM newc EXCEPT SELECT col FROM oldc)
UNION ALL
SELECT 'removed' AS change, col FROM (SELECT col FROM oldc EXCEPT SELECT col FROM newc)
ORDER BY change, col
""",
    doc="Oracle-checked flat view of the dataset_diff operator "
    "(SURVEY.md U1/E3, assess_changes.qmd:151-158): supplier (old) vs "
    "customer (new) with the c_/s_ prefixes stripped plays the role of "
    "two snapshot schemas; added/removed column names exploded to rows. "
    "The diff itself is driver-side metadata — free at any data scale.",
)
def q_schema_diff_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    def strip_prefix(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            *[
                F.col(c).alias(c.removeprefix(prefix))
                for c in df.columns
            ]
        )

    old = strip_prefix(load_table(spark, sf_dir, "supplier"), "s_")
    new = strip_prefix(load_table(spark, sf_dir, "customer"), "c_")
    diff = dataset_diff(spark, old, new)
    added = diff.select(
        F.lit("added").alias("change"),
        F.explode("added_cols").alias("col"),
    )
    removed = diff.select(
        F.lit("removed").alias("change"),
        F.explode("removed_cols").alias("col"),
    )
    return added.unionByName(removed).orderBy("change", "col")


# ---------------------------------------------------------------------------
# Oracle-checked file listing — S5/S7 with a real filesystem oracle.
# ---------------------------------------------------------------------------


@register(
    "q_file_sizes",
    oracle="""
SELECT filename AS file, size AS size_bytes
FROM read_blob('/root/testdata/sf0.01/*.parquet')
ORDER BY file
""",
    doc="Distributed file listing with metadata (SURVEY.md S5/S7) made "
    "oracle-checkable: Spark's binaryFile source lists the fixture dir "
    "(path + length, content column pruned from the scan); DuckDB's "
    "read_blob is the independent filesystem oracle. Note the oracle "
    "path is pinned to the driver's sf0.01 gate directory.",
)
def q_file_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.files import list_files

    return (
        list_files(spark, sf_dir, glob="*.parquet")
        .select(
            F.regexp_replace("path", "^file:", "").alias("file"),
            F.col("length").alias("size_bytes"),
        )
        .orderBy("file")
    )


# ---------------------------------------------------------------------------
# Row-level value diff — the reference's changelog extended to row grain.
# ---------------------------------------------------------------------------


@register(
    "q_value_diff",
    oracle="""
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 2 = 0
), new AS (
  SELECT o_orderkey,
         round(o_totalprice + CASE WHEN o_orderkey % 7 = 0 THEN 1.0
                                   ELSE 0.0 END, 2) AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 3 <> 0
), j AS (
  SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS k,
         CASE WHEN old.o_orderkey IS NULL THEN 'added'
              WHEN new.o_orderkey IS NULL THEN 'removed'
              WHEN old.o_totalprice <> new.o_totalprice
                   OR old.o_orderstatus <> new.o_orderstatus THEN 'changed'
              ELSE 'unchanged' END AS change
  FROM old FULL OUTER JOIN new USING (o_orderkey)
)
SELECT change, COUNT(*) AS n, MIN(k) AS min_key, MAX(k) AS max_key
FROM j GROUP BY change ORDER BY change
""",
    doc="Row-level value diff of two table snapshots (the reference's "
    "file/schema changelog, assess_changes.qmd:97-185, extended to row "
    "grain): full-outer join on the key classifies each row as added / "
    "removed / changed / unchanged. The two 'snapshots' are synthesized "
    "from orders by key predicates with a deterministic perturbation. "
    "At 100 TB both sides shuffle once on the join key — or zero times "
    "if snapshots are bucketed on it (operators/bucketing.py).",
)
def q_value_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new = orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        F.round(
            F.col("o_totalprice")
            + F.when(F.col("o_orderkey") % 7 == 0, 1.0).otherwise(0.0),
            2,
        ).alias("o_totalprice"),
        "o_orderstatus",
    )
    o, n = old.alias("o"), new.alias("n")
    j = o.join(n, on="o_orderkey", how="full_outer").select(
        F.col("o_orderkey").alias("k"),
        F.when(F.col("o.o_totalprice").isNull()
               & F.col("o.o_orderstatus").isNull(), "added")
        .when(F.col("n.o_totalprice").isNull()
              & F.col("n.o_orderstatus").isNull(), "removed")
        .when(
            (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
            | (F.col("o.o_orderstatus") != F.col("n.o_orderstatus")),
            "changed",
        )
        .otherwise("unchanged")
        .alias("change"),
    )
    return (
        j.groupBy("change")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
        .orderBy("change")
    )


# ---------------------------------------------------------------------------
# Unpivot / melt — the inverse of the reference's pivot_wider (R1).
# ---------------------------------------------------------------------------


@register(
    "q_unpivot",
    oracle="""
SELECT o_orderkey, metric, value FROM (
  UNPIVOT (SELECT o_orderkey,
                  CAST(o_totalprice AS DOUBLE) AS totalprice,
                  CAST(o_custkey AS DOUBLE) AS custkey
           FROM orders)
  ON totalprice, custkey INTO NAME metric VALUE value
)
ORDER BY o_orderkey, metric
""",
    doc="Unpivot/melt (inverse of the reference's pivot_wider, "
    "SURVEY.md R1 family; R's pivot_longer): wide columns to "
    "(key, metric, value) long form via Spark's native unpivot — a "
    "narrow per-row expansion, no shuffle except the presentation "
    "sort.",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            F.col("o_totalprice").cast("double").alias("totalprice"),
            F.col("o_custkey").cast("double").alias("custkey"),
        )
        .unpivot(
            ids=["o_orderkey"],
            values=["totalprice", "custkey"],
            variableColumnName="metric",
            valueColumnName="value",
        )
        .orderBy("o_orderkey", "metric")
    )


# ---------------------------------------------------------------------------
# Ranking-function family — W2 completeness.
# ---------------------------------------------------------------------------


@register(
    "q_rank_family",
    oracle="""
SELECT c_mktsegment,
       c_custkey,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER w AS rnk,
       DENSE_RANK()   OVER w AS drnk,
       NTILE(4)       OVER w AS quartile,
       round(PERCENT_RANK() OVER w, 6) AS prank
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_custkey)
ORDER BY c_mktsegment, c_custkey
""",
    doc="The full ranking-function family over one window spec "
    "(SURVEY.md W2): row_number / rank / dense_rank / ntile / "
    "percent_rank share a single shuffle+sort on the partition key — "
    "Catalyst evaluates all five in one Window operator pass.",
)
def q_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_custkey")
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("prank"),
    ).orderBy("c_mktsegment", "c_custkey")


# ---------------------------------------------------------------------------
# Schema-on-read JSON struct parse — from_json with explicit schema.
# ---------------------------------------------------------------------------


@register(
    "q_json_struct",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k,
       MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
       MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
ORDER BY event_type
""",
    doc="JSON-in-string parsed with an explicit schema (from_json → "
    "struct, SURVEY.md §2.6 GAP fill beyond get_json_object): schema-"
    "on-read is declared once, so Catalyst prunes the JSON parse to the "
    "fields used and the downstream agg is over typed columns. At "
    "100 TB prefer this over per-path get_json_object calls — one parse "
    "per row, not one per path.",
)
def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T2

    ev = load_table(spark, sf_dir, "events")
    schema = T2.StructType([T2.StructField("k", T2.LongType())])
    parsed = ev.select(
        "event_type", F.from_json("props", schema).alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("p.k").alias("sum_k"),
            F.min("p.k").alias("min_k"),
            F.max("p.k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Error-tolerant casts — malformed input at scale must null, not fail.
# ---------------------------------------------------------------------------


@register(
    "q_try_cast",
    oracle="""
SELECT COUNT(*) AS n_rows,
       COUNT(TRY_CAST(o_orderpriority AS BIGINT)) AS n_numeric_priority,
       COUNT(TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT))
         AS n_numeric_prefix,
       CAST(SUM(COALESCE(
              TRY_CAST(substring(o_orderpriority, 1, 1) AS BIGINT), 0))
            AS BIGINT) AS sum_prefix
FROM orders
""",
    doc="Error-tolerant parsing (try_cast): malformed values become "
    "NULL instead of failing the job — the only sane semantics when one "
    "bad record in 100 TB must not kill a 6-hour pipeline. Counts parse "
    "successes of a non-numeric column vs its numeric prefix.",
)
def q_try_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    full = F.try_cast("o_orderpriority", "bigint") if hasattr(F, "try_cast") \
        else F.expr("try_cast(o_orderpriority AS bigint)")
    prefix = F.expr("try_cast(substring(o_orderpriority, 1, 1) AS bigint)")
    return orders.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(full).alias("n_numeric_priority"),
        F.count(prefix).alias("n_numeric_prefix"),
        F.sum(F.coalesce(prefix, F.lit(0))).alias("sum_prefix"),
    )


# ---------------------------------------------------------------------------
# Latest-state per key — event log → current-state table (SCD-1 shape).
# ---------------------------------------------------------------------------


@register(
    "q_latest_per_key",
    oracle="""
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY user_id ORDER BY ts DESC, event_id DESC
  ) AS rn
  FROM events
)
WHERE rn = 1
ORDER BY user_id
""",
    doc="Current-state table from an event log (SCD-1 upsert "
    "semantics): latest row per key by (ts, unique id) — the standard "
    "compaction an ingest pipeline runs to materialize mutable state "
    "from an append-only log. One window shuffle on the key; at "
    "100 TB this is the max_by/deduplicate step after every CDC load.",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Fuzzy entity matching — edit distance (the reference's country/species
# name-matching problem class).
# ---------------------------------------------------------------------------


@register(
    "q_fuzzy_match",
    oracle="""
SELECT a.n_name AS name_a, b.n_name AS name_b,
       levenshtein(a.n_name, b.n_name) AS dist
FROM nation a JOIN nation b
  ON a.n_nationkey < b.n_nationkey
WHERE levenshtein(a.n_name, b.n_name) <= 4
ORDER BY name_a, name_b
""",
    doc="Fuzzy entity matching via Levenshtein distance over the "
    "nation dimension (the reference's country/species set-difference "
    "reporting, assess_changes.qmd:335-351, upgraded from exact to "
    "approximate matching). Dimension-sized self-join — fine broadcast; "
    "at corpus scale, block first (q_minhash_portable-style) and "
    "edit-distance only candidates.",
)
def q_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    a = nation.alias("a")
    b = nation.alias("b")
    return (
        a.join(b, F.col("a.n_nationkey") < F.col("b.n_nationkey"))
        .select(
            F.col("a.n_name").alias("name_a"),
            F.col("b.n_name").alias("name_b"),
            F.levenshtein(F.col("a.n_name"), F.col("b.n_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 4)
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Equi + range interval join — J4's scalable hash-join-with-residual shape.
# ---------------------------------------------------------------------------


@register(
    "q_interval_join",
    oracle=f"""
WITH s AS (
  SELECT event_id AS signup_id, user_id, ts
  FROM events WHERE event_type = 'signup'
)
SELECT s.signup_id,
       COUNT(*) AS n_events,
       {oracle_dsum('e.value', 'sum_value')}
FROM s
JOIN events e
  ON e.user_id = s.user_id
 AND e.ts >= s.ts
 AND e.ts <  s.ts + INTERVAL 7 DAY
 AND e.event_id <> s.signup_id
GROUP BY s.signup_id
ORDER BY s.signup_id
""",
    doc="Interval join with an equality key (SURVEY.md J4): each "
    "user's activity in the 7 days after each of their signup events. "
    "The equi key makes this a plain hash join with the time range as "
    "a residual filter — the shape to prefer at 100 TB over pure range "
    "joins whenever any equality exists (one key shuffle, no interval "
    "explosion).",
)
def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user"),
        F.col("ts").alias("s_ts"),
    )
    return (
        ev.join(
            s,
            (F.col("user_id") == F.col("s_user"))
            & (F.col("ts") >= F.col("s_ts"))
            & (F.col("ts") < F.col("s_ts") + F.expr("INTERVAL 7 DAY"))
            & (F.col("event_id") != F.col("signup_id")),
        )
        .groupBy("signup_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "sum_value"),
        )
        .orderBy("signup_id")
    )


# ---------------------------------------------------------------------------
# Regex group extraction — the reference's version-suffix pattern (F3).
# ---------------------------------------------------------------------------


@register(
    "q_extract_version",
    oracle="""
WITH f AS (
  SELECT p_partkey,
         p_name || '_V' || CAST(202400 + p_partkey % 13 AS VARCHAR)
           || CASE WHEN p_partkey % 3 = 0 THEN 'a' ELSE '' END
           || '.csv' AS fname
  FROM part
)
SELECT regexp_extract(fname, '_V(\\d{6,7})([a-z]*)', 1) AS version,
       COUNT(*) AS n_files,
       MIN(p_partkey) AS first_part
FROM f
GROUP BY 1
ORDER BY version
""",
    doc="Regex group extraction (SURVEY.md F3's version suffix, "
    "assess_changes.qmd:90, inverted: capture the version instead of "
    "stripping it): synthesized versioned filenames, group-1 extract, "
    "count per release — the 'which snapshot version am I looking at' "
    "question the reference's changelog answers by hand.",
)
def q_extract_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    fname = F.concat(
        F.col("p_name"),
        F.lit("_V"),
        (F.lit(202400) + F.col("p_partkey") % 13).cast("string"),
        F.when(F.col("p_partkey") % 3 == 0, "a").otherwise(""),
        F.lit(".csv"),
    )
    return (
        part.select(
            "p_partkey",
            F.regexp_extract(fname, r"_V(\d{6,7})([a-z]*)", 1).alias("version"),
        )
        .groupBy("version")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.min("p_partkey").alias("first_part"),
        )
        .orderBy("version")
    )


@register(
    "q_approx_percentile",
    oracle="""
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.50), 6) AS exact_p50,
       COUNT(*) AS n,
       TRUE AS p50_within_tol
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
    doc="Approximate-percentile scale path (SURVEY.md A5): "
    "percentile_approx (mergeable sketch, map-side combinable — the "
    "100 TB drop-in for exact percentile) checked as a hard signal: "
    "the query emits the exact p50 plus a |approx/exact - 1| < 0.05 "
    "verdict per group (accuracy 1000; deterministic for fixed data), "
    "which the oracle pins as literal TRUE alongside the exact values "
    "— same pattern as q_approx_distinct's HLL bound.",
)
def q_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5D)"), 6).alias("exact_p50"),
        F.expr("percentile_approx(l_quantity, 0.5D, 1000)").alias("a50"),
        F.count(F.lit(1)).alias("n"),
    )
    return agg.select(
        "l_returnflag",
        "exact_p50",
        "n",
        (
            F.abs(F.col("a50").cast("double") / F.col("exact_p50") - 1.0)
            < 0.05
        ).alias("p50_within_tol"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# OLS by sufficient statistics — single-pass distributed regression.
# ---------------------------------------------------------------------------


@register(
    "q_linreg",
    oracle="""
WITH s AS (
  SELECT l_returnflag,
    COUNT(*) AS n,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS sxy,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
             * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sxx,
    CAST(SUM(CAST(l_discount AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS syy
  FROM lineitem
  GROUP BY l_returnflag
)
SELECT l_returnflag, n,
  (CAST(n AS DOUBLE) * sxy - sx * sy)
    / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
  (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
    / CAST(n AS DOUBLE) AS intercept,
  (CAST(n AS DOUBLE) * sxy - sx * sy)
    / (SQRT(CAST(n AS DOUBLE) * sxx - sx * sx)
       * SQRT(CAST(n AS DOUBLE) * syy - sy * sy)) AS corr
FROM s
ORDER BY l_returnflag
""",
    doc="Per-group OLS regression (slope/intercept/Pearson corr of "
    "discount on quantity) via SUFFICIENT STATISTICS — the one-pass "
    "distributed pattern: six exact decimal sums per group (order-"
    "independent partials), then a closed-form float expression. "
    "IEEE sqrt is correctly rounded and both engines evaluate the "
    "identical expression tree over identical exact-decimal inputs, "
    "so the doubles hash bit-for-bit; decimal unscaled values stay "
    "under 2^53 by choosing bounded columns. No iteration, no second "
    "pass — the shape gradient-free linear models use at 100 TB.",
)
def q_linreg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(12,2)")
    y = F.col("l_discount").cast("decimal(12,2)")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    var_y = nd * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov_n / var_x
    return (
        s.select(
            "l_returnflag",
            "n",
            slope.alias("slope"),
            ((F.col("sy") - slope * F.col("sx")) / nd).alias("intercept"),
            (cov_n / (F.sqrt(var_x) * F.sqrt(var_y))).alias("corr"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram — single-pass data profiling.
# ---------------------------------------------------------------------------

_HIST_WIDTH = 10_000
_HIST_BINS = 12


@register(
    "q_histogram",
    oracle=f"""
SELECT
  LEAST(CAST(FLOOR(l_extendedprice / {_HIST_WIDTH}.0) AS BIGINT),
        {_HIST_BINS - 1}) AS bin,
  LEAST(CAST(FLOOR(l_extendedprice / {_HIST_WIDTH}.0) AS BIGINT),
        {_HIST_BINS - 1}) * {_HIST_WIDTH} AS bin_lo,
  COUNT(*) AS n,
  {oracle_dsum('l_extendedprice', 'sum_price')}
FROM lineitem
GROUP BY bin, bin_lo
ORDER BY bin
""",
    doc="Fixed-width histogram of l_extendedprice (width 10k, last bin "
    "open-ended) — single-pass data profiling: bin index is a pure "
    "projection (floor of a double quotient — identical IEEE result "
    "both engines), so the histogram is one partial+final hash "
    "aggregate over at most n_bins groups. The profile every ingest "
    "pipeline runs before choosing partition bounds.",
)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    bin_ = F.least(
        F.floor(F.col("l_extendedprice") / F.lit(float(_HIST_WIDTH))).cast(
            "bigint"
        ),
        F.lit(_HIST_BINS - 1).cast("bigint"),
    )
    return (
        li.select(
            bin_.alias("bin"),
            (bin_ * _HIST_WIDTH).alias("bin_lo"),
            "l_extendedprice",
        )
        .groupBy("bin", "bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice", "sum_price"),
        )
        .orderBy("bin")
    )


# ---------------------------------------------------------------------------
# Z-order curve cells — the multi-dimensional clustering key, oracled.
# ---------------------------------------------------------------------------

_Z_BITS = 8
_ZX_LO, _ZX_W = 0.0, 500.0  # l_extendedprice grid
_ZY_LO, _ZY_W = 0.0, 1.0  # l_quantity grid
_Z_CELL_SHIFT = 8


def _zorder_oracle() -> str:
    from ..operators.zorder import bucket_sql, zvalue_sql

    bx = bucket_sql("l_extendedprice", _ZX_LO, _ZX_W, _Z_BITS)
    by = bucket_sql("l_quantity", _ZY_LO, _ZY_W, _Z_BITS)
    z = zvalue_sql("bx", "by", _Z_BITS)
    return f"""
WITH g AS (
  SELECT {bx} AS bx, {by} AS by FROM lineitem
), zv AS (
  SELECT {z} AS z FROM g
)
SELECT z >> {_Z_CELL_SHIFT} AS cell,
       COUNT(*) AS n,
       MIN(z) AS z_min,
       MAX(z) AS z_max
FROM zv
GROUP BY cell
ORDER BY cell
"""


@register(
    "q_zorder_cells",
    oracle=_zorder_oracle(),
    doc="Morton (Z-order) curve cells over the (l_extendedprice, "
    "l_quantity) grid: bucket both dimensions to 8 bits, interleave "
    "with a pure shift/and/or expression tree (operators/zorder.py — "
    "codegen, no UDF), aggregate per curve cell. The clustering key "
    "behind multi-dimensional data skipping: files sorted by z get "
    "tight min/max envelopes in BOTH dimensions (the manifest test "
    "pins the pruning claim); this query pins the key itself — "
    "bit-identical integers in both engines.",
)
def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.zorder import bucket, zvalue

    li = load_table(spark, sf_dir, "lineitem")
    bx = bucket(F.col("l_extendedprice"), _ZX_LO, _ZX_W, _Z_BITS)
    by = bucket(F.col("l_quantity"), _ZY_LO, _ZY_W, _Z_BITS)
    z = zvalue(bx, by, _Z_BITS)
    return (
        li.select(z.alias("z"))
        .groupBy(F.shiftright(F.col("z"), _Z_CELL_SHIFT).alias("cell"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("z").alias("z_min"),
            F.max("z").alias("z_max"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# Count-min sketch — mergeable frequency estimation, fully deterministic.
# ---------------------------------------------------------------------------

_CMS_P, _CMS_W, _CMS_D = 2147483647, 4096, 4
_CMS_A = (131071, 524287, 8191, 127)
_CMS_B = (97, 193, 389, 769)
_CMS_PROBES = (1, 2, 3, 5, 8)


def _cms_oracle() -> str:
    rows = " UNION ALL ".join(
        f"SELECT {i} AS d, {_CMS_A[i]} AS a, {_CMS_B[i]} AS b"
        for i in range(_CMS_D)
    )
    probes = " UNION ALL ".join(
        f"SELECT CAST({k} AS BIGINT) AS key" for k in _CMS_PROBES
    )
    return f"""
WITH hashes AS ({rows}),
cms AS (
  SELECT h.d, ((l.l_partkey * h.a + h.b) % {_CMS_P}) % {_CMS_W} AS col,
         COUNT(*) AS cnt
  FROM lineitem l, hashes h
  GROUP BY d, col
),
n AS (SELECT COUNT(*) AS n_total FROM lineitem),
probes AS ({probes}),
cells AS (
  SELECT p.key, h.d, ((p.key * h.a + h.b) % {_CMS_P}) % {_CMS_W} AS col
  FROM probes p, hashes h
),
est AS (
  SELECT c.key, MIN(COALESCE(cms.cnt, 0)) AS estimate
  FROM cells c LEFT JOIN cms ON cms.d = c.d AND cms.col = c.col
  GROUP BY c.key
),
exact AS (
  SELECT l_partkey AS key, COUNT(*) AS exact FROM lineitem GROUP BY 1
)
SELECT e.key, e.estimate, COALESCE(x.exact, 0) AS exact,
       e.estimate >= COALESCE(x.exact, 0) AS overestimates,
       e.estimate - COALESCE(x.exact, 0) <= (2 * n.n_total) // {_CMS_W}
         AS within_bound
FROM est e LEFT JOIN exact x ON e.key = x.key, n
ORDER BY e.key
"""


@register(
    "q_cms_estimate",
    oracle=_cms_oracle(),
    doc=f"Count-min sketch frequency estimation (d={_CMS_D} pairwise "
    f"hash rows × w={_CMS_W} columns, fixed (a*k+b) mod p mod w "
    "hashes so BOTH engines build the identical sketch): the sketch "
    "is one grouped COUNT over the hashed stream (map-side combine "
    "collapses to d*w cells — mergeable by cell-wise addition, the "
    "property that lets partial sketches from different shards or "
    "days sum into one), probes read the min over their d cells, and "
    "the CMS guarantees ship IN-QUERY as verdicts: estimate never "
    "undercounts, and overshoot stays within 2N/w. All integer — "
    "deterministic at any partitioning.",
)
def q_cms_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    hashes = spark.createDataFrame(
        [(i, _CMS_A[i], _CMS_B[i]) for i in range(_CMS_D)],
        "d int, a bigint, b bigint",
    )
    col_of = F.expr(f"((l_partkey * a + b) % {_CMS_P}) % {_CMS_W}")
    cms = (
        li.crossJoin(F.broadcast(hashes))
        .select("d", col_of.alias("col"))
        .groupBy("d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    n = li.agg(F.count(F.lit(1)).alias("n_total"))
    probes = spark.createDataFrame(
        [(int(k),) for k in _CMS_PROBES], "key bigint"
    )
    cells = probes.crossJoin(F.broadcast(hashes)).select(
        "key",
        "d",
        F.expr(f"((key * a + b) % {_CMS_P}) % {_CMS_W}").alias("col"),
    )
    est = (
        cells.join(cms, ["d", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )
    exact = (
        li.filter(F.col("l_partkey").isin(*_CMS_PROBES))
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    bound = F.expr(f"(2 * n_total) DIV {_CMS_W}")
    return (
        est.join(F.broadcast(exact), "key", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "key",
            "estimate",
            F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
            (
                F.col("estimate") >= F.coalesce(F.col("exact"), F.lit(0))
            ).alias("overestimates"),
            (
                F.col("estimate") - F.coalesce(F.col("exact"), F.lit(0))
                <= bound
            ).alias("within_bound"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median / MAD z-scores.
# ---------------------------------------------------------------------------

_MAD_K = 3.0


@register(
    "q_outlier_mad",
    oracle=f"""
WITH med AS (
  SELECT event_type, round(quantile_cont(value, 0.50), 6) AS med
  FROM events GROUP BY event_type
),
dev AS (
  SELECT e.event_type, ABS(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
),
mad AS (
  SELECT event_type, round(quantile_cont(adev, 0.50), 6) AS mad
  FROM dev GROUP BY event_type
)
SELECT d.event_type,
       COUNT(*) AS n,
       MIN(d.med) AS med,
       MIN(m.mad) AS mad,
       CAST(SUM(CASE WHEN d.adev > {_MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
ORDER BY d.event_type
""",
    doc="Robust (median/MAD) outlier detection per event type — the "
    "heavy-tail-safe twin of q_anomaly_p99: pass 1 computes the exact "
    "interpolated median per group (percentile ≡ quantile_cont "
    "semantics, rounded to 6 so both engines agree at ULP level), "
    "pass 2 the median absolute deviation, and the |x−med| > 3·MAD "
    "flags count per group. Two grouped percentile passes with the "
    "group-bounded medians broadcast back onto the fact scan; "
    "percentile_approx is the mergeable 100 TB drop-in for both "
    "passes.",
)
def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5D)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("value") - F.col("med")).alias("adev"),
        "med",
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5D)"), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("med").alias("med"),
            F.min("mad").alias("mad"),
            F.sum(
                (F.col("adev") > F.lit(_MAD_K) * F.col("mad")).cast("int")
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Two-sample comparison: Welch t-statistic from sufficient statistics.
# ---------------------------------------------------------------------------

_AB_A, _AB_B = "click", "view"


@register(
    "q_ab_test",
    oracle=f"""
WITH s AS (
  SELECT event_type,
    COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sx,
    CAST(SUM(CAST(value AS DECIMAL(12,2))
             * CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sxx
  FROM events
  WHERE event_type IN ('{_AB_A}', '{_AB_B}')
  GROUP BY event_type
),
m AS (
  SELECT event_type, n, sx / CAST(n AS DOUBLE) AS mean,
    (sxx - sx * sx / CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE) AS var
  FROM s
),
w AS (
  SELECT
    MAX(CASE WHEN event_type = '{_AB_A}' THEN n END) AS n_a,
    MAX(CASE WHEN event_type = '{_AB_B}' THEN n END) AS n_b,
    MAX(CASE WHEN event_type = '{_AB_A}' THEN mean END) AS mean_a,
    MAX(CASE WHEN event_type = '{_AB_B}' THEN mean END) AS mean_b,
    MAX(CASE WHEN event_type = '{_AB_A}' THEN var END) AS var_a,
    MAX(CASE WHEN event_type = '{_AB_B}' THEN var END) AS var_b
  FROM m
)
SELECT n_a, n_b, mean_a, mean_b,
  (mean_a - mean_b)
    / SQRT(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE))
    AS t_stat,
  ABS((mean_a - mean_b)
      / SQRT(var_a / CAST(n_a AS DOUBLE) + var_b / CAST(n_b AS DOUBLE)))
    > 1.96 AS significant
FROM w
""",
    doc="Two-sample (A/B) comparison via the Welch t-statistic, "
    "computed entirely from sufficient statistics — one grouped pass "
    "collects n/Σx/Σx² per arm in exact decimals, the statistic is a "
    "closed-form float expression (identical tree both engines, IEEE "
    "sqrt correctly rounded), and the |t| > 1.96 decision ships as an "
    "in-query verdict. The experimentation-analysis shape at any "
    "scale: no per-row work after the first aggregate.",
)
def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_AB_A, _AB_B)
    )
    x = F.col("value").cast("decimal(12,2)")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
    )
    nd = F.col("n").cast("double")
    m = s.select(
        "event_type",
        "n",
        (F.col("sx") / nd).alias("mean"),
        (
            (F.col("sxx") - F.col("sx") * F.col("sx") / nd)
            / (F.col("n") - 1).cast("double")
        ).alias("var"),
    )
    def _pick(col: str, arm: str):
        return F.max(
            F.when(F.col("event_type") == arm, F.col(col))
        )

    w = m.agg(
        _pick("n", _AB_A).alias("n_a"),
        _pick("n", _AB_B).alias("n_b"),
        _pick("mean", _AB_A).alias("mean_a"),
        _pick("mean", _AB_B).alias("mean_b"),
        _pick("var", _AB_A).alias("var_a"),
        _pick("var", _AB_B).alias("var_b"),
    )
    se = F.sqrt(
        F.col("var_a") / F.col("n_a").cast("double")
        + F.col("var_b") / F.col("n_b").cast("double")
    )
    t = (F.col("mean_a") - F.col("mean_b")) / se
    return w.select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        t.alias("t_stat"),
        (F.abs(t) > 1.96).alias("significant"),
    )


# ---------------------------------------------------------------------------
# Entity resolution: blocked fuzzy match → connected components →
# canonical representative (the reference's name-harmonization problem).
# ---------------------------------------------------------------------------

_ER_MAX_DIST = 3


@register(
    "q_entity_resolution",
    oracle=f"""
WITH RECURSIVE names AS (
  SELECT DISTINCT p_name AS name FROM part
), blocked AS (
  SELECT name, regexp_extract(name, '([a-z]+)$', 1) AS blk FROM names
), cand AS (
  SELECT a.name AS a, b.name AS b
  FROM blocked a JOIN blocked b ON a.blk = b.blk AND a.name < b.name
  WHERE levenshtein(a.name, b.name) <= {_ER_MAX_DIST}
), sym AS (
  SELECT a, b FROM cand UNION SELECT b, a FROM cand
), reach AS (
  SELECT a, b FROM sym
  UNION
  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
), labels AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS cluster
  FROM reach GROUP BY a
), resolved AS (
  SELECT n.name, COALESCE(l.cluster, n.name) AS cluster
  FROM names n LEFT JOIN labels l ON n.name = l.node
)
SELECT r.cluster AS canonical,
       COUNT(DISTINCT r.name) AS n_names,
       COUNT(*) AS n_parts
FROM part p JOIN resolved r ON p.p_name = r.name
GROUP BY r.cluster
ORDER BY canonical
""",
    doc="Entity resolution end-to-end — the reference's country/"
    "species name-harmonization problem (assess_changes.qmd:335-351) "
    "run as a pipeline: block on the trailing noun (linear blocking — "
    "candidate pairs only form inside a block, never all-pairs), "
    "verify candidates with Levenshtein <= 3, close the match graph "
    "into clusters (min-label propagation + pointer jumping in Spark; "
    "recursive-CTE transitive closure in the oracle), and pick each "
    "cluster's canonical name (min), reporting variant and member "
    "counts. Name-level work is vocabulary-bounded; the only "
    "corpus-scale op is the final part→cluster equi-join.",
    bench=True,  # r7: first sf0.1 trend anchor (VERDICT r6 task 9)
)
def q_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import connected_components

    part = load_table(spark, sf_dir, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    blocked = names.select(
        "name", F.regexp_extract("name", "([a-z]+)$", 1).alias("blk")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.name") < F.col("b.name")),
        )
        .select(F.col("a.name").alias("src"), F.col("b.name").alias("dst"))
        .filter(F.levenshtein("src", "dst") <= _ER_MAX_DIST)
    )
    labels = connected_components(cand)
    resolved = names.join(
        labels, names["name"] == labels["node"], "left"
    ).select(
        "name", F.coalesce(F.col("cluster"), F.col("name")).alias("cluster")
    )
    return (
        part.join(F.broadcast(resolved), part["p_name"] == resolved["name"])
        .groupBy(F.col("cluster").alias("canonical"))
        .agg(
            F.countDistinct("name").alias("n_names"),
            F.count(F.lit(1)).alias("n_parts"),
        )
        .orderBy("canonical")
    )


@register(
    "q_k_anonymity",
    oracle="""
WITH g AS (
  SELECT event_type,
         user_id % 12 AS cohort,
         CAST(FLOOR(value / 100) AS BIGINT) AS band,
         COUNT(*) AS n_events,
         COUNT(DISTINCT user_id) AS n_users,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events
  GROUP BY 1, 2, 3
)
SELECT event_type,
       CAST(cohort AS VARCHAR) AS cohort,
       CAST(band AS VARCHAR) AS band,
       n_events, n_users, cents
FROM g WHERE n_users >= 5
UNION ALL
SELECT event_type, '<suppressed>' AS cohort,
       CAST(COUNT(*) AS VARCHAR) AS band,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       NULL AS n_users,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM g WHERE n_users < 5
GROUP BY event_type
ORDER BY event_type, cohort, band
""",
    doc="k-anonymity release suppression (SURVEY.md §2.11 privacy "
    "hygiene): aggregate events by quasi-identifier (event_type, user "
    "cohort, value band) and publish only groups with >= 5 distinct "
    "users; smaller groups are NOT silently dropped — they roll up "
    "into one per-event_type '<suppressed>' row carrying their "
    "combined event count, exact cents, and the number of suppressed "
    "groups (in the band column), so released totals still reconcile "
    "with the source.  Two aggregations over one grouped base — the "
    "base groupBy is the only corpus-scale shuffle; the suppressed "
    "rollup runs over the (already tiny) group table.",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy(
            "event_type",
            (F.col("user_id") % 12).alias("cohort"),
            F.floor(F.col("value") / 100).cast("bigint").alias("band"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(
                F.round(F.col("value") * 100).cast("bigint")
            ).cast("bigint").alias("cents"),
        )
    )
    big = g.filter(F.col("n_users") >= 5).select(
        "event_type",
        F.col("cohort").cast("string").alias("cohort"),
        F.col("band").cast("string").alias("band"),
        "n_events",
        "n_users",
        "cents",
    )
    small = (
        g.filter(F.col("n_users") < 5)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("string").alias("band"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .select(
            "event_type",
            F.lit("<suppressed>").alias("cohort"),
            "band",
            "n_events",
            F.lit(None).cast("bigint").alias("n_users"),
            "cents",
        )
    )
    return big.unionByName(small).orderBy("event_type", "cohort", "band")


@register(
    "q_zscore_normalize",
    oracle="""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(cents) AS BIGINT) AS s1,
         CAST(SUM(cents * cents) AS BIGINT) AS s2
  FROM c GROUP BY 1
), st AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS mean_c,
         sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
           AS std_c
  FROM s
)
SELECT c.event_type,
       st.n AS n_events,
       round(st.mean_c / 100, 6) AS mean_value,
       round(st.std_c / 100, 6) AS std_value,
       CAST(SUM(CASE WHEN abs((c.cents - st.mean_c) / st.std_c) > 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       round(MIN((c.cents - st.mean_c) / st.std_c), 6) AS min_z,
       round(MAX((c.cents - st.mean_c) / st.std_c), 6) AS max_z
FROM c JOIN st USING (event_type)
GROUP BY c.event_type, st.n, st.mean_c, st.std_c
ORDER BY event_type
""",
    doc="Feature standardization (z-score) per group — the train-time "
    "normalization every tabular/feature pipeline runs before "
    "modeling: per-event_type mean/std derived from EXACT integer "
    "sufficient statistics (cents and squared cents summed as BIGINT "
    "— associative, partition-order-independent; the only float ops "
    "are the final two divisions, one multiply, and an IEEE "
    "correctly-rounded sqrt, mirrored operation-for-operation by the "
    "oracle), then per-row z = (x - mean)/std feeding outlier counts "
    "and extreme-z bounds (MIN/MAX are order-independent, so doubles "
    "hash cross-engine; a float SUM of z-scores would not be and is "
    "deliberately absent).  Plan: one map-side-combined groupBy for "
    "the statistics, broadcast back onto the scan, one final rollup.",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("bigint").alias("s1"),
        F.sum(F.col("cents") * F.col("cents")).cast("bigint").alias("s2"),
    )
    mean_c = F.col("s1").cast("double") / F.col("n")
    st = s.select(
        "event_type",
        "n",
        mean_c.alias("mean_c"),
        F.sqrt(
            F.col("s2").cast("double") / F.col("n")
            - mean_c * mean_c
        ).alias("std_c"),
    )
    z = (F.col("cents") - F.col("mean_c")) / F.col("std_c")
    return (
        c.join(F.broadcast(st), "event_type")
        .groupBy("event_type", F.col("n").alias("n_events"),
                 "mean_c", "std_c")
        .agg(
            F.sum(
                F.when(F.abs(z) > 2, 1).otherwise(0)
            ).cast("bigint").alias("n_outliers"),
            F.round(F.min(z), 6).alias("min_z"),
            F.round(F.max(z), 6).alias("max_z"),
        )
        .select(
            "event_type",
            "n_events",
            F.round(F.col("mean_c") / 100, 6).alias("mean_value"),
            F.round(F.col("std_c") / 100, 6).alias("std_value"),
            "n_outliers",
            "min_z",
            "max_z",
        )
        .orderBy("event_type")
    )


@register(
    "q_feature_hash",
    oracle="""
WITH t AS (
  SELECT doc_id,
         UNNEST(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'))
           AS tok
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(tok), 1, 4)) AS INT) % 64
           AS bucket
  FROM t
)
SELECT bucket,
       COUNT(*) AS n_tokens,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
FROM b
GROUP BY bucket
ORDER BY bucket
""",
    doc="Feature hashing (the 'hashing trick' of Vowpal-Wabbit-style "
    "linear models and sparse featurizers): tokens map to a fixed "
    "64-bucket feature space via md5-prefix buckets — engine-portable "
    "where murmur3 is not, deterministic, no vocabulary build or "
    "broadcast dictionary.  The query validates the whole encode path "
    "with the global bucket histogram (total tokens + distinct docs "
    "per bucket — a distribution skewed or truncated by a hash/modulo "
    "bug hash-mismatches).  Plan: explode inside the scan stage, one "
    "map-side-combined shuffle on the bucket key; per-doc sparse "
    "vectors are the same expression grouped by doc_id instead.",
)
def q_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+")
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % 64
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
        )
        .orderBy("bucket")
    )


# Moment math shared verbatim by the Spark expression builder and the
# DuckDB oracle: every float op in the same order, powers spelled as
# explicit multiplications (never pow(), whose libm may differ), so the
# doubles are bit-identical given identical exact integer sums.
_MOM_MEAN = "(CAST(s1 AS DOUBLE) / n)"
_MOM_M2 = f"(CAST(s2 AS DOUBLE) / n - {_MOM_MEAN} * {_MOM_MEAN})"
_MOM_M3 = (
    f"(CAST(s3 AS DOUBLE) / n"
    f" - 3 * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / n)"
    f" + 2 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_M4 = (
    f"(CAST(s4 AS DOUBLE) / n"
    f" - 4 * {_MOM_MEAN} * (CAST(s3 AS DOUBLE) / n)"
    f" + 6 * {_MOM_MEAN} * {_MOM_MEAN} * (CAST(s2 AS DOUBLE) / n)"
    f" - 3 * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN} * {_MOM_MEAN})"
)
_MOM_SKEW = f"({_MOM_M3} / ({_MOM_M2} * sqrt({_MOM_M2})))"
_MOM_KURT = f"({_MOM_M4} / ({_MOM_M2} * {_MOM_M2}) - 3)"


@register(
    "q_higher_moments",
    oracle=f"""
WITH c AS (
  SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), s AS (
  SELECT event_type, COUNT(*) AS n,
         SUM(CAST(v AS DECIMAL(38,0))) AS s1,
         SUM(CAST(v AS DECIMAL(38,0)) * v) AS s2,
         SUM(CAST(v AS DECIMAL(38,0)) * v * v) AS s3,
         SUM(CAST(v AS DECIMAL(38,0)) * v * v * v) AS s4
  FROM c GROUP BY 1
)
SELECT event_type, n,
       round({_MOM_MEAN} / 100, 6) AS mean_value,
       round(sqrt({_MOM_M2}) / 100, 6) AS std_value,
       round({_MOM_SKEW}, 6) AS skewness,
       round({_MOM_KURT}, 6) AS excess_kurtosis
FROM s
ORDER BY event_type
""",
    doc="Higher-moment profiling (skewness + excess kurtosis) per "
    "group — the distribution-shape statistics a feature-drift / "
    "data-quality monitor tracks beyond mean/std: computed from EXACT "
    "decimal(38,0) power sums of integer cents (associative, "
    "partition-order-independent; v^4 sums stay far under 10^38 at "
    "any realistic value range), with the moment algebra shared "
    "VERBATIM between the Spark expression and the oracle SQL — every "
    "division/multiply in the same order, powers as explicit "
    "multiplications, sqrt the only intrinsic — so the doubles are "
    "bit-identical.  One map-side-combined aggregate; 5 result rows.",
)
def q_higher_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.round(F.col("value") * 100).cast("bigint").alias("v"),
    )
    vdec = F.col("v").cast("decimal(38,0)")
    s = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(vdec).alias("s1"),
        F.sum(vdec * F.col("v")).alias("s2"),
        F.sum(vdec * F.col("v") * F.col("v")).alias("s3"),
        F.sum(vdec * F.col("v") * F.col("v") * F.col("v")).alias("s4"),
    )
    return s.select(
        "event_type",
        "n",
        F.expr(f"round({_MOM_MEAN} / 100, 6)").alias("mean_value"),
        F.expr(f"round(sqrt({_MOM_M2}) / 100, 6)").alias("std_value"),
        F.expr(f"round({_MOM_SKEW}, 6)").alias("skewness"),
        F.expr(f"round({_MOM_KURT}, 6)").alias("excess_kurtosis"),
    ).orderBy("event_type")


@register(
    "q_feature_vectors",
    oracle="""
WITH t AS (
  SELECT doc_id,
         UNNEST(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'))
           AS tok
  FROM documents
), b AS (
  SELECT doc_id,
         CAST(CONCAT('0x', substring(md5(tok), 1, 4)) AS INT) % 64
           AS bucket
  FROM t
)
SELECT doc_id, bucket, COUNT(*) AS weight
FROM b
WHERE doc_id < 50
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
""",
    doc="Per-document SPARSE feature vectors in exploded (doc_id, "
    "bucket, weight) form — the row layout a linear model / logistic "
    "trainer consumes from the hashing-trick featurizer (the grouped "
    "sibling of q_feature_hash's global histogram; same md5-prefix "
    "bucket function, so the two queries cross-validate).  Bounded to "
    "the first 50 docs for a hash-checkable output; the full-corpus "
    "form is the same expression without the predicate — one explode "
    "+ one map-side-combined shuffle on (doc_id, bucket), vectors "
    "never materialize densely.",
)
def q_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 50
    )
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+")
        ).alias("tok"),
    )
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % 64
    )
    return (
        toks.select("doc_id", bucket.alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("weight"))
        .orderBy("doc_id", "bucket")
    )


# ---------------------------------------------------------------------------
# ROC-AUC via the Mann-Whitney U statistic — model-evaluation support
# for the quality-classifier stage (scores vs binary labels) without a
# global per-row sort.
# ---------------------------------------------------------------------------


@register(
    "q_score_auc",
    oracle="""
WITH l AS (
  SELECT value,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
  FROM events
), dv AS (
  SELECT value,
         CAST(COUNT(*) AS BIGINT) AS n_v,
         CAST(SUM(pos) AS BIGINT) AS p_v
  FROM l GROUP BY value
), cum AS (
  SELECT value, n_v, p_v,
         SUM(n_v) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS c
  FROM dv
), agg AS (
  SELECT CAST(SUM(p_v) AS BIGINT) AS n_pos,
         CAST(SUM(n_v) - SUM(p_v) AS BIGINT) AS n_neg,
         CAST(SUM(p_v * (2 * (c - n_v) + n_v + 1)) AS BIGINT) AS rank2_sum
  FROM cum
)
SELECT n_pos, n_neg, rank2_sum,
       CAST(rank2_sum - n_pos * (n_pos + 1) AS DOUBLE)
         / (2 * n_pos * n_neg) AS auc
FROM agg
""",
    doc="ROC-AUC of a score column against a binary label (here: does "
    "`value` predict event_type == 'purchase') via the Mann-Whitney U "
    "identity AUC = (R1 - n1(n1+1)/2) / (n1*n0) with midrank tie "
    "handling — the standard offline metric for the corpus "
    "quality-classifier stage.  Exact arithmetic: midranks are "
    "half-integers, so the query carries 2*rank sums as pure bigints "
    "(p_v*(2*cum_less + n_v + 1) per distinct score) and performs ONE "
    "double division at the end.  Plan: one hash aggregation onto "
    "distinct score values, then a cumulative window over the "
    "DISTINCT-value table only (NDV-bounded — the q_lm_perplexity "
    "distributed-rank playbook), never a global per-row sort; the "
    "final reduce is a 1-row scalar merge.",
)
def q_score_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    l = ev.select(
        "value",
        (F.col("event_type") == "purchase").cast("bigint").alias("pos"),
    )
    return mann_whitney_auc(l)


def mann_whitney_auc(labeled: DataFrame) -> DataFrame:
    """One-row AUC over a frame with columns ``value`` (double score)
    and ``pos`` (0/1 bigint label), midrank tie handling, exact bigint
    rank sums, one final double division."""
    from pyspark.sql.window import Window

    dv = labeled.groupBy("value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_v"),
        F.sum("pos").cast("bigint").alias("p_v"),
    )
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = dv.withColumn("c", F.sum("n_v").over(w))
    agg = cum.agg(
        F.sum("p_v").cast("bigint").alias("n_pos"),
        (F.sum("n_v") - F.sum("p_v")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("p_v")
            * (2 * (F.col("c") - F.col("n_v")) + F.col("n_v") + 1)
        )
        .cast("bigint")
        .alias("rank2_sum"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "rank2_sum",
        (
            (F.col("rank2_sum") - F.col("n_pos") * (F.col("n_pos") + 1))
            .cast("double")
            / (2 * F.col("n_pos") * F.col("n_neg"))
        ).alias("auc"),
    )


@register(
    "q_l_diversity",
    oracle="""
WITH g AS (
  SELECT user_id % 12 AS cohort,
         CAST(FLOOR(value / 100) AS BIGINT) AS band,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events
  GROUP BY 1, 2
)
SELECT CAST(cohort AS VARCHAR) AS cohort,
       CAST(band AS VARCHAR) AS band,
       n_events, n_types
FROM g WHERE n_types >= 3
UNION ALL
SELECT '<suppressed>' AS cohort,
       CAST(COUNT(*) AS VARCHAR) AS band,
       CAST(SUM(n_events) AS BIGINT) AS n_events,
       NULL AS n_types
FROM g WHERE n_types < 3
HAVING COUNT(*) > 0
ORDER BY cohort, band
""",
    doc="l-diversity release check (Machanavajjhala et al.) — the "
    "privacy gate k-anonymity alone misses: a group can hold >= k "
    "users yet reveal everyone's sensitive value if that value is "
    "uniform.  Quasi-identifier groups (user cohort, value band) "
    "publish only when the sensitive attribute (event_type) takes at "
    "least l = 3 distinct values; failing groups roll into a "
    "reconciling '<suppressed>' row carrying their combined event "
    "count and group count (q_k_anonymity's never-silently-drop "
    "contract).  Plan: one map-side-combined shuffle for the QI "
    "grouping; the diversity rollup runs over the tiny group table.",
)
def q_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    g = (
        ev.groupBy(
            (F.col("user_id") % 12).alias("cohort"),
            F.floor(F.col("value") / 100).cast("bigint").alias("band"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.countDistinct("event_type").cast("bigint").alias("n_types"),
        )
    )
    ok = g.filter(F.col("n_types") >= 3).select(
        F.col("cohort").cast("string").alias("cohort"),
        F.col("band").cast("string").alias("band"),
        "n_events",
        "n_types",
    )
    bad = (
        g.filter(F.col("n_types") < 3)
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("n_events").cast("bigint").alias("n_events"),
        )
        .filter(F.col("n_groups") > 0)
        .select(
            F.lit("<suppressed>").alias("cohort"),
            F.col("n_groups").cast("string").alias("band"),
            "n_events",
            F.lit(None).cast("bigint").alias("n_types"),
        )
    )
    return ok.unionByName(bad).orderBy("cohort", "band")


# ---------------------------------------------------------------------------
# Exact distributed quantiles via value-count rollup — the scale-exact
# counterpart to q_percentiles (in-memory percentile) and
# q_approx_percentile (sketch).
# ---------------------------------------------------------------------------


@register(
    "q_exact_quantiles",
    oracle="""
WITH vals AS (
  SELECT o_orderpriority AS prio,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
), vc AS (
  SELECT prio, cents, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM vals GROUP BY prio, cents
), cum AS (
  SELECT prio, cents, cnt,
         SUM(cnt) OVER (PARTITION BY prio ORDER BY cents
                        ROWS UNBOUNDED PRECEDING) AS cum_cnt,
         SUM(cnt) OVER (PARTITION BY prio) AS n
  FROM vc
)
SELECT prio AS o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n,
       MIN(CASE WHEN cum_cnt * 4 >= n THEN cents END) AS p25_cents,
       MIN(CASE WHEN cum_cnt * 2 >= n THEN cents END) AS p50_cents,
       MIN(CASE WHEN cum_cnt * 4 >= n * 3 THEN cents END) AS p75_cents
FROM cum
GROUP BY prio
ORDER BY o_orderpriority
""",
    doc="EXACT distributed quantiles (p25/median/p75 of order value in "
    "cents, per priority) without sorting the raw rows: rollup to "
    "(group, value) counts, cumulative-sum over the DISTINCT values "
    "only, then pick the smallest value whose cumulative count reaches "
    "ceil(q*n) — the inverted-CDF quantile (numpy "
    "method='inverted_cdf'; pinned in tests).  The threshold test is "
    "kept in integers (cum*4 >= n etc.) so both engines compare exact "
    "bigints — no float quantile semantics to disagree over.  Scale "
    "story: the only data-sized shuffle is the (group, value) partial-"
    "aggregated rollup; the window pass runs over distinct values "
    "(price-domain-bounded, orders-of-magnitude smaller than the fact "
    "table), which is how exact medians stay feasible at 100 TB where "
    "a global sort or single-partition percentile() would not.",
)
def q_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    vals = orders.select(
        F.col("o_orderpriority").alias("prio"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    vc = vals.groupBy("prio", "cents").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("prio")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy("prio")
    cum = vc.select(
        "prio",
        "cents",
        F.sum("cnt").over(w_cum).alias("cum_cnt"),
        F.sum("cnt").over(w_all).alias("n"),
    )
    pick = lambda cond, name: F.min(F.when(cond, F.col("cents"))).alias(name)
    return (
        cum.groupBy(F.col("prio").alias("o_orderpriority"))
        .agg(
            F.max("n").cast("bigint").alias("n"),
            pick(F.col("cum_cnt") * 4 >= F.col("n"), "p25_cents"),
            pick(F.col("cum_cnt") * 2 >= F.col("n"), "p50_cents"),
            pick(F.col("cum_cnt") * 4 >= F.col("n") * 3, "p75_cents"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Phonetic (Soundex) blocking for entity resolution — the classic
# sound-alike candidate generator beside q_entity_resolution's exact
# trailing-noun block and q_fuzzy_match's edit-distance verify.
# ---------------------------------------------------------------------------

# letter -> Soundex digit class, a..z (0 = vowel/h/w/y, dropped)
_SOUNDEX_MAP = "01230120022455012623010202"


@register(
    "q_soundex_blocking",
    oracle=f"""
WITH pw AS (
  SELECT lower(string_split(p_name, ' ')[-1]) AS word FROM part
), wc AS (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS n_parts FROM pw GROUP BY 1
), codes AS (
  SELECT word, n_parts,
         translate(word, 'abcdefghijklmnopqrstuvwxyz', '{_SOUNDEX_MAP}')
           AS ks
  FROM wc
), ch AS (
  SELECT word, n_parts, ks,
         CAST(UNNEST(range(length(ks))) AS BIGINT) AS pos
  FROM codes
), kd AS (
  SELECT word, n_parts, pos,
         substring(ks, CAST(pos + 1 AS INT), 1) AS k
  FROM ch
), kept AS (
  SELECT *, LAG(k) OVER (PARTITION BY word ORDER BY pos) AS pk
  FROM kd
), sig AS (
  SELECT word, n_parts,
         COALESCE(string_agg(
           CASE WHEN pos > 0 AND k <> '0' AND (pk IS NULL OR k <> pk)
                THEN k END, '' ORDER BY pos), '') AS tail
  FROM kept
  GROUP BY word, n_parts
), keys AS (
  SELECT word, n_parts,
         substring(word, 1, 1) || substring(tail || '000', 1, 3) AS skey
  FROM sig
)
SELECT skey AS soundex_key,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_parts) AS BIGINT) AS n_parts,
       CAST(COUNT(*) * (COUNT(*) - 1) / 2 AS BIGINT) AS n_cand_pairs,
       MIN(word) AS example_word
FROM keys
GROUP BY skey
ORDER BY n_parts DESC, soundex_key
""",
    doc="Phonetic blocking via Soundex keys over the part-name trailing "
    "noun (simplified American Soundex: first letter + first three "
    "distinct-run consonant classes, vowels/h/w/y as separators — the "
    "variant is pinned identically in both engines, so the hash match "
    "proves the full per-word pipeline: translate() class map, "
    "adjacent-run collapse via LAG over exploded positions, pad-to-3).  "
    "Output is the blocking profile ER planners need: words and rows "
    "per key plus the within-block candidate-pair count n*(n-1)/2 — "
    "the cost the verify stage (q_fuzzy_match's Levenshtein) would "
    "actually pay, versus the all-pairs quadratic it avoids.  Scale: "
    "runs entirely on the DISTINCT-words table (vocabulary-bounded); "
    "one (word, pos) window partitioned by word, then a key-bounded "
    "rollup; the corpus contributes only the word-count pass.",
)
def q_soundex_blocking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    wc = (
        part.select(
            F.lower(F.element_at(F.split("p_name", " "), -1)).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
    )
    codes = wc.select(
        "word",
        "n_parts",
        F.translate(
            "word", "abcdefghijklmnopqrstuvwxyz", _SOUNDEX_MAP
        ).alias("ks"),
    )
    ch = codes.select(
        "word",
        "n_parts",
        F.posexplode(F.split("ks", "(?!^)")).alias("pos", "k"),
    )
    w = Window.partitionBy("word").orderBy("pos")
    kept = ch.withColumn("pk", F.lag("k").over(w))
    sig = (
        kept.groupBy("word", "n_parts")
        .agg(
            F.coalesce(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(
                                    (F.col("pos") > 0)
                                    & (F.col("k") != "0")
                                    & (
                                        F.col("pk").isNull()
                                        | (F.col("k") != F.col("pk"))
                                    ),
                                    F.struct(
                                        F.col("pos").alias("pos"),
                                        F.col("k").alias("p"),
                                    ),
                                )
                            )
                        ),
                        lambda x: x["p"],
                    ),
                    "",
                ),
                F.lit(""),
            ).alias("tail")
        )
    )
    keys = sig.select(
        "word",
        "n_parts",
        F.concat(
            F.substring("word", 1, 1),
            F.substring(F.concat(F.col("tail"), F.lit("000")), 1, 3),
        ).alias("skey"),
    )
    return (
        keys.groupBy(F.col("skey").alias("soundex_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_parts").cast("bigint").alias("n_parts"),
            (F.count(F.lit(1)) * (F.count(F.lit(1)) - 1) / 2)
            .cast("bigint")
            .alias("n_cand_pairs"),
            F.min("word").alias("example_word"),
        )
        .orderBy(F.col("n_parts").desc(), "soundex_key")
    )


# ---------------------------------------------------------------------------
# Mergeable HLL sketch maintenance — the incremental companion to
# q_approx_distinct: per-batch sketches union algebraically, no rescan.
# ---------------------------------------------------------------------------


@register(
    "q_hll_incremental",
    oracle="""
SELECT source, CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_exact,
       TRUE AS est_ok
FROM documents GROUP BY source
UNION ALL
SELECT '<all>' AS source, CAST(COUNT(DISTINCT md5(text)) AS BIGINT),
       TRUE
FROM documents
ORDER BY source
""",
    doc="Mergeable distinct-count sketch maintenance (Apache DataSketches "
    "HLL via hll_sketch_agg/hll_union_agg): each source batch reduces "
    "to one fixed-size sketch; the corpus-wide count comes from the "
    "ALGEBRAIC UNION of the per-source sketches — no second scan, the "
    "incremental-ingest property that lets a 100 TB corpus maintain "
    "distinct counts by merging each new batch's sketch into a "
    "persisted one.  The in-query verdict est_ok pins every estimate "
    "(per-source AND the unioned total) within 5% of the exact count "
    "the oracle computes — a drifting estimator hash-mismatches.  "
    "Plan: one shuffle to the per-source sketches (sketches partial-"
    "aggregate map-side), a 21-row union; countDistinct here is the "
    "verdict's exact reference, not the scale path.",
)
def q_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("source", F.md5("text").alias("fp"))
    per = d.groupBy("source").agg(
        F.hll_sketch_agg("fp").alias("sk"),
        F.count_distinct("fp").cast("bigint").alias("n_exact"),
    )
    tol_ok = lambda est, exact: (
        F.abs(est.cast("double") - exact) / exact <= 0.05
    )
    rows = per.select(
        "source",
        "n_exact",
        tol_ok(F.hll_sketch_estimate("sk"), F.col("n_exact")).alias(
            "est_ok"
        ),
    )
    exact_all = d.agg(
        F.count_distinct("fp").cast("bigint").alias("n_exact")
    )
    allrow = (
        per.agg(F.hll_union_agg("sk").alias("usk"))
        .crossJoin(F.broadcast(exact_all))
        .select(
            F.lit("<all>").alias("source"),
            "n_exact",
            tol_ok(F.hll_sketch_estimate("usk"), F.col("n_exact")).alias(
                "est_ok"
            ),
        )
    )
    return rows.unionByName(allrow).orderBy("source")


# ---------------------------------------------------------------------------
# Functional-dependency discovery — data profiling beyond the
# reference's schema diff: which columns DETERMINE which others.
# ---------------------------------------------------------------------------

_FD_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]


def _fd_oracle() -> str:
    selects = []
    for a in _FD_COLS:
        for b in _FD_COLS:
            if a == b:
                continue
            selects.append(
                f"SELECT '{a}' AS det, '{b}' AS dep,\n"
                f"       CAST(COUNT(DISTINCT {a}) AS BIGINT) AS n_det,\n"
                f"       CAST(COUNT(DISTINCT ({a}, {b})) AS BIGINT)"
                f" AS n_det_dep\nFROM orders"
            )
    body = "\nUNION ALL\n".join(selects)
    return f"""
WITH pairs AS (
{body}
)
SELECT det, dep, n_det, n_det_dep, n_det = n_det_dep AS holds
FROM pairs
ORDER BY det, dep
"""


@register(
    "q_fd_discovery",
    oracle=_fd_oracle(),
    doc="Functional-dependency discovery over the orders table: the "
    "ordered column pair (a, b) satisfies a→b iff "
    "count_distinct(a) == count_distinct(a, b) — the standard "
    "TANE-style single-pass check.  Extends the reference's "
    "schema-as-data theme (assess_changes.qmd:148-173 diffs column "
    "SETS and types; this profiles the dependencies BETWEEN columns — "
    "key discovery, denormalization detection).  The fixture is "
    "null-free on these columns, so both engines' distinct-pair "
    "semantics coincide.  Plan: ONE scan computes all 16 distinct "
    "counts in a single aggregate (Spark expands multi-distinct "
    "map-side), then a stack() unpivot to the 12 verdict rows; the "
    "oracle's 12-scan UNION ALL is the same arithmetic.  At 100 TB "
    "swap countDistinct for approx_count_distinct (same plan, sketch "
    "accuracy) — the verdict becomes approximate-FD strength.",
)
def q_fd_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    aggs = []
    for a in _FD_COLS:
        aggs.append(F.countDistinct(a).cast("bigint").alias(f"d_{a}"))
        for b in _FD_COLS:
            if a != b:
                aggs.append(
                    F.countDistinct(a, b)
                    .cast("bigint")
                    .alias(f"d_{a}__{b}")
                )
    one = orders.agg(*aggs)
    stack_args = []
    n_pairs = 0
    for a in _FD_COLS:
        for b in _FD_COLS:
            if a != b:
                stack_args.append(f"'{a}', '{b}', d_{a}, d_{a}__{b}")
                n_pairs += 1
    stacked = one.select(
        F.expr(
            f"stack({n_pairs}, "
            + ", ".join(stack_args)
            + ") AS (det, dep, n_det, n_det_dep)"
        )
    )
    return stacked.select(
        "det",
        "dep",
        "n_det",
        "n_det_dep",
        (F.col("n_det") == F.col("n_det_dep")).alias("holds"),
    ).orderBy("det", "dep")


# ---------------------------------------------------------------------------
# Sorted-neighborhood ER blocking — the third blocking regime beside
# exact trailing-noun blocks (q_entity_resolution) and phonetic keys
# (q_soundex_blocking), built on the distributed rank primitive.
# ---------------------------------------------------------------------------

_SN_WINDOW = 2  # pair records within rank distance <= 2


@register(
    "q_sorted_neighborhood",
    oracle=f"""
WITH ranked AS (
  SELECT p_partkey, p_name,
         CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT)
           AS r
  FROM part
), pairs AS (
  SELECT d.d AS win_offset, a.p_name AS name_a, b.p_name AS name_b,
         levenshtein(a.p_name, b.p_name) <= 2 AS is_match
  FROM (SELECT UNNEST(range(1, {_SN_WINDOW + 1})) AS d) d
  JOIN ranked a ON TRUE
  JOIN ranked b ON b.r = a.r + d.d
)
SELECT CAST(win_offset AS BIGINT) AS win_offset,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT)
         AS n_matches,
       MIN(CASE WHEN is_match THEN name_a || '|' || name_b END)
         AS example_match
FROM pairs
GROUP BY win_offset
ORDER BY win_offset
""",
    doc="Sorted-neighborhood entity-resolution blocking (Hernández & "
    "Stolfo): sort all records by the blocking key and verify only "
    f"pairs within {_SN_WINDOW} positions — the sliding-window regime "
    "that catches prefix-sharing variants exact blocks and phonetic "
    "keys both miss.  The global sort position comes from "
    "operators/rank.py's distributed_dense_rank (unique composite key "
    "→ dense rank IS the row number) — no single-reducer window, "
    "unlike the oracle's textbook row_number; neighbors then pair by "
    "TWO consecutive-rank equi-joins (offset 1 and 2), and Levenshtein "
    "runs only on those O(n·w) candidates.  Output: candidate volume, "
    "verified matches, and the smallest witness pair per offset.",
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import distributed_dense_rank

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    ranked = distributed_dense_rank(
        part, ["p_name", "p_partkey"], out="r"
    ).select("p_name", "r")
    parts = []
    for d in range(1, _SN_WINDOW + 1):
        b = ranked.select(
            (F.col("r") - d).alias("r"), F.col("p_name").alias("name_b")
        )
        parts.append(
            ranked.join(b, "r")
            .select(
                F.lit(d).cast("bigint").alias("win_offset"),
                F.col("p_name").alias("name_a"),
                "name_b",
            )
        )
    pairs = parts[0]
    for p in parts[1:]:
        pairs = pairs.unionByName(p)
    pairs = pairs.withColumn(
        "is_match", F.levenshtein("name_a", "name_b") <= 2
    )
    return (
        pairs.groupBy("win_offset")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("is_match").cast("bigint")).alias("n_matches"),
            F.min(
                F.when(
                    F.col("is_match"),
                    F.concat_ws("|", "name_a", "name_b"),
                )
            ).alias("example_match"),
        )
        .orderBy("win_offset")
    )


# ---------------------------------------------------------------------------
# Skyline / Pareto frontier — the preference-query operator class.
# ---------------------------------------------------------------------------


@register(
    "q_pareto_skyline",
    oracle="""
WITH offers AS (
  SELECT l_returnflag AS grp, l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cost_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), ranked AS (
  SELECT *,
         MAX(qty) OVER (PARTITION BY grp ORDER BY cost_cents, qty DESC,
                        l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_qty_cheaper
  FROM offers
), sky AS (
  SELECT * FROM ranked
  WHERE best_qty_cheaper IS NULL OR qty > best_qty_cheaper
)
SELECT grp, l_orderkey, l_linenumber, cost_cents, qty
FROM sky
ORDER BY grp, cost_cents, qty DESC, l_orderkey, l_linenumber
""",
    doc="Skyline (Pareto frontier) preference query over order lines: "
    "per return flag, the lines no other line dominates on "
    "(cheaper-or-equal price, more quantity) — the classic 2-D skyline "
    "via the sort-filter-skyline recipe: order by (cost asc, qty "
    "desc), keep a row iff its qty strictly beats the running max of "
    "every strictly-cheaper-or-earlier row.  The tie order makes "
    "duplicate (cost, qty) points resolve deterministically (first by "
    "key survives, equals are dominated).  One group-bounded window "
    "per group — at 100 TB the partition key IS the parallelism; a "
    "global skyline adds one merge pass over the per-partition "
    "frontiers (frontier-sized, tiny).",
)
def q_pareto_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    offers = li.select(
        F.col("l_returnflag").alias("grp"),
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "cost_cents"
        ),
        F.col("l_quantity").cast("bigint").alias("qty"),
    )
    w = (
        Window.partitionBy("grp")
        .orderBy(
            "cost_cents", F.col("qty").desc(), "l_orderkey", "l_linenumber"
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = offers.withColumn(
        "best_qty_cheaper", F.max("qty").over(w)
    )
    sky = ranked.filter(
        F.col("best_qty_cheaper").isNull()
        | (F.col("qty") > F.col("best_qty_cheaper"))
    )
    return sky.select(
        "grp", "l_orderkey", "l_linenumber", "cost_cents", "qty"
    ).orderBy(
        "grp", "cost_cents", F.col("qty").desc(), "l_orderkey",
        "l_linenumber",
    )


@register(
    "q_global_skyline",
    oracle="""
WITH offers AS (
  SELECT l_orderkey, l_linenumber,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS cost_cents,
         CAST(l_quantity AS BIGINT) AS qty
  FROM lineitem
), ranked AS (
  SELECT *,
         MAX(qty) OVER (ORDER BY cost_cents, qty DESC,
                        l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_qty_cheaper
  FROM offers
)
SELECT l_orderkey, l_linenumber, cost_cents, qty
FROM ranked
WHERE best_qty_cheaper IS NULL OR qty > best_qty_cheaper
ORDER BY cost_cents, qty DESC, l_orderkey, l_linenumber
""",
    doc="GLOBAL skyline via the two-phase shape q_pareto_skyline's doc "
    "promises: phase 1 computes partition-local frontiers (salted "
    "16-way — each partition's frontier is frontier-sized, and a "
    "globally undominated point is undominated in its partition, so "
    "no survivor is lost); phase 2 re-runs the same sort-filter pass "
    "over the UNION of local frontiers — a frontier-bounded input, so "
    "its single-partition window is benign, never the full data.  The "
    "oracle is the direct single-window global skyline; hash equality "
    "proves the two-phase decomposition exact.  This is how "
    "preference queries scale: the only full-data pass is the "
    "embarrassingly parallel local-frontier filter.",
)
def q_global_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    offers = li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias(
            "cost_cents"
        ),
        F.col("l_quantity").cast("bigint").alias("qty"),
        (F.col("l_orderkey") % 16).alias("salt"),
    )

    def frontier(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w = (
            (Window.partitionBy(*part_cols) if part_cols else Window)
            .orderBy(
                "cost_cents",
                F.col("qty").desc(),
                "l_orderkey",
                "l_linenumber",
            )
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        return df.withColumn(
            "best_qty_cheaper", F.max("qty").over(w)
        ).filter(
            F.col("best_qty_cheaper").isNull()
            | (F.col("qty") > F.col("best_qty_cheaper"))
        ).drop("best_qty_cheaper")

    local = frontier(offers, ["salt"])  # phase 1: parallel local frontiers
    out = frontier(local.drop("salt"), [])  # phase 2: frontier-bounded
    return out.select(
        "l_orderkey", "l_linenumber", "cost_cents", "qty"
    ).orderBy(
        "cost_cents", F.col("qty").desc(), "l_orderkey", "l_linenumber"
    )


@register(
    "q_cms_incremental",
    oracle=_cms_oracle(),  # the FULL-corpus sketch: cell-wise additivity
    # makes the per-shard-merged sketch identical, so estimates match
    doc="Incremental count-min maintenance — the CMS member of the "
    "mergeable-sketch trio (HLL: q_hll_incremental; CMS here): each "
    "orderkey-parity shard builds its own d×w sketch, the shards "
    "merge by CELL-WISE ADDITION (the sketch's defining algebraic "
    "property), and probing the merged sketch hash-matches the "
    "full-corpus oracle estimate for estimate, exactness flags and "
    "bounds alike — the identity that lets daily partial sketches sum "
    "into a running corpus sketch with no rescan.  All integer, "
    "deterministic at any partitioning.",
)
def q_cms_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey"
    )
    hashes = spark.createDataFrame(
        [(i, _CMS_A[i], _CMS_B[i]) for i in range(_CMS_D)],
        "d int, a bigint, b bigint",
    )
    col_of = F.expr(f"((l_partkey * a + b) % {_CMS_P}) % {_CMS_W}")
    # per-shard partial sketches (the day's/shard's independent build)
    partials = (
        li.withColumn("shard", F.col("l_orderkey") % 4)
        .crossJoin(F.broadcast(hashes))
        .select("shard", "d", col_of.alias("col"))
        .groupBy("shard", "d", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # algebraic merge: cell-wise addition across shards
    cms = partials.groupBy("d", "col").agg(F.sum("cnt").alias("cnt"))
    n = li.agg(F.count(F.lit(1)).alias("n_total"))
    probes = spark.createDataFrame(
        [(int(k),) for k in _CMS_PROBES], "key bigint"
    )
    cells = probes.crossJoin(F.broadcast(hashes)).select(
        "key",
        "d",
        F.expr(f"((key * a + b) % {_CMS_P}) % {_CMS_W}").alias("col"),
    )
    est = (
        cells.join(cms, ["d", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("estimate"))
    )
    exact = (
        li.filter(F.col("l_partkey").isin(*_CMS_PROBES))
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("exact"))
    )
    bound = F.expr(f"(2 * n_total) DIV {_CMS_W}")
    return (
        est.join(F.broadcast(exact), "key", "left")
        .crossJoin(F.broadcast(n))
        .select(
            "key",
            "estimate",
            F.coalesce(F.col("exact"), F.lit(0)).alias("exact"),
            (
                F.col("estimate") >= F.coalesce(F.col("exact"), F.lit(0))
            ).alias("overestimates"),
            (
                F.col("estimate") - F.coalesce(F.col("exact"), F.lit(0))
                <= bound
            ).alias("within_bound"),
        )
        .orderBy("key")
    )


# ---------------------------------------------------------------------------
# Mergeable rank-coreset quantile sketch — the fourth classic sketch
# beside CMS (counts), HLL (distincts), and Bloom (membership): bounded
# quantile summaries with algebraic merge.  Deterministic by
# construction (keep every K-th value of each source's sorted order),
# so unlike randomized KLL/GK the oracle replays the sketch EXACTLY.
# ---------------------------------------------------------------------------

_QSK_K = 32  # keep stride: per-source rank error < K
_QSK_QUANTILES = [
    ("p10", 1, 10),
    ("p25", 1, 4),
    ("p50", 1, 2),
    ("p75", 3, 4),
    ("p90", 9, 10),
    ("p99", 99, 100),
]


@register(
    "q_quantile_sketch",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, CAST(length(text) AS BIGINT) AS v FROM documents
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
  FROM t
), pts AS (
  SELECT source, v,
         CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY v, doc_id)
              AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n_s
  FROM t
), kept AS (
  SELECT source, v, rn,
         CASE WHEN rn % {_QSK_K} = 0 THEN {_QSK_K}
              ELSE rn % {_QSK_K} END AS w
  FROM pts WHERE rn % {_QSK_K} = 0 OR rn = n_s
), cum AS (
  SELECT source, v, rn, w,
         CAST(SUM(w) OVER (ORDER BY v, source, rn
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_w
  FROM kept
), qs(q, num, den) AS (
  VALUES {", ".join(f"('{q}', {n}, {d})" for q, n, d in _QSK_QUANTILES)}
), est AS (
  SELECT qs.q, qs.num, qs.den,
         MIN(CASE WHEN cum.cum_w * qs.den >= qs.num * tot.n
                  THEN cum.v END) AS est_v
  FROM cum CROSS JOIN tot CROSS JOIN qs
  GROUP BY 1, 2, 3
), vc AS (
  SELECT v, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY v
), roll AS (
  SELECT v, cnt,
         CAST(SUM(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_cnt
  FROM vc
), exact AS (
  SELECT qs.q,
         MIN(CASE WHEN roll.cum_cnt * qs.den >= qs.num * tot.n
                  THEN roll.v END) AS exact_v
  FROM roll CROSS JOIN tot CROSS JOIN qs
  GROUP BY 1
)
SELECT est.q AS quantile, tot.n,
       CAST((est.num * tot.n + est.den - 1) // est.den AS BIGINT)
         AS target_rank,
       est.est_v, exact.exact_v,
       roll.cum_cnt - roll.cnt AS r_lo,
       roll.cum_cnt AS r_hi,
       CAST(tot.n_sources * {_QSK_K} AS BIGINT) AS slack,
       roll.cum_cnt >= (est.num * tot.n + est.den - 1) // est.den
         AND roll.cum_cnt - roll.cnt
             < (est.num * tot.n + est.den - 1) // est.den
               + tot.n_sources * {_QSK_K}
         AS within_bound
FROM est
JOIN exact ON exact.q = est.q
JOIN roll ON roll.v = est.est_v
CROSS JOIN tot
ORDER BY quantile
""",
    doc="Mergeable rank-coreset QUANTILE sketch — completing the "
    "sketch family (CMS counts, HLL distincts, Bloom membership) with "
    "the classic fourth member: per source, sort-rank the values and "
    "keep every K-th (weight K, remainder-weighted tail), giving a "
    "coreset of n/K weighted points whose per-source rank error is "
    "< K; MERGING sources is structural (union the point sets, one "
    "cumulative pass over the sketch), so per-shard sketches combine "
    "into corpus quantiles without rescanning — the same "
    "incremental-ingest algebra as q_hll_incremental/q_cms_"
    "incremental.  Deterministic keep rule (no KLL coin flips) means "
    "the DuckDB oracle replays the sketch bit-for-bit rather than "
    "checking a tolerance; in-query verdicts still pin every estimate "
    "inside the provable rank window [target, target + S*K) against "
    "the EXACT inverted-CDF quantiles (computed the q_exact_quantiles "
    "way: distinct-value rollup, no raw-row sort).  Plan: one "
    "data-sized shuffle to rank per source (group-bounded windows), "
    "then every later pass runs over the K-compressed sketch or the "
    "value-domain rollup — at 100 TB the sketch is the only thing "
    "that moves.",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    K = _QSK_K
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", "source", F.length("text").cast("bigint").alias("v")
    )
    tot = t.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
    )
    w_rn = Window.partitionBy("source").orderBy("v", "doc_id")
    w_ns = Window.partitionBy("source")
    pts = t.select(
        "source",
        "v",
        F.row_number().over(w_rn).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w_ns).cast("bigint").alias("n_s"),
    )
    kept = pts.filter(
        (F.col("rn") % K == 0) | (F.col("rn") == F.col("n_s"))
    ).select(
        "source",
        "v",
        "rn",
        F.when(F.col("rn") % K == 0, F.lit(K))
        .otherwise(F.col("rn") % K)
        .alias("w"),
    )
    # the cumulative pass runs over the SKETCH (n/K points) — the
    # 1-partition window is coreset-bounded by construction
    w_cum = Window.orderBy("v", "source", "rn").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = kept.withColumn("cum_w", F.sum("w").over(w_cum).cast("bigint"))
    qs = spark.createDataFrame(
        _QSK_QUANTILES, "q string, num bigint, den bigint"
    )
    est = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qs))
        .groupBy("q", "num", "den")
        .agg(
            F.min(
                F.when(
                    F.col("cum_w") * F.col("den")
                    >= F.col("num") * F.col("n"),
                    F.col("v"),
                )
            ).alias("est_v")
        )
    )
    vc = t.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_roll = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    roll = vc.withColumn(
        "cum_cnt", F.sum("cnt").over(w_roll).cast("bigint")
    )
    exact = (
        roll.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(
            F.min(
                F.when(
                    F.col("cum_cnt") * F.col("den")
                    >= F.col("num") * F.col("n"),
                    F.col("v"),
                )
            ).alias("exact_v")
        )
    )
    # exact integer ceil-division (float-free: n·num can exceed 2^53)
    target = F.expr("(num * n + den - 1) div den").cast("bigint")
    return (
        est.join(exact, "q")
        .join(roll.select(F.col("v").alias("est_v"), "cnt", "cum_cnt"), "est_v")
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("q").alias("quantile"),
            "n",
            target.alias("target_rank"),
            "est_v",
            "exact_v",
            (F.col("cum_cnt") - F.col("cnt")).alias("r_lo"),
            F.col("cum_cnt").alias("r_hi"),
            (F.col("n_sources") * K).cast("bigint").alias("slack"),
            (
                (F.col("cum_cnt") >= target)
                & (
                    F.col("cum_cnt") - F.col("cnt")
                    < target + F.col("n_sources") * K
                )
            ).alias("within_bound"),
        )
        .orderBy("quantile")
    )
