"""Event-time queries: date functions, JSON extraction, analytic windows,
and batch-mode streaming-window equivalents (SURVEY.md §2.6 GAP date/json
fns, §2.7 W2, §2.10).

Streaming note: the tumbling/sliding/session window queries here are the
*batch* renderings (groupBy over F.window / F.session_window) that the
DuckDB oracle can check; `artis_data_ingest_spark.streaming` wires the
identical aggregations into Structured Streaming with watermarks.

All window-start/end columns are emitted as formatted strings so the
cross-engine comparison is timezone-representation-proof (session tz is
pinned UTC; the fixtures' naive nanosecond timestamps floor-convert to
identical microsecond instants in both engines).

Scale notes: every query here shuffles once on its grouping key
(user_id or time bucket). At 100 TB the events table would be
date-partitioned at rest, so bucket aggregations prune to the scanned
partitions; per-user windows shuffle by user_id — a salted variant is
only needed if single users dominate (AQE skew-join handles the join
case; skewed *aggregation* keys would need explicit two-level agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..sources.tables import load_table
from .registry import register

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_SQL = "%Y-%m-%d %H:%M:%S"


def _fmt(col) -> F.Column:
    return F.date_format(col, _TS_FMT)


# ---------------------------------------------------------------------------
# Daily rollup — date_trunc + grouped agg (GAP date fns).
# ---------------------------------------------------------------------------


@register(
    "q_daily_rollup",
    oracle=f"""
SELECT strftime(date_trunc('day', CAST(ts AS TIMESTAMP)), '{_TS_FMT_SQL}') AS day,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
""",
    doc="Daily per-type rollup: date_trunc + count/count-distinct/sum. "
    "At rest this keys the recommended date-partitioning layout.",
    bench=True,
)
def q_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            _fmt(F.date_trunc("day", F.col("ts"))).alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


# ---------------------------------------------------------------------------
# JSON extraction (GAP json fns over events.props).
# ---------------------------------------------------------------------------


@register(
    "q_json_extract",
    oracle="""
SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_mod,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT))
            AS BIGINT) AS sum_k
FROM events
GROUP BY 1
ORDER BY k_mod
""",
    doc="JSON field extraction from the props string column "
    "(get_json_object ≡ json_extract_string), grouped integer agg. "
    "Integer sums are exact — no decimal dance needed.",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select((k % 10).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("k").alias("sum_k"))
        .orderBy("k_mod")
    )


# ---------------------------------------------------------------------------
# Tumbling window (batch equivalent of streaming groupBy(window(...))).
# ---------------------------------------------------------------------------


@register(
    "q_tumbling_window",
    oracle=f"""
SELECT strftime(to_timestamp(floor(epoch(CAST(ts AS TIMESTAMP)) / 600) * 600),
                '{_TS_FMT_SQL}') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY window_start
""",
    doc="10-minute tumbling window aggregation via F.window (SURVEY.md "
    "§2.10). Spark window starts align to epoch multiples of the width, "
    "matching the oracle's floor(epoch/600)*600 bucketing.",
)
def q_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            _fmt(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Sliding window — each event lands in size/slide windows.
# ---------------------------------------------------------------------------


@register(
    "q_sliding_window",
    oracle=f"""
WITH e AS (SELECT epoch(CAST(ts AS TIMESTAMP)) AS ep, value FROM events),
cand AS (
  SELECT to_timestamp(floor(ep / 300) * 300 - k * 300) AS ws, ep, value
  FROM e, (SELECT UNNEST([0, 1]) AS k)
)
SELECT strftime(ws, '{_TS_FMT_SQL}') AS window_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS sum_value
FROM cand
WHERE ep >= epoch(ws) AND ep < epoch(ws) + 600
GROUP BY 1
ORDER BY window_start
""",
    doc="10-minute window sliding every 5 minutes (F.window with slide). "
    "Oracle enumerates the two candidate window starts per event.",
)
def q_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            _fmt(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
        .orderBy("window_start")
    )


# ---------------------------------------------------------------------------
# Session window — 30-minute-gap sessionization per user.
# ---------------------------------------------------------------------------


@register(
    "q_session_window",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts,
         LAG(CAST(ts AS TIMESTAMP)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS prev_ts
  FROM events
), flagged AS (
  SELECT user_id, ts,
         CASE WHEN prev_ts IS NULL
                   OR epoch(ts) - epoch(prev_ts) >= 1800
              THEN 1 ELSE 0 END AS new_session
  FROM ordered
), sessions AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS UNBOUNDED PRECEDING
         ) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(MIN(ts), '{_TS_FMT_SQL}') AS session_start,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
    doc="F.session_window(ts, '30 minutes') per user (SURVEY.md §2.10). "
    "The oracle reproduces it with the gaps-and-islands idiom: a new "
    "session begins when the gap from the previous event is >= the gap "
    "duration (Spark session windows are [start, last+gap) half-open, "
    "so a gap exactly equal to 30min starts a new session).",
)
def q_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            _fmt(F.col("w.start")).alias("session_start"),
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


# ---------------------------------------------------------------------------
# Analytic windows: running sum, lag deltas (W2 frames).
# ---------------------------------------------------------------------------


@register(
    "q_running_sum",
    oracle=f"""
SELECT user_id,
       event_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS UNBOUNDED PRECEDING
       ) AS DOUBLE) AS running_value,
       ROW_NUMBER() OVER (
         PARTITION BY user_id ORDER BY ts, event_id
       ) AS seq
FROM events
ORDER BY user_id, seq
""",
    doc="Per-user running sum with an explicit rows frame (W2). Decimal "
    "accumulation keeps the running values exact under any evaluation "
    "order (DuckDB's segment-tree window agg vs Spark's running agg).",
)
def q_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(12,2)"))
            .over(w)
            .cast("double")
            .alias("running_value"),
            F.row_number().over(seq_w).alias("seq"),
        )
        .orderBy("user_id", "seq")
    )


@register(
    "q_lag_gap",
    oracle="""
SELECT user_id, event_id,
       epoch_us(CAST(ts AS TIMESTAMP))
         - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
           )) AS gap_micros
FROM events
ORDER BY user_id, event_id
""",
    doc="Inter-event gap per user via LAG (W2), microsecond-exact. First "
    "event per user → NULL (three-valued logic preserved).",
)
def q_lag_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            (
                F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
            ).alias("gap_micros"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "q_date_spine",
    oracle=f"""
WITH spine AS (
  SELECT CAST(d AS TIMESTAMP) AS day
  FROM generate_series(TIMESTAMP '2024-01-01', TIMESTAMP '2024-02-01',
                       INTERVAL 1 DAY) AS t(d)
), daily AS (
  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
)
SELECT strftime(s.day, '{_TS_FMT_SQL}') AS day,
       COALESCE(d.n, 0) AS n_events
FROM spine s LEFT JOIN daily d USING (day)
ORDER BY day
""",
    doc="Time-series gap filling via a generated date spine "
    "(F.sequence + explode): a complete calendar joined to daily "
    "counts, absent days coalesced to zero — reporting over sparse "
    "event data must not silently skip empty days. The spine is tiny "
    "and broadcast; the aggregation is the only fact-side shuffle.",
)
def q_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    spine = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit("2024-01-01").cast("timestamp"),
                F.lit("2024-02-01").cast("timestamp"),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("day")
    )
    daily = ev.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        F.broadcast(spine)
        .join(daily, on="day", how="left")
        .select(
            F.date_format("day", _TS_FMT).alias("day"),
            F.coalesce("n", F.lit(0)).alias("n_events"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# SCD-2 history — event log → full version history with validity ranges.
# ---------------------------------------------------------------------------


@register(
    "q_scd2_history",
    oracle="""
SELECT user_id, event_id,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
       event_type, value,
       epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
       epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w) AS valid_to_us,
       LEAD(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
""",
    doc="Type-2 slowly-changing-dimension history from an event log "
    "(the companion to q_latest_per_key's SCD-1 compaction, and the "
    "shape the reference's version-over-version snapshot diffing "
    "extends to over time): every event becomes a version row with "
    "[valid_from, valid_to) validity — valid_to is the NEXT event's "
    "timestamp via LEAD over (key, time, unique-id) order, NULL (open-"
    "ended) for the current version, with is_current derived from it. "
    "Validity bounds are emitted as epoch microseconds, keeping the "
    "cross-engine comparison representation-proof. One window shuffle "
    "on the key — identical cost to the SCD-1 form; at 100 TB this is "
    "the standard as-of-queryable dimension build after every CDC "
    "load (point-in-time lookups become ts >= valid_from AND ts < "
    "coalesce(valid_to, infinity) range joins).",
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lead_ts = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).cast("bigint").alias("version"),
            "event_type",
            "value",
            F.unix_micros("ts").alias("valid_from_us"),
            F.unix_micros(lead_ts).alias("valid_to_us"),
            lead_ts.isNull().alias("is_current"),
        )
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# Event-sequence analytics: ordered funnel + cohort retention.
# ---------------------------------------------------------------------------


@register(
    "q_funnel",
    oracle="""
WITH g AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1
  FROM events GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN g USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > g.t1
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2
  GROUP BY e.user_id
)
SELECT COUNT(*) AS n_users,
       COUNT(t1) AS n_viewed,
       COUNT(t2) AS n_clicked,
       COUNT(t3) AS n_purchased,
       round(COUNT(t2) * 1.0 / COUNT(t1), 6) AS view_to_click,
       round(COUNT(t3) * 1.0 / COUNT(t2), 6) AS click_to_purchase
FROM g LEFT JOIN c USING (user_id) LEFT JOIN p USING (user_id)
""",
    doc="Ordered conversion funnel (view -> click -> purchase, each "
    "stage strictly AFTER the previous stage's first occurrence — the "
    "event-sequence analysis a product pipeline runs on every event "
    "log): ONE shuffle total — per-user events collect into a sorted "
    "array and the stage timestamps fold out as higher-order array "
    "expressions (t2 = min click ts > t1, referencing the outer "
    "column inside the lambda), vs the oracle's 3-join formulation. "
    "Per-user state is bounded (a user's own events), so the "
    "collect_list is safe at 100 TB where the 3-pass join chain "
    "would rescan the log per stage; the final single-row summary "
    "is a scalar merge.",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_type"))
        ).alias("evs")
    )
    staged = (
        per_user.withColumn(
            "t1",
            F.expr(
                "array_min(transform(filter(evs,"
                " e -> e.event_type = 'view'), e -> e.ts))"
            ),
        )
        .withColumn(
            "t2",
            F.expr(
                "array_min(transform(filter(evs,"
                " e -> e.event_type = 'click' AND e.ts > t1),"
                " e -> e.ts))"
            ),
        )
        .withColumn(
            "t3",
            F.expr(
                "array_min(transform(filter(evs,"
                " e -> e.event_type = 'purchase' AND e.ts > t2),"
                " e -> e.ts))"
            ),
        )
    )
    return staged.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("t1").alias("n_viewed"),
        F.count("t2").alias("n_clicked"),
        F.count("t3").alias("n_purchased"),
        F.round(
            F.count("t2").cast("double") / F.count("t1"), 6
        ).alias("view_to_click"),
        F.round(
            F.count("t3").cast("double") / F.count("t2"), 6
        ).alias("click_to_purchase"),
    )


@register(
    "q_cohort_retention",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
  FROM events GROUP BY user_id
), activity AS (
  SELECT DISTINCT e.user_id, f.cohort,
         date_diff('week', f.cohort, date_trunc('week', e.ts))
           AS week_offset
  FROM events e JOIN first_seen f USING (user_id)
)
SELECT strftime(cohort, '{_TS_FMT_SQL}') AS cohort_week,
       CAST(week_offset AS BIGINT) AS week_offset,
       COUNT(*) AS n_active
FROM activity
GROUP BY cohort, week_offset
ORDER BY cohort_week, week_offset
""",
    doc="Cohort retention (the standard growth-analytics matrix: users "
    "bucketed by first-seen week, counted distinct in each subsequent "
    "week of activity): first-seen is one per-user aggregation, the "
    "activity matrix one join back on user_id plus a distinct over "
    "(user, cohort, offset) — both shuffles hash on user_id, so at "
    "100 TB the exchange is reused across the two stages. Week "
    "truncation is Monday-based in BOTH engines (date_trunc 'week'), "
    "and the cohort key is emitted as a formatted string so the "
    "comparison is timezone-representation-proof.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    activity = (
        ev.join(first_seen, on="user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.date_trunc("week", "ts"), F.col("cohort"))
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            F.date_format("cohort", _TS_FMT).alias("cohort_week"),
            "week_offset",
            "n_active",
        )
        .orderBy("cohort_week", "week_offset")
    )


# ---------------------------------------------------------------------------
# MERGE / upsert — partition-reprocessing shape over the event log.
# ---------------------------------------------------------------------------

_MERGE_TGT_HI = "2024-01-25"
_MERGE_SRC_LO = "2024-01-18"

_MERGE_ORACLE = f"""
WITH ev AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         event_type, value
  FROM events
),
tgt AS (
  SELECT user_id, day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_value
  FROM ev WHERE day < DATE '{_MERGE_TGT_HI}'
  GROUP BY user_id, day
),
src AS (
  SELECT user_id, day,
         CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_value,
         (COUNT(*) = SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END))
           AS is_delete
  FROM ev WHERE day >= DATE '{_MERGE_SRC_LO}'
  GROUP BY user_id, day
)
SELECT COALESCE(s.user_id, t.user_id) AS user_id,
       COALESCE(s.day, t.day) AS day,
       CASE WHEN s.user_id IS NOT NULL THEN s.n_events
            ELSE t.n_events END AS n_events,
       CASE WHEN s.user_id IS NOT NULL THEN s.day_value
            ELSE t.day_value END AS day_value
FROM tgt t FULL OUTER JOIN src s
  ON t.user_id = s.user_id AND t.day = s.day
WHERE NOT COALESCE(s.is_delete, FALSE)
ORDER BY user_id, day
"""


@register(
    "q_merge_upsert",
    oracle=_MERGE_ORACLE,
    doc="MERGE INTO semantics (operators/merge.py) in the standard "
    "partition-reprocessing scenario: per-user-day state is rebuilt for "
    "a late-arriving window and upserted over the stored snapshot — "
    "matched days update, new days insert, all-error days delete. "
    "One full-outer shuffle on the merge key, same as any MERGE.",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import dsum
    from ..operators.merge import merge_upsert

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "event_type", "value"
    )
    tgt = (
        ev.filter(F.col("day") < F.lit(_MERGE_TGT_HI).cast("date"))
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value", "day_value"))
    )
    src = (
        ev.filter(F.col("day") >= F.lit(_MERGE_SRC_LO).cast("date"))
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", "day_value"),
            (
                F.count(F.lit(1))
                == F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            ).alias("is_delete"),
        )
    )
    merged = merge_upsert(tgt, src, ["user_id", "day"], delete_col="is_delete")
    return merged.orderBy("user_id", "day")


# ---------------------------------------------------------------------------
# Threshold anomaly detection — exact per-group p99 via broadcast join.
# ---------------------------------------------------------------------------

_ANOM_ORACLE = """
WITH thr AS (
  SELECT event_type, round(quantile_cont(value, 0.99), 6) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value, thr.p99
FROM events e JOIN thr ON e.event_type = thr.event_type
WHERE e.value > thr.p99
ORDER BY e.event_id
"""


@register(
    "q_anomaly_p99",
    oracle=_ANOM_ORACLE,
    doc="Outlier detection: flag events above their type's exact p99. "
    "Thresholds are a per-type aggregate (5 rows) broadcast back onto "
    "the fact scan — no window sort over the full log. At 100 TB the "
    "threshold agg swaps to percentile_approx (mergeable t-digest); "
    "the broadcast-compare stage is unchanged. Rounded to 6dp in both "
    "engines so the interpolated threshold compares identically.",
)
def q_anomaly_p99(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    thr = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.99D)"), 6).alias("p99")
    )
    return (
        ev.join(F.broadcast(thr), on="event_type")
        .filter(F.col("value") > F.col("p99"))
        .select("event_id", "event_type", "value", "p99")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Batch sessionization — gap-rule session IDs assigned to raw events.
# ---------------------------------------------------------------------------

_SESSIONIZE_GAP_US = 30 * 60 * 1_000_000  # 30 min, microseconds

_SESSIONIZE_ORACLE = f"""
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(CAST(ts AS TIMESTAMP))
                   - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w)
                   > {_SESSIONIZE_GAP_US}
              OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         CAST(SUM(is_start) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS BIGINT) AS session_id
  FROM gaps
)
SELECT user_id, session_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       strftime(MAX(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


@register(
    "q_sessionize",
    oracle=_SESSIONIZE_ORACLE,
    doc="Batch sessionization: gap-rule (30 min) session IDs assigned "
    "to raw events via LAG + running SUM over the per-user timeline, "
    "then per-session rollup — the classic two-window identity that "
    "q_session_window's session_window aggregate can't give you when "
    "downstream needs the session id ON each event. Both windows and "
    "the final agg share one hash partitioning on user_id, so the "
    "whole query is a single shuffle.",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    is_start = F.when(
        gap.isNull() | (gap > _SESSIONIZE_GAP_US), 1
    ).otherwise(0)
    sess = ev.withColumn(
        "session_id",
        F.sum(is_start).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        sess.groupBy("user_id", "session_id")
        .agg(
            _fmt(F.min("ts")).alias("session_start"),
            _fmt(F.max("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# Incremental aggregate maintenance — merge partial agg states.
# ---------------------------------------------------------------------------

_DELTA_CUTOFF = "2024-01-25"

# The oracle recomputes the daily rollup from the FULL log in one pass;
# the Spark side builds it incrementally (yesterday's materialized agg +
# today's delta, merged by summing partial states). Hash-equality of the
# two is exactly the algebraic-aggregate identity every incremental
# pipeline relies on.
_DELTA_ORACLE = """
SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS day_value
FROM events
GROUP BY user_id, day
ORDER BY user_id, day
"""


@register(
    "q_agg_delta_update",
    oracle=_DELTA_ORACLE,
    doc="Incremental aggregate maintenance: the per-user-day rollup is "
    "built as old-partials ∪ delta-partials → re-aggregate, and the "
    "oracle recomputes from the full log — hash equality proves the "
    "algebraic merge identity (count and decimal-sum are mergeable "
    "states). At 100 TB this is the difference between scanning one "
    "day and rescanning the archive; AVG/percentiles ride along as "
    "(sum,count) / sketch states the same way.",
)
def q_agg_delta_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import MONEY, dec

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"), "value"
    )
    cutoff = F.lit(_DELTA_CUTOFF).cast("date")

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy("user_id", "day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value")).alias("_sum_dec"),
        )

    old = partials(ev.filter(F.col("day") < cutoff))
    delta = partials(ev.filter(F.col("day") >= cutoff))
    return (
        old.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(
            F.sum("n_events").alias("n_events"),
            F.sum("_sum_dec").cast(MONEY).cast("double").alias("day_value"),
        )
        .orderBy("user_id", "day")
    )


# ---------------------------------------------------------------------------
# Sample-based approximate aggregation (AQP) with in-query error verdict.
# ---------------------------------------------------------------------------

_AQP_ORACLE = """
WITH s AS (
  SELECT value,
         substring(md5('aqp:' || CAST(event_id AS VARCHAR)), 1, 1) = '0'
           AS in_sample
  FROM events
),
est AS (
  SELECT CAST(SUM(CASE WHEN in_sample
                       THEN CAST(value AS DECIMAL(12,2))
                       ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 16.0
           AS est_total,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS exact_total,
         CAST(SUM(CASE WHEN in_sample THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sampled
  FROM s
)
SELECT round(est_total, 2) AS est_total,
       round(exact_total, 2) AS exact_total,
       n_sampled,
       abs(est_total - exact_total) / exact_total < 0.10 AS within_10pct
FROM est
"""


@register(
    "q_sample_estimate",
    oracle=_AQP_ORACLE,
    doc="Approximate query processing: estimate the global value total "
    "from a deterministic 1/16 hash sample (salted md5 on the stable "
    "id — no RNG, membership reproducible across engines), scale by "
    "16, and emit the exact total + a <10% relative-error verdict in "
    "the same query. At 100 TB the sample predicate pushes into the "
    "scan and the estimate costs 1/16th the read; the exact side here "
    "exists only to score the estimator.",
)
def q_sample_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.numeric import MONEY, dec

    ev = load_table(spark, sf_dir, "events")
    in_sample = (
        F.substring(
            F.md5(F.concat(F.lit("aqp:"), F.col("event_id").cast("string"))),
            1,
            1,
        )
        == "0"
    )
    zero = F.lit(0).cast(MONEY)
    agg = ev.agg(
        (
            F.sum(F.when(in_sample, dec("value")).otherwise(zero)).cast("double")
            * F.lit(16.0)
        ).alias("est_total"),
        F.sum(dec("value")).cast("double").alias("exact_total"),
        F.sum(F.when(in_sample, 1).otherwise(0)).alias("n_sampled"),
    )
    return agg.select(
        F.round("est_total", 2).alias("est_total"),
        F.round("exact_total", 2).alias("exact_total"),
        "n_sampled",
        (
            F.abs(F.col("est_total") - F.col("exact_total"))
            / F.col("exact_total")
            < 0.10
        ).alias("within_10pct"),
    )


# ---------------------------------------------------------------------------
# Time-series gap fill with linear interpolation.
# ---------------------------------------------------------------------------

_GI_USER_MOD = 7  # bound the output: every 7th user's series


@register(
    "q_gap_interp",
    oracle=f"""
WITH hourly AS (
  SELECT user_id,
         CAST(date_diff('hour', TIMESTAMP '1970-01-01',
                        date_trunc('hour', ts)) AS BIGINT) AS h,
         CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS v
  FROM events
  WHERE user_id % {_GI_USER_MOD} = 0
  GROUP BY user_id, h
),
bounds AS (
  SELECT user_id, MIN(h) AS h_lo, MAX(h) AS h_hi FROM hourly GROUP BY user_id
),
spine AS (
  SELECT b.user_id, b.h_lo + u.i AS h
  FROM bounds b, UNNEST(range(b.h_hi - b.h_lo + 1)) u(i)
),
joined AS (
  SELECT s.user_id, s.h, hv.v,
    LAST_VALUE(hv.v IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
    LAST_VALUE(CASE WHEN hv.v IS NOT NULL THEN s.h END IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.h
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
    FIRST_VALUE(hv.v IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v,
    FIRST_VALUE(CASE WHEN hv.v IS NOT NULL THEN s.h END IGNORE NULLS) OVER (
      PARTITION BY s.user_id ORDER BY s.h
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
  FROM spine s
  LEFT JOIN hourly hv ON hv.user_id = s.user_id AND hv.h = s.h
)
SELECT user_id, h,
  CASE WHEN v IS NOT NULL THEN v
       WHEN next_h = prev_h THEN prev_v
       ELSE prev_v + (next_v - prev_v)
            * CAST(h - prev_h AS DOUBLE) / CAST(next_h - prev_h AS DOUBLE)
  END AS v_filled,
  (v IS NULL) AS interpolated
FROM joined
ORDER BY user_id, h
""",
    doc="Time-series gap fill with linear interpolation: per-user "
    "hourly buckets (exact-decimal averages), a sequence-exploded "
    "spine between each user's first and last hour, then "
    "last/first-IGNORE-NULLS windows carry the bracketing samples and "
    "the gap fills as prev + (next-prev)*(h-prev_h)/(next_h-prev_h) — "
    "one rational expression over identical exact inputs, so the "
    "interpolated doubles hash bit-for-bit. Two window passes over "
    "one user-partitioned shuffle; spine length is bounded per user, "
    "never global. The pre-featurization densify step every "
    "time-series pipeline runs.",
)
def q_gap_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id") % _GI_USER_MOD == 0
    )
    hourly = ev.groupBy(
        "user_id",
        F.expr("unix_timestamp(date_trunc('hour', ts)) DIV 3600").alias("h"),
    ).agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("v")
    )
    bounds = hourly.groupBy("user_id").agg(
        F.min("h").alias("h_lo"), F.max("h").alias("h_hi")
    )
    spine = bounds.select(
        "user_id",
        F.explode(F.sequence(F.col("h_lo"), F.col("h_hi"))).alias("h"),
    )
    j = spine.join(hourly, ["user_id", "h"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    h_if_v = F.when(F.col("v").isNotNull(), F.col("h"))
    j = (
        j.withColumn("prev_v", F.last("v", ignorenulls=True).over(back))
        .withColumn("prev_h", F.last(h_if_v, ignorenulls=True).over(back))
        .withColumn("next_v", F.first("v", ignorenulls=True).over(fwd))
        .withColumn("next_h", F.first(h_if_v, ignorenulls=True).over(fwd))
    )
    # associativity must match the oracle's `a + b*c/d` = a + ((b*c)/d):
    # multiplying by a pre-computed c/d ratio rounds differently in IEEE
    interp = F.col("prev_v") + (
        (F.col("next_v") - F.col("prev_v"))
        * (F.col("h") - F.col("prev_h")).cast("double")
    ) / (F.col("next_h") - F.col("prev_h")).cast("double")
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("next_h") == F.col("prev_h"), F.col("prev_v"))
        .otherwise(interp)
    )
    return j.select(
        "user_id",
        "h",
        filled.alias("v_filled"),
        F.col("v").isNull().alias("interpolated"),
    ).orderBy("user_id", "h")


# ---------------------------------------------------------------------------
# Point-in-time (temporal) join against SCD-2 validity ranges.
# ---------------------------------------------------------------------------

_PIT_INF_US = 2**62


@register(
    "q_pit_join",
    oracle=f"""
WITH versions AS (
  SELECT user_id, value AS profile_value,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
         epoch_us(CAST(ts AS TIMESTAMP)) AS valid_from_us,
         COALESCE(epoch_us(LEAD(CAST(ts AS TIMESTAMP)) OVER w),
                  {_PIT_INF_US}) AS valid_to_us
  FROM events WHERE event_type = 'view'
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
purchases AS (
  SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us, value
  FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts_us, p.value AS purchase_value,
       v.profile_value, v.version
FROM purchases p
LEFT JOIN versions v
  ON p.user_id = v.user_id
  AND p.ts_us >= v.valid_from_us AND p.ts_us < v.valid_to_us
ORDER BY p.event_id
""",
    doc="Point-in-time (temporal) join — the warehouse form of as-of "
    "semantics: 'view' events build SCD-2 validity ranges per user "
    "(the q_scd2_history shape), and each purchase joins the ONE "
    "version valid at its timestamp via an equi-join on the key with "
    "the range predicate riding the hash probe as a residual — no "
    "inequality explosion, facts preserved by LEFT join when no "
    "version existed yet. Equivalent semantics to q_asof_join's "
    "window carry-forward, expressed the way a fact↔dim_version "
    "lookup is written at 100 TB (versions are key×version bounded; "
    "empty [from, from) intervals from same-timestamp ties exclude "
    "themselves).",
)
def q_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    versions = (
        ev.filter(F.col("event_type") == "view")
        .select(
            "user_id",
            F.col("value").alias("profile_value"),
            F.row_number().over(w).cast("bigint").alias("version"),
            F.unix_micros("ts").alias("valid_from_us"),
            F.coalesce(
                F.unix_micros(F.lead("ts").over(w)), F.lit(_PIT_INF_US)
            ).alias("valid_to_us"),
        )
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.col("value").alias("purchase_value"),
    )
    from ..operators.scale import pit_join

    return (
        pit_join(purchases, versions)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "purchase_value",
            "profile_value",
            "version",
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Exponentially-decayed aggregate (EWMA) — the time-decay scoring every
# engagement/recency ranking pipeline runs; complements the
# equal-weight bounded frame of q_moving_avg.
# ---------------------------------------------------------------------------

_EWMA_TAPS = 8  # half-life window: weights 1, 1/2, ... 1/128


def _ewma_expr(engine: str) -> str:
    """The identical left-associative IEEE sum in both dialects:
    each tap is value * 2^-j — an exact exponent shift, so the only
    rounding is the 7 additions, performed in the same order by both
    engines (bit-identical results, no round() needed)."""
    if engine == "spark":
        taps = [
            f"coalesce(lag(value, {j}) over "
            f"(partition by user_id order by ts, event_id), 0.0D)"
            f" * {1.0 / (1 << j)!r}D"
            for j in range(_EWMA_TAPS)
        ]
    else:
        taps = [
            f"COALESCE(LAG(value, {j}) OVER "
            f"(PARTITION BY user_id ORDER BY ts, event_id), 0.0)"
            f" * {1.0 / (1 << j)!r}"
            for j in range(_EWMA_TAPS)
        ]
    return " + ".join(taps)


@register(
    "q_ewma_decay",
    oracle=f"""
SELECT event_id, user_id,
       {_ewma_expr('duck')} AS decayed_value
FROM events
ORDER BY event_id
""",
    doc="Exponentially-decayed per-user engagement score (EWMA with "
    f"decay 1/2 over the trailing {_EWMA_TAPS} events): the time-decay "
    "weighting recommendation/recency pipelines apply where "
    "q_moving_avg's equal-weight frame is too blunt.  Exact cross-"
    "engine floats without any decimal detour: each tap multiplies by "
    "2^-j (a pure exponent shift — no mantissa rounding), and the tap "
    "sum is the same left-associative IEEE addition chain in both "
    "engines, so results are bit-identical with zero rounding "
    "tolerance.  Plan: one hash shuffle on user_id; the lag frame is "
    "bounded (8 taps) so state per key is O(1) — at 100 TB this is "
    "the same shape as any per-user window, salting only if single "
    "users dominate.",
)
def q_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.expr(_ewma_expr("spark")).alias("decayed_value"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# Holt linear-trend forecast (double exponential smoothing), the trend-
# aware sibling of q_ewma_decay.  alpha = beta = 1/2 makes every
# impulse-response coefficient a DYADIC rational (exact as an IEEE
# double), so the truncated recursion becomes a fixed FIR over the
# trailing _HOLT_TAPS observations: the same left-associative lag-sum
# both engines evaluate identically — zero rounding tolerance, the
# EWMA playbook extended to a 2-state (level, trend) filter.
# ---------------------------------------------------------------------------

_HOLT_TAPS = 24
_HOLT_H = 7  # forecast horizon (days ahead)


def _holt_weights() -> list[float]:
    """Impulse response of the Holt recursion l_t = y/2 + (l+b)/2,
    b_t = (l_t - l_prev)/2 + b/2, truncated to _HOLT_TAPS; forecast
    weight j = l_j + H * b_j.  Computed exactly in Fractions and
    asserted dyadic-representable so the float literals ARE the
    rationals."""
    from fractions import Fraction as Fr

    half = Fr(1, 2)
    lj, bj = [], []
    l_prev, b_prev = Fr(0), Fr(0)
    for j in range(_HOLT_TAPS):
        y = Fr(1) if j == 0 else Fr(0)
        l_cur = half * y + half * (l_prev + b_prev)
        b_cur = half * (l_cur - l_prev) + half * b_prev
        lj.append(l_cur)
        bj.append(b_cur)
        l_prev, b_prev = l_cur, b_cur
    out = []
    for j in range(_HOLT_TAPS):
        w = lj[j] + _HOLT_H * bj[j]
        assert float(w) == w, w  # dyadic, exactly representable
        out.append(float(w))
    return out


def _holt_expr(engine: str) -> str:
    ws = _holt_weights()
    if engine == "spark":
        taps = [
            f"coalesce(lag(y, {j}) over "
            f"(partition by event_type order by day), 0.0D) * {w!r}D"
            for j, w in enumerate(ws)
        ]
    else:
        taps = [
            f"COALESCE(LAG(y, {j}) OVER "
            f"(PARTITION BY event_type ORDER BY day), 0.0) * {w!r}"
            for j, w in enumerate(ws)
        ]
    return " + ".join(taps)


@register(
    "q_holt_forecast",
    oracle=f"""
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), y AS (
  SELECT event_type, day, CAST(cents AS DOUBLE) / 100 AS y FROM d
)
SELECT event_type, day, y,
       {_holt_expr('duck')} AS forecast
FROM y
ORDER BY event_type, day
""",
    doc=f"Holt linear-trend forecast (double exponential smoothing, "
    f"alpha=beta=1/2, {_HOLT_H}-day horizon) over the per-event-type "
    "daily value series — the trend-aware step up from q_ewma_decay's "
    "level-only decay, the standard capacity-planning forecast.  The "
    f"2-state recursion is truncated to a {_HOLT_TAPS}-tap FIR (tap count sized so the complex-eigenvalue tail |lambda|=sqrt(1/2) decays below ~1e-3 of the signal) whose "
    "coefficients are exact dyadic rationals (computed in Fractions, "
    "asserted float-exact), so both engines evaluate the identical "
    "left-associative IEEE chain — bit-equal, no tolerance.  Daily "
    "totals aggregate in exact integer cents first.  Plan: one "
    "map-side-combined shuffle to (event_type, day), then a bounded-"
    "frame window on the same partitioning; the series table is "
    "day-granular (bounded), never the raw event stream.",
)
def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.to_date("ts").alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
        .select(
            "event_type",
            "day",
            (F.col("cents").cast("double") / 100).alias("y"),
        )
    )
    return daily.select(
        "event_type",
        "day",
        "y",
        F.expr(_holt_expr("spark")).alias("forecast"),
    ).orderBy("event_type", "day")


@register(
    "q_trimmed_mean",
    oracle="""
WITH c AS (
  SELECT event_type, event_id,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
), r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY cents, event_id) AS rnk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM c
)
SELECT event_type,
       CAST(MIN(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(cents) AS BIGINT) AS kept_cents,
       CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100 AS trimmed_mean
FROM r
WHERE rnk > n // 10 AND rnk <= n - n // 10
GROUP BY event_type
ORDER BY event_type
""",
    doc="10% two-sided trimmed mean per event type — the robust "
    "location estimate between the mean (outlier-fragile) and the "
    "median (throws away 98% of the data); the companion to "
    "q_outlier_mad's robust scale.  Exact by construction: values "
    "rank as integer cents with an event_id tie-break (total order, "
    "identical both engines), the trim keeps ranks (n/10, n - n/10] "
    "by integer division, and the kept sum is an exact bigint — the "
    "only float is one final division.  Plan: one event_type shuffle "
    "shared by both windows and the final aggregate; at 100 TB a "
    "skewed group salts the rank via the distributed-rank recipe "
    "(q_lm_perplexity_buckets) instead of one giant partition.",
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    wp = Window.partitionBy("event_type")
    r = c.select(
        "event_type",
        "cents",
        F.row_number().over(wp.orderBy("cents", "event_id")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    kept = r.filter(
        (F.col("rnk") > F.expr("n div 10"))
        & (F.col("rnk") <= F.col("n") - F.expr("n div 10"))
    )
    return (
        kept.groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n_total"),
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("cents").cast("bigint").alias("kept_cents"),
            (
                F.sum("cents").cast("double") / F.count(F.lit(1)) / 100
            ).alias("trimmed_mean"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Classical seasonal decomposition (trend / day-of-week seasonal /
# residual) with exact integer arithmetic throughout.
# ---------------------------------------------------------------------------


@register(
    "q_seasonal_decompose",
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
), t AS (
  SELECT day,
         CAST(date_diff('day', DATE '1970-01-01', day) % 7 AS BIGINT)
           AS dow,
         cents,
         CASE WHEN COUNT(*) OVER w7 = 7
              THEN CAST(SUM(cents) OVER w7 AS BIGINT) END AS trend7
  FROM daily
  WINDOW w7 AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
), d AS (
  SELECT day, dow, cents, trend7,
         7 * cents - trend7 AS d7
  FROM t
), s AS (
  SELECT d.*,
         CAST(COUNT(d7) OVER wd AS BIGINT) AS k,
         CAST(SUM(d7) OVER wd AS BIGINT) AS s7
  FROM d
  WINDOW wd AS (PARTITION BY dow)
), r AS (
  SELECT day, dow, cents, trend7, d7, k,
         CASE WHEN d7 IS NOT NULL THEN k * d7 - s7 END AS r7k
  FROM s
), g AS (
  SELECT CAST(COUNT(r7k) AS BIGINT) AS n_full,
         CAST(SUM(abs(r7k)) AS BIGINT) AS sum_abs
  FROM r
)
SELECT strftime(r.day, '%Y-%m-%d') AS day,
       r.dow, r.cents, r.trend7, r.d7, r.k, r.r7k,
       CASE WHEN r.r7k IS NOT NULL
            THEN abs(r.r7k) * g.n_full > 3 * g.sum_abs END AS anomaly
FROM r CROSS JOIN g
ORDER BY day
""",
    doc="Classical seasonal decomposition of the daily revenue series: "
    "centered 7-row moving trend, day-of-week seasonal means, and "
    "residuals — all EXACT integers by clearing denominators (d7 = "
    "7·cents − Σ7 is the detrended value ×7; r7k = k·d7 − Σ_dow(d7) "
    "is the residual ×7k), so both engines agree bit-for-bit with no "
    "float means anywhere.  A day is anomalous when |residual| > 3× "
    "the mean |residual| — again compared as cleared integers "
    "(|r|·n > 3·Σ|r|).  Scale: the corpus contributes ONE day-grain "
    "rollup; every window after runs on the calendar-bounded daily "
    "table (365 rows/year regardless of corpus size — its 1-part "
    "exchange is calendar-bounded, the benign class).  Extends the "
    "temporal family (q_moving_avg, q_holt_forecast, q_ewma_decay, "
    "q_anomaly_p99) with the trend+seasonal+residual split.",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp"))
            .cast("date")
            .alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        (F.datediff("day", F.lit("1970-01-01")) % 7)
        .cast("bigint")
        .alias("dow"),
        "cents",
        F.when(
            F.count(F.lit(1)).over(w7) == 7,
            F.sum("cents").over(w7).cast("bigint"),
        ).alias("trend7"),
    )
    d = t.withColumn("d7", 7 * F.col("cents") - F.col("trend7"))
    wd = Window.partitionBy("dow")
    s = d.select(
        "*",
        F.count("d7").over(wd).cast("bigint").alias("k"),
        F.sum("d7").over(wd).cast("bigint").alias("s7"),
    )
    r = s.select(
        "day",
        "dow",
        "cents",
        "trend7",
        "d7",
        "k",
        F.when(
            F.col("d7").isNotNull(),
            F.col("k") * F.col("d7") - F.col("s7"),
        ).alias("r7k"),
    )
    g = r.agg(
        F.count("r7k").cast("bigint").alias("n_full"),
        F.sum(F.abs("r7k")).cast("bigint").alias("sum_abs"),
    )
    return (
        r.crossJoin(F.broadcast(g))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dow",
            "cents",
            "trend7",
            "d7",
            "k",
            "r7k",
            F.when(
                F.col("r7k").isNotNull(),
                F.abs("r7k") * F.col("n_full") > 3 * F.col("sum_abs"),
            ).alias("anomaly"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend via grouped applyInPandas — the per-group
# pandas surface (SURVEY.md §2.9) on a model built-ins can't express.
# ---------------------------------------------------------------------------

#: lcm(1..29): day gaps within the 30-day fixture window divide it, so
#: num * (_TS_LCM / den) is an EXACT integer sort key for slope
#: fractions (carried as decimal(38,0) — num*LCM can exceed int64)
_TS_LCM = 2329089562800


@register(
    "q_theil_sen",
    oracle=f"""
WITH daily AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01',
              CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE))
              AS BIGINT) AS d,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type,
         b.cents - a.cents AS num,
         b.d - a.d AS den,
         CAST(b.cents - a.cents AS DECIMAL(38,0))
           * ({_TS_LCM} // (b.d - a.d)) AS key
  FROM daily a JOIN daily b
    ON a.event_type = b.event_type AND a.d < b.d
), ranked AS (
  SELECT *, CAST(row_number() OVER (
    PARTITION BY event_type ORDER BY key, den, num) AS BIGINT) AS rn,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM pairs
), med AS (
  SELECT event_type, n AS n_pairs,
         CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS slope
  FROM ranked WHERE rn = (n + 1) // 2
), nd AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days FROM daily
  GROUP BY 1
)
SELECT nd.event_type, nd.n_days, med.n_pairs, med.slope
FROM nd JOIN med USING (event_type)
ORDER BY event_type
""",
    doc="Theil–Sen robust trend (median of all pairwise slopes) of "
    "daily revenue per event type — the estimator OLS-by-sufficient-"
    "statistics (q_linreg) can't express declaratively, implemented "
    "through grouped applyInPandas (SURVEY.md §2.9's per-group pandas "
    "surface): each group is calendar-bounded (~30 days → ~435 "
    "pairs), so the O(n²) pairwise work is embarrassingly "
    "group-parallel and Arrow-batched.  Exactness: pandas compares "
    "slopes as exact Fractions and takes the LOWER median; the oracle "
    "reproduces the identical order with the integer key "
    "num·(lcm(1..29)/den) carried as decimal(38,0) — the hash match "
    "proves the pandas path against pure SQL.  Only the reported "
    "slope is a float (one division).",
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.datediff(
                F.date_trunc("day", F.col("ts").cast("timestamp")).cast(
                    "date"
                ),
                F.lit("1970-01-01"),
            )
            .cast("bigint")
            .alias("d"),
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        from fractions import Fraction

        pdf = pdf.sort_values("d")
        d = pdf["d"].to_numpy()
        c = pdf["cents"].to_numpy()
        slopes = []
        for i in range(len(d)):
            for j in range(i + 1, len(d)):
                num = int(c[j] - c[i])
                den = int(d[j] - d[i])
                slopes.append((Fraction(num, den), den, num))
        slopes.sort()
        n = len(slopes)
        if n == 0:
            # single distinct day -> no pair slopes; the oracle's
            # rn-window emits no row for such a group, so drop it
            return pd.DataFrame(
                {
                    "event_type": pd.Series([], dtype=object),
                    "n_days": pd.Series([], dtype="int64"),
                    "n_pairs": pd.Series([], dtype="int64"),
                    "slope": pd.Series([], dtype="float64"),
                }
            )
        _, den, num = slopes[(n + 1) // 2 - 1]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(d)],
                "n_pairs": [n],
                "slope": [num / den],
            }
        )

    out = daily.groupBy("event_type").applyInPandas(
        _fit,
        "event_type string, n_days bigint, n_pairs bigint, slope double",
    )
    return out.orderBy("event_type")
