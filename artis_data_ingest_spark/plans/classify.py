"""Supervised text classification: train + inference as one declarative
plan.

The reference repo's pipeline (``scrape_newest_baci_data.R``,
``assess_changes.qmd``) stops at ingest/diff; a training-data pipeline
at 100 TB additionally runs *model-based* quality and language filters
— the fastText-style linear classifier of CCNet / FineWeb-edu.  This
module implements the canonical form: a multinomial Naive-Bayes
classifier over hashed token features ("hashing trick", no vocabulary
build), trained on a split of the corpus and applied to the held-out
split, all inside one Spark plan.

Exact-arithmetic playbook (same as the LM perplexity filter): every
log2 is the fixed-point integer ``qlog2`` from ``functions.numeric``,
applied only to the DISTINCT training-statistic values (bounded by
B·C + 2·C rows), so scores are bigint sums — order-independent,
engine-portable, hash-matchable against the DuckDB oracle.

Scale story (100 TB): the weight table is B buckets × C classes
(64×5 here) — broadcast; inference is one shuffle to per-(doc,bucket)
counts and one shuffle to per-(doc,class) scores, both map-side
combined; the argmax rides the (doc) partitioning.  No all-pairs, no
vocabulary broadcast, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.numeric import qlog2_duck_cte, with_qlog2
from ..sources.tables import load_table
from .registry import register

_B = 64  # feature buckets (matches q_feature_hash's md5-prefix space)
_WS = r"[ \t\n\r\f\x0B]+"


def _bucket_col(tok: str) -> F.Column:
    # identical expression to q_feature_hash (analytics_ext.py): first 4
    # md5 hex chars as an int, mod B — engine-portable where murmur3 /
    # xxhash64 are not.
    return F.conv(F.substring(F.md5(tok), 1, 4), 16, 10).cast("int") % _B


def nb_train_weights(train: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train a multinomial NB model on ``train(doc_id, label, text)``.

    Returns ``(weights, class_stats)``:
      weights:      bucket, cls, wql     = qlog2(count_{bucket,cls} + 1)
      class_stats:  cls, qld, qlt        = qlog2(n_docs_cls),
                                           qlog2(n_tokens_cls + B)
    Add-1 smoothing over the fixed B-bucket feature space; all values
    are bigint fixed-point log2s, exact and order-independent.
    """
    spark = train.sparkSession
    toks = train.select(
        "doc_id",
        F.col("label").alias("cls"),
        F.explode(F.split(F.trim("text"), _WS)).alias("tok"),
    ).select("doc_id", "cls", _bucket_col("tok").alias("bucket"))
    # the only two corpus passes: the (bucket, cls) count grid and the
    # per-class doc count.  Both are B*C- / C-bounded, so materialize
    # (the _bpe_train pattern) — every later branch (grid, totals,
    # qlog2 value table, weight join) re-derives from these tiny
    # checkpoints instead of rescanning the training corpus (measured:
    # 10 parquet scans -> 3 without it).
    cnt = toks.groupBy("bucket", "cls").agg(
        F.count(F.lit(1)).alias("c")
    ).localCheckpoint()
    ndocs = train.groupBy(F.col("label").alias("cls")).agg(
        F.count(F.lit(1)).alias("ndocs")
    ).localCheckpoint()
    classes = ndocs.select("cls")
    buckets = spark.range(_B).select(F.col("id").cast("int").alias("bucket"))
    # full B x C grid so unseen (bucket, cls) cells get the smoothed
    # weight qlog2(0 + 1) = 0 — both sides tiny, broadcast crossJoin
    grid = (
        buckets.crossJoin(F.broadcast(classes))
        .join(cnt, ["bucket", "cls"], "left")
        .select("bucket", "cls", (F.coalesce("c", F.lit(0)) + 1).alias("cnt1"))
    )
    # per-class token totals fold out of the count grid — no third
    # corpus pass
    cstat = (
        ndocs.join(
            cnt.groupBy("cls").agg(F.sum("c").alias("ntok")), "cls"
        )
        .select("cls", "ndocs", (F.col("ntok") + _B).alias("ntokb"))
    )
    # qlog2 over the DISTINCT statistic values only (<= B*C + 2C rows)
    vals = (
        grid.select(F.col("cnt1").alias("x"))
        .union(cstat.select(F.col("ndocs").alias("x")))
        .union(cstat.select(F.col("ntokb").alias("x")))
        .distinct()
    )
    ql = with_qlog2(vals, "x", "q").localCheckpoint()
    weights = grid.join(F.broadcast(ql), grid.cnt1 == ql.x).select(
        "bucket", "cls", F.col("q").alias("wql")
    )
    cstatq = (
        cstat.join(F.broadcast(ql.select("x", "q")), cstat.ndocs == F.col("x"))
        .select("cls", "ntokb", F.col("q").alias("qld"))
        .join(
            F.broadcast(ql.select(F.col("x").alias("x2"), F.col("q").alias("qlt"))),
            F.col("ntokb") == F.col("x2"),
        )
        .select("cls", "qld", "qlt")
    )
    return weights, cstatq


def nb_predict(test: DataFrame, weights: DataFrame, cstat: DataFrame) -> DataFrame:
    """Score ``test(doc_id, label, text)`` against the trained model and
    return one row per doc: doc_id, label, predicted.

    score_c(d) = qlog2(ndocs_c) + sum_tok qlog2(cnt_{b,c}+1)
                 - n_d * qlog2(ntok_c + B)
    argmax over c, ties broken by class name — fully deterministic.
    """
    toks = test.select(
        "doc_id",
        "label",
        F.explode(F.split(F.trim("text"), _WS)).alias("tok"),
    ).select("doc_id", "label", _bucket_col("tok").alias("bucket"))
    db = toks.groupBy("doc_id", "label", "bucket").agg(
        F.count(F.lit(1)).alias("m")
    )
    per_dc = (
        db.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id", "label", "cls")
        .agg(
            F.sum(F.col("m") * F.col("wql")).alias("tok_sum"),
            F.sum("m").alias("n_d"),
        )
        .join(F.broadcast(cstat), "cls")
        .select(
            "doc_id",
            "label",
            "cls",
            (
                F.col("qld") + F.col("tok_sum") - F.col("n_d") * F.col("qlt")
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("cls").asc()
    )
    return (
        per_dc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "label", F.col("cls").alias("predicted"))
    )


def _nb_oracle() -> str:
    ql, ql_out = qlog2_duck_cte("vals", "x")
    return f"""
WITH tr AS (
  SELECT doc_id, lang AS label, text FROM documents WHERE doc_id % 5 < 4
), te AS (
  SELECT doc_id, lang AS label, text FROM documents WHERE doc_id % 5 = 4
), trb AS (
  SELECT doc_id, label AS cls,
         CAST(CONCAT('0x', substring(md5(tok), 1, 4)) AS INT) % {_B} AS bucket
  FROM (SELECT doc_id, label,
               UNNEST(string_split_regex(trim(text), '{_WS}')) AS tok
        FROM tr)
), cls AS (
  SELECT DISTINCT label AS cls FROM tr
), grid0 AS (
  SELECT CAST(b.r AS INT) AS bucket, c.cls
  FROM (SELECT UNNEST(range({_B})) AS r) b CROSS JOIN cls c
), cnt AS (
  SELECT bucket, cls, COUNT(*) AS c FROM trb GROUP BY 1, 2
), grid AS (
  SELECT g.bucket, g.cls, COALESCE(cnt.c, 0) + 1 AS cnt1
  FROM grid0 g LEFT JOIN cnt USING (bucket, cls)
), cstat AS (
  SELECT d.cls, d.ndocs, t.ntok + {_B} AS ntokb
  FROM (SELECT label AS cls, COUNT(*) AS ndocs FROM tr GROUP BY 1) d
  JOIN (SELECT cls, COUNT(*) AS ntok FROM trb GROUP BY 1) t USING (cls)
), vals AS (
  SELECT cnt1 AS x FROM grid
  UNION SELECT ndocs FROM cstat
  UNION SELECT ntokb FROM cstat
),
{ql},
wgt AS (
  SELECT g.bucket, g.cls, o.qlog2 AS wql
  FROM grid g JOIN {ql_out} o ON o.x = g.cnt1
), cstatq AS (
  SELECT s.cls, od.qlog2 AS qld, ot.qlog2 AS qlt
  FROM cstat s
  JOIN {ql_out} od ON od.x = s.ndocs
  JOIN {ql_out} ot ON ot.x = s.ntokb
), teb AS (
  SELECT doc_id, label,
         CAST(CONCAT('0x', substring(md5(tok), 1, 4)) AS INT) % {_B} AS bucket
  FROM (SELECT doc_id, label,
               UNNEST(string_split_regex(trim(text), '{_WS}')) AS tok
        FROM te)
), db AS (
  SELECT doc_id, label, bucket, COUNT(*) AS m FROM teb GROUP BY 1, 2, 3
), per_dc AS (
  SELECT d.doc_id, d.label, w.cls,
         s.qld + SUM(d.m * w.wql) - SUM(d.m) * s.qlt AS score
  FROM db d
  JOIN wgt w USING (bucket)
  JOIN cstatq s ON s.cls = w.cls
  GROUP BY d.doc_id, d.label, w.cls, s.qld, s.qlt
), pred AS (
  SELECT doc_id, label, cls AS predicted
  FROM per_dc
  QUALIFY row_number() OVER (
    PARTITION BY doc_id ORDER BY score DESC, cls ASC) = 1
)
SELECT label AS lang, predicted, COUNT(*) AS n
FROM pred
GROUP BY 1, 2
ORDER BY 1, 2
"""


@register(
    "q_nb_classifier",
    oracle=_nb_oracle(),
    doc="fastText-style supervised text classifier (multinomial Naive "
    "Bayes over hashed token features), trained on an 80% doc_id split "
    "and evaluated on the held-out 20% — the model-based language/"
    "quality filter of CCNet and FineWeb-edu, as one declarative plan. "
    "No vocabulary build: tokens hash into the fixed 64-bucket space "
    "(q_feature_hash's md5-prefix idiom), so the learned model is a "
    "broadcastable 64xC weight table.  All scores are exact bigint "
    "qlog2 fixed-point sums (the LM-perplexity playbook) — "
    "deterministic argmax with name tie-break, hash-matchable.  Output "
    "is the held-out confusion matrix.  Plan: two map-side-combined "
    "shuffles (doc,bucket)->(doc,cls), weights broadcast; at 100 TB "
    "the model stays 64xC regardless of corpus size.",
)
def q_nb_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select("doc_id", F.col("lang").alias("label"), "text")
    train = labeled.filter(F.col("doc_id") % 5 < 4)
    test = labeled.filter(F.col("doc_id") % 5 == 4)
    weights, cstat = nb_train_weights(train)
    pred = nb_predict(test, weights, cstat)
    return (
        pred.groupBy(F.col("label").alias("lang"), "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )
