"""Data-selection & fine-grained decontamination queries (north-star
§2.11): the stage between corpus cleaning and training-set assembly —
duplicated-span removal inside documents, importance-resampling weights
toward a target domain, and embedding-level eval contamination.

All three are published LLM-pipeline recipes re-expressed Spark-first:

  * ``q_substring_dedup`` — Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better": remove every occurrence of any
    word-8-gram that appears more than once in the corpus (the
    document-boundary-free dedup that exact/minhash doc dedup misses).
  * ``q_dsir_weights`` — Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling": hashed-unigram bag features,
    per-document log importance weight log2 p_target(x) − log2
    p_source(x), smoothed, in the repo's exact fixed-point qlog2
    arithmetic so DuckDB hash-matches bit-for-bit.
  * ``q_semantic_contamination`` — embedding-level train/eval
    decontamination (the semantic sibling of q_contamination_ngram's
    word-8-gram overlap): nearest train neighbor per eval vector,
    flagged at the near-dup cosine threshold.

Determinism playbook as everywhere in this repo: integer/decimal
aggregation, qlog2 instead of float log, deterministic rank tie-breaks,
md5-free modular splits — no RNG, no order-dependent float sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import qlog2_duck_cte, with_qlog2
from ..functions.textstats import WS_RE
from ..sources.tables import load_table
from .registry import register

#: DuckDB-side whitespace class (same characters as WS_RE, escaped for
#: embedding inside a single-quoted SQL string)
_WS_SQL = r"[ \t\n\r\f\x0B]+"


# ---------------------------------------------------------------------------
# Exact duplicated-substring dedup (Lee et al. 2021)
# ---------------------------------------------------------------------------

_SPAN_N = 8  # words per span; Lee et al. use 50 BPE tokens — the
# fixture corpus' documents are ~100 words, so 8 keeps the operator
# observable at test scale while the plan shape is length-agnostic


@register(
    "q_substring_dedup",
    bench=True,
    oracle=rf"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '{_WS_SQL}') AS w
  FROM documents
), g AS (
  SELECT doc_id, i AS start,
         array_to_string(w[i:i + {_SPAN_N - 1}], ' ') AS ngram
  FROM d, UNNEST(range(1, len(w) - {_SPAN_N - 2})) AS u(i)
), dup AS (
  SELECT ngram FROM g GROUP BY ngram HAVING COUNT(*) >= 2
), cov AS (
  SELECT DISTINCT doc_id, start + o AS pos
  FROM g JOIN dup USING (ngram), UNNEST(range(0, {_SPAN_N})) AS t(o)
), words AS (
  SELECT doc_id, i AS pos, w[i] AS word
  FROM d, UNNEST(range(1, len(w) + 1)) AS u(i)
), kept AS (
  SELECT words.doc_id, words.pos, words.word
  FROM words LEFT JOIN cov USING (doc_id, pos)
  WHERE cov.pos IS NULL
), agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(word, ' ' ORDER BY pos)) AS kept_md5
  FROM kept GROUP BY doc_id
)
SELECT d.doc_id AS doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(w) - COALESCE(n_kept, 0) AS BIGINT) AS n_removed,
       COALESCE(kept_md5, md5('')) AS kept_md5
FROM d LEFT JOIN agg USING (doc_id)
ORDER BY doc_id
""",
    doc="Exact duplicated-substring dedup (Lee et al. 2021): any "
    f"word-{_SPAN_N}-gram occurring >= 2 times anywhere in the corpus "
    "(cross-document or repeated in-document) marks all its word "
    "positions for removal; the document keeps the remaining words in "
    "order.  This is the span-level dedup that document-level "
    "exact/MinHash dedup cannot express — boilerplate sentences and "
    "quoted passages vanish from every document at once.  Plan: one "
    "n-gram hash shuffle (groupBy count >= 2 — map-side combined), one "
    "equi-join of gram occurrences against the duplicated-gram set "
    "(linear blocking, never all-pairs), one (doc_id,pos) distinct for "
    "coverage, one anti-join + per-doc ordered reassembly.  At 100 TB "
    "the gram key would be xxhash64-compressed before the shuffle and "
    "ubiquitous grams (>N docs) capped by the stopgram rule — the "
    "join shape is unchanged.  Output carries md5 of the cleaned text "
    "(not the text itself) so only compact rows cross the final "
    "shuffle; n_removed > 0 rows prove span removal fired.",
)
def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return substring_dedup(docs).orderBy("doc_id")


def substring_dedup(docs: DataFrame, span: int = _SPAN_N) -> DataFrame:
    """Span-level dedup stats: for every doc, how many word positions
    fall inside a word-``span``-gram that occurs >= 2 times corpus-wide,
    plus md5 of the text with those positions removed."""
    from ..operators.scale import spread_cpu_bound

    # d feeds THREE consumers (grams, the word stream, the final
    # n_words join); spread the 1-file scan across cores and
    # checkpoint the tokenized form once instead of re-splitting the
    # corpus per consumer — removes the serialized single-task scan
    # stages the old plan paid per consumer (r11; the win grows with
    # corpus size since the re-splits were O(corpus) each)
    d = (
        spread_cpu_bound(docs)
        .select("doc_id", F.split(F.trim("text"), WS_RE).alias("w"))
        .localCheckpoint()
    )
    # 1-based start positions: struct(start, ngram) keeps the position
    # attached through the explode (matches the oracle's UNNEST(range))
    grams = d.filter(F.size("w") >= span).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(w) - {span - 1}),"
                f" i -> struct(i AS start,"
                f" concat_ws(' ', slice(w, i, {span})) AS ngram))"
            )
        ).alias("g"),
    ).select("doc_id", "g.start", "g.ngram")
    # r15: coverage/reassembly used to run as three corpus-scale
    # shuffles — a (doc_id, pos) explode+distinct (8x the duplicated
    # gram rows), a word-level anti-join, and a per-doc sorted
    # collect_list for the md5.  A document's cleaned text depends
    # only on its word array (already in the checkpointed d) and its
    # duplicated-span START list (doc-bounded), so all three collapse
    # into ONE per-doc numpy/hashlib pass in mapInPandas: mark the
    # covered positions with span offset writes, keep the rest, md5
    # the space-joined remainder (hashlib == Spark md5 on identical
    # UTF-8 bytes; the join separator matches concat_ws).  Measured
    # at sf0.1: 2.37 -> 1.74 s; 10x corpus 7.17 -> 5.22 s; row parity
    # pinned at sf0.001/0.01/0.1 plus the oracle hash.
    #
    # r16: the duplicated-gram filter used to be a second full pass
    # over the gram stream (a groupBy(ngram) count to build `dup`,
    # then grams JOIN dup — the corpus-scale explode ran twice and
    # the 10x bench wall was exactly this branch, 5.7 s of the 6.0 s
    # query floor).  The count and the occurrence rows can ride ONE
    # ngram-hash exchange instead (guide §2.4): a count() window over
    # the ngram partition marks every occurrence with its corpus-wide
    # frequency in the same shuffle that used to feed the count-only
    # aggregate, so the explode runs once and the join disappears.
    # WindowExec buffers per ngram-partition with disk spill, so a
    # pathological hot gram degrades to disk, not OOM (the former
    # per-key collect_list alternative measured the same speed but
    # holds a hot gram's occurrence list in one aggregation buffer).
    # Measured at 10x, same process, min of 3: starts subtree
    # 5.73 -> 2.21 s; full query 6.04 -> ~4.1 s.  Row parity pinned
    # at sf0.001/0.01/0.1 plus the oracle hash (occurrence multiset
    # identical by construction — same predicate, same rows).
    starts = (
        grams.withColumn(
            "occ", F.count(F.lit(1)).over(Window.partitionBy("ngram"))
        )
        .filter(F.col("occ") >= 2)
        .groupBy("doc_id")
        .agg(F.collect_list("start").alias("starts"))
    )
    joined = d.join(starts, "doc_id", "left").select(
        "doc_id", "w", "starts"
    )

    def _clean_batches(it):
        import hashlib

        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, nk, md = [], [], []
            for doc_id, w, st in zip(
                pdf["doc_id"], pdf["w"], pdf["starts"]
            ):
                if st is not None and len(st):
                    n = len(w)
                    cov = np.zeros(n + span, dtype=bool)
                    s = np.asarray(st, dtype=np.int64) - 1  # 0-based
                    for o in range(span):
                        cov[s + o] = True
                    # r16: boolean-mask the word array directly (one C
                    # pass) instead of a Python index comprehension
                    kept_words = np.asarray(w, dtype=object)[~cov[:n]]
                    nk.append(int(kept_words.shape[0]))
                else:
                    kept_words = w
                    nk.append(len(w))
                ids.append(doc_id)
                md.append(
                    hashlib.md5(
                        " ".join(kept_words).encode("utf-8")
                    ).hexdigest()
                )
            yield pd.DataFrame(
                {
                    "doc_id": np.asarray(ids, dtype=np.int64),
                    "n_kept": np.asarray(nk, dtype=np.int64),
                    "kept_md5": md,
                }
            )

    stats = joined.mapInPandas(
        _clean_batches, "doc_id bigint, n_kept bigint, kept_md5 string"
    )
    return (
        d.select("doc_id", F.size("w").cast("bigint").alias("n_words"))
        .join(stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_words",
            (F.col("n_words") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_removed"
            ),
            F.coalesce("kept_md5", F.md5(F.lit(""))).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# DSIR importance-resampling weights (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"  # the target domain: score every other source's
# documents by how target-like their hashed-unigram bag looks
_DSIR_BUCKETS = 64  # feature-hash space, shared with q_feature_hash


def _dsir_oracle() -> str:
    ws = _WS_SQL
    ql, ql_out = qlog2_duck_cte("vals", "x")
    b = _DSIR_BUCKETS
    return f"""
WITH t AS (
  SELECT doc_id, source,
         CAST(CONCAT('0x', substring(md5(tok), 1, 4)) AS INT) % {b}
           AS bucket
  FROM (SELECT doc_id, source,
               UNNEST(string_split_regex(trim(text), '{ws}')) AS tok
        FROM documents)
), tc AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM t WHERE source = '{_DSIR_TARGET}' GROUP BY bucket
), sc AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS c
  FROM t WHERE source <> '{_DSIR_TARGET}' GROUP BY bucket
), tot AS (
  SELECT (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) + {b} FROM tc)
           AS tden,
         (SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) + {b} FROM sc)
           AS sden
), vals AS (
  SELECT DISTINCT c + 1 AS x FROM tc
  UNION
  SELECT DISTINCT c + 1 AS x FROM sc
  UNION
  SELECT tden AS x FROM tot
  UNION
  SELECT sden AS x FROM tot
),
{ql},
tq AS (
  SELECT tc.bucket, o.qlog2 AS st
  FROM tc JOIN {ql_out} o ON o.x = tc.c + 1
), sq AS (
  SELECT sc.bucket, o.qlog2 AS ss
  FROM sc JOIN {ql_out} o ON o.x = sc.c + 1
), dq AS (
  SELECT (SELECT o.qlog2 FROM tot t JOIN {ql_out} o ON o.x = t.tden)
           AS qtden,
         (SELECT o.qlog2 FROM tot t JOIN {ql_out} o ON o.x = t.sden)
           AS qsden
), scored AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(COALESCE(st, 0)) AS BIGINT) AS sum_t,
         CAST(SUM(COALESCE(ss, 0)) AS BIGINT) AS sum_s
  FROM t
  LEFT JOIN tq USING (bucket)
  LEFT JOIN sq USING (bucket)
  WHERE t.source <> '{_DSIR_TARGET}'
  GROUP BY t.doc_id
)
SELECT doc_id, n_tokens,
       sum_t - sum_s + n_tokens * (qsden - qtden) AS dsir_key,
       CAST(sum_t - sum_s + n_tokens * (qsden - qtden) AS DOUBLE)
         / 1048576.0 AS log2_weight
FROM scored CROSS JOIN dq
ORDER BY doc_id
"""


@register(
    "q_dsir_weights",
    oracle=_dsir_oracle(),
    doc="DSIR importance-resampling weights (Xie et al. 2023): score "
    "every non-target document by log2 p_target(x) − log2 p_source(x) "
    "under hashed-unigram bag models with add-one smoothing — the "
    "published recipe for selecting target-domain-like data from a raw "
    "pool.  Features are the q_feature_hash md5-prefix buckets (64, "
    "engine-portable, no vocabulary build); both distributions live in "
    "one 64-row table, so scoring is a broadcast join — no shuffle "
    "grows with corpus size except the per-doc aggregation.  Exact "
    "arithmetic: every log2 is the fixed-point integer qlog2 "
    "(functions/numeric.py) over the DISTINCT smoothed counts "
    "(<= 130 values at any scale), the per-doc key is pure bigint, "
    "and the only float is one final division by 2^20.  At 100 TB the "
    "bucket space widens (2^18 is the paper's) and the stats table "
    "stays broadcast-sized.",
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return dsir_weights(docs).orderBy("doc_id")


def dsir_weights(
    docs: DataFrame,
    target: str = _DSIR_TARGET,
    n_buckets: int = _DSIR_BUCKETS,
) -> DataFrame:
    """Per-document DSIR log2 importance weight toward ``target``
    (docs whose ``source`` == target form the target distribution;
    all other docs are the raw pool being scored)."""
    b = n_buckets
    bucket = (
        F.conv(F.substring(F.md5("tok"), 1, 4), 16, 10).cast("int") % b
    )
    toks = docs.select(
        "doc_id",
        "source",
        F.explode(F.split(F.trim("text"), WS_RE)).alias("tok"),
    ).select("doc_id", "source", bucket.alias("bucket"))
    # trained artifact: 64-row bucket stats per side, materialized once
    tc = (
        toks.filter(F.col("source") == target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    sc = (
        toks.filter(F.col("source") != target)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    tden = tc.agg(
        (F.coalesce(F.sum("c"), F.lit(0)) + b).cast("bigint").alias("x")
    )
    sden = sc.agg(
        (F.coalesce(F.sum("c"), F.lit(0)) + b).cast("bigint").alias("x")
    )
    vals = (
        tc.select((F.col("c") + 1).alias("x"))
        .union(sc.select((F.col("c") + 1).alias("x")))
        .union(tden)
        .union(sden)
        .distinct()
    )
    ql = with_qlog2(vals, "x", "q").localCheckpoint()
    tq = tc.join(ql, tc.c + 1 == ql.x).select("bucket", F.col("q").alias("st"))
    sq = sc.join(ql, sc.c + 1 == ql.x).select("bucket", F.col("q").alias("ss"))
    dq = (
        tden.join(ql, "x")
        .select(F.col("q").alias("qtden"))
        .crossJoin(sden.join(ql, "x").select(F.col("q").alias("qsden")))
    )
    scored = (
        toks.filter(F.col("source") != target)
        .join(F.broadcast(tq), "bucket", "left")
        .join(F.broadcast(sq), "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tokens"),
            F.sum(F.coalesce("st", F.lit(0))).cast("bigint").alias("sum_t"),
            F.sum(F.coalesce("ss", F.lit(0))).cast("bigint").alias("sum_s"),
        )
    )
    key = F.col("sum_t") - F.col("sum_s") + F.col("n_tokens") * (
        F.col("qsden") - F.col("qtden")
    )
    return (
        scored.crossJoin(F.broadcast(dq))
        .select(
            "doc_id",
            "n_tokens",
            key.alias("dsir_key"),
            (key.cast("double") / F.lit(float(1 << 20))).alias(
                "log2_weight"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Embedding-level eval contamination
# ---------------------------------------------------------------------------

_SEMCON_THR = 0.35  # near-dup cosine threshold matching
# q_embedding_neardup's fixture-calibrated band (real corpora ~0.95)


@register(
    "q_semantic_contamination",
    oracle=f"""
WITH c AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
  FROM embeddings
), ev AS (
  SELECT vec_id AS eval_id, emb AS e_emb FROM c WHERE vec_id % 10 = 0
), tr AS (
  SELECT vec_id AS train_id, emb AS t_emb FROM c WHERE vec_id % 10 <> 0
), sims AS (
  SELECT ev.eval_id, tr.train_id,
         round(list_dot_product(ev.e_emb, tr.t_emb)
               / (sqrt(list_dot_product(ev.e_emb, ev.e_emb))
                  * sqrt(list_dot_product(tr.t_emb, tr.t_emb))), 6)
           AS cosine
  FROM ev, tr
), ranked AS (
  SELECT eval_id, train_id, cosine,
         ROW_NUMBER() OVER (
           PARTITION BY eval_id ORDER BY cosine DESC, train_id
         ) AS rnk
  FROM sims
)
SELECT eval_id, train_id AS nearest_train_id, cosine,
       cosine >= {_SEMCON_THR} AS contaminated
FROM ranked WHERE rnk = 1
ORDER BY eval_id
""",
    doc="Embedding-level eval decontamination (the semantic sibling of "
    "q_contamination_ngram; SemDeDup/Abbas et al. applied across the "
    "train/eval boundary): for every eval vector (vec_id %% 10 == 0 "
    "slice) find its nearest train neighbor by exact cosine and flag "
    f"it contaminated at the {_SEMCON_THR} fixture near-dup threshold. "
    "Plan: the eval side is broadcast (eval benchmarks are bounded — "
    "thousands of rows at any corpus scale), the train scan streams "
    "past it once, and the per-eval argmax is a group-bounded window "
    "on eval_id — O(train) work, zero train-side self-joins.  Ranking "
    "ties break on (cosine DESC, train_id) so the reported neighbor "
    "is deterministic.  At 100 TB the brute-force probe swaps for the "
    "IVF cell-probe path (q_ann_ivf_kmeans) with identical output "
    "columns; the brute-force form here IS the recall baseline.",
)
def q_semantic_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    ev = emb.filter(F.col("vec_id") % 10 == 0)
    tr = emb.filter(F.col("vec_id") % 10 != 0)
    return semantic_contamination(tr, ev).orderBy("eval_id")


def semantic_contamination(
    train: DataFrame, evals: DataFrame, threshold: float = _SEMCON_THR
) -> DataFrame:
    """Nearest train neighbor per eval vector + contamination flag at
    ``threshold``; evals is broadcast (bounded), train streams once."""
    from ..operators.similarity import brute_force_topk

    top1 = brute_force_topk(train, evals, k=1)
    return top1.select(
        F.col("query_id").alias("eval_id"),
        F.col("vec_id").alias("nearest_train_id"),
        "cosine",
        (F.col("cosine") >= threshold).alias("contaminated"),
    )


# ---------------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis A-ES)
# ---------------------------------------------------------------------------

_WS_K = 5  # sample size per stratum
_QL_ONE = 32 << 20  # qlog2(2^32): the u ~ U(0,1] scale constant


def _weighted_sample_oracle() -> str:
    ql, ql_out = qlog2_duck_cte("base", "u")
    return f"""
WITH base AS (
  SELECT doc_id, source, n_chars,
         CAST(CONCAT('0x',
           substring(md5('wsample:' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) + 1 AS u
  FROM documents
),
{ql},
ranked AS (
  SELECT doc_id, source, n_chars,
         CAST(qlog2 - {_QL_ONE} AS DOUBLE) / n_chars AS priority,
         ROW_NUMBER() OVER (
           PARTITION BY source
           ORDER BY CAST(qlog2 - {_QL_ONE} AS DOUBLE) / n_chars DESC,
                    doc_id
         ) AS sample_rank
  FROM {ql_out}
)
SELECT doc_id, source, n_chars, priority, sample_rank
FROM ranked WHERE sample_rank <= {_WS_K}
ORDER BY source, sample_rank
"""


@register(
    "q_weighted_sample",
    oracle=_weighted_sample_oracle(),
    doc="Deterministic weighted sampling without replacement "
    "(Efraimidis-Spirakis A-ES), k per source stratum — how a corpus "
    "build samples documents proportional to token mass without RNG: "
    "the uniform draw is a salted md5 (reproducible across reruns, "
    "backfills, and cluster sizes), and the E-S priority u^(1/w) "
    "orders identically to ln(u)/w, computed LOG-FREE as the exact "
    "fixed-point (qlog2(u) - qlog2(2^32)) / weight — one double "
    "division of exact integers, bit-identical in both engines.  "
    "Per-row qlog2 is ~20 int64 multiplies inside the scan stage "
    "(map-side, no shuffle); the only shuffle is the per-stratum "
    "top-k window — group-bounded, never a global sort.",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, k=_WS_K).orderBy("source", "sample_rank")


def weighted_sample(
    docs: DataFrame, k: int = _WS_K, weight_col: str = "n_chars"
) -> DataFrame:
    """Efraimidis–Spirakis weighted sampling without replacement, k per
    ``source`` stratum, fully deterministic: the uniform draw is a
    salted md5 of doc_id (u32+1 in [1, 2^32]), and the E-S priority
    u^(1/w) ranks as ln(u)/w — computed log-free as the exact
    fixed-point (qlog2(u) - qlog2(2^32)) / w, one double division of
    exact integers (identical in both engines).  Per-row qlog2 is ~20
    int64 multiplies map-side — no shuffle, no RNG, reproducible under
    any partitioning; the only shuffle is the per-stratum top-k
    window."""
    from pyspark.sql.window import Window

    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("wsample:"), F.col("doc_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    )
    base = docs.select("doc_id", "source", weight_col, u.alias("u"))
    keyed = with_qlog2(base, "u", "qu").select(
        "doc_id",
        "source",
        weight_col,
        (
            (F.col("qu") - _QL_ONE).cast("double") / F.col(weight_col)
        ).alias("priority"),
    )
    w = Window.partitionBy("source").orderBy(
        F.col("priority").desc(), "doc_id"
    )
    return keyed.withColumn("sample_rank", F.row_number().over(w)).filter(
        F.col("sample_rank") <= k
    )


def _pref_pairs_oracle() -> str:
    from .text import _lm_ppl_cte

    return f"""
WITH {_lm_ppl_cte()},
src AS (
  SELECT k.doc_id, k.key, d.source
  FROM keyed k JOIN documents d USING (doc_id)
), rk AS (
  SELECT doc_id, key, source,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY key, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY source) AS n
  FROM src
), lo AS (SELECT * FROM rk WHERE rnk <= n // 2),
hi AS (
  SELECT doc_id, key, source, n - rnk + 1 AS rnk FROM rk
  WHERE n - rnk + 1 <= n // 2
)
SELECT lo.source,
       CAST(lo.rnk AS BIGINT) AS pair_id,
       lo.doc_id AS chosen_doc_id,
       hi.doc_id AS rejected_doc_id,
       CAST(hi.key - lo.key AS BIGINT) AS margin
FROM lo JOIN hi ON lo.source = hi.source AND lo.rnk = hi.rnk
WHERE hi.key > lo.key
ORDER BY lo.source, pair_id
"""


@register(
    "q_preference_pairs",
    oracle=_pref_pairs_oracle(),
    doc="DPO/RLHF preference-pair construction from the LM quality "
    "signal: within each source, docs rank by exact perplexity key "
    "and rank i pairs with rank n+1-i — best-vs-worst first, "
    "narrowing inward — emitting (chosen, rejected, margin) rows; "
    "zero-margin pairs (equal keys) are dropped since they carry no "
    "preference signal.  This is the standard bootstrap for reward-"
    "model / DPO data when only a scalar quality score exists.  All "
    "ranking is the exact bigint key with doc_id tie-breaks — "
    "deterministic pairing under any partitioning.  Plan: scoring is "
    "q_lm_perplexity_buckets' shape; pairing adds one source-"
    "partitioned window + a self-join on (source, rank) — both ride "
    "the same hash partitioning.",
)
def q_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..operators.lm import score_documents, train_unigram_lm

    docs = load_table(spark, sf_dir, "documents")
    vocab_s, sden = train_unigram_lm(docs)
    keyed = score_documents(
        docs.filter(F.col("doc_id") % 10 != 0), vocab_s, sden
    )
    src = keyed.join(docs.select("doc_id", "source"), "doc_id")
    wp = Window.partitionBy("source")
    rk = src.select(
        "doc_id", "key", "source",
        F.row_number().over(wp.orderBy("key", "doc_id")).alias("rnk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo = rk.filter(F.col("rnk") <= F.expr("n div 2")).select(
        "source",
        F.col("rnk").cast("bigint").alias("pair_id"),
        F.col("doc_id").alias("chosen_doc_id"),
        F.col("key").alias("key_lo"),
    )
    hi = rk.filter(
        (F.col("n") - F.col("rnk") + 1) <= F.expr("n div 2")
    ).select(
        "source",
        (F.col("n") - F.col("rnk") + 1).cast("bigint").alias("pair_id"),
        F.col("doc_id").alias("rejected_doc_id"),
        F.col("key").alias("key_hi"),
    )
    return (
        lo.join(hi, ["source", "pair_id"])
        .filter(F.col("key_hi") > F.col("key_lo"))
        .select(
            "source",
            "pair_id",
            "chosen_doc_id",
            "rejected_doc_id",
            (F.col("key_hi") - F.col("key_lo")).cast("bigint").alias("margin"),
        )
        .orderBy("source", "pair_id")
    )


# ---------------------------------------------------------------------------
# Greedy decoding from the bigram LM — the trained artifact DECODES,
# closing the train → score → generate loop.
# ---------------------------------------------------------------------------

_DECODE_STEPS = 8


def _greedy_decode_oracle() -> str:
    ws = _WS_SQL
    steps = []
    prev = "s0"
    for i in range(1, _DECODE_STEPS + 1):
        steps.append(
            f"""s{i} AS MATERIALIZED (
  SELECT {i} AS step, b.prev, b.term, b.c
  FROM big b JOIN {prev} p ON b.prev = p.term
  ORDER BY b.c DESC, b.term LIMIT 1
)"""
        )
        prev = f"s{i}"
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM s{i}" for i in range(1, _DECODE_STEPS + 1)
    )
    return f"""
WITH tokr AS (
  SELECT doc_id, UNNEST(toks) AS tokr,
         CAST(UNNEST(range(len(toks))) AS BIGINT) AS pos
  FROM (SELECT doc_id,
               list_filter(string_split_regex(trim(text), '{ws}'),
                           x -> x <> '') AS toks
        FROM documents)
), tok AS (
  SELECT doc_id, lower(tokr) AS term, pos FROM tokr
), bg AS (
  SELECT COALESCE(LAG(term) OVER (PARTITION BY doc_id ORDER BY pos),
                  '<s>') AS prev,
         term
  FROM tok
), big AS MATERIALIZED (
  SELECT prev, term, CAST(COUNT(*) AS BIGINT) AS c
  FROM bg GROUP BY prev, term
), s0 AS (SELECT 0 AS step, '' AS prev, '<s>' AS term, CAST(0 AS BIGINT) AS c),
{",".join(steps)}
SELECT CAST(step AS BIGINT) AS step, prev, term AS token, c
FROM ({union})
ORDER BY step
"""


@register(
    "q_lm_greedy_decode",
    oracle=_greedy_decode_oracle(),
    doc=f"Greedy decoding from the corpus bigram model: starting at "
    "the <s> sentinel, each of "
    f"{_DECODE_STEPS} steps emits argmax_c count(prev, c) with the "
    "lexicographic tie order — the trained LM artifact actually "
    "GENERATES, closing the train → score (q_bigram_ppl_buckets) → "
    "decode loop with zero RNG (greedy = temperature-0 sampling, the "
    "only decode both engines can agree on bit-for-bit).  Each step "
    "is a vocabulary-bounded argmax (orderBy+limit-1 on the bigram "
    "table filtered to one context); the corpus is touched once for "
    "the bigram counts.",
)
def q_lm_greedy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import _bigrams

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big = (
        _bigrams(docs)
        .groupBy("prev", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint()
    )
    rows = []
    cur = big.sparkSession.createDataFrame([("<s>",)], "term string")
    for i in range(1, _DECODE_STEPS + 1):
        step = (
            big.join(
                F.broadcast(cur.select(F.col("term").alias("prev"))), "prev"
            )
            .orderBy(F.col("c").desc(), "term")
            .limit(1)
            .select(
                F.lit(i).cast("bigint").alias("step"),
                "prev",
                F.col("term").alias("token"),
                "c",
            )
            .localCheckpoint()
        )
        rows.append(step)
        cur = step.select(F.col("token").alias("term"))
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("step")
