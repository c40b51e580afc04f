"""Training-corpus construction queries (north-star §2.11): the
operations a large-scale LLM-data pipeline runs between raw documents
and a training set — deterministic split assignment and the end-to-end
select→filter→dedup→stat pipeline.

Everything is built-in Catalyst expressions; determinism comes from
content hashes (md5), not RNG, so the same document always lands in the
same split on any cluster size — the property a 100 TB pipeline needs
for reproducible train/val separation across reruns and backfills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.textstats import (
    QUALITY_STOPWORDS,
    fingerprint,
    n_tokens,
    stopword_hits,
)
from ..sources.tables import load_table
from .registry import register

_STOP_SQL = ", ".join(repr(w) for w in QUALITY_STOPWORDS)


@register(
    "q_train_split",
    oracle="""
WITH s AS (
  SELECT doc_id,
         substring(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1) AS h
  FROM documents
)
SELECT CASE WHEN h <= 'b' THEN 'train'
            WHEN h <= 'd' THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       MIN(doc_id) AS min_doc_id,
       MAX(doc_id) AS max_doc_id
FROM s
GROUP BY 1
ORDER BY split
""",
    doc="Deterministic train/val/test split (75/12.5/12.5) from the "
    "first hex digit of a salted md5 of the stable id — no RNG, so "
    "membership is reproducible across reruns, cluster sizes, and "
    "engines (the salt lets multiple independent splits coexist). "
    "Pure projection + one aggregation; no shuffle before the agg.",
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 1
    )
    split = (
        F.when(h <= "b", "train").when(h <= "d", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
        .orderBy("split")
    )


@register(
    "q_corpus_pipeline",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text,
         len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_toks,
         len(list_filter(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+'),
                         x -> x IN ({_STOP_SQL}))) AS stop_hits
  FROM documents
  WHERE lang = 'en'
), f AS (
  SELECT * FROM t
  WHERE n_toks BETWEEN 5 AND 1000
    AND stop_hits * 1.0 / n_toks >= 0.05
), d AS (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')))
           ORDER BY doc_id
         ) AS rn
  FROM f
)
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc_id
FROM d WHERE rn = 1
GROUP BY source
ORDER BY source
""",
    doc="End-to-end training-corpus selection (SURVEY.md §2.11 composed): "
    "language filter → token-length and stopword-ratio quality gates → "
    "exact dedup keeping the lowest doc_id per content fingerprint → "
    "per-source corpus stats. One scan; the only shuffles are the dedup "
    "window (hash on fingerprint) and the final small aggregation — the "
    "canonical shape of a 100 TB corpus-build job.",
    bench=True,
)
def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.filter(F.col("lang") == "en").select(
        "doc_id",
        "source",
        "text",
        n_tokens("text").alias("n_toks"),
        stopword_hits("text", QUALITY_STOPWORDS).alias("stop_hits"),
    )
    f = t.filter(
        F.col("n_toks").between(5, 1000)
        & (F.col("stop_hits") * F.lit(1.0) / F.col("n_toks") >= 0.05)
    )
    w = Window.partitionBy(fingerprint("text")).orderBy("doc_id")
    d = f.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("doc_id").alias("first_doc_id"),
        )
        .orderBy("source")
    )


@register(
    "q_sequence_pack_global",
    oracle="""
WITH t AS (
  SELECT doc_id,
         len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_toks
  FROM documents
), c AS (
  SELECT doc_id, n_toks,
         CAST(SUM(n_toks) OVER (ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT (cum - n_toks) // 2048 AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1
ORDER BY pack_id
""",
    doc="Global-order sequence packing — the oracle-checkable reference "
    "semantics for q_sequence_pack (same pack-assignment rule, one "
    "corpus-wide order).  Since r9 the prefix sum runs through "
    "operators/rank.py's distributed_running_sum (range partition + "
    "bounded per-partition totals + broadcast offsets — the terasort "
    "recipe), so the repo's last FULL single-partition exchange is "
    "gone: this form is now shippable at scale too, though "
    "q_sequence_pack's shard-local packing remains the recommended "
    "default (packs never need to span shards, so the global order "
    "buys nothing for training data).",
)
def q_sequence_pack_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import distributed_running_sum

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", n_tokens("text").alias("n_toks"))
    c = distributed_running_sum(t, ["doc_id"], "n_toks", out="cum")
    return (
        c.select(
            F.expr("(cum - n_toks) div 2048").alias("pack_id"),
            "doc_id",
            "n_toks",
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("pack_id")
    )


_N_SHARDS = 16


@register(
    "q_sequence_pack",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         doc_id % {_N_SHARDS} AS shard,
         len(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')) AS n_toks
  FROM documents
), c AS (
  SELECT shard, doc_id, n_toks,
         CAST(SUM(n_toks) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM t
)
SELECT shard,
       (cum - n_toks) // 2048 AS pack_id,
       COUNT(*) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1, 2
ORDER BY shard, pack_id
""",
    doc="Sequence packing (LLM-training-data step: concatenate short "
    "documents into ~fixed-token-budget training rows), scale-safe "
    "default: the running token count is partitioned by a "
    "deterministic shard key (doc_id mod "
    f"{_N_SHARDS}), so each shard's prefix sum runs in its own window "
    "partition — Spark's plan shows a hash exchange on shard and NO "
    "single-partition global sort, unlike q_sequence_pack_global whose "
    "global-order window serializes 100 TB through one reducer (that "
    "form is kept as the oracle-reference semantics). Pack boundaries "
    "are shard-local, which is exactly how a real training-data job "
    "packs: any stable sharding works because packs never need to span "
    "shards. At cluster scale, set the shard count to O(executors).",
)
def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % _N_SHARDS).alias("shard"),
        n_tokens("text").alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_toks").over(w))
    return (
        c.select(
            "shard",
            F.expr("(cum - n_toks) div 2048").alias("pack_id"),
            "doc_id",
            "n_toks",
        )
        .groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard", "pack_id")
    )


@register(
    "q_stratified_sample",
    oracle="""
WITH s AS (
  SELECT lang,
         substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 2) AS h
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN (lang = 'en' AND h <= '7f')
                       OR (lang <> 'en' AND h <= '3f')
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       round(CAST(SUM(CASE WHEN (lang = 'en' AND h <= '7f')
                             OR (lang <> 'en' AND h <= '3f')
                           THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
         AS kept_ratio
FROM s
GROUP BY lang
ORDER BY lang
""",
    doc="Stratified corpus sampling (SURVEY.md §2.11): per-language "
    "keep rates (50% for 'en', 25% otherwise) decided by the first "
    "two hex digits of a salted md5 of the stable id — no RNG, so "
    "membership is reproducible across reruns, partitionings, and "
    "engines, and rates are exact multiples of 1/256. The filter is a "
    "pure projection (pushable to the scan at 100 TB); only the "
    "per-stratum audit aggregation shuffles.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    keep = ((F.col("lang") == "en") & (h <= "7f")) | (
        (F.col("lang") != "en") & (h <= "3f")
    )
    return (
        docs.select("lang", keep.alias("keep"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum(F.col("keep").cast("int")).cast("bigint").alias("n_kept"),
            F.round(
                F.sum(F.col("keep").cast("int")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("kept_ratio"),
        )
        .orderBy("lang")
    )


@register(
    "q_contamination_ngram",
    bench=True,
    oracle=r"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \t\n\r\f\x0B]+') AS w,
         substring(md5('contam:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '1'
           AS is_eval
  FROM documents
  WHERE len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) >= 8
), g AS (
  SELECT doc_id, is_eval, array_to_string(w[i:i+7], ' ') AS ngram
  FROM d, UNNEST(range(1, len(w) - 6)) AS u(i)
), tg AS (
  SELECT DISTINCT ngram FROM g WHERE NOT is_eval
), eg AS (
  SELECT DISTINCT doc_id, ngram FROM g WHERE is_eval
), tot AS (
  SELECT doc_id, COUNT(*) AS n_ngrams FROM eg GROUP BY 1
), m AS (
  SELECT eg.doc_id, COUNT(*) AS n_matched
  FROM eg JOIN tg USING (ngram) GROUP BY 1
)
SELECT tot.doc_id AS doc_id,
       n_ngrams,
       CAST(COALESCE(n_matched, 0) AS BIGINT) AS n_matched,
       round(COALESCE(n_matched, 0) * 1.0 / n_ngrams, 6) AS contamination
FROM tot LEFT JOIN m ON tot.doc_id = m.doc_id
ORDER BY doc_id
""",
    doc="Train/eval contamination detection (the decontamination step "
    "every LLM corpus build runs before training): a deterministic "
    "md5 split carves out an eval slice (~12.5%), then every eval "
    "document is scored by the fraction of its distinct word-8-grams "
    "that appear anywhere in the train slice. Both sides are distinct "
    "n-gram sets, so the check is one equi-join on the n-gram — "
    "linear blocking, no all-pairs. At 100 TB the train side would "
    "be hashed to bigint and bloom-pruned before the shuffle; the "
    "join shape (explode -> distinct -> equi-join -> per-doc count) "
    "is unchanged.",
)
def q_contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+").alias("w")
    ).filter(F.size("w") >= 8)
    is_eval = (
        F.substring(
            F.md5(F.concat(F.lit("contam:"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
        <= "1"
    )
    grams = d.withColumn("is_eval", is_eval).select(
        "doc_id",
        "is_eval",
        F.explode(
            F.expr(
                "transform(sequence(1, size(w) - 7),"
                " i -> concat_ws(' ', slice(w, i, 8)))"
            )
        ).alias("ngram"),
    )
    train_g = grams.filter(~F.col("is_eval")).select("ngram").distinct()
    eval_g = grams.filter(F.col("is_eval")).select("doc_id", "ngram").distinct()
    # one left join + one aggregation: count(hit) counts non-nulls, so
    # total and matched n-grams come from the same pass — the corpus is
    # scanned once per side, not once per statistic
    marked = eval_g.join(
        train_g.withColumn("hit", F.lit(1)), "ngram", "left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            F.count("hit").alias("n_matched"),
        )
        .select(
            "doc_id",
            "n_ngrams",
            "n_matched",
            F.round(
                F.col("n_matched").cast("double") / F.col("n_ngrams"), 6
            ).alias("contamination"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_corpus_shuffle",
    oracle="""
WITH s AS (
  SELECT doc_id,
         substring(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 1) AS shard,
         md5('ord:' || CAST(doc_id AS VARCHAR)) AS ord_key
  FROM documents
)
SELECT shard,
       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY ord_key, doc_id)
         AS pos,
       doc_id
FROM s
ORDER BY shard, pos
""",
    doc="Deterministic corpus shuffle for training order: shard by the "
    "first hex digit of one salted md5 (16 shards), order within each "
    "shard by a second independent salted md5. This is how a 100 TB "
    "pipeline shuffles: a hash exchange on shard plus shard-local "
    "sorts — NO global sort, no RNG, and the permutation is "
    "reproducible on any cluster size or engine. Readers consume "
    "shards round-robin for an unbiased stream; at scale shard count "
    "is O(output files), not 16.",
)
def q_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id",
        F.substring(
            F.md5(F.concat(F.lit("shuf:"), F.col("doc_id").cast("string"))),
            1,
            1,
        ).alias("shard"),
        F.md5(
            F.concat(F.lit("ord:"), F.col("doc_id").cast("string"))
        ).alias("ord_key"),
    )
    w = Window.partitionBy("shard").orderBy("ord_key", "doc_id")
    return (
        s.withColumn("pos", F.row_number().over(w))
        .select("shard", F.col("pos").cast("bigint").alias("pos"), "doc_id")
        .orderBy("shard", "pos")
    )


@register(
    "q_source_mix_weights",
    oracle=r"""
WITH t AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+'))) AS BIGINT)
           AS tokens
  FROM documents
  GROUP BY source
)
SELECT source, n_docs, tokens,
       round(tokens * 1.0 / SUM(tokens) OVER (), 6) AS token_share,
       round((1.0 / COUNT(*) OVER ())
             / (tokens * 1.0 / SUM(tokens) OVER ()), 6) AS sample_weight
FROM t
ORDER BY source
""",
    doc="Source-mix reweighting (domain mixing for LLM training): "
    "per-source token share vs a uniform target, emitting the "
    "sampling weight that equalizes the mixture (weight = target "
    "share / actual share; >1 upsample, <1 downsample). ONE "
    "map-side-combined aggregation over the corpus (single scan); "
    "the share/weight arithmetic is an unpartitioned window over the "
    "tiny per-source result — its SinglePartition exchange moves "
    "n_sources rows, not data. Swap the uniform target for a dict of "
    "curated weights and the plan is unchanged.",
)
def q_source_mix_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens("text")).cast("bigint").alias("tokens"),
    )
    w = Window.partitionBy()
    share = F.col("tokens").cast("double") / F.sum("tokens").over(w)
    return t.select(
        "source",
        "n_docs",
        "tokens",
        F.round(share, 6).alias("token_share"),
        F.round(
            (F.lit(1.0) / F.count(F.lit(1)).over(w)) / share, 6
        ).alias("sample_weight"),
    ).orderBy("source")


_CHUNK, _STRIDE = 64, 48


@register(
    "q_doc_chunks",
    oracle=rf"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \t\n\r\f\x0B]+') AS w,
         len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) AS n
  FROM documents
  WHERE len(trim(text)) > 0
)
SELECT doc_id,
       CAST(s.st // {_STRIDE} AS BIGINT) AS chunk_idx,
       CAST(s.st AS BIGINT) AS start_tok,
       CAST(len(list_slice(w, s.st + 1, least(s.st + {_CHUNK}, n)))
            AS BIGINT) AS n_chunk_toks,
       substring(md5(array_to_string(
         list_slice(w, s.st + 1, least(s.st + {_CHUNK}, n)), ' ')), 1, 8)
         AS chunk_md5
FROM d, UNNEST(range(0, n, {_STRIDE})) AS s(st)
ORDER BY doc_id, chunk_idx
""",
    doc="Document chunking (the preprocessing step behind both training "
    f"windows and retrieval corpora): each document splits into "
    f"{_CHUNK}-token windows at stride {_STRIDE} (16-token overlap), "
    "emitting per-chunk position, token count, and a content hash. "
    "Pure explode over a generated start sequence — linear, no "
    "shuffle before the presentation sort, and the chunk set is "
    "deterministic so re-chunking after a backfill reproduces "
    "identical chunk ids. The md5 pin means a boundary bug (off-by-"
    "one start, overlap drift) hash-mismatches.",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+").alias("w")
    )
    d = d.withColumn("n", F.size("w"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.lit(0), F.col("n") - 1), F.lit(_STRIDE)
    )
    chunked = d.select(
        "doc_id",
        "n",
        "w",
        F.explode(starts).alias("st"),
    )
    chunk = F.slice("w", F.col("st") + 1, _CHUNK)
    return (
        chunked.select(
            "doc_id",
            (F.col("st") / _STRIDE).cast("bigint").alias("chunk_idx"),
            F.col("st").cast("bigint").alias("start_tok"),
            F.size(chunk).cast("bigint").alias("n_chunk_toks"),
            F.substring(
                F.md5(F.concat_ws(" ", chunk)), 1, 8
            ).alias("chunk_md5"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


@register(
    "q_dedup_incremental",
    oracle="""
WITH f AS (
  SELECT doc_id, source,
         md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp
  FROM documents
  WHERE text IS NOT NULL
), corpus AS (
  SELECT DISTINCT fp FROM f WHERE doc_id < 400
), batch AS (
  SELECT * FROM f WHERE doc_id >= 400
), kept AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM batch
)
SELECT source,
       COUNT(*) AS n_batch,
       CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unique_in_batch,
       CAST(SUM(CASE WHEN rn = 1 AND fp NOT IN (SELECT fp FROM corpus)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
FROM kept
GROUP BY source
ORDER BY source
""",
    doc="Incremental dedup-on-ingest (the shape every continuously-fed "
    "corpus runs: an arriving batch must dedup against itself AND "
    "against the already-ingested corpus without rescanning corpus "
    "text): the existing side is reduced to its distinct fingerprint "
    "set (at 100 TB a persisted fingerprint index, bigint-hashed and "
    "bloom-pruned), the batch dedups internally via a window on the "
    "fingerprint, and novelty is one LEFT ANTI equi-join on the "
    "fingerprint — linear blocking, no text comparison, no corpus "
    "rescan. Emits per-source ingest accounting (batch size, "
    "batch-unique, novel-vs-corpus).",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # null text -> null fingerprint, and SQL NOT IN vs anti-join
    # disagree on null keys — exclude up front in BOTH engines
    f = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", "source", fingerprint("text").alias("fp")
    )
    corpus = f.filter(F.col("doc_id") < 400).select("fp").distinct()
    batch = f.filter(F.col("doc_id") >= 400)
    w = Window.partitionBy("fp").orderBy("doc_id")
    kept = batch.withColumn("rn", F.row_number().over(w))
    novel = (
        kept.filter(F.col("rn") == 1)
        .join(corpus, on="fp", how="left_anti")
        .select("doc_id")
        .withColumn("novel", F.lit(1))
    )
    return (
        kept.join(novel, on="doc_id", how="left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_batch"),
            F.sum((F.col("rn") == 1).cast("int"))
            .cast("bigint")
            .alias("n_unique_in_batch"),
            F.count("novel").alias("n_novel"),
        )
        .orderBy("source")
    )


@register(
    "q_quota_sample",
    oracle="""
WITH r AS (
  SELECT lang, doc_id,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY md5('quota:' || CAST(doc_id AS VARCHAR)), doc_id
         ) AS pos
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN pos <= 30 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       MIN(CASE WHEN pos <= 30 THEN doc_id END) AS first_kept
FROM r
GROUP BY lang
ORDER BY lang
""",
    doc="Exact per-stratum quota sampling (the companion to "
    "q_stratified_sample's rate-based keep: when the recipe says '30 "
    "docs per language', not '25%'): rank within each stratum by a "
    "salted md5 of the stable id (deterministic, RNG-free, "
    "engine-portable) and keep rank <= quota — exact counts even for "
    "strata near the quota boundary. One window shuffle on the "
    "stratum key; per-stratum audit aggregation on top. At 100 TB the "
    "rank is a top-quota windowed selection per key — the same shape "
    "as q_topk_window, skew-safe because strata are bounded.",
)
def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    r = docs.select("lang", "doc_id").withColumn(
        "pos", F.row_number().over(w)
    )
    return (
        r.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("pos") <= 30).cast("int"))
            .cast("bigint")
            .alias("n_kept"),
            F.min(F.when(F.col("pos") <= 30, F.col("doc_id"))).alias(
                "first_kept"
            ),
        )
        .orderBy("lang")
    )


@register(
    "q_chunk_dedup",
    oracle=f"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(lower(trim(text)), '[ \\t\\n\\r\\f\\x0B]+') AS w
  FROM documents WHERE length(trim(text)) > 0
), ch AS (
  SELECT doc_id,
         md5(array_to_string(w[st + 1:st + {_CHUNK}], ' ')) AS chunk_md5
  FROM d, UNNEST(range(0, greatest(1, len(w)), {_STRIDE})) t(st)
)
SELECT chunk_md5,
       COUNT(*) AS n_occurrences,
       COUNT(DISTINCT doc_id) AS n_docs,
       MIN(doc_id) AS first_doc,
       COUNT(*) - 1 AS n_removed
FROM ch
GROUP BY chunk_md5
HAVING COUNT(*) > 1
ORDER BY chunk_md5
""",
    doc="Sub-document (chunk-level) dedup — the RefinedWeb/CCNet shape "
    "where boilerplate paragraphs repeat across otherwise-distinct "
    "pages: the same 64/48 sliding windows as q_doc_chunks, "
    "case-normalized, keyed by chunk md5; one shuffle on the chunk "
    "hash yields occurrence/doc counts and the keep-first/remove-rest "
    "decision per duplicate class. Linear blocking on the hash — no "
    "chunk-pair comparison exists at any scale.",
)
def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.filter(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.split(F.lower(F.trim("text")), r"[ \t\n\r\f\x0B]+").alias("w"),
    )
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.lit(0), F.size("w") - 1),
        F.lit(_STRIDE),
    )
    ch = d.select("doc_id", "w", F.explode(starts).alias("st"))
    chunk_md5 = F.md5(
        F.concat_ws(" ", F.slice("w", F.col("st") + 1, _CHUNK))
    )
    return (
        ch.select("doc_id", chunk_md5.alias("chunk_md5"))
        .groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
            (F.count(F.lit(1)) - 1).alias("n_removed"),
        )
        .filter(F.col("n_occurrences") > 1)
        .orderBy("chunk_md5")
    )


@register(
    "q_boilerplate_strip",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         substr(text, 1, 40) || chr(10) ||
         'subscribe to the ' || source || ' newsletter' || chr(10) ||
         substr(text, 41, 40) || chr(10) ||
         CASE WHEN doc_id % 3 = 0 THEN 'cookie notice from ' || source
              ELSE 'unique line ' || doc_id END AS text
  FROM documents
), split_docs AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS lines FROM d
), l AS (
  SELECT doc_id, source, r.i AS pos, lines[r.i + 1] AS line
  FROM split_docs, UNNEST(range(len(lines))) AS r(i)
), dfc AS (
  SELECT source, line, COUNT(DISTINCT doc_id) AS line_docs
  FROM l GROUP BY source, line
), sc AS (
  SELECT source, COUNT(*) AS src_docs FROM d GROUP BY source
), tagged AS (
  SELECT l.doc_id, l.pos, l.line,
         (dfc.line_docs > sc.src_docs * 0.5) AS is_boiler
  FROM l
  JOIN dfc ON l.source = dfc.source AND l.line = dfc.line
  JOIN sc ON l.source = sc.source
)
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN NOT is_boiler THEN line END,
                           chr(10) ORDER BY pos), '') AS text,
       CAST(SUM(CASE WHEN is_boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lines_removed
FROM tagged
GROUP BY doc_id
ORDER BY doc_id
""",
    doc="C4-style boilerplate-line removal (SURVEY.md §2.11 cleaning): "
    "drop every line appearing in >50% of the documents of its source "
    "— the nav/cookie/subscribe template text a crawler captures on "
    "every page of a site — and reassemble documents from surviving "
    "lines in original order.  The fixture derives 4-line documents "
    "whose line 2 is per-source boilerplate (ratio 1.0, removed), "
    "line 4 is boilerplate in exactly one third of the source's docs "
    "(ratio ~0.33, KEPT — pins the threshold direction), lines 1/3 "
    "are per-doc content.  Document frequency counts DISTINCT docs "
    "per (source, line) so within-page repetition can't fake "
    "cross-page boilerplate.  Plan: one (source,line) shuffle + one "
    "doc_id shuffle with order-restored array_sort(collect_list) "
    "reassembly; the line-frequency table is vocabulary-bounded, "
    "never corpus-scale (operators/clean.py:strip_boilerplate_lines).",
)
def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clean import strip_boilerplate_lines

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.substring("text", 1, 40),
            F.lit("\n"),
            F.concat(
                F.lit("subscribe to the "),
                F.col("source"),
                F.lit(" newsletter"),
            ),
            F.lit("\n"),
            F.substring("text", 41, 40),
            F.lit("\n"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(F.lit("cookie notice from "), F.col("source")),
            ).otherwise(
                F.concat(
                    F.lit("unique line "), F.col("doc_id").cast("string")
                )
            ),
        ).alias("text"),
    )
    return strip_boilerplate_lines(docs).orderBy("doc_id")


@register(
    "q_mix_temperature",
    oracle="""
WITH s AS (
  SELECT source,
         CAST(SUM(len(string_split_regex(trim(text),
                                         '[ \\t\\n\\r\\f\\x0B]+')))
              AS BIGINT) AS n_tokens
  FROM documents
  GROUP BY source
), mx AS (
  SELECT MAX(n_tokens) AS max_tokens FROM s
)
SELECT source, n_tokens,
       round(CAST(n_tokens AS DOUBLE) / max_tokens, 9) AS rel_t1,
       round(sqrt(CAST(n_tokens AS DOUBLE) / max_tokens), 9) AS rel_t2,
       (sqrt(CAST(n_tokens AS DOUBLE) / max_tokens)
        >= CAST(n_tokens AS DOUBLE) / max_tokens) AS tail_upweighted
FROM s CROSS JOIN mx
ORDER BY source
""",
    doc="Temperature-flattened source mixing (T=2, the multilingual/"
    "multi-source sampling scheme of mT5/XLM-R: sample source i "
    "proportional to n_i^(1/T) so low-resource sources are "
    "upweighted): weights are expressed RELATIVE to the largest "
    "source — rel = (n_i/n_max)^(1/T) — so every value is one exact "
    "integer division followed by one IEEE correctly-rounded sqrt, "
    "never a float SUM over irrational weights (a normalized share "
    "Σ-denominator would accumulate partition-order-dependently and "
    "break the cross-engine hash).  The in-query verdict pins the "
    "semantics: T=2 never DOWNweights a source relative to "
    "proportional sampling.  One map-side-combined aggregate + a "
    "1-row max broadcast.",
)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.sum(
            F.size(F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+"))
        ).cast("bigint").alias("n_tokens")
    )
    mx = s.agg(F.max("n_tokens").alias("max_tokens"))
    rel_t1 = F.col("n_tokens").cast("double") / F.col("max_tokens")
    rel_t2 = F.sqrt(rel_t1)
    return (
        s.crossJoin(F.broadcast(mx))
        .select(
            "source",
            "n_tokens",
            F.round(rel_t1, 9).alias("rel_t1"),
            F.round(rel_t2, 9).alias("rel_t2"),
            (rel_t2 >= rel_t1).alias("tail_upweighted"),
        )
        .orderBy("source")
    )


@register(
    "q_linedf_delta_merge",
    oracle="""
WITH d AS (
  SELECT doc_id, source,
         substr(text, 1, 40) || chr(10) ||
         'subscribe to the ' || source || ' newsletter' || chr(10) ||
         substr(text, 41, 40) AS text
  FROM documents
), split_docs AS (
  SELECT doc_id, source, string_split(text, chr(10)) AS lines FROM d
), l AS (
  SELECT DISTINCT doc_id, source, lines[r.i + 1] AS line
  FROM split_docs, UNNEST(range(len(lines))) AS r(i)
)
SELECT source, line, COUNT(*) AS line_docs
FROM l
GROUP BY source, line
HAVING COUNT(*) >= 3
ORDER BY source, line
""",
    doc="Incremental line-document-frequency maintenance for "
    "boilerplate detection (the q_index_delta_merge pattern applied "
    "to the cleaning stack): documents arrive in two batches (doc_id "
    "< 400 = base, >= 400 = delta), each batch builds its own "
    "(source, line, distinct-doc-count) partial, and the partials "
    "merge ADDITIVELY — disjoint doc sets make per-(source,line) "
    "distinct-doc counts summable, so no base text is ever rescanned "
    "when a crawl lands new pages.  The oracle is the FULL rebuild "
    "over all documents: hash equality proves the merge identity.  "
    "Output keeps lines with merged df >= 3 (the emerging-boilerplate "
    "watchlist).  This is the batch-algebra core of a scheduled "
    "incremental q_boilerplate_strip at 100 TB.",
)
def q_linedf_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.concat(
            F.substring("text", 1, 40),
            F.lit("\n"),
            F.concat(
                F.lit("subscribe to the "),
                F.col("source"),
                F.lit(" newsletter"),
            ),
            F.lit("\n"),
            F.substring("text", 41, 40),
        ).alias("text"),
    )

    def _partial(batch):
        return (
            batch.select(
                "doc_id",
                "source",
                F.explode(
                    F.array_distinct(F.split("text", "\n"))
                ).alias("line"),
            )
            .groupBy("source", "line")
            .agg(F.countDistinct("doc_id").alias("line_docs"))
        )

    base = _partial(docs.filter(F.col("doc_id") < 400))
    delta = _partial(docs.filter(F.col("doc_id") >= 400))
    merged = (
        base.unionByName(delta)
        .groupBy("source", "line")
        .agg(F.sum("line_docs").alias("line_docs"))
    )
    return (
        merged.filter(F.col("line_docs") >= 3)
        .orderBy("source", "line")
    )


@register(
    "q_collapse_repeats",
    oracle="""
WITH d AS (
  SELECT doc_id,
         substr(text, 1, 30) || chr(10) ||
         substr(text, 1, 30) || chr(10) ||
         'middle line ' || doc_id || chr(10) ||
         CASE WHEN doc_id % 2 = 0
              THEN 'repeat block' || chr(10) || 'repeat block'
                   || chr(10) || 'repeat block'
              ELSE 'tail line' END AS text
  FROM documents
), lines AS (
  SELECT doc_id, u.i AS line_idx, l[u.i + 1] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS l FROM d),
       UNNEST(range(len(l))) u(i)
), kept AS (
  SELECT doc_id, line_idx, line
  FROM (
    SELECT doc_id, line_idx, line,
           LAG(line) OVER (PARTITION BY doc_id ORDER BY line_idx)
             AS prev
    FROM lines
  )
  WHERE prev IS NULL OR line <> prev
)
SELECT t.doc_id,
       t.n_lines_before,
       k.n_lines_after,
       k.text
FROM (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_before
      FROM lines GROUP BY doc_id) t
JOIN (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_lines_after,
             string_agg(line, chr(10) ORDER BY line_idx) AS text
      FROM kept GROUP BY doc_id) k USING (doc_id)
ORDER BY doc_id
""",
    doc="In-document repetition removal (the C4 repeated-span rule at "
    "line granularity): consecutive duplicate lines collapse to one "
    "occurrence, order preserved — scraped pages repeat headers and "
    "banners back-to-back, and generation models trained on them "
    "learn to loop.  Complements q_boilerplate_strip (cross-document "
    "templates need corpus statistics; THIS rule is a pure "
    "per-document lag window — millions of small groups, no global "
    "state).  The fixture injects a doubled head line and, on even "
    "docs, a tripled block; the oracle mirrors construction and "
    "collapse, pinning both the kept-line accounting and the exact "
    "reassembled text.",
)
def q_collapse_repeats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.clean import collapse_repeated_lines

    docs = load_table(spark, sf_dir, "documents")
    synth = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 30), F.lit("\n"),
            F.substring("text", 1, 30), F.lit("\n"),
            F.lit("middle line "), F.col("doc_id").cast("string"),
            F.lit("\n"),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("repeat block\nrepeat block\nrepeat block"),
            ).otherwise(F.lit("tail line")),
        ).alias("text"),
    )
    return collapse_repeated_lines(synth).orderBy("doc_id")


_CURR_SHARDS, _CURR_BUDGET = 8, 256


def _curriculum_oracle() -> str:
    from .text import _lm_ppl_cte

    return f"""
WITH {_lm_ppl_cte()},
toks AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text),
                                     '[ \\t\\n\\r\\f\\x0B]+'))
              AS BIGINT) AS n_toks
  FROM documents
),
cur AS (
  SELECT b.doc_id, b.bucket,
         b.doc_id % {_CURR_SHARDS} AS shard, t.n_toks
  FROM bucketed b JOIN toks t USING (doc_id)
),
c AS (
  SELECT bucket, shard, doc_id, n_toks,
         CAST(SUM(n_toks) OVER (PARTITION BY bucket, shard
                                ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM cur
)
SELECT bucket, shard,
       (cum - n_toks) // {_CURR_BUDGET} AS pack_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY 1, 2, 3
ORDER BY bucket, shard, pack_id
"""


@register(
    "q_curriculum_pack",
    oracle=_curriculum_oracle(),
    doc="Curriculum-ordered sequence packing — the LM quality filter "
    "composed with the packing stack: documents pack into fixed-"
    f"token-budget ({_CURR_BUDGET}) training rows WITHIN their "
    "head/middle/tail perplexity bucket, so a curriculum schedule "
    "(clean data first, tail last) reads contiguous pack ranges "
    "instead of re-shuffling the corpus per phase.  The running "
    "token count is partitioned by (bucket, doc_id%"
    f"{_CURR_SHARDS}) — the q_sequence_pack scale shape; packs "
    "never span shards, no global-order window.  The oracle "
    "composes the full exact-integer LM chain with the pack "
    "algebra, so bucket assignment AND pack boundaries are pinned "
    "in one verdict.",
)
def q_curriculum_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import lm_perplexity_buckets

    docs = load_table(spark, sf_dir, "documents")
    buckets = lm_perplexity_buckets(docs).select("doc_id", "bucket")
    t = docs.select("doc_id", n_tokens("text").alias("n_toks"))
    cur = buckets.join(t, on="doc_id").select(
        "doc_id",
        "bucket",
        (F.col("doc_id") % _CURR_SHARDS).alias("shard"),
        "n_toks",
    )
    w = (
        Window.partitionBy("bucket", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = cur.withColumn("cum", F.sum("n_toks").over(w))
    return (
        c.select(
            "bucket",
            "shard",
            F.expr(f"(cum - n_toks) div {_CURR_BUDGET}").alias("pack_id"),
            "doc_id",
            "n_toks",
        )
        .groupBy("bucket", "shard", "pack_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("bucket", "shard", "pack_id")
    )


@register(
    "q_group_kfold",
    oracle="""
WITH f AS (
  SELECT doc_id, source, lang,
         CAST(CONCAT('0x',
           substring(md5('fold:' || source), 1, 4)) AS INT) % 5 AS fold
  FROM documents
)
SELECT fold,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       min(source) AS first_source
FROM f
GROUP BY fold
ORDER BY fold
""",
    doc="Leakage-safe GROUP k-fold assignment (SURVEY.md §2.11 splits "
    "family): the fold is a salted-md5 hash of the GROUP key (source), "
    "not the row id, so every document from one source lands in the "
    "same fold — the grouped-CV discipline that keeps near-duplicate "
    "pages from one site out of both train and eval (doc-level "
    "q_train_split cannot guarantee that).  No RNG, reproducible "
    "under any partitioning; the no-leakage invariant (each source in "
    "exactly one fold) is pinned by test_group_kfold_no_leakage.  "
    "Plan: one map-side-combined shuffle on fold; at 100 TB this is "
    "a pure scan-stage expression plus a 5-group aggregate.",
)
def q_group_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("fold:"), F.col("source"))), 1, 4
            ),
            16, 10,
        ).cast("int") % 5
    )
    return (
        docs.select(fold.alias("fold"), "source", "lang")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("source").cast("bigint").alias("n_sources"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
            F.min("source").alias("first_source"),
        )
        .orderBy("fold")
    )


# ---------------------------------------------------------------------------
# Decontamination span scrub — the removal-side companion to
# q_contamination_ngram's detection score.
# ---------------------------------------------------------------------------


def _decontam_scrub_oracle() -> str:
    covered = " OR ".join(
        ["hit"]
        + [f"COALESCE(LAG(hit, {b}) OVER w, FALSE)" for b in range(1, 8)]
    )
    return rf"""
WITH d AS (
  SELECT doc_id,
         string_split_regex(trim(text), '[ \t\n\r\f\x0B]+') AS w,
         substring(md5('contam:' || CAST(doc_id AS VARCHAR)), 1, 1) <= '1'
           AS is_eval
  FROM documents
  WHERE len(string_split_regex(trim(text), '[ \t\n\r\f\x0B]+')) >= 8
), g AS (
  SELECT doc_id, is_eval, CAST(u.i AS BIGINT) AS s,
         array_to_string(w[i:i+7], ' ') AS ngram
  FROM d, UNNEST(range(1, len(w) - 6)) AS u(i)
), eg AS (
  SELECT DISTINCT ngram FROM g WHERE is_eval
), hits AS (
  SELECT g.doc_id, g.s
  FROM g JOIN eg USING (ngram)
  WHERE NOT g.is_eval
), tok AS (
  SELECT doc_id, UNNEST(w) AS tok,
         CAST(UNNEST(range(1, len(w) + 1)) AS BIGINT) AS pos
  FROM d WHERE NOT is_eval
), marked AS (
  SELECT t.doc_id, t.tok, t.pos, h.s IS NOT NULL AS hit
  FROM tok t LEFT JOIN hits h ON h.doc_id = t.doc_id AND h.s = t.pos
), cov AS (
  SELECT doc_id, tok, pos, ({covered}) AS covered
  FROM marked
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN covered THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       md5(COALESCE(string_agg(CASE WHEN NOT covered THEN tok END,
                               ' ' ORDER BY pos), '')) AS kept_md5
FROM cov
GROUP BY doc_id
ORDER BY doc_id
"""


@register(
    "q_decontam_scrub",
    oracle=_decontam_scrub_oracle(),
    doc="Decontamination span SCRUB — the removal side of "
    "q_contamination_ngram's detection: every train-side token covered "
    "by any word-8-gram that also occurs in the eval slice is removed "
    "(the span-level treatment GPT-3/Llama decontamination applies, "
    "rather than dropping whole documents), and the surviving text is "
    "reassembled in order (md5 fingerprint output).  Span cover is "
    "bounded-lookback window algebra (8 lags over the gram-start "
    "marks — the q_span_corruption pattern); candidate marks come "
    "from ONE n-gram equi-join against the distinct eval grams, "
    "linear blocking as always.  At 100 TB the eval gram set is "
    "benchmark-sized (broadcastable) and the scrub is one corpus "
    "pass + one doc_id window.",
)
def q_decontam_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.split(F.trim("text"), r"[ \t\n\r\f\x0B]+").alias("w")
    ).filter(F.size("w") >= 8)
    is_eval = (
        F.substring(
            F.md5(F.concat(F.lit("contam:"), F.col("doc_id").cast("string"))),
            1,
            1,
        )
        <= "1"
    )
    d = d.withColumn("is_eval", is_eval)
    grams = d.select(
        "doc_id",
        "is_eval",
        F.posexplode(
            F.expr(
                "transform(sequence(1, size(w) - 7),"
                " i -> concat_ws(' ', slice(w, i, 8)))"
            )
        ).alias("s0", "ngram"),
    ).withColumn("s", F.col("s0").cast("bigint") + 1)
    eval_g = grams.filter(F.col("is_eval")).select("ngram").distinct()
    hits = (
        grams.filter(~F.col("is_eval"))
        .join(eval_g, "ngram", "semi")
        .select("doc_id", "s")
    )
    tok = d.filter(~F.col("is_eval")).select(
        "doc_id", F.posexplode("w").alias("p0", "tok")
    ).withColumn("pos", F.col("p0").cast("bigint") + 1)
    marked = tok.join(
        hits.withColumnRenamed("s", "pos").withColumn("hit", F.lit(True)),
        ["doc_id", "pos"],
        "left",
    ).withColumn("hit", F.coalesce("hit", F.lit(False)))
    w = Window.partitionBy("doc_id").orderBy("pos")
    covered = F.col("hit")
    for b in range(1, 8):
        covered = covered | F.coalesce(
            F.lag("hit", b).over(w), F.lit(False)
        )
    cov = marked.withColumn("covered", covered)
    kept = F.when(
        ~F.col("covered"),
        F.struct(F.col("pos").alias("pos"), F.col("tok").alias("p")),
    )
    return (
        cov.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.col("covered").cast("bigint")).alias("n_removed"),
            F.md5(
                F.coalesce(
                    F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(kept)),
                            lambda x: x["p"],
                        ),
                        " ",
                    ),
                    F.lit(""),
                )
            ).alias("kept_md5"),
        )
        .orderBy("doc_id")
    )
