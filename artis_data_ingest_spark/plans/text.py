"""Text-analysis queries over documents (SURVEY.md §2.11 extensions):
token counting, quality scoring, language-ID heuristic, fingerprinting,
exact + n-gram-Jaccard dedup.

All implementations are built-in Catalyst expressions (no Python in the
hot path); the oracle SQL mirrors each computation step-for-step so the
cross-engine hash check is exact (integer counts, or doubles produced by
identical IEEE ops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.textstats import (
    QUALITY_STOPWORDS,
    STOPWORDS,
    fingerprint,
    n_alnum_chars,
    n_tokens,
    predicted_lang,
    regex_token_count,
    stopword_hits,
)
from ..operators.dedup import exact_dedup, ngram_jaccard_pairs
from ..sources.tables import load_table
from .llm import portable_minhash_ctes
from .registry import register


@register(
    "q_text_stats",
    oracle="""
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       length(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g')) AS n_alnum,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))
         AS n_regex_tokens,
       n_chars
FROM documents
ORDER BY doc_id
""",
    doc="Per-document token/char statistics: whitespace tokens, alnum "
    "chars, BPE-ish regex token count (SURVEY.md §2.11 text analysis).",
    bench=True,
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        n_alnum_chars("text").alias("n_alnum"),
        regex_token_count("text").alias("n_regex_tokens"),
        "n_chars",
    ).orderBy("doc_id")


@register(
    "q_quality_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_filter(toks, x -> x IN
           ({", ".join(repr(w) for w in QUALITY_STOPWORDS)}))) AS stop_hits,
       len(list_filter(toks, x -> x IN
           ({", ".join(repr(w) for w in QUALITY_STOPWORDS)})))
         / len(toks) AS stop_ratio
FROM t
ORDER BY doc_id
""",
    doc="Quality scoring: stopword-hit ratio per document "
    "(SURVEY.md §2.11). Higher-order array filter, no UDF.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = stopword_hits("text", QUALITY_STOPWORDS)
    return docs.select(
        "doc_id",
        n_tokens("text").alias("n_tokens"),
        hits.alias("stop_hits"),
        (hits / n_tokens("text")).alias("stop_ratio"),
    ).orderBy("doc_id")


@register(
    "q_lang_stats",
    oracle="""
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
FROM documents
GROUP BY lang
ORDER BY lang
""",
    doc="Language-filter rollup (SURVEY.md §2.11): grouped counts and "
    "exact integer sums surfaced as deterministic averages.",
)
def q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias(
                "avg_chars"
            ),
        )
        .orderBy("lang")
    )


def _langid_oracle() -> str:
    def hits(lang: str) -> str:
        words = ", ".join(repr(w) for w in STOPWORDS[lang])
        return f"len(list_filter(toks, x -> x IN ({words}))) AS hits_{lang}"

    langs = sorted(STOPWORDS)  # fold order must match predicted_lang()
    first = langs[0]
    sel_lang, sel_hits = f"'{first}'", f"hits_{first}"
    for lang in langs[1:]:
        sel_lang = (
            f"CASE WHEN hits_{lang} > {sel_hits} THEN '{lang}' "
            f"ELSE {sel_lang} END"
        )
        sel_hits = (
            f"CASE WHEN hits_{lang} > {sel_hits} THEN hits_{lang} "
            f"ELSE {sel_hits} END"
        )
    return f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), h AS (
  SELECT doc_id, lang, {", ".join(hits(lg) for lg in langs)}
  FROM t
)
SELECT lang,
       CASE WHEN {sel_hits} > 0 THEN {sel_lang} ELSE 'und' END AS predicted,
       COUNT(*) AS n
FROM h
GROUP BY 1, 2
ORDER BY lang, predicted
"""


@register(
    "q_langid_confusion",
    oracle=_langid_oracle(),
    doc="Heuristic language-ID (stopword-overlap argmax, deterministic "
    "tie-break) rolled up into a label-vs-predicted confusion matrix "
    "(SURVEY.md §2.11). The oracle replicates the argmax fold exactly.",
)
def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", predicted_lang("text").alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@register(
    "q_dedup_exact",
    oracle="""
SELECT md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp,
       MIN(doc_id) AS keep_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
ORDER BY keep_doc_id
""",
    doc="Exact dedup via normalized md5 fingerprint group-by: canonical "
    "doc per fingerprint + copy count (SURVEY.md §2.11). At 100 TB this "
    "is one hash-partitioned shuffle on the fingerprint.",
    bench=True,
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup(docs).orderBy("keep_doc_id")


@register(
    "q_ngram_jaccard",
    oracle=f"""{portable_minhash_ctes()},
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM b x JOIN b y ON x.band = y.band AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b, jaccard FROM (
  SELECT c.a AS doc_id_a, c.b AS doc_id_b,
         len(list_intersect(sa.shingles, sb.shingles))
           / (len(sa.shingles) + len(sb.shingles)
              - len(list_intersect(sa.shingles, sb.shingles))) AS jaccard
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.a
  JOIN sh sb ON sb.doc_id = c.b
)
WHERE jaccard >= 0.5
ORDER BY doc_id_a, doc_id_b
""",
    doc="3-gram Jaccard near-dup pairs with content-based blocking "
    "(SURVEY.md §2.11): candidates from the portable-MinHash LSH band "
    "buckets (pairs found at arbitrary doc_id distance — a real "
    "similarity block, not id adjacency), verified with exact shingle-"
    "set Jaccard >= 0.5. Linear candidate generation; the wide shingle "
    "arrays stay out of the candidate shuffle and join back once for "
    "the verify step.",
)
def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs).orderBy("doc_id_a", "doc_id_b")


@register(
    "q_fingerprint",
    oracle="""
SELECT doc_id,
       md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS fp
FROM documents
ORDER BY doc_id
""",
    doc="Per-document whitespace/punct-invariant fingerprint "
    "(SURVEY.md §2.11 document fingerprinting).",
)
def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint("text").alias("fp")).orderBy(
        "doc_id"
    )
