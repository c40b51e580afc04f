"""Similarity search over embeddings (SURVEY.md §2.11).

Two paths:
  * ``brute_force_topk`` — exact cosine top-k: broadcast the (small)
    query set against the corpus, rank per query. O(N·Q) but embarrass-
    ingly parallel and shuffle-light (one window shuffle on query_id).
    The correctness baseline.
  * ``lsh_topk`` — sign-bucket LSH: corpus and queries bucketed by the
    sign pattern of leading dimensions; candidates limited to the
    query's bucket. At 100 TB the bucket join replaces the cross join,
    cutting candidates by ~2^n_bits, at a recall cost measured by
    comparing against the brute-force path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine, sign_bucket


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k for each query vector.

    ``queries`` is expected to be tiny (it is explicitly broadcast);
    ranking uses (rounded cosine DESC, vec_id) so ties and float jitter
    below 1e-6 break deterministically.
    """
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    sims = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), round_digits),
        )
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def embedding_cosine_neardup(
    corpus: DataFrame,
    threshold: float = 0.35,
    n_bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (SURVEY.md §2.11): candidates
    from the same sign bucket (equi-join, linear), verified by exact
    cosine ≥ threshold. The LSH recall/threshold trade-off is the same
    one MinHash makes for text — here over dense vectors."""
    c = corpus.select(
        "vec_id",
        F.col("embedding"),
        sign_bucket("embedding", n_bits).alias("bucket"),
    )
    a, b = c.alias("a"), c.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .withColumn(
            "cosine",
            F.round(
                cosine(F.col("a.embedding"), F.col("b.embedding")),
                round_digits,
            ),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.vec_id").alias("vec_id_a"),
            F.col("b.vec_id").alias("vec_id_b"),
            "cosine",
        )
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_bits: int = 8,
    round_digits: int = 6,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. Equi-join on the bucket key → hash-partitioned, linear."""
    c = corpus.withColumn("bucket", sign_bucket("embedding", n_bits))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        sign_bucket("embedding", n_bits).alias("bucket"),
    )
    sims = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            F.round(cosine(F.col("q_emb"), F.col("embedding")), round_digits),
        )
        .select("query_id", "vec_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )
