"""Vector math over array<float> embedding columns — pure Catalyst
higher-order functions, no UDFs (SURVEY.md §2.11 similarity search).

Float elements are cast to double *before* any arithmetic so products
are exact IEEE ops, and folds run sequentially left-to-right — the same
evaluation the DuckDB oracle performs — making cosine similarities
bit-comparable across engines.

Scale note: brute-force cosine top-k is a cross join — O(N·Q). It is
the correctness baseline; `operators/similarity.py` provides the LSH-
bucketed variant whose candidate set is O(N·Q / buckets) for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(col: str | Column) -> Column:
    return F.transform(_c(col), lambda x: x.cast("double"))


def dot(a: str | Column, b: str | Column) -> Column:
    """Sequential-fold dot product: zip_with multiply, then left fold."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(col: str | Column) -> Column:
    v = as_double(col)
    sq = F.aggregate(
        F.zip_with(v, v, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    return F.sqrt(sq)


def cosine(a: str | Column, b: str | Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bucket(col: str | Column, n_bits: int = 8) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: the sign pattern of the
    first ``n_bits`` dimensions, packed into a string key. Embedding
    dims of a trained model are approximately isotropic, so this splits
    the corpus into ~2^n_bits buckets; cosine-similar vectors agree on
    most signs and land in the same bucket with high probability."""
    bits = F.transform(
        F.slice(_c(col), 1, n_bits),
        lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
    )
    return F.array_join(bits, "")
