"""Central query registry backing the driver contract.

Every operator claimed in SURVEY.md §2 is registered here as a named
query ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible) a
DuckDB-runnable oracle SQL string. ``__spark_entry__.py`` re-exports
``queries()`` / ``oracle_sql()`` from this module.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → rows-only check
    doc: str = ""
    bench: bool = field(default=False)  # include in bench.py headline set


_REGISTRY: dict[str, Query] = {}

# The external correctness driver checks at most ~50 queries per round, in
# the order ``queries()`` yields them.  To keep every registered query's
# latest driver verdict at most ~2 rounds old, names listed here are yielded
# FIRST (in this order); the rest follow in definition order.  Round 5
# front-loads (a) queries that are new or changed this round —
# q_pq_codebooks / q_pq_topk / q_pq_recall (product-quantization ANN),
# q_contamination_ngram / q_corpus_shuffle / q_source_mix_weights /
# q_doc_chunks / q_dq_report (new training-pipeline and data-quality
# ops), q_sequence_pack (now the
# shard-partitioned form; the global-order twin is registered as
# q_sequence_pack_global), q_media_features (now decodes real PNG media
# via the stdlib codec with a closed-form oracle), and q_lag_gap (fixed
# TIMESTAMP_NTZ handling; its r3 driver verdict predates the regression)
# — then (b) the queries whose latest driver verdict is r3, so
# CORRECTNESS_r05 re-verifies what r04's 50-slot cap missed (eight
# stable r3-green queries overflow to the definition-order tail; their
# latest verdict ages to 3 rounds, the cost of fresh verdicts for the
# eight new round-5 surfaces).
_PRIORITY: list[str] = [
    # round-5 new or changed — need a fresh driver verdict
    "q_pq_codebooks",
    "q_pq_topk",
    "q_pq_recall",
    "q_contamination_ngram",
    "q_corpus_shuffle",
    "q_source_mix_weights",
    "q_doc_chunks",
    "q_dq_report",
    "q_sequence_pack",
    "q_sequence_pack_global",
    "q_media_features",
    "q_lag_gap",
    # latest verdict r3 — rotate back in
    "q_scraper_links",
    "q_changelog_e2e",
    "q_changelog_files",
    "q_file_inventory",
    "q_excel_clean",
    "q_zip_ingest",
    "q_dataset_diff",
    "q_fullouter_align",
    "q_pivot_align",
    "q_slugify_key",
    "q_extract_version",
    "q_distinct",
    "q_union_tag",
    "q_union_names",
    "q_except_distinct",
    "q_intersect",
    "q_exists_any",
    "q_count_distinct",
    "q_approx_distinct",
    "q_approx_percentile",
    "q_running_sum",
    "q_daily_rollup",
    "q_date_spine",
    "q_tumbling_window",
    "q_sliding_window",
    "q_session_window",
    "q_minhash_portable",
    "q_minhash_portable_stats",
    "q_minhash_neardup",
    "q_simhash_portable",
    "q_simhash_neardup",
    "q_dup_clusters",
    "q_embedding_neardup",
    "q_embedding_quantize",
    "q_cosine_topk",
    "q_pandas_cosine_topk",
    "q_ann_signbucket",
    "q_ann_ivf",
    # q_ann_ivf_kmeans / q_kmeans_centroids / q_stratified_sample /
    # q_train_split /
    # q_media_probe / q_pii_scrub / q_repetition_quality /
    # q_embedding_norms rotate to the definition-order tail this round:
    # all r3-green, displaced by the new round-5 queries above
]


def _ordered_names() -> list[str]:
    missing = [n for n in _PRIORITY if n not in _REGISTRY]
    if missing:  # a typo here silently loses its front-loading — be loud
        import warnings

        warnings.warn(
            f"_PRIORITY names not in registry: {missing}", stacklevel=2
        )
    head = [n for n in _PRIORITY if n in _REGISTRY]
    head_set = set(head)
    rest = [n for n in _REGISTRY if n not in head_set]
    return head + rest


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        n: _REGISTRY[n].oracle
        for n in _ordered_names()
        if _REGISTRY[n].oracle is not None
    }


def all_queries() -> dict[str, Query]:
    return {n: _REGISTRY[n] for n in _ordered_names()}


def bench_queries() -> dict[str, QueryFn]:
    return {n: _REGISTRY[n].fn for n in _ordered_names() if _REGISTRY[n].bench}
