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
# FIRST (in this order); the rest follow in definition order.  Round 6
# front-loads (a) the eight queries whose latest driver verdict is r3 —
# two rounds stale, displaced by round 5's eleven new surfaces — then
# (b) queries new or changed this round (real WAV/AVI media decode,
# IVF-PQ composed ANN, persisted-codebook PQ, SCD-2, the six TPC-H
# join/agg shapes, MERGE upsert, anomaly/heavy-hitters/sessionize),
# then (c) names whose latest verdict is r4, oldest exposure first.
_PRIORITY: list[str] = [
    # latest verdict r3 — two rounds stale, refresh first
    "q_train_split",
    "q_embedding_norms",
    "q_pii_scrub",
    "q_repetition_quality",
    "q_stratified_sample",
    "q_media_probe",
    "q_kmeans_centroids",
    "q_ann_ivf_kmeans",
    # round-6 new or changed — need a first/fresh driver verdict
    "q_audio_features",
    "q_video_features",
    "q_ann_ivfpq",
    "q_ivfpq_recall",
    "q_ann_ivfpq_res",
    "q_ivfpq_res_recall",
    "q_pq_codebooks",
    "q_pq_topk",
    "q_pq_recall",
    "q_scd2_history",
    "q_dedup_incremental",
    "q_quota_sample",
    "q_jsonl_ingest",
    "q_funnel",
    "q_cohort_retention",
    "q4_priority_exists",
    "q10_returned_revenue",
    "q12_priority_class",
    "q14_promo_revenue",
    "q18_large_orders",
    "q19_disjunctive_pred",
    "q_merge_upsert",
    "q_anomaly_p99",
    "q_heavy_hitters",
    "q_sessionize",
    "q_agg_delta_update",
    "q_sample_estimate",
    # round-6 second batch: the correlated-subquery TPC-H family
    "q7_nation_volume",
    "q8_market_share",
    "q13_order_distribution",
    "q15_top_supplier",
    "q16_supplier_cnt",
    "q17_small_qty_revenue",
    "q20_qty_threshold_semi",
    "q22_idle_customers",
    # round-6 third batch: retrieval stack, real PNG resize, graph +
    # sub-document dedup + the q21 rewrite
    "q_inverted_index",
    "q_tfidf_topterms",
    "q_bm25",
    "q_image_resize",
    "q_pagerank",
    "q21_sole_late_supplier",
    "q_chunk_dedup",
    "q_linreg",
    "q_histogram",
    # The whole r4-latest block ages one more round this time — the 17
    # round-6 TPC-H/retrieval/graph/media queries above need first
    # verdicts and the budget is hard.  Thirteen round-6 queries exceed
    # even this budget and are deliberately deferred to round 7's
    # front-load (all full-local-gate green this session):
    # q2_min_cost_supplier, q9_product_profit, q11_important_share,
    # q_zorder_cells, q_bpe_merges, q_bpe_apply, q_index_delta_merge,
    # q_cms_estimate, q_gap_interp, q_outlier_mad, q_pit_join,
    # q_ab_test, q_entity_resolution
    # (q_bpe_merges and q_pagerank are additionally benched every
    # round, so their values are exercised at sf0.1 regardless).
    # Every r4 name (q_xpath_links, q_csv_clean_prod, q_excel_fleet,
    # q_clean_pipeline, q_notin_filter, q_era_branch, q_value_diff,
    # q_changelog_pair_diff, q_semi_join, q_anti_join, q_asof_join,
    # q_range_join, q_interval_join, q_schema_diff_flat,
    # q_latest_per_key, q_dedup_exact, q_ngram_jaccard) is pytest- or
    # golden-test-pinned, q_dedup_exact and q_excel_fleet are benched
    # every round, and all pass the full local gate this session —
    # front-load them in round 7.
    # q_rollup / q_cube / q_grouping_sets / q_percentiles /
    # q_moving_avg / q_topk_window / q_unpivot / q_json_struct /
    # q_token_freq / q_argminmax / q_grouped_agg /
    # q5_revenue_by_region were displaced by the new round-6
    # queries: all are single-statement grouping/reshape variants whose
    # semantics pytest pins directly (q_topk_window and q_moving_avg
    # additionally plan-test-pinned), and q5 is benched every round —
    # lowest staleness risk of the r4 block.
    # q_text_stats / q_quality_score / q_lang_stats / q_langid_confusion
    # / q_fingerprint / q1_pricing_summary / q3_shipping_priority /
    # q6_forecast_revenue age to r4-latest this round: they are benched
    # every round (TPC-H, q_text_stats) or single-expression
    # projections whose semantics pytest pins directly, so staleness
    # risk is lowest of the r4 set
    # (the 52-slot budget is enforced by test_priority_queries_yield_first).
    # Everything r5-verified follows in definition order; with ~50 slots
    # the r5-green set ages to two rounds at worst before rotating back.
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
