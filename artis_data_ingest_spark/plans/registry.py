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
# FIRST (in this order); the rest follow in definition order.  Round 7
# front-loads (a) the 17 queries that have NEVER received a driver
# verdict (the deliberately budget-deferred round-6 batch — all local
# full-gate green in rounds 6 and 7), then (b) queries new in round 7,
# then (c) the r4-stale names with the weakest non-driver coverage.
_PRIORITY: list[str] = [
    # (a) never driver-checked — first verdicts, highest leverage
    "q2_min_cost_supplier",
    "q9_product_profit",
    "q11_important_share",
    "q_zorder_cells",
    "q_bpe_merges",
    "q_bpe_apply",
    "q_bpe_vocab",
    "q_index_delta_merge",
    "q_cms_estimate",
    "q_gap_interp",
    "q_outlier_mad",
    "q_pit_join",
    "q_ab_test",
    "q_entity_resolution",
    "q_video_resize",
    "q_linreg",
    "q_histogram",
    # (b) new in round 7 — need a first driver verdict
    "q_jsonl_gz_ingest",
    "q_unicode_norm",
    "q_ann_ivf_kmeans",  # impl changed r7: persisted-centroid serving path
    "q_jpeg_features",
    "q_boilerplate_strip",
    "q_orc_roundtrip",
    "q_webdataset_roundtrip",
    "q_containment_pairs",
    "q_k_anonymity",
    "q_zscore_normalize",
    "q_feature_hash",
    "q_wds_multimodal",
    "q_gopher_rules",
    "q_hybrid_rrf",
    "q_kwic_snippets",
    "q_mix_temperature",
    "q_containment_blocked",
    "q_higher_moments",
    "q_feature_vectors",
    "q_linedf_delta_merge",
    # (c) latest verdict r4 — three rounds stale.  Ordered: names with
    # no bench exposure and no direct pytest value pin first.  The r4
    # names deferred to round 8 are the benched-every-round set
    # (q1/q3/q5/q6, q_text_stats, q_dedup_exact, q_excel_fleet,
    # q_corpus_pipeline — exercised at sf0.1 each round) and the
    # single-statement grouping/reshape variants whose semantics
    # pytest pins directly (q_rollup, q_cube, q_grouping_sets,
    # q_percentiles, q_moving_avg, q_topk_window, q_unpivot,
    # q_json_struct, q_token_freq, q_argminmax, q_grouped_agg).
    "q_xpath_links",
    "q_csv_clean_prod",
    "q_clean_pipeline",
    "q_notin_filter",
    "q_era_branch",
    "q_value_diff",
    "q_changelog_pair_diff",
    "q_semi_join",
    "q_anti_join",
    "q_asof_join",
    "q_range_join",
    "q_interval_join",
    "q_latest_per_key",
    "q_ngram_jaccard",
    "q_fuzzy_match",
    # (52-slot budget enforced by test_priority_queries_yield_first;
    # q_salted_agg, q_monthly_orders, q_file_sizes, q_union_evolved,
    # q_try_cast, q_json_extract, q_quality_score, q_langid_confusion,
    # q_lang_stats, q_fingerprint, q_schema_diff_flat (exact values
    # pinned by tests/test_plans.py), q_asof_forward (operator shared
    # with the front-loaded q_asof_join, both direction-pinned by
    # tests) — all pytest-pinned — plus q5/q1 etc. and the pinned reshape
    # variants rotate back round 8.)
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
