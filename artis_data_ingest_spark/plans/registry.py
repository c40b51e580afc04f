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
# FIRST (in this order); the rest follow in definition order.  Round 4
# front-loads (a) queries whose semantics changed this round
# (q_sequence_pack now sharded-by-default, q_media_features now a real
# stdlib PNG decode with a by-construction oracle, the new executor-side
# Excel fleet query) and (b) all 46 queries whose latest driver verdict is
# r1/r2 — CORRECTNESS_r04 re-verifies everything r03's 50-slot cap missed.
_PRIORITY: list[str] = [
    # round-4 new or changed — need a fresh driver verdict
    "q_media_features",
    "q_excel_fleet",
    "q_sequence_pack",
    "q_sequence_pack_sharded",
    # latest verdict r1/r2 — rotate back in
    "q1_pricing_summary",
    "q5_revenue_by_region",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q_grouped_agg",
    "q_semi_join",
    "q_anti_join",
    "q_topk_window",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_percentiles",
    "q_moving_avg",
    "q_rank_family",
    "q_text_stats",
    "q_quality_score",
    "q_lang_stats",
    "q_langid_confusion",
    "q_dedup_exact",
    "q_ngram_jaccard",
    "q_fingerprint",
    "q_json_extract",
    "q_json_struct",
    "q_try_cast",
    "q_salted_agg",
    "q_asof_join",
    "q_asof_forward",
    "q_range_join",
    "q_token_freq",
    "q_argminmax",
    "q_monthly_orders",
    "q_era_branch",
    "q_notin_filter",
    "q_clean_pipeline",
    "q_csv_clean_prod",
    "q_xpath_links",
    "q_union_evolved",
    "q_changelog_pair_diff",
    "q_schema_diff_flat",
    "q_file_sizes",
    "q_value_diff",
    "q_unpivot",
    "q_latest_per_key",
    "q_corpus_pipeline",
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
