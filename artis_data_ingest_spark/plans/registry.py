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
# the order ``queries()`` yields them.  To get every registered query a hard
# driver signal across rounds, names listed here are yielded FIRST (in this
# order); the rest follow in definition order.  Round 2 front-loads the 33
# queries the r1 driver never reached plus the 5 whose oracles were re-typed
# (CAST(SUM(...) AS BIGINT)) and this round's new queries, so CORRECTNESS_r02
# covers everything CORRECTNESS_r01 could not.
_PRIORITY: list[str] = [
    # round-2 new / re-typed oracles — need a fresh driver verdict
    "q_sequence_pack_sharded",
    "q_excel_clean",
    "q_ngram_jaccard",
    "q_file_inventory",
    "q_json_struct",
    "q_try_cast",
    "q_json_extract",
    "q_corpus_pipeline",
    "q_sequence_pack",
    # driver-unchecked in round 1 (registry positions 51..83)
    "q_notin_filter",
    "q_clean_pipeline",
    "q_dataset_diff",
    "q_csv_clean_prod",
    "q_xpath_links",
    "q_union_evolved",
    "q_changelog_files",
    "q_changelog_pair_diff",
    "q_salted_agg",
    "q_asof_join",
    "q_token_freq",
    "q_argminmax",
    "q_monthly_orders",
    "q_era_branch",
    "q_asof_forward",
    "q_text_stats",
    "q_quality_score",
    "q_lang_stats",
    "q_langid_confusion",
    "q_dedup_exact",
    "q_fingerprint",
    "q1_pricing_summary",
    "q5_revenue_by_region",
    "q_grouped_agg",
    "q_semi_join",
    "q_anti_join",
    "q_topk_window",
    "q_rollup",
    "q_cube",
    "q_approx_distinct",
    "q3_shipping_priority",
    "q6_forecast_revenue",
]


def _ordered_names() -> list[str]:
    head = [n for n in _PRIORITY if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in set(head)]
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
