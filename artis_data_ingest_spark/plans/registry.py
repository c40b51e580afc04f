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
# FIRST (in this order); the rest follow in definition order.  Round 8
# front-loads (a) queries new in round 8, (b) queries whose
# implementation was touched in round 8, (c) the ENTIRE r4-stale block
# (closing the round-7 verdict's freshness ledger), then (d) the
# weakest-covered r5 names up to the budget.
_PRIORITY: list[str] = [
    # ---- round-14 rotation (VERDICT r13 task 8: full-disjoint
    # rotation is the standard; front-load the pushdown-fix proof +
    # r14 additions/touches, then the largest block of NEVER-sampled
    # names).  The whole r13 head rotates OUT (49/50 green verdicts
    # in CORRECTNESS_r13; its one red row, q_version_pushdown, leads
    # THIS head so the driver re-proves the r14 fix).  Everything
    # from (c) on has never appeared in any CORRECTNESS_r* sample —
    # 70 such names existed entering r14; this head takes the first
    # 45 in registry order, the next rounds take the rest.
    #
    # (a) the r13 red row + its latently-broken sibling — the r14
    # session-conf fix must be proven under the DRIVER's session
    "q_version_pushdown",
    "q_version_source",
    # (b) new in r14 / implementation touched in r14 (cdc_feed's
    # exact full-rewrite decomposition changed the code under the
    # first two; q_version_sql is the new SQL-surface query)
    "q_version_sql",
    "q_cdc_feed",
    "q_cdc_incremental_agg",
    "q_feed_driven_dedup_stats",
    "q_tiff_features",
    "q_version_convert",
    "q_audio_g711",
    "q_avro_roundtrip",
    "q_delta_interop",
    "q_iceberg_read",
    "q_delta_incremental",
    "q_iceberg_incremental",
    "q_delta_export",
    "q_lake_federation",
    "q_audio_adpcm",
    "q_png_formats",
    "q_hudi_read",
    "q_mbox_ingest",
    "q_delta_stream",
    "q_iceberg_export",
    "q_delta_cdf",
    "q_xml_ingest",
    "q_iceberg_stream",
    "q_flac_audio",
    "q_subtitle_ingest",
    "q_ogg_metadata",
    "q_epub_ingest",
    "q_id3_tags",
    "q_tar_members",
    "q_notebook_ingest",
    "q_config_ingest",
    # (c) the two r13-head names that missed the 50-row cut
    "q_merge_dv",
    "q_xls_ingest",
    # (d) never-driver-sampled names, registry order
    "q_score_auc",
    "q_l_diversity",
    "q_exact_quantiles",
    "q_soundex_blocking",
    "q_hll_incremental",
    "q_fd_discovery",
    "q_sorted_neighborhood",
    "q_pareto_skyline",
    "q_global_skyline",
    "q_cms_incremental",
    "q_quantile_sketch",
    "q_nb_classifier",
    "q_ivfpq_incremental",
    "q_ivfpq_res_incremental",
    "q_minhash_recall_eval",
    "q_matryoshka_recall",
    "q_dedup_policy",
    # (52-slot budget enforced by test_priority_queries_yield_first;
    # still never sampled after this head: q_minhash_incremental,
    # q_pca_power,
    # q_golden_record,
    # q_robots_policy,
    # q_char_entropy,
    # q_group_kfold,
    # q_decontam_scrub,
    # q_ewma_decay,
    # q_holt_forecast,
    # q_trimmed_mean,
    # q_seasonal_decompose,
    # q_theil_sen,
    # q_webgraph_rank,
    # q_clustering_coeff,
    # q_label_spread,
    # q_pagerank_resume,
    # q_shortest_paths,
    # q_bmp_features,
    # q_image_dhash, q_exif_metadata, q_exif_normalize,
    # q_fwf_ingest, q_span_corruption, q_pmi_collocations, and
    # q_fim_transform through q_wordpiece_apply — the r15 head's
    # (d) block)
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
