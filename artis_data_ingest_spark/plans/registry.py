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
    # ---- round-15 rotation (full-disjoint rotation is the standard;
    # front-load r15 additions and implementation-touched names, then
    # the next block of NEVER-sampled names).  The whole r14 head
    # rotates OUT (50/50 green in CORRECTNESS_r14).
    #
    # (a) new in r15 (13): the r14 verdict task list (Delta DV
    # read/write, Iceberg equality deletes + partitioned writes +
    # position-delete writes, Hudi MOR/incremental/export/stream,
    # format-blind lake SQL) plus the new sources (SQLite, Arrow
    # IPC, feeds, parquet footers)
    "q_delta_dv_read",
    "q_iceberg_eq_deletes",
    "q_iceberg_partitioned",
    "q_hudi_mor",
    "q_lake_sql",
    "q_hudi_incremental",
    "q_iceberg_delete",
    "q_sqlite_ingest",
    "q_arrow_ipc",
    "q_feed_ingest",
    "q_hudi_export",
    "q_parquet_footer",
    "q_hudi_stream",
    "q_tfrecord_roundtrip",
    # (b) implementation touched in r15 (delta.py: change-feed gap
    # refusal, dataChange=false skip, checkpoint DV fidelity, vacuum
    # retention, DV write path; iceberg.py: append schema gate,
    # equality-delete scoping, partition specs; hudi.py: MOR merge;
    # both streaming feeds)
    "q_delta_interop",
    "q_delta_incremental",
    "q_delta_cdf",
    "q_delta_stream",
    "q_delta_export",
    "q_iceberg_read",
    "q_iceberg_incremental",
    "q_iceberg_stream",
    "q_iceberg_export",
    "q_hudi_read",
    "q_lake_federation",
    # (c) the two r14-head names that missed the 50-row cut
    "q_matryoshka_recall",
    "q_dedup_policy",
    # (d) never-driver-sampled names, registry order
    "q_minhash_incremental",
    "q_pca_power",
    "q_golden_record",
    "q_robots_policy",
    "q_char_entropy",
    "q_group_kfold",
    "q_decontam_scrub",
    "q_ewma_decay",
    "q_holt_forecast",
    "q_trimmed_mean",
    "q_seasonal_decompose",
    "q_theil_sen",
    "q_webgraph_rank",
    "q_clustering_coeff",
    "q_label_spread",
    "q_pagerank_resume",
    "q_shortest_paths",
    "q_bmp_features",
    "q_image_dhash",
    "q_exif_metadata",
    "q_exif_normalize",
    "q_fwf_ingest",
    "q_span_corruption",
    "q_pmi_collocations",
    "q_vocab_growth",
    # (52-slot budget enforced by test_priority_queries_yield_first;
    # still never sampled after this head — the r16 (d) block:
    # q_source_overlap, q_cdc_chunks, q_length_buckets, q_fim_transform, q_mlm_mask, q_sitemap_urls,
    # q_tokenizer_fertility, q_retrieval_metrics, q_weighted_sample,
    # q_preference_pairs,
    # q_lm_greedy_decode, q_hrw_reshard, q_bloom_membership,
    # q_global_rank, q_merkle_manifest, q_manifest_diff,
    # q_manifest_incremental, q_longest_repeat,
    # q_longest_repeat_doubling, q_longest_repeat_long,
    # q_cross_doc_repeat, q_unigram_segment, q_unigram_apply,
    # q_wordpiece_merges, q_wordpiece_apply — plus every r15
    # addition made after this head was written)
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
