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
    # ---- round-13 rotation (VERDICT r12 task 7: keep the rotation
    # going; front-load the r13 additions plus the oldest-verdict
    # block, with >=10 names absent from CORRECTNESS_r8-r12).  The
    # whole r12 head rotates OUT (every name in it got a fresh green
    # driver verdict in CORRECTNESS_r12); most of the names below
    # have NEVER been driver-sampled since r8 — the sample was frozen
    # r8-r11, so most of the registry's verdicts date to r7 or
    # earlier.  All 52 are local-gate green at sf0.01 this round
    # (full gate 305/305).
    #
    # (a) new in r13 / implementation or fixtures touched in r13
    # (the first eight are brand-new lakehouse/CDC queries — every
    # one needs its FIRST driver verdict)
    "q_version_constraints",  # new: CHECK constraints + quarantine
    "q_version_rename",       # new: column mapping (rename/drop)
    "q_replace_where",        # new: selective overwrite (replaceWhere)
    "q_datasource_write",     # new: DataSource write path
    "q_version_rowcount",     # new: metadata-only COUNT(*)
    "q_cdc_incremental_agg",  # new: retraction-aware MV refresh
    "q_cdc_stream",           # new: CDF as a streaming source
    "q_version_pushdown",     # new: DataSource filter pushdown
    "q_version_checkpoint",   # new: manifest-log checkpointing
    "q_pdf_ingest",           # + secure-rc4/secure-aes decryption fixtures
    "q_pdf_modern",           # + modern-rc4 (encrypted 1.5) fixture
    "q_docx_ingest",          # + notes.docx (endnotes, nested text box)
    "q_feed_driven_dedup",    # persisted band index
    "q_version_zorder",       # zvalue -> zvalue_n delegation
    "q_time_travel",          # version walks via checkpoint summaries
    "q_change_feed",          # earliest_feed_version via summaries
    "q_feed_driven_index",
    "q_agg_delta_update",
    # (b) r11/r12 queries that never received a driver verdict (the
    # r12 head took the four newest; these waited)
    "q_version_clone",
    "q_version_compact",
    "q_version_diff",
    "q_version_skipping",
    "q_version_upsert",
    "q_version_schema_evolve",
    "q_secret_scan",
    "q_mp4_tracks",
    "q_mp4_metadata",
    "q_mp3_metadata",
    "q_h264_metadata",
    # (c) benched-every-round heavies that nonetheless never appeared
    # in a driver sample — bench pins their latency, the driver
    # should pin their values at least once
    "q_bigram_ppl_buckets",
    "q_pagerank",
    "q_kcore",
    "q_minhash_portable_stats",
    "q_text_stats",
    # (d) the r8 deliberate deferrals, finally rotating in
    "q_topk_window",
    "q1_pricing_summary",
    # (e) TPC-H names whose last driver verdict predates r8
    "q2_min_cost_supplier",
    "q4_priority_exists",
    "q7_nation_volume",
    # (f) one never-sampled representative per major family (dedup,
    # ANN, retrieval, text-curation, packing, media, CDC) so every
    # family regains at least one fresh driver verdict this round
    "q_minhash_neardup",
    "q_simhash_neardup",
    "q_embedding_neardup",
    "q_ann_ivfpq",
    "q_ivfpq_recall",
    "q_bm25",
    "q_inverted_index",
    "q_version_delete",
    "q_deletion_feed",
    "q_version_update",
    "q_cdc_feed",
    "q_merge_dv",
    "q_xls_ingest",
    # (52-slot budget enforced by test_priority_queries_yield_first;
    # the r12 head — q_time_travel_ts, q_version_restore, the r8
    # blocks — rotated out with fresh r12 verdicts on record)
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
