"""Query plan modules. Importing this package populates the registry."""

from . import (  # noqa: F401
    analytics_ext,
    classify,
    corpus,
    events_time,
    graph,
    llm,
    pipeline,
    pretrain,
    reference_core,
    retrieval,
    scale_ops,
    selection,
    sharding,
    suffix,
    text,
    tpch,
    tpch_ext,
    tpch_sub,
    unigram,
    wordpiece,
)
from .registry import all_queries, bench_queries, oracle_sql, queries

__all__ = ["all_queries", "bench_queries", "oracle_sql", "queries"]
