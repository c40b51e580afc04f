"""Query plan modules. Importing this package populates the registry."""

from . import events_time, llm, reference_core, text, tpch  # noqa: F401
from .registry import all_queries, bench_queries, oracle_sql, queries

__all__ = ["all_queries", "bench_queries", "oracle_sql", "queries"]
