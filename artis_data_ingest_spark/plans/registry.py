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


def register(name: str, oracle: str | None = None, doc: str = "", bench: bool = False):
    """Decorator registering a query under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {n: q.oracle for n, q in _REGISTRY.items() if q.oracle is not None}


def all_queries() -> dict[str, Query]:
    return dict(_REGISTRY)


def bench_queries() -> dict[str, QueryFn]:
    return {n: q.fn for n, q in _REGISTRY.items() if q.bench}
