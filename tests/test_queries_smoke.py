"""Smoke tests: every registered query runs at sf0.001 and returns a
DataFrame with stable, non-empty schema; oracle keys stay a subset of
query keys. (Full value-level checking runs in tools/check_oracle.py at
sf0.01 — the driver's gate.)
"""

from __future__ import annotations

import pytest

from artis_data_ingest_spark import plans

SF_DIR = "/root/testdata/sf0.001"

ALL = sorted(plans.all_queries())


def test_oracle_keys_subset():
    assert set(plans.oracle_sql()) <= set(plans.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, name):
    q = plans.all_queries()[name]
    df = q.fn(spark, SF_DIR)
    assert df.columns, name
    # runs without error; row count may legitimately be 0 for some ops
    df.limit(5).collect()


def test_priority_queries_yield_first():
    """The driver checks ~50 queries per round in queries() order; the
    rotation contract (every verdict at most ~2 rounds old) only holds
    if _PRIORITY names actually lead the iteration and all exist."""
    from artis_data_ingest_spark.plans.registry import _PRIORITY, _REGISTRY

    assert all(n in _REGISTRY for n in _PRIORITY)
    assert len(_PRIORITY) <= 52  # driver budget ~50
    ordered = list(plans.queries())
    assert ordered[: len(_PRIORITY)] == _PRIORITY
    assert set(ordered) == set(_REGISTRY)
