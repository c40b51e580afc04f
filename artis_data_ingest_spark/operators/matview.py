"""Incremental MATERIALIZED-VIEW maintenance off the CDC feed —
retraction-aware aggregate deltas (r13).

``q_agg_delta_update`` (plans/events_time.py) showed the insert-only
half: new partial aggregates merge into a persisted rollup.  Real
tables also DELETE and UPDATE, and since the versioned layer's
:func:`~artis_data_ingest_spark.sinks.versioned.cdc_feed` tags every
row-level change (``insert`` / ``delete`` / ``update_preimage`` /
``update_postimage``), a SUM/COUNT-shaped aggregate can be maintained
EXACTLY at O(changed rows): inserts and post-images add, deletes and
pre-images subtract, and a group whose live count reaches zero leaves
the view — the classic retraction stream (Flink's
``Retract``/``UpsertStream``, Materialize's differential rows),
expressed as one signed groupBy over the CDC slice plus one
full-outer merge against the current view.

At 100 TB this is the difference between re-aggregating the table
after every DML and touching only the changed rows: the CDC slice is
O(delta), the signed partial is map-side combinable, and the merge
joins view-sized (groups, not rows) tables.

Only distributive/algebraic measures maintain this way (COUNT, SUM —
and AVG as SUM/COUNT); MIN/MAX are not retractable without per-group
history, exactly the limitation every incremental-view engine
documents.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: change types that ADD a row's contribution to the aggregate; the
#: other two (`delete`, `update_preimage`) RETRACT it.
_ADDITIVE = ("insert", "update_postimage")


def cdc_aggregate_delta(
    changes: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column | str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Collapse a CDC slice (``_change_type``-tagged rows from
    ``cdc_feed``) into SIGNED per-group deltas: ``count_col`` and each
    ``sums`` measure carry +1/-1 signs per change type, so the result
    is the exact net effect of the slice on a COUNT/SUM aggregate —
    map-side combinable, O(changed rows)."""
    sums = sums or {}
    sign = (
        F.when(F.col("_change_type").isin(*_ADDITIVE), F.lit(1))
        .otherwise(F.lit(-1))
    )
    aggs = [F.sum(sign).alias(count_col)]
    for name, expr in sums.items():
        col = F.expr(expr) if isinstance(expr, str) else expr
        aggs.append(F.sum(sign * col).alias(name))
    return changes.groupBy(*keys).agg(*aggs)


def apply_cdc_to_aggregate(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sums: dict[str, Column | str] | None = None,
    count_col: str = "n_rows",
) -> DataFrame:
    """Merge a CDC slice into a persisted COUNT/SUM aggregate and
    return the refreshed view: ``base`` has ``keys + count_col +
    sums.keys()`` columns (the materialized state), ``changes`` is the
    raw ``cdc_feed`` output since the view's cursor.  New groups
    appear, retracted groups whose count reaches zero DISAPPEAR
    (full-outer merge + coalesced addition + a count>0 filter), and
    every measure is exact — equal to re-aggregating the table's full
    state, which the tests and the gate oracle pin."""
    sums = dict(sums or {})
    keys = list(keys)
    delta = cdc_aggregate_delta(changes, keys, sums, count_col)
    measure_cols = [count_col, *sums]
    b = base.select(
        *keys, *[F.col(c).alias(f"_b_{c}") for c in measure_cols]
    )
    d = delta.select(
        *keys, *[F.col(c).alias(f"_d_{c}") for c in measure_cols]
    )
    merged = b.join(d, keys, "full_outer").select(
        *keys,
        *[
            (
                F.coalesce(F.col(f"_b_{c}"), F.lit(0))
                + F.coalesce(F.col(f"_d_{c}"), F.lit(0))
            ).alias(c)
            for c in measure_cols
        ],
    )
    return merged.filter(F.col(count_col) > 0)


__all__ = ["apply_cdc_to_aggregate", "cdc_aggregate_delta"]
