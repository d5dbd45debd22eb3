"""Custom stateful streaming operator via applyInPandasWithState — the
extensibility hook for semantics Spark's built-in stateful operators can't
express (the rebuild's answer to SURVEY.md §2.8: the reference has no UDF
surface at all; here arbitrary per-key state machines plug in).

Demonstrated operator: running per-user activity accumulator — for every
micro-batch, each user's state carries (event count, value sum); emits one
row per user per batch with the updated totals. Timeouts evict idle users'
state (bounded-state requirement at scale).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)


def _make_accumulate(evict_ms: int | None):
    def _accumulate(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        if evict_ms is not None:
            state.setTimeoutDuration(evict_ms)
        yield pd.DataFrame(
            {"user_id": [user_id], "n_events": [n], "sum_value": [s]}
        )

    return _accumulate


def user_activity_totals(events: DataFrame, evict_idle_ms: int | None = None) -> DataFrame:
    """Streaming: per-user running totals via applyInPandasWithState.
    Batch input falls back to a plain aggregation with identical semantics.

    ``evict_idle_ms`` enables ProcessingTimeTimeout state eviction — use it
    only with continuous triggers: with Trigger.AvailableNow the timeout
    machinery schedules extra batches and the drain never terminates
    (observed empirically; keep NoTimeout for bounded drains)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        return events.groupBy("user_id").agg(
            F.count("*").alias("n_events"), F.sum("value").alias("sum_value")
        )
    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if evict_idle_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _make_accumulate(evict_idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )
