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
    # the accumulator reads only len(pdf) and pdf["value"], but Spark
    # ships EVERY input column through the state shuffle and the Arrow
    # boundary (guide §4: opaque functions defeat column pruning) — the
    # events fixture carries ts/event_id/event_type/props besides these
    # two, so the explicit projection cuts per-batch shuffle and Arrow
    # bytes to the two columns the function touches
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _make_accumulate(evict_idle_ms),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=timeout_conf,
        )
    )


# ------------------------------------------------- funnel state machine ---
FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("stage", T.IntegerType()),
        T.StructField("t_view_us", T.LongType()),
        T.StructField("t_click_us", T.LongType()),
    ]
)

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("t_view", T.TimestampType()),
        T.StructField("t_click", T.TimestampType()),
        T.StructField("t_purchase", T.TimestampType()),
    ]
)

_STAGE_DONE = 3


def _funnel_step(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-user view -> click -> purchase progression; emits exactly one
    conversion row the moment the purchase lands (possibly batches later
    than the view). The state machine semantics — first view, first click
    AFTER it, first purchase AFTER that — are not expressible with
    Spark's built-in streaming aggregates in one operator."""
    (user_id,) = key
    if state.hasTimedOut:  # pragma: no cover - eviction path
        state.remove()
        return
    stage, tv, tc = state.get if state.exists else (0, None, None)
    if stage == _STAGE_DONE:
        return
    pdf = pd.concat(list(pdfs))
    pdf = pdf.sort_values(["ts", "event_id"])
    out = None
    for ts, etype in zip(pdf["ts"], pdf["event_type"]):
        us = int(pd.Timestamp(ts).value // 1000)
        if stage == 0 and etype == "view":
            stage, tv = 1, us
        elif stage == 1 and etype == "click" and us > tv:
            stage, tc = 2, us
        elif stage == 2 and etype == "purchase" and us > tc:
            stage = _STAGE_DONE
            out = pd.DataFrame(
                {
                    "user_id": [user_id],
                    "t_view": [pd.Timestamp(tv, unit="us")],
                    "t_click": [pd.Timestamp(tc, unit="us")],
                    "t_purchase": [pd.Timestamp(us, unit="us")],
                }
            )
            break
    state.update((stage, tv, tc))
    if out is not None:
        yield out


def funnel_conversions(events: DataFrame) -> DataFrame:
    """Streaming: per-user funnel completion via applyInPandasWithState
    (one output row per converted user, emitted when the purchase event
    arrives). Batch input computes the identical semantics with stepwise
    conditional mins: first view, first click after it, first purchase
    after that.

    Scale notes: state is 3 scalars per active user, hash-partitioned by
    key; pair with ProcessingTimeTimeout eviction on continuous triggers
    (NoTimeout for bounded drains — see user_activity_totals)."""
    if not events.isStreaming:
        from pyspark.sql import functions as F

        v = (
            events.where("event_type = 'view'")
            .groupBy("user_id")
            .agg(F.min("ts").alias("t_view"))
        )
        c = (
            events.where("event_type = 'click'")
            .join(v, "user_id")
            .where(F.col("ts") > F.col("t_view"))
            .groupBy("user_id", "t_view")
            .agg(F.min("ts").alias("t_click"))
        )
        return (
            events.where("event_type = 'purchase'")
            .join(c, "user_id")
            .where(F.col("ts") > F.col("t_click"))
            .groupBy("user_id", "t_view", "t_click")
            .agg(F.min("ts").alias("t_purchase"))
        )
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_step,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------- transformWithState (Spark 4 API) ---
def make_totals_processor():
    """StatefulProcessor for per-user running totals through Spark 4's
    transformWithStateInPandas — the successor API to
    applyInPandasWithState: typed state handles (ValueState here; List/
    MapState and timers available), RocksDB-backed, state schema
    evolution supported. Semantics match ``user_activity_totals``: each
    batch emits the key's updated (n_events, sum_cents); sum is kept in
    integer cents so accumulation order cannot drift the value.

    Defined in a factory so the class object pickles cleanly into the
    Python worker without dragging module state along."""
    import pandas as pd

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n BIGINT, cents BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, cents = (
                self._state.get() if self._state.exists() else (0, 0)
            )
            for pdf in rows:
                import numpy as np

                n += len(pdf)
                # round PER ROW (like the oracle's sum(round(value*100)));
                # rounding the batch sum once would drift: two 0.014s are
                # 1+1=2 cents per-row but round(2.8)=3 summed-then-rounded.
                # HALF AWAY FROM ZERO via trunc(x + sign*0.5): SQL round
                # semantics — numpy/pandas .round() is half-to-even and
                # disagrees at exact .5 cents
                v = pdf["value"].astype(float).to_numpy() * 100
                cents += int(np.trunc(v + np.sign(v) * 0.5).sum())
            self._state.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return TotalsProcessor


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (requires
    the RocksDB state store provider — set
    ``spark.sql.streaming.stateStore.providerClass`` before starting the
    query). Output one row per (key, batch) in update mode; keep-latest
    per key equals the batch aggregation.

    ENVIRONMENT GATE: the new API's state server speaks protobuf between
    the JVM and the Python worker; without the ``protobuf`` package the
    driver worker crashes with an opaque ImportError mid-query. Unblock
    attempts, recorded so the gate is self-documenting:
    ``import google.protobuf`` fails with ``ModuleNotFoundError: No
    module named 'google'``; ``pip download protobuf`` cannot reach any
    index (DNS failure — the container is offline); pyspark vendors NO
    protobuf runtime (``pyspark/sql/streaming/proto/StateMessage_pb2.py``
    is generated code that imports ``google.protobuf`` and validates
    runtime version 6.33.0 — the missing wheel is exactly
    ``protobuf==6.33.*``), and a hand-vendored stand-in would have to
    reimplement the protobuf wire format the JVM state server speaks,
    i.e. the package itself. The guard below therefore fails fast with
    the actionable message; the applyInPandasWithState twin
    (``user_activity_totals``) is the executable path here and is
    real-engine oracle-gated (stream_exec_running_totals)."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as exc:
        raise RuntimeError(
            "transformWithStateInPandas needs the 'protobuf' wheel "
            "(pyspark's generated StateMessage_pb2 validates runtime "
            "6.33.0, so protobuf==6.33.*) for its state-server protocol; "
            f"import fails with: {exc!r}. Install it, or use "
            "user_activity_totals (applyInPandasWithState) instead."
        ) from exc
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_totals_processor()(),
        outputStructType="user_id BIGINT, n_events BIGINT, sum_cents BIGINT",
        outputMode="Update",
        timeMode="None",
    )
