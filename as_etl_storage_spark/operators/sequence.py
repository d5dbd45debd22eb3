"""Event-sequence analysis via Arrow-batched grouped pandas — the
applyInPandas pattern for per-key ordered computations that window
functions can't express (here: transition counting, the building block of
funnel/Markov analyses).

Scale notes: applyInPandas shuffles once on the grouping key and streams
each group as an Arrow batch into Python. Keys with huge groups are the
hazard (one group must fit a worker's memory) — for power-law user activity,
pre-split hot keys by (user_id, day) and re-aggregate.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

TRANSITIONS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("from_type", T.StringType()),
        T.StructField("to_type", T.StringType()),
        T.StructField("n", T.LongType()),
    ]
)


def event_transitions(events: DataFrame) -> DataFrame:
    """Per-user counts of consecutive event-type transitions, ordered by
    (ts, event_id) — the tie-break makes results deterministic and lets the
    SQL oracle (lag window) reproduce them exactly."""

    def per_user(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        prev = pdf["event_type"].shift(1)
        mask = prev.notna()
        out = (
            pd.DataFrame(
                {
                    "user_id": pdf["user_id"][mask],
                    "from_type": prev[mask],
                    "to_type": pdf["event_type"][mask],
                }
            )
            .groupby(["user_id", "from_type", "to_type"], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        return out

    return events.select("user_id", "ts", "event_id", "event_type").groupBy(
        "user_id"
    ).applyInPandas(per_user, TRANSITIONS_SCHEMA)
