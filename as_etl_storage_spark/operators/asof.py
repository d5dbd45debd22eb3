"""As-of join — the time-series operator Spark lacks natively.

Semantics: for each left row, attach the payload of the most recent right
row with ``right_time <= left_time`` (inclusive) within the same key.

Implementation is the union-window pattern, not a join: tag both sides,
union, sort within key by (time, side) with right rows first at equal
timestamps, then ``last(payload, ignorenulls=True)`` over an unbounded
preceding frame. One shuffle on the key — same cost as a co-partitioned
join, with no range-condition blowup. This is the canonical Spark shape for
point-in-time lookups (backtesting, slowly-changing-dimension joins) and
scales linearly: state per key is a single carried row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _orderable(dt: DataType) -> bool:
    """Whether Spark can sort on this type (MapType — directly or nested —
    is unorderable and would make the window's ORDER BY raise)."""
    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload: list[str],
) -> DataFrame:
    """Left as-of join: ``left`` rows keep all their columns plus, for each
    payload column ``c`` of ``right``, a ``c`` holding the value from the
    latest right row at-or-before the left row's time (null if none)."""
    l_tag = left.select(
        F.col(on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}") for c in payload],
    )
    r_tag = right.select(
        F.col(on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),  # right sorts first at equal times (inclusive)
        F.lit(None).cast(
            l_tag.schema["_lrow"].dataType
        ).alias("_lrow"),
        *[F.col(c).alias(f"_p_{c}") for c in payload],
    )
    unioned = l_tag.unionByName(r_tag)
    # payload columns close the sort: two right rows tied on (_t, _side)
    # would otherwise order by shuffle accident and last(ignorenulls)
    # would carry a run-dependent payload — with the tie-break the winner
    # at an exactly-duplicated right timestamp is the greatest payload
    # tuple, deterministically (identical payloads make the pick moot).
    # Two caveats, by construction: (1) unorderable payload types (maps,
    # or arrays/structs containing maps) cannot join the ORDER BY, so
    # ties that differ ONLY in such columns stay run-dependent for them;
    # (2) the carry is per-COLUMN last(ignorenulls) — if the winning tied
    # row holds a NULL in one payload column, that column back-fills from
    # an earlier tied row, so the result can mix columns across exact-tie
    # rows rather than take the winner's full row.
    # Left rows are unaffected: each computes its own frame, and the
    # preceding tied-left rows it may include carry only NULL payloads.
    tie_break = [F.col(f"_p_{c}") for c in payload if _orderable(right.schema[c].dataType)]
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side", *tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "_k",
        "_t",
        "_side",
        "_lrow",
        *[
            F.last(f"_p_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in payload
        ],
    )
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns] + [
        F.col(f"_c_{c}").alias(c) for c in payload
    ]
    return carried.where(F.col("_side") == 1).select(*out_cols)
