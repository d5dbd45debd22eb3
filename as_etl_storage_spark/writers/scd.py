"""Slowly-changing dimension maintenance (SCD Type 2) — the warehouse
pattern for attribute history: instead of updating a dimension row in
place, the current row is closed (``valid_to`` set) and a new current row
opens. The reference's REPLACE mode (W2, mysql/table.go:100-146) is the
Type-1 overwrite; this is the history-preserving upgrade.

Scale notes: the update batch is typically ≪ the dimension, so it is
broadcast; the dimension is scanned once and never shuffled. History rows
pass through untouched — with a versioned/partitioned layout only the
current partition is rewritten. All comparisons are null-safe equality on
the tracked columns; no floats, no nondeterminism.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_init(df: DataFrame, version: int) -> DataFrame:
    """Bootstrap a dimension: every row current as of ``version``."""
    return df.select(
        "*",
        F.lit(version).cast("int").alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    tracked: list[str],
    version: int,
) -> DataFrame:
    """Apply an update batch at ``version``. ``updates`` carries
    ``key`` + ``tracked`` attribute values. Rows whose tracked attributes
    are unchanged pass through; changed rows get closed (valid_to =
    version) plus a fresh current row; unseen keys insert as new."""
    upd = F.broadcast(
        updates.select(
            F.col(key),
            *[F.col(c).alias(f"__new_{c}") for c in tracked],
            # explicit presence marker: inferring "an update row matched"
            # from the nullness of the new values would silently drop an
            # update that sets EVERY tracked attribute to NULL (a real
            # change the eqNullSafe diff below exists to catch)
            F.lit(True).alias("__matched"),
        )
    )
    cur = dim.where(F.col("is_current"))
    hist = dim.where(~F.col("is_current"))

    joined = cur.join(upd, key, "left")
    diffs = [
        ~F.col(c).eqNullSafe(F.col(f"__new_{c}")) for c in tracked
    ]
    changed = F.coalesce(F.col("__matched"), F.lit(False)) & reduce(
        lambda a, b: a | b, diffs
    )

    carried = joined.where(~changed).select(dim.columns)
    closed = (
        joined.where(changed)
        .withColumn("valid_to", F.lit(version).cast("int"))
        .withColumn("is_current", F.lit(False))
        .select(dim.columns)
    )
    fresh = (
        joined.where(changed)
        .select(
            F.col(key),
            *[F.col(f"__new_{c}").alias(c) for c in tracked],
            F.lit(version).cast("int").alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(dim.columns)
    )
    new_rows = (
        updates.join(cur.select(key), key, "left_anti")
        .select(F.col(key), *[F.col(c) for c in tracked])
        .select(
            "*",
            F.lit(version).cast("int").alias("valid_from"),
            F.lit(None).cast("int").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        .select(dim.columns)
    )
    return hist.unionByName(carried).unionByName(closed).unionByName(
        fresh
    ).unionByName(new_rows)
