"""Adaptive input-parallelism guard for compute-heavy operators.

A parquet file is split into at most one task per row group, so a table
written as a single row group scans as ONE partition no matter how many
cores exist — and every expensive projection downstream (tokenization,
shingling, codec work) then runs serially until the first shuffle. At
real scale the problem disappears (a 100 TB table has thousands of row
groups/files and the scan parallelizes naturally), which is exactly why
the guard must be ADAPTIVE rather than an unconditional repartition: an
unconditional one would re-shuffle the full corpus for nothing on a
well-split table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_scan(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin-repartition ``df`` to ``min_parts`` (default: the
    session's defaultParallelism) ONLY when its current partition count
    is below half that — i.e. only when the scan genuinely cannot feed
    the cores. No-op (and no added shuffle) whenever the source is
    already split, so at cluster scale this never fires; on
    single-row-group local fixtures it moves the small input once so the
    expensive per-row work downstream runs wide.

    Call it BEFORE the expensive projection: repartitioning after would
    ship the projected results, parallelizing nothing."""
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() * 2 <= target:
        return df.repartition(target)
    return df
