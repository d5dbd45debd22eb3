"""Storage-layout operators — the tools that make 100 TB tables queryable.

  * partitioned writes: hive-style partition directories; Catalyst prunes
    partitions for matching predicates (verify: PartitionFilters in explain)
  * bucketed tables: pre-shuffled layout so equi-joins/aggregations on the
    bucket key run with NO exchange (verify: no Exchange in the join plan)
  * compaction: the small-files problem — rewrite a table into
    target-size files without changing contents (OPTIMIZE analog)
  * table stats: per-column min/max/nulls/ndv summary (ANALYZE analog) —
    the inputs a cost-based optimizer and a data-quality monitor both need

The reference has none of these (it writes to RDBMS tables); they are the
parquet-native replacements for what an RDBMS gives its users implicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Hive-style partitioned layout. Partition columns should be
    low-cardinality derivations (date, region) — high-cardinality partition
    keys create the small-files problem compaction exists to fix."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata lives in the
    catalog). Joins/aggregations on the bucket key between tables bucketed
    the same way execute without a shuffle."""
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def compact(
    spark: SparkSession, path: str, target_rows_per_file: int = 1_000_000
) -> tuple[int, int]:
    """Rewrite a parquet table into ~target-size files (contents unchanged).
    Returns (files_before, files_after). Uses a staging dir + rename, same
    atomicity story as the merge writer — including the deterministic
    backup path, so an interrupted swap is recoverable on the next run."""
    import shutil
    import uuid

    backup = f"{path}.__old__"
    if not os.path.exists(path) and os.path.exists(backup):
        os.rename(backup, path)  # recover an interrupted swap
    df = spark.read.parquet(path)
    total = df.count()
    n_files_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    n_out = max(1, (total + target_rows_per_file - 1) // target_rows_per_file)
    staging = f"{path}.__compact__{uuid.uuid4().hex[:8]}"
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    shutil.rmtree(backup, ignore_errors=True)
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup, ignore_errors=True)
    n_files_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    return n_files_before, n_files_after


def zorder_key(cols: list[str], bounds: dict, bits: int = 12) -> F.Column:
    """Z-order (Morton) key over numeric columns: each value is bucketed
    equi-width into 2^bits cells using the provided (min, max) bounds, then
    the bucket bits are interleaved. Rows close in the key are close in
    EVERY listed dimension — the property multi-column data skipping needs.

    Pure integer column arithmetic (codegen'd); ``bounds[col] = (lo, hi)``
    are driver-side scalars from one min/max aggregate (bounded, same class
    of driver value as split boundaries)."""
    n = len(cols)
    if bits * n > 63:
        # JVM shiftleft is mod-64: bit positions past 63 silently wrap
        # onto low bits and the key stops being a Morton order — refuse
        # rather than emit a corrupt layout
        raise ValueError(
            f"zorder_key needs bits*len(cols) <= 63 to fit one long; got "
            f"{bits}*{n} = {bits * n} — lower bits (e.g. "
            f"{63 // n} for {n} columns)"
        )
    buckets = []
    for c in cols:
        lo, hi = bounds[c]
        span = float(hi) - float(lo) or 1.0
        cell = F.least(
            F.lit(2**bits - 1),
            F.floor((F.col(c).cast("double") - F.lit(float(lo)))
                    / F.lit(span) * F.lit(2**bits)),
        ).cast("long")
        buckets.append(F.greatest(F.lit(0), cell))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            key = key + (F.shiftleft(
                F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
            ).cast("long"))
    return key


def zorder_key_ranked(
    df: DataFrame, cols: list[str], bits: int = 8
) -> F.Column:
    """Quantile (rank-bucketed) z-order key: each column is bucketed by
    SAMPLED BOUNDARIES instead of equi-width value cells, then the bucket
    bits are interleaved as in :func:`zorder_key`.

    Why a second form: equi-width cells need a numeric column and waste
    almost the whole cell range on skewed data (a power-law column lands
    90% of rows in a handful of cells, so the interleaved key carries no
    information in that dimension and file bounds stay wide). Rank
    buckets are equi-POPULATED by construction — every cell holds ~1/2^bits
    of the rows whatever the distribution — and the boundary comparison
    is the rank kernel's ordering, so strings, dates and timestamps
    z-order too (the width form would have to reject them).

    Cost: one bounded boundary-sample job per column (the same
    per-partition reservoir the global-rank kernel uses) + a JIT-safe
    O(log 2^bits) binary-search expression per row — no shuffle beyond
    the range repartition the caller does anyway."""
    from as_etl_storage_spark.operators.rank import (
        _bucket_search_expr,
        _sample_boundaries,
    )

    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"zorder_key_ranked needs bits*len(cols) <= 63; got {bits}*{n}"
        )
    buckets = []
    for c in cols:
        bnds = _sample_boundaries(df, [c], 2**bits)
        buckets.append(_bucket_search_expr([c], bnds).cast("long"))
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            key = key + (
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * n + j
                ).cast("long")
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    n_files: int = 8,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """OPTIMIZE ZORDER analog: range-repartition + sort by the Morton key,
    so every output file covers a tight min/max range in ALL z-order
    columns and parquet row-group stats prune scans on any of them (a
    single-column sort only helps its leading column). One extra min/max
    aggregate + one range shuffle — layout cost, paid once per table."""
    row = df.agg(
        *[f for c in zorder_cols for f in (F.min(c).alias(f"{c}__lo"),
                                           F.max(c).alias(f"{c}__hi"))]
    ).collect()[0]
    bounds = {c: (row[f"{c}__lo"], row[f"{c}__hi"]) for c in zorder_cols}
    key = zorder_key(zorder_cols, bounds, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )


def table_stats(
    df: DataFrame, columns: list[str] | None = None, exact_ndv: bool = False
) -> DataFrame:
    """Per-column statistics in one pass: count, nulls, min, max, ndv.
    One aggregation — no per-column scans. Values are stringified so
    heterogeneous column types stack into one tall result.

    ndv is HyperLogLog (approx_count_distinct) by default — the scale path;
    ``exact_ndv=True`` switches to exact count(distinct) for oracle-checked
    correctness runs."""
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__nonnull"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
        if not exact_ndv:
            aggs.append(F.approx_count_distinct(F.col(c)).alias(f"{c}__ndv"))
    row = df.agg(F.count(F.lit(1)).alias("__total"), *aggs)
    if exact_ndv:
        # one 2-phase hash aggregation per column, cross-joined onto the
        # single stats row — several count(DISTINCT) in ONE aggregate make
        # Catalyst expand the input x (n_distincts + 1) and fall back to
        # sort-based aggregation, which is strictly worse than n cheap
        # pruned-column scans
        for c in cols:
            row = row.crossJoin(
                df.agg(F.count_distinct(F.col(c)).alias(f"{c}__ndv"))
            )
    stacked = []
    for c in cols:
        stacked.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__total").alias("n_rows"),
                (F.col("__total") - F.col(f"{c}__nonnull")).alias("n_nulls"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
                F.col(f"{c}__ndv").alias("approx_ndv"),
            )
        )
    return row.select(F.explode(F.array(*stacked)).alias("s")).select("s.*")
