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


def attach_zorder_key_ranked(
    df: DataFrame, cols: list[str], out_col: str, bits: int = 8
) -> DataFrame:
    """Attach ``out_col`` = quantile (rank-bucketed) z-order key: each
    column is bucketed by SAMPLED BOUNDARIES instead of equi-width value
    cells, then the bucket bits are interleaved as in :func:`zorder_key`.

    Why a second form: equi-width cells need a numeric column and waste
    almost the whole cell range on skewed data (a power-law column lands
    90% of rows in a handful of cells, so the interleaved key carries no
    information in that dimension and file bounds stay wide). Rank
    buckets are equi-POPULATED by construction — every cell holds ~1/2^bits
    of the rows whatever the distribution — and the boundary comparison
    is the rank kernel's ordering, so strings, dates and timestamps
    z-order too (the width form would have to reject them).

    Cost: ONE bounded boundary-sample job for all listed columns
    (``sample_boundaries_multi`` — the per-partition reservoir carries
    whole rows, so every column's cell edges come from the same pass;
    a 2-column key no longer reads the table twice) + the rank kernel's
    ``attach_exceed_count`` bucket id per column. This is an attach-
    (DataFrame-in/DataFrame-out) rather than key-expression API because
    JIT safety REQUIRES it: 2^bits cells mean up to 2^bits − 1 boundary
    comparisons per column, and a single CASE tree past ~32 boundaries
    exceeds HotSpot's 8000-bytecode compile limit and runs interpreted
    at a measured ~6× per-row cost (docs/SCALE.md) — the kernel's
    multi-level Project chain keeps every generated method compilable,
    and a Project chain cannot be expressed as one Column. The final
    bit-interleave over the ≤ len(cols) bucket ids is plain integer
    arithmetic (2 × bits × n ops), comfortably codegen'd."""
    from as_etl_storage_spark.operators.rank import (
        attach_exceed_count,
        sample_boundaries_multi,
    )

    n = len(cols)
    if bits * n > 63:
        raise ValueError(
            f"attach_zorder_key_ranked needs bits*len(cols) <= 63; "
            f"got {bits}*{n}"
        )
    boundaries = sample_boundaries_multi(df, cols, 2**bits)
    bcols = []
    for j, c in enumerate(cols):
        bc = f"{out_col}__cell{j}"
        df = attach_exceed_count(df, [c], boundaries[c], bc)
        n_cells = len(boundaries[c]) + 1
        if n_cells < 2**bits:
            # a low-cardinality column dedupes to < 2^bits - 1 distinct
            # boundaries, so the raw exceed-count spans only
            # [0, n_cells-1] and its HIGH bits are constant zero — the
            # interleave would then order almost entirely by the other
            # columns and this one's file bounds stay wide. Rescale the
            # cell id onto the full 2^bits range (floor(cell × 2^bits /
            # n_cells), exact integer arithmetic) so the top bit splits
            # the column's actual median whatever its cardinality.
            df = df.withColumn(
                bc,
                F.floor(
                    F.col(bc).cast("long") * F.lit(2**bits) / F.lit(n_cells)
                ).cast("long"),
            )
        bcols.append(bc)
    key = F.lit(0).cast("long")
    for i in range(bits):
        for j, bc in enumerate(bcols):
            key = key + (
                F.shiftleft(
                    F.shiftright(F.col(bc).cast("long"), i).bitwiseAND(
                        F.lit(1)
                    ),
                    i * n + j,
                ).cast("long")
            )
    return df.withColumn(out_col, key).drop(*bcols)


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
