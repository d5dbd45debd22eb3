"""Distributed global ranking — the scale-safe form of unpartitioned
window functions.

A plain ``ntile(n) OVER (ORDER BY col)`` moves the whole relation to ONE
partition (Spark warns exactly this); at 100 TB that is not a slow plan, it
is a dead one. The classic fix is two passes:

  1. range-repartition on the order key (+ unique tie-break), so partition
     i holds keys entirely below partition i+1;
  2. count rows per partition — a handful of longs to the driver (same
     bounded class as split boundaries) — and turn them into per-partition
     rank offsets;
  3. rank locally inside each partition (window PARTITION BY partition id,
     which shuffles nothing further) and add the offset.

The result is bit-identical to the single-partition form for any unique
total order (enforced by requiring tie-break columns), including exact
ntile bucket sizing (first ``total % n`` buckets get the extra row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"


def _partitioned_once(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Range-partition on the order key and PIN the placement: the two-pass
    scheme runs one job to collect per-partition stats and another to emit
    output, but repartitionByRange samples its boundaries per
    materialization — without pinning, a boundary row can land in
    partition p in the stats job and p+1 in the output job, silently
    corrupting every offset after it. The eager localCheckpoint
    materializes the partitioned blocks once so both jobs read the SAME
    placement (blocks are ContextCleaner-managed, freed when the caller
    drops the result).

    Known trades, accepted deliberately: (1) each call materializes a
    full copy of the input — callers that rank twice (multi-pass SNM)
    hold two copies until GC; (2) localCheckpoint is not fault-tolerant —
    losing an executor fails the query instead of recomputing. On a real
    cluster, swap in reliable ``checkpoint()`` (HDFS-backed) via
    ``spark.sparkContext.setCheckpointDir`` for (2), or compute literal
    boundary values with a deterministic full-pass quantile sketch and
    bucket by comparison — both keep the two-job placement agreement this
    function exists to guarantee."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartitionByRange(parts, *order_cols)
        .withColumn(_PID, F.spark_partition_id())
        .localCheckpoint(eager=True)
    )


def _ranked_with_total(
    df: DataFrame, order_cols: list[str]
) -> tuple[DataFrame, int]:
    rp = _partitioned_once(df, order_cols)
    counts = rp.groupBy(_PID).count().collect()
    by_pid = {r[_PID]: r["count"] for r in counts}
    offsets = []
    acc = 0
    for pid in sorted(by_pid):
        offsets.append((pid, acc))
        acc += by_pid[pid]
    if not offsets:
        ranked = rp.withColumn("global_rank", F.lit(None).cast("long")).drop(
            _PID
        )
        return ranked, 0
    off_df = df.sparkSession.createDataFrame(
        offsets, f"{_PID}: int, {_OFFSET}: long"
    )
    w = Window.partitionBy(_PID).orderBy(*order_cols)
    ranked = (
        rp.withColumn(_LOCAL, F.row_number().over(w))
        .join(F.broadcast(off_df), _PID)
        .withColumn("global_rank", F.col(_OFFSET) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFFSET)
    )
    return ranked, acc


def global_rank(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Add a ``global_rank`` column (1-based, row_number semantics) ordered
    by ``order_cols`` — which must form a unique total order (append a key
    column as tie-break) — without ever collapsing data to one partition."""
    return _ranked_with_total(df, order_cols)[0]


def global_ntile(df: DataFrame, order_cols: list[str], n: int) -> DataFrame:
    """Add a ``bucket`` column with exact SQL ``ntile(n)`` semantics (the
    first ``total % n`` buckets hold one extra row) over the global order,
    built on global_rank — no single-partition exchange anywhere."""
    ranked, total = _ranked_with_total(df, order_cols)
    base, rem = divmod(total, n)
    big = rem * (base + 1)
    r = F.col("global_rank")
    bucket = F.when(
        F.lit(rem) > 0,
        F.when(r <= big, F.ceil(r / (base + 1))).otherwise(
            F.lit(rem) + F.ceil((r - big) / F.greatest(F.lit(base), F.lit(1)))
        ),
    ).otherwise(F.ceil(r / F.greatest(F.lit(base), F.lit(1))))
    return ranked.withColumn("bucket", bucket.cast("int"))


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
) -> DataFrame:
    """Prefix sum of ``value_col`` over a global order — the scale-safe
    form of ``sum(v) OVER (ORDER BY …)``, which would single-partition the
    relation. Same two-pass shape as global_rank: range-repartition on the
    order key (unique total order required), per-partition sums to the
    driver (O(partitions) longs), local windowed cumsum + broadcast
    offset. Bit-identical to the single-partition window for any unique
    order because the per-partition sums are exact (use integer/decimal
    value columns; float would reintroduce order-dependence)."""
    rp = _partitioned_once(df, order_cols)
    stats = rp.groupBy(_PID).agg(
        F.sum(value_col).alias("s"), F.count(value_col).alias("nn")
    ).collect()
    # offsets carry the SUM type (long for integers, Decimal for decimal
    # value columns — the docstring's contract), not a hardcoded long
    sum_type = rp.select(F.sum(value_col).alias("s")).schema["s"].dataType
    from decimal import Decimal as _D

    from pyspark.sql import types as _T

    zero = _D(0) if isinstance(sum_type, _T.DecimalType) else 0
    by_pid = {r[_PID]: (r["s"], r["nn"]) for r in stats}
    offsets = []
    acc, nn_acc = zero, 0
    for pid in sorted(by_pid):
        offsets.append((pid, acc, 1 if nn_acc > 0 else 0))
        s, nn = by_pid[pid]
        if s is not None:  # an all-NULL partition contributes nothing
            acc += s
        nn_acc += nn
    if not offsets:
        return rp.withColumn(out_col, F.lit(None).cast(sum_type)).drop(_PID)
    off_df = df.sparkSession.createDataFrame(
        offsets,
        _T.StructType(
            [
                _T.StructField(_PID, _T.IntegerType()),
                _T.StructField(_OFFSET, sum_type),
                _T.StructField("__rank_prior", _T.IntegerType()),
            ]
        ),
    )
    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = F.sum(value_col).over(w)
    # SQL window-sum NULL semantics: the running sum is NULL only while NO
    # non-null value has been seen anywhere in the global prefix
    out = F.when(
        local.isNull() & (F.col("__rank_prior") == 0), F.lit(None)
    ).otherwise(F.col(_OFFSET) + F.coalesce(local, F.lit(0)))
    return (
        rp.join(F.broadcast(off_df), _PID)
        .withColumn(out_col, out)
        .drop(_PID, _OFFSET, "__rank_prior")
    )
