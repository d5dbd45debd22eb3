"""Distributed global ranking — the scale-safe form of unpartitioned
window functions.

A plain ``ntile(n) OVER (ORDER BY col)`` moves the whole relation to ONE
partition (Spark warns exactly this); at 100 TB that is not a slow plan, it
is a dead one. The classic fix is two passes:

  1. bucket rows by the order key into ``parts`` ordered ranges;
  2. count rows per bucket — a handful of longs to the driver (same
     bounded class as split boundaries) — and turn them into per-bucket
     rank offsets;
  3. rank locally inside each bucket (window PARTITION BY bucket id, one
     hash shuffle) and add the offset.

The result is bit-identical to the single-partition form for any unique
total order (enforced by requiring tie-break columns), including exact
ntile bucket sizing (first ``total % n`` buckets get the extra row).

Bucketing is BOUNDARY-LITERAL: one bounded sample job collects ~parts-1
boundary key tuples to the driver, and the bucket id is a pure Catalyst
expression of the row's own key columns compared against those literals
(lexicographic, NULLS FIRST — matching Spark's default ascending sort).
Because the id is a deterministic function of row values, the stats job
and the output job agree on placement BY CONSTRUCTION — unlike
``repartitionByRange``, which re-samples boundaries per materialization
and therefore needed an eager localCheckpoint to pin placement (the
round-5 design). The literal scheme needs no materialized copy, is
fault-tolerant (any recomputation yields the same ids), and removes the
extra range exchange: the only data shuffle is the window's own hash
exchange on the bucket id.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"

#: sampled keys per target bucket; 40 gives boundary rank error ~2.5% of a
#: bucket with high probability — imbalance only costs parallelism evenness,
#: never correctness
_SAMPLE_PER_BUCKET = 40


def _py_sort_key(t: tuple) -> tuple:
    """Driver-side ordering of sampled key tuples, matching Spark ASC
    NULLS FIRST and NaN-greatest semantics (mixed-type comparisons never
    happen: each slot holds one column's type)."""
    out = []
    for v in t:
        if v is None:
            out.append((0, 0, 0))
        elif isinstance(v, float) and math.isnan(v):
            out.append((1, 1, 0))
        else:
            out.append((1, 0, v))
    return tuple(out)


def _key_gt(order_cols: list[str], boundary: tuple):
    """Column expression: (c1,…,ck) > (b1,…,bk) lexicographically with
    NULLS FIRST (a NULL cell is smaller than any value, equal to NULL).
    Three-valued logic is safe: a NULL comparison falls through to
    ``when(...).otherwise(0)`` as false, which is exactly NULLS FIRST."""
    expr = F.lit(False)
    for c, v in reversed(list(zip(order_cols, boundary))):
        col = F.col(c)
        if v is None:
            gt = col.isNotNull()
            eq = col.isNull()
        else:
            gt = col > F.lit(v)
            eq = col.eqNullSafe(F.lit(v))
        expr = gt | (eq & expr)
    return expr


def _sample_boundaries(
    df: DataFrame, order_cols: list[str], parts: int
) -> list[tuple]:
    """One bounded job: sample ~parts*_SAMPLE_PER_BUCKET key tuples,
    sort on the driver, return ≤ parts-1 distinct ascending boundaries.
    Collect size is O(parts), independent of data size — the same bounded
    class as split boundaries. An unlucky sample only skews bucket sizes
    (lost parallelism), never correctness."""
    if parts <= 1:
        return []
    keys = df.select(*[F.col(c) for c in order_cols])
    cnt = keys.count()
    if cnt == 0:
        return []
    target = parts * _SAMPLE_PER_BUCKET
    frac = min(1.0, target / cnt)
    rows = keys.sample(fraction=frac, seed=42).collect()
    if not rows:
        return []
    tuples = sorted((tuple(r) for r in rows), key=_py_sort_key)
    # evenly spaced picks, consecutive-deduped (duplicate boundaries would
    # only create empty buckets, but why carry dead comparisons)
    picks: list[tuple] = []
    for i in range(1, parts):
        b = tuples[min(len(tuples) - 1, int(i * len(tuples) / parts))]
        if not picks or b != picks[-1]:
            picks.append(b)
    return picks


def _bucketed_once(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """Attach ``__rank_pid``: the count of sampled boundary tuples the
    row's key exceeds — a pure expression, so every job (stats, output,
    task retries) computes the identical placement with no pinning.

    Expression size is O(parts × len(order_cols)) comparisons; at
    cluster scale keep ``parts`` at defaultParallelism (hundreds), not
    shuffle-partition counts (tens of thousands) — bucket ids feed a hash
    exchange, so more buckets than cores buys nothing."""
    parts = df.sparkSession.sparkContext.defaultParallelism
    boundaries = _sample_boundaries(df, order_cols, parts)
    pid = F.lit(0)
    for b in boundaries:
        pid = pid + F.when(_key_gt(order_cols, b), 1).otherwise(0)
    return df.withColumn(_PID, pid.cast("int"))


# round-5 name, kept as an alias for external references/tests
_partitioned_once = _bucketed_once


def _ranked_with_total(
    df: DataFrame, order_cols: list[str]
) -> tuple[DataFrame, int]:
    rp = _bucketed_once(df, order_cols)
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
    relation. Same two-pass shape as global_rank: boundary-literal
    bucketing on the order key (unique total order required), per-bucket
    sums to the driver (O(buckets) values), local windowed cumsum +
    broadcast offset. Bit-identical to the single-partition window for any
    unique order because the per-bucket sums are exact (use
    integer/decimal value columns; float would reintroduce
    order-dependence)."""
    rp = _bucketed_once(df, order_cols)
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
