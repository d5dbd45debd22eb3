"""Distributed global ranking — the scale-safe form of unpartitioned
window functions.

A plain ``ntile(n) OVER (ORDER BY col)`` moves the whole relation to ONE
partition (Spark warns exactly this); at 100 TB that is not a slow plan, it
is a dead one. The scale-safe form here:

  1. bucket rows by the order key into ``parts`` ordered ranges
     (boundary-literal: one bounded sample job collects ~parts-1 key
     tuples; the bucket id is a pure Catalyst expression of the row's own
     key columns against those literals — lexicographic, NULLS FIRST);
  2. rank/cumsum locally inside each bucket (window PARTITION BY bucket
     id — the ONE corpus-bytes shuffle);
  3. turn per-bucket totals into per-bucket offsets IN-PLAN: bucket
     counts/sums come from a groupBy whose map-side partial aggregation
     shuffles ≤ parts rows per input partition; the ≤ parts-row stats
     run a bounded cumulative window (offset + grand total on the same
     tiny exchange) and broadcast-join back. No driver collect and no
     single-partition exchange anywhere.

The result is bit-identical to the single-partition form for any unique
total order (enforced by requiring tie-break columns), including exact
ntile bucket sizing (first ``total % n`` buckets get the extra row).

Because the bucket id is a deterministic function of row values, every
job and task retry computes identical placement BY CONSTRUCTION — unlike
``repartitionByRange``, which re-samples boundaries per materialization
and therefore needed an eager localCheckpoint to pin placement (the
round-5 design). The literal scheme needs no materialized copy, is
fault-tolerant, and costs exactly two jobs per operator: the boundary
sample and the caller's action.

The offsets/totals windows partition on a constant-but-UNFOLDABLE key
(``operators/parallelism.constant_partition_key`` — NOT ``lit(0)``,
which Catalyst folds out of the spec, re-planning Exchange
SinglePartition and re-emitting the WindowExec warning) — physically
one partition, but over the ≤ parts-row stats relation only, the same
bounded class as split boundaries; the corpus itself never sees an
unpartitioned window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_PID = "__rank_pid"
_LOCAL = "__rank_local"
_OFFSET = "__rank_offset"
_BCNT = "__rank_bcnt"
_W = "__rank_w"

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


def _pick_boundaries(weighted: list[tuple], parts: int) -> list[tuple]:
    """Driver-side weighted quantile step-pick over an ALREADY-SORTED
    ``[(key_tuple, weight), ...]`` sample: walk cumulative weight and
    emit a boundary every ``total/parts``, consecutive-deduped (duplicate
    boundaries would only create empty buckets). Factored out so the
    one-pass multi-column sampler reuses the exact arithmetic."""
    total_w = sum(w for _, w in weighted)
    step = total_w / parts
    picks_out: list[tuple] = []
    cum, nxt = 0.0, step
    for key, w in weighted:
        cum += w
        while cum >= nxt and len(picks_out) < parts - 1:
            if not picks_out or key != picks_out[-1]:
                picks_out.append(key)
            nxt += step
    return picks_out


def _sample_boundaries(
    df: DataFrame, order_cols: list[str], parts: int
) -> list[tuple]:
    """ONE bounded job: per-partition weighted reservoir of
    ~_SAMPLE_PER_BUCKET key tuples via mapInArrow (vectorized take per
    Arrow batch — no Python row loop, and no pandas round-trip: pandas
    would conflate NaN doubles with NULL and force nullable int64 keys
    through float64, mangling boundary literals above 2^53); the driver
    weight-merges them into ≤ parts-1 ascending boundary tuples (the
    same per-partition-sketch scheme Spark's own RangePartitioner uses,
    minus a separate count job to size a global sample fraction). Each
    pick carries weight = its OWN batch's rows / picks — a single
    partition-level weight would over-represent small batches (a
    100-row tail batch yields picks at 100× the rate of a 10k-row
    batch, fatal when the input arrives pre-sorted on the key); the
    partition-level cap is a STREAMING Efraimidis–Spirakis weighted
    reservoir (top-k by u^(1/w), inclusion probability ∝ weight,
    compacted whenever the buffer exceeds a small multiple of k so
    per-partition state stays O(k) regardless of row count), and
    survivors share weight partition_rows / k. Collect size is
    O(input_partitions × _SAMPLE_PER_BUCKET), independent of row count
    — the same bounded class as split boundaries. An unlucky sample
    only skews bucket sizes (lost parallelism), never correctness:
    bucket ids stay a pure function of the collected literals."""
    if parts <= 1:
        return []
    rows = _weighted_row_sample(df, order_cols)
    if not rows:
        return []
    weighted = sorted(
        ((tuple(r[c] for c in order_cols), r[_W]) for r in rows),
        key=lambda t: _py_sort_key(t[0]),
    )
    return _pick_boundaries(weighted, parts)


def _weighted_row_sample(df: DataFrame, cols: list[str]) -> list:
    """The mapInArrow reservoir pass of ``_sample_boundaries``: returns
    collected Rows of ``cols`` plus the ``_W`` weight column
    (O(input_partitions × _SAMPLE_PER_BUCKET) rows, value-independent
    row selection — see the docstring above for the scheme)."""
    keys = df.select(*[F.col(c) for c in cols])
    k = _SAMPLE_PER_BUCKET
    from pyspark.sql import types as _T

    out_schema = _T.StructType(
        list(keys.schema.fields) + [_T.StructField(_W, _T.DoubleType())]
    )

    def sampler(batches):
        import numpy as np
        import pyarrow as pa

        rng = np.random.RandomState(42)
        buf: list[pa.Table] = []  # sampled rows, exact Arrow values
        buf_w: list[np.ndarray] = []  # per-row weights
        buf_es: list[np.ndarray] = []  # per-row E-S keys u^(1/w)
        buf_rows = 0
        total = 0
        cut = False  # any E-S selection happened → equal final weights

        def compact(limit: int):
            nonlocal buf, buf_w, buf_es, buf_rows, cut
            t = buf[0] if len(buf) == 1 else pa.concat_tables(buf)
            w = np.concatenate(buf_w)
            es = np.concatenate(buf_es)
            sel = np.argsort(-es)[:limit]
            buf = [t.take(pa.array(sel))]
            buf_w = [w[sel]]
            buf_es = [es[sel]]
            buf_rows = len(sel)
            cut = True

        for batch in batches:
            n = batch.num_rows
            if n == 0:
                continue
            total += n
            take = min(k, n)
            idx = rng.choice(n, size=take, replace=False)
            t = pa.Table.from_batches([batch]).take(pa.array(idx))
            w = np.full(take, float(n) / take)
            buf.append(t)
            buf_w.append(w)
            buf_es.append(rng.random_sample(take) ** (1.0 / w))
            buf_rows += take
            if buf_rows > 8 * k:
                # running top-k by E-S key IS the final selection —
                # compacting early changes nothing and bounds memory
                compact(k)
        if total:
            if buf_rows > k:
                compact(k)
            if cut:
                # post-cut estimator weight: E-S selected rows with
                # probability ∝ w, so each survivor represents an equal
                # share of the partition
                buf = [buf[0] if len(buf) == 1 else pa.concat_tables(buf)]
                buf_w = [np.full(buf_rows, float(total) / buf_rows)]
            out = buf[0].append_column(
                _W, pa.array(np.concatenate(buf_w), type=pa.float64())
            )
            yield from out.to_batches()

    return keys.mapInArrow(sampler, schema=out_schema).collect()


def sample_boundaries_multi(
    df: DataFrame, cols: list[str], parts: int
) -> dict[str, list[tuple]]:
    """Per-column boundary tuples for EVERY listed column from ONE
    sampling job. ``_sample_boundaries`` called per column launches one
    full-column scan each — at 100 TB a 2-column ranked z-order key pays
    the table read twice just to learn its cell edges. The reservoir
    already carries whole sampled rows, so this runs the sampler once
    over all columns and derives each column's boundaries from its
    MARGINAL in the same sample (re-sorted per column, same weighted
    step-pick).

    Bit-identical to the per-column form: the reservoir's row picks and
    Efraimidis–Spirakis keys depend only on the batch-size stream (fixed
    seed, value-independent), and Arrow batches are row-count-sliced —
    so the one-pass sample selects exactly the rows each per-column run
    would, and per-column quantiles over the same rows are the same
    literals (pinned by ``tests/test_layout.py``)."""
    if parts <= 1:
        return {c: [] for c in cols}
    rows = _weighted_row_sample(df, cols)
    out: dict[str, list[tuple]] = {}
    for c in cols:
        weighted = sorted(
            (((r[c],), r[_W]) for r in rows),
            key=lambda t: _py_sort_key(t[0]),
        )
        out[c] = _pick_boundaries(weighted, parts)
    return out


def sample_boundaries_groups(
    df: DataFrame, groups: list[list[str]], parts: int
) -> list[list[tuple]]:
    """Per-GROUP boundary tuples (multi-column order keys) from ONE
    sampling job — the tuple-key sibling of
    :func:`sample_boundaries_multi`. Multi-pass consumers whose passes
    rank the SAME corpus under different sort keys (sorted-neighborhood
    fwd/rev passes) otherwise pay one full reservoir scan per pass just
    to learn bucket edges. Row picks are value-independent (fixed-seed,
    batch-size-driven), so each group's boundaries equal what its own
    per-pass sample would pick; and boundary choice only shapes bucket
    BALANCE — global_rank's output is exact under any boundaries — so
    sharing the sample can never change results."""
    if parts <= 1:
        return [[] for _ in groups]
    cols: list[str] = []
    for g in groups:
        for c in g:
            if c not in cols:
                cols.append(c)
    rows = _weighted_row_sample(df, cols)
    out: list[list[tuple]] = []
    for g in groups:
        weighted = sorted(
            ((tuple(r[c] for c in g), r[_W]) for r in rows),
            key=lambda t: _py_sort_key(t[0]),
        )
        out.append(_pick_boundaries(weighted, parts))
    return out


def _bucket_search_expr(
    order_cols: list[str], boundaries: list[tuple], lo: int = 0, hi: int | None = None
) -> "F.Column":
    """Balanced binary-search tree of nested CASE WHENs over the sorted
    boundary literals: bucket id = count of boundaries the row's key
    exceeds. Each boundary appears at exactly one tree node, so the
    expression still has O(parts) nodes — but evaluation walks ONE
    root-to-leaf path, i.e. O(log parts) comparisons per row, vs the
    O(parts) sum-of-WHENs chain this replaced. Placement is bit-identical
    to the counting form: boundaries are strictly ascending under the
    same total order ``_key_gt`` implements (consecutive-deduped in
    ``_sample_boundaries``), so ``key > b[mid]`` implies ``key > b[i]``
    for all i <= mid and its negation implies ``not key > b[j]`` for all
    j >= mid — the search index IS the exceed-count. ``_key_gt``'s
    three-valued NULL fallthrough (NULL compare → otherwise-branch →
    lower half) is exactly NULLS-FIRST, unchanged."""
    if hi is None:
        hi = len(boundaries)
    if lo == hi:
        return F.lit(lo)
    mid = (lo + hi) // 2
    return F.when(
        _key_gt(order_cols, boundaries[mid]),
        _bucket_search_expr(order_cols, boundaries, mid + 1, hi),
    ).otherwise(_bucket_search_expr(order_cols, boundaries, lo, mid))


#: max boundary literals whose comparison code shares ONE generated
#: method. HotSpot refuses to JIT-compile methods past ~8000 bytecodes
#: (-XX:DontCompileHugeMethods); a single CASE tree past ~32 boundaries
#: crossed that limit and ran as interpreted bytecode — a measured ~6x
#: per-row constant (docs/SCALE.md). 32 keeps every method comfortably
#: inside the compile limit with the two-column keys the kernel sees.
_JIT_GROUP = 32


def _attach_exceed_count(
    df: DataFrame, order_cols: list[str], boundaries: list[tuple], out_col: str
) -> DataFrame:
    """Attach ``out_col`` = count of ``boundaries`` the row's key exceeds,
    keeping every generated codegen method under the HotSpot JIT limit.

    ≤ ``_JIT_GROUP`` boundaries: one binary-search CASE tree (one method,
    compiles). Beyond that, a MULTI-LEVEL form: boundaries split into
    groups of ``_JIT_GROUP``; a coarse pass (recursing on the group-end
    boundaries, so arbitrarily many groups stay JIT-safe too) yields the
    group index; then a CHAIN of Projects — one per group, each holding
    only that group's ≤ _JIT_GROUP-boundary subtree — resolves the count
    within the matched group. Exceed-count arithmetic keeps placement
    bit-identical to the single tree: boundaries are strictly ascending,
    so exceeding a group's END boundary implies exceeding the whole
    group, the coarse index c fixes c × _JIT_GROUP exceeded boundaries,
    and only group c's interior needs comparing (its end boundary is
    provably not exceeded and is skipped).

    Why a chain of Projects instead of one CASE over all subtrees:
    whole-stage codegen inlines every expression of a Project into one
    consume method (expression-level splitting is disabled when inputs
    arrive as codegen variables), so a single expression re-creates the
    8 KB cliff no matter how it is factored. Separate Project operators
    each get their OWN consume method (codegen splits per operator), so
    each method carries one subtree. Each chain link re-references the
    accumulator column twice (``when(prev.isNotNull(), prev)``) — a
    non-cheap expression consumed twice is exactly what stops Catalyst's
    CollapseProject from folding the chain back into one giant
    expression. Per-row cost: one coarse tree walk + one group-count
    null-check per group + one subtree walk — O(parts/_JIT_GROUP)
    null-checks dominate asymptotically but are single branch
    instructions; measured cost stays at the JIT-compiled floor where
    the one-method tree ran 6x slower interpreted (docs/SCALE.md)."""
    n = len(boundaries)
    if n <= _JIT_GROUP:
        return df.withColumn(
            out_col, _bucket_search_expr(order_cols, boundaries).cast("int")
        )
    s = _JIT_GROUP
    n_groups = -(-n // s)
    ends = [boundaries[min((g + 1) * s - 1, n - 1)] for g in range(n_groups - 1)]
    ccol, fcol = f"{out_col}_c", f"{out_col}_f"
    df = _attach_exceed_count(df, order_cols, ends, ccol)
    df = df.withColumn(fcol, F.lit(None).cast("int"))
    for g in range(n_groups):
        lo, hi = g * s, min((g + 1) * s, n)
        if g < n_groups - 1:
            hi -= 1  # the group-end boundary is never exceeded inside g
        subtree = _bucket_search_expr(order_cols, boundaries[lo:hi]).cast("int")
        prev = F.col(fcol)
        df = df.withColumn(
            fcol,
            F.when(prev.isNotNull(), prev).otherwise(
                F.when(F.col(ccol) == g, subtree)
            ),
        )
    return df.withColumn(
        out_col, (F.col(ccol) * s + F.col(fcol)).cast("int")
    ).drop(ccol, fcol)


def _bucketed_once(
    df: DataFrame,
    order_cols: list[str],
    parts: int | None = None,
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Attach ``__rank_pid``: the count of sampled boundary tuples the
    row's key exceeds — a pure expression (binary-search CASE trees, see
    ``_attach_exceed_count``), so every job (stats, output, task retries)
    computes the identical placement with no pinning.

    Per-row comparison cost is O(log parts × len(order_cols)) — each
    lookup walks one root-to-leaf path — and past ``_JIT_GROUP``
    boundaries the expression is factored across Project operators so
    every generated method stays JIT-compilable; ``parts`` can track
    cluster core counts (hundreds+) without bucket placement becoming a
    per-row CPU constant on the corpus's one exchange path. Bucket ids
    feed a hash exchange, so more buckets than cores still buys nothing;
    default stays defaultParallelism."""
    if parts is None:
        parts = df.sparkSession.sparkContext.defaultParallelism
    if boundaries is None:
        boundaries = _sample_boundaries(df, order_cols, parts)
    return _attach_exceed_count(df, order_cols, boundaries, _PID)


# round-5 name, kept as an alias for external references/tests
_partitioned_once = _bucketed_once

# Public names for the two kernel pieces other modules build on (the
# ranked z-order layout in writers/layout.py): same objects, stable
# contract — sampled ascending boundary tuples in, JIT-safe exceed-count
# column out. The underscore forms stay as the kernel's internal names.
sample_boundaries = _sample_boundaries
attach_exceed_count = _attach_exceed_count


#: the offsets relation holds one row per bucket (≤ defaultParallelism by
#: construction) — a constant-partition window over it is bounded, the
#: same class as split boundaries. The key is
#: parallelism.constant_partition_key (the ONE definition of the
#: constant-but-unfoldable idiom): a foldable ``lit(0)`` would be
#: optimized out of the spec, re-planning ``Exchange SinglePartition``
#: and re-emitting WindowExec's "No Partition Defined" warning
def _offsets_window() -> Window:
    from as_etl_storage_spark.operators.parallelism import (
        constant_partition_key,
    )

    return (
        Window.partitionBy(constant_partition_key(F.col(_PID)))
        .orderBy(_PID)
        .rowsBetween(Window.unboundedPreceding, -1)
    )


#: sibling of :func:`_offsets_window` for grand totals over the same tiny
#: stats exchange: unbounded frame, same constant key
def _totals_window() -> Window:
    from as_etl_storage_spark.operators.parallelism import (
        constant_partition_key,
    )

    return Window.partitionBy(constant_partition_key(F.col(_PID)))


def _ranked(
    df: DataFrame,
    order_cols: list[str],
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Shared kernel: the input frame plus ``global_rank`` and
    ``__rank_total`` (global row count, long) columns. The corpus moves
    through exactly ONE hash exchange (the bucket id feeding the local
    row_number window); per-bucket counts come from a separate groupBy
    lineage whose map-side partial aggregation shuffles ≤ parts rows per
    input partition — never corpus bytes. The ≤ parts-row stats then run
    the bounded offsets window (cumulative offset + grand total on the
    same tiny exchange) and broadcast-join back — zero driver collects,
    zero single-partition exchanges anywhere in the plan."""
    rp = _bucketed_once(df, order_cols, boundaries=boundaries)
    w_local = Window.partitionBy(_PID).orderBy(*order_cols)
    ann = rp.withColumn(_LOCAL, F.row_number().over(w_local))
    stats = rp.groupBy(_PID).agg(F.count(F.lit(1)).alias(_BCNT))
    w_all = _totals_window()
    offs = stats.withColumn(
        _OFFSET,
        F.coalesce(F.sum(_BCNT).over(_offsets_window()), F.lit(0)).cast(
            "long"
        ),
    ).withColumn("__rank_total", F.sum(_BCNT).over(w_all).cast("long"))
    return (
        ann.join(F.broadcast(offs.select(_PID, _OFFSET, "__rank_total")), _PID)
        .withColumn("global_rank", F.col(_OFFSET) + F.col(_LOCAL))
        .drop(_PID, _LOCAL, _OFFSET)
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    boundaries: list[tuple] | None = None,
) -> DataFrame:
    """Add a ``global_rank`` column (1-based, row_number semantics) ordered
    by ``order_cols`` — which must form a unique total order (append a key
    column as tie-break) — without ever collapsing data to one partition.
    Costs two jobs: the boundary sample and the caller's action.
    ``boundaries`` (from :func:`sample_boundaries_groups`) skips the
    sample job — multi-pass callers feed every pass from one scan; ranks
    are exact under any boundary set."""
    return _ranked(df, order_cols, boundaries).drop("__rank_total")


def global_rank_with_total(df: DataFrame, order_cols: list[str]) -> DataFrame:
    """:func:`global_rank` plus a ``__rank_total`` column carrying the
    global row count (long) on every row — recovered from the rank's own
    per-bucket stats and attached via the same broadcast join, so callers
    that need N in an expression (modulo picks, ntile sizing) stay fully
    in-plan with no count() job and no single-partition aggregate."""
    return _ranked(df, order_cols)


def global_ntile(df: DataFrame, order_cols: list[str], n: int) -> DataFrame:
    """Add a ``bucket`` column with exact SQL ``ntile(n)`` semantics (the
    first ``total % n`` buckets hold one extra row) over the global order,
    built on global_rank — no single-partition exchange anywhere, and the
    total-count arithmetic stays in-plan (the total rides the broadcast
    offsets row, exact integer expressions)."""
    if n < 1:
        # fail fast: in-plan `DIV n` would defer this to a NULL bucket
        # (non-ANSI) or an executor-side DivideByZeroException (ANSI),
        # far from the bad call site
        raise ValueError(f"ntile bucket count must be >= 1, got {n}")
    out = _ranked(df, order_cols)
    total = F.col("__rank_total")
    base = F.expr(f"__rank_total DIV {n}")
    rem = total % n
    big = rem * (base + 1)
    r = F.col("global_rank")
    base1 = F.greatest(base, F.lit(1))
    bucket = F.when(
        rem > 0,
        F.when(r <= big, F.ceil(r / (base + 1))).otherwise(
            rem + F.ceil((r - big) / base1)
        ),
    ).otherwise(F.ceil(r / base1))
    return out.withColumn("bucket", bucket.cast("int")).drop("__rank_total")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    total_col: str | None = None,
) -> DataFrame:
    """Prefix sum of ``value_col`` over a global order — the scale-safe
    form of ``sum(v) OVER (ORDER BY …)``, which would single-partition the
    relation. Boundary-literal bucketing on the order key (unique total
    order required); local windowed cumsum and per-bucket sums share one
    hash exchange; the ≤ parts-row bucket stats cumulate in the bounded
    offsets window and broadcast-join back. Bit-identical to the
    single-partition window for any unique order because the per-bucket
    sums are exact (use integer/decimal value columns; float would
    reintroduce order-dependence).

    ``total_col``: optionally attach the exact global sum of
    ``value_col`` as a column — recovered from the prefix sum's own
    per-bucket stats and attached via the same broadcast join, so
    callers that filter against a fraction of the corpus total (budget
    selection) stay fully in-plan instead of paying a separate aggregate
    job over what may be an expensive upstream lineage."""
    rp = _bucketed_once(df, order_cols)
    # offsets carry the SUM type (long for integers, Decimal for decimal
    # value columns — the docstring's contract), not a hardcoded long
    sum_type = rp.select(F.sum(value_col).alias("s")).schema["s"].dataType
    w_local = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ann = rp.withColumn("__rank_lsum", F.sum(value_col).over(w_local))
    # per-bucket sums via groupBy: map-side partial aggregation shuffles
    # ≤ parts rows per input partition, never corpus bytes
    stats = rp.groupBy(_PID).agg(
        F.sum(value_col).alias("__rank_bsum"),
        F.count(value_col).alias("__rank_bnn"),
    )
    w_off = _offsets_window()
    offs = stats.withColumn(
        _OFFSET, F.sum("__rank_bsum").over(w_off).cast(sum_type)
    ).withColumn(
        "__rank_prior", F.coalesce(F.sum("__rank_bnn").over(w_off), F.lit(0))
    )
    bcast_cols = [_PID, _OFFSET, "__rank_prior"]
    if total_col is not None:
        w_all = _totals_window()
        offs = offs.withColumn(
            total_col, F.sum("__rank_bsum").over(w_all).cast(sum_type)
        )
        bcast_cols.append(total_col)
    joined = ann.join(F.broadcast(offs.select(*bcast_cols)), _PID)
    local = F.col("__rank_lsum")
    zero = F.lit(0).cast(sum_type)
    # SQL window-sum NULL semantics: the running sum is NULL only while NO
    # non-null value has been seen anywhere in the global prefix
    out = F.when(
        local.isNull() & (F.col("__rank_prior") == 0), F.lit(None)
    ).otherwise(F.coalesce(F.col(_OFFSET), zero) + F.coalesce(local, F.lit(0)))
    return joined.withColumn(out_col, out).drop(
        _PID, _OFFSET, "__rank_lsum", "__rank_prior"
    )
