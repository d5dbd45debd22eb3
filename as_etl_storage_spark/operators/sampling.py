"""Deterministic corpus re-sampling — the mixing step a training-data
pipeline runs after profiling (see the ``q_data_mix_report`` contract
query): given a grouped corpus, downsample every group toward a target so
no source/language dominates the mix.

No RNG anywhere: membership is a pure function of the row id via the
cross-engine md5 hash (functions.md5_prefix64), so reruns, retries and
partial re-ingests keep exactly the same rows — the property that makes
distributed sampling reproducible and the oracle hash-checkable.

The keep decision is an exact integer comparison (bucket * n_group <
buckets * n_target), the same cross-multiplication trick as
``functions.ratio_at_least`` — no float threshold, so engines can never
disagree at the boundary.

Scale: one count aggregation per group (map-side combined), the per-group
counts broadcast back, and one hash+compare per row in the scan — the
corpus is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from as_etl_storage_spark.functions import md5_prefix64

#: hash-space granularity of the keep decision; rates resolve to 1e-6
BUCKETS = 1_000_000


def rebalance_to_min_group(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    buckets: int = BUCKETS,
) -> DataFrame:
    """Downsample every group to ~the size of the smallest group.

    A row is kept iff ``hash_bucket(id) * n_group < buckets * n_min`` —
    i.e. with probability n_min/n_group, deterministically in the row id.
    The smallest group keeps every row; expected post-sample sizes are
    equal across groups (the uniform-mix special case of mix targeting).
    """
    per = df.groupBy(*group_cols).agg(F.count("*").alias("n_g"))
    n_min = per.agg(F.min("n_g").alias("n_min"))
    bucket = F.pmod(md5_prefix64(F.col(id_col).cast("string")), F.lit(buckets))
    return (
        df.join(F.broadcast(per), group_cols)
        .crossJoin(F.broadcast(n_min))
        .where(bucket * F.col("n_g") < F.lit(buckets) * F.col("n_min"))
        .select(*df.columns)
    )


def sample_to_rates(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    rates: dict[tuple | str, float],
    default_rate: float = 1.0,
    buckets: int = BUCKETS,
) -> DataFrame:
    """Per-group deterministic sampling at explicit rates (a mixing table:
    e.g. {'src3': 0.1} keeps ~10% of src3 and everything else). Rates are
    quantized to 1/buckets and applied as exact integer thresholds.

    Single group column: keys are the column's values. Multiple group
    columns: keys are tuples in ``group_cols`` order — a key of the wrong
    arity raises (a short key would otherwise compare a column against
    NULL, never match, and silently sample that group at the default
    rate: a config typo must not change the mix without a sound).
    """
    quantized = {
        k if isinstance(k, tuple) else (k,): int(round(r * buckets))
        for k, r in rates.items()
    }
    for key in quantized:
        if len(key) != len(group_cols):
            raise ValueError(
                f"rate key {key!r} has {len(key)} parts but group_cols "
                f"{group_cols} has {len(group_cols)} — keys must match "
                f"group_cols arity exactly"
            )
    default_q = int(round(default_rate * buckets))
    threshold = F.lit(default_q)
    for key, q in quantized.items():
        match = F.lit(True)
        for col, val in zip(group_cols, key):
            match = match & (F.col(col) == F.lit(val))
        threshold = F.when(match, F.lit(q)).otherwise(threshold)
    bucket = F.pmod(md5_prefix64(F.col(id_col).cast("string")), F.lit(buckets))
    return df.where(bucket < threshold)


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_cols: list[str],
    # 1e3 (not BUCKETS=1e6): the squared compare multiplies bucket^2 by
    # n_g, and 1e6^2 * n_g overflows int64 once a group passes ~9e6 rows;
    # 1e3^2 keeps exact arithmetic to ~9e12-row groups at 0.1% rate
    # granularity — the right trade for a 100 TB corpus
    buckets: int = 1_000,
) -> DataFrame:
    """Temperature-based mix flattening at alpha = 0.5 — the standard
    multilingual-LLM rebalance (sample share ∝ n_g^alpha): high-resource
    groups are downsampled, low-resource groups kept whole, so the mix
    flattens without starving big groups the way uniform rebalance does.

    At alpha = 0.5 the feasibility-maximal per-group keep rate reduces to
    ``sqrt(n_min / n_g)`` (each group lands at sqrt(n_min * n_g) rows:
    the geometric mean of itself and the smallest group). The square-root
    threshold is applied WITHOUT floats: keep iff
    ``bucket(id)^2 * n_g < buckets^2 * n_min`` — squaring the rate
    inequality keeps everything in exact 64-bit integers, so engines can
    never disagree at the boundary (the same cross-multiplication idea as
    rebalance_to_min_group, one power higher).

    Scale: identical shape to rebalance_to_min_group — one per-group
    count aggregation broadcast back, one hash+compare per row in the
    scan; the corpus is never shuffled."""
    per = df.groupBy(*group_cols).agg(F.count("*").alias("n_g"))
    n_min = per.agg(F.min("n_g").alias("n_min"))
    bucket = F.pmod(md5_prefix64(F.col(id_col).cast("string")), F.lit(buckets))
    return (
        df.join(F.broadcast(per), group_cols)
        .crossJoin(F.broadcast(n_min))
        .where(
            bucket * bucket * F.col("n_g")
            < F.lit(buckets) * F.lit(buckets) * F.col("n_min")
        )
        .select(*df.columns)
    )


def negative_samples(
    df: DataFrame,
    id_col: str,
    anchor_pred: str,
    m: int = 4,
    seed: int = 1,
) -> DataFrame:
    """Deterministic in-batch negative sampling for contrastive training:
    for every anchor row (rows matching ``anchor_pred``), emit ``m``
    pseudo-random corpus rows as negatives. The "random" pick is a pure
    LCG over the anchor id and slot — ``((id % M) * 48271 + slot *
    1299721 + seed) % M % N`` with M = 2^31-1 — exact 64-bit integer
    arithmetic both engines evaluate identically (products stay < 2^47,
    no overflow under ANSI), so reruns and the oracle produce the same
    pairs. Accidental positives (negative == anchor) are dropped, the
    standard in-batch-negative correction.

    Scale: the corpus index comes from operators/rank.global_rank
    (boundary-literal buckets + broadcast offsets — never a
    single-partition window); the pick join is an equi-join on the dense
    index. ``anchor_pred`` may reference ANY column of ``df`` (e.g.
    ``lang = 'en'``): it filters the full frame, and only the surviving
    ids semi-join into the ranked index. The corpus size N rides the
    rank's broadcast offsets join as a column, not a driver collect — an
    empty corpus yields zero anchors, so ``% N`` never evaluates
    against 0.
    Corpus scanned three times (index, anchor filter, pick join),
    anchors × m rows shuffled — linear, skew-free (LCG spreads picks
    uniformly)."""
    from as_etl_storage_spark.operators.rank import global_rank_with_total

    M = 2147483647
    # the rank kernel's per-bucket stats already carry the corpus size —
    # no second count() job; it rides the broadcast offsets row as the
    # __rank_total column
    indexed = global_rank_with_total(df.select(F.col(id_col)), [id_col])
    # fast path: a predicate that resolves against the id column alone
    # (the common contrastive case, e.g. "doc_id % 20 = 0") filters the
    # ranked index directly — no third corpus scan, no semi-join shuffle.
    # Predicates referencing other columns fall back to filtering the
    # full frame and semi-joining the surviving ids in.
    try:
        df.select(F.col(id_col)).where(anchor_pred).schema
        filtered = indexed.where(anchor_pred)
    except Exception:
        filtered = indexed.join(
            df.where(anchor_pred).select(id_col), id_col, "left_semi"
        )
    anchors = (
        filtered
        .select(F.col(id_col).alias("anchor_id"), "__rank_total")
        .select(
            "anchor_id",
            F.explode(F.expr(f"sequence(1, {m})")).alias("neg_slot"),
            "__rank_total",
        )
    )
    pick = (
        (
            (F.col("anchor_id") % M) * 48271
            + (F.col("neg_slot") * 1299721 + F.lit(seed))
        )
        % M
        % F.col("__rank_total")
        + 1
    )
    neg = indexed.select(
        F.col(id_col).alias("neg_id"), F.col("global_rank").alias("neg_gr")
    )
    return (
        anchors.withColumn("neg_gr", pick)
        .drop("__rank_total")
        .join(neg, "neg_gr")
        .where(F.col("neg_id") != F.col("anchor_id"))
        .select("anchor_id", "neg_slot", "neg_id")
    )
