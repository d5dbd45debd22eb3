"""Skew-resilient aggregation — the salting pattern as a reusable operator.

A groupBy on a low-cardinality or power-law key sends each key's entire
row set to one reducer; at 100 TB one hot key stalls the stage. Salting
splits every key into ``n_salts`` subkeys for a first partial aggregation,
then re-aggregates the partials — two small shuffles instead of one skewed
one. (AQE's skew-join handling covers joins; aggregation salting is still
manual in Spark.)

The salt derives from a value column hash — deterministic, so partial
results are reproducible — but ANY salt assignment yields identical final
results because the second phase re-combines algebraically (counts/sums).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_sum_count(
    df: DataFrame,
    key_cols: list[str],
    value_expr: Column,
    value_alias: str,
    n_salts: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase salted aggregation producing count(*) and sum(value_expr)
    per key. ``value_expr`` should be exact-typed (decimal/integer) so the
    re-aggregation is order-independent."""
    salt_col = F.pmod(
        F.xxhash64(salt_source if salt_source else key_cols[0]), F.lit(n_salts)
    )
    phase1 = (
        df.withColumn("_salt", salt_col)
        .groupBy(*key_cols, "_salt")
        .agg(F.count("*").alias("_n"), F.sum(value_expr).alias("_s"))
    )
    return phase1.groupBy(*key_cols).agg(
        F.sum("_n").alias("n"),
        F.sum("_s").alias(value_alias),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Hot-key equi-join salting: the big side gets a deterministic per-row
    salt (hash of the full row), the small side is replicated once per salt
    value, and the join key becomes (key..., salt) — a hot key's rows now
    spread over ``n_salts`` reducers instead of stalling one.

    Result is exactly the plain join (every big row meets every matching
    small row exactly once — the small side carries all salts). Use when
    AQE's skew-join splitting can't apply (e.g. the skewed side feeds a
    co-partitioned downstream op). Replication cost: |small| x n_salts —
    keep the small side small or n_salts modest."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    big_s = big.withColumn("_salt", salt.cast("int"))
    small_s = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return big_s.join(small_s, on + ["_salt"], "inner").drop("_salt")
