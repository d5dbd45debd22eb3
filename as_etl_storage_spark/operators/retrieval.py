"""Hybrid retrieval: fuse independent rankers (lexical BM25, vector ANN)
into one ranking with reciprocal-rank fusion — the standard first stage of
a RAG / curation stack (each ranker sees what the other misses; RRF needs
no score calibration because it consumes only integer ranks).

Scale: each input ranking is already top-n truncated (n ≪ corpus), so the
fusion join touches at most |rankers| x n rows — driver-trivial at any
corpus size; the heavy lifting stays inside the rankers, which keep their
own scale shapes (BM25: filtered token aggregation; ANN: broadcast query
scan). The fused ranking is deterministic: integer ranks in, fixed-order
float sum of exactly-rounded reciprocals, id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str,
    rank_col: str = "rank",
    k_const: int = 60,
    k: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion: ``score(d) = sum_r 1/(k_const + rank_r(d))``
    over every ranking that contains d (absent ⇒ contributes 0). Returns
    the fused top-``k`` with each source rank preserved (rank_0, rank_1,
    …; NULL where the source missed the item).

    Determinism across engines: every reciprocal is one exactly-rounded
    double division; the sum is a fixed left-to-right chain over the
    (bounded, ordered) ranker list — no shuffle-order float accumulation.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    joined = None
    for i, r in enumerate(rankings):
        part = r.select(
            F.col(id_col).alias("id"), F.col(rank_col).alias(f"rank_{i}")
        )
        joined = part if joined is None else joined.join(part, "id", "full_outer")
    score = None
    for i in range(len(rankings)):
        term = F.coalesce(
            F.lit(1.0) / (F.lit(float(k_const)) + F.col(f"rank_{i}")), F.lit(0.0)
        )
        score = term if score is None else score + term
    from as_etl_storage_spark.operators.parallelism import (
        constant_partition_key,
    )

    # constant-but-unfoldable partition key: the window input is k rows
    # (post-limit), so this is bounded either way — the key just keeps
    # the "No Partition Defined" warning out of every run's log
    w = Window.partitionBy(constant_partition_key(F.col("id"))).orderBy(
        F.col("score").desc(), F.col("id")
    )
    return (
        joined.withColumn("score", score)
        # global top-k: orderBy+limit -> TakeOrderedAndProject (map-side
        # top-k); the rank window then sees k rows only
        .orderBy(F.col("score").desc(), F.col("id"))
        .limit(k)
        .withColumn("fused_rank", F.row_number().over(w))
        .select(
            F.col("id").alias(id_col),
            *[F.col(f"rank_{i}") for i in range(len(rankings))],
            "score",
            "fused_rank",
        )
    )
