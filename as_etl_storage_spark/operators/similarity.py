"""Approximate-nearest-neighbor search over an embedding column.

Two strategies:
  * cosine_topk       — brute-force exact top-k: the correctness baseline.
                        Cost O(|queries| x |corpus|); distributed as a
                        broadcast of the (small) query set against the
                        partitioned corpus, so no shuffle of the corpus.
  * lsh_bucket_topk   — the scale path: sign-bit LSH (axis-aligned
                        hyperplanes through dims 0..n_bits-1) buckets the
                        corpus; search only within the query's bucket.
                        Deterministic (no random projections) so results are
                        reproducible and SQL-expressible for the oracle. At
                        100 TB swap the axis-aligned planes for learned IVF
                        centroids; the plumbing (bucket column, bucketed
                        join, within-bucket rank) is identical.

Output contains id pairs + integer rank only — float scores stay internal
(comparison robustness; see queries/__init__ determinism policy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from as_etl_storage_spark.functions import vec_dot as _dot, vec_norm as _norm


def _prepared(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("norm", _norm(F.col("v")))


def cosine_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_pred: str,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row (rows satisfying
    query_pred) against the whole corpus. The query side is broadcast —
    the corpus is scanned once, never shuffled."""
    corpus = _prepared(df, id_col, vec_col)
    queries = corpus.where(query_pred).select(
        F.col("vid").alias("qid"), F.col("v").alias("qv"), F.col("norm").alias("qn")
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("qid") != F.col("vid"))
        .select("qid", "vid", cos.alias("cos"))
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def knn_label_vote(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    label_col: str,
    k: int,
    query_pred: str,
) -> DataFrame:
    """kNN classification eval: predict each query vector's label by
    majority vote over its k exact cosine neighbors (tie-break: smaller
    label wins). Returns (query_id, true_label, pred_label) — join-ready
    for a confusion matrix / accuracy aggregate.

    Plan shape matches cosine_topk: the query set broadcasts, the corpus is
    scanned once with no shuffle; the vote is a tiny per-query aggregate."""
    corpus = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.col(label_col).alias("nlabel"),
    ).withColumn("norm", _norm(F.col("v")))
    queries = corpus.where(query_pred).select(
        F.col("vid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        F.col("nlabel").alias("true_label"),
    )
    cos = _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))
    scored = (
        F.broadcast(queries)
        .join(corpus, F.col("qid") != F.col("vid"))
        .select("qid", "true_label", "nlabel", cos.alias("cos"), "vid")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    top = scored.withColumn("rnk", F.row_number().over(w)).where(
        F.col("rnk") <= k
    )
    votes = top.groupBy("qid", "true_label", "nlabel").agg(
        F.count("*").alias("c")
    )
    vw = Window.partitionBy("qid").orderBy(F.col("c").desc(), F.col("nlabel"))
    return (
        votes.withColumn("r", F.row_number().over(vw))
        .where(F.col("r") == 1)
        .select(
            F.col("qid").alias("query_id"),
            "true_label",
            F.col("nlabel").alias("pred_label"),
        )
    )


def sign_bucket(v: Column, n_bits: int = 8) -> Column:
    """Deterministic LSH bucket: sign bits of the first n_bits dimensions
    (axis-aligned hyperplanes). 2^n_bits buckets."""
    bucket = F.lit(0)
    for d in range(n_bits):
        bucket = bucket + F.when(v.getItem(d) >= 0, F.lit(1 << d)).otherwise(0)
    return bucket


def lsh_bucket_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_bits: int = 8,
) -> DataFrame:
    """Bucketed ANN: rank neighbors within each vector's sign-bit bucket.
    The self-join key is the bucket id — candidate set shrinks ~2^n_bits x.
    Recall depends on bucket granularity (IVF-style tradeoff)."""
    e = _prepared(df, id_col, vec_col).withColumn(
        "bucket", sign_bucket(F.col("v"), n_bits)
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vid") != F.col("b.vid")),
        )
        .select(
            F.col("a.vid").alias("qid"),
            F.col("a.bucket").alias("bucket"),
            F.col("b.vid").alias("vid"),
            cos.alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "bucket",
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def ivf_assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int = 16,
) -> DataFrame:
    """IVF coarse quantizer: assign every vector to its nearest centroid.

    Centroids are the vectors with the ``n_centroids`` smallest ids —
    deterministic seeding (k-means++ init and Lloyd iterations would make
    centroids float-accumulation order-dependent; for a reproducible,
    oracle-checkable building block the seeded assignment IS the quantizer;
    production swaps in trained centroids, the plan is identical).

    Plan: broadcast the tiny centroid set against the corpus (no corpus
    shuffle), rank by cosine with unique tie-break."""
    corpus = _prepared(df, id_col, vec_col)
    centroids = corpus.where(F.col("vid") < n_centroids).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv"), F.col("norm").alias("cn")
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cn"))
    scored = corpus.join(F.broadcast(centroids)).select(
        "vid", "cid", cos.alias("cos")
    )
    w = Window.partitionBy("vid").orderBy(F.col("cos").desc(), F.col("cid"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") == 1)
        .select(F.col("vid").alias("vec_id"), F.col("cid").alias("centroid_id"))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_centroids: int = 16,
) -> DataFrame:
    """IVF search with nprobe=1: each vector's neighbors are ranked only
    within its centroid's inverted list. Candidate set shrinks ~n_centroids
    times vs brute force; the join key is the centroid id (equi-join, AQE
    handles list-size skew)."""
    assign = ivf_assign(df, id_col, vec_col, n_centroids)
    e = _prepared(df, id_col, vec_col).join(
        assign.select(F.col("vec_id").alias("vid"), "centroid_id"), "vid"
    )
    a = e.alias("a")
    b = e.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (F.col("a.norm") * F.col("b.norm"))
    scored = a.join(
        b,
        (F.col("a.centroid_id") == F.col("b.centroid_id"))
        & (F.col("a.vid") != F.col("b.vid")),
    ).select(
        F.col("a.vid").alias("qid"),
        F.col("a.centroid_id").alias("centroid_id"),
        F.col("b.vid").alias("vid"),
        cos.alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "centroid_id",
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )


def cosine_topk_vectorized(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    query_pred: str,
) -> DataFrame:
    """Numpy-vectorized variant of cosine_topk: the (small) query set is
    collected into one normalized matrix Q and closed over; each corpus
    Arrow batch scores against ALL queries with a single BLAS matmul
    (batch x dim) @ (dim x |Q|), keeping per-query local top-k before the
    final global WindowGroupLimit rank.

    Same plan skeleton as cosine_topk (corpus scanned once, never
    shuffled; shuffle volume ~ |Q| x k x partitions). For wide vectors the
    matmul beats the per-row JVM fold by an order of magnitude — this is
    the production path for 768-d embeddings; the JVM form stays as the
    pure-SQL baseline. Float summation order differs from the sequential
    fold (SIMD pairwise), so near-tie ranks can flip in the last ulp —
    equality with the JVM variant is asserted on the fixture in tests, but
    this variant is deliberately NOT oracle-hash-gated."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator as _It

    corpus = _prepared(df, id_col, vec_col)
    qrows = corpus.where(query_pred).collect()
    qids = np.array([r["vid"] for r in qrows], dtype="int64")
    qm = np.array([r["v"] for r in qrows], dtype="float64")
    qm = qm / np.linalg.norm(qm, axis=1, keepdims=True)

    out_schema = "qid long, vid long, cos double"

    def score(batches: _It[pd.DataFrame]) -> _It[pd.DataFrame]:
        for pdf in batches:
            m = np.array(list(pdf["v"]), dtype="float64")
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            sims = m @ qm.T  # (batch, |Q|)
            vids = pdf["vid"].to_numpy()
            take = min(k + 1, len(vids))
            # per-batch local top-(k+1) per query (self may rank)
            idx = np.argpartition(-sims, take - 1, axis=0)[:take]
            rows = {"qid": [], "vid": [], "cos": []}
            for j in range(sims.shape[1]):
                for i in idx[:, j]:
                    if vids[i] != qids[j]:
                        rows["qid"].append(qids[j])
                        rows["vid"].append(int(vids[i]))
                        rows["cos"].append(float(sims[i, j]))
            yield pd.DataFrame(rows)

    local = corpus.select("vid", "v").mapInPandas(score, out_schema)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))
    return (
        local.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vid").alias("neighbor_id"),
            "rank",
        )
    )
