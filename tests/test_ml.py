"""Deterministic k-means (operators/ml.py): partition-invariance and
recovery of well-separated clusters."""

from __future__ import annotations

from pyspark.sql import functions as F

from as_etl_storage_spark.operators.ml import kmeans_assign, kmeans_validated


def _blobs(spark):
    # two well-separated blobs in 3-d; ids 0..5 land in blob A, 6..11 in B
    rows = [(i, [0.0 + 0.01 * i, 1.0, 2.0]) for i in range(6)] + [
        (i, [10.0 + 0.01 * i, -5.0, 7.0]) for i in range(6, 12)
    ]
    return spark.createDataFrame(rows, "vid_in: long, vec: array<double>")


def test_kmeans_partitioning_invariant(spark):
    df = _blobs(spark)
    a = kmeans_assign(df.repartition(1), "vid_in", "vec", k=2, iters=2)
    b = kmeans_assign(df.repartition(7), "vid_in", "vec", k=2, iters=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_kmeans_recovers_separated_blobs(spark):
    df = _blobs(spark)
    got = {
        r["vid"]: r["cluster_id"]
        for r in kmeans_assign(df, "vid_in", "vec", k=2, iters=3).collect()
    }
    blob_a = {got[i] for i in range(6)}
    blob_b = {got[i] for i in range(6, 12)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_kmeans_validated_flags(spark):
    df = _blobs(spark)
    row = kmeans_validated(df, "vid_in", "vec", k=2, iters=2).collect()[0]
    assert row["n_points"] == 12
    assert row["n_clusters_ok"] and row["all_assigned"] and row["obj_decreased"]


def test_kmeans_empty_cluster_keeps_centroid(spark):
    # k=3 but only two real blobs: centroid 2 may lose every point; the
    # run must still assign all rows and keep the cluster count in [1, k]
    df = _blobs(spark)
    row = kmeans_validated(df, "vid_in", "vec", k=3, iters=2).collect()[0]
    assert row["n_points"] == 12 and row["n_clusters_ok"]


def test_kmeans_impls_agree(spark):
    # vectorized (BLAS matmul) and jvm (sequential fold) assignment paths
    # produce identical clusterings on well-separated data, and identical
    # validation booleans always
    df = _blobs(spark)
    a = kmeans_assign(df, "vid_in", "vec", k=2, iters=2, impl="vectorized")
    b = kmeans_assign(df, "vid_in", "vec", k=2, iters=2, impl="jvm")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    va = kmeans_validated(df, "vid_in", "vec", k=2, iters=2, impl="vectorized")
    vb = kmeans_validated(df, "vid_in", "vec", k=2, iters=2, impl="jvm")
    assert va.collect() == vb.collect()


def test_update_np_matches_decimal_update(spark):
    """The shuffle-free vectorized centroid update must agree with the
    decimal-exact declarative one to float tolerance (same means, same
    empty-cluster carryover)."""
    import numpy as np

    from as_etl_storage_spark.operators.ml import (
        _assign,
        _prepared,
        _update,
        _update_np,
    )
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = _prepared(emb, "vec_id", "embedding")
    from pyspark.sql import functions as F

    cents = corpus.where(F.col("vid") < 8).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    assigned = _assign(corpus, cents)
    exact = {r["cid"]: np.array(r["cv"]) for r in _update(assigned, cents).collect()}
    fast = {
        r["cid"]: np.array(r["cv"])
        for r in _update_np(assigned, cents.collect()).collect()
    }
    assert sorted(exact) == sorted(fast)
    # the declarative path quantizes each addend to decimal(28,10), so the
    # two means legitimately differ by up to ~1e-10 per dimension
    for cid in exact:
        np.testing.assert_allclose(fast[cid], exact[cid], rtol=0, atol=1e-9)


def test_update_np_zero_corpus_shuffle(spark):
    """The corpus never shuffles in the vectorized update: the partial-sum
    projection contains no Exchange at all, and the full update plan's only
    hash exchange is the groupBy(cid) over the <= partitions x k partial
    rows (in-plan combine — no driver collect of partials)."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.ml import (
        _assign_np,
        _prepared,
        _update_np,
    )
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = _prepared(emb, "vec_id", "embedding")
    cents = corpus.where(F.col("vid") < 8).select(
        F.col("vid").alias("cid"), F.col("v").alias("cv")
    )
    assigned = _assign_np(corpus, cents.collect())
    partial_plan = (
        assigned.select("cid", "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in partial_plan
    plan = (
        _update_np(assigned, cents.collect())
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(cid" in plan


def test_kmeans_vectorized_one_collect_per_iteration(spark, monkeypatch):
    """Each vectorized Lloyd iteration collects the previous centroids
    EXACTLY once (that collect executes the prior iteration's corpus
    job; the rows feed both the assignment matmul and the update's
    fallback). Regression for the round-7 advisor finding: separate
    assign/update dispatchers each collected the same uncached centroid
    lineage, re-running every iteration's corpus job twice. Collect
    budget for iters Lloyd rounds: one per iteration + the final
    assignment's = iters + 1."""
    # patch the CLASSIC implementation class: in PySpark 4 the public
    # pyspark.sql.DataFrame is the dispatch facade and instances resolve
    # collect() on the classic subclass, bypassing a facade-level patch
    from pyspark.sql.classic.dataframe import DataFrame

    df = _blobs(spark)
    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    plan = kmeans_assign(df, "vid_in", "vec", k=2, iters=3)
    assert calls["n"] == 3 + 1, f"expected iters+1 collects, got {calls['n']}"
    monkeypatch.undo()
    assert plan.count() == 12
