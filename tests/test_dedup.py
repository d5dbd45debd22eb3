"""Dedup-operator structural properties (beyond the oracle hash gate)."""

def test_semantic_blocked_subset_of_allpairs(spark, sf_dir):
    # blocking only prunes: every centroid-blocked pair must also appear
    # in the exact all-pairs result at the same threshold
    from as_etl_storage_spark.operators.dedup import (
        embedding_cosine_pairs,
        semantic_dedup_pairs,
    )
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    blocked = semantic_dedup_pairs(emb, "vec_id", "embedding", 8, 0.45)
    exact = embedding_cosine_pairs(emb, "vec_id", "embedding", 0.45)
    assert blocked.count() > 0
    assert blocked.exceptAll(exact).count() == 0
