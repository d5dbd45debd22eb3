"""Partition-count invariance: the determinism claims several operators
make ("same result under any partitioning/rerun") tested directly — each
query runs under the default shuffle-partition count and again at 7 and
must produce identical row sets. Catches accidental dependence on
partition ordering (rand(), monotonically_increasing_id, first() without
order, float reduction order surfacing above the rounding grain)."""

from __future__ import annotations

import pytest

from as_etl_storage_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

#: queries whose docstrings/docs explicitly claim partition independence,
#: plus the hash-ordering ops where a violation would be silent corruption
CLAIMANTS = [
    "corpus_shuffle_shards",
    "q_weighted_sample",
    "q_hash_sample",
    "q_stratified_sample",
    "text_pack_sequences",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "text_fingerprint",
    "q_scalable_ntile",
    "seq_event_transitions",
    # round-5 claimants: trained-seed blocking derives from jvm k-means
    # centroids (decimal-exact updates + bit-stable fold distances), the
    # multi-seed union is a pair-key distinct, the composed prep pipeline
    # inherits both, and the real codecs are pure byte arithmetic
    "dedup_semantic_kmeans",
    "dedup_semantic_multiseed",
    "pipeline_training_prep",
    "mm_ppm_roundtrip",
    "mm_wav_roundtrip",
    "mm_vid_frame_sample",
]


@pytest.mark.parametrize("name", CLAIMANTS)
def test_result_independent_of_shuffle_partitions(spark, name):
    fn = QUERIES[name]
    default = spark.conf.get("spark.sql.shuffle.partitions")
    base = sorted(map(tuple, fn(spark, SF).collect()))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = sorted(map(tuple, fn(spark, SF).collect()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", default)
    assert base == alt and len(base) > 0


def test_kmeans_centroids_partition_invariant(spark):
    """The hash-stability claim behind trained-seed semantic dedup: jvm
    k-means centroids must be BIT-identical under different input
    partitionings (decimal-exact updates, sequential-fold distances)."""
    from as_etl_storage_spark.operators.ml import kmeans_centroids
    from as_etl_storage_spark.queries.common import load_table

    emb = load_table(spark, SF, "embeddings")
    a = {
        r["cid"]: tuple(r["cv"])
        for r in kmeans_centroids(
            emb.repartition(3), "vec_id", "embedding", 8, 2, impl="jvm"
        ).collect()
    }
    b = {
        r["cid"]: tuple(r["cv"])
        for r in kmeans_centroids(
            emb.repartition(17), "vec_id", "embedding", 8, 2, impl="jvm"
        ).collect()
    }
    assert a == b  # exact float equality, not approx
