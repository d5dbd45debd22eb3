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
