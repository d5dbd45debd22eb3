"""Split-block bloom filter unit tests: the no-false-negative contract
(the correctness-critical half), the false-positive-rate target (the
efficiency half), serialization, and the type-tag fence."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from as_etl_storage_spark.writers import bloom


def test_roundtrip_and_membership():
    vals = [f"doc-{i}" for i in range(1000)]
    blob, tag, ndv = bloom.build_column_filter(vals, 0.01)
    assert tag == bloom.TAG_STR and ndv == 1000
    flt = bloom.SplitBlockBloomFilter.from_bytes(blob)
    for v in vals:
        h, t = bloom.hash_one(v)
        assert t == tag
        assert flt.might_contain_hash(h)  # NEVER a false negative


@given(
    st.lists(
        st.one_of(
            st.integers(min_value=-(2**62), max_value=2**62),
            st.text(max_size=40),
        ),
        min_size=1,
        max_size=300,
    )
)
@settings(max_examples=60, deadline=None)
def test_no_false_negatives_property(values):
    """Hypothesis: every inserted value probes positive, for int and
    str columns alike (mixed-type lists are refused — tag None)."""
    built = bloom.build_column_filter(values, 0.05)
    tags = {bloom.canon_tag(v) for v in values}
    if len(tags) > 1:
        assert built is None  # mixed column: no filter, never half-indexed
        return
    blob, tag, _ = built
    flt = bloom.SplitBlockBloomFilter.from_bytes(blob)
    for v in values:
        h, t = bloom.hash_one(v)
        assert t == tag and flt.might_contain_hash(h)


def test_false_positive_rate_near_target():
    """Measured FPR on absent keys stays near the configured target
    (within 3x — the sizing formula is the standard bloom bound; the
    blocked layout costs a small constant factor)."""
    rng_keys = [f"present-{i}" for i in range(20_000)]
    blob, _, _ = bloom.build_column_filter(rng_keys, 0.01)
    flt = bloom.SplitBlockBloomFilter.from_bytes(blob)
    absent = [f"absent-{i}" for i in range(20_000)]
    fp = sum(
        1
        for v in absent
        if flt.might_contain_hash(bloom.hash_one(v)[0])
    )
    rate = fp / len(absent)
    assert rate < 0.03, f"measured FPR {rate:.4f} vs target 0.01"


def test_unsupported_types_and_tags():
    assert bloom.hash_one(1.5) is None          # float: excluded
    assert bloom.hash_one(None) is None
    h_int, t_int = bloom.hash_one(1)
    h_bool, t_bool = bloom.hash_one(True)
    assert t_int == bloom.TAG_INT and t_bool == bloom.TAG_BOOL
    assert h_int != h_bool  # int 1 and bool True canonicalize apart
    # all-null / all-float columns build nothing
    assert bloom.build_column_filter([None, None], 0.01) is None
    assert bloom.build_column_filter([1.0, 2.0], 0.01) is None


def test_sizing_and_dedup():
    """Sized to DISTINCT count: a million repeats of 10 keys stays a
    one-block filter."""
    blob, _, ndv = bloom.build_column_filter(
        [i % 10 for i in range(100_000)], 0.01
    )
    assert ndv == 10
    flt = bloom.SplitBlockBloomFilter.from_bytes(blob)
    assert flt.nblocks == 1
    with pytest.raises(ValueError):
        bloom.SplitBlockBloomFilter.sized_for(100, 1.5)


def test_vectorized_add_matches_scalar_probe():
    """The numpy batch insert and the scalar probe agree bit-for-bit
    (duplicate block indices must accumulate — the bitwise_or.at
    requirement)."""
    hashes = np.array(
        [bloom.hash_one(i)[0] for i in range(5000)], dtype=np.uint64
    )
    flt = bloom.SplitBlockBloomFilter(4)  # tiny: heavy block collisions
    flt.add_hashes(hashes)
    for h in hashes[:500]:
        assert flt.might_contain_hash(int(h))
