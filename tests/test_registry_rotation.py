"""Driver-sample rotation (r16, ADVICE r15): the external driver grades
the first 50 registry keys, so the registry ORDER is the sample. The
order must be mechanical — sha256(name) permutation rotated by a round
clock the repo does not write — never a hand-picked list, and over
ceil(N/50) rounds every query must receive a driver row. Pure-python:
no SparkSession needed."""

from __future__ import annotations

import glob
import os

from as_etl_storage_spark.queries import (
    ORACLES,
    QUERIES,
    _SAMPLE_WINDOW,
    _round_index,
    driver_sample_order,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_rotation_is_deterministic_and_a_permutation():
    keys = list(QUERIES)
    for rot in (0, 1, 7, 15, 16):
        order = driver_sample_order(keys, rot)
        assert sorted(order) == sorted(keys)  # permutation, nothing lost
        assert order == driver_sample_order(keys, rot)  # pure


def test_rotation_tiles_every_query_through_the_gate():
    """Consecutive rounds' 50-query windows tile the registry: within
    ceil(N/50) rounds from ANY starting rotation, every key appears in
    a window — no query can be kept out of the external gate."""
    keys = list(QUERIES)
    n = len(keys)
    rounds_to_cover = -(-n // _SAMPLE_WINDOW)  # ceil
    for start_rot in (0, 3, 16):
        seen: set = set()
        for r in range(rounds_to_cover):
            seen.update(
                driver_sample_order(keys, start_rot + r)[:_SAMPLE_WINDOW]
            )
        assert seen == set(keys)


def test_adjacent_windows_overlap_only_at_the_wrap():
    """The window really advances: consecutive rotations share keys only
    when the tail wraps past the registry end (|N mod 50| effects), so
    each round grades a genuinely fresh slice."""
    keys = list(QUERIES)
    n = len(keys)
    w0 = set(driver_sample_order(keys, 0)[:_SAMPLE_WINDOW])
    w1 = set(driver_sample_order(keys, 1)[:_SAMPLE_WINDOW])
    max_wrap_overlap = max(0, 2 * _SAMPLE_WINDOW - (n % _SAMPLE_WINDOW or n))
    assert len(w0 & w1) <= max_wrap_overlap
    if n >= 2 * _SAMPLE_WINDOW:
        assert w0 != w1


def test_round_clock_counts_driver_artifacts():
    """The rotation index is the count of driver-committed
    CORRECTNESS_r*.json files — an artifact the repo never writes, so
    the repo cannot steer which window the driver sees."""
    expected = len(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    assert _round_index() == expected
    assert expected >= 15  # this checkout has been graded 15+ rounds


def test_registry_order_is_the_current_rotation():
    """The importable QUERIES dict is exactly the rotation order for the
    current round clock — the invariant the external gate consumes."""
    assert list(QUERIES) == driver_sample_order(
        list(QUERIES), _round_index()
    )


def test_every_front_window_query_has_an_oracle_or_is_disclosed():
    """Queries without a DuckDB oracle get only the weaker rows-only
    driver check; the rotation will eventually front ALL of them, so
    keep the no-oracle set a small, known list (non-SQL-expressible
    ops), not a leak of unchecked queries."""
    no_oracle = sorted(k for k in QUERIES if k not in ORACLES)
    # every no-oracle query must be documented as such in its docstring
    for k in no_oracle:
        doc = (QUERIES[k].__doc__ or "").lower()
        assert "oracle" in doc or "rows-only" in doc, (
            f"{k} has no DuckDB oracle and no docstring disclosure"
        )
