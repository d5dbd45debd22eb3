"""Driver-sample rotation (r16, ADVICE r15): the external driver grades
the first 50 registry keys, so the registry ORDER is the sample. The
order must be mechanical — least-recently-graded by the driver's OWN
committed CORRECTNESS artifacts, ties by sha256 — never a hand-picked
list, and every query must receive a driver row within ceil(N/50)
rounds EVEN AS THE REGISTRY GROWS (the r16 review showed a modulo
window loses that bound under growth). Pure-python: no SparkSession."""

from __future__ import annotations

import glob
import hashlib
import os

from as_etl_storage_spark.queries import (
    ORACLES,
    QUERIES,
    _SAMPLE_WINDOW,
    _graded_history,
    driver_sample_order,
)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_order_is_deterministic_and_a_permutation():
    keys = list(QUERIES)
    hist = _graded_history(REPO_ROOT)
    order = driver_sample_order(keys, hist)
    assert sorted(order) == sorted(keys)  # permutation, nothing lost
    assert order == driver_sample_order(keys, hist)  # pure


def test_never_graded_keys_front_the_sample():
    """A newly added query has no driver row yet — it must outrank every
    graded key, so new work is graded the very next round."""
    keys = list(QUERIES)
    hist = _graded_history(REPO_ROOT)
    graded_everywhere = set().union(*hist) if hist else set()
    order = driver_sample_order(keys, hist)
    ungraded = [k for k in order if k not in graded_everywhere]
    if ungraded:
        # all ungraded keys come before all graded ones
        last_ungraded = max(order.index(k) for k in ungraded)
        first_graded = min(
            order.index(k) for k in order if k in graded_everywhere
        )
        assert last_ungraded < first_graded


def test_coverage_bound_survives_registry_growth():
    """Simulate 20 rounds of the real loop — grade the first 50, then
    ADD new queries — and assert no key ever waits longer than
    ceil(N/50) rounds between driver rows. This is the property the
    modulo-window scheme lost: growth shifts a modulo window's start
    and can skip ranks indefinitely; least-recently-graded cannot."""
    keys = [f"q{i:03d}" for i in range(264)]
    hist: list[set] = []
    last_graded = dict.fromkeys(keys, -1)
    added = 264
    for rnd in range(20):
        order = driver_sample_order(keys, hist)
        sample = set(order[:_SAMPLE_WINDOW])
        hist.append(sample)
        for k in sample:
            last_graded[k] = rnd
        # staleness check over keys that existed long enough to be due
        bound = -(-len(keys) // _SAMPLE_WINDOW)  # ceil(N/50)
        for k, lg in last_graded.items():
            assert rnd - lg <= bound, (
                f"{k} ungraded for {rnd - lg} rounds (bound {bound})"
            )
        # registry grows mid-flight (1-3 new queries per round)
        for j in range(1 + (rnd % 3)):
            keys.append(f"new_r{rnd}_{j}")
            last_graded[keys[-1]] = rnd  # fresh keys aren't 'due' yet
        added += 1 + (rnd % 3)
    assert len(keys) == added


def test_history_requires_explicit_root():
    """_graded_history takes the artifact root EXPLICITLY — there is no
    import-time default that would make module state depend on what
    artifacts happen to sit near the installed package."""
    import inspect

    params = inspect.signature(_graded_history).parameters
    assert list(params) == ["root"]
    assert params["root"].default is inspect.Parameter.empty
    assert _graded_history(os.path.join(REPO_ROOT, "tests")) == []


def test_sha_tiebreak_orders_equally_stale_keys():
    keys = ["a", "b", "c"]
    order = driver_sample_order(keys, [])  # no history: all tied at -1
    assert order == sorted(
        keys, key=lambda k: hashlib.sha256(k.encode()).hexdigest()
    )


def test_history_reads_driver_artifacts():
    """The priority input is the count/content of driver-committed
    CORRECTNESS_r*.json files — evidence the repo never writes, so the
    repo cannot steer which keys look stale."""
    n_files = len(glob.glob(os.path.join(REPO_ROOT, "CORRECTNESS_r*.json")))
    hist = _graded_history(REPO_ROOT)
    assert len(hist) == n_files
    assert n_files >= 15  # this checkout has been graded 15+ rounds
    for sample in hist:
        assert sample and all(isinstance(k, str) for k in sample)


def test_entry_order_is_the_current_priority():
    """The driver-facing surface — __spark_entry__.queries() — is
    exactly the least-recently-graded order (the invariant the external
    gate consumes), while the module-level QUERIES stays in STATIC
    insertion order: importing the package does no artifact I/O and its
    state cannot vary between checkouts (ADVICE r16)."""
    import sys

    sys.path.insert(0, REPO_ROOT)
    import __spark_entry__ as entry

    assert list(entry.queries()) == driver_sample_order(
        list(QUERIES), _graded_history(REPO_ROOT)
    )
    # module order is static: the concatenation of the per-module
    # registries in their import order, no reordering applied
    from as_etl_storage_spark.queries import (
        advanced,
        behavioral,
        llmops,
        parity,
        relational,
        streaming_batch,
        tpch_more,
    )

    static = {}
    for mod in (
        parity,
        relational,
        llmops,
        streaming_batch,
        advanced,
        tpch_more,
        behavioral,
    ):
        static.update(mod.QUERIES)
    assert list(QUERIES) == list(static)


def test_every_front_window_query_has_an_oracle_or_is_disclosed():
    """Queries without a DuckDB oracle get only the weaker rows-only
    driver check; the rotation will eventually front ALL of them, so
    keep the no-oracle set a small, known list (non-SQL-expressible
    ops), not a leak of unchecked queries."""
    no_oracle = sorted(k for k in QUERIES if k not in ORACLES)
    for k in no_oracle:
        doc = (QUERIES[k].__doc__ or "").lower()
        assert "oracle" in doc or "rows-only" in doc, (
            f"{k} has no DuckDB oracle and no docstring disclosure"
        )
