"""Doc-drift guards: committed doc headers that state registry counts
must agree with the live registry, so adding a query without
regenerating the index (``python scripts/gen_query_index.py``) fails
here instead of shipping a stale number (round-7 verdict: QUERIES.md
said 218 while the registry held 219)."""

from __future__ import annotations

import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _registry_counts() -> tuple[int, int]:
    import __spark_entry__ as entry

    return len(entry.queries()), len(entry.oracle_sql())


def test_queries_md_header_matches_registry():
    text = (REPO / "docs" / "QUERIES.md").read_text()
    m = re.search(r"^(\d+) queries registered", text, re.M)
    assert m, "QUERIES.md lost its count header — regenerate it"
    n_queries, _ = _registry_counts()
    assert int(m.group(1)) == n_queries, (
        f"docs/QUERIES.md says {m.group(1)} queries but the registry has "
        f"{n_queries}: run python scripts/gen_query_index.py"
    )


def test_queries_md_lists_every_query_name():
    # the grouped name lists must cover the registry exactly — a count
    # that happens to match with names swapped would still be drift
    text = (REPO / "docs" / "QUERIES.md").read_text()
    listed = set(re.findall(r"`([a-z0-9_]+)`", text))
    n_queries, n_oracles = _registry_counts()
    import __spark_entry__ as entry

    missing = set(entry.queries()) - listed
    assert not missing, f"QUERIES.md missing query names: {sorted(missing)}"
    assert n_oracles <= n_queries


def test_readme_query_count_matches_registry():
    text = (REPO / "README.md").read_text()
    counts = {int(n) for n in re.findall(r"(\d+) contract queries", text)}
    n_queries, _ = _registry_counts()
    assert counts == {n_queries}, (
        f"README.md states contract-query counts {sorted(counts)} but the "
        f"registry has {n_queries}"
    )


def test_latest_sweep_artifact_matches_registry():
    """The newest committed SWEEP_r{N}.txt must cover the registry
    exactly, all ok — a round that changes the registry without re-running
    scripts/oracle_sweep.py ships stale evidence (round-8 verdict: code
    shipped with only SWEEP_r07 covering 219 of 221 queries)."""
    sweeps = sorted(
        REPO.glob("SWEEP_r*.txt"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert sweeps, "no SWEEP_r*.txt artifact committed"
    latest = sweeps[-1]
    swept: dict[str, str] = {}
    for line in latest.read_text().splitlines():
        m = re.match(r"(ok|FAIL)\s+(\S+)\s", line)
        if m:
            swept[m.group(2)] = m.group(1)
    import __spark_entry__ as entry

    registry = set(entry.queries())
    missing = registry - set(swept)
    stale = set(swept) - registry
    assert not missing, (
        f"{latest.name} missing {sorted(missing)}: re-run "
        f"python scripts/oracle_sweep.py /root/testdata/sf0.01 {latest.name}"
    )
    assert not stale, f"{latest.name} lists unregistered queries: {sorted(stale)}"
    failed = sorted(n for n, s in swept.items() if s != "ok")
    assert not failed, f"{latest.name} records failures: {failed}"
