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
