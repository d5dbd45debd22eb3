"""Regenerate docs/QUERIES.md from the live query registry.

Run from the repo root: ``python scripts/gen_query_index.py``.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from as_etl_storage_spark.queries import (  # noqa: E402
    ORACLES,
    QUERIES,
    advanced,
    behavioral,
    llmops,
    parity,
    relational,
    streaming_batch,
    tpch_more,
)

MODULES = [
    ("parity", parity),
    ("relational", relational),
    ("llmops", llmops),
    ("streaming_batch", streaming_batch),
    ("advanced", advanced),
    ("tpch_more", tpch_more),
    ("behavioral", behavioral),
]


def main() -> None:
    n = len(QUERIES)
    n_oracle = len(ORACLES)
    lines = [
        "# Contract-query index",
        "",
        f"{n} queries registered in `__spark_entry__.queries()`; "
        + (
            "every one has"
            if n == n_oracle
            else f"{n_oracle} have"
        )
        + " a DuckDB oracle in `oracle_sql()` and hash-matches it at sf0.01 "
        "(driver gate) — asserted per-query in "
        "`tests/test_queries_oracle.py`.",
        "",
        "Grouped by registering module under `as_etl_storage_spark/queries/`:",
    ]
    for name, mod in MODULES:
        qs = sorted(mod.QUERIES)
        lines += [
            "",
            f"## {name} ({len(qs)})",
            "",
            ", ".join(f"`{q}`" for q in qs),
        ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "QUERIES.md",
    )
    with open(out, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {out}: {n} queries, {n_oracle} oracles")


if __name__ == "__main__":
    main()
