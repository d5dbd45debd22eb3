"""Driver-contract query registry.

Each query name maps to (callable(spark, sf_dir) -> DataFrame) plus an
equivalent DuckDB oracle SQL string. Column names/aliases are identical on
both sides — the driver's compare sorts columns by name and value-hashes.

Determinism policy (required for hash-match):
  * aggregates over doubles are CAST to DECIMAL first — decimal addition is
    exact and associative, so partition/shuffle order cannot change results;
  * every top-k has a full tie-breaking ORDER BY ending in a unique key;
  * timestamps are truncated identically on both sides (ns -> us on read);
  * float outputs only from single deterministic ops (one division, one
    round), never from multi-way float accumulation.
"""

from __future__ import annotations

from as_etl_storage_spark.queries import (
    advanced,
    behavioral,
    llmops,
    parity,
    relational,
    streaming_batch,
    tpch_more,
)

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (
    parity,
    relational,
    llmops,
    streaming_batch,
    advanced,
    tpch_more,
    behavioral,
):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

__all__ = ["QUERIES", "ORACLES"]
