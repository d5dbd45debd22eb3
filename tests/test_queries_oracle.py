"""Every declared driver-contract query must hash-match its DuckDB oracle at
sf0.001 (fast local gate; the driver re-runs this at sf0.01)."""

from __future__ import annotations

import pytest

from as_etl_storage_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import run_and_compare

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    problems = run_and_compare(spark, SF, name, QUERIES[name], ORACLES.get(name))
    assert not problems, "\n".join(problems)
    # persist-lifecycle contract: a query must not leave CacheManager
    # entries behind (they leak executor memory across a long multi-query
    # job — r4 verdict item 3). Operators that need cross-consumer reuse
    # use eager localCheckpoint, whose blocks are GC-managed instead.
    assert spark._jsparkSession.sharedState().cacheManager().isEmpty(), (
        f"{name} left persisted relations in the CacheManager"
    )
