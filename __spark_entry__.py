"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (TPC-H Q1-style pricing summary) on sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2 + LLM ops).
oracle_sql()   — DuckDB-equivalent SQL per query (same column aliases).

Implementations live in as_etl_storage_spark.queries; this module is a thin
adapter so the engine package stays importable on its own.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from as_etl_storage_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ LLM-pipeline
    operators). Each callable takes (spark, sf_dir) and returns a DataFrame."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; keys without an oracle are
    non-SQL-expressible ops checked rows-only by the driver."""
    return dict(ORACLES)
