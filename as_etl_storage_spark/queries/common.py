"""Shared helpers for driver-contract queries."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from as_etl_storage_spark.sources.parquet import read_parquet_table

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: decimal type used to make double aggregation exact/order-independent
DEC = "DECIMAL(18,2)"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # worker-import safety for sessions started outside the repo root —
    # see pickle_safety; idempotent, so per-call cost is a boolean check
    from as_etl_storage_spark.pickle_safety import ensure_worker_importable

    ensure_worker_importable()
    return read_parquet_table(spark, os.path.join(sf_dir, f"{name}.parquet"))


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register fixture tables as temp views for spark.sql queries (the
    querySql surface, S2)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def sql_query(names, sql: str):
    """Build a queries() entry that registers views then runs spark.sql —
    the reference's querySql passthrough (reader/parameter.go:95-101)
    elevated to the full Catalyst surface."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir, names)
        return spark.sql(sql)

    return run
