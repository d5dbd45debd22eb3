"""SparkSession factory tuned for the test harness (local[N]) while keeping
settings that transfer to a real cluster (AQE, Arrow, sane shuffle counts).

On a 1000-executor cluster the same builder applies — only master/memory
change; AQE re-plans shuffle partition counts at runtime so the static
``spark.sql.shuffle.partitions`` here is a ceiling for local runs, not a
cluster assumption.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "as_etl_storage_spark") -> SparkSession:
    """Build (or reuse) the session.

    Honors ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # wide aggregations (e.g. the 128-buffer minhash signature agg) fall
        # out of whole-stage codegen at the default 100-field cap and run 2x
        # slower; 300 keeps them compiled without risking 64KB method limits
        .config("spark.sql.codegen.maxFields", "300")
        # let Python DataSources (sources/pyds) receive pushFilters —
        # off by default in Spark 4.1
        .config("spark.sql.python.filterPushdown.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
