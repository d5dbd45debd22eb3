"""Storage-layout tests: partition pruning, shuffle-free bucketed joins,
compaction invariants, one-pass stats."""

from __future__ import annotations

import os

from as_etl_storage_spark.queries.common import load_table
from as_etl_storage_spark.writers.layout import (
    compact,
    table_stats,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    import pyspark.sql.functions as F

    orders = load_table(spark, SF, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned(orders, path, ["order_year"])
    # hive-style dirs exist
    years = [d for d in os.listdir(path) if d.startswith("order_year=")]
    assert len(years) >= 3
    # filter on the partition column prunes at planning time
    df = spark.read.parquet(path).where("order_year = 1996")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(order_year" in plan
    assert df.count() == orders.where("year(o_orderdate) = 1996").count()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # managed tables land in the default warehouse dir (spark-warehouse/,
    # gitignored) — spark.sql.warehouse.dir is a static conf
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", ["o_orderkey"], 8, ["o_orderkey"])
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        8,
        ["o_orderkey"],
    )
    joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed layout: the join reads both sides without an Exchange
        assert "Exchange" not in plan, plan[:2000]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_compact_reduces_files(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "fragmented.parquet")
    orders.repartition(40).write.parquet(path)
    before_count = spark.read.parquet(path).count()
    n_before, n_after = compact(spark, path, target_rows_per_file=100_000)
    assert n_before >= 40
    assert n_after == 1
    after = spark.read.parquet(path)
    assert after.count() == before_count


def test_table_stats_one_pass(spark):
    orders = load_table(spark, SF, "orders")
    stats = table_stats(
        orders, ["o_orderkey", "o_orderstatus", "o_totalprice"], exact_ndv=True
    ).collect()
    by_col = {r["column"]: r for r in stats}
    assert by_col["o_orderkey"]["n_nulls"] == 0
    assert by_col["o_orderkey"]["approx_ndv"] == orders.count()  # PK
    assert by_col["o_orderstatus"]["approx_ndv"] <= 3
    assert float(by_col["o_totalprice"]["min_value"]) > 0
