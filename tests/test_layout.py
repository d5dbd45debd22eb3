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


def test_zorder_key_matches_morton_reference(spark):
    from as_etl_storage_spark.writers.layout import zorder_key

    def morton(a, b, bits):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i) | ((b >> i) & 1) << (2 * i + 1)
        return out

    bits = 4
    rows = [(a, b) for a in range(16) for b in range(16)]
    df = spark.createDataFrame(rows, "x: long, y: long")
    # bounds [0, 16) with 2^4 cells make bucket == value exactly
    key = zorder_key(["x", "y"], {"x": (0, 16), "y": (0, 16)}, bits=bits)
    got = {(r["x"], r["y"]): r["k"] for r in df.withColumn("k", key).collect()}
    for a, b in rows:
        assert got[(a, b)] == morton(a, b, bits), (a, b)


def test_zorder_tightens_file_ranges_on_both_dims(spark, tmp_path):
    """Every z-ordered output file must cover a tight range in BOTH
    dimensions; a single-column sort is tight only in its leading column.
    Width here = (file max - file min), averaged over files."""
    import itertools

    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.layout import write_zordered

    side = 64
    rows = [(a, b) for a, b in itertools.product(range(side), range(side))]
    df = spark.createDataFrame(rows, "x: long, y: long")

    def avg_widths(path):
        import os as _os

        files = [
            f"{path}/{f}" for f in _os.listdir(path) if f.endswith(".parquet")
        ]
        wx, wy = [], []
        for f in files:
            r = spark.read.parquet(f).agg(
                (F.max("x") - F.min("x")).alias("wx"),
                (F.max("y") - F.min("y")).alias("wy"),
            ).collect()[0]
            wx.append(r["wx"])
            wy.append(r["wy"])
        return sum(wx) / len(wx), sum(wy) / len(wy)

    z_path = str(tmp_path / "zord.parquet")
    write_zordered(df, z_path, ["x", "y"], n_files=16, bits=6)
    lin_path = str(tmp_path / "linear.parquet")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lin_path)

    zx, zy = avg_widths(z_path)
    lx, ly = avg_widths(lin_path)
    # linear layout: tight on x, full-width on y. z-order: tight on both.
    assert lx <= 8 and ly >= side * 0.9
    assert zx <= side / 2 and zy <= side / 2


def test_job_spec_partitioned_write(spark, tmp_path):
    """partitionBy through the JSON job spec: hive dirs + pruned read."""
    from as_etl_storage_spark.runner import run_job

    out = tmp_path / "by_status"
    res = run_job(
        spark,
        {
            "reader": {
                "connection": {
                    "url": SF,
                    "table": {"name": "orders"},
                },
                "column": ["*"],
            },
            "writer": {
                "connection": {"url": str(out), "table": {"name": "t"}},
                "writeMode": "insert",
                "partitionBy": ["o_orderstatus"],
            },
        },
    )
    target = f"{out}/t.parquet"
    dirs = {d for d in os.listdir(target) if d.startswith("o_orderstatus=")}
    assert len(dirs) >= 2
    got = spark.read.parquet(target)
    want = load_table(spark, SF, "orders")
    assert res.written == want.count()
    plan = (
        got.where("o_orderstatus = 'F'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan


def test_job_spec_zorder_write(spark, tmp_path):
    """zorderBy through the JSON job spec: contents unchanged, files carry
    tight ranges on both clustering columns."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.runner import run_job

    out = tmp_path / "zed"
    res = run_job(
        spark,
        {
            "reader": {
                "connection": {"url": SF, "table": {"name": "orders"}},
                "column": ["*"],
            },
            "writer": {
                "connection": {"url": str(out), "table": {"name": "t"}},
                "writeMode": "insert",
                "zorderBy": ["o_custkey", "o_totalprice"],
            },
        },
    )
    target = f"{out}/t.parquet"
    got = spark.read.parquet(target)
    want = load_table(spark, SF, "orders")
    assert res.written == want.count()
    assert got.count() == want.count()
    # per-file custkey spread must be well below the global spread
    files = [f"{target}/{f}" for f in os.listdir(target) if f.endswith(".parquet")]
    assert len(files) > 4
    glob = want.agg((F.max("o_custkey") - F.min("o_custkey")).alias("w")).collect()[0]["w"]
    widths = [
        spark.read.parquet(f)
        .agg((F.max("o_custkey") - F.min("o_custkey")).alias("w"))
        .collect()[0]["w"]
        for f in files
    ]
    assert sum(widths) / len(widths) < glob * 0.6


def test_compact_multi_file_target(spark, tmp_path):
    # target smaller than the table: ceil(rows/target) output files, not 1
    orders = load_table(spark, SF, "orders")
    path = str(tmp_path / "fragmented2.parquet")
    orders.repartition(40).write.parquet(path)
    n_rows = spark.read.parquet(path).count()
    target = max(1, n_rows // 3)
    n_before, n_after = compact(spark, path, target_rows_per_file=target)
    assert n_after == -(-n_rows // target)  # ceil
    assert spark.read.parquet(path).count() == n_rows


def test_dynamic_partition_overwrite(spark, tmp_path):
    """dynamicPartitionOverwrite: overwrite replaces ONLY the partitions
    present in the incoming batch; untouched partitions survive."""
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.writer import ParquetWriter

    def spec(dynamic):
        return WriterSpec.from_json(
            {
                "connection": {"url": str(tmp_path), "table": {"name": "t_dyn"}},
                "writeMode": "overwrite",
                "partitionBy": ["d"],
                "dynamicPartitionOverwrite": dynamic,
            }
        )

    full = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b")], "id long, d string"
    )
    ParquetWriter(spark, spec(False)).write(full)
    # update only partition 'a' with one new row
    patch = spark.createDataFrame([(9, "a")], "id long, d string")
    ParquetWriter(spark, spec(True)).write(patch)
    got = spark.read.parquet(str(tmp_path / "t_dyn.parquet"))
    rows = {(r["id"], r["d"]) for r in got.collect()}
    assert rows == {(9, "a"), (3, "b"), (4, "b")}  # 'b' untouched
    # static overwrite (the default) truncates the whole table
    ParquetWriter(spark, spec(False)).write(patch)
    got2 = spark.read.parquet(str(tmp_path / "t_dyn.parquet"))
    assert {(r["id"], r["d"]) for r in got2.collect()} == {(9, "a")}


def test_zorder_key_rejects_bit_overflow():
    # shiftleft is mod-64 on the JVM: bits*n_cols > 63 would silently wrap
    # bit positions and destroy the Morton order
    import pytest

    from as_etl_storage_spark.writers.layout import zorder_key

    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(
            ["a", "b", "c", "d", "e", "f"],
            {c: (0, 100) for c in "abcdef"},
            bits=12,
        )


# ------------------------- ranked z-order: one-pass sampling + JIT form ---
def _exceeds(v, boundary_tuple):
    """Driver-side `key > boundary` under the rank kernel's total order
    (ASC NULLS FIRST, NaN greatest) for a 1-column key."""
    from as_etl_storage_spark.operators.rank import _py_sort_key

    return _py_sort_key((v,)) > _py_sort_key(boundary_tuple)


def test_multi_column_boundary_sample_bit_identical_to_per_column(spark):
    """sample_boundaries_multi must yield EXACTLY the boundaries the
    per-column _sample_boundaries calls would: the reservoir's row picks
    depend only on the batch-size stream (fixed seed), which is the same
    for a 1-column and an n-column projection of the same frame — so the
    one-pass form is a pure cost optimization, not an approximation."""
    from as_etl_storage_spark.operators.rank import (
        _sample_boundaries,
        sample_boundaries_multi,
    )

    li = load_table(spark, SF, "lineitem").select(
        "l_orderkey", "l_shipdate", "l_returnflag"
    )
    cols = ["l_orderkey", "l_shipdate", "l_returnflag"]
    multi = sample_boundaries_multi(li, cols, 64)
    for c in cols:
        single = _sample_boundaries(li, [c], 64)
        assert multi[c] == single, f"marginal boundaries diverge for {c}"


def test_ranked_zorder_samples_in_one_job(spark):
    """attach_zorder_key_ranked with a 2-column key must launch exactly
    ONE sampling job while building the frame — the per-column form paid
    one full-column scan per key column, which doubles OPTIMIZE's read
    cost for 2-column keys at 100 TB."""
    import time

    from as_etl_storage_spark.writers.layout import attach_zorder_key_ranked

    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_shipdate")
    sc = spark.sparkContext
    group = f"zorder_sample_{time.monotonic_ns()}"
    sc.setJobGroup(group, "build ranked zorder frame")
    attach_zorder_key_ranked(li, ["l_orderkey", "l_shipdate"], "__zkey")
    sc.setJobGroup("", "")
    jobs = sc.statusTracker().getJobIdsForGroup(group)
    assert len(jobs) == 1, (
        f"expected ONE boundary-sample job for the 2-column ranked key, "
        f"saw {len(jobs)}"
    )


def test_ranked_zorder_key_matches_bruteforce_interleave(spark):
    """End-to-end value check of the ranked key at bits=8 — 255 boundary
    comparisons per column, which forces the JIT-safe multi-level Project
    chain (a single CASE tree would exceed HotSpot's compile limit and
    run interpreted, the r9-ADVICE defect). The attached key must equal a
    driver-side brute force: per-column exceed-count against the SAME
    boundary literals, bits interleaved Morton-style."""
    from as_etl_storage_spark.operators.rank import sample_boundaries_multi
    from as_etl_storage_spark.writers.layout import attach_zorder_key_ranked

    li = (
        load_table(spark, SF, "lineitem")
        .select("l_orderkey", "l_shipdate", "l_linenumber", "l_partkey")
        .limit(3000)
    )
    cols = ["l_orderkey", "l_shipdate"]
    bits = 8
    boundaries = sample_boundaries_multi(li, cols, 2**bits)
    assert len(boundaries["l_orderkey"]) > 32, (
        "fixture too small to exercise the multi-level JIT chain"
    )
    out = attach_zorder_key_ranked(li, cols, "__zkey", bits=bits).collect()
    n = len(cols)
    for r in out:
        cells = []
        for c in cols:
            cell = sum(1 for b in boundaries[c] if _exceeds(r[c], b))
            n_cells = len(boundaries[c]) + 1
            if n_cells < 2**bits:
                # low-cardinality rescale onto the full bit range, as in
                # attach_zorder_key_ranked
                cell = cell * 2**bits // n_cells
            cells.append(cell)
        expect = 0
        for i in range(bits):
            for j, cell in enumerate(cells):
                expect |= ((cell >> i) & 1) << (i * n + j)
        assert r["__zkey"] == expect, (r["l_orderkey"], cells, r["__zkey"])


def test_attach_zorder_key_ranked_rejects_bit_overflow(spark):
    import pytest

    from as_etl_storage_spark.writers.layout import attach_zorder_key_ranked

    li = load_table(spark, SF, "lineitem")
    with pytest.raises(ValueError, match="<= 63"):
        attach_zorder_key_ranked(
            li, ["l_orderkey", "l_partkey", "l_suppkey"], "__zkey", bits=22
        )
