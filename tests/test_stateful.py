"""Custom stateful streaming operator tests (applyInPandasWithState):
state accumulates across micro-batches and matches the batch aggregation."""

from __future__ import annotations

import os
import shutil

from as_etl_storage_spark.queries.common import load_table
from as_etl_storage_spark.streaming.micro_batch import file_stream
from as_etl_storage_spark.streaming.stateful import user_activity_totals

SF = "/root/testdata/sf0.001"


def test_snapshot_read_pins_files(spark, tmp_path):
    from as_etl_storage_spark.sources.parquet import ParquetSource
    from as_etl_storage_spark.spec import ConnectionSpec, TableRef

    path = tmp_path / "t.parquet"
    orders = load_table(spark, SF, "orders")
    orders.write.parquet(str(path))
    src = ParquetSource(
        spark, ConnectionSpec(url=str(tmp_path), table=TableRef(name="t"))
    )
    snap = src.read(snapshot=True)
    n0 = snap.count()
    # concurrent append lands after the snapshot was planned
    orders.limit(100).write.mode("append").parquet(str(path))
    assert snap.count() == n0  # snapshot unchanged (S7 consistent read)
    assert src.read().count() == n0 + 100  # live read sees the append


def test_stateful_totals_match_batch(spark, tmp_path):
    indir = tmp_path / "in"
    indir.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), indir / "p0.parquet")
    stream = file_stream(spark, str(indir))
    totals = user_activity_totals(stream)
    target = str(tmp_path / "out.parquet")
    # parquet sink rejects update mode -> foreachBatch append (the
    # MicroBatchWriter pattern)
    q = (
        totals.writeStream.outputMode("update")
        .foreachBatch(lambda df, _id: df.write.mode("append").parquet(target))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    batch = user_activity_totals(load_table(spark, SF, "events"))
    # with one input batch: one output row per user, equal to batch agg
    joined = got.join(
        batch.withColumnRenamed("n_events", "n_b").withColumnRenamed(
            "sum_value", "s_b"
        ),
        "user_id",
        "full",
    )
    bad = joined.where(
        "n_events IS NULL OR n_b IS NULL OR n_events != n_b "
        "OR abs(sum_value - s_b) > 1e-9"
    ).count()
    assert bad == 0


def test_stateful_accumulates_across_batches(spark, tmp_path):
    indir = tmp_path / "in2"
    indir.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), indir / "p0.parquet")
    target = str(tmp_path / "out2.parquet")
    ckpt = str(tmp_path / "ckpt2")

    def drain():
        stream = file_stream(spark, str(indir))
        q = (
            user_activity_totals(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: df.write.mode("append").parquet(target))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    shutil.copy(os.path.join(SF, "events.parquet"), indir / "p1.parquet")
    drain()  # second drain resumes state from checkpoint
    got = spark.read.parquet(target)
    # latest emission per user must show DOUBLED counts (state carried over)
    latest = got.groupBy("user_id").agg({"n_events": "max"})
    batch = user_activity_totals(load_table(spark, SF, "events"))
    joined = latest.withColumnRenamed("max(n_events)", "n2").join(
        batch, "user_id"
    )
    assert joined.where("n2 != 2 * n_events").count() == 0


def test_funnel_conversions_stream_matches_batch(spark, tmp_path):
    """Funnel state machine across MULTIPLE micro-batches: events are split
    into two time-ordered files fed one per trigger, so view/click/purchase
    for one user can land in different batches — the drained conversions
    must equal the batch-mode stepwise-min computation."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.streaming.stateful import funnel_conversions

    ev = load_table(spark, SF, "events")
    # ts is TIMESTAMP_NTZ — cast through TIMESTAMP for a numeric median
    ts_us = "unix_micros(CAST(ts AS TIMESTAMP))"
    cutoff = ev.agg(
        F.expr(f"percentile_approx({ts_us}, 0.5)").alias("m")
    ).collect()[0]["m"]
    d = tmp_path / "funnel_in"
    d.mkdir()
    # two halves, each written time-sorted; lexicographic file order = time order
    ev.where(F.expr(f"{ts_us} <= {cutoff}")).orderBy("ts", "event_id").coalesce(
        1
    ).write.parquet(str(d / "p0"))
    ev.where(F.expr(f"{ts_us} > {cutoff}")).orderBy("ts", "event_id").coalesce(
        1
    ).write.parquet(str(d / "p1"))
    flat = tmp_path / "funnel_flat"
    flat.mkdir()
    import glob as _glob

    for i, part in enumerate(sorted(_glob.glob(str(d / "p*" / "*.parquet")))):
        shutil.copy(part, flat / f"part-{i:03d}.parquet")
        # the file source orders batches by MODIFICATION TIME, not name —
        # pin strictly increasing mtimes so the two micro-batches arrive
        # in time order (state carry-over is the point of this test)
        os.utime(flat / f"part-{i:03d}.parquet", (1e9 + i, 1e9 + i))

    # halves were re-written by Spark with native timestamps — read them
    # back with that schema directly. maxFilesPerTrigger is a SOURCE
    # option (on the sink it is silently ignored and everything drains in
    # one batch, testing nothing).
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(flat))
    )
    out = funnel_conversions(stream)
    target = str(tmp_path / "conv.parquet")
    q = (
        out.writeStream.outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_funnel"))
        .trigger(availableNow=True)
        .foreachBatch(
            lambda batch, _id: batch.write.mode("append").parquet(target)
        )
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    want = funnel_conversions(ev)
    assert got.count() == want.count() > 0
    cols = ["user_id", "t_view", "t_click", "t_purchase"]
    assert got.select(cols).exceptAll(want.select(cols)).count() == 0
    assert want.select(cols).exceptAll(got.select(cols)).count() == 0


def test_tws_totals_gated_without_protobuf(spark, sf_dir):
    # transformWithStateInPandas needs protobuf for its state-server
    # protocol; without it the raw API crashes an opaque driver worker
    # mid-query, so the wrapper must fail fast with an actionable error —
    # or, where protobuf exists, run for real and match the aggregation
    import pytest

    from as_etl_storage_spark.queries.streaming_batch import (
        QUERIES as _q,  # noqa: F401 - ensures module import side effects
        TWS_ORACLE,
        _exec_tws_totals,
    )

    try:
        from google.protobuf import descriptor  # noqa: F401
        has_protobuf = True
    except ImportError:
        has_protobuf = False

    if not has_protobuf:
        from as_etl_storage_spark.streaming.stateful import user_totals_tws

        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        with pytest.raises(RuntimeError, match="protobuf"):
            user_totals_tws(ev.limit(0))
    else:  # pragma: no cover - env-dependent branch
        import duckdb

        got = _exec_tws_totals(spark, sf_dir).toPandas()
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{sf_dir}/events.parquet')"
        )
        want = con.sql(TWS_ORACLE).df()
        gmap = {
            r.user_id: (r.n_events, r.sum_cents) for r in got.itertuples()
        }
        wmap = {
            r.user_id: (r.n_events, r.sum_cents) for r in want.itertuples()
        }
        assert gmap == wmap
