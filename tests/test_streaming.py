"""Structured Streaming tests: the real unbounded path (file source ->
watermarked transforms -> foreachBatch sink), drained with availableNow so
results are comparable against the batch analogs."""

from __future__ import annotations

import os
import shutil

import pytest

from as_etl_storage_spark.queries.common import load_table
from as_etl_storage_spark.streaming.micro_batch import (
    MicroBatchWriter,
    dedup_within_watermark,
    file_stream,
    session_windows,
    tumbling_counts,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_input_dir(tmp_path):
    d = tmp_path / "events_in"
    d.mkdir()
    shutil.copy(os.path.join(SF, "events.parquet"), d / "part-000.parquet")
    return str(d)


def test_micro_batch_writer_drains_all(spark, tmp_path, events_input_dir):
    stream = file_stream(spark, events_input_dir)
    assert stream.isStreaming
    target = str(tmp_path / "out.parquet")
    writer = MicroBatchWriter(target, batch_size=1000)
    writer.run_available_now(stream)
    got = spark.read.parquet(target).count()
    want = load_table(spark, SF, "events").count()
    assert got == want
    assert writer.batches_seen >= 1


def test_micro_batch_replay_is_idempotent(spark, tmp_path, events_input_dir):
    """A batch re-delivered after a failure between the data write and the
    checkpoint commit must not double-append (exactly-once on batch_id)."""
    stream = file_stream(spark, events_input_dir)
    target = str(tmp_path / "out.parquet")
    writer = MicroBatchWriter(target, batch_size=1000)
    writer.run_available_now(stream)
    n = spark.read.parquet(target).count()
    # simulate the restart replaying every committed batch
    batch = load_table(spark, SF, "events")
    for bid in range(writer.batches_seen):
        writer._write_batch(batch, bid)
    assert writer.batches_skipped == writer.batches_seen
    assert spark.read.parquet(target).count() == n


def test_streaming_tumbling_matches_batch(spark, tmp_path, events_input_dir):
    stream = file_stream(spark, events_input_dir)
    agg = tumbling_counts(stream)
    target = str(tmp_path / "win.parquet")
    q = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    batch = tumbling_counts(load_table(spark, SF, "events"))
    # append mode emits only windows closed by the watermark; every emitted
    # window must agree exactly with the batch computation
    joined = got.join(
        batch.withColumnRenamed("n", "n_b").withColumnRenamed(
            "sum_value", "sum_value_b"
        ),
        ["window_start", "event_type"],
        "left",
    )
    assert joined.where("n != n_b OR sum_value != sum_value_b").count() == 0
    assert got.count() > 0


def test_streaming_dedup_runs(spark, tmp_path, events_input_dir):
    stream = file_stream(spark, events_input_dir)
    deduped = dedup_within_watermark(stream)
    target = str(tmp_path / "dedup.parquet")
    writer = MicroBatchWriter(target)
    writer.run_available_now(deduped)
    got = spark.read.parquet(target).select("event_id").distinct().count()
    total = spark.read.parquet(target).count()
    assert got == total  # no duplicate event_ids written


def test_streaming_session_window_runs(spark, tmp_path, events_input_dir):
    stream = file_stream(spark, events_input_dir)
    sess = session_windows(stream)
    target = str(tmp_path / "sess.parquet")
    q = (
        sess.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    batch = session_windows(load_table(spark, SF, "events"))
    joined = got.join(
        batch.withColumnRenamed("n_events", "n_b"),
        ["user_id", "session_start", "session_end"],
        "left",
    )
    assert joined.where("n_b IS NULL OR n_events != n_b").count() == 0


def test_stream_stream_interval_join(spark, tmp_path, events_input_dir):
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    stream = file_stream(spark, events_input_dir)
    clicks = stream.where("event_type = 'click'")
    views = stream.where("event_type = 'view'")
    joined = interval_join(clicks, views)
    target = str(tmp_path / "ssj.parquet")
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssj"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    # batch reference: same join over the bounded table
    ev = load_table(spark, SF, "events")
    want = interval_join(ev.where("event_type = 'click'"), ev.where("event_type = 'view'"))
    missing = want.join(got, ["click_id", "view_id"], "left_anti").count()
    extra = got.join(want, ["click_id", "view_id"], "left_anti").count()
    assert extra == 0
    # append-mode may hold back pairs near the watermark frontier; with
    # availableNow + final watermark advance all pairs should emit
    assert missing == 0
    assert got.count() == want.count()


def test_stream_stream_outer_interval_join(spark, tmp_path, events_input_dir):
    """LEFT OUTER stream-stream join: matched pairs must equal the batch
    join exactly; unmatched clicks may be held in state until the watermark
    passes them, so the emitted null-view rows must be a subset of the batch
    unmatched set (never fabricated)."""
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    stream = file_stream(spark, events_input_dir)
    joined = interval_join(
        stream.where("event_type = 'click'"),
        stream.where("event_type = 'view'"),
        how="left_outer",
    )
    target = str(tmp_path / "ssoj.parquet")
    q = (
        joined.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ssoj"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    ev = load_table(spark, SF, "events")
    want = interval_join(
        ev.where("event_type = 'click'"),
        ev.where("event_type = 'view'"),
        how="left_outer",
    )
    got_m = got.where("view_id IS NOT NULL")
    want_m = want.where("view_id IS NOT NULL")
    assert got_m.join(want_m, ["click_id", "view_id"], "left_anti").count() == 0
    assert want_m.join(got_m, ["click_id", "view_id"], "left_anti").count() == 0
    got_u = got.where("view_id IS NULL").select("click_id")
    want_u = want.where("view_id IS NULL").select("click_id")
    assert got_u.join(want_u, ["click_id"], "left_anti").count() == 0


def test_stream_static_enrich_matches_batch(spark, tmp_path, events_input_dir):
    """Stream-static join: the static dim is broadcast into every
    micro-batch; drained results must equal the batch join."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.streaming.micro_batch import enrich_with_dim

    dim = load_table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    stream = file_stream(spark, events_input_dir)
    enriched = enrich_with_dim(stream, dim, "user_id", ["c_mktsegment"])
    target = str(tmp_path / "enriched.parquet")
    q = (
        enriched.writeStream.outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", target)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    batch = enrich_with_dim(load_table(spark, SF, "events"), dim, "user_id",
                            ["c_mktsegment"])
    assert got.count() == batch.count()
    g = got.groupBy("c_mktsegment").count().collect()
    b = dict((r.c_mktsegment, r["count"]) for r in
             batch.groupBy("c_mktsegment").count().collect())
    assert {r.c_mktsegment: r["count"] for r in g} == b


def test_checkpoint_resume_exactly_once(spark, tmp_path):
    """Exactly-once across restarts: drain run 1 with only file A in the
    source dir, then add file B and resume from the SAME checkpoint — the
    second run must process only B (no re-emission of A's rows, no loss)."""
    from pyspark.sql import functions as F

    ev = load_table(spark, SF, "events")
    half_a = ev.where("event_id % 2 = 0")
    half_b = ev.where("event_id % 2 = 1")
    src = tmp_path / "resume_in"
    src.mkdir()
    half_a.coalesce(1).write.parquet(str(src / "stage_a"))
    import glob as _glob

    def _add(stage_dir, name):
        part = _glob.glob(str(stage_dir / "*.parquet"))[0]
        shutil.copy(part, src / name)

    _add(src / "stage_a", "part-a.parquet")
    shutil.rmtree(src / "stage_a")

    target = str(tmp_path / "resumed.parquet")
    ckpt = str(tmp_path / "ckpt_resume")

    def drain():
        stream = spark.readStream.schema(ev.schema).parquet(str(src))
        q = (
            stream.select("event_id")
            .writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .format("parquet")
            .option("path", target)
            .start()
        )
        q.awaitTermination()

    drain()
    n_first = spark.read.parquet(target).count()
    assert n_first == half_a.count()

    half_b.coalesce(1).write.parquet(str(src / "stage_b"))
    _add(src / "stage_b", "part-b.parquet")
    shutil.rmtree(src / "stage_b")

    drain()
    got = spark.read.parquet(target)
    assert got.count() == ev.count()  # no loss
    assert got.select("event_id").distinct().count() == ev.count()  # no dupes


def test_cdc_upsert_convergence_and_replay(spark, tmp_path):
    """Streaming CDC upsert: (1) the drained table equals the batch
    keep-latest regardless of batch boundaries; (2) re-applying an
    already-applied batch (crash replay between data write and checkpoint
    commit) leaves the table unchanged; (3) a resumed stream with NEW
    changes conditionally updates only where the change is newer."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.dedup import keep_latest
    from as_etl_storage_spark.streaming.micro_batch import cdc_upsert_stream

    ev = load_table(spark, SF, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    src = str(tmp_path / "src")
    ev.repartition(3).write.parquet(src)
    target = str(tmp_path / "target")
    ckpt = str(tmp_path / "ckpt")

    out = cdc_upsert_stream(
        spark, src, target, ckpt, ["user_id"], ["ts", "event_id"]
    )
    want = keep_latest(ev, ["user_id"], ["ts", "event_id"])
    assert out.count() == want.count() == ev.select("user_id").distinct().count()
    assert out.exceptAll(want).count() == 0 and want.exceptAll(out).count() == 0

    # replay: draining again from the SAME checkpoint (no new files) and
    # even re-running the whole stream with a FRESH checkpoint (full
    # replay of every batch) must converge to the same table
    before = sorted(out.collect())
    cdc_upsert_stream(spark, src, target, ckpt, ["user_id"], ["ts", "event_id"])
    cdc_upsert_stream(
        spark, src, target, str(tmp_path / "ckpt2"), ["user_id"], ["ts", "event_id"]
    )
    assert sorted(spark.read.parquet(target).collect()) == before

    # resumed stream with one newer and one older change for user 1
    top = spark.read.parquet(target).where("user_id = 1").collect()[0]
    newer = spark.createDataFrame(
        [
            (10_000_000, top["ts"], 1, "stale_loses_tiebreak", 0.0),
            (10_000_001, top["ts"], 1, "wins_tiebreak", 1.0),
        ],
        ev.schema,
    )
    newer.coalesce(1).write.mode("append").parquet(src)
    out2 = cdc_upsert_stream(
        spark, src, target, ckpt, ["user_id"], ["ts", "event_id"]
    )
    row = out2.where("user_id = 1").collect()
    assert len(row) == 1 and row[0]["event_type"] == "wins_tiebreak"


def test_file_stream_handles_legacy_nanos_encoding(spark, tmp_path):
    """The fixture generation drifted TIMESTAMP(NANOS) -> timestamp[us];
    file_stream must probe the footer and handle BOTH encodings with
    identical results (the ns reader divides to micros)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    ev = load_table(spark, SF, "events").limit(200).toPandas()
    us_dir = tmp_path / "us_in"
    ns_dir = tmp_path / "ns_in"
    us_dir.mkdir()
    ns_dir.mkdir()
    table = pa.Table.from_pandas(ev, preserve_index=False)
    # native microseconds variant
    pq.write_table(table, us_dir / "p0.parquet")
    # legacy nanosecond variant of the same rows
    ns_schema = pa.schema(
        [
            f if f.name != "ts" else pa.field("ts", pa.timestamp("ns"))
            for f in table.schema
        ]
    )
    pq.write_table(table.cast(ns_schema), ns_dir / "p0.parquet")

    def drain(indir, out):
        stream = file_stream(spark, str(indir))
        w = MicroBatchWriter(str(out))
        w.run_available_now(stream)
        return spark.read.parquet(str(out)).select(
            "event_id", "ts", "user_id"
        )

    got_us = drain(us_dir, tmp_path / "out_us")
    got_ns = drain(ns_dir, tmp_path / "out_ns")
    assert got_us.count() == 200
    assert got_us.exceptAll(got_ns).count() == 0
    assert got_ns.exceptAll(got_us).count() == 0
