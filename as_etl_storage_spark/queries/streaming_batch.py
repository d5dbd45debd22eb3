"""Batch analogs of the streaming operators, oracle-checked.

The streaming module (as_etl_storage_spark.streaming) runs the same
transformations over an unbounded source; these queries run them over the
bounded events fixture so the driver can hash-match results against DuckDB
(time_bucket / gaps-and-islands reproductions of Spark's window semantics).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from as_etl_storage_spark.queries.common import load_table
from as_etl_storage_spark.streaming.micro_batch import (
    dedup_within_watermark,
    session_windows,
    sliding_counts,
    tumbling_counts,
)

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, fn, oracle: str | None) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts(_events(spark, sf_dir))


_register(
    "stream_tumbling_window",
    _tumbling,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(CAST(value AS DECIMAL(18,4)))::DOUBLE, 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


def _sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_counts(_events(spark, sf_dir))


_register(
    "stream_sliding_window",
    _sliding,
    """
    WITH starts AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start
      FROM events)
    SELECT window_start, count(*) AS n FROM starts GROUP BY 1
    """,
)


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_windows(_events(spark, sf_dir))


_register(
    "stream_session_window",
    _sessions,
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '10 minutes' THEN 1
                  ELSE 0 END AS new_session
      FROM o),
    ids AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*) AS n_events
    FROM ids GROUP BY user_id, session_id
    """,
)


def _dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    deduped = dedup_within_watermark(_events(spark, sf_dir))
    return deduped.groupBy("event_type").agg(F.count("*").alias("n_unique"))


_register(
    "stream_dedup_watermark",
    _dedup_wm,
    """
    WITH d AS (SELECT DISTINCT ON (event_id) event_id, event_type FROM events
               ORDER BY event_id)
    SELECT event_type, count(*) AS n_unique FROM d GROUP BY 1
    """,
)


def _late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark cutoff semantics as a batch query: events older than
    max(ts) - 1 hour would be dropped as late."""
    ev = _events(spark, sf_dir)
    cutoff = ev.agg(F.max("ts").alias("m")).select(
        (F.col("m") - F.expr("INTERVAL 1 HOUR")).alias("cutoff")
    )
    return (
        ev.crossJoin(F.broadcast(cutoff))
        .select(
            F.count(F.when(F.col("ts") >= F.col("cutoff"), 1)).alias("on_time"),
            F.count(F.when(F.col("ts") < F.col("cutoff"), 1)).alias("late"),
        )
    )


_register(
    "stream_late_cutoff",
    _late_data,
    """
    WITH c AS (SELECT max(ts) - INTERVAL '1 hour' AS cutoff FROM events)
    SELECT count(CASE WHEN ts >= cutoff THEN 1 END) AS on_time,
           count(CASE WHEN ts < cutoff THEN 1 END) AS late
    FROM events, c
    """,
)


def _interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    ev = _events(spark, sf_dir)
    return interval_join(
        ev.where("event_type = 'click'"), ev.where("event_type = 'view'")
    )


_register(
    "stream_interval_join",
    _interval_join,
    """
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL '30 minutes'
    """,
)


def _enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from as_etl_storage_spark.streaming.micro_batch import enrich_with_dim

    ev = _events(spark, sf_dir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_with_dim(ev, cust, "user_id", ["c_mktsegment"])
    return enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_value"),
    )


_register(
    "stream_static_enrich",
    _enrich,
    """
    SELECT c_mktsegment, event_type, count(*) AS n,
           round(sum(CAST(value AS DECIMAL(18,4)))::DOUBLE, 4) AS sum_value
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)


def _cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the events fixture through the streaming CDC upsert in 4
    micro-batches (re-sharded to 4 files, maxFilesPerTrigger=1). The final
    table is batch-boundary-independent (keep-latest is associative), so
    the streaming result hash-matches the batch keep-latest oracle."""
    import os

    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.streaming.micro_batch import cdc_upsert_stream

    ev = _events(spark, sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    base = _scratch_dir()
    src = os.path.join(base, "src")
    ev.repartition(4).write.mode("overwrite").parquet(src)
    out = cdc_upsert_stream(
        spark,
        src,
        os.path.join(base, "target"),
        os.path.join(base, "ckpt"),
        ["user_id"],
        ["ts", "event_id"],
    )
    return out.select("user_id", "event_id", "event_type", "ts", "value")


_register(
    "stream_cdc_upsert",
    _cdc_upsert,
    """
    SELECT user_id, event_id, event_type, ts, value
    FROM (SELECT event_id, ts, user_id, event_type, value,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) t
    WHERE rn = 1
    """,
)


# --- real streaming execution, oracle-gated --------------------------------
# The queries above prove the *semantics* on bounded frames; these run
# the actual Structured Streaming engine (file source -> StreamExecution ->
# state store -> sink, drained with availableNow) and hash-match the same
# batch oracles — so streaming execution itself is under the driver gate,
# not just its batch analog. Single-batch drains are deterministic: the
# watermark starts at -inf, so nothing is dropped and complete-mode state
# equals the batch aggregation exactly.
def _staged_events_dir(sf_dir: str, name: str, copies: int = 1) -> str:
    """Copy the events fixture into a scratch dir as a file-stream source
    (``copies`` > 1 duplicates every row for dedup exercises)."""
    import shutil

    from as_etl_storage_spark.queries.parity import _scratch_dir

    base = _scratch_dir()
    indir = os.path.join(base, f"{name}_in")
    os.makedirs(indir, exist_ok=True)
    src = os.path.join(sf_dir, "events.parquet")
    files = (
        sorted(
            os.path.join(src, f) for f in os.listdir(src) if f.endswith(".parquet")
        )
        if os.path.isdir(src)
        else [src]
    )
    i = 0
    for _ in range(copies):
        for f in files:
            shutil.copy(f, os.path.join(indir, f"p{i:04d}.parquet"))
            i += 1
    return indir


def _drain(out, work: str, mode: str):
    """Run a streaming DataFrame to a parquet sink via foreachBatch and
    return the final materialized result path."""
    target = os.path.join(work, "out")
    write_mode = "overwrite" if mode == "complete" else "append"

    def sink(batch_df, _bid):
        batch_df.write.mode(write_mode).parquet(target)

    q = (
        out.writeStream.outputMode(mode)
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return target


def _exec_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling window aggregate through the REAL streaming engine
    (complete mode; the final micro-batch state is the full aggregation)."""
    from as_etl_storage_spark.streaming.micro_batch import file_stream

    indir = _staged_events_dir(sf_dir, "exec_tumbling")
    work = os.path.dirname(indir)
    stream = file_stream(spark, indir)
    target = _drain(tumbling_counts(stream), work, "complete")
    got = spark.read.parquet(target)
    # stream side carries TIMESTAMP (watermark requirement); hash-compare
    # against the NTZ batch oracle in the session's UTC wall-clock
    return got.withColumn(
        "window_start", F.col("window_start").cast("timestamp_ntz")
    )


_register(
    "stream_exec_tumbling",
    _exec_tumbling,
    """
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(CAST(value AS DECIMAL(18,4)))::DOUBLE, 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)


def _exec_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows through the real engine (session_window
    state merging in the state store, complete mode)."""
    from as_etl_storage_spark.streaming.micro_batch import file_stream

    indir = _staged_events_dir(sf_dir, "exec_session")
    work = os.path.dirname(indir)
    stream = file_stream(spark, indir)
    target = _drain(session_windows(stream), work, "complete")
    got = spark.read.parquet(target)
    return got.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


_register(
    "stream_exec_session",
    _exec_session,
    """
    WITH o AS (
      SELECT user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      FROM events),
    flagged AS (
      SELECT user_id, ts,
             CASE WHEN prev_ts IS NULL
                       OR ts - prev_ts > INTERVAL '10 minutes' THEN 1
                  ELSE 0 END AS new_session
      FROM o),
    ids AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '10 minutes' AS session_end,
           count(*) AS n_events
    FROM ids GROUP BY user_id, session_id
    """,
)


def _exec_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) windows through the real engine: every event
    contributes to width/slide windows, complete mode."""
    from as_etl_storage_spark.streaming.micro_batch import file_stream

    indir = _staged_events_dir(sf_dir, "exec_sliding")
    work = os.path.dirname(indir)
    stream = file_stream(spark, indir)
    target = _drain(sliding_counts(stream), work, "complete")
    got = spark.read.parquet(target)
    return got.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"), "n"
    )


_register(
    "stream_exec_sliding",
    _exec_sliding,
    """
    WITH starts AS (
      SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
               AS window_start
      FROM events)
    SELECT window_start, count(*) AS n FROM starts GROUP BY 1
    """,
)


def _exec_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator through the real engine: the
    applyInPandasWithState funnel state machine drains in TWO time-ordered
    micro-batches (maxFilesPerTrigger=1), so a user's view/click/purchase
    can land in different batches and conversion depends on state carried
    across them. Hash-matches the batch stepwise-min oracle. Staging is
    the shared :func:`_staged_time_halves` (no sentinels — the state
    machine uses no watermark, so nothing needs flushing)."""
    from pyspark.sql import types as T

    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.streaming.stateful import funnel_conversions

    indir = _staged_time_halves(spark, sf_dir, "exec_funnel")
    # the staged files carry ts as TIMESTAMP (the shared staging's
    # watermark convention) — declare the matching stream schema
    ev = load_table(spark, sf_dir, "events")
    sch = T.StructType(
        [
            T.StructField(
                f.name,
                T.TimestampType() if f.name == "ts" else f.dataType,
                f.nullable,
            )
            for f in ev.schema.fields
        ]
    )
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    work = os.path.join(_scratch_dir(), "exec_funnel_work")
    os.makedirs(work, exist_ok=True)
    target = _drain(funnel_conversions(stream), work, "update")
    # like every stream_exec_* sibling: surface wall-clock NTZ so the
    # driver's toPandas() hash-compare is timezone-independent (the
    # session tz is pinned UTC, so the instants agree with the oracle)
    got = spark.read.parquet(target)
    return got.select(
        "user_id",
        *[
            F.col(c).cast("timestamp_ntz").alias(c)
            for c in ("t_view", "t_click", "t_purchase")
        ],
    )


_register(
    "stream_exec_funnel",
    _exec_funnel,
    """
    WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, v.t_view, min(e.ts) AS t_click
          FROM events e JOIN v ON e.user_id = v.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
          GROUP BY 1, 2),
    p AS (SELECT e.user_id, c.t_view, c.t_click, min(e.ts) AS t_purchase
          FROM events e JOIN c ON e.user_id = c.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
          GROUP BY 1, 2, 3)
    SELECT user_id, t_view, t_click, t_purchase FROM p
    """,
)


def _exec_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup through the real engine: the source dir
    holds TWO copies of every event file, dropDuplicatesWithinWatermark
    keeps the first arrival per event_id — the emitted set is exactly the
    distinct fixture."""
    from as_etl_storage_spark.streaming.micro_batch import (
        dedup_within_watermark,
        file_stream,
    )

    indir = _staged_events_dir(sf_dir, "exec_dedup", copies=2)
    work = os.path.dirname(indir)
    stream = file_stream(spark, indir)
    target = _drain(dedup_within_watermark(stream), work, "append")
    got = spark.read.parquet(target)
    return got.select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


_register(
    "stream_exec_dedup",
    _exec_dedup,
    """
    SELECT DISTINCT event_id, ts, user_id, event_type, value, props
    FROM events
    """,
)


def _exec_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment through the REAL engine: each micro-batch
    joins the broadcast customer snapshot (stream side never shuffles),
    aggregated in complete mode — hash-matched to the batch oracle."""
    from as_etl_storage_spark.streaming.micro_batch import (
        enrich_with_dim,
        file_stream,
    )

    indir = _staged_events_dir(sf_dir, "exec_enrich")
    work = os.path.dirname(indir)
    stream = file_stream(spark, indir)
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    enriched = enrich_with_dim(stream, cust, "user_id", ["c_mktsegment"])
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
        ).alias("sum_value"),
    )
    target = _drain(agg, work, "complete")
    return spark.read.parquet(target)


_register(
    "stream_exec_enrich",
    _exec_enrich,
    """
    SELECT c_mktsegment, event_type, count(*) AS n,
           round(sum(CAST(value AS DECIMAL(18,4)))::DOUBLE, 4) AS sum_value
    FROM events LEFT JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)


def _staged_time_halves(
    spark: SparkSession, sf_dir: str, name: str, sentinel_days: int = 0
) -> str:
    """Stage the events fixture as TWO time-ordered files (split at the
    median ts, strictly increasing mtimes) so ``maxFilesPerTrigger=1``
    replays them as two in-order micro-batches. With ``sentinel_days`` > 0,
    append three more single-row files of far-future click/view events
    (sentinel user_ids < -900) whose only job is to walk the event-time
    watermark past every real row. Three are needed because the global
    watermark is the MIN across both join sides and is applied one batch
    late: batch 3 advances the click side, batch 4 the view side (the min
    now clears the real-data max), and batch 5 makes the engine evict
    against it — flushing every unmatched row deterministically."""
    import shutil

    from as_etl_storage_spark.queries.parity import _scratch_dir

    ev = load_table(spark, sf_dir, "events")
    base = _scratch_dir()
    halves = os.path.join(base, f"{name}_halves")
    indir = os.path.join(base, f"{name}_in")
    os.makedirs(indir, exist_ok=True)
    ts_us = "unix_micros(CAST(ts AS TIMESTAMP))"
    cutoff = ev.agg(
        F.expr(f"percentile_approx({ts_us}, 0.5)").alias("m")
    ).collect()[0]["m"]
    parts = [
        ev.where(F.expr(f"{ts_us} <= {cutoff}")),
        ev.where(F.expr(f"{ts_us} > {cutoff}")),
    ]
    if sentinel_days:
        hi = ev.agg(F.max("ts").alias("m")).collect()[0]["m"]
        for i, etype in enumerate(("click", "view", "click")):
            parts.append(
                spark.createDataFrame(
                    [(-900 - i, hi, -999 - i, etype, 0.0, "{}")],
                    schema=ev.schema,
                ).withColumn(
                    "ts",
                    F.col("ts")
                    + F.expr(f"INTERVAL {sentinel_days * (i + 1)} DAYS"),
                )
            )
    def _stage(i: int, pdf) -> str:
        pdir = os.path.join(halves, f"p{i}")
        # watermarks require TIMESTAMP, not the batch reader's NTZ; the
        # session tz is pinned UTC so the instants agree
        pdf = pdf.withColumn("ts", F.col("ts").cast("timestamp"))
        pdf.orderBy("ts", "event_id").coalesce(1).write.mode(
            "overwrite"
        ).parquet(pdir)
        return pdir

    # the per-part staging writes are independent single-task jobs over
    # disjoint slices — overlapped from driver threads (guide §2.6, the
    # same shape as the DML staging writes); the mtime pinning below
    # stays SEQUENTIAL in part order, so batch replay order is unchanged
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(3, len(parts))) as pool:
        pdirs = list(pool.map(lambda ip: _stage(*ip), enumerate(parts)))
    part = 0
    for pdir in pdirs:
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(indir, f"part-{part:03d}.parquet")
                shutil.copy(os.path.join(pdir, f), dst)
                # file source orders batches by MODIFICATION TIME — pin it
                os.utime(dst, (1_000_000_000 + part, 1_000_000_000 + part))
                part += 1
    return indir


def _exec_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream INNER interval join through the REAL engine, drained
    as two time-ordered micro-batches: a second-batch click can only pair
    with a first-batch view via the view rows the join keeps in the state
    store, so join-state carryover across batches is what this proves.
    The watermark delay is far beyond the fixture span, so no state is
    evicted and the result is exactly the batch/oracle join."""
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    indir = _staged_time_halves(spark, sf_dir, "exec_ivj")
    work = os.path.join(os.path.dirname(indir), "exec_ivj_work")
    os.makedirs(work, exist_ok=True)
    stream = (
        spark.readStream.schema(spark.read.parquet(indir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out = interval_join(
        stream.where("event_type = 'click'"),
        stream.where("event_type = 'view'"),
        watermark="3650 days",
    )
    target = _drain(out, work, "append")
    got = spark.read.parquet(target)
    return got.select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "view_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
    )


_register(
    "stream_exec_interval_join",
    _exec_interval_join,
    """
    SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL '30 minutes'
    """,
)


def _exec_interval_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER stream-stream interval join through the real engine —
    the hard half of the matrix: unmatched rows are emitted only when the
    watermark passes their eviction bound, so the staged input appends
    THREE far-future sentinel rows (click/view/click — the global
    watermark is the MIN across both join sides and applies one batch
    late: batch 3 advances the click side, batch 4 the view side, batch 5
    makes the engine evict against the now-cleared min; see
    :func:`_staged_time_halves`), flushing every unmatched click and view
    before the availableNow drain stops. Sentinel rows themselves are
    outside every real user_id and filtered from the sink read-back."""
    from as_etl_storage_spark.streaming.micro_batch import interval_join

    indir = _staged_time_halves(
        spark, sf_dir, "exec_ivjf", sentinel_days=3650
    )
    work = os.path.join(os.path.dirname(indir), "exec_ivjf_work")
    os.makedirs(work, exist_ok=True)
    stream = (
        spark.readStream.schema(spark.read.parquet(indir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out = interval_join(
        stream.where("event_type = 'click'"),
        stream.where("event_type = 'view'"),
        watermark="0 seconds",
        how="full_outer",
    )
    target = _drain(out, work, "append")
    got = spark.read.parquet(target).where("user_id > -900 OR user_id IS NULL")
    return got.select(
        "user_id",
        "click_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        "view_id",
        F.col("view_ts").cast("timestamp_ntz").alias("view_ts"),
    )


_register(
    "stream_exec_interval_join_full",
    _exec_interval_join_full,
    """
    SELECT COALESCE(c.user_id, v.user_id) AS user_id,
           c.event_id AS click_id, c.ts AS click_ts,
           v.event_id AS view_id, v.ts AS view_ts
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    FULL JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON c.user_id = v.user_id
     AND v.ts <= c.ts
     AND v.ts >= c.ts - INTERVAL '30 minutes'
    """,
)


def _exec_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState running totals)
    through the REAL engine across two time-ordered micro-batches: a
    user's count accumulates in the state store between batches, each
    batch emits that user's updated total (update mode), and keep-latest
    per user over the batch sequence must equal the batch aggregation.
    Output sticks to the integer count — float accumulation order inside
    the state machine is engine-specific, counts are order-free."""
    from pyspark.sql import Window

    from as_etl_storage_spark.streaming.stateful import user_activity_totals

    indir = _staged_time_halves(spark, sf_dir, "exec_totals")
    base = os.path.dirname(indir)
    work = os.path.join(base, "exec_totals_work")
    os.makedirs(work, exist_ok=True)
    stream = (
        spark.readStream.schema(spark.read.parquet(indir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    out = user_activity_totals(stream)
    target = os.path.join(work, "out")

    def sink(batch_df, bid):
        batch_df.withColumn("__bid", F.lit(int(bid))).write.mode(
            "append"
        ).parquet(target)

    q = (
        out.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    w = Window.partitionBy("user_id").orderBy(F.col("__bid").desc())
    return (
        got.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "n_events")
    )


_register(
    "stream_exec_running_totals",
    _exec_running_totals,
    """
    SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
    """,
)


def _exec_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous corpus ingest with dedup-at-the-door through the REAL
    engine: documents arrive as two id-ordered micro-batches
    (maxFilesPerTrigger=1, mtime-pinned); each foreachBatch invocation
    dedupes within the batch (keep min doc_id per text), anti-joins on
    the content key against the corpus table written so far, and appends
    only the survivors. Cross-batch state lives in the TABLE, not the
    state store — the ingest-dedup pattern that scales: state-store bytes
    stay O(0) while the corpus grows, and the anti-join is an equi-join
    on the content hash (at 100 TB: semi-join the corpus scan against the
    batch's broadcast key set). Batches are id-ordered, so keep-first
    across the batch sequence equals the global min-id exact dedup — the
    oracle the final corpus is hash-gated against."""
    import shutil

    from as_etl_storage_spark.queries.parity import _scratch_dir

    docs = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    base = _scratch_dir()
    halves = os.path.join(base, "ingest_halves")
    indir = os.path.join(base, "ingest_in")
    work = os.path.join(base, "ingest_work")
    os.makedirs(indir, exist_ok=True)
    os.makedirs(work, exist_ok=True)
    cutoff = docs.agg(F.expr("percentile_approx(doc_id, 0.5)").alias("m")).collect()[
        0
    ]["m"]
    parts = [
        docs.where(F.col("doc_id") <= cutoff),
        docs.where(F.col("doc_id") > cutoff),
    ]
    part = 0
    for i, pdf in enumerate(parts):
        pdir = os.path.join(halves, f"p{i}")
        pdf.orderBy("doc_id").coalesce(1).write.mode("overwrite").parquet(pdir)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                dst = os.path.join(indir, f"part-{part:03d}.parquet")
                shutil.copy(os.path.join(pdir, f), dst)
                # file source orders batches by MODIFICATION TIME — pin it
                os.utime(dst, (1_000_000_000 + part, 1_000_000_000 + part))
                part += 1
    target = os.path.join(work, "corpus")
    stream = (
        spark.readStream.schema(spark.read.parquet(indir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(indir)
    )
    from pyspark.sql import Window

    def sink(batch_df, _bid):
        w = Window.partitionBy("text").orderBy("doc_id")
        fresh = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where("__rn = 1")
            .drop("__rn")
        )
        if os.path.isdir(target):
            corpus_keys = spark.read.parquet(target).select("text")
            fresh = fresh.join(corpus_keys, "text", "left_anti")
        fresh.select(*batch_df.columns).write.mode("append").parquet(target)

    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target).select("doc_id")


_register(
    "stream_exec_ingest_dedup",
    _exec_ingest_dedup,
    """
    SELECT min(doc_id) AS doc_id
    FROM documents WHERE text IS NOT NULL
    GROUP BY text
    """,
)


def _exec_pyds_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python streaming DataSource through the REAL engine: the docreplay
    source (sources/pyds.DocReplayDataSource) emits the documents fixture
    in key-ordered 30-row micro-batches with absolute-position offsets;
    the drain appends every batch to a parquet sink. The union of all
    micro-batches must equal the table exactly — offset management (not
    the transform) is what is under test; readBetweenOffsets gives
    checkpoint recovery identical rows, which the reference's record
    channel cannot do (a crashed batch is lost upstream,
    batch_writer.go:159-261)."""
    from as_etl_storage_spark.queries.parity import _scratch_dir
    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import DocReplayDataSource

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(DocReplayDataSource)
    work = os.path.join(_scratch_dir(), "pyds_replay")
    os.makedirs(work, exist_ok=True)
    import time

    import pyarrow.parquet as pq

    src = os.path.join(sf_dir, "documents.parquet")
    expected = pq.ParquetFile(src).metadata.num_rows
    stream = (
        spark.readStream.format("docreplay")
        .option("path", src)
        .option("key", "doc_id")
        .option("batchrows", "30")
        .load()
    )
    target = os.path.join(work, "out")
    done = {"n": 0}

    def sink(batch_df, _bid):
        batch_df.write.mode("append").parquet(target)
        # count AFTER the write: the stop-poll below must not be able to
        # kill an in-flight final write once the total looks complete
        done["n"] += batch_df.count()

    # availableNow prefetches only ONE simple-reader batch, so run a
    # continuous trigger and stop once every offset has been drained
    q = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    deadline = time.time() + 120
    while done["n"] < expected and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    return spark.read.parquet(target).select(
        "doc_id", "lang", "source", "n_chars"
    )


_register(
    "stream_exec_pyds_replay",
    _exec_pyds_replay,
    "SELECT doc_id, lang, source, n_chars FROM documents",
)


def _exec_pyds_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python streaming SINK with two-phase commit through the real
    engine: the docreplay source feeds micro-batches into the jsonaudit
    writer (sources/pyds.JsonAuditStreamWriter) — per-partition data
    files + an atomic manifest line per committed batch; the read side
    resolves the table through the manifest only, so aborted/uncommitted
    files can never appear. Hash-gated: the manifest-resolved table must
    equal the source table exactly."""
    import json
    import time

    import pyarrow.parquet as pq

    from as_etl_storage_spark.queries.parity import _scratch_dir
    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import (
        DocReplayDataSource,
        JsonAuditDataSource,
        read_json_audit,
    )

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(DocReplayDataSource)
    spark.dataSource.register(JsonAuditDataSource)
    work = os.path.join(_scratch_dir(), "pyds_sink")
    outdir = os.path.join(work, "audit")
    os.makedirs(outdir, exist_ok=True)
    src = os.path.join(sf_dir, "documents.parquet")
    expected = pq.ParquetFile(src).metadata.num_rows
    stream = (
        spark.readStream.format("docreplay")
        .option("path", src)
        .option("key", "doc_id")
        .option("batchrows", "40")
        .load()
        .select("doc_id", "lang", "source", "n_chars")
    )
    q = (
        stream.writeStream.format("jsonaudit")
        .option("outdir", outdir)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )

    def committed() -> int:
        manifest = os.path.join(outdir, "manifest.jsonl")
        if not os.path.exists(manifest):
            return 0
        rows_by_batch = {}
        with open(manifest, encoding="utf-8") as fh:
            for line in fh:
                entry = json.loads(line)
                # last entry per batch id wins (replayed batches append a
                # second line; counting both would stop the drain early)
                rows_by_batch[entry["batch"]] = entry["rows"]
        return sum(rows_by_batch.values())

    deadline = time.time() + 120
    while committed() < expected and time.time() < deadline:
        time.sleep(0.2)
    q.stop()
    q.awaitTermination()
    return read_json_audit(spark, outdir).select(
        "doc_id", "lang", "source", "n_chars"
    )


_register(
    "stream_exec_pyds_sink",
    _exec_pyds_sink,
    "SELECT doc_id, lang, source, n_chars FROM documents",
)


def _exec_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming sink through the REAL engine: a bounded
    file stream (one file per micro-batch) is drained into a
    transaction-log table, then drained AGAIN from a fresh Spark
    checkpoint — the full-replay crash case, every batch re-delivered.
    The table's own txn ledger (txnAppId/txnVersion in the commit
    protocol, streaming/micro_batch.VersionedStreamWriter) must skip
    every replayed batch: the second drain appends nothing, and the
    final table hash-matches the plain batch oracle. The replay-skip is
    asserted in-query (batches_skipped >= 1, zero new versions), so a
    silently-duplicating sink fails loudly before the hash compare."""
    import uuid

    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.streaming.micro_batch import (
        VersionedStreamWriter,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    work = os.path.join(_scratch_dir(), f"vsink-{uuid.uuid4().hex[:8]}")
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    src = os.path.join(work, "src")
    docs.repartition(4).write.parquet(src)
    table = os.path.join(work, "table")

    def drain(checkpoint: str) -> VersionedStreamWriter:
        w = VersionedStreamWriter(
            table, "ingest", checkpoint=os.path.join(work, checkpoint)
        )
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        w.run_available_now(stream)
        return w

    first = drain("cp1")
    if first.batches_seen < 2:
        raise AssertionError(
            f"expected a multi-batch drain, got {first.batches_seen}"
        )
    vt = VersionedTable(spark, table)
    v_after_first = vt.latest_version()
    # fresh checkpoint => Spark re-delivers every batch from scratch
    second = drain("cp2")
    if second.batches_seen != 0 or second.batches_skipped < 1:
        raise AssertionError(
            f"replay not skipped: seen={second.batches_seen} "
            f"skipped={second.batches_skipped}"
        )
    if vt.latest_version() != v_after_first:
        raise AssertionError("replay drain committed new versions")
    return vt.read().select("doc_id", "lang", "source", "n_chars")


_register(
    "stream_exec_versioned_sink",
    _exec_versioned_sink,
    "SELECT doc_id, lang, source, n_chars FROM documents",
)


def _exec_versioned_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC source through the REAL engine — the readStream half
    of the versioned loop (the sink half is stream_exec_versioned_sink):
    ``versioned_changes`` tails an upstream transaction-log table
    version-by-version (offsets ARE log versions; executors read the
    committed files, the driver only walks manifests) into a downstream
    mirror. Three drains against one checkpoint: (1) two appends arrive
    incrementally; (2) an append + COMPACT + append land inside the next
    range — the compact carries data_change: false (Delta's OPTIMIZE
    flag) and is skipped, so the drain stays INCREMENTAL straight across
    the layout rewrite, asserted in-query; (3) a data-changing REPLACE
    lands — the source delivers the full snapshot (_change_type=
    'snapshot') and the mirror takes the documented full-reread recovery
    path (overwrite), also asserted. Downstream must equal the full
    upstream table exactly — no row lost, none double-delivered."""
    import uuid

    from pyspark.sql import functions as F

    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.streaming.micro_batch import (
        VersionedMirrorConsumer,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(VersionedChangesDataSource)
    work = os.path.join(_scratch_dir(), f"vsrc-{uuid.uuid4().hex[:8]}")
    orders = load_table(spark, sf_dir, "orders")
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    up_path = os.path.join(work, "up")
    down_path = os.path.join(work, "down")
    up = VersionedTable(spark, up_path)

    def slice_(q: int, parts: int = 5) -> DataFrame:
        lo_k = q * hi // parts if q else -1
        hi_k = (q + 1) * hi // parts
        return orders.select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ).where((F.col("o_orderkey") > lo_k) & (F.col("o_orderkey") <= hi_k))

    def drain() -> VersionedMirrorConsumer:
        mirror = VersionedMirrorConsumer(down_path, "mirror")
        stream = (
            spark.readStream.format("versioned_changes")
            .option("path", up_path)
            .load()
        )
        mirror.run_available_now(stream)
        return mirror

    up.append(slice_(0))
    up.append(slice_(1))
    m1 = drain()
    if m1.batches_appended < 1 or m1.snapshots_applied != 0:
        raise AssertionError(
            f"first drain should be incremental: appended="
            f"{m1.batches_appended} snapshots={m1.snapshots_applied}"
        )
    up.append(slice_(2))
    up.compact()  # OPTIMIZE races in mid-stream: data_change false
    up.append(slice_(3))
    m2 = drain()
    if m2.batches_appended < 1 or m2.snapshots_applied != 0:
        raise AssertionError(
            f"compaction must be skipped (stream stays incremental): "
            f"appended={m2.batches_appended} "
            f"snapshots={m2.snapshots_applied}"
        )
    up.replace(slice_(4), merge_keys=["o_orderkey"])  # data-changing
    m3 = drain()
    if m3.snapshots_applied != 1:
        raise AssertionError(
            f"a data-changing rewrite must trigger exactly one snapshot "
            f"recovery, got {m3.snapshots_applied}"
        )
    return VersionedTable(spark, down_path).read().select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


_register(
    "stream_exec_versioned_source",
    _exec_versioned_source,
    "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders",
)


def _exec_change_feed_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming replication under row-level DML — the CDF loop closed:
    the upstream table takes appends, a DELETE, an UPDATE and a MERGE;
    a ``versioned_changes`` stream with ``readChangeFeed=true`` delivers
    the change rows and ChangeFeedApplyConsumer APPLIES them to a
    downstream replica (inserts append exactly-once, deletes merge-
    delete, update postimages upsert), across two drains of one
    checkpoint. The replica must equal the final upstream snapshot
    row-for-row WITHOUT ever taking the snapshot-recovery path —
    asserted in-query: zero snapshots applied, every DML kind applied at
    least once. The oracle recomputes the same end state in SQL."""
    import uuid

    from pyspark.sql import functions as F

    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.queries.parity import _scratch_dir
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.streaming.micro_batch import (
        ChangeFeedApplyConsumer,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(VersionedChangesDataSource)
    work = os.path.join(_scratch_dir(), f"cdfa-{uuid.uuid4().hex[:8]}")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    hi = orders.agg(F.max("o_orderkey")).collect()[0][0]
    split = hi // 2
    up_path = os.path.join(work, "up")
    down_path = os.path.join(work, "down")
    up = VersionedTable(spark, up_path)

    def drain() -> ChangeFeedApplyConsumer:
        consumer = ChangeFeedApplyConsumer(
            down_path,
            ["o_orderkey"],
            "cdf-replica",
            checkpoint=os.path.join(work, "cp"),
        )
        stream = (
            spark.readStream.format("versioned_changes")
            .option("path", up_path)
            .option("readChangeFeed", "true")
            .load()
        )
        consumer.run_available_now(stream)
        return consumer

    up.append(orders.where(F.col("o_orderkey") <= split))          # v0
    drain()  # replica bootstraps from the insert feed
    up.append(orders.where(F.col("o_orderkey") > split))           # v1
    up.delete(f"o_orderkey <= {split // 4}")                       # v2
    up.update(
        "o_orderstatus = 'F'", {"o_totalprice": "o_totalprice + 1"}
    )                                                              # v3
    # merge source straddles the delete boundary: keys <= split//4 were
    # deleted (not matched -> CDF inserts), keys in (split//4, split//3]
    # survive (matched -> CDF update pre/post pairs) — one version whose
    # change files carry BOTH kinds
    merge_src = (
        orders.where(F.col("o_orderkey") <= split // 3)
        .withColumn("o_totalprice", -F.col("o_totalprice"))
    )
    up.merge(merge_src, ["o_orderkey"])                            # v4
    c = drain()
    if c.applied["snapshot"] != 0:
        raise AssertionError(
            "CDF replication must never fall back to snapshot recovery; "
            f"applied={c.applied}"
        )
    if not (
        c.applied["insert"] >= 2
        and c.applied["delete"] >= 1
        and c.applied["update"] >= 2  # the UPDATE and the MERGE upsert
    ):
        raise AssertionError(f"feed under-applied: {c.applied}")
    return VersionedTable(spark, down_path).read()


_register(
    "stream_exec_change_feed_apply",
    _exec_change_feed_apply,
    """
    WITH t AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         k AS (SELECT max(o_orderkey) // 2 AS split FROM t)
    -- keys above the merge source: survive the delete, keep the UPDATE's
    -- +1 on 'F' rows
    SELECT o_orderkey, o_orderstatus,
           CASE WHEN o_orderstatus = 'F' THEN o_totalprice + 1
                ELSE o_totalprice END AS o_totalprice
    FROM t WHERE o_orderkey > (SELECT split FROM k) // 3
    UNION ALL
    -- merge source keys: matched rows REPLACED by, unmatched rows
    -- INSERTED as, the source row (negated original price either way)
    SELECT o_orderkey, o_orderstatus, -o_totalprice
    FROM t WHERE o_orderkey <= (SELECT split FROM k) // 3
    """,
)


def _exec_tws_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals through Spark 4's transformWithStateInPandas
    (the successor stateful API: typed ValueState handles on the RocksDB
    state store) across two time-ordered micro-batches — counts AND an
    integer-cents value sum accumulate in the store between batches;
    keep-latest per user over the batch sequence must equal the batch
    aggregation. Exercises the new-API state carryover the same way
    stream_exec_running_totals exercises applyInPandasWithState."""
    from pyspark.sql import Window

    from as_etl_storage_spark.streaming.stateful import user_totals_tws

    indir = _staged_time_halves(spark, sf_dir, "exec_tws")
    base = os.path.dirname(indir)
    work = os.path.join(base, "exec_tws_work")
    os.makedirs(work, exist_ok=True)
    prior = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = (
            spark.readStream.schema(spark.read.parquet(indir).schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(indir)
        )
        out = user_totals_tws(stream)
        target = os.path.join(work, "out")

        def sink(batch_df, bid):
            batch_df.withColumn("__bid", F.lit(int(bid))).write.mode(
                "append"
            ).parquet(target)

        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(sink)
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if prior is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prior
            )
    got = spark.read.parquet(target)
    w = Window.partitionBy("user_id").orderBy(F.col("__bid").desc())
    return (
        got.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "n_events", "sum_cents")
    )


# NOT registered as a contract query: transformWithStateInPandas requires
# the protobuf package (see streaming/stateful.user_totals_tws), which
# this environment does not ship. tests/test_stateful.py asserts the
# guard; the query function stays importable for environments that have
# protobuf (run it manually against the same oracle as
# stream_exec_running_totals plus the integer-cents sum).
TWS_ORACLE = """
    SELECT user_id, count(*) AS n_events,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY user_id
"""
