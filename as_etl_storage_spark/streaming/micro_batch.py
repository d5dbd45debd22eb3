"""Structured Streaming surface.

Reference parity (W6, database/dbms/writer/batch_writer.go:159-261): the
reference's only streaming construct is a channel pull-loop that flushes a
batch when ``len == batchSize`` (default 1000) or on a ``batchTimeout`` tick
(default 1 s). The faithful Spark mapping is ``foreachBatch`` +
``Trigger.ProcessingTime`` — the trigger is the timeout tick, and
``maxRecordsPerFile`` reproduces the batch-size bound at the file level.

Beyond parity, the north-star streaming operators (SURVEY.md §2.8): event
-time watermarks, tumbling/sliding/session windows, and
``dropDuplicatesWithinWatermark`` over the events fixture schema.

Scale notes: all stateful operators key their state by the grouping columns
— state is partitioned across executors by key hash; watermarks bound state
size. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import DataStreamWriter

#: events fixture schema when ts is stored natively as timestamp[us]
EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

#: legacy variant: ts stored as TIMESTAMP(NANOS), read as int64 ns
EVENTS_SCHEMA_NS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns epoch in the raw files
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def file_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of events parquet files.

    Encoding-aware the same way the batch reader is
    (sources/parquet.py ``read_parquet_table``): probe the parquet footer
    with pyarrow; only when ``ts`` is physically TIMESTAMP(NANOS) read it as
    int64 ns (``nanosAsLong``) and truncate to micros — otherwise read the
    native ``timestamp[us]`` schema directly. Streams can't infer schemas,
    so the footer probe (a driver-side metadata read, not a data scan)
    picks between the two declared schemas.

    ``ts`` is always emitted as TIMESTAMP (not TIMESTAMP_NTZ): event-time
    watermarks require TIMESTAMP, and with the session pinned to UTC the
    NTZ->TIMESTAMP cast preserves the wall-clock instant, so stream results
    join/compare cleanly against the NTZ batch reader output.
    """
    from as_etl_storage_spark.sources.parquet import _nanos_timestamp_columns

    if "ts" in _nanos_timestamp_columns(path):
        # unlike the batch reader (which restores the flag after pinning
        # its relation schema), a stream re-plans a scan every micro-batch
        # for the query's whole lifetime, so the flag must stay set while
        # any NANOS stream may run. Batch reads stay safe either way:
        # read_parquet_table handles both encodings explicitly.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = spark.readStream.schema(EVENTS_SCHEMA_NS).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    raw = spark.readStream.schema(EVENTS_SCHEMA).parquet(path)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


class MicroBatchWriter:
    """foreachBatch sink with the reference's batchSize/batchTimeout knobs
    (writer/config.go:20-23 defaults: 1000 records / 1 s).

    Exactly-once: each micro-batch lands in its own ``batch_id=N``
    partition directory, and a replayed batch (restart after a failure
    between the data write and the checkpoint commit) is skipped when its
    ``_SUCCESS`` marker already exists — idempotent on ``batch_id``, the
    standard foreachBatch exactly-once recipe. A partially-written batch
    (no ``_SUCCESS``) is overwritten in place. Readers see ``batch_id``
    as a partition column — free per-batch provenance/pruning."""

    def __init__(
        self,
        target_path: str,
        batch_size: int = 1000,
        batch_timeout_s: float = 1.0,
        checkpoint: str | None = None,
    ):
        self.target_path = target_path
        self.batch_size = batch_size
        self.batch_timeout_s = batch_timeout_s
        self.checkpoint = checkpoint or f"{target_path}.__checkpoint__"
        self.batches_seen = 0
        self.batches_skipped = 0

    def _batch_dir(self, batch_id: int) -> str:
        import os

        return os.path.join(self.target_path, f"batch_id={batch_id}")

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        batch_dir = self._batch_dir(batch_id)
        if os.path.exists(os.path.join(batch_dir, "_SUCCESS")):
            self.batches_skipped += 1  # replay of a committed batch
            return
        self.batches_seen += 1
        (
            batch_df.write.option("maxRecordsPerFile", self.batch_size)
            .mode("overwrite")
            .parquet(batch_dir)
        )

    def writer(self, stream_df: DataFrame) -> DataStreamWriter:
        return (
            stream_df.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(processingTime=f"{self.batch_timeout_s} seconds")
        )

    def run_available_now(self, stream_df: DataFrame) -> None:
        """Drain all currently-available input (test/bounded mode)."""
        q = (
            stream_df.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class VersionedStreamWriter:
    """foreachBatch sink into a transaction-log table (writers/versioned)
    with exactly-once semantics from the table's own txn ledger (Delta's
    txnAppId/txnVersion recipe): each micro-batch appends under
    ``txn=(app_id, batch_id)``, so a replayed batch — restart between the
    data write and Spark's checkpoint commit — is skipped by the COMMIT
    PROTOCOL itself, not by a marker file. Readers get snapshot
    isolation while the stream runs, time travel per batch, and
    ``changes(from_version)`` for downstream incremental consumers —
    none of which the directory-per-batch sink (MicroBatchWriter) can
    offer."""

    def __init__(
        self,
        table_path: str,
        app_id: str,
        checkpoint: str | None = None,
    ):
        self.table_path = table_path
        self.app_id = app_id
        self.checkpoint = checkpoint or f"{table_path}.__checkpoint__"
        self.batches_seen = 0
        self.batches_skipped = 0

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from as_etl_storage_spark.writers.versioned import VersionedTable

        vt = VersionedTable(batch_df.sparkSession, self.table_path)
        # the first batch creates the table: version 0 is a full-snapshot
        # manifest that carries the txn ledger, so replaying batch 0
        # after a crash is still a skip
        v = vt.append(batch_df, txn=(self.app_id, batch_id))
        if v is None:
            self.batches_skipped += 1
        else:
            self.batches_seen += 1

    def run_available_now(self, stream_df: DataFrame) -> None:
        """Drain all currently-available input (test/bounded mode)."""
        q = (
            stream_df.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class VersionedMirrorConsumer:
    """foreachBatch consumer for the ``versioned_changes`` CDC stream
    (sources/pyds.VersionedChangesDataSource): mirrors an upstream
    versioned table into a downstream one, closing the streaming loop the
    batch consumer (queries/advanced._w_versioned_consume) opened.

    Batches of ``_change_type='insert'`` rows append under
    ``txn=(app_id, batch_id)`` — exactly-once by the table's own ledger,
    as VersionedStreamWriter. A batch carrying ``_change_type='snapshot'``
    rows is the source's rewrite-recovery delivery (an upstream
    compact/overwrite/replace landed inside the consumed range): it
    REPLACES downstream via ``overwrite`` — the streaming form of the
    batch consumer's documented full-reread path. The overwrite needs no
    txn guard: its content is a deterministic function of the upstream
    version it snapshots, so a crash-replay re-overwrites with identical
    rows (idempotent in effect), and the txn ledger survives overwrites
    (full-snapshot manifests carry the ledger forward), so later insert
    batches still deduplicate."""

    def __init__(
        self, table_path: str, app_id: str, checkpoint: str | None = None
    ):
        self.table_path = table_path
        self.app_id = app_id
        self.checkpoint = checkpoint or f"{table_path}.__checkpoint__"
        self.batches_appended = 0
        self.batches_skipped = 0
        self.snapshots_applied = 0

    def _write_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from as_etl_storage_spark.writers.versioned import VersionedTable

        vt = VersionedTable(batch_df.sparkSession, self.table_path)
        data = batch_df.drop("_commit_version", "_change_type")
        # a trigger's batch is homogeneous by construction (the source
        # emits either append deltas or one full snapshot per range), so
        # ONE bounded head() both classifies it and catches the empty
        # trigger (appending an empty frame would mint a junk version)
        head = batch_df.select("_change_type").head(1)
        if not head:
            return
        # a MIRROR follows upstream by contract, schema included: an
        # upstream additive evolution must not wedge the stream on the
        # downstream's enforcement, and a snapshot recovery restates the
        # upstream state exactly (schema and all)
        if head[0][0] == "snapshot":
            vt.overwrite(data, overwrite_schema=True)
            self.snapshots_applied += 1
        else:
            v = vt.append(data, txn=(self.app_id, batch_id), merge_schema=True)
            if v is None:
                self.batches_skipped += 1
            else:
                self.batches_appended += 1

    def run_available_now(self, stream_df: DataFrame) -> None:
        """Drain all currently-available upstream commits."""
        q = (
            stream_df.writeStream.foreachBatch(self._write_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


class ChangeFeedApplyConsumer:
    """foreachBatch consumer for the CDF stream
    (``versioned_changes`` with ``readChangeFeed=true``): maintains a
    downstream REPLICA of a table that undergoes row-level DML by
    APPLYING the change feed — where VersionedMirrorConsumer can only
    append inserts and fall back to snapshot recovery, this one applies
    deletes and updates incrementally, which is the entire point of a
    change feed at 100 TB (replicate a mutating table without re-reading
    it).

    A trigger's batch may span several upstream commits; they are
    applied in COMMIT-VERSION ORDER (a delete at v2 must not land before
    v1's inserts). Per version: ``insert`` rows append (under
    ``txn=(app_id, version)``, exactly-once by the table's ledger);
    ``delete`` rows apply as ``merge(when_matched='delete')``;
    ``update_postimage`` rows upsert as ``merge(when_matched='update',
    when_not_matched='insert')``; preimage rows are audit-only and
    skipped; a ``snapshot`` delivery (upstream overwrite/replace, which
    records no change files) overwrites. Crash-replay is safe end to
    end: the append dedupes on the ledger, re-deleting already-deleted
    keys matches nothing, and re-upserting a postimage writes the same
    values — every step is idempotent, so a partially-applied batch
    re-applies cleanly."""

    def __init__(
        self,
        table_path: str,
        keys: list[str],
        app_id: str,
        checkpoint: str | None = None,
    ):
        self.table_path = table_path
        self.keys = keys
        self.app_id = app_id
        self.checkpoint = checkpoint or f"{table_path}.__checkpoint__"
        self.applied = {"insert": 0, "delete": 0, "update": 0, "snapshot": 0}

    def _apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from as_etl_storage_spark.writers.versioned import VersionedTable

        vt = VersionedTable(batch_df.sparkSession, self.table_path)
        versions = sorted(
            r[0]
            for r in batch_df.select("_commit_version").distinct().collect()
        )
        for v in versions:
            grp = batch_df.where(F.col("_commit_version") == v).drop(
                "_commit_version"
            )
            kinds = {
                r[0]
                for r in grp.select("_change_type").distinct().collect()
            }

            def rows(kind: str) -> DataFrame:
                return grp.where(F.col("_change_type") == kind).drop(
                    "_change_type"
                )

            if "snapshot" in kinds:
                # recovery restates upstream exactly, schema included
                vt.overwrite(rows("snapshot"), overwrite_schema=True)
                self.applied["snapshot"] += 1
                continue
            if "insert" in kinds:
                # follow upstream additive evolution (mirror contract)
                if (
                    vt.append(
                        rows("insert"), txn=(self.app_id, v),
                        merge_schema=True,
                    )
                    is not None
                ):
                    self.applied["insert"] += 1
            if "delete" in kinds:
                if (
                    vt.merge(
                        rows("delete"),
                        self.keys,
                        when_matched="delete",
                        when_not_matched=None,
                    )
                    is not None
                ):
                    self.applied["delete"] += 1
            if "update_postimage" in kinds:
                if (
                    vt.merge(
                        rows("update_postimage"),
                        self.keys,
                        when_matched="update",
                        when_not_matched="insert",
                    )
                    is not None
                ):
                    self.applied["update"] += 1

    def run_available_now(self, stream_df: DataFrame) -> None:
        """Drain and apply all currently-available upstream commits."""
        q = (
            stream_df.writeStream.foreachBatch(self._apply_batch)
            .option("checkpointLocation", self.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()


def tumbling_counts(
    events: DataFrame, width: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window aggregate with a late-data watermark."""
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    """Sliding event-time windows (each event lands in width/slide windows)."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )


def session_windows(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity; window end = last event + gap (Spark session_window
    semantics, reproduced by the gaps-and-islands oracle)."""
    src = events.withWatermark("ts", "2 hours") if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on event_id bounded by a watermark; batch analog is
    plain dropDuplicates (state = full key set)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
            ["event_id"]
        )
    return events.dropDuplicates(["event_id"])


def interval_join(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "1 hour",
    lookback: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join: each click pairs with the same user's views
    in the preceding ``lookback`` interval. Both sides carry watermarks so
    Spark can bound the join state (rows older than watermark+lookback are
    evicted) — the canonical bounded-state stream-stream join shape.

    ``how='left_outer'`` preserves unmatched clicks (null view columns);
    in streaming mode outer results are emitted only once the watermark
    passes, which is exactly why both sides must be watermarked.

    Works identically on batch inputs (no watermark needed there)."""
    c = clicks.select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    if clicks.isStreaming:
        c = c.withWatermark("click_ts", watermark)
        v = v.withWatermark("view_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("click_ts"))
        & (F.col("view_ts") >= F.col("click_ts") - F.expr(f"INTERVAL {lookback}"))
    )
    joined = c.join(v, cond, how)
    # full outer: unmatched views carry a null click-side user_id
    uid = (
        F.coalesce(F.col("user_id"), F.col("v_user_id")).alias("user_id")
        if how == "full_outer"
        else F.col("user_id")
    )
    return joined.select(uid, "click_id", "click_ts", "view_id", "view_ts")


def enrich_with_dim(
    stream: DataFrame, dim: DataFrame, on: str, payload: list[str]
) -> DataFrame:
    """Stream-static enrichment join: each micro-batch joins against the
    current snapshot of the static side, which is broadcast — the stream
    never shuffles. The standard shape for attaching dimension attributes
    (user/customer/catalog rows) to an event stream at scale; works
    identically on a bounded DataFrame for the batch oracle."""
    return stream.join(F.broadcast(dim.select(on, *payload)), on, "left")


def cdc_upsert_stream(
    spark: SparkSession,
    src_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    key_cols: list[str],
    order_cols: list[str],
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Streaming CDC upsert: drain a file-source change stream into a
    keyed table where the newest row per key wins (newest = ``order_cols``
    descending — pass a unique final tie-break column).

    Each micro-batch is compacted with ``keep_latest`` and merged against
    the current target with the SAME keep-latest, so the merge is
    conditional — an out-of-order or replayed change never clobbers a
    newer target row. Because keep-latest is associative, commutative and
    idempotent across batches, the final table is independent of batch
    boundaries/order, and a replay after a crash between the data write
    and the checkpoint commit converges to the same table (exactly-once
    *effect*). The target swap reuses the writer's deterministic-backup
    staging convention, so a crash mid-swap is recoverable on the next
    batch.

    Scale: the parquet backend re-materializes the target per batch
    (single-writer merge); on a real deployment the per-batch merge is
    Delta ``MERGE INTO`` with file pruning on key stats, and everything
    else here is unchanged. State lives in the table, not the stream —
    no Spark state store growth.
    """
    import os
    import shutil

    from as_etl_storage_spark.operators.dedup import keep_latest

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )
    backup = f"{target_dir}.__old__"

    def _upsert(batch_df: DataFrame, batch_id: int) -> None:
        s = batch_df.sparkSession
        if not os.path.exists(target_dir) and os.path.exists(backup):
            os.rename(backup, target_dir)  # recover an interrupted swap
        resolved = keep_latest(batch_df, key_cols, order_cols)
        if os.path.exists(target_dir):
            target = s.read.parquet(target_dir)
            resolved = keep_latest(
                target.unionByName(resolved), key_cols, order_cols
            )
        staging = f"{target_dir}.__staging__{batch_id}"
        resolved.write.mode("overwrite").parquet(staging)
        shutil.rmtree(backup, ignore_errors=True)
        if os.path.exists(target_dir):
            os.rename(target_dir, backup)
        os.rename(staging, target_dir)
        shutil.rmtree(backup, ignore_errors=True)

    q = (
        stream.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(target_dir)
