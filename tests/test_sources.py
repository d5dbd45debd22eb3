"""Dialect registry + parquet source unit tests (C1-C4 parity)."""

import pytest

from as_etl_storage_spark.sources.registry import (
    DialectError,
    dialects,
    get_dialect,
    register_dialect,
)


def test_builtin_dialects_registered():
    assert {"parquet", "jdbc-mysql", "jdbc-oracle"} <= set(dialects())


def test_duplicate_registration_rejected():
    # parity: RegisterDialect panics on dup (dialect.go:24-31)
    with pytest.raises(DialectError, match="already registered"):
        register_dialect("parquet", object)


def test_unknown_dialect_rejected():
    with pytest.raises(DialectError, match="not registered"):
        get_dialect("sqlite")


def test_replace_allows_override():
    sentinel = object()
    register_dialect("test-dialect", sentinel, replace=True)
    assert get_dialect("test-dialect") is sentinel


def test_list_tables(spark):
    from as_etl_storage_spark.sources.parquet import ParquetSource
    from as_etl_storage_spark.spec import ConnectionSpec, TableRef

    src = ParquetSource(
        spark, ConnectionSpec(url="/root/testdata/sf0.001", table=TableRef(name="x"))
    )
    tables = src.list_tables()
    assert "lineitem" in tables and "events" in tables


def test_ping_missing_path(spark):
    from as_etl_storage_spark.sources.parquet import ParquetSource, SourceError
    from as_etl_storage_spark.spec import ConnectionSpec, TableRef

    src = ParquetSource(
        spark, ConnectionSpec(url="/nope", table=TableRef(name="missing"))
    )
    with pytest.raises(SourceError):
        src.ping()


def test_csv_json_orc_roundtrip(spark, tmp_path):
    """File-format sources behind the dialect registry (csv/json/orc/xml)."""
    import json as _json

    from as_etl_storage_spark.runner import run_job
    from as_etl_storage_spark.queries.common import load_table

    orders = load_table(spark, "/root/testdata/sf0.001", "orders")
    n = orders.count()
    src_dir = tmp_path / "src"
    src_dir.mkdir()
    orders.write.option("header", "true").csv(str(src_dir / "orders.csv"))
    orders.write.json(str(src_dir / "orders.json"))
    orders.write.orc(str(src_dir / "orders.orc"))
    orders.write.format("xml").option("rowTag", "row").option(
        "rootTag", "rows"
    ).save(str(src_dir / "orders.xml"))

    for fmt in ("csv", "json", "orc", "xml"):
        out = tmp_path / f"out_{fmt}"
        res = run_job(
            spark,
            {
                "reader": {
                    "dialect": fmt,
                    "connection": {"url": str(src_dir), "table": {"name": "orders"}},
                    "column": ["o_orderkey", "o_totalprice"],
                    "where": "o_totalprice > 1000",
                },
                "writer": {
                    "connection": {"url": str(out), "table": {"name": "t"}},
                    "writeMode": "insert",
                },
            },
        )
        want = orders.where("o_totalprice > 1000").count()
        assert res.written == want, fmt


def test_cli_runs_job(tmp_path):
    import json as _json
    import subprocess
    import sys

    job = {
        "reader": {
            "connection": {"url": "/root/testdata/sf0.001", "table": {"name": "region"}},
            "column": ["*"],
        },
        "writer": {
            "connection": {"url": str(tmp_path), "table": {"name": "out"}},
            "writeMode": "insert",
        },
    }
    spec = tmp_path / "job.json"
    spec.write_text(_json.dumps(job))
    proc = subprocess.run(
        [sys.executable, "-m", "as_etl_storage_spark", str(spec)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
        env={**__import__("os").environ, "SPARK_GRAFT_CPUS": "4",
             "SPARK_DRIVER_MEMORY": "4g"},
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["written"] == 5


def test_cli_rejects_bad_spec(tmp_path):
    import subprocess
    import sys

    spec = tmp_path / "bad.json"
    spec.write_text('{"reader": {"column": []}}')
    proc = subprocess.run(
        [sys.executable, "-m", "as_etl_storage_spark", str(spec)],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=60,
    )
    assert proc.returncode == 2
    assert "invalid job spec" in proc.stderr


def test_binary_dir_source(spark, tmp_path):
    """binaryFile ingestion: one row per file with opaque content, glob
    filtering, and the multimodal decode plumbing downstream."""
    from as_etl_storage_spark.sources import get_dialect
    from as_etl_storage_spark.spec import ConnectionSpec, TableRef

    d = tmp_path / "images"
    d.mkdir()
    (d / "a.png").write_bytes(b"\x89PNG-fake-a")
    (d / "b.png").write_bytes(b"\x89PNG-fake-bb")
    (d / "notes.txt").write_text("not an image")

    src = get_dialect("binary")(
        spark,
        ConnectionSpec(url=str(tmp_path), table=TableRef(name="images")),
        options={"pathGlobFilter": "*.png"},
    )
    df = src.read()
    assert {"path", "modificationTime", "length", "content"} <= set(df.columns)
    rows = {r.path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.png", "b.png"}
    assert bytes(rows["b.png"].content) == b"\x89PNG-fake-bb"
    assert rows["a.png"].length == 11
    assert src.list_tables() == ["images"]


def test_binary_dir_feeds_multimodal_decode(spark, tmp_path):
    from pyspark.sql import functions as F

    from as_etl_storage_spark.operators.multimodal import decode_image_meta
    from as_etl_storage_spark.sources import get_dialect
    from as_etl_storage_spark.spec import ConnectionSpec, TableRef

    d = tmp_path / "imgs"
    d.mkdir()
    (d / "x.bin").write_bytes(b"payload-x")
    (d / "y.bin").write_bytes(b"payload-yy")

    src = get_dialect("binary")(
        spark, ConnectionSpec(url=str(tmp_path), table=TableRef(name="imgs"))
    )
    with_binary = src.read().select(
        F.xxhash64("path").alias("doc_id"), F.col("content").alias("payload")
    )
    decoded = decode_image_meta(with_binary)
    rows = decoded.collect()
    assert {r.n_bytes for r in rows} == {9, 10}
    assert all(r.width == r.n_bytes % 64 + 1 for r in rows)


def test_text_lines_source(spark, tmp_path):
    """Raw-corpus line ingestion through the dialect registry: .txt ->
    one row per line -> parquet via the job runner."""
    from as_etl_storage_spark.runner import run_job

    src = tmp_path / "corpus"
    src.mkdir()
    (src / "raw.txt").write_text("alpha beta\ngamma\ndelta epsilon zeta\n")
    out = tmp_path / "out_text"
    res = run_job(
        spark,
        {
            "reader": {
                "dialect": "text",
                "connection": {"url": str(src), "table": {"name": "raw"}},
                "column": ["*"],
            },
            "writer": {
                "connection": {"url": str(out), "table": {"name": "lines"}},
                "writeMode": "insert",
            },
        },
    )
    assert res.written == 3
    got = spark.read.parquet(f"{out}/lines.parquet")
    assert got.columns == ["value"]
    assert {r["value"] for r in got.collect()} == {
        "alpha beta", "gamma", "delta epsilon zeta",
    }


def test_map_in_arrow_decode_matches_pandas(spark):
    """mapInArrow and mapInPandas decode variants share one contract:
    identical rows for identical input."""
    from as_etl_storage_spark.operators.multimodal import (
        attach_binary,
        decode_image_meta,
        decode_image_meta_arrow,
    )
    from as_etl_storage_spark.queries.common import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    wb = attach_binary(docs, "doc_id", "text")
    a = decode_image_meta_arrow(wb)
    b = decode_image_meta(wb)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() == docs.count()


def test_ppm_codec_is_real(spark):
    """The P6 codec parses actual bytes: a hand-built payload decodes to
    its true dims/sums, and malformed input raises like a real decoder."""
    import numpy as np
    import pytest

    from as_etl_storage_spark.operators.multimodal import (
        _ppm_decode,
        _ppm_encode,
    )

    payload = _ppm_encode(10)
    w, h, px = _ppm_decode(payload)
    assert (w, h) == (10 % 16 + 4, 10 % 12 + 4)
    assert px.shape == (h, w, 3)
    expect = (np.arange(w * h * 3, dtype=np.int64) + 70) % 256
    assert (px.reshape(-1) == expect).all()
    # a hand-built 1x1 red pixel image decodes exactly
    one = b"P6\n1 1\n255\n" + bytes([255, 0, 0])
    w1, h1, px1 = _ppm_decode(one)
    assert (w1, h1) == (1, 1) and px1[0, 0].tolist() == [255, 0, 0]
    with pytest.raises(ValueError, match="P6"):
        _ppm_decode(b"JFIF....")
    with pytest.raises(ValueError, match="size mismatch"):
        _ppm_decode(b"P6\n2 2\n255\n" + bytes(5))


def test_wav_codec_is_real(spark):
    """The WAV codec builds and parses canonical RIFF/PCM bytes: a
    hand-built 3-sample file decodes exactly; malformed layouts raise."""
    import struct

    import numpy as np
    import pytest

    from as_etl_storage_spark.operators.multimodal import (
        _wav_decode,
        _wav_encode,
    )

    rate, pcm = _wav_decode(_wav_encode(7, sample_rate=8000))
    assert rate == 8000 and pcm.size == 7 % 500 + 100
    data = np.array([-1, 0, 32767], dtype="<i2").tobytes()
    hand = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 44100, 88200, 2, 16)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    rate2, pcm2 = _wav_decode(hand)
    assert rate2 == 44100 and pcm2.tolist() == [-1, 0, 32767]
    with pytest.raises(ValueError, match="RIFF"):
        _wav_decode(b"OggS....")
    with pytest.raises(ValueError, match="unsupported WAV layout"):
        _wav_decode(
            hand[:20] + struct.pack("<H", 2) + hand[22:]  # stereo
        )


def test_vid_codec_is_real(spark):
    """The VID container parses actual bytes: frames reshape to the
    declared dims, frame f's first byte equals the synthesis rule, and
    malformed containers raise."""
    import pytest

    from as_etl_storage_spark.operators.multimodal import (
        _vid_decode,
        _vid_encode,
        _vid_shape,
    )

    n, w, h = _vid_shape(9)
    cnt, ww, hh, frames = _vid_decode(_vid_encode(9))
    assert (cnt, ww, hh) == (n, w, h)
    assert frames.shape == (n, h, w, 3)
    for f in range(n):
        assert frames[f, 0, 0, 0] == (9 * 7 + f * w * h * 3) % 256
    with pytest.raises(ValueError, match="VID"):
        _vid_decode(b"RIFF....")
    with pytest.raises(ValueError, match="size mismatch"):
        _vid_decode(b"VID\n2 2 2\n" + bytes(5))


def test_pyds_rangesplit_partitions_and_pushdown(spark, sf_dir):
    # the Python DataSource's splits must reproduce do_split exactly and
    # partition the key domain without gap/overlap/loss
    import os

    from as_etl_storage_spark.plans.split import do_split
    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import (
        RangeSplitDataSource,
        RangeSplitReader,
        _key_bounds,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    path = os.path.join(sf_dir, "orders.parquet")
    lo, hi = _key_bounds(path, "o_orderkey")
    reader = RangeSplitReader(
        {"path": path, "key": "o_orderkey", "num": "5"}
    )
    parts = reader.partitions()
    assert [(p.lo, p.hi) for p in parts] == do_split(lo, hi, 5)
    assert parts[0].lo == lo and parts[-1].hi == hi and parts[-1].closed
    for a, b in zip(parts, parts[1:]):
        assert a.hi == b.lo and not a.closed

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(RangeSplitDataSource)
    df = (
        spark.read.format("rangesplit")
        .option("path", path)
        .option("key", "o_orderkey")
        .option("num", "5")
        .option("columns", "o_orderkey")
        .load()
    )
    native = spark.read.parquet(path)
    assert df.rdd.getNumPartitions() == 5
    assert df.count() == native.count()
    assert df.select("o_orderkey").distinct().count() == \
        native.select("o_orderkey").distinct().count()


def test_pyds_filter_pushdown(spark, sf_dir):
    # comparison predicates reach the pyarrow scan (P2 through the
    # official pushFilters API); the plan must not re-read what the
    # source already filtered, and results must match the native reader
    import os

    from pyspark.sql.datasource import GreaterThan, StringContains
    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import (
        RangeSplitDataSource,
        RangeSplitReader,
    )

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    path = os.path.join(sf_dir, "orders.parquet")
    reader = RangeSplitReader({"path": path, "key": "o_orderkey", "num": "2"})
    leftover = list(
        reader.pushFilters(
            [
                GreaterThan(("o_totalprice",), 200000.0),
                StringContains(("o_orderstatus",), "O"),
            ]
        )
    )
    # the comparison is consumed, the string predicate handed back
    assert [type(f) for f in leftover] == [StringContains]
    assert [type(f) for f in reader.pushed] == [GreaterThan]
    rows = [
        b.num_rows
        for p in reader.partitions()
        for b in reader.read(p)
    ]
    native = spark.read.parquet(path)
    assert sum(rows) == native.where("o_totalprice > 200000.0").count()

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(RangeSplitDataSource)
    df = (
        spark.read.format("rangesplit")
        .option("path", path)
        .option("key", "o_orderkey")
        .option("num", "4")
        .option("columns", "o_orderkey,o_totalprice,o_orderstatus")
        .load()
        .where("o_totalprice > 200000.0 AND o_orderstatus = 'F'")
    )
    want = native.where("o_totalprice > 200000.0 AND o_orderstatus = 'F'")
    assert df.count() == want.count()
    assert df.agg({"o_orderkey": "sum"}).collect()[0][0] == \
        want.agg({"o_orderkey": "sum"}).collect()[0][0]


def test_json_audit_replayed_batch_invisible(spark, tmp_path):
    # a batch committed twice (checkpoint-recovery replay) must read back
    # once: last manifest entry per batch id wins
    import json

    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import read_json_audit

    outdir = str(tmp_path)
    data = tmp_path / "data"
    data.mkdir()
    f1, f2 = data / "b0-try1.jsonl", data / "b0-try2.jsonl"
    f1.write_text('{"k": 1}\n{"k": 2}\n')
    f2.write_text('{"k": 1}\n{"k": 2}\n')
    manifest = tmp_path / "manifest.jsonl"
    manifest.write_text(
        json.dumps({"batch": 0, "files": [str(f1)], "rows": 2})
        + "\n"
        + json.dumps({"batch": 0, "files": [str(f2)], "rows": 2})
        + "\n"
    )
    got = read_json_audit(spark, outdir)
    assert got.count() == 2  # not 4


def test_rangesplit_key_bounds_after_struct_column(tmp_path):
    """Row-group stats are addressed by parquet LEAF index, which diverges
    from the Arrow field index when a struct column precedes the key —
    the old field-index lookup silently read the wrong column's stats."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest

    from as_etl_storage_spark.sources.pyds import _key_bounds

    t = pa.table({
        "s": pa.array([{"a": i, "b": i * 1000} for i in range(50)]),
        "id": pa.array(range(100, 150)),
    })
    p = str(tmp_path / "nested.parquet")
    pq.write_table(t, p)
    assert _key_bounds(p, "id") == (100, 149)
    with pytest.raises(ValueError, match="not found among parquet leaf"):
        _key_bounds(p, "nope")


def test_filesource_options_survive_repeat_reads(spark, tmp_path):
    """read() must not mutate the configured options: the second read on
    the same source instance previously lost rowTag and parsed with the
    'row' default."""
    from as_etl_storage_spark.sources.files import FileSource
    from as_etl_storage_spark.spec import ConnectionSpec

    xml = (
        "<records><record><k>1</k><v>a</v></record>"
        "<record><k>2</k><v>b</v></record></records>"
    )
    (tmp_path / "t.xml").write_text(xml)
    conn = ConnectionSpec.from_json(
        {"url": str(tmp_path), "table": {"name": "t"}}
    )
    src = FileSource(spark, conn, "xml", options={"rowTag": "record"})
    assert src.read().count() == 2
    assert src.read().count() == 2  # second read keeps rowTag


def test_pinned_snapshot_reads_partitioned_layout(spark, tmp_path):
    """snapshot=True on a hive-partitioned table (writer partition_by)
    must pin the leaf files recursively and recover partition columns."""
    from as_etl_storage_spark.sources.parquet import ParquetSource
    from as_etl_storage_spark.spec import ConnectionSpec

    df = spark.createDataFrame(
        [(i, i % 3, f"r{i}") for i in range(30)], "id: long, part: int, s: string"
    )
    target = str(tmp_path / "pt.parquet")
    df.write.partitionBy("part").parquet(target)
    conn = ConnectionSpec.from_json(
        {"url": str(tmp_path), "table": {"name": "pt"}}
    )
    got = ParquetSource(spark, conn).read(snapshot=True)
    assert got.count() == 30
    assert "part" in got.columns
    assert got.select("part").distinct().count() == 3


def test_nanos_flag_restored_after_batch_read(spark, tmp_path):
    """read_parquet_table converts TIMESTAMP(NANOS) but must NOT leave the
    session-wide nanosAsLong flag set: a later plain read of a NANOS file
    should still fail fast instead of silently returning bigints."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from as_etl_storage_spark.sources.parquet import read_parquet_table

    p = str(tmp_path / "ns.parquet")
    ts = pa.array(np.arange(5) * 10**9 + 123456789, type=pa.timestamp("ns"))
    pq.write_table(pa.table({"id": pa.array(range(5)), "ts": ts}), p)
    df = read_parquet_table(spark, p)
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "false"
    assert dict(df.dtypes)["ts"].startswith("timestamp")
    first = df.orderBy("id").first()["ts"]
    assert first.microsecond == 123456  # ns truncated to micros
    # the converted frame stays executable after the restore
    assert df.count() == 5


def test_plan_cache_plans_only_and_session_keyed(spark, tmp_path):
    """The parquet metadata/plan cache memoizes UNEXECUTED plans only:
    a hit must re-read data (clearCache never needs to flush it), any
    data-file change must invalidate via the mtime+size fingerprint, and
    entries are keyed by (session identity, applicationId) so a plan can
    never be served to a different SparkContext."""
    import os
    import time

    from as_etl_storage_spark.sources import parquet as pq_src

    p = str(tmp_path / "t.parquet")
    spark.range(5).toDF("a").coalesce(1).write.parquet(p)
    df1 = pq_src.read_parquet_table(spark, p)
    assert df1.count() == 5
    key = (id(spark), spark.sparkContext.applicationId, p)
    assert key in pq_src._PLAN_CACHE
    # same fingerprint -> cache hit returns the SAME plan object
    assert pq_src.read_parquet_table(spark, p) is df1
    # clearCache (which drops persisted RDD blocks) must not be needed
    # for freshness: the cached value re-reads parquet on every action
    spark.catalog.clearCache()
    assert pq_src.read_parquet_table(spark, p) is df1
    # rewrite the data -> fingerprint changes -> entry invalidated and
    # the fresh plan serves the new rows (no stale-result serving)
    time.sleep(0.01)
    spark.range(7).toDF("a").coalesce(1).write.mode("overwrite").parquet(p)
    df2 = pq_src.read_parquet_table(spark, p)
    assert df2.count() == 7
    # the cache key carries the applicationId: a different context can
    # never hit this entry even if a future session object reused the
    # same id()
    assert all(
        k[1] == spark.sparkContext.applicationId
        for k in pq_src._PLAN_CACHE
        if k[0] == id(spark)
    )


def test_jsonaudit_serializes_rich_types(spark, tmp_path):
    """The jsonaudit writers must serialize timestamp/date/decimal/binary
    columns instead of crashing every task with TypeError."""
    import json
    import os

    from as_etl_storage_spark.sources.pyds import JsonAuditDataSource

    spark.dataSource.register(JsonAuditDataSource)
    out = str(tmp_path / "audit")
    df = spark.sql(
        "SELECT TIMESTAMP '2024-01-02 03:04:05.123456' AS ts, "
        "DATE '2024-06-30' AS d, CAST(1.25 AS DECIMAL(10,2)) AS dec, "
        "X'DEADBEEF' AS bin, 7 AS n"
    )
    df.write.format("jsonaudit").mode("overwrite").option("outdir", out).save()
    manifest = os.path.join(out, "manifest.jsonl")
    entry = json.loads(open(manifest).read().strip().splitlines()[-1])
    rows = []
    for f in entry["files"]:
        with open(f) as fh:
            rows += [json.loads(line) for line in fh]
    assert len(rows) == 1
    r = rows[0]
    assert r["d"] == "2024-06-30" and r["dec"] == "1.25"
    assert r["bin"] == "deadbeef" and r["n"] == 7
    assert r["ts"].startswith("2024-01-02T03:04:05.123456")


def test_nanos_detection_samples_multiple_files(tmp_path):
    """A directory mixing native-us and TIMESTAMP(NANOS) files must flag
    the nanos column regardless of which file sorts first — one footer
    is not a dataset."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from as_etl_storage_spark.sources.parquet import _nanos_timestamp_columns

    d = tmp_path / "mixed.parquet"
    d.mkdir()
    us = pa.array(np.arange(3) * 10**6, type=pa.timestamp("us"))
    pq.write_table(
        pa.table({"id": pa.array(range(3)), "ts": us}),
        str(d / "part-000.parquet"),
    )
    ns = pa.array(np.arange(3) * 10**9 + 123456789, type=pa.timestamp("ns"))
    pq.write_table(
        pa.table({"id": pa.array(range(3)), "ts": ns}),
        str(d / "part-001.parquet"),
    )
    assert _nanos_timestamp_columns(str(d)) == ["ts"]


# ----------------------------------- versioned_changes CDC stream source ---
def _drain_versioned_changes(spark, path, cp, on_rewrite=None):
    """Helper: availableNow drain of the CDC source; returns the batches
    as [(batch_id, rows)]."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource

    spark.dataSource.register(VersionedChangesDataSource)
    out = []

    def sink(df, bid):
        out.append((bid, df.collect()))

    reader = spark.readStream.format("versioned_changes").option("path", path)
    if on_rewrite:
        reader = reader.option("onrewrite", on_rewrite)
    q = (
        reader.load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", cp)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def test_versioned_changes_stream_tails_appends(spark, tmp_path):
    """The CDC source delivers committed appends as 'insert' rows with
    their _commit_version, resumes from the checkpoint offset across
    restarts, and an idle drain (no new commits) delivers nothing."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    cp = str(tmp_path / "cp")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))
    vt.append(spark.range(10, 30))

    out = _drain_versioned_changes(spark, up, cp)
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(30))
    assert {r._change_type for r in rows} == {"insert"}
    assert {r._commit_version for r in rows} == {0, 1}

    # restart with no new commits: nothing re-delivered
    out = _drain_versioned_changes(spark, up, cp)
    assert [r for _, b in out for r in b] == []

    # restart after one more append: only the delta arrives
    vt.append(spark.range(30, 35))
    out = _drain_versioned_changes(spark, up, cp)
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(30, 35))
    assert {r._commit_version for r in rows} == {2}


def test_versioned_changes_compact_is_transparent(spark, tmp_path):
    """A compact inside the consumed range is SKIPPED (data_change:
    false): the stream stays incremental straight across an OPTIMIZE —
    only the append deltas arrive, none of the rewritten files."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))
    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    assert sorted(r.id for _, b in out for r in b) == list(range(10))

    vt.append(spark.range(10, 20))          # v1
    vt.compact(target_file_bytes=1 << 30)   # v2: layout only
    vt.append(spark.range(20, 25))          # v3

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert {r._change_type for r in rows} == {"insert"}
    assert sorted(r.id for r in rows) == list(range(10, 25))  # deltas only
    assert {r._commit_version for r in rows} == {1, 3}  # compact invisible


def test_versioned_changes_rewrite_snapshot_and_fail(spark, tmp_path):
    """A DATA-CHANGING rewrite inside the consumed range: default
    delivers the FULL snapshot tagged _change_type='snapshot' (the batch
    consumer's full-reread recovery, lifted into streaming);
    onrewrite=fail raises with an actionable message instead (Delta's
    default posture)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))
    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp1"))
    assert sorted(r.id for _, b in out for r in b) == list(range(10))

    vt.append(spark.range(10, 20))
    vt.overwrite(spark.range(0, 22))
    vt.append(spark.range(22, 25))

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp1"))
    rows = [r for _, b in out for r in b]
    assert {r._change_type for r in rows} == {"snapshot"}
    assert sorted(r.id for r in rows) == list(range(25))  # full snapshot
    assert {r._commit_version for r in rows} == {vt.latest_version()}

    with pytest.raises((Py4JJavaError, Exception), match="rewrite"):
        _drain_versioned_changes(
            spark, up, str(tmp_path / "cp2"), on_rewrite="fail"
        )


def test_versioned_mirror_consumer_end_to_end(spark, tmp_path):
    """VersionedMirrorConsumer over the CDC stream: inserts append
    idempotently, a compact upstream is invisible (the drain stays
    incremental), a data-changing overwrite delivers a snapshot batch
    the mirror applies as an overwrite (recovery), and the final mirror
    equals the upstream table exactly."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.streaming.micro_batch import (
        VersionedMirrorConsumer,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark.dataSource.register(VersionedChangesDataSource)
    up_path, down_path = str(tmp_path / "up"), str(tmp_path / "down")
    up = VersionedTable(spark, up_path)

    def drain():
        m = VersionedMirrorConsumer(down_path, "mirror")
        m.run_available_now(
            spark.readStream.format("versioned_changes")
            .option("path", up_path)
            .load()
        )
        return m

    up.append(spark.range(0, 10))
    up.append(spark.range(10, 20))
    m = drain()
    assert m.batches_appended >= 1 and m.snapshots_applied == 0
    up.append(spark.range(20, 30))
    up.compact(target_file_bytes=1 << 30)
    up.append(spark.range(30, 40))
    m = drain()
    assert m.batches_appended >= 1 and m.snapshots_applied == 0
    up.overwrite(spark.range(0, 45))
    m = drain()
    assert m.snapshots_applied == 1 and m.batches_appended == 0
    up.append(spark.range(45, 50))
    m = drain()
    assert m.batches_appended >= 1 and m.snapshots_applied == 0
    down = VersionedTable(spark, down_path)
    assert sorted(r.id for r in down.read().collect()) == list(range(50))


def test_versioned_changes_offsets_are_pure_metadata(spark, tmp_path):
    """Reader-level contract without a running stream: offsets come from
    the manifest log alone, partitions(start, end) is a deterministic
    pure function of the log (exact replay of any committed window — the
    crash-recovery property), an empty range yields no partitions, and
    every partition carries only file paths + delivery metadata (no data
    was read: the driver's work is O(files) metadata)."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))
    vt.append(spark.range(10, 30))

    r = VersionedChangesStreamReader({"path": up})
    assert r.initialOffset() == {"version": -1}
    assert r.latestOffset() == {"version": 1}
    p1 = r.partitions({"version": -1}, {"version": 1})
    p2 = r.partitions({"version": -1}, {"version": 1})
    assert [(p.path, p.version, p.kind) for p in p1] == [
        (p.path, p.version, p.kind) for p in p2
    ]
    assert {p.kind for p in p1} == {"insert"}
    assert r.partitions({"version": 1}, {"version": 1}) == []
    # the second version's window alone replays exactly its own files
    delta = r.partitions({"version": 0}, {"version": 1})
    assert {p.version for p in delta} == {1}
    rows = [row for p in delta for b in r.read(p) for row in b.to_pylist()]
    assert sorted(x["id"] for x in rows) == list(range(10, 30))


def test_versioned_mirror_replay_skipped_by_ledger(spark, tmp_path):
    """Crash-replay exactly-once for the mirror: a FRESH Spark checkpoint
    re-delivers the full consumed range, and the downstream table's own
    txn ledger (not the checkpoint) skips it — no rows double-applied,
    no new downstream versions."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.streaming.micro_batch import (
        VersionedMirrorConsumer,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark.dataSource.register(VersionedChangesDataSource)
    up_path, down_path = str(tmp_path / "up"), str(tmp_path / "down")
    up = VersionedTable(spark, up_path)
    up.append(spark.range(0, 10))
    up.append(spark.range(10, 30))

    def drain(cp):
        m = VersionedMirrorConsumer(
            down_path, "mirror", checkpoint=str(tmp_path / cp)
        )
        m.run_available_now(
            spark.readStream.format("versioned_changes")
            .option("path", up_path)
            .load()
        )
        return m

    m1 = drain("cp1")
    assert m1.batches_appended >= 1
    down = VersionedTable(spark, down_path)
    v_after = down.latest_version()
    m2 = drain("cp2")  # fresh checkpoint: full re-delivery
    assert m2.batches_skipped >= 1 and m2.batches_appended == 0
    assert down.latest_version() == v_after
    assert sorted(r.id for r in down.read().collect()) == list(range(30))


def test_versioned_changes_additive_schema_evolution(spark, tmp_path):
    """The CDC stream's declared schema comes from the NEWEST snapshot
    file, so a column added by additive evolution is present; files
    committed before the column existed deliver NULLs for it (the
    mergeSchema behavior, at the stream boundary)."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 5))                                   # v0: id
    vt.append(
        spark.range(5, 10).withColumn("extra", F.col("id") * 10),
        merge_schema=True,  # additive evolution is explicit (Delta rule)
    )

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(10))
    got = {r.id: r.extra for r in rows}
    assert all(got[i] is None for i in range(5))       # pre-evolution
    assert all(got[i] == i * 10 for i in range(5, 10))  # post-evolution


def test_versioned_changes_onrewrite_skip(spark, tmp_path):
    """onrewrite=skip (Delta's skipChangeCommits): a data-changing
    rewrite in the range is ignored and only the append deltas flow —
    downstream gets the append stream, accepting that rewrite-era
    corrections are not reflected."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))            # v0
    vt.append(spark.range(10, 20))           # v1
    vt.overwrite(spark.range(100, 105))      # v2: data-changing
    vt.append(spark.range(20, 25))           # v3

    out = _drain_versioned_changes(
        spark, up, str(tmp_path / "cp"), on_rewrite="skip"
    )
    rows = [r for _, b in out for r in b]
    assert {r._change_type for r in rows} == {"insert"}
    assert sorted(r.id for r in rows) == list(range(25))  # appends only
    assert {r._commit_version for r in rows} == {0, 1, 3}


def test_versioned_changes_starting_version_and_timestamp(spark, tmp_path):
    """startingVersion / startingTimestamp (Delta parity): a fresh
    stream begins delivery at the pinned point instead of version 0;
    the two options are mutually exclusive."""
    import time as _time

    import pytest

    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))    # v0
    t_mid = _time.time()
    _time.sleep(0.02)
    vt.append(spark.range(10, 20))   # v1
    vt.append(spark.range(20, 25))   # v2

    def drain(**opts):
        from as_etl_storage_spark.sources.pyds import (
            VersionedChangesDataSource,
        )

        spark.dataSource.register(VersionedChangesDataSource)
        out = []
        reader = spark.readStream.format("versioned_changes").option(
            "path", up
        )
        for k, v in opts.items():
            reader = reader.option(k, str(v))
        q = (
            reader.load()
            .writeStream.foreachBatch(lambda df, b: out.append(df.collect()))
            .option(
                "checkpointLocation",
                str(tmp_path / f"cp{len(list(opts))}{_time.monotonic_ns()}"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return [r for b in out for r in b]

    rows = drain(startingversion=1)
    assert sorted(r.id for r in rows) == list(range(10, 25))  # v1 + v2
    rows = drain(startingtimestamp=t_mid)
    assert sorted(r.id for r in rows) == list(range(10, 25))
    rows = drain(startingtimestamp=0.0)  # before the first commit: all
    assert sorted(r.id for r in rows) == list(range(25))
    with pytest.raises(ValueError, match="mutually exclusive"):
        VersionedChangesStreamReader(
            {"path": up, "startingversion": "1", "startingtimestamp": "0"}
        )


def test_versioned_changes_read_change_feed(spark, tmp_path):
    """readChangeFeed=true (Delta CDF streaming): row-level DML versions
    deliver their recorded change rows — delete / update_preimage /
    update_postimage / insert — instead of tripping the rewrite path, so
    a downstream consumer can APPLY deletes and updates incrementally.
    Without the option the same log still follows onrewrite."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark.dataSource.register(VersionedChangesDataSource)
    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(20))                       # v0
    vt.delete("id >= 15")                            # v1
    vt.update("id = 0", {"id": "100"})               # v2

    out = []

    def sink(df, bid):
        out.append(df.collect())

    q = (
        spark.readStream.format("versioned_changes")
        .option("path", up)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for b in out for r in b]
    by = {}
    for r in rows:
        by.setdefault((r._change_type, r._commit_version), []).append(r.id)
    assert sorted(by[("insert", 0)]) == list(range(20))
    assert sorted(by[("delete", 1)]) == [15, 16, 17, 18, 19]
    assert by[("update_preimage", 2)] == [0]
    assert by[("update_postimage", 2)] == [100]
    # default mode (no readChangeFeed): the DML version is a rewrite —
    # onrewrite=fail raises with the documented message
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises(Exception, match="not an append"):
        try:
            _drain_versioned_changes(
                spark, up, str(tmp_path / "cp2"), on_rewrite="fail"
            )
        except PySparkException as e:
            raise RuntimeError(str(e)) from e


def test_versioned_changes_streams_partitioned_table(spark, tmp_path):
    """A hive-partitioned table streams whole: partition columns are
    absent from the footers, so the driver parses each file's partition
    values out of its manifest name, types them through the schema
    probe, and executors materialize them as constant Arrow columns."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    df = (
        spark.range(40)
        .withColumn("region", (F.col("id") % 4).cast("int"))
        .withColumn("val", F.col("id") * 2)
    )
    vt.overwrite(df.coalesce(1), partition_by=["region"])
    vt.append(
        spark.range(40, 50)
        .withColumn("region", F.lit(7))
        .withColumn("val", F.col("id"))
        .coalesce(1)
    )
    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert len(rows) == 50
    assert {r.region for r in rows} == {0, 1, 2, 3, 7}
    by_region = {}
    for r in rows:
        by_region.setdefault(r.region, []).append(r.id)
    assert sorted(by_region[7]) == list(range(40, 50))
    # typed as bigint (int partition values), not string
    assert all(isinstance(r.region, int) for r in rows)


def test_versioned_changes_vacuumed_log_recovery(spark, tmp_path):
    """A fresh stream (no startingVersion) on a log vacuum has truncated
    cannot walk the missing manifests: the source takes the documented
    rewrite-recovery path — full snapshot by default, an actionable
    error under onrewrite=fail — and tails incrementally afterwards."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.overwrite(spark.range(20))
    vt.append(spark.range(20, 30))
    vt.vacuum(retain_last=1, grace_seconds=0.0)

    with pytest.raises(PySparkException, match="vacuumed"):
        _drain_versioned_changes(
            spark, up, str(tmp_path / "cpf"), on_rewrite="fail"
        )

    cp = str(tmp_path / "cp")
    out = _drain_versioned_changes(spark, up, cp)
    rows = [r for _, b in out for r in b]
    assert len(rows) == 30
    assert {r._change_type for r in rows} == {"snapshot"}
    # the same checkpoint then tails appends incrementally
    vt.append(spark.range(30, 33))
    out = _drain_versioned_changes(spark, up, cp)
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == [30, 31, 32]
    assert {r._change_type for r in rows} == {"insert"}


def test_versioned_changes_skip_errors_on_vacuumed_history(spark, tmp_path):
    """onrewrite=skip means "ignore rewrite corrections" — it must NOT
    swallow vacuum-truncated history, where the skipped appends' rows
    are unrecoverable rather than merely restated (Delta's
    skipChangeCommits likewise still errors on truncated logs)."""
    import pytest
    from pyspark.errors.exceptions.base import PySparkException

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 10))
    vt.append(spark.range(10, 30))
    vt.vacuum(retain_last=1, grace_seconds=0.0)

    with pytest.raises(PySparkException, match="vacuumed"):
        _drain_versioned_changes(
            spark, up, str(tmp_path / "cp"), on_rewrite="skip"
        )


def test_versioned_changes_schema_from_log(spark, tmp_path):
    """The CDC stream's declared schema comes from the LOG-recorded table
    schema when present (not a data-file footer probe): an int32 hive
    partition column streams as int with exact values — the legacy probe
    could only infer bigint from the parsed directory name."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    df = (
        spark.range(8)
        .withColumn("region", (F.col("id") % 2).cast("int"))
        .withColumn("val", F.col("id") * 3)
    )
    vt.overwrite(df, partition_by=["region"])

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(8))
    assert {r.id: r.region for r in rows} == {i: i % 2 for i in range(8)}
    # the stream type is the TABLE type, straight from the log
    sch = {f.name: f.dataType.simpleString() for f in vt.table_schema().fields}
    assert sch["region"] == "int"


def test_versioned_changes_date_partition_and_array_column(spark, tmp_path):
    """Two log-schema stream fixes pinned: a DATE hive partition column
    streams with exact values (the parsed directory string is CAST on
    the executor, not fed to a typed pa.array that would refuse str),
    and a metadata-only add_column('emb', 'array<double>') must not
    brick the stream — array<primitive> maps to an arrow list type."""
    import datetime

    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    df = (
        spark.range(6)
        .withColumn(
            "day",
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int") % 2),
        )
        .withColumn("emb", F.array(F.col("id").cast("double")))
    )
    vt.overwrite(df, partition_by=["day"])
    vt.add_column("emb2", "array<double>")  # metadata-only, post-snapshot

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(6))
    for r in rows:
        assert r.day == datetime.date(2024, 1, 1 + r.id % 2)
        assert r.emb == [float(r.id)]
        assert r.emb2 is None  # added after the files were written


def test_versioned_mirror_follows_upstream_evolution(spark, tmp_path):
    """The mirror contract includes SCHEMA: an upstream additive
    evolution must not wedge the downstream on its own enforcement —
    the mirror's appends opt into merge_schema and its snapshot
    recovery restates the upstream schema exactly."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.streaming.micro_batch import (
        VersionedMirrorConsumer,
    )
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark.dataSource.register(VersionedChangesDataSource)
    up_path, down_path = str(tmp_path / "up"), str(tmp_path / "down")
    up = VersionedTable(spark, up_path)

    def drain():
        m = VersionedMirrorConsumer(down_path, "mirror")
        m.run_available_now(
            spark.readStream.format("versioned_changes")
            .option("path", up_path)
            .load()
        )
        return m

    up.append(spark.range(0, 5))
    drain()
    # upstream evolves additively; the mirror stream restarts with the
    # evolved declared schema and must keep appending
    up.append(
        spark.range(5, 10).withColumn("tag", F.lit("new")),
        merge_schema=True,
    )
    m = drain()
    assert m.batches_appended >= 1
    down = VersionedTable(spark, down_path)
    assert down.read().columns == ["id", "tag"]
    got = {r.id: r.tag for r in down.read().collect()}
    assert all(got[i] is None for i in range(5))
    assert all(got[i] == "new" for i in range(5, 10))
    # upstream drops the column and overwrites: snapshot recovery
    # restates the narrowed schema downstream too
    up.drop_column("tag")
    up.overwrite(spark.range(0, 7))
    m = drain()
    assert m.snapshots_applied == 1
    assert down.read().columns == ["id"]
    assert down.read().count() == 7


def test_versioned_changes_snapshot_recovery_applies_dv(spark, tmp_path):
    """Snapshot recovery of a table with deletion vectors must not
    resurrect the deleted rows: each snapshot partition carries its
    file's DV sidecars and the executor subtracts the positions."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.overwrite(spark.range(20))
    vt.delete([("id", "<", 5)], mode="dv")  # data-changing, no rewrite

    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert {r._change_type for r in rows} == {"snapshot"}
    assert sorted(r.id for r in rows) == list(range(5, 20))


def test_versioned_changes_fails_fast_on_mid_stream_evolution(spark, tmp_path):
    """The stream schema is frozen at READER construction; a table
    evolved while the reader lives must FAIL the next micro-batch plan
    (directing a restart) instead of silently projecting the new column
    away — Delta's schema-change posture. A restarted stream (fresh
    reader) sees the evolved schema and delivers the column."""
    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 5))
    # a live reader, constructed before the evolution
    reader = VersionedChangesStreamReader({"path": up})
    assert reader.partitions({"version": -1}, {"version": 0})

    from pyspark.sql import functions as F

    vt.add_column("tag", "string")
    v = vt.append(spark.range(5, 8).withColumn("tag", F.lit("new")))
    # the frozen column list lacks 'tag': planning the next batch fails
    with pytest.raises(RuntimeError, match="schema changed"):
        reader.partitions({"version": 0}, {"version": v})

    # a RESTARTED stream (fresh reader + fresh checkpoint) delivers the
    # evolved schema end to end, pre-evolution files null-filling it
    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp2"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(8))
    assert {r.tag for r in rows if r.id >= 5} == {"new"}
    assert {r.tag for r in rows if r.id < 5} == {None}


def test_versioned_changes_stream_after_rename(spark, tmp_path):
    """A restarted stream on a renamed table delivers the NEW logical
    column name while reading pre-rename files by their stable PHYSICAL
    name — no nulls, no miswiring; and a rename mid-stream trips the
    schema fail-fast."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 5).select("id", (F.col("id") * 2).alias("v")))
    reader = VersionedChangesStreamReader({"path": up})
    assert reader.partitions({"version": -1}, {"version": 0})

    v = vt.rename_column("v", "value")
    # mid-stream rename = schema change: fail fast
    with pytest.raises(RuntimeError, match="schema changed"):
        reader.partitions({"version": 0}, {"version": v})

    vt.append(spark.range(5, 8).select("id", (F.col("id") * 2).alias("value")))
    out = _drain_versioned_changes(spark, up, str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(8))
    # pre-rename files deliver their bytes under the NEW logical name
    assert {r.value for r in rows} == {i * 2 for i in range(8)}


def test_versioned_changes_fails_fast_on_mapping_reset(spark, tmp_path):
    """A schema change that PRESERVES the logical name set — an
    overwrite_schema rewrite that resets a rename's mapping — must still
    trip the mid-stream fail-fast: the frozen reader would otherwise
    look up the old physical name in new files and deliver nulls."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 5).select("id", (F.col("id") * 2).alias("v")))
    vt.rename_column("v", "value")  # physical stays "v"
    reader = VersionedChangesStreamReader({"path": up})
    assert reader.partitions({"version": -1}, {"version": 1})

    # same logical columns [id, value], but the mapping resets: new
    # files store the NAME "value"
    v = vt.overwrite(
        spark.range(5, 9).select("id", (F.col("id") * 2).alias("value")),
        overwrite_schema=True,
    )
    with pytest.raises(RuntimeError, match="schema changed"):
        reader.partitions({"version": 1}, {"version": v})


def test_versioned_changes_restart_replays_pre_evolution_batch(
    spark, tmp_path
):
    """Checkpoint-restart recovery across a schema change: Spark replays
    the last PLANNED batch with its recorded end offset, and the
    restarted reader freezes the CURRENT (evolved) schema. The replayed
    range ends at/before the frozen version, so it must be SERVED under
    the frozen schema (pre-evolution files null-fill the new column) —
    not re-checked against the old range's recorded schema, which would
    raise on every restart and wedge the checkpoint permanently (the
    advised 'restart the stream' could never succeed)."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.sources.pyds import VersionedChangesStreamReader
    from as_etl_storage_spark.writers.versioned import VersionedTable

    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(0, 5))  # v0: planned as batch (-1, 0]
    vt.add_column("tag", "string")  # v1
    v = vt.append(spark.range(5, 8).withColumn("tag", F.lit("new")))  # v2

    # the restarted reader (fresh construction AFTER the evolution)
    # replays the pre-evolution batch: it must plan, not raise
    reader = VersionedChangesStreamReader({"path": up})
    parts = reader.partitions({"version": -1}, {"version": 0})
    assert parts
    rows = [
        r for p in parts for b in reader.read(p) for r in b.to_pylist()
    ]
    assert sorted(r["id"] for r in rows) == list(range(5))
    # pre-evolution files deliver the evolved column as NULL
    assert {r["tag"] for r in rows} == {None}
    # the NEXT batch (past the frozen version) still plans normally
    assert reader.partitions({"version": 0}, {"version": v})


def test_versioned_changes_stream_tails_a_clone(spark, tmp_path):
    """The CDC stream on a SHALLOW CLONE delivers the clone's initial
    snapshot (v0, read through the absolute source references) plus its
    own later appends."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "s"))
    src.overwrite(spark.range(0, 8))
    cl = src.clone(str(tmp_path / "c"))
    cl.append(spark.range(8, 12))
    out = _drain_versioned_changes(spark, str(tmp_path / "c"), str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(12))
    assert {r._commit_version for r in rows} == {0, 1}
    assert {r._change_type for r in rows} == {"insert"}


def test_versioned_changes_stream_clone_applies_dv(spark, tmp_path):
    """The CDC stream on a clone subtracts the clone's carried deletion
    vectors — rows deleted before the clone never reach a downstream
    mirror."""
    from as_etl_storage_spark.writers.versioned import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "s"))
    src.overwrite(spark.range(10).coalesce(1))
    src.delete([("id", "<", 4)], mode="dv", dv_rewrite_fraction=2.0)
    src.clone(str(tmp_path / "c"))
    out = _drain_versioned_changes(spark, str(tmp_path / "c"), str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == list(range(4, 10))


def test_versioned_changes_stream_tails_a_partitioned_clone(
    spark, tmp_path
):
    """The CDC stream on a partitioned SHALLOW CLONE parses partition
    values from the external absolute references' hive segments — the
    clone's v0 delivers correct partition-column values, and its own
    later hive-laid appends keep working."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.writers.versioned import VersionedTable

    src = VersionedTable(spark, str(tmp_path / "s"))
    src.overwrite(
        spark.range(0, 12).select("id", (F.col("id") % 3).alias("k")),
        partition_by=["k"],
    )
    cl = src.clone(str(tmp_path / "c"))
    cl.append(
        spark.range(100, 103).select("id", (F.col("id") % 3).alias("k"))
    )
    out = _drain_versioned_changes(spark, str(tmp_path / "c"), str(tmp_path / "cp"))
    rows = [r for _, b in out for r in b]
    assert sorted(r.id for r in rows) == [*range(12), 100, 101, 102]
    assert {(r.id, r.k) for r in rows} == {
        (i, i % 3) for i in [*range(12), 100, 101, 102]
    }
    assert {r._commit_version for r in rows} == {0, 1}


def test_versioned_changes_feed_across_replace_where(spark, tmp_path):
    """A replace_where commit records CDF delete+insert change files, so
    the readChangeFeed stream applies the restatement incrementally —
    exactly what a plain overwrite (no change files) can never offer."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.sources.pyds import VersionedChangesDataSource
    from as_etl_storage_spark.writers.versioned import VersionedTable

    spark.dataSource.register(VersionedChangesDataSource)
    up = str(tmp_path / "up")
    vt = VersionedTable(spark, up)
    vt.append(spark.range(10).withColumn("v", F.lit("a")))       # v0
    vt.replace_where(
        spark.range(5, 8).withColumn("v", F.lit("b")), "id >= 5"
    )                                                             # v1

    out = []

    q = (
        spark.readStream.format("versioned_changes")
        .option("path", up)
        .option("readChangeFeed", "true")
        .load()
        .writeStream.foreachBatch(lambda df, bid: out.append(df.collect()))
        .option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = [r for b in out for r in b]
    by = {}
    for r in rows:
        by.setdefault((r._change_type, r._commit_version), []).append(r.id)
    assert sorted(by[("insert", 0)]) == list(range(10))
    assert sorted(by[("delete", 1)]) == [5, 6, 7, 8, 9]
    assert sorted(by[("insert", 1)]) == [5, 6, 7]
