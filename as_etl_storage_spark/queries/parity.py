"""Reference-parity queries — one per SURVEY.md §2 operator family, each
exercising the real engine path (planner / split / writer), with a DuckDB
oracle expressing the same semantics in ANSI SQL.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from as_etl_storage_spark.plans.planner import plan_read, plan_split_union
from as_etl_storage_spark.plans.split import BigIntConvertor, split_ranges
from as_etl_storage_spark.queries.common import load_table
from as_etl_storage_spark.sources.parquet import ParquetSource
from as_etl_storage_spark.spec import ReaderSpec, WriterSpec
from as_etl_storage_spark.types import dedupe_column_names
from as_etl_storage_spark.writers.writer import ParquetWriter

def _scratch_root() -> str:
    """TTL-GC'd scratch root, derived from the package location (NOT a
    hardcoded absolute path — the repo may be checked out anywhere), with
    an env override and a per-user tempdir fallback for layouts where the
    package parent is not a writable checkout (pip-installed)."""
    import getpass
    import tempfile

    env = os.environ.get("SPARK_GRAFT_SCRATCH_DIR")
    if env:
        return env
    import as_etl_storage_spark as _pkg

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(_pkg.__file__)))
    if os.path.isdir(repo_root) and os.access(repo_root, os.W_OK):
        return os.path.join(repo_root, ".scratch")
    return os.path.join(
        tempfile.gettempdir(),
        f"as-etl-storage-spark-scratch-{getpass.getuser()}",
    )


SCRATCH = _scratch_root()


def _scratch_dir() -> str:
    # GC stale scratch from earlier runs (the writer-parity queries create
    # one dir per invocation; the driver reruns them every round)
    import shutil
    import time

    if os.path.isdir(SCRATCH):
        cutoff = time.time() - 3600
        for entry in os.listdir(SCRATCH):
            p = os.path.join(SCRATCH, entry)
            try:
                if os.path.getmtime(p) < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    path = os.path.join(SCRATCH, uuid.uuid4().hex[:12])
    os.makedirs(path, exist_ok=True)
    return path


def _reader(sf_dir: str, table: str, **over) -> ReaderSpec:
    base = {
        "connection": {"url": sf_dir, "table": {"name": table}},
        "column": ["*"],
    }
    base.update(over)
    return ReaderSpec.from_json(base)


# --- S1/P1/P2: projected + filtered scan (reader/parameter.go:94-120) ------
def s1_scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _reader(
        sf_dir,
        "lineitem",
        column=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"],
        where="l_quantity > 40",
    )
    return plan_read(spark, spec)


# --- S2/S14: raw querySql passthrough (reader/parameter.go:95-101) ---------
def s2_query_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = ReaderSpec.from_json(
        {
            "connection": {"url": sf_dir},
            "querySql": [
                "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
                "count(DISTINCT l_orderkey) AS n_orders "
                "FROM lineitem GROUP BY l_returnflag, l_linestatus"
            ],
        }
    )
    return plan_read(spark, spec)


# --- S3: zero-row schema probe (database/table.go:229-233) -----------------
def s3_schema_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _reader(sf_dir, "orders", where="1 = 2")
    return plan_read(spark, spec)


# --- S5: range-partitioned parallel scan (reader/job.go:122-187) -----------
def s5_split_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _reader(
        sf_dir,
        "lineitem",
        column=["l_orderkey", "l_linenumber", "l_quantity"],
        where="l_quantity > 10",
        split={"key": "l_orderkey", "range": {"type": "bigint"}},
    )
    return plan_split_union(spark, spec, 5)


# --- S8/S9/S12: range split arithmetic over discovered min/max -------------
def s8_split_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The computed split boundaries themselves (doSplit parity,
    split.go:361-391), as rows — hash-checked against the same arithmetic
    in SQL."""
    source = ParquetSource(
        spark, _reader(sf_dir, "lineitem").connection
    )
    lo, hi = source.min_max("l_orderkey")
    ranges = split_ranges(int(lo), int(hi), 8, BigIntConvertor())
    rows = [
        (i, int(a), int(b)) for i, (a, b, _closed) in enumerate(ranges)
    ]
    schema = T.StructType(
        [
            T.StructField("task_id", T.LongType()),
            T.StructField("range_lo", T.LongType()),
            T.StructField("range_hi", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# --- S10: string-key split — radix-128 boundaries partition the table ------
def s10_string_split_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _reader(
        sf_dir,
        "customer",
        column=["c_custkey", "c_name"],
        split={"key": "c_name", "range": {"type": "string"}},
    )
    return plan_split_union(spark, spec, 4)


# --- S11: time-key split at day accuracy -----------------------------------
def s11_time_split_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _reader(
        sf_dir,
        "orders",
        column=["o_orderkey", "o_orderdate"],
        split={"key": "o_orderdate", "timeAccuracy": "day", "range": {"type": "time"}},
    )
    return plan_split_union(spark, spec, 6)


# --- S12/A1: min/max discovery (reader/parameter.go:203-254) ---------------
def s12_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    return df.agg(
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# --- S13: pre-declared range bounds (split.go:47-61) -----------------------
def s13_declared_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranges = split_ranges(1000, 9999, 7, BigIntConvertor())
    rows = [(i, int(a), int(b)) for i, (a, b, _c) in enumerate(ranges)]
    schema = T.StructType(
        [
            T.StructField("task_id", T.LongType()),
            T.StructField("range_lo", T.LongType()),
            T.StructField("range_hi", T.LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# --- P4: CHAR trim rule (database/config.go:97-111) ------------------------
def p4_trim_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "customer")
    padded = F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))
    return df.select(
        "c_custkey", F.trim(padded).alias("trimmed")
    )


# --- P5-P8: type-coercion matrix ------------------------------------------
def p5_type_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_linenumber").cast("bigint").alias("ln_big"),
        F.col("l_quantity").cast("decimal(18,2)").cast("double").alias("qty_dec"),
        F.col("l_orderkey").cast("string").alias("key_str"),
        (F.col("l_quantity") > 25).alias("qty_gt25"),
    )


# --- P6: Oracle read normalization (oracle/field.go:191-205) ---------------
def p6_oracle_empty_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle dialect read rules on a staged frame: empty string ≡ NULL for
    every string column (applied first), then CHAR/NCHAR trim — so a
    blanks-only CHAR survives the NULL check and trims to the empty string,
    exactly the reference's evaluation order."""
    from as_etl_storage_spark.sources.jdbc import ORACLE

    df = load_table(spark, sf_dir, "customer")
    staged = df.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, F.lit(""))
        .otherwise(F.col("c_mktsegment"))
        .alias("segment"),
        F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")).alias("c_name"),
        F.when(F.col("c_custkey") % 11 == 0, F.lit("   "))
        .otherwise(F.col("c_mktsegment"))
        .alias("c_class"),
    )
    return ORACLE.normalize(staged, {"c_name": "CHAR", "c_class": "CHAR"})


# --- P8: Oracle write-side stringify (oracle/field.go:257-287) -------------
def p8_write_stringify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle write coercion: every non-binary column binds as its string
    rendering (booleans '1'/'0', NULL stays NULL); doubles go through the
    declared DECIMAL(12,2) first (P7 write coercion) so the rendering is
    exact on both engines."""
    from as_etl_storage_spark.sources.jdbc import ORACLE

    df = load_table(spark, sf_dir, "orders")
    staged = df.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(12,2)").alias("o_totalprice"),
        (F.col("o_orderkey") % 2 == 0).alias("is_even"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("o_custkey"))
        .alias("custkey_opt"),
    )
    return ORACLE.write_frame(staged)


# --- P10: duplicate column rename (db.go:425-432) --------------------------
def p10_dup_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = load_table(spark, sf_dir, "lineitem")
    dup = df.select(
        F.col("l_orderkey"), F.col("l_quantity").alias("l_orderkey"),
        F.col("l_linenumber"),
    )
    return dup.toDF(*dedupe_column_names(dup.columns))


# --- W1: insert/append (database/table.go:156-214) -------------------------
def w1_insert_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _scratch_dir()
    spec = WriterSpec.from_json(
        {"connection": {"url": out, "table": {"name": "w1"}}, "writeMode": "insert"}
    )
    src = load_table(spark, sf_dir, "orders")
    writer = ParquetWriter(spark, spec)
    writer.write(src)
    writer.write(src)  # second append doubles every group
    written = spark.read.parquet(writer.target_path())
    return written.groupBy("o_orderstatus").agg(F.count("*").alias("n"))


# --- W2/W4: replace => MERGE-style upsert (mysql/table.go:100-146) ---------
def w2_replace_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _scratch_dir()
    spec = WriterSpec.from_json(
        {
            "connection": {"url": out, "table": {"name": "w2"}},
            "writeMode": "insert",
        }
    )
    src = load_table(spark, sf_dir, "orders")
    ParquetWriter(spark, spec).write(src)
    upsert_spec = WriterSpec.from_json(
        {
            "connection": {"url": out, "table": {"name": "w2"}},
            "writeMode": "replace",
            "mergeKeys": ["o_orderkey"],
        }
    )
    batch = src.where("o_orderkey <= 1000").withColumn("o_orderstatus", F.lit("X"))
    writer = ParquetWriter(spark, upsert_spec)
    writer.write(batch)
    merged = spark.read.parquet(writer.target_path())
    return merged.select("o_orderkey", "o_orderstatus")


# --- W4 format axis: csv/json sink + source roundtrip ----------------------
# The reference writes to whatever dialect the job names (format is a
# config axis, database/db.go:380-396); here the same mode surface drives
# csv/json sinks. The roundtrip is aggregated on type-stable columns
# (csv re-infers types on read — the documented fidelity caveat).
def _format_roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from as_etl_storage_spark.writers.writer import FileFormatWriter

    out = _scratch_dir()
    spec = WriterSpec.from_json(
        {"connection": {"url": out, "table": {"name": f"rt_{fmt}"}},
         "writeMode": "insert"}
    )
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    writer = FileFormatWriter(spark, spec, fmt)
    writer.write(src)
    back = writer._read_target(writer.target_path())
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.countDistinct("o_custkey").alias("n_cust"),
    )


def w_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "csv")


def w_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "json")


def w_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "orc")


def w_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _format_roundtrip(spark, sf_dir, "xml")


_FORMAT_RT_ORACLE = (
    "SELECT o_orderstatus, count(*) AS n, "
    "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, "
    "count(DISTINCT o_custkey) AS n_cust "
    "FROM orders GROUP BY o_orderstatus"
)


# --- W8: row-level quarantine (dead-letter upgrade of one-by-one retry) ----
def w8_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = _scratch_dir()
    spec = WriterSpec.from_json(
        {
            "connection": {"url": out, "table": {"name": "w8"}},
            "writeMode": "insert",
            "quarantinePredicate": "o_totalprice BETWEEN 1000 AND 400000",
        }
    )
    src = load_table(spark, sf_dir, "orders")
    writer = ParquetWriter(spark, spec)
    writer.write(src)
    clean = spark.read.parquet(writer.target_path())
    return clean.select("o_orderkey", "o_totalprice")


QUERIES = {
    "s1_scan_project_filter": s1_scan_project_filter,
    "s2_query_sql": s2_query_sql,
    "s3_schema_probe": s3_schema_probe,
    "s5_split_union": s5_split_union,
    "s8_split_ranges": s8_split_ranges,
    "s10_string_split_union": s10_string_split_union,
    "s11_time_split_union": s11_time_split_union,
    "s12_minmax": s12_minmax,
    "s13_declared_ranges": s13_declared_ranges,
    "p4_trim_char": p4_trim_char,
    "p5_type_coercion": p5_type_coercion,
    "p6_oracle_empty_null": p6_oracle_empty_null,
    "p8_write_stringify": p8_write_stringify,
    "p10_dup_rename": p10_dup_rename,
    "w1_insert_append": w1_insert_append,
    "w2_replace_merge": w2_replace_merge,
    "w8_quarantine": w8_quarantine,
    "w_csv_roundtrip": w_csv_roundtrip,
    "w_json_roundtrip": w_json_roundtrip,
    "w_orc_roundtrip": w_orc_roundtrip,
    "w_xml_roundtrip": w_xml_roundtrip,
}

ORACLES = {
    "s1_scan_project_filter": (
        "SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice "
        "FROM lineitem WHERE l_quantity > 40"
    ),
    "s2_query_sql": (
        "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
        "count(DISTINCT l_orderkey) AS n_orders "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus"
    ),
    "s3_schema_probe": "SELECT * FROM orders WHERE 1 = 2",
    "s5_split_union": (
        "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem "
        "WHERE l_quantity > 10"
    ),
    # doSplit arithmetic in SQL: gap//num even step + leading remainder
    "s8_split_ranges": """
        WITH b AS (SELECT min(l_orderkey) AS lo, max(l_orderkey) AS hi FROM lineitem),
        p AS (SELECT lo, hi, hi - lo AS gap,
                     least(8, hi - lo) AS num FROM b),
        i AS (SELECT p.*, unnest(range(0, num)) AS tid FROM p)
        SELECT tid AS task_id,
               lo + tid * (gap // num) + least(tid, gap % num) AS range_lo,
               lo + (tid + 1) * (gap // num) + least(tid + 1, gap % num) AS range_hi
        FROM i ORDER BY tid
    """,
    "s10_string_split_union": "SELECT c_custkey, c_name FROM customer",
    "s11_time_split_union": "SELECT o_orderkey, o_orderdate FROM orders",
    "s12_minmax": (
        "SELECT min(l_orderkey) AS min_key, max(l_orderkey) AS max_key, "
        "min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship FROM lineitem"
    ),
    "s13_declared_ranges": """
        WITH p AS (SELECT 1000 AS lo, 9999 AS hi, 9999 - 1000 AS gap,
                          least(7, 9999 - 1000) AS num),
        i AS (SELECT p.*, unnest(range(0, num)) AS tid FROM p)
        SELECT tid AS task_id,
               lo + tid * (gap // num) + least(tid, gap % num) AS range_lo,
               lo + (tid + 1) * (gap // num) + least(tid + 1, gap % num) AS range_hi
        FROM i ORDER BY tid
    """,
    "p4_trim_char": (
        "SELECT c_custkey, trim('  ' || c_name || '  ') AS trimmed FROM customer"
    ),
    "p5_type_coercion": (
        "SELECT l_orderkey, l_linenumber, CAST(l_linenumber AS BIGINT) AS ln_big, "
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DOUBLE) AS qty_dec, "
        "CAST(l_orderkey AS VARCHAR) AS key_str, "
        "(l_quantity > 25) AS qty_gt25 FROM lineitem"
    ),
    "p6_oracle_empty_null": (
        "SELECT c_custkey, "
        "NULLIF(CASE WHEN c_custkey % 7 = 0 THEN '' ELSE c_mktsegment END, '')"
        " AS segment, "
        "trim(NULLIF('  ' || c_name || '  ', '')) AS c_name, "
        "trim(NULLIF(CASE WHEN c_custkey % 11 = 0 THEN '   ' "
        "ELSE c_mktsegment END, '')) AS c_class "
        "FROM customer"
    ),
    "p8_write_stringify": (
        "SELECT CAST(o_orderkey AS VARCHAR) AS o_orderkey, "
        "o_orderstatus, "
        "CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS o_totalprice, "
        "CASE WHEN o_orderkey % 2 = 0 THEN '1' ELSE '0' END AS is_even, "
        "CAST(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_custkey END "
        "AS VARCHAR) AS custkey_opt "
        "FROM orders"
    ),
    "p10_dup_rename": (
        "SELECT l_orderkey, l_quantity AS l_orderkey1, l_linenumber FROM lineitem"
    ),
    "w1_insert_append": (
        "SELECT o_orderstatus, count(*) * 2 AS n FROM orders GROUP BY o_orderstatus"
    ),
    "w2_replace_merge": (
        "SELECT o_orderkey, CASE WHEN o_orderkey <= 1000 THEN 'X' "
        "ELSE o_orderstatus END AS o_orderstatus FROM orders"
    ),
    "w8_quarantine": (
        "SELECT o_orderkey, o_totalprice FROM orders "
        "WHERE o_totalprice BETWEEN 1000 AND 400000"
    ),
    "w_csv_roundtrip": _FORMAT_RT_ORACLE,
    "w_json_roundtrip": _FORMAT_RT_ORACLE,
    "w_orc_roundtrip": _FORMAT_RT_ORACLE,
    "w_xml_roundtrip": _FORMAT_RT_ORACLE,
}


# --- small-file compaction (the 100 TB table-maintenance operator) ---------
def w_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shatter orders into 64 small files, compact to target size, verify
    contents unchanged (aggregate roundtrip) and the file count actually
    dropped (in-plan boolean). Compaction is the maintenance op that keeps
    scan task counts sane after many small appends."""
    from as_etl_storage_spark.writers.layout import compact

    out = _scratch_dir()
    path = os.path.join(out, "compact_t.parquet")
    src = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus"
    )
    src.repartition(64).write.mode("overwrite").parquet(path)
    before, after = compact(spark, path, target_rows_per_file=1_000_000)
    back = spark.read.parquet(path)
    n_rows = back.count()
    expected_after = max(1, -(-n_rows // 1_000_000))  # ceil division
    ok = after == expected_after and before >= after
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum("o_orderkey").cast("long").alias("sum_key"),
        F.countDistinct("o_custkey").alias("n_cust"),
    ).withColumn("compacted_ok", F.lit(bool(ok)))


# --- C5/C6/W5 execution proof: live JDBC boundary via embedded Derby -------
# The reference's whole purpose is moving rows through real database
# connections (database/db.go:203-236, dbms/writer/batch_writer.go:159-261).
# No MySQL/Oracle server exists in this environment, but Derby (embedded,
# on Spark's classpath) lets the SAME JdbcWriter/JdbcSource code run a real
# save()/load(): these queries are the execution proof for the option maps
# the mysql/oracle dialects share.
def _jdbc_url(tag: str) -> str:
    # one in-memory database per invocation: Derby memory DBs live until
    # the JVM exits, so a unique name keeps reruns independent; the handful
    # of rows involved is negligible against the driver heap.
    return f"jdbc:derby:memory:{tag}_{uuid.uuid4().hex[:12]};create=true"


def w_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real JDBC write (append) + read back (C5-shaped source/sink on the
    executable dialect), hash-compared against the source table."""
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = _jdbc_url("rt")
    spec = WriterSpec.from_json(
        {
            "connection": {"url": url, "table": {"name": "orders_rt"}},
            "writeMode": "insert",
            "column": ["o_orderkey", "o_custkey", "o_orderstatus",
                       "o_totalprice"],
        }
    )
    src = load_table(spark, sf_dir, "orders")
    JdbcWriter(spark, spec, dialect="derby").write(src)
    back = JdbcSource(spark, spec.connection, dialect="derby").read()
    return back.select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def w_jdbc_replace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 on the live connector: base append, then a replace batch merged
    through the staging path (append to ``__stage`` + set-based
    delete-then-insert executed inside the database) — the semantics MySQL's
    REPLACE INTO has (mysql/table.go:100-146), actually executed."""
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = _jdbc_url("rp")
    base = WriterSpec.from_json(
        {
            "connection": {"url": url, "table": {"name": "orders_rp"}},
            "writeMode": "insert",
            "column": ["o_orderkey", "o_orderstatus"],
        }
    )
    src = load_table(spark, sf_dir, "orders")
    JdbcWriter(spark, base, dialect="derby").write(src)
    upsert = WriterSpec.from_json(
        {
            "connection": {"url": url, "table": {"name": "orders_rp"}},
            "writeMode": "replace",
            "mergeKeys": ["o_orderkey"],
        }
    )
    batch = (
        src.where("o_orderkey <= 1000")
        .select("o_orderkey", "o_orderstatus")
        .withColumn("o_orderstatus", F.lit("X"))
    )
    JdbcWriter(spark, upsert, dialect="derby").write(batch)
    back = JdbcSource(spark, base.connection, dialect="derby").read()
    return back.select("o_orderkey", "o_orderstatus")


def s_jdbc_split_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 EXECUTED on the live connector: the radix-128 string-split
    predicates (plans/split.py, the capability Spark's partitionColumn
    lacks) drive a real parallel JDBC read — one WHERE clause per
    partition, one Derby connection each — and the union of the partition
    scans must reproduce the table exactly (no overlap, no gap across the
    boundaries)."""
    from as_etl_storage_spark.plans.split import StringConvertor
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = _jdbc_url("sp")
    spec = WriterSpec.from_json(
        {
            "connection": {"url": url, "table": {"name": "orders_sp"}},
            "writeMode": "insert",
            "column": ["o_orderkey", "o_orderpriority"],
        }
    )
    src = load_table(spark, sf_dir, "orders")
    JdbcWriter(spark, spec, dialect="derby").write(src)
    source = JdbcSource(spark, spec.connection, dialect="derby")
    row = src.agg(
        F.min("o_orderpriority").alias("lo"), F.max("o_orderpriority").alias("hi")
    ).collect()[0]
    # no pre-fit: split_ranges refits the convertor from these same
    # bounds unconditionally — a caller-side fit would be dead code
    preds = source.string_split_predicates(
        '"o_orderpriority"', row["lo"], row["hi"], 4, StringConvertor()
    )
    back = source.read_predicates(preds)
    return back.select("o_orderkey", "o_orderpriority")


def job_jdbc_to_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core job shape — database source -> storage sink —
    executed LIVE through the whole stack: JSON JobSpec -> dialect
    registry (C1) -> JdbcSource.read with ping (C4) + projection/filter ->
    ParquetWriter. Stage a lineitem slice into Derby, run the job spec,
    read the parquet target back."""
    from as_etl_storage_spark.runner import run_job

    url = _jdbc_url("job")
    stage_spec = WriterSpec.from_json(
        {
            "connection": {"url": url, "table": {"name": "li_src"}},
            "writeMode": "insert",
            "column": ["l_orderkey", "l_linenumber", "l_quantity",
                       "l_extendedprice"],
        }
    )
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    JdbcWriter(spark, stage_spec, dialect="derby").write(
        load_table(spark, sf_dir, "lineitem")
    )
    out = _scratch_dir()
    result = run_job(
        spark,
        {
            "reader": {
                "dialect": "jdbc-derby",
                "connection": {"url": url, "table": {"name": "li_src"}},
                "column": ["l_orderkey", "l_quantity", "l_extendedprice"],
                "where": "l_quantity > 30",
            },
            "writer": {
                "connection": {"url": out, "table": {"name": "li_out"}},
                "writeMode": "insert",
            },
        },
    )
    return spark.read.parquet(result.target_path)


def job_parquet_to_jdbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The OTHER half of the reference's core shape — storage -> database —
    through the same JSON JobSpec stack: parquet reader (projection +
    filter) -> JdbcWriter on the live dialect, then the table is read back
    over JDBC for the hash compare."""
    from as_etl_storage_spark.runner import run_job
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import ConnectionSpec

    url = _jdbc_url("p2j")
    run_job(
        spark,
        {
            "reader": {
                "connection": {"url": sf_dir, "table": {"name": "customer"}},
                "column": ["c_custkey", "c_name", "c_acctbal"],
                "where": "c_acctbal > 0",
            },
            "writer": {
                "dialect": "derby",
                "connection": {"url": url, "table": {"name": "cust_out"}},
                "writeMode": "insert",
            },
        },
    )
    back = JdbcSource(
        spark,
        ConnectionSpec.from_json({"url": url, "table": {"name": "cust_out"}}),
        dialect="derby",
    ).read()
    return back.select("c_custkey", "c_name", "c_acctbal")


QUERIES["job_parquet_to_jdbc"] = job_parquet_to_jdbc
ORACLES["job_parquet_to_jdbc"] = (
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_acctbal > 0"
)

QUERIES["job_jdbc_to_parquet"] = job_jdbc_to_parquet
ORACLES["job_jdbc_to_parquet"] = (
    "SELECT l_orderkey, l_quantity, l_extendedprice "
    "FROM lineitem WHERE l_quantity > 30"
)

QUERIES["s_jdbc_split_read"] = s_jdbc_split_read
ORACLES["s_jdbc_split_read"] = (
    "SELECT o_orderkey, o_orderpriority FROM orders"
)

QUERIES["w_jdbc_roundtrip"] = w_jdbc_roundtrip
ORACLES["w_jdbc_roundtrip"] = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders"
)
QUERIES["w_jdbc_replace"] = w_jdbc_replace
ORACLES["w_jdbc_replace"] = (
    "SELECT o_orderkey, CASE WHEN o_orderkey <= 1000 THEN 'X' "
    "ELSE o_orderstatus END AS o_orderstatus FROM orders"
)

QUERIES["w_compact_roundtrip"] = w_compact_roundtrip
ORACLES["w_compact_roundtrip"] = (
    "SELECT o_orderstatus, count(*) AS n, "
    "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, "
    "count(DISTINCT o_custkey) AS n_cust, TRUE AS compacted_ok "
    "FROM orders GROUP BY o_orderstatus"
)


def s_pyds_rangesplit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-split parallel read through the Spark 4 Python DataSource API
    (sources/pyds.RangeSplitDataSource): partitions() emits one split per
    do_split range (reader/job.go:122-187 parity), bounds come from
    parquet footer stats (S12 at zero scan cost), each task reads its
    range via a pyarrow predicate. The aggregate proves no range gap,
    overlap, or loss."""
    from pyspark.sql import functions as F

    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import RangeSplitDataSource

    # runtime-settable; required because the reader implements pushFilters
    # (initialization refuses otherwise) and the driver's own session may
    # not carry the builder config from session.py
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(RangeSplitDataSource)
    df = (
        spark.read.format("rangesplit")
        .option("path", os.path.join(sf_dir, "orders.parquet"))
        .option("key", "o_orderkey")
        .option("num", "8")
        .option("columns", "o_orderkey,o_custkey,o_totalprice,o_orderstatus")
        .load()
    )
    return df.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


QUERIES["s_pyds_rangesplit"] = s_pyds_rangesplit
ORACLES["s_pyds_rangesplit"] = (
    "SELECT o_orderstatus, count(*) AS n, "
    "CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total, "
    "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key "
    "FROM orders GROUP BY o_orderstatus"
)


def w_pyds_batch_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 multi-row INSERT through the official Python batch-write API
    (sources/pyds.JsonAuditBatchWriter): partition tasks write data
    files, commit() publishes them in one atomic manifest line; a failed
    job leaves no manifest entry, so readers keep the prior committed
    state — the writer atomicity the reference gets from database
    transactions (database/table.go:156-214, db.go:203-236)."""
    import as_etl_storage_spark.sources.pyds as pyds_mod
    from as_etl_storage_spark.sources.pyds import (
        JsonAuditDataSource,
        read_json_audit,
    )

    pyds_mod.ensure_worker_importable()
    spark.dataSource.register(JsonAuditDataSource)
    out = os.path.join(_scratch_dir(), "pyds_batch_audit")
    os.makedirs(out, exist_ok=True)
    src = load_table(spark, sf_dir, "orders").where("o_orderkey <= 3000").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    src.write.format("jsonaudit").mode("overwrite").option("outdir", out).save()
    return read_json_audit(spark, out).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


QUERIES["w_pyds_batch_sink"] = w_pyds_batch_sink
ORACLES["w_pyds_batch_sink"] = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice "
    "FROM orders WHERE o_orderkey <= 3000"
)
