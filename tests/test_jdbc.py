"""JDBC dialect unit tests (P9 quoting, S10 string-split predicates,
C5/C6 option building). No live database: tests stop at the option map —
the point where Spark's JDBC reader takes over."""

from as_etl_storage_spark.plans.split import StringConvertor
from as_etl_storage_spark.sources.jdbc import DIALECTS, JdbcSource
from as_etl_storage_spark.spec import ConnectionSpec, TableRef


def _source(spark, dialect="mysql"):
    conn = ConnectionSpec(
        url="jdbc:mysql://db:3306/main",
        table=TableRef(schema="main", name="orders"),
    )
    return JdbcSource(spark, conn, dialect, user="u", password="p")


def test_quoting_rules():
    # mysql backticks (mysql/source.go:93-95), oracle double quotes
    # (oracle/source.go:72-74)
    assert DIALECTS["mysql"].quoted("tbl") == "`tbl`"
    assert DIALECTS["oracle"].quoted("tbl") == '"tbl"'


def test_oracle_empty_string_rule():
    # oracle empty-string == NULL (oracle/field.go:194-196)
    assert DIALECTS["oracle"].empty_string_is_null
    assert not DIALECTS["mysql"].empty_string_is_null


def test_dbtable_option_quoted(spark):
    opts = _source(spark).read_options()
    assert opts["dbtable"] == "`main`.`orders`"
    assert opts["fetchsize"] == "10000"


def test_query_sql_passthrough(spark):
    opts = _source(spark).read_options(query_sql="SELECT 1")
    assert opts["query"] == "SELECT 1"
    assert "dbtable" not in opts


def test_numeric_partition_options(spark):
    opts = _source(spark).read_options(
        split_key="o_orderkey", lower=1, upper=100000, num_partitions=3
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "100000"
    assert opts["numPartitions"] == "3"  # under the pool cap of 4


def test_string_split_predicates(spark):
    # the capability Spark's JDBC reader lacks (S10): string-key ranges via
    # the radix-128 codec, rendered as predicates
    src = _source(spark)
    preds = src.string_split_predicates(
        "c_name", "Customer#000000001", "Customer#000001500", 4, StringConvertor()
    )
    assert len(preds) == 4
    assert all("c_name >= '" in p for p in preds)
    assert preds[-1].count("<=") == 1  # closed last range


def test_pool_caps_num_partitions(spark):
    # C2 parity: numPartitions bounded by pool.maxOpenConns (default 4)
    opts = _source(spark).read_options(
        split_key="o_orderkey", lower=1, upper=100000, num_partitions=16
    )
    assert opts["numPartitions"] == "4"


def test_pool_spec_parsing():
    from as_etl_storage_spark.spec import ConnectionSpec

    c = ConnectionSpec.from_json(
        {"url": "jdbc:mysql://db/main", "pool": {"maxOpenConns": 8}}
    )
    assert c.pool.max_open_conns == 8
    assert c.pool.max_idle_conns == 4  # reference default


def test_oracle_normalize_rules(spark):
    # P6: empty string -> NULL first, then CHAR trim (oracle/field.go:191-205)
    from as_etl_storage_spark.sources.jdbc import ORACLE

    df = spark.createDataFrame(
        [("", "  pad  ", "   ", "keep")],
        "a string, b string, c string, d string",
    )
    row = ORACLE.normalize(df, {"b": "CHAR", "c": "CHAR"}).collect()[0]
    assert row["a"] is None          # empty -> NULL (VARCHAR2, no trim rule)
    assert row["b"] == "pad"         # CHAR trims both sides
    assert row["c"] == ""            # blanks survive NULL check, trim to ""
    assert row["d"] == "keep"


def test_mysql_normalize_keeps_empty(spark):
    # MySQL has no empty-string rule; CHAR trim still applies
    from as_etl_storage_spark.sources.jdbc import MYSQL

    df = spark.createDataFrame([("", " x ")], "a string, b string")
    row = MYSQL.normalize(df, {"b": "CHAR"}).collect()[0]
    assert row["a"] == ""
    assert row["b"] == "x"


def test_normalize_trim_char_gate(spark):
    # job-level trimChar=false disables the trim rule (BaseConfig.TrimChar)
    from as_etl_storage_spark.sources.jdbc import ORACLE

    df = spark.createDataFrame([(" x ",)], "b string")
    row = ORACLE.normalize(df, {"b": "CHAR"}, trim_char=False).collect()[0]
    assert row["b"] == " x "


def test_oracle_write_frame_stringifies(spark):
    # P8: every non-binary column binds as a string; bool -> '1'/'0';
    # NULL stays NULL; binary passes through (oracle/field.go:257-287)
    from as_etl_storage_spark.sources.jdbc import MYSQL, ORACLE

    df = spark.createDataFrame(
        [(1, 2.5, True, None, bytearray(b"\x01"))],
        "i long, d double, b boolean, n string, raw binary",
    )
    out = ORACLE.write_frame(df)
    types = dict(out.dtypes)
    assert types == {
        "i": "string", "d": "string", "b": "string",
        "n": "string", "raw": "binary",
    }
    row = out.collect()[0]
    assert row["i"] == "1" and row["d"] == "2.5" and row["b"] == "1"
    assert row["n"] is None and bytes(row["raw"]) == b"\x01"
    # non-Oracle dialects leave the frame untouched
    assert MYSQL.write_frame(df) is df


# --- live split-read execution via embedded Derby ---------------------------
def test_derby_live_numeric_split_read(spark):
    """Spark-native numeric partitionColumn split against a real database:
    4 partition scans (pool-capped), union == table."""
    import uuid

    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:ns_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_num"}},
         "writeMode": "insert"}
    )
    df = spark.range(0, 1000).selectExpr("id AS k", "id % 13 AS grp")
    JdbcWriter(spark, spec, "derby").write(df)
    src = JdbcSource(spark, spec.connection, dialect="derby")
    back = src.read(
        split_key='"k"', lower=0, upper=999, num_partitions=4
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 1000
    assert back.agg({"k": "sum"}).collect()[0][0] == 999 * 1000 // 2


def test_derby_live_string_predicate_split_read(spark):
    """Radix-128 string predicates drive a real parallel JDBC read; the
    partition scans tile the key domain (no overlap, no gap)."""
    import uuid

    from as_etl_storage_spark.plans.split import StringConvertor
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:ss_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_str"}},
         "writeMode": "insert"}
    )
    df = spark.range(0, 500).selectExpr(
        "id AS k", "concat('key_', lpad(cast(id as string), 4, '0')) AS s"
    )
    JdbcWriter(spark, spec, "derby").write(df)
    src = JdbcSource(spark, spec.connection, dialect="derby")
    conv = StringConvertor()
    conv.fit("key_0000", "key_0499")
    preds = src.string_split_predicates(
        '"s"', "key_0000", "key_0499", 5, conv
    )
    back = src.read_predicates(preds)
    # 5 predicates tile the domain, but concurrency is pool-capped (C2):
    # the scan coalesces to maxOpenConns=4 partitions
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 500
    assert back.select("k").distinct().count() == 500  # no overlap


def test_derby_ping_and_min_max(spark):
    """C4 ping resolves a live connection; S12 min/max is pushed to the
    database (one-row result, no Spark-side scan)."""
    import uuid

    import pytest

    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import ConnectionSpec, WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:pg_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_ping"}},
         "writeMode": "insert"}
    )
    JdbcWriter(spark, spec, "derby").write(
        spark.range(5, 42).selectExpr("id AS k")
    )
    src = JdbcSource(spark, spec.connection, dialect="derby")
    src.ping()  # no raise = reachable
    assert src.min_max('"k"') == (5, 41)
    # unreachable database -> ping surfaces the driver's connect error
    bad = JdbcSource(
        spark,
        ConnectionSpec.from_json(
            {"url": "jdbc:derby:memory:definitely_absent_db",
             "table": {"name": "t"}}
        ),
        dialect="derby",
    )
    with pytest.raises(Exception, match="(?i)database.*not found|error"):
        bad.ping()


def test_derby_live_non_ascii_split_key_rejected(spark):
    """Reference parity (split.go:263-287): a string split key containing
    a non-ASCII character is a spec-level ERROR, never a silent mis-split.
    Exercised live: the offending bound comes back from a real Derby
    min/max probe, and the split raises before any partition predicate is
    rendered."""
    import uuid

    import pytest

    from as_etl_storage_spark.plans.split import SplitError, StringConvertor
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:na_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_nonascii"}},
         "writeMode": "insert"}
    )
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "café"), (4, "zulu")],
        "k long, s string",
    )
    JdbcWriter(spark, spec, "derby").write(df)
    src = JdbcSource(spark, spec.connection, dialect="derby")
    # over the full table Derby's max() is 'zulu' (ASCII) …
    lo, hi = src.min_max('"s"')
    assert lo == "alpha" and hi == "zulu"
    # … so probe a WHERE subset (as a reference job with maxValue unset
    # and a where clause would) to make the LIVE Derby probe return the
    # non-ASCII value as the discovered upper bound
    lo2, hi2 = src.min_max('"s"', where="\"s\" < 'zulu'")
    assert lo2 == "alpha" and hi2 == "café"
    conv = StringConvertor()
    conv.fit(lo2, hi2)
    with pytest.raises(SplitError, match="non-ASCII"):
        # encoding the Derby-discovered bound must raise the spec error
        conv.to_int(hi2)
    # and the full predicate path raises too when the domain itself has a
    # non-ASCII bound
    conv2 = StringConvertor()
    conv2.fit(lo2, hi2)
    with pytest.raises(SplitError, match="non-ASCII"):
        src.string_split_predicates('"s"', lo2, hi2, 3, conv2)


def test_derby_live_mixed_case_split_tiles_domain(spark):
    """Mixed-case keys under Derby's default UCS_BASIC collation
    (codepoint order — uppercase sorts before lowercase, same as the
    radix-128 encoding): the rendered predicates must tile the domain
    with no overlap and no gap, so case-adjacent keys land in exactly one
    partition."""
    import uuid

    from as_etl_storage_spark.plans.split import StringConvertor
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:mc_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_case"}},
         "writeMode": "insert"}
    )
    keys = [
        "Apple", "apple", "APPLE", "Banana", "banana", "BANANA",
        "Cherry", "cherry", "CHERRY", "date", "Date", "DATE",
        "Zebra", "zebra", "ZEBRA", "a", "Z", "m", "M",
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(keys)], "k long, s string"
    )
    JdbcWriter(spark, spec, "derby").write(df)
    src = JdbcSource(spark, spec.connection, dialect="derby")
    lo, hi = src.min_max('"s"')
    # codepoint order: 'APPLE' (uppercase) is the min, 'zebra' the max
    assert lo == "APPLE" and hi == "zebra"
    conv = StringConvertor()
    conv.fit(lo, hi)
    preds = src.string_split_predicates('"s"', lo, hi, 4, conv)
    back = src.read_predicates(preds)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == len(keys)  # no gap
    assert back.select("k").distinct().count() == len(keys)  # no overlap


def test_read_predicates_capped_by_pool_limit(spark):
    """C2: a predicate list wider than pool.maxOpenConns must coalesce so
    concurrent connections never exceed the pool cap — every predicate
    still runs (the ranges tile the domain), just ≤ cap at a time."""
    import uuid

    from as_etl_storage_spark.plans.split import StringConvertor
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.spec import WriterSpec
    from as_etl_storage_spark.writers.jdbc import JdbcWriter

    url = f"jdbc:derby:memory:cap_{uuid.uuid4().hex[:10]};create=true"
    spec = WriterSpec.from_json(
        {"connection": {"url": url, "table": {"name": "t_cap"}},
         "writeMode": "insert"}
    )
    keys = [f"k{i:03d}" for i in range(64)]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(keys)], "k long, s string"
    )
    JdbcWriter(spark, spec, "derby").write(df)
    src = JdbcSource(spark, spec.connection, dialect="derby")
    lo, hi = src.min_max('"s"')
    conv = StringConvertor()
    conv.fit(lo, hi)
    preds = src.string_split_predicates('"s"', lo, hi, 16, conv)
    assert len(preds) == 16
    back = src.read_predicates(preds)
    # default pool cap is 4 (source.go:12)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == len(keys)
    assert back.select("k").distinct().count() == len(keys)


def test_pool_cap_zero_means_unlimited(spark):
    # Go's sql.SetMaxOpenConns(0) means UNLIMITED (database/sql semantics);
    # a 0 cap must not collapse numPartitions to 0 or coalesce(0) a
    # predicate read
    from as_etl_storage_spark.spec import PoolSpec

    conn = ConnectionSpec(
        url="jdbc:mysql://db:3306/main",
        table=TableRef(schema="main", name="orders"),
        pool=PoolSpec(max_open_conns=0),
    )
    src = JdbcSource(spark, conn, "mysql", user="u", password="p")
    opts = src.read_options(
        split_key="o_orderkey", lower=1, upper=100000, num_partitions=16
    )
    assert opts["numPartitions"] == "16"


def test_string_split_does_not_mutate_convertor(spark):
    # a StringConvertor reused across sources of different dialects must
    # not silently inherit the previous dialect's literal escaping
    conv = StringConvertor()
    assert conv.backslash_escapes is True
    src = _source(spark, "derby")  # derby renders backslashes raw
    src.string_split_predicates("c_name", "AAA", "ZZZ", 2, conv)
    assert conv.backslash_escapes is True
