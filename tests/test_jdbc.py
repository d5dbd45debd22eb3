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
