"""JDBC writer unit tests (W3/W5 + write-mode dispatch). No live database:
tests stop at the option map / rendered SQL / prepared frame — the points
where Spark's JDBC writer takes over."""

import pytest

from as_etl_storage_spark.spec import WriterSpec
from as_etl_storage_spark.writers.jdbc import JdbcWriter
from as_etl_storage_spark.writers.writer import WriterError


def _writer(spark, dialect="mysql", **spec_kw):
    spec = WriterSpec.from_json(
        {
            "connection": {
                "url": "jdbc:mysql://db:3306/main",
                "table": {"schema": "main", "name": "orders"},
            },
            **spec_kw,
        }
    )
    return JdbcWriter(spark, spec, dialect, user="u", password="p")


def test_write_options_w5_knobs(spark):
    # batchsize = reference batchSize default 1000 (writer/config.go:21);
    # isolationLevel encodes the {tx, no-tx} exec-mode axis (db.go:203-236)
    opts = _writer(spark).write_options()
    assert opts["dbtable"] == "`main`.`orders`"
    assert opts["batchsize"] == "1000"
    assert opts["isolationLevel"] == "READ_COMMITTED"
    assert opts["truncate"] == "true"


def test_batch_size_flows_from_spec(spark):
    opts = _writer(spark, batchSize=5000).write_options()
    assert opts["batchsize"] == "5000"


def test_non_transactional_maps_to_none(spark):
    w = _writer(spark)
    w.transactional = False
    assert w.write_options()["isolationLevel"] == "NONE"


def test_save_mode_dispatch(spark):
    # db.go:380-396: insert/overwrite/ignore map to Spark save modes
    assert _writer(spark, writeMode="insert").save_mode() == "append"
    assert _writer(spark, writeMode="overwrite").save_mode() == "overwrite"
    assert _writer(spark, writeMode="ignore").save_mode() == "ignore"


def test_replace_mysql_only(spark):
    # mysql registers a replace exec mode (mysql/table.go:62-85); oracle
    # does not (oracle/table.go:62-69) and must fail like the reference's
    # "ExecParam is not exist" error
    w = _writer(spark, writeMode="replace", mergeKeys=["o_orderkey"])
    assert w.save_mode() == "append"  # staging-table path
    wo = _writer(spark, "oracle", writeMode="replace", mergeKeys=["o_orderkey"])
    with pytest.raises(WriterError, match="replace"):
        wo.save_mode()


def test_mysql_replace_sql_rendering(spark):
    # mysql/table.go:99-130: replace into `t`(cols) values(?,...),(?,...)
    w = _writer(spark, writeMode="replace", mergeKeys=["o_orderkey"])
    sql = w.replace_sql(["o_orderkey", "o_status"], n_rows=2)
    assert sql == (
        "replace into `main`.`orders`(`o_orderkey`,`o_status`) "
        "values(?,?),(?,?)"
    )


def test_oracle_insert_sql_positional_binds(spark):
    # oracle/table.go:94-117 + field.go:55: positional :N binds
    w = _writer(spark, "oracle")
    sql = w.insert_sql(["a", "b"], n_rows=2)
    assert sql == 'insert into "main"."orders"("a","b") values(:1,:2),(:3,:4)'


def test_prepare_frame_applies_dialect_and_pool_cap(spark):
    # oracle write coercion stringifies (P8) and the pool cap bounds the
    # number of concurrent connections = partitions (C2)
    df = spark.range(100).repartition(16).selectExpr(
        "id", "CAST(id AS DOUBLE) AS d", "id % 2 = 0 AS b"
    )
    w = _writer(spark, "oracle")
    out = w.prepare_frame(df)
    assert dict(out.dtypes) == {"id": "string", "d": "string", "b": "string"}
    assert out.rdd.getNumPartitions() <= 4  # pool.maxOpenConns default


def test_prepare_frame_mysql_keeps_types(spark):
    df = spark.range(10).selectExpr("id", "CAST(id AS DOUBLE) AS d")
    out = _writer(spark).prepare_frame(df)
    assert dict(out.dtypes) == {"id": "bigint", "d": "double"}


def test_column_projection(spark):
    df = spark.range(10).selectExpr("id", "id * 2 AS x", "id * 3 AS y")
    w = _writer(spark, column=["id", "x"])
    assert _writer(spark, column=["id", "x"]).prepare_frame(df).columns == [
        "id",
        "x",
    ]
    assert w.prepare_frame(df).columns == ["id", "x"]


def test_job_spec_roundtrip_to_jdbc_writer(spark):
    # a reader->JDBC-writer job parses end-to-end; dispatch picks JdbcWriter
    from as_etl_storage_spark.spec import JobSpec

    spec = JobSpec.from_json(
        {
            "reader": {
                "connection": {
                    "url": "/root/testdata/sf0.001",
                    "table": {"name": "orders"},
                },
                "column": ["o_orderkey", "o_orderstatus"],
            },
            "writer": {
                "dialect": "mysql",
                "connection": {
                    "url": "jdbc:mysql://db:3306/main",
                    "table": {"name": "orders_out"},
                },
                "writeMode": "insert",
                "batchSize": 2000,
            },
        }
    )
    assert spec.writer.dialect == "mysql"
    w = JdbcWriter(spark, spec.writer, spec.writer.dialect)
    assert w.write_options()["batchsize"] == "2000"
    assert w.qualified_table() == "`orders_out`"


def test_runner_rejects_unknown_but_accepts_jdbc_dialects():
    # dispatch surface: mysql/oracle route to JdbcWriter (runner.py)
    import inspect

    from as_etl_storage_spark import runner

    src = inspect.getsource(runner.run_job)
    assert "mysql" in src and "oracle" in src
