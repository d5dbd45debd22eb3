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
