from as_etl_storage_spark.sources.registry import register_dialect, get_dialect, dialects
from as_etl_storage_spark.sources.parquet import ParquetSource
from as_etl_storage_spark.sources.files import BinaryDirSource, FileSource, TextLinesSource
from as_etl_storage_spark.sources.jdbc import JdbcSource

# built-in dialect registrations (C1 parity: dialect.go:9-61)
register_dialect("parquet", ParquetSource, replace=True)
for _fmt in ("csv", "json", "orc", "xml"):
    register_dialect(
        _fmt,
        (lambda f: lambda spark, conn, **kw: FileSource(spark, conn, f, **kw))(_fmt),
        replace=True,
    )
register_dialect("binary", BinaryDirSource, replace=True)
from as_etl_storage_spark.sources.versioned_source import VersionedSource  # noqa: E402

register_dialect("versioned", VersionedSource, replace=True)
register_dialect("text", TextLinesSource, replace=True)
register_dialect("jdbc-mysql", lambda spark, conn, **kw: JdbcSource(spark, conn, "mysql", **kw), replace=True)
register_dialect("jdbc-oracle", lambda spark, conn, **kw: JdbcSource(spark, conn, "oracle", **kw), replace=True)
register_dialect("jdbc-derby", lambda spark, conn, **kw: JdbcSource(spark, conn, "derby", **kw), replace=True)

__all__ = [
    "register_dialect",
    "get_dialect",
    "dialects",
    "ParquetSource",
    "FileSource",
    "BinaryDirSource",
    "JdbcSource",
]
