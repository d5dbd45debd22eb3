"""Embeddable library surface — the reference's ad-hoc/API path
(SURVEY.md §3.3: ``Open(name, conf)`` -> dialect lookup -> pooled handle ->
``FetchTable`` / ``FetchRecord`` / ``BatchExec``, database/db_wrapper.go:36-58,
database/db.go:109-236) re-expressed as a thin fluent facade over the same
sources/writers the job runner uses.

    eng = Engine(spark)
    src = eng.source("parquet", "/data/warehouse")
    df = src.table("lineitem", columns=["l_orderkey"], where="l_quantity > 40")
    eng.write(df, url="/data/out", table="big_orders", mode="insert")
    eng.sql("SELECT count(*) FROM t")      # querySql surface (S2)

Everything stays lazy until an action; ``write`` is the only eager call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from as_etl_storage_spark.sources import get_dialect
from as_etl_storage_spark.spec import ConnectionSpec, TableRef, WriterSpec
from as_etl_storage_spark.writers.writer import WriteResult


class SourceHandle:
    """A dialect bound to a connection url — parity with the pooled DB
    handle (C2/C3): ``table`` is FetchRecord, ``schema`` is the zero-row
    probe (S3), ``tables`` the catalog listing."""

    def __init__(self, spark: SparkSession, dialect: str, url: str, **options):
        self.spark = spark
        self.dialect = dialect
        self.url = url
        self._options = options

    def _source(self, name: str):
        conn = ConnectionSpec(url=self.url, table=TableRef(name=name))
        factory = get_dialect(self.dialect)
        return factory(self.spark, conn, **self._options) if self._options else factory(self.spark, conn)

    def table(
        self,
        name: str,
        columns: list[str] | None = None,
        where: str = "",
    ) -> DataFrame:
        df = self._source(name).read()
        if columns and columns != ["*"]:
            df = df.select(*columns)
        if where:
            df = df.where(where)
        return df

    def schema(self, name: str) -> T.StructType:
        return self._source(name).schema()

    def tables(self) -> list[str]:
        return self._source("").list_tables()

    def ping(self, name: str) -> None:
        self._source(name).ping()


class Engine:
    """Session-scoped facade. One instance per SparkSession (the session is
    the pool — C3's ref-counted sharing collapses to Spark's singleton)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def source(self, dialect: str = "parquet", url: str = "", **options) -> SourceHandle:
        return SourceHandle(self.spark, dialect, url, **options)

    def sql(self, statement: str) -> DataFrame:
        """querySql passthrough (S2): full Catalyst relational algebra over
        whatever views/tables are registered on the session."""
        return self.spark.sql(statement)

    def register(self, name: str, df: DataFrame) -> None:
        """Expose a DataFrame to the ``sql`` surface as a temp view."""
        df.createOrReplaceTempView(name)

    def write(
        self,
        df: DataFrame,
        url: str,
        table: str,
        mode: str = "insert",
        dialect: str = "parquet",
        merge_keys: list[str] | None = None,
        **spec_overrides,
    ) -> WriteResult:
        spec = WriterSpec(
            dialect=dialect,
            connection=ConnectionSpec(url=url, table=TableRef(name=table)),
            write_mode=mode,
            merge_keys=tuple(merge_keys or ()),
            **spec_overrides,
        )
        # same invariants as the JSON job path: unknown mode / bad
        # batchSize / SELECT in hooks fail HERE, not after preSQL has
        # already executed deep inside the writer
        spec.validate()
        from as_etl_storage_spark.writers.writer import make_writer

        return make_writer(self.spark, spec).write(df)
