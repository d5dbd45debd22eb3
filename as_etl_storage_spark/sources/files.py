"""Generic file-format sources (csv / json / orc / xml) behind the same
table interface as the parquet source — the format registry (C1) makes the
job spec's ``dialect`` field pick the implementation.

CSV/JSON read with schema inference by default (the reference's lazy
schema completion, db.go:150-157); pass an explicit ``schema`` for
production pipelines — inference is a full extra pass at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from as_etl_storage_spark.sources.parquet import ParquetSource
from as_etl_storage_spark.spec import ConnectionSpec
from as_etl_storage_spark.types import dedupe_column_names


class FileSource(ParquetSource):
    """Path-based table source for csv/json/orc: table ``name`` maps to
    ``<url>/<name>.<ext>``."""

    def __init__(
        self,
        spark: SparkSession,
        connection: ConnectionSpec,
        fmt: str,
        schema: T.StructType | None = None,
        options: dict | None = None,
    ):
        super().__init__(spark, connection)
        self.fmt = fmt
        self.schema_override = schema
        self.options = dict(options or {})

    def table_path(self, name: str | None = None) -> str:
        name = name or self.connection.table.name
        base = self.connection.url
        for cand in (f"{name}.{self.fmt}", name):
            p = os.path.join(base, cand)
            if os.path.exists(p):
                return p
        return os.path.join(base, f"{name}.{self.fmt}")

    def read(self, name: str | None = None, snapshot: bool = False) -> DataFrame:
        reader = self.spark.read.format(self.fmt)
        if self.fmt == "csv":
            reader = reader.option("header", "true")
            if self.schema_override is None:
                reader = reader.option("inferSchema", "true")
        # read from a COPY of the configured options: popping from
        # self.options would make the second read() on the same source
        # silently lose the setting (e.g. xml rowTag falling back to
        # "row" and parsing zero rows)
        opts = dict(self.options)
        if self.fmt == "xml":
            reader = reader.option("rowTag", opts.pop("rowTag", "row"))
        if self.schema_override is not None:
            reader = reader.schema(self.schema_override)
        if opts:
            reader = reader.options(**opts)
        df = reader.load(self.table_path(name))
        deduped = dedupe_column_names(df.columns)
        if deduped != df.columns:
            df = df.toDF(*deduped)
        return df

    def list_tables(self) -> list[str]:
        base = self.connection.url
        if not os.path.isdir(base):
            return []
        suffix = f".{self.fmt}"
        return sorted(
            e[: -len(suffix)] for e in os.listdir(base) if e.endswith(suffix)
        )


class TextLinesSource(FileSource):
    """Line-oriented raw-text ingestion (``spark.read.text``): one row per
    line in a single ``value`` string column — the ingestion edge for raw
    text corpora before they are normalized into a documents table. Pass
    ``options={"wholetext": "true"}`` for one row per FILE instead (small
    corpora only: a row must fit in memory). Table ``name`` maps to
    ``<url>/<name>.txt`` (or a bare directory of text files)."""

    def __init__(self, spark, connection, schema=None, options=None):
        super().__init__(spark, connection, "text", schema, options)

    def table_path(self, name: str | None = None) -> str:
        name = name or self.connection.table.name
        base = self.connection.url
        for cand in (f"{name}.txt", name):
            p = os.path.join(base, cand)
            if os.path.exists(p):
                return p
        return os.path.join(base, f"{name}.txt")

    def list_tables(self) -> list[str]:
        base = self.connection.url
        if not os.path.isdir(base):
            return []
        return sorted(
            e[:-4] for e in os.listdir(base) if e.endswith(".txt")
        )


class BinaryDirSource(FileSource):
    """``binaryFile`` source over a directory tree — the ingestion edge for
    multimodal corpora (images/audio/video as opaque payloads). Each file
    becomes one row: (path, modificationTime, length, content binary).

    Table ``name`` maps to the directory ``<url>/<name>``; pass
    ``options={"pathGlobFilter": "*.png"}`` to select by extension and
    ``recursiveFileLookup`` for nested layouts. Scale notes: files never
    split (a row is a whole file), so parallelism = file count; tiny-file
    corpora should be compacted into parquet with a binary column first
    (see operators/multimodal.attach_binary) — listing 10^8 loose objects
    costs more than reading them."""

    def __init__(self, spark, connection, schema=None, options=None):
        super().__init__(spark, connection, "binaryFile", schema, options)

    def table_path(self, name: str | None = None) -> str:
        name = name or self.connection.table.name
        return os.path.join(self.connection.url, name)

    def read(self, name: str | None = None, snapshot: bool = False) -> DataFrame:
        reader = self.spark.read.format("binaryFile")
        if self.options:
            reader = reader.options(**self.options)
        return reader.load(self.table_path(name))

    def list_tables(self) -> list[str]:
        base = self.connection.url
        if not os.path.isdir(base):
            return []
        return sorted(
            e for e in os.listdir(base) if os.path.isdir(os.path.join(base, e))
        )
