"""Reader planner: ReaderSpec -> lazy DataFrame.

Mirrors the reader pipeline (reference reader/job.go:50-187, SURVEY.md §3.1)
but collapses task-splitting into Catalyst-owned execution:

  * querySql mode (S2/S14): each statement runs via ``spark.sql`` over temp
    views registered from the connection directory — this single mapping
    grants the full relational algebra the reference delegates to the RDBMS.
  * table mode (S1/P1/P2): projected + filtered scan; Catalyst pushes the
    projection and predicate into the parquet scan (verify with
    ``.explain``: PushedFilters / ReadSchema).
  * split (S5/S8-S15): for the native path Spark's file-split planner already
    parallelizes the scan, so declared splits become ``repartitionByRange``
    only when a downstream stage benefits; the reference-exact predicate
    ranges remain available via ``plan_split_predicates`` (used for JDBC and
    correctness tests).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from as_etl_storage_spark.plans.split import (
    SplitError,
    convertor_for,
    range_predicates,
)
from as_etl_storage_spark.sources.parquet import ParquetSource
from as_etl_storage_spark.spec import ReaderSpec
from as_etl_storage_spark.types import (
    TYPE_BIGINT,
    TYPE_STRING,
    TYPE_TIME,
    element_type_for,
)


def register_views(spark: SparkSession, source: ParquetSource) -> list[str]:
    """Register every table in the connection directory as a temp view so
    querySql statements can reference them by bare name."""
    names = source.list_tables()
    for name in names:
        source.read(name).createOrReplaceTempView(name)
    return names


def _resolve_source(spark: SparkSession, reader: ReaderSpec):
    """Dialect registry lookup (C1): the spec's ``dialect`` picks the
    source implementation (parquet default; csv/json/orc; jdbc-*)."""
    from as_etl_storage_spark.sources.registry import get_dialect

    return get_dialect(reader.dialect or "parquet")(spark, reader.connection)


def plan_read(spark: SparkSession, reader: ReaderSpec) -> DataFrame:
    """Compile the reader spec to a lazy DataFrame."""
    source = _resolve_source(spark, reader)
    if reader.query_sql:
        register_views(spark, source)
        frames = [spark.sql(q) for q in reader.query_sql]
        # one task per statement (S14, reader/job.go:123-131) -> unionAll
        return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=False), frames)

    source.ping()
    from as_etl_storage_spark.sources.jdbc import JdbcSource
    from as_etl_storage_spark.sources.versioned_source import VersionedSource

    if isinstance(source, JdbcSource):
        # dialect read normalization (P4/P6): job-level trimChar +
        # declared column type names pick which rules fire
        df = source.read(
            field_types=reader.field_types or None, trim_char=reader.trim_char
        )
    elif isinstance(source, VersionedSource):
        # manifest data skipping from the declarative surface: simple
        # conjuncts of ``where`` prune files at the stats manifest
        # BEFORE Spark lists them (spec.prune_triples_from_where); the
        # full predicate still applies as the semantic filter below, so
        # a complex where stays correct with zero skipping
        df = source.read(where=reader.where)
    else:
        df = source.read()
    if list(reader.columns) != ["*"]:
        df = df.select(*reader.columns)
    if reader.where:
        df = df.where(reader.where)
    return df


def _check_split_key_type(df: DataFrame, key: str, declared: str) -> str:
    """S15 type validation (split.go:63-111): int64 key -> bigint; string
    key -> bigint or string; time key -> time."""
    etype = element_type_for(df.schema[key].dataType)
    allowed = {
        TYPE_BIGINT: ("bigint",),
        TYPE_STRING: ("bigint", "string"),
        TYPE_TIME: ("time",),
    }.get(etype)
    if allowed is None:
        raise SplitError(f"split key {key!r} has unsupported type {etype}")
    if declared and declared not in allowed:
        raise SplitError(
            f"split.range.type {declared!r} incompatible with key type {etype}"
        )
    return declared or allowed[-1 if etype == TYPE_STRING else 0]


def plan_split_predicates(
    spark: SparkSession, reader: ReaderSpec, num: int
) -> list[str]:
    """Reference-exact split: compute N per-task predicates for the declared
    split key (bounds from config range S13 or min/max discovery S12)."""
    split = reader.split
    if not split.key:
        raise SplitError("reader.split.key is required for predicate splitting")
    source = _resolve_source(spark, reader)
    df = source.read()
    range_type = _check_split_key_type(df, split.key, split.range.type)
    accuracy = split.time_accuracy or "day"
    conv = convertor_for(range_type, accuracy)

    if split.range.left and split.range.right:  # S13 pre-declared bounds
        lo, hi = split.range.left, split.range.right
        if range_type == "bigint":
            try:
                lo, hi = int(lo), int(hi)
            except ValueError as exc:
                raise SplitError(
                    f"bigint split bounds must be integers, got "
                    f"left={lo!r} right={hi!r}"
                ) from exc
        elif range_type == "time":
            from as_etl_storage_spark.plans.split import parse_time_bound

            lo = parse_time_bound(lo, split.range.layout)
            hi = parse_time_bound(hi, split.range.layout)
    else:  # S12 min/max discovery, honoring user where
        lo, hi = source.min_max(split.key, reader.where)
    if lo is None or hi is None:
        raise SplitError(f"split key {split.key!r} has no non-null values")

    preds = range_predicates(split.key, lo, hi, num, conv)
    if reader.where:  # conjunction parity (reader/job.go:179-181)
        preds = [f"({p}) AND ({reader.where})" for p in preds]
    return preds


def plan_split_union(spark: SparkSession, reader: ReaderSpec, num: int) -> DataFrame:
    """Materialize the split as a union of per-range scans — used by tests to
    prove the ranges cover the table exactly once (no overlap/gap)."""
    preds = plan_split_predicates(spark, reader, num)
    source = _resolve_source(spark, reader)
    base = source.read()
    if list(reader.columns) != ["*"]:
        base = base.select(*reader.columns)
    frames = [base.where(p) for p in preds]
    return reduce(lambda a, b: a.unionByName(b), frames)
