"""JDBC source/sink dialects (MySQL/Oracle parity, M5 optional connector).

The reference's MySQL/Oracle modules (database/mysql/*, database/oracle/*)
contribute: DSN handling, identifier quoting, type-coercion rules, and the
string-key range split that Spark's JDBC reader cannot do natively
(partitionColumn must be numeric/date/timestamp — the radix-128 predicate
list from plans/split.py fills that gap, SURVEY.md §4 item 1).

No live database exists in the test environment, so this module is exercised
only at the option-building level; reads are gated behind the caller
providing a reachable JDBC url.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from as_etl_storage_spark.plans.split import RangeConvertor, range_predicates
from as_etl_storage_spark.spec import ConnectionSpec


@dataclass(frozen=True)
class JdbcDialectRules:
    """Per-dialect SQL-rendering + normalization rules.

    quoting/bind parity: mysql `` `x` `` (database/mysql/source.go:93-95),
    oracle ``"x"`` (database/oracle/source.go:72-74).
    ``empty_string_is_null``: Oracle semantics (oracle/field.go:194-196).
    ``trim_char_types``: CHAR/NCHAR trim rule (P4; database/config.go:97-111).
    """

    name: str
    quote: str
    empty_string_is_null: bool = False
    trim_char_types: tuple[str, ...] = ()
    fetch_size: int = 10_000
    batch_size: int = 1000  # writer default parity (writer/config.go:21)
    extra_read_options: dict = field(default_factory=dict)

    def quoted(self, identifier: str) -> str:
        return f"{self.quote}{identifier}{self.quote}"


MYSQL = JdbcDialectRules(
    name="mysql",
    quote="`",
    trim_char_types=("CHAR", "NCHAR"),
    # ParseTime=true parity (mysql/config.go:42-50): JDBC driver handles
    # temporal conversion; no option needed.
)

ORACLE = JdbcDialectRules(
    name="oracle",
    quote='"',
    empty_string_is_null=True,
    trim_char_types=("CHAR", "NCHAR"),
)

DIALECTS = {"mysql": MYSQL, "oracle": ORACLE}


class JdbcSource:
    """JDBC read path with reference-parity parallel splits.

    Numeric/time split keys use Spark's native partitionColumn options;
    string keys use an explicit ``predicates`` list built by the radix-128
    convertor — the capability Spark lacks and the reference has (S10).
    """

    def __init__(
        self,
        spark: SparkSession,
        connection: ConnectionSpec,
        dialect: str = "mysql",
        user: str = "",
        password: str = "",
    ):
        self.spark = spark
        self.connection = connection
        self.rules = DIALECTS[dialect]
        self.user = user
        self.password = password

    def _base_options(self) -> dict:
        opts = {
            "url": self.connection.url,
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.rules.fetch_size),
        }
        opts.update(self.rules.extra_read_options)
        return opts

    def read_options(
        self,
        *,
        query_sql: str = "",
        split_key: str = "",
        lower=None,
        upper=None,
        num_partitions: int = 1,
        convertor: RangeConvertor | None = None,
    ) -> dict:
        """Build the spark.read.jdbc option map (pure; unit-testable)."""
        opts = self._base_options()
        table = self.connection.table
        if query_sql:
            opts["query"] = query_sql  # S2 raw SQL passthrough
        else:
            qualified = ".".join(
                self.rules.quoted(p) for p in (table.schema, table.name) if p
            )
            opts["dbtable"] = qualified
        if split_key and num_partitions > 1 and convertor is None:
            # native numeric/time split; parallel connections are bounded by
            # the pool limit (C2 parity: pool.maxOpenConns default 4,
            # database/source.go:11-14 — each JDBC partition holds one conn)
            capped = min(num_partitions, self.connection.pool.max_open_conns)
            opts.update(
                partitionColumn=split_key,
                lowerBound=str(lower),
                upperBound=str(upper),
                numPartitions=str(capped),
            )
        return opts

    def string_split_predicates(
        self, key: str, lower: str, upper: str, num: int, convertor: RangeConvertor
    ) -> list[str]:
        """Radix-128 predicate list for string split keys (S10) — feed to
        ``spark.read.jdbc(url, table, predicates=[...])``."""
        return range_predicates(key, lower, upper, num, convertor)

    def read(self, **split_kwargs) -> DataFrame:
        opts = self.read_options(**split_kwargs)
        reader = self.spark.read.format("jdbc")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return reader.load()
