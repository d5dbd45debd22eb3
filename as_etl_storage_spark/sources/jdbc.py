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
from pyspark.sql import functions as F
from pyspark.sql import types as T

from as_etl_storage_spark.plans.split import RangeConvertor, range_predicates
from as_etl_storage_spark.spec import ConnectionSpec


@dataclass(frozen=True)
class JdbcDialectRules:
    """Per-dialect SQL-rendering + normalization rules.

    quoting/bind parity: mysql `` `x` `` (database/mysql/source.go:93-95),
    oracle ``"x"`` (database/oracle/source.go:72-74).
    ``empty_string_is_null``: Oracle semantics (oracle/field.go:194-196).
    ``trim_char_types``: CHAR/NCHAR trim rule (P4; database/config.go:97-111).
    ``write_all_as_string``: Oracle write-side stringify — the reference
    converts every non-binary value to a string before binding
    (oracle/field.go:257-287); booleans become '1'/'0', nil binds as the
    empty string which Oracle stores as NULL.
    """

    name: str
    quote: str
    empty_string_is_null: bool = False
    trim_char_types: tuple[str, ...] = ()
    write_all_as_string: bool = False
    fetch_size: int = 10_000
    batch_size: int = 1000  # writer default parity (writer/config.go:21)
    extra_read_options: dict = field(default_factory=dict)
    #: JDBC driver class, passed as the ``driver`` option on read AND write
    #: (needed when the driver does not self-register via ServiceLoader on
    #: the executor classloader — Derby embedded, notably).
    driver: str = ""
    #: DDL type used for string columns when the WRITER creates the table
    #: (``createTableColumnTypes``). Derby needs this: Spark's default maps
    #: StringType -> CLOB, and Derby CLOBs reject comparison predicates, so
    #: pushed-down filters on written string columns would fail.
    create_string_type: str = ""
    #: 1-row connectivity probe (C4 parity, database/db.go Ping): each
    #: dialect's no-table SELECT form.
    probe_sql: str = "select 1"
    #: whether the engine's SQL parser treats backslash as an escape in
    #: string literals (MySQL default: yes; standard SQL — Derby, Oracle:
    #: no). Split-predicate rendering must match or backslash-bearing
    #: keys silently select the wrong rows.
    backslash_escapes_in_literal: bool = False

    def quoted(self, identifier: str) -> str:
        return f"{self.quote}{identifier}{self.quote}"

    def normalize(
        self,
        df: DataFrame,
        field_types: dict[str, str] | None = None,
        trim_char: bool = True,
    ) -> DataFrame:
        """Apply the dialect's read-side normalization rules (P4/P6).

        ``field_types`` maps column name -> declared database type name
        (``DatabaseTypeName()`` in the reference, e.g. ``CHAR``,
        ``VARCHAR2``) — JDBC loses it after the scan, so callers pass the
        catalog's declaration. Rules, in reference order
        (oracle/field.go:191-205):

        * ``empty_string_is_null``: an empty string becomes NULL for every
          string column *before* trimming (a string of blanks survives the
          NULL check, then trims to the empty string — matching the
          reference exactly);
        * ``trim_char_types``: CHAR/NCHAR columns lose leading+trailing
          whitespace (config.go:97-111 ``strings.TrimSpace``), gated on
          the job-level ``trimChar`` flag like ``BaseConfig.TrimChar``.
        """
        field_types = field_types or {}
        str_cols = {
            f.name for f in df.schema.fields if isinstance(f.dataType, T.StringType)
        }
        out = df
        for c in df.columns:
            if c not in str_cols:
                continue
            col = F.col(c)
            changed = False
            if self.empty_string_is_null:
                col = F.nullif(col, F.lit(""))
                changed = True
            if trim_char and field_types.get(c, "").upper() in self.trim_char_types:
                col = F.trim(col)
                changed = True
            if changed:
                out = out.withColumn(c, col)
        return out

    def write_frame(self, df: DataFrame) -> DataFrame:
        """Apply the dialect's write-side coercion (P8).

        Oracle parity (oracle/field.go:257-287): every non-binary column is
        converted to its string rendering before binding — booleans to
        '1'/'0', numerics/dates via plain CAST, NULL stays NULL (the
        reference binds the empty string, which Oracle stores as NULL; the
        relational equivalent under ``empty_string_is_null`` is NULL).
        Binary columns (BLOB/RAW) bind as raw bytes, unchanged. Dialects
        without ``write_all_as_string`` return the frame untouched.
        """
        if not self.write_all_as_string:
            return df
        cols = []
        for f_ in df.schema.fields:
            c = F.col(f_.name)
            if isinstance(f_.dataType, (T.BinaryType, T.StringType)):
                cols.append(c.alias(f_.name))
            elif isinstance(f_.dataType, T.BooleanType):
                cols.append(
                    F.when(c.isNull(), F.lit(None).cast("string"))
                    .when(c, F.lit("1"))
                    .otherwise(F.lit("0"))
                    .alias(f_.name)
                )
            else:
                cols.append(c.cast("string").alias(f_.name))
        return df.select(*cols)


MYSQL = JdbcDialectRules(
    name="mysql",
    quote="`",
    trim_char_types=("CHAR", "NCHAR"),
    # ParseTime=true parity (mysql/config.go:42-50): JDBC driver handles
    # temporal conversion; no option needed.
    backslash_escapes_in_literal=True,
)

ORACLE = JdbcDialectRules(
    name="oracle",
    quote='"',
    empty_string_is_null=True,
    trim_char_types=("CHAR", "NCHAR"),
    write_all_as_string=True,
    probe_sql="select 1 from dual",
)

DERBY = JdbcDialectRules(
    name="derby",
    quote='"',
    trim_char_types=("CHAR", "NCHAR"),
    driver="org.apache.derby.jdbc.EmbeddedDriver",
    create_string_type="VARCHAR(8000)",
    probe_sql="values 1",
)
"""In-process execution dialect.

The reference's verifiable boundary stops at the rendered SQL/option maps
because no MySQL/Oracle server exists in the test environment; Derby
(embedded, on Spark's classpath) closes that gap: the SAME JdbcWriter /
JdbcSource code paths run a real ``save()``/``load()`` against
``jdbc:derby:memory:*``. Semantics parity: Derby quotes like Oracle (``"``),
trims CHAR like both, and supports the staging-merge replace path via
delete-then-insert (MySQL ``REPLACE INTO`` has exactly those semantics:
delete the existing key row, insert the new one — mysql/table.go:100-146).

Scale note: an in-memory Derby lives in the driver JVM, so this dialect is
for parity tests only — local[n] executors share that JVM; a real cluster
would use the mysql/oracle dialects against a network database.
"""

DIALECTS = {"mysql": MYSQL, "oracle": ORACLE, "derby": DERBY}


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
        if self.rules.driver:
            opts["driver"] = self.rules.driver
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
            # database/source.go:11-14 — each JDBC partition holds one conn).
            # cap <= 0 means UNLIMITED, like Go's sql.SetMaxOpenConns(0)
            cap = self.connection.pool.max_open_conns
            capped = min(num_partitions, cap) if cap > 0 else num_partitions
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
        ``spark.read.jdbc(url, table, predicates=[...])``. Literal escaping
        follows the DIALECT's parser (these predicates execute on the
        remote engine, not in Spark): backslashes double under MySQL,
        pass through under standard-SQL engines. The convertor is COPIED
        before the dialect's escaping rule is applied — mutating the
        caller's instance would silently carry this dialect's escaping
        into a later source's predicates when a convertor is reused."""
        if hasattr(convertor, "backslash_escapes"):
            import copy

            convertor = copy.copy(convertor)
            convertor.backslash_escapes = self.rules.backslash_escapes_in_literal
        return range_predicates(key, lower, upper, num, convertor)

    def read(
        self,
        field_types: dict[str, str] | None = None,
        trim_char: bool = True,
        **split_kwargs,
    ) -> DataFrame:
        """Load and apply the dialect's read-side normalization (P4/P6):
        CHAR trim + Oracle empty-string≡NULL, per ``field_types`` (the
        declared DB type name per column, from the target catalog)."""
        opts = self.read_options(**split_kwargs)
        reader = self.spark.read.format("jdbc")
        for k, v in opts.items():
            reader = reader.option(k, v)
        return self.rules.normalize(reader.load(), field_types, trim_char)

    def ping(self) -> None:
        """Connectivity probe (C4, database/db.go Ping): resolving the
        1-row probe query's schema opens a real connection and runs the
        dialect's no-table SELECT — failure surfaces as the driver's
        connect error, exactly the reference's ping semantics."""
        (
            self.spark.read.format("jdbc")
            .options(**self._base_options())
            .option("query", self.rules.probe_sql)
            .load()
        )

    def min_max(self, key: str, where: str = "") -> tuple[object, object]:
        """Split-bound discovery (S12) pushed to the database: one
        min/max aggregate executed by the remote engine, returning a
        bounded two-value row — never a table scan through Spark."""
        table = self.connection.table
        qualified = ".".join(
            self.rules.quoted(p) for p in (table.schema, table.name) if p
        )
        sql = f"select min({key}) as lo, max({key}) as hi from {qualified}"
        if where:
            sql += f" where {where}"
        row = (
            self.spark.read.format("jdbc")
            .options(**self._base_options())
            .option("query", sql)
            .load()
            .collect()[0]
        )
        # positional: identifier case of the aliases is dialect-folded
        # (Derby/Oracle uppercase unquoted names)
        return row[0], row[1]

    def read_predicates(
        self,
        predicates: list[str],
        field_types: dict[str, str] | None = None,
        trim_char: bool = True,
    ) -> DataFrame:
        """Load with an explicit per-partition predicate list — the
        execution half of the string-key split (S10): Spark's native
        partitionColumn only accepts numeric/date/timestamp keys, so the
        radix-128 ranges from ``string_split_predicates`` become one WHERE
        clause per partition, one connection each. Concurrency is capped
        here to ``pool.maxOpenConns`` (C2, source.go:12): every predicate
        still runs (they tile the key domain), but a coalesce merges them
        into ≤ cap partitions so each task opens its connections
        sequentially — a 64-way split against a 4-connection pool reads
        4-wide instead of flooding the database."""
        table = self.connection.table
        qualified = ".".join(
            self.rules.quoted(p) for p in (table.schema, table.name) if p
        )
        props = {
            "user": self.user,
            "password": self.password,
            "fetchsize": str(self.rules.fetch_size),
        }
        if self.rules.driver:
            props["driver"] = self.rules.driver
        props.update({k: str(v) for k, v in self.rules.extra_read_options.items()})
        df = self.spark.read.jdbc(
            self.connection.url,
            qualified,
            predicates=list(predicates),
            properties=props,
        )
        # cap <= 0 means UNLIMITED (Go sql.SetMaxOpenConns(0) parity) —
        # coalesce(0) would be an error, not an unbounded read
        cap = self.connection.pool.max_open_conns
        if cap > 0 and len(predicates) > cap:
            df = df.coalesce(cap)
        return self.rules.normalize(df, field_types, trim_char)
