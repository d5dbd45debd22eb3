"""Relational/SQL surface — the capability the reference delegates to the
source RDBMS via querySql (SURVEY.md §2.5): joins, aggregations, windows,
sorts, set ops, rollup — all Catalyst-native here.

Every query is written once; the Spark side runs it through the engine's
querySql path (spark.sql over registered views), the oracle is the same ANSI
SQL for DuckDB. Dialect differences (STRING vs VARCHAR, etc.) are kept out
by using the common subset; double aggregation is decimal-cast for
order-independent exactness.
"""

from __future__ import annotations

from as_etl_storage_spark.queries.common import sql_query

# revenue expression, exact decimal both engines
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"
_CHARGE = f"{_REV} * CAST(1 + l_tax AS DECIMAL(18,2))"

_DEFS: dict[str, tuple[tuple[str, ...], str]] = {}


def _q(name: str, tables: tuple[str, ...], sql: str) -> None:
    _DEFS[name] = (tables, sql)


# --- TPC-H Q1: pricing summary (group-by aggregate) ------------------------
_q(
    "q1_pricing_summary",
    ("lineitem",),
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(sum({_REV}) AS DOUBLE) AS sum_disc_price,
           CAST(sum({_CHARGE}) AS DOUBLE) AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

# --- TPC-H Q3-like: 3-way join + top-k with full tie-break -----------------
_q(
    "q3_shipping_priority",
    ("customer", "orders", "lineitem"),
    f"""
    SELECT l_orderkey,
           CAST(sum({_REV}) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)

# --- TPC-H Q5-like: 6-way join --------------------------------------------
_q(
    "q5_local_supplier_volume",
    ("customer", "orders", "lineitem", "supplier", "nation", "region"),
    f"""
    SELECT n_name, CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)

# --- TPC-H Q6-like: selective scan aggregate -------------------------------
_q(
    "q6_forecast_revenue",
    ("lineitem",),
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
               CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)

# --- top-k sort with unique tie-break --------------------------------------
_q(
    "q_topk_orders",
    ("orders",),
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)

# --- window functions: rank within partition -------------------------------
_q(
    "q_window_rank",
    ("lineitem",),
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, rn
    FROM (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_suppkey
                                ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
      FROM lineitem
    ) t
    WHERE rn <= 3
    """,
)

# --- window functions: lag/lead deltas -------------------------------------
_q(
    "q_window_lag",
    ("orders",),
    """
    SELECT o_custkey, o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) -
             lag(CAST(o_totalprice AS DECIMAL(18,2)), 1, CAST(0 AS DECIMAL(18,2)))
               OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS DOUBLE) AS price_delta
    FROM orders
    WHERE o_custkey <= 100
    """,
)

# --- running (cumulative) decimal sum --------------------------------------
_q(
    "q_window_running_sum",
    ("lineitem",),
    """
    SELECT l_orderkey, l_linenumber,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
             OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
    FROM lineitem
    WHERE l_orderkey <= 2000
    """,
)

# --- set operations --------------------------------------------------------
_q(
    "q_set_ops",
    ("customer", "orders"),
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 100000
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal < 0
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey = 3
    """,
)

# --- semi / anti joins (EXISTS / NOT EXISTS) -------------------------------
_q(
    "q_semi_join",
    ("customer", "orders"),
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
)
# the inner predicate keeps the anti join non-vacuous on the synthetic
# fixture: every custkey there has orders, so a bare NOT EXISTS returned
# ZERO rows at every gate scale — the values were never actually compared
_q(
    "q_anti_join",
    ("customer", "orders"),
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 450000)
    """,
)

# --- grouping sets / rollup -------------------------------------------------
_q(
    "q_rollup",
    ("lineitem",),
    """
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           count(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)

# --- pivot via conditional aggregation (engine-portable pivot) -------------
_q(
    "q_pivot_conditional",
    ("lineitem",),
    """
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_linestatus = 'O'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_open,
           CAST(sum(CASE WHEN l_linestatus = 'F'
                    THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_filled
    FROM lineitem
    GROUP BY l_returnflag
    """,
)

# --- correlated scalar subquery (decorrelation) ----------------------------
_q(
    "q_scalar_subquery",
    ("customer", "orders"),
    """
    SELECT c_custkey,
           (SELECT count(*) FROM orders o WHERE o.o_custkey = c.c_custkey) AS n_orders
    FROM customer c
    WHERE c_custkey <= 500
    """,
)

# --- string functions / LIKE -----------------------------------------------
_q(
    "q_string_funcs",
    ("part",),
    """
    SELECT p_partkey,
           upper(p_brand) AS brand_u,
           substring(p_name, 1, 8) AS name_prefix,
           length(p_name) AS name_len,
           replace(p_type, ' ', '_') AS type_u
    FROM part
    WHERE p_name LIKE '%gold%' OR p_type LIKE 'SMALL%'
    """,
)

# --- conditional expressions ------------------------------------------------
_q(
    "q_case_coalesce",
    ("customer",),
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_bucket,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
    FROM customer
    """,
)

# --- JSON extraction (events.props) ----------------------------------------
# Spark: get_json_object; DuckDB: ->> — both return the scalar as string.
_q_spark_json = """
    SELECT event_id, get_json_object(props, '$.k') AS k_val
    FROM events WHERE event_id <= 2000
"""
_q_duck_json = """
    SELECT event_id, props::JSON ->> 'k' AS k_val
    FROM events WHERE event_id <= 2000
"""

# --- date arithmetic --------------------------------------------------------
_q(
    "q_date_arith",
    ("orders",),
    """
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) AS d,
           year(o_orderdate) AS y,
           month(o_orderdate) AS m,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS due
    FROM orders WHERE o_orderkey <= 3000
    """,
)

# --- distinct count + conditional count ------------------------------------
_q(
    "q_distinct_agg",
    ("lineitem",),
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(CASE WHEN l_quantity > 45 THEN 1 END) AS n_big
    FROM lineitem GROUP BY l_returnflag
    """,
)

# --- join with inequality (range join) --------------------------------------
_q(
    "q_range_join",
    ("orders", "lineitem"),
    """
    SELECT o_orderkey, count(*) AS n_late
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
                            AND l_shipdate > o_orderdate + INTERVAL 100 DAY
    GROUP BY o_orderkey
    """,
)


def _make(table_sql: dict[str, tuple[tuple[str, ...], str]]):
    queries = {}
    oracles = {}
    for name, (tables, sql) in table_sql.items():
        queries[name] = sql_query(tables, sql)
        oracles[name] = sql
    return queries, oracles


QUERIES, ORACLES = _make(_DEFS)

# JSON differs by dialect — register manually
QUERIES["q_json_extract"] = sql_query(("events",), _q_spark_json)
ORACLES["q_json_extract"] = _q_duck_json


# --- hierarchical rollup (r17 plan upgrade) ---------------------------------
def _q_rollup_hierarchical(spark, sf_dir):
    """GROUP BY ROLLUP without the Expand: Spark plans ROLLUP by
    tripling every input row (one copy per grouping set) BEFORE the
    partial aggregate — at 100 TB that is 3x the map-side hash-agg work
    for sums a re-aggregation of the finest grain computes exactly.
    Decimal addition is associative, so aggregating ONCE at
    (l_returnflag, l_linestatus) — a handful of rows — and rolling the
    INTERMEDIATE up per level yields bit-identical sums and counts with
    one scan-side pass; the level re-aggregations run over ~6 rows, and
    AQE reuses the single exchange across the union's branches. NULL
    markers for rolled-up levels match ROLLUP's (the flag columns are
    non-null in the data, so grouping-NULL is unambiguous — DuckDB
    oracle: the plain ROLLUP SQL)."""
    from pyspark.sql import functions as F

    from as_etl_storage_spark.queries.common import register_views

    register_views(spark, sf_dir, ("lineitem",))
    li = spark.table("lineitem")
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("__s"),
        F.count("*").alias("n"),
    )
    null_s = F.lit(None).cast("string")
    lvl1 = (
        base.groupBy("l_returnflag")
        .agg(F.sum("__s").alias("__s"), F.sum("n").alias("n"))
        .select("l_returnflag", null_s.alias("l_linestatus"), "__s", "n")
    )
    lvl2 = base.agg(
        F.sum("__s").alias("__s"), F.sum("n").alias("n")
    ).select(
        null_s.alias("l_returnflag"),
        null_s.alias("l_linestatus"),
        "__s",
        "n",
    )
    return (
        base.select("l_returnflag", "l_linestatus", "__s", "n")
        .unionByName(lvl1)
        .unionByName(lvl2)
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("__s").cast("double").alias("sum_qty"),
            "n",
        )
    )


# the oracle stays the plain ROLLUP SQL registered by _make above
QUERIES["q_rollup"] = _q_rollup_hierarchical
