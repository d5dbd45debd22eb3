"""Extended TPC-H-style battery, adapted to the fixture schema (no
partsupp/shipmode/phone columns — queries keep each original's *shape*:
EXISTS checks, multi-way joins with aggregates, distribution analyses,
HAVING subqueries, bracket disjunctions, anti-join summaries).

Single SQL text per query, run by Spark and DuckDB identically; decimal
policy per queries/__init__ docstring.
"""

from __future__ import annotations

from as_etl_storage_spark.queries.common import sql_query

QUERIES: dict = {}
ORACLES: dict = {}

_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"

_DEFS: dict[str, tuple[tuple[str, ...], str]] = {}


def _q(name: str, tables: tuple[str, ...], sql: str) -> None:
    _DEFS[name] = (tables, sql)


# Q4 shape: EXISTS-correlated order counting
_q(
    "q4_order_priority",
    ("orders", "lineitem"),
    """
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)

# Q9 shape: product-line profit by nation and year
_q(
    "q9_product_profit",
    ("part", "supplier", "lineitem", "orders", "nation"),
    f"""
    SELECT n_name AS nation, year(o_orderdate) AS o_year,
           CAST(sum({_REV}) AS DOUBLE) AS profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders ON o_orderkey = l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%bolt%'
    GROUP BY n_name, year(o_orderdate)
    """,
)

# Q10 shape: returned-item revenue per customer, top 20
_q(
    "q10_returned_items",
    ("customer", "orders", "lineitem", "nation"),
    f"""
    SELECT c_custkey, c_name, n_name,
           CAST(sum({_REV}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)

# Q13 shape: distribution of orders per customer (incl. zero)
_q(
    "q13_order_distribution",
    ("customer", "orders"),
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
)

# Q14 shape: promo-type revenue share
_q(
    "q14_promo_revenue",
    ("lineitem", "part"),
    f"""
    SELECT CAST(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV}
                                  ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum({_REV}) AS DOUBLE) AS promo_share,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'
    """,
)

# Q18 shape: large-quantity orders via HAVING subquery
_q(
    "q18_large_orders",
    ("customer", "orders", "lineitem"),
    """
    SELECT c_custkey, o_orderkey, o_orderdate,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
    )
    GROUP BY c_custkey, o_orderkey, o_orderdate
    """,
)

# Q19 shape: bracket disjunctions (OR-of-ANDs pushdown test)
_q(
    "q19_brackets",
    ("lineitem", "part"),
    f"""
    SELECT CAST(sum({_REV}) AS DOUBLE) AS revenue, count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity BETWEEN 20 AND 50)
    """,
)

# Q22 shape: wealthy-but-inactive customers (anti join + scalar subquery)
_q(
    "q22_inactive_wealthy",
    ("customer", "orders"),
    """
    SELECT c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND (SELECT count(*) FROM orders o
           WHERE o.o_custkey = c.c_custkey) <= 5
    GROUP BY c_nationkey
    """,
)

for name, (tables, sql) in _DEFS.items():
    QUERIES[name] = sql_query(tables, sql)
    ORACLES[name] = sql

# deterministic hash sampling — the production-stable way to sample (same
# rows under any partitioning / rerun, unlike seed-based df.sample). Spark
# hashes via md5-prefix int so the DuckDB oracle reproduces it exactly.
_SAMPLE_SPARK = """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE pmod(CAST(conv(substring(md5(concat(CAST(l_orderkey AS STRING), '-',
                    CAST(l_linenumber AS STRING))), 1, 15), 16, 10) AS BIGINT), 100) < 5
"""
_SAMPLE_DUCK = """
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE ('0x' || substr(md5(l_orderkey::VARCHAR || '-' ||
                    l_linenumber::VARCHAR), 1, 15))::BIGINT % 100 < 5
"""
QUERIES["q_hash_sample"] = sql_query(("lineitem",), _SAMPLE_SPARK)
ORACLES["q_hash_sample"] = _SAMPLE_DUCK
