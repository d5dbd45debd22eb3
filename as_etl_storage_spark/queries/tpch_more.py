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

# Q2 shape: min-cost supplier via correlated scalar-min subquery across a
# region (partsupp doesn't exist in the fixtures; unit price
# l_extendedprice/l_quantity over lineitem stands in for ps_supplycost —
# identical IEEE division in both engines, and min() over doubles is
# order-independent, so exact comparison is safe)
_q(
    "q2_min_cost_supplier",
    ("part", "supplier", "lineitem", "nation", "region"),
    """
    SELECT DISTINCT s_name, n_name, p_partkey, p_name
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE p_size = 20 AND p_type = 'LARGE' AND r_name = 'EUROPE'
      AND l_extendedprice / l_quantity = (
        SELECT min(l2.l_extendedprice / l2.l_quantity)
        FROM lineitem l2
        JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
        JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
        JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
        WHERE l2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')
    """,
)

# Q7 shape: volume shipping between two nations by year
_q(
    "q7_nation_volume",
    ("supplier", "lineitem", "orders", "customer", "nation"),
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(sum(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS l_year, {_REV} AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)

# Q8 shape: a nation's market share within a region's import volume by year
_q(
    "q8_market_share",
    ("part", "supplier", "lineitem", "orders", "customer", "nation", "region"),
    f"""
    SELECT o_year,
           CAST(sum(CASE WHEN nation = 'NATION_3' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(volume) AS DOUBLE) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS o_year, {_REV} AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    ) all_nations
    GROUP BY o_year
    """,
)

# Q11 shape: important values — group totals above a scalar-subquery
# fraction of the grand total (lineitem value per part stands in for
# partsupp stock value)
_q(
    "q11_important_values",
    ("lineitem", "supplier", "nation"),
    """
    SELECT l_partkey, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)))
                           AS DOUBLE) AS value
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_5'
    GROUP BY l_partkey
    HAVING sum(CAST(l_extendedprice AS DECIMAL(18,2))) > (
      SELECT sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 0.001
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5')
    """,
)

# Q12 shape: two-way priority counts per class (shipmode doesn't exist;
# shipping lateness relative to order date forms the classes)
_q(
    "q12_late_shipping",
    ("orders", "lineitem"),
    """
    SELECT late_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
                  THEN 'late' ELSE 'ontime' END AS late_bucket
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    ) t
    GROUP BY late_bucket
    """,
)

# Q15 shape: top supplier via CTE revenue view + scalar max subquery
# (exact decimal equality, not float)
_q(
    "q15_top_supplier",
    ("lineitem", "supplier"),
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, sum({_REV}) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)

# Q16 shape: distinct-supplier counts per part class, excluding a
# NOT-IN supplier blacklist (lineitem stands in for partsupp)
_q(
    "q16_supplier_counts",
    ("lineitem", "part", "supplier"),
    """
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#3' AND p_type NOT LIKE 'PROMO%'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_name LIKE '%7')
    GROUP BY p_brand, p_type, p_size
    """,
)

# Q17 shape: small-quantity-order revenue via correlated avg subquery
# (quantities are integral doubles, so avg is exact-sum/count — identical
# in both engines)
_q(
    "q17_small_quantity",
    ("lineitem", "part"),
    """
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#5' AND p_size < 10
      AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity)
                        FROM lineitem l2
                        WHERE l2.l_partkey = p_partkey)
    """,
)

# Q20 shape: supplier shortlist via nested IN + HAVING threshold
_q(
    "q20_promotion_suppliers",
    ("supplier", "nation", "lineitem", "part"),
    """
    SELECT s_name, s_acctbal
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
      AND s_suppkey IN (
        SELECT l_suppkey
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%gear%'
          AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING sum(l_quantity) > 50)
    """,
)

# Q21 shape: suppliers who kept multi-supplier orders waiting — EXISTS +
# NOT EXISTS with non-equi correlated predicates (lateness = shipped >90
# days after order date; the fixture has no commit/receipt dates)
_q(
    "q21_waiting_suppliers",
    ("supplier", "lineitem", "orders", "nation"),
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F' AND n_name = 'NATION_2'
      AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
    GROUP BY s_name
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
