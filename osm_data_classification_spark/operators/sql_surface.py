"""The spark.sql(...) surface (SURVEY.md §3.2: "declare the logical
plan with the DataFrame/SQL API").

Most of the catalog is DataFrame-built; these entries exercise the SQL
entry point end-to-end — views registered from the catalog-abstracted
reader, queries submitted as SQL text, same Catalyst pipeline, same
DuckDB oracles. The SQL strings are written once in the shared
cross-engine dialect (integer-scaled / decimal-fold arithmetic), so
the Spark query IS the oracle text modulo the `div` / `//` spelling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..io import register_views
from .relational import QuerySpec

CATALOG: dict[str, QuerySpec] = {}


def _register_sql(name: str, spark_sql: str, duck_sql: str | None = None):
    """Register a pure-SQL query: the Spark fn registers views and runs
    the text; the oracle is the same text (or a dialect twin)."""

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        register_views(spark, sf_dir)
        return spark.sql(spark_sql)

    CATALOG[name] = QuerySpec(fn, duck_sql or spark_sql)
    return fn


# TPC-H Q1-shaped pricing summary. Money columns are 2-decimal values
# stored as doubles: quantize to DECIMAL(18,2) BEFORE any arithmetic —
# rounding *products* of doubles hits true decimal midpoints where
# HALF_UP disagrees across engines (see operators/relational.py dec2)
_Q1_BODY = """
SELECT l_returnflag,
       l_linestatus,
       CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6)))
            AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(38,6)))
            AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

_register_sql("sql_tpch_q1", _Q1_BODY)

# Q3-shaped shipping-priority join (top 10 revenue orders)
_Q3_BODY = """
SELECT o.o_orderkey,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

_register_sql("sql_tpch_q3", _Q3_BODY)

# correlated-subquery shape (customers above their nation's avg balance)
_SUBQ_BODY = """
SELECT c_custkey, c_nationkey
FROM customer c1
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(ROUND(c_acctbal, 2) AS DECIMAL(38,6))) AS DOUBLE)
               / COUNT(*)
    FROM customer c2 WHERE c2.c_nationkey = c1.c_nationkey
)
"""

_register_sql("sql_correlated_subquery", _SUBQ_BODY)

# Q5-shaped local-supplier volume: the deepest join chain in the
# catalog (region→nation→customer→orders→lineitem→supplier with the
# customer-and-supplier-same-nation constraint) — exercises Catalyst
# join reordering + broadcast of every dim in one query
_Q5_BODY = """
SELECT n.n_name,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
               AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""

_register_sql("sql_tpch_q5", _Q5_BODY)

# Q18-shaped large-order customers: aggregate -> IN-subquery gate ->
# re-join and re-aggregate (the classic "having sum over threshold"
# double-aggregation shape)
_Q18_BODY = """
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6)))
            AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o  ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(38,6))) > 150
)
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
"""

_register_sql("sql_tpch_q18", _Q18_BODY)

# Q6-shaped forecast-revenue filter: a pure filter+aggregate with
# every predicate pushable to the parquet scan — the plan should be
# scan(PushedFilters) -> partial agg -> final agg, no join, no sort.
# The range predicates are written on raw columns (not expressions)
# so the parquet reader can evaluate them against row-group stats.
_Q6_BODY = """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                     * CAST(l_discount AS DECIMAL(18,2))
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.09
  AND l_quantity < 24
"""

_register_sql("sql_tpch_q6", _Q6_BODY)

# Q4-shaped order-priority check: EXISTS correlated subquery ->
# Catalyst plans a left-semi join (no row duplication however many
# lineitems match) — the complement of the IN-subquery shape in Q18.
_Q4_BODY = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_tax < l.l_discount
  )
GROUP BY o_orderpriority
"""

_register_sql("sql_tpch_q4", _Q4_BODY)

# Q14-shaped promo-revenue share: conditional aggregation over a
# fact-dim join (part is the dim -> broadcast). The share ratio is
# computed entirely in INTEGER arithmetic (money sums are exact
# DECIMAL(38,6) with 4 live decimals -> ×10^4 makes them integral;
# cast to BIGINT, then integer division) — decimal/float division
# semantics differ between the engines (DuckDB `//` on DECIMAL is
# true division, and its double->BIGINT cast ROUNDS where Spark's
# `div` truncates), so only the all-integer form is engine-exact.
_Q14_BODY = """
WITH s AS (
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                                   * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                              AS DECIMAL(38,6))
                         ELSE CAST(0 AS DECIMAL(38,6)) END) * 10000
                AS BIGINT) AS promo_u,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,6))) * 10000 AS BIGINT) AS total_u,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
)
SELECT CAST((promo_u * 100000) {div} GREATEST(total_u, 1) AS BIGINT)
           AS promo_share_x100000,
       n_items
FROM s
"""

_register_sql(
    "sql_tpch_q14",
    _Q14_BODY.format(div="div"),
    _Q14_BODY.format(div="//"),
)

# Q10-shaped returned-item ranking: fact->fact->dim->dim chain with a
# selective fact filter (returnflag), aggregated per customer, top 20
# by revenue — the classic "who cost us the most" report. The ORDER
# BY+LIMIT compiles to TakeOrderedAndProject (no global sort), and
# revenue is tie-broken on c_custkey for a total order.
_Q10_BODY = """
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE l.l_returnflag = 'R'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

_register_sql("sql_tpch_q10", _Q10_BODY)

# Q7-shaped volume shipping: revenue between nation PAIRS by ship
# year — the two-dimensional dim join (nation joined twice under
# different roles) plus date-part grouping. The pair filter keeps
# both directions of one pair, exercising the disjunctive join-level
# predicate.
_Q7_BODY = """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(vol) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM (
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           YEAR(l.l_shipdate) AS l_year,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             AS DECIMAL(38,6)) AS vol
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
"""

_register_sql("sql_tpch_q7", _Q7_BODY)

# Q12-shaped two-class shipping check (l_linestatus standing in for
# l_shipmode, which the synthetic schema lacks): per class, count
# orders split by priority bucket — the CASE-inside-SUM two-way
# conditional aggregation over a fact-fact join.
_Q12_BODY = """
SELECT l.l_linestatus,
       -- CAST: DuckDB SUM(int) is HUGEINT -> float64 in pandas (r1 lesson)
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l.l_linestatus
"""

_register_sql("sql_tpch_q12", _Q12_BODY)

# Q19-shaped disjunctive-predicate revenue (p_brand/p_size standing in
# for the brand/container/size triples): three OR-branches that each
# pair a part attribute band with a lineitem quantity band — the shape
# that forces the optimizer to keep the join predicate conjunctive
# and evaluate the disjunction post-join (or push a common superset).
_Q19_BODY = """
SELECT CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity BETWEEN 20 AND 30)
"""

_register_sql("sql_tpch_q19", _Q19_BODY)
