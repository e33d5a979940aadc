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

# ---------------------------------------------------------------------------
# Round-3 completion of the TPC-H shape suite: the remaining eleven
# queries (Q2/Q8/Q9/Q11/Q13/Q15/Q16/Q17/Q20/Q21/Q22), each adapted to
# the synthetic schema (no partsupp table, no commit/receipt dates, no
# phone/comment columns) while preserving the PLAN SHAPE the original
# exercises — that shape (correlated min, scalar-subquery HAVING,
# left-join histogram, CTE + max, NOT IN + count-distinct, correlated
# avg, nested IN, double EXISTS, anti join + avg gate) is what the
# optimizer and the 100-TB story care about, not the exact predicate
# constants. All money arithmetic follows the house decimal-quantize /
# integer-scale rules (see _Q1_BODY and _Q14_BODY comments).
# ---------------------------------------------------------------------------

# Q2-shaped min-cost supplier: the per-part correlated MIN subquery.
# partsupp does not exist, so lineitem serves as the part↔supplier
# relation and l_extendedprice as the cost; the correlated subquery
# re-derives the same region-restricted min per part. DISTINCT because
# several lineitems can sit exactly at the min. Deterministic LIMIT via
# the (acctbal, partkey, suppname) total order.
_Q2_BODY = """
SELECT DISTINCT p.p_partkey, p.p_brand, s.s_name, n.n_name,
       CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
       l.l_extendedprice AS min_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15
  AND p.p_type = 'STANDARD'
  AND r.r_name = 'EUROPE'
  AND l.l_extendedprice = (
      SELECT MIN(l2.l_extendedprice)
      FROM lineitem l2
      JOIN supplier s2 ON s2.s_suppkey = l2.l_suppkey
      JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
      JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
      WHERE l2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE'
  )
ORDER BY s_acctbal DESC, p_partkey ASC, s_name ASC
LIMIT 100
"""

_register_sql("sql_tpch_q2", _Q2_BODY)

# Q8-shaped national market share: one nation's revenue share of a
# region's market by order year. The share ratio uses the all-integer
# form (see _Q14_BODY: DuckDB's decimal `//` is true division and its
# double->BIGINT cast rounds, so only integer `div` is engine-exact).
_Q8_BODY = """
WITH all_nations AS (
    SELECT YEAR(o.o_orderdate) AS o_year,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
             AS DECIMAL(38,6)) AS vol,
           n2.n_name AS supp_nation
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
), per_year AS (
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_7' THEN vol
                         ELSE CAST(0 AS DECIMAL(38,6)) END) * 10000
                AS BIGINT) AS nation_u,
           CAST(SUM(vol) * 10000 AS BIGINT) AS total_u,
           COUNT(*) AS n_items
    FROM all_nations
    GROUP BY o_year
)
SELECT o_year,
       CAST((nation_u * 100000) {div} GREATEST(total_u, 1) AS BIGINT)
           AS mkt_share_x100000,
       n_items
FROM per_year
"""

_register_sql(
    "sql_tpch_q8",
    _Q8_BODY.format(div="div"),
    _Q8_BODY.format(div="//"),
)

# Q9-shaped product-type profit: profit per supplier nation per year.
# ps_supplycost does not exist; p_retailprice quantized to cents
# stands in as the unit cost. The original's amount is
# revenue - qty*cost/10; division is NOT engine-exact on decimals
# (DuckDB decimal division converts to DOUBLE), so the whole amount is
# scaled ×10 and kept in pure multiply/subtract decimal arithmetic,
# emitted integer-scaled (×10000: the revenue term carries FOUR live
# decimals — price 2dp × (1-disc) 2dp — and Spark's decimal->BIGINT
# cast truncates where DuckDB's rounds, so the scale factor must make
# the value integral BEFORE the cast; ×100 diverged by 1 in the last
# digit at sf0.01).
_Q9_BODY = """
SELECT n.n_name AS nation,
       YEAR(o.o_orderdate) AS o_year,
       CAST(SUM(CAST(10 * CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                     AS DECIMAL(38,6))
                AS DECIMAL(38,6))
              - CAST(CAST(p.p_retailprice AS DECIMAL(18,2))
                     * CAST(l.l_quantity AS DECIMAL(18,2))
                AS DECIMAL(38,6))) * 10000 AS BIGINT) AS profit_x100000_u,
       COUNT(*) AS n_items
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY n.n_name, YEAR(o.o_orderdate)
"""

_register_sql("sql_tpch_q9", _Q9_BODY)

# Q11-shaped important-inventory cut: per-part value for one nation's
# suppliers, kept only when above a fixed fraction of the nation
# total — the scalar-subquery-in-HAVING shape. The gate is SCALE-FREE
# (value_u * n_parts > 2 * total_u, i.e. above 2x the mean per-part
# value — a fixed share fraction goes empty as parts scale up, which
# is why TPC-H itself scales the fraction by 1/SF). All-integer
# comparison ( quantities are integral
# so ×10000 makes every decimal integral before the truncating cast)
# so the gate is engine-exact.
_Q11_BODY = """
WITH nation_lines AS (
    SELECT l.l_partkey,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(l.l_quantity AS DECIMAL(18,2))
             AS DECIMAL(38,6)) AS value_dec
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
)
SELECT l_partkey,
       CAST(SUM(value_dec) * 10000 AS BIGINT) AS value_u
FROM nation_lines
GROUP BY l_partkey
HAVING CAST(SUM(value_dec) * 10000 AS BIGINT)
       * (SELECT COUNT(DISTINCT l_partkey) FROM nation_lines)
       > 2 * (SELECT CAST(SUM(value_dec) * 10000 AS BIGINT)
              FROM nation_lines)
"""

_register_sql("sql_tpch_q11", _Q11_BODY)

# Q13-shaped customer order-count distribution: LEFT JOIN with a
# join-level residual predicate (priority class standing in for the
# comment NOT LIKE), COUNT over the nullable side, then a histogram
# of the counts — the two-level aggregation over an outer join.
_Q13_BODY = """
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT JOIN orders o
           ON o.o_custkey = c.c_custkey
          AND o.o_orderpriority <> '5-LOW'
    GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
"""

_register_sql("sql_tpch_q13", _Q13_BODY)

# Q15-shaped top supplier: revenue CTE reused twice — once as the
# join input, once under MAX() — with integer-scaled revenue so the
# max-equality selection is engine-exact.
_Q15_BODY = """
WITH revenue AS (
    SELECT l.l_suppkey AS supplier_no,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                         * (1 - CAST(l.l_discount AS DECIMAL(18,2)))
                    AS DECIMAL(38,6))) * 10000 AS BIGINT) AS total_revenue_u
    FROM lineitem l
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue_u
FROM supplier s
JOIN revenue r ON r.supplier_no = s.s_suppkey
WHERE r.total_revenue_u = (SELECT MAX(total_revenue_u) FROM revenue)
"""

_register_sql("sql_tpch_q15", _Q15_BODY)

# Q16-shaped supplier-count report: NOT IN anti-subquery on the
# supplier dim + COUNT(DISTINCT) per part attribute triple, with
# lineitem standing in for partsupp as the part↔supplier relation.
_Q16_BODY = """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#3'
  AND p.p_type NOT LIKE 'MEDIUM%'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
"""

_register_sql("sql_tpch_q16", _Q16_BODY)

# Q17-shaped small-quantity revenue: the correlated AVG subquery per
# part (quantities are integral doubles -> the 0.2*AVG threshold is
# bit-identical across engines), with the final avg-yearly division
# done integer-scaled via the div/'//' twin.
_Q17_BODY = """
SELECT CAST(CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                     AS DECIMAL(38,6))) * 100 AS BIGINT) * 10 {div} 7
            AS BIGINT) AS avg_yearly_u,
       COUNT(*) AS n_items
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity)
      FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
  )
"""

_register_sql(
    "sql_tpch_q17",
    _Q17_BODY.format(div="div"),
    _Q17_BODY.format(div="//"),
)

# Q20-shaped part-promotion suppliers: the nested IN-inside-IN shape —
# suppliers (in one nation) who moved enough volume of small-named
# parts in a year. GROUP/HAVING inside the inner membership set.
_Q20_BODY = """
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_1'
  AND s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l
      WHERE l.l_partkey IN (
          SELECT p_partkey FROM part WHERE p_name LIKE 'small%'
      )
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_suppkey
      HAVING SUM(l.l_quantity) > 50
  )
"""

_register_sql("sql_tpch_q20", _Q20_BODY)

# Q21-shaped waiting-supplier count: the EXISTS + NOT EXISTS pair with
# a non-equality correlated predicate (another supplier in the same
# order / no OTHER supplier also flagged). l_returnflag='R' stands in
# for receipt-after-commit lateness, o_orderstatus='F' as in spec.
_Q21_BODY = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
JOIN nation n    ON n.n_nationkey = s.s_nationkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND n.n_name = 'NATION_2'
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
  )
GROUP BY s.s_name
"""

_register_sql("sql_tpch_q21", _Q21_BODY)

# Q22-shaped global-sales opportunity: the anti join (customers with
# no RECENT orders — every synthetic customer has at least one order
# ever, so the lapse window keeps the result non-empty) gated by an
# uncorrelated AVG-of-positive-balances
# subquery. c_name's trailing digit stands in for the phone country
# code ('Customer#000000042' -> '2'); the average is decimal-sum /
# count like sql_correlated_subquery so the gate is engine-exact.
_Q22_BODY = """
SELECT cntrycode,
       COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
    SELECT SUBSTRING(c.c_name, 18, 1) AS cntrycode, c.c_acctbal
    FROM customer c
    WHERE SUBSTRING(c.c_name, 18, 1) IN ('1', '3', '5', '7', '9')
      AND c.c_acctbal > (
          SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6)))
                      AS DOUBLE) / COUNT(*)
          FROM customer c2
          WHERE c2.c_acctbal > 0.0
            AND SUBSTRING(c2.c_name, 18, 1) IN ('1', '3', '5', '7', '9')
      )
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
      )
) cust
GROUP BY cntrycode
"""

_register_sql("sql_tpch_q22", _Q22_BODY)


# Recursive CTE (Spark 4 WITH RECURSIVE — SQL-surface row): depth of
# every host in the implicit binary-tree hierarchy child i -> parent
# (i-1) div 2, plus the subtree-rooted host count per depth. Purely
# integer recursion, identical semantics in both engines; the dialect
# twin differs only in integer-division spelling and series generation.
_RCTE_SPARK = """
WITH RECURSIVE hosts AS (
    SELECT explode(sequence(0, 96)) AS i
),
d(i, depth) AS (
    SELECT 0, 0
    UNION ALL
    SELECT h.i, d.depth + 1
    FROM hosts h JOIN d ON d.i = (h.i - 1) div 2
    WHERE h.i > 0
)
SELECT CAST(depth AS BIGINT) AS depth,
       COUNT(*) AS n_hosts,
       CAST(MIN(i) AS BIGINT) AS first_host,
       CAST(MAX(i) AS BIGINT) AS last_host
FROM d GROUP BY depth
"""

_RCTE_DUCK = """
WITH RECURSIVE hosts AS (
    SELECT unnest(generate_series(0, 96)) AS i
),
d(i, depth) AS (
    SELECT 0, 0
    UNION ALL
    SELECT h.i, d.depth + 1
    FROM hosts h JOIN d ON d.i = (h.i - 1) // 2
    WHERE h.i > 0
)
SELECT CAST(depth AS BIGINT) AS depth,
       COUNT(*) AS n_hosts,
       CAST(MIN(i) AS BIGINT) AS first_host,
       CAST(MAX(i) AS BIGINT) AS last_host
FROM d GROUP BY depth
"""

_register_sql("sql_recursive_hierarchy", _RCTE_SPARK, _RCTE_DUCK)


# SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN expr):
# the catalog-function surface — a named, reusable expression resolved
# by the ANALYZER into the plan (zero UDF overhead, full codegen), the
# right tool for shared business logic a team would otherwise copy
# into every query. The oracle inlines the same expression (DuckDB
# macros would be the dialect twin; inlining keeps the oracle minimal).
_SQL_UDF_BODY = """
SELECT host_id, COUNT(*) AS n_pages
FROM (SELECT hostnum(url) AS host_id FROM pages_udf_in)
GROUP BY host_id
"""


def _sql_udf_fn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.pages import synth_pages

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION hostnum(u STRING) "
        "RETURNS BIGINT "
        r"RETURN CAST(regexp_extract(u, 'site(\\d+)', 1) AS BIGINT)"
    )
    synth_pages(spark, sf_dir).createOrReplaceTempView("pages_udf_in")
    return spark.sql(_SQL_UDF_BODY)


def _sql_udf_oracle() -> str:
    from ..geo.cells_sql import PAGES_SQL

    return f"""
    WITH {PAGES_SQL}
    SELECT CAST(regexp_extract(url, 'site(\\d+)', 1) AS BIGINT) AS host_id,
           COUNT(*) AS n_pages
    FROM pages GROUP BY 1
    """


CATALOG["sql_udf_scalar"] = QuerySpec(_sql_udf_fn, _sql_udf_oracle())
