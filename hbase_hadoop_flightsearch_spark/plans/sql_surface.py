"""Pure-SQL query surface: the same engine through `spark.sql`.

Everything else in the registry is DataFrame-API; these entries prove the
SQL front door (catalog views + ANSI SQL -> same Catalyst plans). The SQL
text is dialect-portable enough to BE its own oracle — what Spark executes
is byte-identical to what DuckDB executes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.catalog import register_views
from .registry import register

# TPC-H Q10 shape (returned-item reporting), portable SQL. Money math runs
# in DECIMAL: prices/discounts are cents-valued, so decimal sums are EXACT
# and engine-identical — double sums differ across engines in the last bits
# (summation order) and can flip a ROUND(x, 2) at a half-cent boundary.
_REV = (
    "SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) "
    "* (1 - CAST(l.l_discount AS DECIMAL(18,2))))"
)
_Q10_SQL = f"""
SELECT c.c_custkey,
       c.c_name,
       CAST(ROUND({_REV}, 2) AS DOUBLE) AS revenue,
       n.n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
HAVING {_REV} > 1000
"""

# Correlated scalar subquery: customers above their nation's average balance.
_SUBQ_SQL = """
SELECT c.c_custkey, c.c_nationkey, ROUND(c.c_acctbal, 2) AS acctbal
FROM customer c
WHERE c.c_acctbal > (
  SELECT AVG(c2.c_acctbal) FROM customer c2
  WHERE c2.c_nationkey = c.c_nationkey
)
"""


@register(
    "sql_q10_returned_items",
    oracle=_Q10_SQL,
    doc="SQL front door (E1/E4): TPC-H q10 shape via spark.sql over catalog "
    "views; the SQL string is its own oracle.",
)
def sql_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


# TPC-H q4 shape: EXISTS + NOT EXISTS correlated subqueries.
_EXISTS_SQL = """
SELECT o.o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.05
)
AND NOT EXISTS (
  SELECT 1 FROM lineitem l2
  WHERE l2.l_orderkey = o.o_orderkey AND l2.l_quantity > 45
)
GROUP BY o.o_orderpriority
"""


@register(
    "sql_exists_priority_counts",
    oracle=_EXISTS_SQL,
    doc="EXISTS / NOT EXISTS correlated subqueries (TPC-H q4 shape): "
    "Catalyst plans them as left-semi + left-anti joins.",
)
def sql_exists_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_EXISTS_SQL)


@register(
    "sql_correlated_subquery",
    oracle=_SUBQ_SQL,
    doc="Correlated scalar subquery via spark.sql — Catalyst decorrelates "
    "it into an aggregate + join (the rewrite MR users hand-wrote).",
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_SUBQ_SQL)


# Recursive CTE (Spark 4 WITH RECURSIVE): dense month spine between the
# first and last order month, zero months explicit. The recursion IS the
# point — the sequence()-based gapfill (operators/timeseries.py) is the
# closed-form twin; this proves the iterative SQL construct end to end.
# At scale the spine is O(months) rows on the driver-side plan — the heavy
# input only feeds the pre-aggregated monthly rollup it joins to.
#
# r16: the bounds are computed ONCE in a plain CTE and the upper bound
# rides the recursion rows. The previous form kept the correlated scalar
# subquery (SELECT MAX(o_orderdate) FROM orders) inside the recursive
# step, and Spark's iterative UNION-loop execution re-planned and
# re-scanned orders EVERY month step: ~80 iterations x a full aggregate =
# 565 driver jobs, 21.5 s at sf0.1; the bounds-carrying form is 8 jobs,
# 0.93 s (interleaved A/B), row-identical on BOTH engines (still the
# same text on both — DuckDB evaluates the two forms identically because
# its recursive executor materializes the scalar subquery once anyway).
_RECURSIVE_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS TIMESTAMP) AS hi
  FROM orders
),
spine(mo, hi) AS (
  SELECT lo, hi FROM bounds
  UNION ALL
  SELECT mo + INTERVAL '1' MONTH, hi FROM spine WHERE mo < hi
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
         COUNT(*) AS n_orders
  FROM orders GROUP BY 1
)
SELECT CAST(spine.mo AS DATE) AS month_start,
       COALESCE(monthly.n_orders, 0) AS n_orders
FROM spine LEFT JOIN monthly ON spine.mo = monthly.mo
"""


@register(
    "sql_recursive_month_spine",
    oracle=_RECURSIVE_SQL,
    doc="Recursive CTE (Spark 4 WITH RECURSIVE): month spine between "
    "min/max order months with explicit zero months — identical SQL text "
    "runs on both engines.",
)
def sql_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SQL)


# LATERAL correlated subquery with ORDER BY + LIMIT — per-nation top-3
# customers by balance. Catalyst decorrelates this into the same
# WindowGroupLimit-style plan as a row_number() filter; the LATERAL
# spelling is the one SQL users write.
_LATERAL_SQL = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n, LATERAL (
  SELECT c_custkey, c_acctbal
  FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey
  LIMIT 3
) t
"""


@register(
    "sql_lateral_top_customers",
    oracle=_LATERAL_SQL,
    doc="LATERAL correlated subquery (ORDER BY + LIMIT per outer row): "
    "top-3 customers by balance per nation; same SQL on both engines.",
)
def sql_lateral_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)


_PIVOT_SPARK_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderstatus,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
) PIVOT (
  CAST(ROUND(SUM(price), 2) AS DOUBLE)
  FOR o_orderstatus IN ('F' AS f_total, 'O' AS o_total, 'P' AS p_total)
)
"""


@register(
    "sql_pivot_syntax",
    oracle="""
SELECT o_orderpriority,
  CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'F'
      THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE)
    AS f_total,
  CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'O'
      THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE)
    AS o_total,
  CAST(ROUND(SUM(CASE WHEN o_orderstatus = 'P'
      THEN CAST(o_totalprice AS DECIMAL(18,2)) END), 2) AS DOUBLE)
    AS p_total
FROM orders GROUP BY o_orderpriority
""",
    doc="SQL PIVOT clause through the front door (Spark's native PIVOT "
    "syntax; DuckDB's PIVOT dialect differs, so the oracle is the "
    "portable conditional-aggregation desugaring — which is also "
    "exactly what Catalyst lowers PIVOT to: groupBy + pivotfirst "
    "partials, one exchange). Money stays in DECIMAL so the sums are "
    "engine-exact before the display cast.",
)
def sql_pivot_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_PIVOT_SPARK_SQL)


# ---------------------------------------------------------------------------
# Spark 4 SQL pipe syntax (|>): the composable FROM-first dialect
# ---------------------------------------------------------------------------

# The pipe form Spark executes; the oracle is the equivalent ANSI SQL
# (DuckDB has no pipe syntax — the point of the pair is that the NEW
# dialect lowers to the SAME relational algebra).
_PIPE_SQL = """
FROM orders
|> WHERE o_orderstatus = 'F'
|> EXTEND CAST(round(o_totalprice * 100) AS BIGINT) AS cents
|> AGGREGATE COUNT(*) AS n_orders, SUM(cents) AS revenue_cents
   GROUP BY o_orderpriority
|> WHERE n_orders > 10
"""

_PIPE_ORACLE = """
SELECT o_orderpriority,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders
WHERE o_orderstatus = 'F'
GROUP BY o_orderpriority
HAVING COUNT(*) > 10
"""


@register(
    "sql_pipe_syntax",
    oracle=_PIPE_ORACLE,
    doc="Spark 4 SQL PIPE syntax (|>, SPARK-49555): the FROM-first "
    "composable dialect — WHERE / EXTEND / AGGREGATE ... GROUP BY / "
    "post-aggregation WHERE stages lower to the exact relational plan "
    "of the classic SELECT (the oracle runs that classic form in "
    "DuckDB). Money in exact cents; proves the new front door hits the "
    "same Catalyst plans as everything else.",
)
def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(_PIPE_SQL)


# ---------------------------------------------------------------------------
# SQL UDFs (CREATE FUNCTION ... RETURN): Spark 4's macro-style functions
# ---------------------------------------------------------------------------

_SQL_UDF_DDL = [
    # scalar: exact cents (the repo's money convention, as a reusable fn)
    """CREATE OR REPLACE TEMPORARY FUNCTION f_cents(p DOUBLE)
       RETURNS BIGINT RETURN CAST(round(p * 100) AS BIGINT)""",
    # scalar calling scalar: price band — SQL UDFs compose by expansion
    """CREATE OR REPLACE TEMPORARY FUNCTION f_band(p DOUBLE)
       RETURNS STRING RETURN CASE
         WHEN f_cents(p) < 5000000 THEN 'low'
         WHEN f_cents(p) < 20000000 THEN 'mid'
         ELSE 'high' END""",
    # table-valued: a month spine generator usable in FROM
    """CREATE OR REPLACE TEMPORARY FUNCTION f_months(n INT)
       RETURNS TABLE(m INT) RETURN SELECT explode(sequence(1, n))""",
]

_SQL_UDF_QUERY = """
SELECT b.band, s.m AS month,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(f_cents(o_totalprice)) AS BIGINT) AS revenue_cents
FROM (SELECT o_totalprice, f_band(o_totalprice) AS band,
             month(o_orderdate) AS omonth
      FROM orders) b
JOIN f_months(12) s ON b.omonth = s.m
GROUP BY b.band, s.m
"""


@register(
    "sql_udf_functions_surface",
    oracle="""
WITH b AS (
  SELECT o_totalprice,
    CASE
      WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 5000000 THEN 'low'
      WHEN CAST(round(o_totalprice * 100) AS BIGINT) < 20000000 THEN 'mid'
      ELSE 'high' END AS band,
    month(o_orderdate) AS omonth
  FROM orders
),
s AS (SELECT unnest(range(1, 13)) AS m)
SELECT b.band, CAST(s.m AS INT) AS month,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM b JOIN s ON b.omonth = s.m
GROUP BY b.band, s.m
""",
    doc="SQL UDF surface (Spark 4 CREATE FUNCTION ... RETURN — the "
    "macro-style function DDL): a scalar money-convention fn, a scalar "
    "fn COMPOSING it (f_band calls f_cents), and a TABLE-valued fn "
    "(month spine) used in FROM with an equi join. SQL UDFs expand at "
    "analysis time into the calling plan — zero runtime dispatch, full "
    "Catalyst optimization through the function boundary, unlike "
    "Python UDFs — which is why the DuckDB oracle is simply the "
    "expansion inlined. Proves the engine's function DDL front door "
    "produces the same exact-cents results as the expression API.",
)
def sql_udf_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    for ddl in _SQL_UDF_DDL:
        spark.sql(ddl)
    return spark.sql(_SQL_UDF_QUERY)


# ---------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL — the Spark 3.4+/DuckDB-originated syntax
# sugar: every non-aggregate select item becomes a grouping key, every
# select item an ordering key. Surface parity matters because analysts'
# ad-hoc SQL leans on it heavily.


@register(
    "sql_group_by_all",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders
GROUP BY o_orderpriority, o_orderstatus
ORDER BY o_orderpriority, o_orderstatus, n_orders, revenue_cents
""",
    doc="Spark 4 GROUP BY ALL + ORDER BY ALL syntax surface (E9/SQL "
    "front door): the analyzer must infer the grouping set from the "
    "non-aggregate select items and the total order from the whole "
    "select list; the oracle spells both out explicitly, so a "
    "resolution bug (wrong inferred keys) breaks the value hash, not "
    "just the plan.",
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderpriority, o_orderstatus,
          CAST(COUNT(*) AS BIGINT) AS n_orders,
          CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
            AS revenue_cents
        FROM orders
        GROUP BY ALL
        ORDER BY ALL
        """
    )
