"""Set operations (SURVEY.md §2b E8) — absent from the reference.

Spark set-op physical shapes: UNION is a zero-shuffle concatenation;
INTERSECT/EXCEPT compile to semi/anti joins over distinct inputs (one
shuffle each on the full row as key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


def _custkeys_with_status(spark, sf_dir: str, status: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == status)
        .select("o_custkey")
        .distinct()
    )


@register(
    "setops_intersect_f_and_o",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
""",
    doc="INTERSECT (E8): customers with both fulfilled and open orders.",
)
def setops_intersect_f_and_o(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_with_status(spark, sf_dir, "F").intersect(
        _custkeys_with_status(spark, sf_dir, "O")
    )


@register(
    "setops_except_f_not_p",
    oracle="""
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
""",
    doc="EXCEPT (E8): fulfilled-order customers with no pending orders.",
)
def setops_except_f_not_p(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _custkeys_with_status(spark, sf_dir, "F").exceptAll(
        _custkeys_with_status(spark, sf_dir, "P")
    )
    # exceptAll over distinct inputs == set EXCEPT; keeps the plan an anti
    # join without an extra dedup of the left side.


@register(
    "setops_union_high_value_entities",
    oracle="""
SELECT kind, entity_key, ROUND(acctbal, 2) AS acctbal FROM (
  SELECT 'customer' AS kind, c_custkey AS entity_key, c_acctbal AS acctbal
  FROM customer WHERE c_acctbal > 9000
  UNION ALL
  SELECT 'supplier' AS kind, s_suppkey AS entity_key, s_acctbal AS acctbal
  FROM supplier WHERE s_acctbal > 9000
)
""",
    doc="UNION ALL by name (E8): heterogeneous sources aligned to one schema.",
)
def setops_union_high_value_entities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.lit("customer").alias("kind"),
            F.col("c_custkey").alias("entity_key"),
            F.round("c_acctbal", 2).alias("acctbal"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select(
            F.lit("supplier").alias("kind"),
            F.col("s_suppkey").alias("entity_key"),
            F.round("s_acctbal", 2).alias("acctbal"),
        )
    )
    return cust.unionByName(supp)


@register(
    "setops_intersect_all_priorities",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    doc="INTERSECT ALL (E8): bag semantics — each priority appears "
    "min(count_F, count_O) times. Compiles to a counted semi-join "
    "(one shuffle per side on the row value), not a distinct.",
)
def setops_intersect_all_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multiset intersection of the priority columns of F- vs O-status
    orders — duplicates preserved up to the smaller multiplicity."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderpriority"
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderpriority"
    )
    return f.intersectAll(o)


@register(
    "setops_except_all_priorities",
    oracle="""
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
EXCEPT ALL
SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
""",
    doc="EXCEPT ALL (E8): bag difference — each priority survives "
    "max(0, count_F - count_O) times.",
)
def setops_except_all_priorities(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Multiset difference of priority columns (F minus O)."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderpriority"
    )
    o = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderpriority"
    )
    return f.exceptAll(o)
