"""Subquery-heavy TPC-H shapes (SURVEY.md §2b E1/E2 extensions).

The reference has no joins or subqueries at all (every MapReduce job has
exactly one input — SURVEY.md §2a "verifiably ABSENT" list). These three
queries cover the classic decorrelation patterns an engine must handle:

  * q2 shape  — correlated *scalar* subquery (per-group MIN) deciding row
    survival. Spark-first form: a window MIN over the group key — ONE
    shuffle on l_partkey, no self-join, no decorrelation needed because we
    never correlate in the first place.
  * q20 shape — *nested IN* subqueries with an aggregate threshold. The
    threshold is expressed as a fraction of the total (scale-free), so the
    query is meaningful at every SF. Spark-first form: left-semi joins.
  * q21 shape — doubly-correlated EXISTS / NOT EXISTS with an inequality
    correlate (`other.suppkey <> this.suppkey`). Spark-first form:
    left_semi + left_anti joins whose conditions carry the equi component
    (orderkey) for the hash/sort-merge path plus the non-equi residual.

The testdata has no partsupp table and no commit/receipt dates
(FIXTURES.md), so each query keeps the *shape* of its TPC-H counterpart on
the columns that exist: "supply cost" is min unit price observed in
lineitem, and q21's "late" flag is l_returnflag = 'R'.

Scale notes (100 TB): every variant shuffles the fact table at most once
per distinct key (partkey / suppkey / orderkey); the dimension sides
(part, supplier, nation) broadcast. The q21 self-joins key on l_orderkey —
lines-per-order is bounded (7 in TPC-H), so posting skew is structurally
impossible. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from .joins import _dec as dec
from .joins import _t


@register(
    "join_q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, cost AS min_cost
FROM ps
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_type = 'ECONOMY' AND p_size < 15
  AND cost = (SELECT MIN(ps2.cost) FROM ps ps2
              WHERE ps2.l_partkey = ps.l_partkey)
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
""",
    headline=True,
    doc="TPC-H q2 shape: cheapest supplier per part via correlated scalar "
    "MIN subquery; Spark form is a window MIN (no self-join).",
)
def join_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each ECONOMY part under size 15, the supplier(s) achieving the
    minimum observed unit price. The oracle spells the classic correlated
    scalar subquery; the Spark plan replaces it with MIN() OVER
    (PARTITION BY l_partkey) — the per-(part,supplier) aggregate and the
    per-part minimum ride the SAME single exchange on l_partkey.

    Cross-engine exactness: cost is one IEEE division of parquet doubles
    and MIN picks an existing value, so `cost = min_cost` compares
    bit-identical values in both engines — no rounding needed."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").filter(
        (F.col("p_type") == "ECONOMY") & (F.col("p_size") < 15)
    )
    supp = _t(spark, sf_dir, "supplier")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    best = ps.withColumn(
        "min_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
    ).filter(F.col("cost") == F.col("min_cost"))
    return (
        best.join(
            F.broadcast(part.select("p_partkey", "p_name")),
            best.l_partkey == F.col("p_partkey"),
        )
        .join(
            F.broadcast(supp.select("s_suppkey", "s_name", "s_acctbal")),
            best.l_suppkey == F.col("s_suppkey"),
        )
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal",
            "min_cost",
        )
        .orderBy(F.desc("s_acctbal"), "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "join_q20_volume_suppliers",
    oracle="""
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > (
    SELECT 0.01 * SUM(l_quantity) FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE 'red%')
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01')
)
ORDER BY s_suppkey
""",
    doc="TPC-H q20 shape: nested IN subqueries — suppliers carrying >1% of "
    "1997 'red' part volume. Scale-free threshold (fraction of total).",
)
def join_q20_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-IN membership becomes two left-semi joins; the scalar total
    is a 1-row cross-joined aggregate (Spark broadcasts it). l_quantity is
    integer-valued, so the double SUM is exact in any summation order and
    the `> 0.01 * total` comparison is engine-identical."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    red_li = li.join(
        F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi"
    )
    per_supp = red_li.groupBy("l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    total = red_li.agg((F.sum("l_quantity") * 0.01).alias("threshold"))
    qualified = (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("qty") > F.col("threshold"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")
    return (
        supp.join(
            F.broadcast(qualified),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), supp.s_nationkey == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@register(
    "join_q21_sole_flagged_supplier",
    oracle="""
SELECT s_suppkey, s_name, COUNT(DISTINCT l1.l_orderkey) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
""",
    doc="TPC-H q21 shape: doubly-correlated EXISTS/NOT EXISTS with an "
    "inequality correlate — the sole 'R'-flagged supplier on multi-supplier "
    "finished orders.",
)
def join_q21_sole_flagged_supplier(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXISTS -> left_semi, NOT EXISTS -> left_anti; both join conditions
    are (orderkey equal) AND (suppkey unequal), so the hash join keys on
    orderkey and evaluates the inequality as a residual filter. Self-join
    fan-out is bounded by lines-per-order, never by order count."""
    li = _t(spark, sf_dir, "lineitem")
    finished = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    other = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    other_flagged = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    sole = (
        l1.join(
            other,
            (l1.l_orderkey == F.col("ok2"))
            & (l1.l_suppkey != F.col("sk2")),
            "left_semi",
        )
        .join(
            other_flagged,
            (l1.l_orderkey == F.col("ok3"))
            & (l1.l_suppkey != F.col("sk3")),
            "left_anti",
        )
    )
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole.groupBy("l_suppkey")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_suppkey")
        .limit(20)
    )


@register(
    "join_q8_market_share",
    oracle="""
SELECT l_year,
  CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0.00 AS DECIMAL(20,4)) END) AS DOUBLE)
       / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share,
  COUNT(*) AS n_lineitems
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS l_year,
         n_name AS supp_nation,
         CAST(l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
)
GROUP BY l_year
ORDER BY l_year
""",
    doc="TPC-H q8 shape: one nation's market share of total trade volume "
    "per year — conditional aggregation as a fraction of the group total. "
    "Both sums run in exact DECIMAL; only the final ratio is a double "
    "division of identical operands, so the shares are engine-exact.",
)
def join_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numerator and denominator ride the SAME aggregation (a CASE inside
    sum) — one scan, one shuffle, no self-join of aggregates."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation")
    volume = dec("l_extendedprice") * (1 - dec("l_discount"))
    df = (
        li.join(orders, li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(supp), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("l_year"),
            F.col("n_name").alias("supp_nation"),
            volume.alias("volume"),
        )
    )
    zero = F.lit("0.00").cast("decimal(20,4)")
    return (
        df.groupBy("l_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double")
            ).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .orderBy("l_year")
    )


@register(
    "join_q22_dormant_rich_customers",
    oracle="""
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total,
         COUNT(*) AS cnt
  FROM customer WHERE c_acctbal > 0
)
SELECT cntrycode, COUNT(*) AS numcust,
  CAST(SUM(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM (
  SELECT substring(c_name, 17, 2) AS cntrycode, c_acctbal AS acctbal
  FROM customer, stats
  WHERE CAST(c_acctbal AS DECIMAL(18,2)) * cnt > total
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderpriority = '1-URGENT')
)
GROUP BY cntrycode
ORDER BY cntrycode
""",
    doc="TPC-H q22 shape: above-average-balance customers with no URGENT "
    "orders (every customer here has SOME order, so the classic no-orders "
    "predicate would be vacuous), "
    "rolled up by a derived code. The average comparison is spelled "
    "balance*count > total in exact DECIMAL — an engine-exact rewrite of "
    "the classic AVG scalar subquery (a double AVG could flip the "
    "comparison for a customer within one ulp of the mean).",
)
def join_q22_dormant_rich_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Scalar-aggregate subquery (1-row broadcast cross join) + left_anti
    against orders + rollup. The anti join keys on custkey, so the probe
    side short-circuits on first match."""
    cust = _t(spark, sf_dir, "customer")
    orders = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    stats = cust.filter(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("total"),
        F.count(F.lit(1)).alias("cnt"),
    )
    rich = (
        cust.crossJoin(F.broadcast(stats))
        .filter(
            F.col("c_acctbal").cast("decimal(18,2)") * F.col("cnt")
            > F.col("total")
        )
        .select("c_custkey", "c_name", "c_acctbal")
    )
    dormant = rich.join(
        orders, rich.c_custkey == F.col("o_custkey"), "left_anti"
    )
    return (
        dormant.groupBy(
            F.substring("c_name", 17, 2).alias("cntrycode")
        )
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "join_q16_supplier_counts",
    oracle="""
SELECT p_brand, p_type, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_size < 30
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type
LIMIT 30
""",
    doc="TPC-H q16 shape: distinct-supplier counts per part attribute "
    "with a NOT IN exclusion list (the 'complaints' pattern). With a "
    "non-nullable key NOT IN == anti join; a nullable key would flip to "
    "null-aware anti join semantics (one NULL empties the result) — the "
    "Spark side spells left_anti explicitly to pin the intended meaning.",
)
def join_q16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exclusion list broadcasts (tiny); count(DISTINCT) runs as the
    standard two-level expand/aggregate; TakeOrdered caps the output."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = (
        _t(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & (F.col("p_size") < 30))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(F.broadcast(bad_supp),
                li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
        .limit(30)
    )


@register(
    "join_q13_order_count_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H q13 shape: customer order-count distribution via LEFT "
    "OUTER JOIN (customers with zero orders survive as c_count = 0 — "
    "COUNT of a null column skips them) + a second aggregation over the "
    "first's output.",
)
def join_q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The outer-join + COUNT(col) interplay is the point: an inner join
    would silently drop zero-order customers and shift the histogram.
    Two shuffles (custkey, then c_count) — both post-aggregation."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "join_q17_small_quantity_revenue",
    oracle="""
WITH avg_qty AS (
  SELECT l_partkey AS ak, 0.2 * AVG(l_quantity) AS threshold
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7
    AS avg_yearly,
  COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avg_qty ON ak = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < threshold
""",
    doc="TPC-H q17 shape: lineitems below 20% of their part's average "
    "quantity — correlated AVG threshold per part. l_quantity is "
    "integer-valued so the AVG (exact sum / count, one division) and the "
    "< comparison are engine-identical; revenue sums ride DECIMAL.",
)
def join_q17_small_quantity_revenue(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The correlated average becomes a window AVG over l_partkey —
    threshold and probe rows ride the same single exchange (same
    no-self-join trick as q2)."""
    li = _t(spark, sf_dir, "lineitem")
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#1")
        .select("p_partkey")
    )
    w = Window.partitionBy("l_partkey")
    flagged = li.withColumn(
        "threshold", 0.2 * F.avg("l_quantity").over(w)
    ).filter(F.col("l_quantity") < F.col("threshold"))
    return (
        flagged.join(
            F.broadcast(part), flagged.l_partkey == part.p_partkey, "left_semi"
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                / 7
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@register(
    "join_q4_priority_order_counts",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-07-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape (order-priority checking): correlated EXISTS with "
    "a comparison correlate, decorrelated Spark-first as a left-semi join "
    "carrying the equi key (orderkey) plus the shipdate>orderdate "
    "residual. The driver schema has no commit/receipt dates, so 'late "
    "line' means shipped after the order date — the EXISTS-per-order + "
    "priority histogram topology is Q4's.",
)
def join_q4_priority_order_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Left-semi keeps exactly one copy of each qualifying order (EXISTS
    semantics, never join-then-distinct). The date filter prunes orders
    BEFORE the semi join, so the orderkey shuffle carries only the
    quarter's orders; the 5-row priority aggregate partial-aggregates to
    O(5) rows per task before its Exchange."""
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1996-07-01")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "join_q11_important_parts",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
    SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS value_e4
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name IN ('NATION_3', 'NATION_7')
  GROUP BY l_partkey
)
SELECT l_partkey,
  ROUND(value_e4 / CAST(10000 AS DOUBLE), 2) AS part_value
FROM pv
WHERE value_e4 * 500 > (SELECT SUM(value_e4) FROM pv)
""",
    doc="TPC-H Q11 shape (important stock identification): per-part value "
    "within a nation group, kept when above a scalar-subquery fraction of "
    "the GLOBAL total. No partsupp table exists in the driver schema, so "
    "value is lineitem revenue attributed through the supplier's nation — "
    "the aggregate + global-threshold-scalar topology is Q11's.",
)
def join_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scalar subquery decorrelates to a 1-row broadcast cross join —
    the per-part aggregate is computed ONCE (cached local checkpoint would
    be overkill: Spark reuses the shuffle via ReusedExchange since both
    branches share the plan), the global total reduces it to one row, and
    every partition compares against the broadcast scalar. No collect, no
    second scan of the fact table."""
    li = _t(spark, sf_dir, "lineitem")
    sup = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = _t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    pv = (
        li.join(F.broadcast(sup), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(nat.select("n_nationkey")),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
                * (
                    100
                    - F.round(F.col("l_discount") * 100, 0).cast("bigint")
                )
            ).alias("value_e4")
        )
    )
    # r10 hardening: the 0.002-of-total membership test is an INTEGER
    # cross-multiplication (value*500 > total) — a float threshold here
    # could flip whole ROWS in or out across engines, the worst case of
    # the summation-order class the seed-5 differential exposed.
    total = pv.agg(F.sum("value_e4").alias("total_e4"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value_e4") * 500 > F.col("total_e4"))
        .select(
            "l_partkey",
            F.round(
                F.expr("value_e4 / CAST(10000 AS DOUBLE)"), 2
            ).alias("part_value"),
        )
    )
