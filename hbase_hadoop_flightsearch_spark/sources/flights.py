"""Deterministic `flights` view derived from `lineitem`.

The reference's only dataset is the BTS On-Time Performance CSV
(HCompute/Main.java:75-81 reads Year/Month/UniqueCarrier/ArrDelayMinutes/
Cancelled/Diverted). The driver's testdata has no flights table, so the
engine derives one deterministically from `lineitem` using arithmetic that
is expressible *identically* in Spark and ANSI SQL — which makes every
flight query fully oracle-checkable by DuckDB.

The mapping is pure column arithmetic (no shuffle, no UDF): at 100 TB it is
a zero-cost projection fused into the scan by whole-stage codegen.

Domain properties mirror FIXTURES.md §1:
  - ~2% cancelled (orderkey % 50), ~1% diverted (orderkey % 97),
  - a deterministic ~14% of rows in the "wrong" year (2007) to exercise the
    year filter (HCompute/Main.java:109-111),
  - 18 carriers with skew inherited from l_suppkey's distribution,
  - integer-valued delays in [0, 120) so month-averages exercise both the
    fractional and exact-integer paths of the floor(avg)+1 quirk
    (HCompute/Main.java:143-146).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import load_table

CARRIERS = [
    "AA", "AS", "B6", "CO", "DL", "EV", "F9", "FL", "HA",
    "MQ", "NW", "OH", "OO", "UA", "US", "WN", "XE", "YV",
]


def flights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flights table as a DataFrame (narrow projection over lineitem)."""
    li = load_table(spark, sf_dir, "lineitem")
    carrier_arr = F.array(*[F.lit(c) for c in CARRIERS])
    return li.select(
        F.when(F.year("l_shipdate") >= 2001, F.lit(2007))
        .otherwise(F.lit(2008))
        .alias("year"),
        F.month("l_shipdate").alias("month"),
        F.element_at(
            carrier_arr, (F.col("l_suppkey") % 18 + 1).cast("int")
        ).alias("carrier"),
        ((F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 120)
        .cast("double")
        .alias("arr_delay_minutes"),
        F.when(F.col("l_orderkey") % 50 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("cancelled"),
        F.when(F.col("l_orderkey") % 97 == 3, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("diverted"),
    )


def _carrier_list_sql() -> str:
    return "[" + ", ".join(f"'{c}'" for c in CARRIERS) + "]"


# DuckDB CTE computing the *same* rows; prepend to every flight oracle.
FLIGHTS_CTE = f"""
WITH flights AS (
  SELECT
    CASE WHEN year(l_shipdate) >= 2001 THEN 2007 ELSE 2008 END AS year,
    month(l_shipdate) AS month,
    ({_carrier_list_sql()})[CAST(l_suppkey % 18 AS INT) + 1] AS carrier,
    CAST((l_orderkey * 7 + l_linenumber * 13) % 120 AS DOUBLE)
      AS arr_delay_minutes,
    CASE WHEN l_orderkey % 50 = 0 THEN 1.0 ELSE 0.0 END AS cancelled,
    CASE WHEN l_orderkey % 97 = 3 THEN 1.0 ELSE 0.0 END AS diverted
  FROM lineitem
)
"""
