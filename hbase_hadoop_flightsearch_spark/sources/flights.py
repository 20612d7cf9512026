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


# ---------------------------------------------------------------------------
# Extended flights view: deterministic airports + schedule times, for the
# connection-search family (the reference repo's namesake domain). Same
# design rule as flights(): pure column arithmetic expressible identically
# in Spark and DuckDB SQL, so every itinerary query is value-oracle-able.
# ---------------------------------------------------------------------------

AIRPORTS = [
    "ATL", "BOS", "CLT", "DEN", "DFW", "DTW", "EWR", "IAH", "JFK", "LAS",
    "LAX", "MCO", "MIA", "MSP", "ORD", "PHL", "PHX", "SEA", "SFO", "SLC",
]


def flights_extended(spark: SparkSession, sf_dir: str) -> DataFrame:
    """flights() plus deterministic airports and schedule times.

    origin/dest derive from l_suppkey/l_partkey with a 1..19 offset so
    dest != origin always; departure = shipdate midnight + a 0..1439
    minute offset; duration 60..240 min. Times are BIGINT epoch-minutes
    (integer on both engines — no interval arithmetic to diverge on).
    No flight-id column on purpose: the synthetic lineitem has duplicate
    (orderkey, linenumber) pairs, so no derivable column is a key; rows
    ARE the flights. Still a zero-shuffle scan-fused projection.
    """
    li = load_table(spark, sf_dir, "lineitem")
    airport_arr = F.array(*[F.lit(a) for a in AIRPORTS])
    dep_min = (
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 60000000")
        + (F.col("l_orderkey") * 11 + F.col("l_linenumber") * 17) % 1440
    )
    duration = 60 + (F.col("l_partkey") * 3 % 7) * 30
    return li.select(
        F.element_at(
            airport_arr, (F.col("l_suppkey") % 20 + 1).cast("int")
        ).alias("origin"),
        F.element_at(
            airport_arr,
            (
                (F.col("l_suppkey") + 1 + F.col("l_partkey") % 19) % 20 + 1
            ).cast("int"),
        ).alias("dest"),
        dep_min.cast("bigint").alias("dep_min"),
        (dep_min + duration).cast("bigint").alias("arr_min"),
        F.when(F.col("l_orderkey") % 50 == 0, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("cancelled"),
        F.when(F.col("l_orderkey") % 97 == 3, F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("diverted"),
    )


def _airport_list_sql() -> str:
    return "[" + ", ".join(f"'{a}'" for a in AIRPORTS) + "]"


FLIGHTS_EXT_CTE = f"""
WITH flights_ext AS (
  SELECT
    ({_airport_list_sql()})[CAST(l_suppkey % 20 AS INT) + 1] AS origin,
    ({_airport_list_sql()})[
      CAST((l_suppkey + 1 + l_partkey % 19) % 20 AS INT) + 1] AS dest,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440 AS BIGINT)
      AS dep_min,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440
         + 60 + (l_partkey * 3 % 7) * 30 AS BIGINT) AS arr_min,
    CASE WHEN l_orderkey % 50 = 0 THEN 1.0 ELSE 0.0 END AS cancelled,
    CASE WHEN l_orderkey % 97 = 3 THEN 1.0 ELSE 0.0 END AS diverted
  FROM lineitem
)
"""
