"""Golden test for the flagship query's quirk semantics (FIXTURES.md §1).

Hand-computed expectations pin down every reference quirk:
  * floor(avg)+1 — exact-integer average 3.0 reports 4 (HCompute/Main.java:145)
  * empty carrier-month reports 0 (NaN->0, HCompute/Main.java:143-146)
  * cancelled/diverted rows excluded via float->int truncation (:118-120)
  * year != 2008 rows excluded (:109-111)
  * formatted line 'AIR-<carrier>' + leading ', ' (:151-161)
"""

from __future__ import annotations

from hbase_hadoop_flightsearch_spark.plans.delay_report import (
    delay_report_from,
    format_report,
)
from hbase_hadoop_flightsearch_spark.schemas import FLIGHTS_SCHEMA

ROWS = [
    # AA month 1: avg = (2+4)/2 = 3.0 exactly -> floor+1 = 4 (NOT 3)
    (2008, 1, 1, "AA", 2.0, 0.0, 0.0, ""),
    (2008, 1, 1, "AA", 4.0, 0.0, 0.0, ""),
    # AA month 2: avg = (3+4)/2 = 3.5 -> floor+1 = 4
    (2008, 1, 2, "AA", 3.0, 0.0, 0.0, ""),
    (2008, 1, 2, "AA", 4.0, 0.0, 0.0, ""),
    # AA month 3: only a cancelled and a diverted row -> empty -> 0
    (2008, 1, 3, "AA", 99.0, 1.0, 0.0, ""),
    (2008, 1, 3, "AA", 99.0, 0.0, 1.0, ""),
    # AA month 4: wrong year -> excluded -> 0
    (2007, 2, 4, "AA", 99.0, 0.0, 0.0, ""),
    # DL month 12: single row avg 0.0 -> floor+1 = 1
    (2008, 4, 12, "DL", 0.0, 0.0, 0.0, ""),
    # DL month 1: truncation quirk — cancelled=0.99 truncates to 0 => KEPT
    (2008, 1, 1, "DL", 10.0, 0.99, 0.0, ""),
]


def _make_flights(spark):
    return spark.createDataFrame(
        [r[:7] + (r[7],) for r in ROWS], schema=FLIGHTS_SCHEMA
    )


def test_flagship_quirks(spark):
    out = {
        r["carrier"]: r
        for r in delay_report_from(_make_flights(spark)).collect()
    }
    assert set(out) == {"AA", "DL"}
    aa, dl = out["AA"], out["DL"]
    assert aa["m1"] == 4  # integer average 3.0 -> 4
    assert aa["m2"] == 4  # 3.5 -> floor+1 = 4
    assert aa["m3"] == 0  # all rows cancelled/diverted -> empty -> 0
    assert aa["m4"] == 0  # wrong year -> empty -> 0
    assert all(aa[f"m{m}"] == 0 for m in range(5, 13))
    assert dl["m12"] == 1  # avg 0.0 -> 1
    assert dl["m1"] == 11  # 0.99-cancelled row kept; avg 10.0 -> 11


def test_formatted_output_exact(spark):
    lines = {
        r["report_key"]: r["report_line"]
        for r in format_report(
            delay_report_from(_make_flights(spark))
        ).collect()
    }
    assert lines["AIR-DL"] == (
        ", (1,11), (2,0), (3,0), (4,0), (5,0), (6,0), (7,0), (8,0), "
        "(9,0), (10,0), (11,0), (12,1)"
    )
    assert lines["AIR-AA"].startswith(", (1,4), (2,4), (3,0), (4,0)")
