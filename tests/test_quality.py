"""Injected-violation tests for the data-quality suite: the oracle
differential proves metric parity on CLEAN data (all fractions 0); these
prove each rule actually fires, with hand-computed values, on a corrupted
table."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.operators.quality import dq_metrics_orders_df


def _metrics(df) -> dict[str, float]:
    return {r["metric"]: r["value"] for r in df.collect()}


@pytest.fixture(scope="module")
def corrupted(spark):
    """8 clean rows + 2 bad ones (10 total, so fractions are exact tenths):
    one orphan custkey with a negative price, one duplicate orderkey with a
    bad status and out-of-range date."""
    rows = [
        (k, 100 + k % 4, 50.0 * (k + 1), datetime.date(1995, 1, k + 1), "F")
        for k in range(8)
    ]
    rows.append((90, 999, -5.0, datetime.date(1995, 2, 1), "O"))  # orphan, price<=0
    rows.append((0, 101, 10.0, datetime.date(2015, 1, 1), "X"))  # dup key, bad status+date
    orders = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderdate date, o_orderstatus string",
    )
    customer = spark.createDataFrame(
        [(100 + i,) for i in range(4)], "c_custkey long"
    )
    return _metrics(dq_metrics_orders_df(orders, customer))


def test_row_count_and_completeness(corrupted):
    assert corrupted["row_count"] == 10.0
    assert corrupted["orderkey_null_frac"] == 0.0
    assert corrupted["custkey_null_frac"] == 0.0


def test_uniqueness_catches_duplicate_key(corrupted):
    assert corrupted["orderkey_unique_ratio"] == 0.9  # 9 distinct / 10


def test_range_and_set_rules_fire(corrupted):
    assert corrupted["totalprice_nonpositive_frac"] == 0.1
    assert corrupted["orderdate_out_of_range_frac"] == 0.1
    assert corrupted["status_invalid_frac"] == 0.1


def test_referential_integrity_catches_orphan(corrupted):
    assert corrupted["custkey_orphan_frac"] == 0.1


def test_clean_testdata_has_zero_violations(spark, sf_smoke):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    got = _metrics(load_all()["dq_metrics_orders"].fn(spark, sf_smoke))
    assert got["orderkey_unique_ratio"] == 1.0
    for m in (
        "orderkey_null_frac",
        "custkey_null_frac",
        "totalprice_nonpositive_frac",
        "orderdate_out_of_range_frac",
        "status_invalid_frac",
        "custkey_orphan_frac",
    ):
        assert got[m] == 0.0, m


def test_single_pass_plan(spark, sf_smoke):
    """The whole metric suite must stay one scan of orders + one broadcast
    join — no second Exchange over the fact table beyond the distinct-key
    Expand's aggregation."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    plan = load_all()["dq_metrics_orders"].fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 1
    # each relation is scanned exactly once
    assert plan.count("orders.parquet") == 1
    assert plan.count("customer.parquet") == 1


def test_fingerprint_is_partitioning_invariant_and_sensitive(spark, sf_smoke):
    from hbase_hadoop_flightsearch_spark.operators.quality import (
        table_fingerprint_orders,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    orders = load_table(spark, sf_smoke, "orders")
    base = table_fingerprint_orders(orders).first()
    shuffled = table_fingerprint_orders(
        orders.repartition(7, "o_custkey")
    ).first()
    assert tuple(base) == tuple(shuffled)  # row order/layout must not matter

    # a one-cent change in one row must flip the fingerprint
    tweaked = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey")
            == orders.select(F.min("o_orderkey")).first()[0],
            F.col("o_totalprice") + 0.01,
        ).otherwise(F.col("o_totalprice")),
    )
    changed = table_fingerprint_orders(tweaked).first()
    assert changed["n"] == base["n"]
    assert changed["fp_xor"] != base["fp_xor"]
