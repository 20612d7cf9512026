"""Physical-plan contracts (SCALE.md): the plan shapes that make these
queries scale are asserted, not just observed — a regression that turns a
broadcast join into a shuffle join or un-pushes a filter fails CI, not a
100 TB run.
"""

from __future__ import annotations

import pytest

from hbase_hadoop_flightsearch_spark.plans.registry import load_all

SF = "/root/testdata/sf0.01"


def _plan(spark, name: str) -> str:
    df = load_all()[name].fn(spark, SF)
    em = df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "extended"
    )
    return df._jdf.queryExecution().explainString(em)


def test_q5_joins_broadcast(spark):
    plan = _plan(spark, "join_q5_region_revenue")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # no dim join may degrade to SMJ


def test_q1_filter_pushed_to_scan(spark):
    plan = _plan(spark, "agg_q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual" in plan


def test_flagship_partial_aggregation(spark):
    plan = _plan(spark, "flight_delay_report")
    # Partial (map-side) aggregation before the exchange — the combiner the
    # reference lacks (SURVEY.md §4).
    assert "partial_avg" in plan
    assert "Join" not in plan  # single-table pipeline, no accidental joins


def test_knn_topk_below_exchange(spark):
    plan = _plan(spark, "similarity_knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan  # queries broadcast, corpus streams
    assert "WindowGroupLimit" in plan  # top-k pruned before the shuffle


def test_scan_prunes_columns(spark):
    plan = _plan(spark, "agg_q1_pricing_summary")
    # lineitem has 11 columns; q1 must read only the 7 it touches.
    read_schema = plan.split("ReadSchema: ")[1].split("\n")[0]
    assert "l_orderkey" not in read_schema
    assert "l_suppkey" not in read_schema


@pytest.mark.parametrize(
    "name", ["dedup_ngram_jaccard", "skew_salted_token_stats"]
)
def test_no_cartesian_products(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan
