"""Bucketed co-located join (SCALE.md): pre-bucketing both fact tables on
the join key lets Catalyst plan the join with NO shuffle — at 100 TB this
is the difference between joining in place and moving both tables over the
network. Verified on the actual physical plan, not assumed.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    wh = str(tmp_path_factory.mktemp("warehouse"))
    for name, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        (
            load_table(spark, SF, name)
            .write.mode("overwrite")
            .bucketBy(N_BUCKETS, key)
            .sortBy(key)
            .option("path", f"{wh}/{name}_b")
            .saveAsTable(f"{name}_b")
        )
    yield
    for name in ("lineitem", "orders"):
        spark.sql(f"DROP TABLE IF EXISTS {name}_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    li = spark.table("lineitem_b")
    od = spark.table("orders_b")
    joined = li.join(
        od.hint("merge"), li.l_orderkey == od.o_orderkey
    ).groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # The join itself must read bucket-aligned inputs: no Exchange may
    # appear below the SortMergeJoin (the only exchange allowed is the
    # one for the final groupBy).
    join_part = plan.split("SortMergeJoin")[-1]
    assert "Exchange" not in join_part, (
        "bucketed join still shuffles:\n" + plan
    )
    # And it must still be correct.
    want = (
        load_table(spark, SF, "lineitem")
        .join(
            load_table(spark, SF, "orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, want.collect())
    )
