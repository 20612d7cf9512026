"""Incremental-maintenance invariants beyond the oracle (which proves
incremental == full recompute): merge associativity over many slices and
state-shape stability."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.operators.incremental import (
    finalize_state,
    group_state,
    merge_states,
)
from hbase_hadoop_flightsearch_spark.sources.catalog import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_is_associative_over_monthly_slices(spark, sf_smoke):
    """Folding 12+ monthly states one at a time must equal the one-shot
    state — the property that lets a pipeline refresh any cadence."""
    orders = load_table(spark, sf_smoke, "orders")
    months = [
        r["m"]
        for r in orders.select(F.date_trunc("month", "o_orderdate").alias("m"))
        .distinct()
        .collect()
    ]
    slices = [
        group_state(
            orders.filter(F.date_trunc("month", "o_orderdate") == m)
        )
        for m in sorted(months)
    ]
    folded = reduce(merge_states, slices)
    assert _rows(finalize_state(folded)) == _rows(
        finalize_state(group_state(orders))
    )


def test_merge_handles_one_sided_groups(spark):
    a = spark.createDataFrame(
        [("X", 10.0), ("X", 20.0)],
        "o_orderpriority string, o_totalprice double",
    )
    b = spark.createDataFrame(
        [("Y", 5.0)], "o_orderpriority string, o_totalprice double"
    )
    got = _rows(finalize_state(merge_states(group_state(a), group_state(b))))
    assert got == [
        ("X", 2, 30.0, 15.0, 10.0, 20.0),
        ("Y", 1, 5.0, 5.0, 5.0, 5.0),
    ]


def test_ohlc_merge_order_invariant_over_weekly_slices(spark, sf_smoke):
    """Fold weekly OHLC states forward and REVERSED: both must equal the
    one-shot bars — struct-min/max open/close is associative AND
    commutative, which is exactly what bare first()/last() would break."""
    from functools import reduce

    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.operators.incremental import (
        finalize_ohlc,
        merge_ohlc_states,
        ohlc_state,
    )
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        resample_ohlc,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    events = load_table(spark, sf_smoke, "events")
    slices = [
        ohlc_state(
            events.filter(F.weekofyear("ts") % 4 == w)
        )
        for w in range(4)
    ]
    rows = lambda df: sorted(map(tuple, df.collect()))
    want = rows(resample_ohlc(events))
    fwd = rows(finalize_ohlc(reduce(merge_ohlc_states, slices)))
    rev = rows(finalize_ohlc(reduce(merge_ohlc_states, reversed(slices))))
    assert fwd == want and rev == want


def test_bitmap_state_fold_is_associative_and_idempotent(spark, sf_smoke):
    """Bitmap distinct states must merge identically regardless of slice
    grouping, and re-merging a slice (replay) must not change counts —
    the properties that make the state safe for incremental pipelines."""
    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    orders = load_table(spark, sf_smoke, "orders")
    states = (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            (F.col("o_custkey") / 64).cast("long").alias("w"),
            F.expr("shiftleft(1L, CAST(pmod(o_custkey, 64) AS INT))").alias(
                "b"
            ),
        )
        .groupBy("yr", "w")
        .agg(F.expr("bit_or(b)").alias("bits"))
        .cache()
    )

    def count_of(df):
        return (
            df.groupBy("w")
            .agg(F.expr("bit_or(bits)").alias("bits"))
            .agg(F.sum(F.bit_count("bits")))
            .first()[0]
        )

    all_at_once = count_of(states)
    years = sorted(r["yr"] for r in states.select("yr").distinct().collect())
    mid = years[len(years) // 2]
    left = states.filter(F.col("yr") <= mid)
    right = states.filter(F.col("yr") > mid)
    # merge-of-merges: fold each half to one bitmap, then fold the union
    half_states = (
        left.groupBy("w").agg(F.expr("bit_or(bits)").alias("bits"))
    ).unionByName(
        right.groupBy("w").agg(F.expr("bit_or(bits)").alias("bits"))
    )
    assert count_of(half_states) == all_at_once
    # replay a slice: duplicate one year's states, counts unchanged
    replay = states.unionByName(states.filter(F.col("yr") == years[0]))
    assert count_of(replay) == all_at_once


def test_countmin_merge_equals_oneshot_grid(spark, sf_correctness):
    """CMS linearity: the shard-merged estimates must EQUAL the one-shot
    global grid's estimates token for token."""
    from hbase_hadoop_flightsearch_spark.operators.incremental import (
        incremental_countmin_merge,
    )
    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        sketch_countmin_topk,
    )

    merged = {
        r["token"]: r["est_merged"]
        for r in incremental_countmin_merge(spark, sf_correctness).collect()
    }
    oneshot = {
        r["token"]: r["est_count"]
        for r in sketch_countmin_topk(spark, sf_correctness).collect()
    }
    assert merged.keys() == oneshot.keys()
    assert merged == oneshot
