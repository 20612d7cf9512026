"""Count-min sketch accuracy contracts: never undercounts, bounded
overshoot, and heavy hitters survive the sketch."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.operators.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    countmin_estimates,
    _tokens,
)

SF = "/root/testdata/sf0.01"


def test_countmin_never_undercounts_and_top1_survives(spark):
    tokens = _tokens(spark, SF)
    exact = tokens.groupBy("token").agg(F.count(F.lit(1)).alias("exact"))
    est = countmin_estimates(tokens)
    both = {
        r["token"]: (r["est_count"], r["exact"])
        for r in est.join(exact, "token").collect()
    }
    assert both  # non-empty vocab
    n_total = sum(e for _, e in both.values())
    overshoots = []
    for tok, (e, x) in both.items():
        assert e >= x, f"count-min undercounted {tok}: {e} < {x}"
        overshoots.append(e - x)
    # With width w the EXPECTED collision mass per row is N/w; min over
    # d rows should keep typical overshoot well under one full row's
    # expectation. Assert a loose per-token bound and a tight median.
    assert max(overshoots) <= 2 * n_total / CMS_WIDTH
    overshoots.sort()
    assert overshoots[len(overshoots) // 2] <= n_total / CMS_WIDTH

    # Sanity on the constants the docstrings promise.
    assert CMS_DEPTH >= 2 and CMS_WIDTH >= 2


def test_countmin_heavy_hitter_survives_skew(spark):
    # The synthetic corpus is near-uniform (no true heavy hitter), so the
    # top-1 guarantee is tested where it actually holds: a skewed stream.
    # P(a filler collides with the hitter in ALL depth rows) ~ w^-d.
    rows = [("hh",)] * 1000 + [
        (f"w{i}",) for i in range(50) for _ in range(10)
    ]
    tokens = spark.createDataFrame(rows, "token string")
    est = {
        r["token"]: r["est_count"]
        for r in countmin_estimates(tokens).collect()
    }
    assert est["hh"] >= 1000
    est_top = max(est.items(), key=lambda kv: (kv[1], kv[0]))[0]
    assert est_top == "hh"


def test_countmin_registry_output_shape(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    df = load_all()["sketch_countmin_topk"].fn(spark, SF)
    rows = df.collect()
    assert 0 < len(rows) <= 10
    assert df.columns == ["token", "est_count"]
    # Descending by estimate, ties by token — deterministic output.
    ests = [r["est_count"] for r in rows]
    assert ests == sorted(ests, reverse=True)
