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
    assert df.columns == ["token", "exact_count", "est_count"]
    # Descending by exact count, ties by token — deterministic output —
    # and the CM hard invariant holds for every heavy hitter.
    counts = [r["exact_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["est_count"] >= r["exact_count"] for r in rows)


def _digest_rank_errors(spark, df, col, n_parts: int):
    """Max |rank(est) - target rank| over DIGEST_QS, plus N."""
    import numpy as np

    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        DIGEST_QS,
        quantile_digest_centroids,
        quantile_digest_estimates,
    )

    exact = np.sort(
        np.array([r[col] for r in df.select(col).collect()], dtype="float64")
    )
    n = len(exact)
    ests = {
        r["q"]: r["est"]
        for r in quantile_digest_estimates(
            quantile_digest_centroids(df.repartition(n_parts), col)
        ).collect()
    }
    errs = {}
    for q in DIGEST_QS:
        rank = np.searchsorted(exact, ests[q])
        errs[q] = abs(rank - q * (n - 1))
    return errs, n


def test_quantile_digest_rank_error_bound(spark, sf_correctness):
    from hbase_hadoop_flightsearch_spark.operators.sketches import DIGEST_K
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    orders = load_table(spark, sf_correctness, "orders")
    for parts in (1, 8):
        errs, n = _digest_rank_errors(spark, orders, "o_totalprice", parts)
        # ~2 batches/partition at sf0.01 -> bound 2*N/K plus interp slack;
        # partition-count invariance = the bound holds at BOTH layouts.
        bound = 2 * n / DIGEST_K + 8
        for q, e in errs.items():
            assert e <= bound, (parts, q, e, bound)


def test_quantile_digest_exact_when_uncompressed(spark):
    """With fewer rows than K the digest holds every value — estimates
    must interpolate the exact empirical quantiles."""
    import numpy as np

    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        quantile_digest_centroids,
        quantile_digest_estimates,
    )

    vals = [float(v) for v in range(101)]  # 0..100
    df = spark.createDataFrame([(v,) for v in vals], "x double").coalesce(1)
    got = {
        r["q"]: r["est"]
        for r in quantile_digest_estimates(
            quantile_digest_centroids(df, "x")
        ).collect()
    }
    for q, est in got.items():
        assert abs(est - np.quantile(np.array(vals), q)) < 1e-6, (q, est)


def test_misra_gries_flags_hold_under_any_partitioning(spark):
    """A 40%-frequency hot token must appear in the heavy set with all
    invariant flags true regardless of how the stream is batched — MG's
    survival guarantee is partitioning-independent. Sweep several
    repartitionings of a skewed fixture."""
    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        MG_K,
        misra_gries_partials,
    )
    from pyspark.sql import functions as F

    rows = [("hot",)] * 400 + [(f"t{i % 60}",) for i in range(600)]
    tokens = spark.createDataFrame(rows, "token string")
    for parts in (1, 3, 13):
        t = tokens.repartition(parts)
        merged = (
            misra_gries_partials(t).groupBy("token").agg(
                F.sum("est").alias("est")
            )
        )
        got = {r.token: r.est for r in merged.collect()}
        # survival + undercount bound for the guaranteed-heavy token
        assert "hot" in got
        assert got["hot"] <= 400
        assert 400 - got["hot"] <= 1000 / (MG_K + 1)


def test_pinned_digest_estimates_satisfy_rank_bound(spark, sf_correctness):
    """The r9 registered digest pins its layout (md5 shards) to earn a
    full value oracle; the estimates must still be DIGEST-quality, not
    just replayable. Re-rank each estimate against the data: with
    DIGEST_SHARDS shards of <= ceil(n_s * 1.0 / K)-row chunks the total
    rank error is bounded by n/K + shards (+ interpolation slack)."""
    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        DIGEST_K,
        DIGEST_SHARDS,
        sketch_quantile_digest,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    ests = {
        r["q"]: r["est"]
        for r in sketch_quantile_digest(spark, sf_correctness).collect()
    }
    prices = sorted(
        r["o_totalprice"]
        for r in load_table(spark, sf_correctness, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(prices)
    assert len(ests) == 5
    for q, est in ests.items():
        rank = sum(1 for p in prices if p < est)
        bound = 2.0 * n / DIGEST_K + DIGEST_SHARDS + 8
        assert abs(rank - q * (n - 1)) <= bound, (q, rank, q * (n - 1))


def test_pinned_digest_is_partitioning_invariant(spark, sf_correctness):
    """The pinned layout is a pure function of o_orderkey, so the result
    must not depend on how the scan is partitioned (the property the
    arbitrary-Arrow-batch library path can only promise up to the rank
    bound, the pinned path promises exactly)."""
    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        sketch_quantile_digest,
    )

    base = sorted(
        map(tuple, sketch_quantile_digest(spark, sf_correctness).collect())
    )
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = sorted(
            map(
                tuple, sketch_quantile_digest(spark, sf_correctness).collect()
            )
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_merged_digest_estimates_satisfy_rank_bound(spark, sf_correctness):
    """incremental_digest_merge concatenates per-snapshot centroid sets
    before the finish; the merged estimates must stay digest-quality
    against the exact quantiles (the mergeable-sketch guarantee — same
    bound class as the one-shot pinned digest, with one extra shard
    level)."""
    from hbase_hadoop_flightsearch_spark.operators.incremental import (
        incremental_digest_merge,
    )
    from hbase_hadoop_flightsearch_spark.operators.sketches import (
        DIGEST_K,
        DIGEST_SHARDS,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    ests = {
        r["q"]: r["est"]
        for r in incremental_digest_merge(spark, sf_correctness).collect()
    }
    prices = sorted(
        r["o_totalprice"]
        for r in load_table(spark, sf_correctness, "orders")
        .select("o_totalprice")
        .collect()
    )
    n = len(prices)
    assert len(ests) == 5
    for q, est in ests.items():
        rank = sum(1 for p in prices if p < est)
        bound = 2.0 * n / DIGEST_K + 2 * DIGEST_SHARDS + 8
        assert abs(rank - q * (n - 1)) <= bound, (q, rank, q * (n - 1))
