"""Connection-search (reference-domain namesake) tests: the day-banded
equi join must equal a brute-force O(n^2) reference, and the extended
flights derivation must uphold its schedule invariants."""

from __future__ import annotations

import pandas as pd

from hbase_hadoop_flightsearch_spark.plans.delay_report import (
    MAX_LAYOVER_MIN,
    MIN_LAYOVER_MIN,
    flight_connection_search,
)
from hbase_hadoop_flightsearch_spark.sources.flights import flights_extended


def test_flights_extended_invariants(spark, sf_smoke):
    fl = flights_extended(spark, sf_smoke).toPandas()
    assert (fl["dest"] != fl["origin"]).all()  # offset-1..19 guarantee
    assert (fl["arr_min"] > fl["dep_min"]).all()
    assert ((fl["arr_min"] - fl["dep_min"]).between(60, 240)).all()


def test_connection_search_matches_bruteforce(spark, sf_smoke):
    """The banded plan must produce EXACTLY the brute-force all-pairs
    result — including connections whose layover window crosses
    midnight into the next day bucket (the case the 2-day explode
    exists for; the fixture is asserted to contain some)."""
    legs = flights_extended(spark, sf_smoke)
    legs = legs.filter((legs.cancelled == 0.0) & (legs.diverted == 0.0))
    pdf = legs.toPandas()
    m = pdf.merge(pdf, left_on="dest", right_on="origin", suffixes=("_a", "_b"))
    m = m[
        (m["dep_min_b"] >= m["arr_min_a"] + MIN_LAYOVER_MIN)
        & (m["dep_min_b"] <= m["arr_min_a"] + MAX_LAYOVER_MIN)
        & (m["dest_b"] != m["origin_a"])
    ]
    # the fixture must exercise the cross-midnight band
    crosses = (m["dep_min_b"] // 1440) != (
        (m["arr_min_a"] + MIN_LAYOVER_MIN) // 1440
    )
    assert crosses.any(), "fixture has no cross-midnight connection"
    want = (
        m.groupby(["origin_a", "dest_a", "dest_b"])
        .agg(
            n_itineraries=("origin_b", "size"),
            min_layover_min=(
                "dep_min_b",
                lambda s: (s - m.loc[s.index, "arr_min_a"]).min(),
            ),
        )
        .reset_index()
    )
    got = (
        flight_connection_search(spark, sf_smoke)
        .toPandas()
        .sort_values(["origin", "via", "final_dest"])
        .reset_index(drop=True)
    )
    want = want.sort_values(["origin_a", "dest_a", "dest_b"]).reset_index(
        drop=True
    )
    assert len(got) == len(want)
    assert (got["origin"].values == want["origin_a"].values).all()
    assert (got["via"].values == want["dest_a"].values).all()
    assert (got["final_dest"].values == want["dest_b"].values).all()
    assert (got["n_itineraries"].values == want["n_itineraries"].values).all()
    assert (
        got["min_layover_min"].values == want["min_layover_min"].values
    ).all()


def test_missed_connections_mass_balance(spark, sf_smoke):
    """flight_missed_connections classifies the SAME itinerary universe
    flight_connection_search counts: summed per-hub itineraries must
    equal the search's total, misses must be a proper subset, and every
    miss rate must be a floor-exact ppm of its hub's counts."""
    from hbase_hadoop_flightsearch_spark.plans.delay_report import (
        flight_connection_search,
        flight_missed_connections,
    )

    search_total = sum(
        r["n_itineraries"]
        for r in flight_connection_search(spark, sf_smoke).collect()
    )
    rows = flight_missed_connections(spark, sf_smoke).collect()
    assert sum(r["n_itineraries"] for r in rows) == search_total
    assert search_total > 0
    for r in rows:
        assert 0 <= r["n_missed"] <= r["n_itineraries"]
        assert r["missed_ppm"] == (r["n_missed"] * 1000000) // r[
            "n_itineraries"
        ]
    assert any(r["n_missed"] > 0 for r in rows), "delay never bit"


def _mega_hub_legs(spark):
    """Deterministic skewed fixture: ONE mega-hub over 3 days. 80% of
    all legs arrive at or depart from HUB, with departures spread
    uniformly over the minutes of each day — the hub-and-spoke shape
    whose (airport, day) band is the documented 100 TB hot spot."""
    spokes = [f"S{i:02d}" for i in range(10)]
    rows = []
    for i in range(2400):
        day = i % 3
        minute = (i * 37) % 1440  # uniform-ish coverage of the day
        dep = day * 1440 + minute
        arr = dep + 60 + (i * 13) % 120
        if i % 10 < 4:  # 40%: spoke -> HUB arrivals
            rows.append((spokes[i % 10], "HUB", dep, arr))
        elif i % 10 < 8:  # 40%: HUB -> spoke departures
            rows.append(("HUB", spokes[(i * 7) % 10], dep, arr))
        else:  # 20%: spoke -> spoke background
            rows.append((spokes[i % 10], spokes[(i % 10 + 3) % 10], dep, arr))
    return spark.createDataFrame(
        rows, "origin string, dest string, dep_min bigint, arr_min bigint"
    )


def test_hourband_equals_dayband_on_mega_hub(spark):
    """Cross-regime equivalence (VERDICT r9 #4): the hour-banded core
    must produce EXACTLY the day-banded core's pair set on a skewed
    one-mega-hub fixture — banding is an execution strategy, never a
    semantics change, at any band width."""
    from hbase_hadoop_flightsearch_spark.plans.delay_report import (
        _pairs_from_legs,
    )

    legs = _mega_hub_legs(spark)
    cols = [
        "origin", "dest", "dep_min", "arr_min",
        "b_origin", "b_dest", "b_dep_min", "b_arr_min",
    ]
    day = sorted(map(tuple, _pairs_from_legs(legs, 1440).select(cols).collect()))
    hour = sorted(map(tuple, _pairs_from_legs(legs, 60).select(cols).collect()))
    assert len(day) > 1000, "fixture produced too few pairs to be probative"
    assert day == hour


def test_hourband_bounds_mega_hub_partner_groups(spark):
    """The skew claim itself (VERDICT r9 #4): per-(airport, bucket)
    partner groups — the quantity that bounds the banded join's worst
    task — must shrink by ~the band ratio at the mega-hub. With HUB
    departures spread over each day, the hour band's hottest departure
    group and hottest candidate product (arrivals x departures meeting
    in one bucket) must both be far below the day band's."""
    import math

    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.plans.delay_report import (
        MAX_LAYOVER_MIN,
        MIN_LAYOVER_MIN,
    )

    legs = _mega_hub_legs(spark)

    def group_stats(band_min):
        dep = (
            legs.groupBy(
                F.col("origin").alias("ap"),
                F.expr(f"dep_min div {band_min}").alias("bkt"),
            )
            .agg(F.count(F.lit(1)).alias("n_dep"))
        )
        arr = (
            legs.withColumn(
                "bkt",
                F.explode(
                    F.sequence(
                        F.expr(f"(arr_min + {MIN_LAYOVER_MIN}) div {band_min}"),
                        F.expr(f"(arr_min + {MAX_LAYOVER_MIN}) div {band_min}"),
                    )
                ),
            )
            .groupBy(F.col("dest").alias("ap"), "bkt")
            .agg(F.count(F.lit(1)).alias("n_arr"))
        )
        joined = dep.join(arr, ["ap", "bkt"]).withColumn(
            "cand", F.col("n_dep") * F.col("n_arr")
        )
        row = joined.agg(
            F.max("n_dep").alias("max_dep"), F.max("cand").alias("max_cand")
        ).collect()[0]
        return row.max_dep, row.max_cand

    day_dep, day_cand = group_stats(1440)
    hour_dep, hour_cand = group_stats(60)
    # The hub's ~320 daily departures collapse into ~13-14/hour: the
    # per-bucket departure group must shrink by at least 16x (24x ideal,
    # slack for the fixture's stride pattern) ...
    assert day_dep >= 300, f"fixture not skewed enough (day max {day_dep})"
    assert hour_dep * 16 <= day_dep, (hour_dep, day_dep)
    # ... and the worst per-bucket candidate PRODUCT (what a task
    # actually evaluates) by at least 50x. Arrival-side replication
    # (<= 5 hour buckets vs <= 2 day buckets) is already inside these
    # numbers, so the bound is net of the banding price.
    assert hour_cand * 50 <= day_cand, (hour_cand, day_cand)
    # sanity on the replication factor argument in the docstring
    n_buckets = math.floor(MAX_LAYOVER_MIN / 60) - math.floor(
        MIN_LAYOVER_MIN / 60
    ) + 1
    assert n_buckets <= 5
