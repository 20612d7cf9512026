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
