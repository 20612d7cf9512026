"""As-of join: the window-union implementation (registered, DuckDB-ASOF-
oracled) and the cogrouped merge_asof implementation must agree row-for-row
— two independent formulations of the same operator."""

from __future__ import annotations

from hbase_hadoop_flightsearch_spark.operators.asof import (
    asof_join_events_orders,
    asof_merge_pandas,
)


def test_asof_implementations_agree(spark, sf_correctness):
    window_impl = sorted(
        map(tuple, asof_join_events_orders(spark, sf_correctness).collect())
    )
    cogroup_impl = sorted(
        map(tuple, asof_merge_pandas(spark, sf_correctness).collect())
    )
    assert window_impl, "as-of join returned nothing"
    assert window_impl == cogroup_impl
    # At this SF every event has a prior order (orders start years before
    # events), so matches must be total — a regression to "no match found"
    # (all NULL) would still satisfy pure agreement, this catches it.
    assert all(r[3] is not None for r in window_impl)


def test_forward_asof_strict_after_and_nonempty(spark, sf_correctness):
    """Strict-'<' boundary: a purchase at the SAME microsecond as a view
    must NOT be its next-purchase; a later one must. And on the corpus,
    matches must be substantially present (non-degenerate)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.operators.asof import (
        asof_join_forward_next_purchase,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    t1 = dt.datetime(2024, 1, 1, 12, 30, 0)
    fixture = spark.createDataFrame(
        [
            (1, t0, 7, "view", 1.0),      # left event
            (2, t0, 7, "purchase", 1.0),  # same instant: must NOT match
            (3, t1, 7, "purchase", 1.0),  # later: must match
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        fixture.write.parquet(f"{d}/events.parquet")
        (row,) = asof_join_forward_next_purchase(spark, d).collect()
    assert row.event_id == 1
    assert row.next_purchase_id == 3
    assert row.us_to_purchase == 30 * 60 * 1_000_000

    out = asof_join_forward_next_purchase(spark, sf_correctness)
    n = out.count()
    matched = out.filter(F.col("next_purchase_id").isNotNull()).count()
    assert n > 0 and matched / n > 0.5  # non-degenerate on the corpus


def test_nearest_asof_tie_breaks_backward(spark, tmp_path):
    """direction='nearest' contract: equidistant purchases resolve to
    the BACKWARD one; an event before any purchase matches forward; an
    event after the last purchase matches backward."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.asof import (
        asof_join_nearest_purchase,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    S = dt.timedelta(seconds=1)
    rows = [
        # user 1: purchases at t=10 and t=30; view at t=20 equidistant
        (100, base + 10 * S, 1, "purchase", 1.0, "{}"),
        (101, base + 30 * S, 1, "purchase", 1.0, "{}"),
        (102, base + 20 * S, 1, "view", 1.0, "{}"),
        # ... view at t=5: only-forward case (before first purchase)
        (103, base + 5 * S, 1, "view", 1.0, "{}"),
        # ... view at t=31: nearest is the t=30 purchase (backward, 1s)
        (104, base + 31 * S, 1, "view", 1.0, "{}"),
        # user 2: no purchases at all -> NULL match
        (200, base, 2, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_id: r
        for r in asof_join_nearest_purchase(spark, str(tmp_path)).collect()
    }
    assert got[102].nearest_purchase_id == 100  # tie -> backward
    assert got[102].signed_us_to_purchase == -10_000_000
    assert got[103].nearest_purchase_id == 100  # forward-only
    assert got[103].signed_us_to_purchase == 5_000_000
    assert got[104].nearest_purchase_id == 101  # backward wins 1s vs none
    assert got[104].signed_us_to_purchase == -1_000_000
    assert got[200].nearest_purchase_id is None
    assert got[200].signed_us_to_purchase is None
