"""Time-series operators: the branches the (dense) driver corpus cannot
exercise — gap-fill zero rows and session splits at exact gap boundaries."""

from __future__ import annotations

import datetime as dt

from hbase_hadoop_flightsearch_spark.operators.timeseries import (
    SESSION_GAP_US,
    gapfill_daily,
)


def _ts(day: int, hour: int = 0, minute: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, minute)


def test_gapfill_inserts_zero_days(spark):
    """Events on Jan 1 and Jan 4 only: the spine must surface Jan 2/3 as
    explicit (0, 0.0) rows — the whole point of gap-fill."""
    events = spark.createDataFrame(
        [(1, _ts(1), 10.0), (2, _ts(1, 5), 2.5), (3, _ts(4), 1.25)],
        "event_id bigint, ts timestamp, value double",
    )
    rows = {r.day.isoformat(): (r.n_events, r.total_value)
            for r in gapfill_daily(events).collect()}
    assert rows == {
        "2024-01-01": (2, 12.5),
        "2024-01-02": (0, 0.0),
        "2024-01-03": (0, 0.0),
        "2024-01-04": (1, 1.25),
    }


def test_session_gap_boundary_is_exclusive(spark):
    """A follow-up event at EXACTLY the 30-minute gap stays in the same
    session (> threshold splits, == does not) — pin the boundary semantics
    so engine and oracle can't drift."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        sessionize_lag,
    )

    assert SESSION_GAP_US == 30 * 60 * 1_000_000
    events = spark.createDataFrame(
        [
            (1, 7, _ts(1, 9, 0)),
            (2, 7, _ts(1, 9, 30)),   # == gap -> same session
            (3, 7, _ts(1, 10, 1)),   # 31 min -> new session
        ],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    got = {
        r.event_id: r.session_seq for r in sessionize_lag(events).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_scd2_intervals_are_contiguous_and_collapsed(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    rows = (
        load_all()["scd2_priority_history"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r["o_custkey"], []).append(r)
    assert by_cust
    for cust, spans in by_cust.items():
        spans.sort(key=lambda r: r["valid_from"])
        # exactly one open (current) interval, and it's the last one
        currents = [r for r in spans if r["is_current"] == 1]
        assert len(currents) == 1 and currents[0] is spans[-1], cust
        for a, b in zip(spans, spans[1:]):
            assert a["valid_to"] == b["valid_from"], cust  # half-open chain
            assert a["priority"] != b["priority"], cust  # truly collapsed
        assert spans[-1]["valid_to"] is None


def test_funnel_requires_step_order(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all  # noqa: F401
    from pyspark.sql import functions as F, Window

    # user 1: full ordered funnel; user 2: view BEFORE signup (step 2 must
    # not count); user 3: signup only
    rows = [
        (1, "signup", 100), (1, "view", 200), (1, "purchase", 300),
        (2, "view", 100), (2, "signup", 200), (2, "purchase", 300),
        (3, "signup", 100),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, t long")
    ev = ev.select("user_id", "event_type", F.timestamp_seconds("t").alias("ts"))

    w = Window.partitionBy("user_id")
    t, ts = F.col("event_type"), F.col("ts")
    df = ev.withColumn("s_ts", F.min(F.when(t == "signup", ts)).over(w))
    df = df.withColumn(
        "v_ts", F.min(F.when((t == "view") & (ts > F.col("s_ts")), ts)).over(w)
    )
    df = df.withColumn(
        "p_ts",
        F.min(F.when((t == "purchase") & (ts > F.col("v_ts")), ts)).over(w),
    )
    got = (
        df.groupBy("user_id")
        .agg(F.max("s_ts").alias("s"), F.max("v_ts").alias("v"), F.max("p_ts").alias("p"))
        .agg(F.count("s").alias("a"), F.count("v").alias("b"), F.count("p").alias("c"))
        .first()
    )
    assert (got["a"], got["b"], got["c"]) == (3, 1, 1)


def test_funnel_plan_shares_one_user_exchange(spark, sf_smoke):
    """All three funnel steps must ride ONE Exchange(user_id); the only
    other exchange is the O(1)-row final SinglePartition agg."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    plan = (
        load_all()["events_funnel_conversion"]
        .fn(spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 3
    assert plan.count("Exchange") == 2
    assert plan.count("Exchange SinglePartition") == 1


def test_anomaly_zscore_flags_spike_not_baseline(spark):
    """A flat 10.00 baseline then a 100.00 spike: with variance 0 the
    exact-integer test ((n*x-S)^2*(n-1) > 9*n*(n*Q-S^2)) reduces to
    'any deviation flags' — and only the spike may flag, never the
    baseline rows (each sees a constant trailing window)."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        anomaly_zscore,
    )

    rows = [(i, _ts(1, 0, i), 7, "click", 10.0) for i in range(1, 16)]
    rows.append((16, _ts(1, 0, 16), 7, "click", 100.0))
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    out = anomaly_zscore(events).collect()
    assert [(r.event_id, r.value) for r in out] == [(16, 100.0)]
    assert out[0].baseline_n == 15


def test_anomaly_zscore_needs_min_baseline(spark):
    """Fewer than ZSCORE_MIN_N trailing rows => never flagged, however
    extreme the value — cold-start rows are not judged."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        ZSCORE_MIN_N,
        anomaly_zscore,
    )

    n = ZSCORE_MIN_N - 1  # one short of the floor
    rows = [(i, _ts(1, 0, i), 7, "click", 10.0) for i in range(1, n + 1)]
    rows.append((99, _ts(1, 0, 59), 7, "click", 10_000.0))
    events = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    assert anomaly_zscore(events).count() == 0


def test_ohlc_open_close_tie_broken_by_event_id(spark):
    """Two events at the IDENTICAL timestamp: (ts, event_id) struct
    ordering must pick the lower id as open and the higher as close —
    the tie-break that keeps both engines deterministic."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        resample_ohlc,
    )

    t = _ts(1, 9, 30)
    events = spark.createDataFrame(
        [(2, t, 1, "click", 50.0), (1, t, 1, "click", 20.0),
         (3, _ts(1, 9, 45), 1, "click", 5.0)],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double",
    )
    (bar,) = resample_ohlc(events).collect()
    assert bar.open_value == 20.0  # event_id 1 wins the tie
    assert bar.close_value == 5.0
    assert bar.high_value == 50.0 and bar.low_value == 5.0
    assert bar.n_events == 3 and bar.total_value == 75.0


def test_interval_overlap_hand_computed_and_no_nested_loop(spark):
    """Users 1/2 overlap 10:00-10:40 vs 10:30-11:10 (overlap 10 min);
    user 3 is disjoint. Zero-length touch: user 4 starts exactly when
    user 1 ends => overlap_us == 0 still pairs (closed intervals).
    The physical plan must contain NO nested-loop join — the bin rewrite
    exists to avoid exactly that."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        interval_overlap_sessions,
    )

    rows = [
        # user 1: 10:00 - 10:40 (20-min steps stay under the 30-min gap)
        (1, _ts(1, 10, 0), 1), (2, _ts(1, 10, 20), 1), (9, _ts(1, 10, 40), 1),
        # user 2: 10:30 - 11:10  (overlaps user 1 by 10 min)
        (3, _ts(1, 10, 30), 2), (10, _ts(1, 10, 50), 2), (4, _ts(1, 11, 10), 2),
        # user 3: 14:00 - 14:20  (disjoint)
        (5, _ts(1, 14, 0), 3), (6, _ts(1, 14, 20), 3),
        # user 4: 10:40 - 10:55  (touches user 1's end exactly)
        (7, _ts(1, 10, 40), 4), (8, _ts(1, 10, 55), 4),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint"
    )
    out = interval_overlap_sessions(events)
    got = {
        (r.a_user, r.b_user): r.overlap_us for r in out.collect()
    }
    assert got == {
        (1, 2): 10 * 60 * 1_000_000,
        (1, 4): 0,
        (2, 4): 15 * 60 * 1_000_000,
    }
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan


def test_ewma_bounded_and_warm_start(spark, sf_smoke):
    """EWMA must stay within each row's trailing-window [min, max] (a
    convex combination of window values) and equal value/1 exactly on
    each user's first row (warm start: single-element window)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        EWMA_WINDOW,
        ts_ewma_cents,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    ev = load_table(spark, sf_smoke, "events")
    got = ts_ewma_cents(spark, sf_smoke)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    wf = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ref = ev.select(
        "user_id",
        "event_id",
        "value",
        F.min("value").over(w).alias("wmin"),
        F.max("value").over(w).alias("wmax"),
        F.row_number().over(wf).alias("rn"),
    )
    joined = got.join(ref, ["user_id", "event_id"]).collect()
    assert joined
    for r in joined:
        assert r.wmin - 1e-6 <= r.ewma <= r.wmax + 1e-6, r
        if r.rn == 1:  # warm start: ewma == the value itself (cents-exact)
            assert abs(r.ewma - round(r.value * 100) / 100) < 1e-9, r


def test_metric_contribution_zero_net_delta_fallback(spark, tmp_path):
    """ADVICE r6: when period deltas exactly cancel (net total_delta = 0)
    the share denominator must fall back to SUM(|delta|) — gross-movement
    shares — instead of degrading every share to NULL. NULL remains only
    when nothing moved at all."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        events_metric_contribution,
    )

    a = dt.datetime(2024, 1, 10)
    b = dt.datetime(2024, 1, 20)
    rows = [
        # type 'up': A=100, B=200 -> delta +100_00 cents
        (1, a, 1, "up", 100.0, "{}"),
        (2, b, 1, "up", 200.0, "{}"),
        # type 'down': A=200, B=100 -> delta -100_00 cents (net cancels)
        (3, a, 2, "down", 200.0, "{}"),
        (4, b, 2, "down", 100.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r.share_of_total_delta
        for r in events_metric_contribution(spark, str(tmp_path)).collect()
    }
    # gross movement = 200_00 cents; shares are +-0.5, not NULL
    assert got == {"up": 0.5, "down": -0.5}


def test_holt_winters_fits_pure_seasonal_exactly(spark, tmp_path):
    """A zero-trend, perfectly weekly-periodic daily series is a fixed
    point of additive Holt-Winters: after initialization, fitted == y,
    residuals are exactly 0, and trend stays exactly 0 — a strong exact
    check of the whole state recursion. A too-short series (< 2 seasons
    + 1) must produce no rows."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        ts_holt_winters_additive,
    )

    pattern = [10, 20, 30, 40, 50, 60, 70]  # mean 40, repeats exactly
    rows = []
    eid = 0
    for day in range(28):  # 4 exact seasons
        n_events = pattern[day % 7]
        for k in range(n_events):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 3, 1 + day, 8, k // 60, k % 60),
                    k,
                    "periodic",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    # second series too short to initialize: only 5 days
    for day in range(5):
        rows.append(
            (eid + day, dt.datetime(2024, 3, 1 + day, 9, 0, 0),
             99, "short", 1.0, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = ts_holt_winters_additive(spark, str(tmp_path)).collect()
    # NOTE: the day spine is global, so 'short' gets zero-filled days up
    # to the 28-day range — its trajectory exists but is dominated by
    # zeros; the 'periodic' series is the exactness probe.
    per = [r for r in out if r.event_type == "periodic"]
    assert len(per) == 28 - 7
    for r in per:
        assert r.resid_micro == 0, r
        assert r.trend_micro == 0, r
        assert r.fitted_micro == r.y * 1_000_000, r


def test_sliding_median_known_series(spark, tmp_path):
    """Hand-checked medians on a 4-day series, covering odd and even
    warmup frames (even frames report distinct lo/hi middles)."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.windows import (
        window_sliding_median_exact,
    )

    # daily totals: 30.00, 10.00, 20.00, 40.00
    rows = [
        (i, i, "O", v, dt.datetime(2024, 1, 1 + i), "5-LOW")
        for i, v in enumerate([30.0, 10.0, 20.0, 40.0])
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.d.day: r
        for r in window_sliding_median_exact(spark, str(tmp_path)).collect()
    }
    assert (got[1].median_lo_cents, got[1].median_hi_cents) == (3000, 3000)
    assert (got[2].median_lo_cents, got[2].median_hi_cents) == (1000, 3000)
    assert (got[3].median_lo_cents, got[3].median_hi_cents) == (2000, 2000)
    assert (got[4].median_lo_cents, got[4].median_hi_cents) == (2000, 3000)


def test_theil_sen_ignores_outliers_where_ols_cannot(spark, tmp_path):
    """A clean slope of +2/day with two wild outlier days: Theil-Sen
    must still report exactly +2 (2_000_000 micro) while the planted
    contamination would drag any mean-based estimate; an even
    slope-count series must also return a row (low-median selection)."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        ts_theil_sen_trend,
    )

    rows = []
    eid = 0
    for day in range(15):
        y = 10 + 2 * day
        if day in (5, 11):
            y = 500  # wild outliers
        for k in range(y):
            rows.append(
                (eid, dt.datetime(2024, 5, 1 + day, 8, k // 60, k % 60),
                 7, "trend", 1.0, "{}")
            )
            eid += 1
    # second series with FOUR days -> C(4,2)=6 slopes (even count)
    for day in range(4):
        for k in range(5 + day):
            rows.append(
                (eid, dt.datetime(2024, 5, 1 + day, 9, 0, k),
                 8, "even", 1.0, "{}")
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.event_type: r for r in ts_theil_sen_trend(spark, str(tmp_path)).collect()}
    assert got["trend"].theil_sen_slope_micro == 2_000_000
    assert got["trend"].n_slopes == 15 * 14 // 2
    assert got["even"].n_slopes == 6  # even count still yields a median row
    assert got["even"].theil_sen_slope_micro == 1_000_000  # slope +1/day


def test_ljung_box_consistent_with_acf_and_periodic_series(spark, sf_smoke):
    """Q recomputed in Python from ts_acf_lags' published 6dp
    autocorrelations must equal ts_ljung_box's q_lb_r6 exactly, and the
    strongly weekday-seasonal event series must reject white noise."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        LB_CHI2_95_M7,
        ts_acf_lags,
        ts_ljung_box,
    )

    acf = {r["lag"]: r["acf_r6"] for r in ts_acf_lags(spark, sf_smoke).collect()}
    row = ts_ljung_box(spark, sf_smoke).collect()[0]
    n = row["n"]
    q = round(
        float(n) * (float(n) + 2.0)
        * sum(acf[k] * acf[k] / (float(n) - float(k)) for k in range(1, 8)),
        6,
    )
    assert abs(q - row["q_lb_r6"]) < 1e-9
    assert row["reject_white_noise_05"] == (row["q_lb_r6"] > LB_CHI2_95_M7)
    assert row["m"] == 7


def test_cuped_planted_covariate_reduces_variance(spark):
    """Plant y = x + arm-lift + small per-user wiggle: theta must land
    near 1, the variance-reduction factor near 1, and the CUPED-adjusted
    arm difference must recover the planted lift more tightly than the
    raw difference."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS
    from pyspark.sql import functions as F

    # md5-split arms the operator itself computes; recover them here to
    # plant the lift on the treatment side.
    def arm_of(uid: int) -> str:
        import hashlib

        h = int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16)
        return "control" if h % 2 == 0 else "treatment"

    rows = []
    eid = 0
    for uid in range(40):
        base = 50 + (uid % 7) * 30  # per-user covariate level
        lift = 25 if arm_of(uid) == "treatment" else 0
        wiggle = (uid * 13) % 5
        # pre-period event (Jan 5) carries x; post (Jan 25) carries y.
        rows.append(
            (eid, datetime.datetime(2024, 1, 5), uid, "purchase",
             float(base), "{}")
        )
        eid += 1
        rows.append(
            (eid, datetime.datetime(2024, 1, 25), uid, "purchase",
             float(base + lift + wiggle), "{}")
        )
        eid += 1
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: events
        out = {
            r["arm"]: r
            for r in TS.events_cuped_adjustment(spark, "ignored").collect()
        }
    finally:
        TS.load_table = orig

    t, c = out["treatment"], out["control"]
    assert abs(t["theta_r6"] - 1.0) < 0.05
    assert t["var_reduction_r6"] > 0.9
    adj_diff = t["mean_y_cuped_r6"] - c["mean_y_cuped_r6"]
    # planted lift is 2500 cents; wiggle is +-500 cents-scale noise that
    # CUPED strips because it's uncorrelated with x only weakly — the
    # adjusted difference must sit within one wiggle of the truth.
    assert abs(adj_diff - 2500) < 500


def _patched_events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_msprt_null_vs_planted_lift(spark):
    """Identical per-user values in both arms -> delta 0, Lambda at its
    sqrt-prior floor, never rejects; a massive planted lift -> Lambda
    explodes and the always-valid p rejects."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    def arm_of(uid: int) -> int:
        import hashlib

        return int(hashlib.md5(str(uid).encode()).hexdigest()[:4], 16) % 2

    ts0 = datetime.datetime(2024, 1, 10)
    base = [
        (uid, ts0, uid, "purchase", 100.0 + (uid % 9), "{}")
        for uid in range(60)
    ]
    lifted = [
        (uid, ts0, uid, "purchase",
         100.0 + (uid % 9) + (500.0 if arm_of(uid) else 0.0), "{}")
        for uid in range(60)
    ]
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: _patched_events(spark, base)
        null_row = TS.events_msprt_sequential(spark, "x").collect()[0]
        TS.load_table = lambda _s, _d, _t: _patched_events(spark, lifted)
        lift_row = TS.events_msprt_sequential(spark, "x").collect()[0]
    finally:
        TS.load_table = orig

    assert not null_row["reject_05"]
    assert null_row["always_valid_p_r6"] > 0.5
    assert lift_row["reject_05"]
    assert lift_row["always_valid_p_r6"] < 0.05
    assert lift_row["mixture_lr_r6"] > null_row["mixture_lr_r6"]


def test_bollinger_flags_planted_spike(spark):
    """A flat daily series with one 10x spike day: only the spike day
    (and no flat day) may sit outside the 2-sigma band."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    rows = []
    eid = 0
    for d in range(20):
        n = 50 if d != 14 else 500
        for i in range(n):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1 + d, 12, 0, i % 60),
                 i, "view", 1.0, "{}")
            )
            eid += 1
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: _patched_events(spark, rows)
        out = TS.ts_bollinger_bands(spark, "x").collect()
    finally:
        TS.load_table = orig
    flagged = {r["day"].day for r in out if r["outside_2sigma"]}
    assert 15 in flagged  # Jan 15 is the spike (d=14)
    # flat days inside a flat window never flag
    assert all(day == 15 or day in range(16, 22) for day in flagged)


def test_croston_constant_demand_fixed_point(spark):
    """Constant demand (qty 5 every 2 days) is a fixed point: size and
    interval EWMAs never move off 5e6 / 2e6... except the interval
    starts at the 1-day default and converges upward; after many steps
    the forecast must approach 5/2 qty/day * 1e6 = 2.5e6 micro from
    above. A spiky outlier series must end with size above the median
    demand."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    rows = []
    base = datetime.date(1995, 1, 1)
    # part 0: qty 5 every 2 days, 40 occurrences
    for k in range(40):
        rows.append((0, 10, base + datetime.timedelta(days=2 * k), 5.0))
    orders = spark.createDataFrame(
        [(i, rows[i][2]) for i in range(len(rows))],
        "o_orderkey long, o_orderdate date",
    )
    li = spark.createDataFrame(
        [(i, rows[i][0] * TS.CROSTON_PART_MOD, rows[i][3])
         for i in range(len(rows))],
        "l_orderkey long, l_partkey long, l_quantity double",
    )
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, t: {"lineitem": li, "orders": orders}[t]
        out = {r["partkey"]: r
               for r in TS.ts_croston_intermittent(spark, "x").collect()}
    finally:
        TS.load_table = orig
    r = out[0]
    assert r["n_demands"] == 40
    assert r["size_micro"] == 5 * TS.CROSTON_MICRO  # exact fixed point
    # interval converges 1e6 -> 2e6 from below, never overshooting
    assert 1_900_000 < r["interval_micro"] <= 2_000_000
    assert r["forecast_micro"] >= 2_500_000  # approaches 2.5e6 from above


def test_peak_concurrency_hand_fixture(spark):
    """Three sessions: two overlap (peak 2), one disjoint. 30-min
    sessions anchored at the event ts."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    events = _patched_events(
        spark,
        [
            (0, t0, 1, "view", 1.0, "{}"),
            (1, t0 + datetime.timedelta(minutes=10), 2, "view", 1.0, "{}"),
            (2, t0 + datetime.timedelta(hours=3), 3, "view", 1.0, "{}"),
        ],
    )
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: events
        r = TS.events_peak_concurrency(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    assert r["peak_concurrency"] == 2
    assert r["first_peak_epoch"] == int(
        (t0 + datetime.timedelta(minutes=10)).replace(
            tzinfo=datetime.timezone.utc
        ).timestamp()
    )


def test_burstiness_poisson_vs_bursty_fixture(spark):
    """A metronome stream (same count every day) reads Fano ~0 and
    burstiness -1; an on/off bursty stream reads Fano >> 1 and B > 0."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    rows = []
    eid = 0
    for d in range(20):
        for i in range(10):  # 'steady': exactly 10/day
            rows.append((eid, datetime.datetime(2024, 1, 1 + d, 9, 0, i),
                         i, "steady", 1.0, "{}")); eid += 1
        n = 100 if d % 5 == 0 else 1  # 'bursty': spikes every 5th day
        for i in range(n):
            rows.append((eid, datetime.datetime(2024, 1, 1 + d, 10, 0,
                         i % 60), i, "bursty", 1.0, "{}")); eid += 1
    events = _patched_events(spark, rows)
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: events
        out = {r["event_type"]: r
               for r in TS.events_burstiness_fano(spark, "x").collect()}
    finally:
        TS.load_table = orig
    assert out["steady"]["fano_r6"] == 0.0
    assert out["steady"]["burstiness_r6"] == -1.0
    assert out["bursty"]["fano_r6"] > 10
    assert out["bursty"]["burstiness_r6"] > 0


def test_segment_migration_mass_balance(spark, sf_smoke):
    """Flow conservation: the sum over the migration matrix equals the
    number of distinct users active in EITHER half, and no 'new'->... or
    ...->'churned' combination double-counts."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        events_segment_migration,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table
    from pyspark.sql import functions as F

    rows = events_segment_migration(spark, sf_smoke).collect()
    total = sum(r["n_customers"] for r in rows)
    n_users = (
        load_table(spark, sf_smoke, "events")
        .select(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert total == n_users
    assert not any(
        r["seg_from"] == "new" and r["seg_to"] == "churned" for r in rows
    )


def test_entropy_rate_deterministic_chain_is_zero(spark):
    """A fully deterministic journey (view -> click -> view -> ...) has
    entropy rate exactly 0 and perplexity 1; a uniformly random 2-state
    journey approaches ln(2)."""
    import datetime
    import math

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    det = []
    eid = 0
    for uid in range(20):
        for k in range(6):
            det.append((eid, datetime.datetime(2024, 1, 1, 8, 0, k), uid,
                        "view" if k % 2 == 0 else "click", 1.0, "{}"))
            eid += 1
    events = _patched_events(spark, det)
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: events
        r = TS.events_entropy_rate_markov(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    assert r["entropy_rate_nano"] == 0
    assert r["perplexity_r6"] == 1.0

    mixed = []
    eid = 0
    seq = "abababbaabbaabab"  # alternating-ish 2-state stream
    for uid in range(10):
        for k, ch in enumerate(seq):
            mixed.append((eid, datetime.datetime(2024, 1, 1, 8, 0, k), uid,
                          ch, 1.0, "{}"))
            eid += 1
    events2 = _patched_events(spark, mixed)
    try:
        TS.load_table = lambda _s, _d, _t: events2
        r2 = TS.events_entropy_rate_markov(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    assert 0 < r2["entropy_rate_nano"] / 1e9 <= math.log(2) + 1e-9


def test_conversion_window_monotone_in_window(spark, sf_smoke):
    """A larger attribution window can only find MORE conversions: the
    rate must be weakly monotone in window size, and n_views identical
    across windows."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        events_conversion_window_sensitivity,
    )

    rows = sorted(
        events_conversion_window_sensitivity(spark, sf_smoke).collect(),
        key=lambda r: r["window_hours"],
    )
    assert len({r["n_views"] for r in rows}) == 1
    convs = [r["n_converted"] for r in rows]
    assert convs == sorted(convs)


def test_granger_planted_causality_vs_independence(spark):
    """y_t = x_{t-1} (plus a tiny wobble) must yield a massive F; an
    x that never enters y's dynamics must yield a tiny one."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    def mk(depends: bool):
        rows, eid = [], 0
        xs = [5 + (d * 7) % 11 for d in range(30)]  # wandering driver
        for d in range(30):
            nx = xs[d]
            ny = (xs[d - 1] if d > 0 else 6) if depends else 6 + (d * 5) % 7
            for i in range(nx):
                rows.append((eid, datetime.datetime(2024, 1, 1 + d, 9, 0,
                             i % 60), i, "view", 1.0, "{}")); eid += 1
            for i in range(ny):
                rows.append((eid, datetime.datetime(2024, 1, 1 + d, 15, 0,
                             i % 60), i, "purchase", 1.0, "{}")); eid += 1
        return _patched_events(spark, rows)

    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: mk(True)
        f_dep = TS.events_granger_views_purchases(spark, "x").collect()[0]
        TS.load_table = lambda _s, _d, _t: mk(False)
        f_ind = TS.events_granger_views_purchases(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    # deterministic dependence: the full model fits EXACTLY, so RSS_f = 0
    # and F is NULL by the degenerate guard — the strongest possible signal
    assert f_dep["rss_full_r6"] == 0.0
    assert f_dep["f_stat_r6"] is None
    assert f_ind["f_stat_r6"] is not None and f_ind["f_stat_r6"] < 10


def test_cep_pattern_excludes_intervening_purchase(spark):
    """The exclusion classes matter: v..c..p with an EARLY purchase
    between view and click must NOT match; the clean funnel must."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    t0 = datetime.datetime(2024, 1, 1, 8, 0, 0)

    def ev(eid, sec, uid, et):
        return (eid, t0 + datetime.timedelta(seconds=sec), uid, et,
                1.0, "{}")

    rows = [
        # user 1: view -> click -> purchase (clean) => match
        ev(0, 0, 1, "view"), ev(1, 10, 1, "click"), ev(2, 20, 1, "purchase"),
        # user 2: view -> purchase -> click -> (nothing) => no match
        ev(3, 0, 2, "view"), ev(4, 10, 2, "purchase"), ev(5, 20, 2, "click"),
        # user 3: clicks only => no match
        ev(6, 0, 3, "click"), ev(7, 10, 3, "click"),
    ]
    events = _patched_events(spark, rows)
    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: events
        r = TS.events_pattern_match_cep(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    assert r["n_users"] == 3
    assert r["n_matched"] == 1


def test_runs_test_detects_trend_vs_alternation(spark):
    """A monotone series is ONE long run above/below the median (z very
    negative); a perfectly alternating series maximizes runs (z very
    positive)."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.timeseries as TS

    def mk(vals):
        return spark.createDataFrame(
            [(i, 1, datetime.date(1995, 1, 1) + datetime.timedelta(days=i),
              float(v)) for i, v in enumerate(vals)],
            "o_orderkey long, o_custkey long, o_orderdate date,"
            " o_totalprice double",
        )

    orig = TS.load_table
    try:
        TS.load_table = lambda _s, _d, _t: mk(range(100, 140))  # trend
        trend = TS.ts_runs_test_randomness(spark, "x").collect()[0]
        TS.load_table = lambda _s, _d, _t: mk(
            [100 if i % 2 == 0 else 200 for i in range(40)] + [150]
        )
        alt = TS.ts_runs_test_randomness(spark, "x").collect()[0]
    finally:
        TS.load_table = orig
    assert trend["n_runs"] == 2  # below-block then above-block
    assert trend["z_r6"] < -4
    assert alt["n_runs"] == alt["n_above"] + alt["n_below"]  # max runs
    assert alt["z_r6"] > 4


def test_time_to_convert_empty_conversions_symmetric(spark, tmp_path):
    """ADVICE r10 (closed in r12 by the ungrouped-aggregate rewrite):
    on an events table with views but ZERO purchases, the old Spark
    groupBy('n') produced 0 rows while the oracle's ungrouped aggregate
    produced 1 — both engines must now emit exactly one row with
    n_converted_views = 0 and NULL percentiles/max."""
    import datetime as dt

    import duckdb

    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    rows = [
        (i, dt.datetime(2024, 3, 1, 10, i), i % 3, "view", 1.0, "{}")
        for i in range(12)
    ]
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))

    q = load_all()["events_time_to_convert_pctl"]
    got = q.fn(spark, str(tmp_path)).collect()
    assert len(got) == 1
    g = got[0]
    assert g.n_converted_views == 0
    assert g.p50_us is None and g.p90_us is None and g.max_us is None

    con = duckdb.connect()
    con.execute("SET enable_progress_bar = false")
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{tmp_path}/events.parquet/*.parquet')"
    )
    duck = con.execute(q.oracle).fetchall()
    con.close()
    assert len(duck) == 1
    assert duck[0][0] == 0
    assert duck[0][1] is None and duck[0][2] is None and duck[0][3] is None


def test_multitouch_attribution_linear_plan_vs_bruteforce(spark, tmp_path):
    """r14: events_multitouch_attribution was rewritten from a
    per-user-quadratic join-then-filter to the linear bounded-history
    plan (20-row sliding collect_list + running-last as-of). Verify the
    rewrite against an in-Python brute force on an adversarial fixture:
    a hub user with >20 touches per purchase, same-instant
    purchase/touch collisions (strict tts < pts must exclude),
    same-timestamp touch pairs (tie rank by touch_id ASC), touches
    older than the 7-day window, and purchases with no touches."""
    import math

    from pyspark.sql import functions as F

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        ATTR_WINDOW_US,
        events_multitouch_attribution,
    )

    US = 1_000_000
    HOUR = 3600 * US
    base = dt.datetime(2024, 3, 1)
    rows = []
    eid = 0

    def add(user, t_us, etype, value=0.0):
        nonlocal eid
        eid += 1
        rows.append(
            (eid, user, base + dt.timedelta(microseconds=t_us), etype,
             float(value))
        )
        return eid

    # hub user 1: 30 touches then a purchase (only top-20 credit)
    for i in range(30):
        add(1, i * HOUR, "view" if i % 3 else "click")
    add(1, 30 * HOUR, "purchase", 123.45)
    # same-instant collision: touch at exactly the purchase ts (user 2)
    add(2, 5 * HOUR, "view")
    add(2, 9 * HOUR, "click")
    t_same = 9 * HOUR
    add(2, t_same, "purchase", 50.0)  # same ts as the click above
    # same-ts touch pair (user 3): rank tie broken by touch_id ASC
    add(3, 1 * HOUR, "view")
    add(3, 1 * HOUR, "view")
    add(3, 2 * HOUR, "purchase", 10.0)
    # stale touches beyond the 7-day window (user 4)
    add(4, 0, "view")
    add(4, ATTR_WINDOW_US + 10 * HOUR, "purchase", 99.0)
    add(4, ATTR_WINDOW_US + 9 * HOUR, "click")  # in window
    # purchase with no touches at all (user 5)
    add(5, 3 * HOUR, "purchase", 77.0)
    # two purchases sharing touches (user 6)
    add(6, 1 * HOUR, "view")
    add(6, 2 * HOUR, "purchase", 20.0)
    add(6, 3 * HOUR, "click")
    add(6, 4 * HOUR, "purchase", 40.0)

    import pandas as pd

    pdf = pd.DataFrame(
        rows, columns=["event_id", "user_id", "ts", "event_type", "value"]
    )
    path = str(tmp_path / "events.parquet")
    spark.createDataFrame(pdf).withColumn(
        "ts", F.col("ts").cast("timestamp")
    ).write.parquet(path, mode="overwrite")
    sf_dir = str(tmp_path)

    got = {
        r.event_type: (r.n_credited_touches, r.attributed_revenue)
        for r in events_multitouch_attribution(spark, sf_dir).collect()
    }

    # brute force
    purchases = [r for r in rows if r[3] == "purchase"]
    touches = [r for r in rows if r[3] in ("view", "click")]
    credit = {}
    counts = {}
    for pe, pu, pts, _, val in purchases:
        pts_us = int((pts - dt.datetime(1970, 1, 1)).total_seconds() * US)
        cands = [
            (te, tt, ttype)
            for te, tu, tt, ttype, _ in touches
            if tu == pu
        ]
        cands = [
            (te, tt, ttype)
            for te, tt, ttype in cands
            if (tt < pts)
            and (
                int((pts - tt).total_seconds() * US) <= ATTR_WINDOW_US
            )
        ]
        cands.sort(key=lambda c: (-int(
            (c[1] - dt.datetime(1970, 1, 1)).total_seconds() * US
        ), c[0]))
        cands = cands[:20]
        n = len(cands)
        if n == 0:
            continue
        cents = round(val * 100)
        total = 2 ** n - 1
        for rank, (te, tt, ttype) in enumerate(cands, 1):
            w = 2 ** (n - rank)
            credit[ttype] = credit.get(ttype, 0.0) + cents * w / total
            counts[ttype] = counts.get(ttype, 0) + 1
    want = {
        k: (counts[k], round(credit[k] / 100.0, 6)) for k in credit
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], (k, got[k], want[k])
        assert math.isclose(got[k][1], want[k][1], abs_tol=1e-6), (
            k, got[k], want[k]
        )
