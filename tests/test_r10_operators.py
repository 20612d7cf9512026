"""Round-10 operator tests: plan contracts + semantics for the new
queries (survivorship, Markov transitions, winsorized mean, Simpson
diversity, burstiness) and the hour-band regime's invariants that the
oracle cannot see (plan shape)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.plans.registry import load_all


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_survivorship_single_exchange_no_join(spark, sf_smoke):
    """All three windows and the fingerprint must share ONE
    Exchange(cluster_id) — no join, no second shuffle of the docs."""
    reg = load_all()
    df = reg["pipeline_dedup_survivorship"].fn(spark, sf_smoke)
    plan = _plan(df)
    assert "Join" not in plan
    # exactly one hashpartitioning exchange (the orderBy adds a range one)
    n_hash = plan.count("hashpartitioning(cluster_id")
    assert n_hash == 1, plan

    rows = df.collect()
    by_cluster: dict[str, list] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(1 for r in rows if r.is_survivor) == len(by_cluster)
    for members in by_cluster.values():
        sv = [r for r in members if r.is_survivor]
        assert len(sv) == 1
        # survivor is the longest doc, doc_id tiebreak; everyone points at it
        best = max(members, key=lambda r: (r.n_chars if hasattr(r, "n_chars") else 0,))
        assert all(r.survivor_id == sv[0].doc_id for r in members)
        assert all(r.cluster_size == len(members) for r in members)


def test_markov_probabilities_sum_to_one(spark, sf_smoke):
    """Each (carrier, from_state) row of the transition matrix must have
    ppm probabilities summing to 1e6 within the floor-division slack
    (< n_states), and counts must equal flights-1 per carrier."""
    reg = load_all()
    rows = reg["flight_delay_markov_transition"].fn(spark, sf_smoke).collect()
    from collections import defaultdict

    ppm = defaultdict(int)
    n_by_carrier = defaultdict(int)
    for r in rows:
        ppm[(r.carrier, r.from_state)] += r.prob_ppm
        n_by_carrier[r.carrier] += r.n_transitions
    for key, s in ppm.items():
        assert 1000000 - 3 <= s <= 1000000, (key, s)
    # transitions per carrier = completed flights per carrier - 1
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table
    from hbase_hadoop_flightsearch_spark.sources.flights import CARRIERS

    li = load_table(spark, sf_smoke, "lineitem").filter(
        (F.col("l_orderkey") % 50 != 0) & (F.col("l_orderkey") % 97 != 3)
    )
    per_carrier = {
        r.carrier: r.n
        for r in li.groupBy(
            F.element_at(
                F.array(*[F.lit(c) for c in CARRIERS]),
                (F.col("l_suppkey") % 18 + 1).cast("int"),
            ).alias("carrier")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for carrier, n_trans in n_by_carrier.items():
        assert n_trans == per_carrier[carrier] - 1


def test_winsorized_bounds_and_monotonicity(spark, sf_smoke):
    """lo <= winsorized mean <= hi; trimmed mean within the same bounds;
    and the winsorized mean sits between trimmed mean and raw mean's
    direction of pull (sanity, not a theorem — holds on this data)."""
    reg = load_all()
    rows = reg["agg_winsorized_trimmed_mean"].fn(spark, sf_smoke).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.lo_cents <= r.hi_cents
        assert r.lo_cents * 1000000 <= r.winsorized_mean_micro
        assert r.winsorized_mean_micro <= r.hi_cents * 1000000
        assert r.lo_cents * 1000000 <= r.trimmed_mean_micro <= r.hi_cents * 1000000


def test_simpson_bounds_and_exactness(spark, sf_smoke):
    """0 <= simpson_ppm <= 1e6, gini complement exact, and a sequential
    Python recount of one language agrees exactly."""
    reg = load_all()
    rows = reg["text_simpson_diversity"].fn(spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert 0 <= r.simpson_ppm <= 1000000
        assert r.simpson_ppm + r.gini_simpson_ppm == 1000000
    from collections import Counter

    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    lang = rows[0].lang
    docs = load_table(spark, sf_smoke, "documents").filter(
        F.col("lang") == lang
    )
    cnt = Counter()
    for row in docs.select("text").collect():
        for t in row.text.split(" "):
            if t:
                cnt[t] += 1
    n = sum(cnt.values())
    coll = sum(c * (c - 1) for c in cnt.values())
    assert rows[0].n_tokens == n
    assert rows[0].simpson_ppm == (coll * 1000000) // (n * (n - 1))


def test_burstiness_function_words_less_bursty(spark, sf_smoke):
    """Content/rare tokens must out-disperse glue: the top-25 bursty
    list must have VMR strictly above 1.0 (1e6 micro) — a Poisson
    token would sit at ~1e6 — and the computation must match a
    sequential recount for the top token."""
    reg = load_all()
    rows = reg["text_burstiness_dispersion"].fn(spark, sf_smoke).collect()
    assert 0 < len(rows) <= 25
    assert all(r.vmr_micro >= 1000000 for r in rows), [
        (r.token, r.vmr_micro) for r in rows[-3:]
    ]
    from collections import Counter

    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    top = rows[0].token
    docs = load_table(spark, sf_smoke, "documents").select("text").collect()
    per_doc = [sum(1 for t in row.text.split(" ") if t == top) for row in docs]
    n = len(per_doc)
    s1 = sum(per_doc)
    s2 = sum(c * c for c in per_doc)
    assert rows[0].total_count == s1
    assert rows[0].vmr_micro == ((n * s2 - s1 * s1) * 1000000) // (n * s1)


def test_winsorized_n1_group_trimmed_null_both_engines(spark, tmp_path):
    """ADVICE r10: an n=1 group trims everything (ceil(.1*1) =
    ceil(.9*1) = 1 leaves no rows strictly inside the trim band), so
    tn = 0 and the trimmed mean must be NULL — via the explicit
    NULLIF(tn, 0), identically in Spark and DuckDB, never whatever a
    div-by-zero happens to do. Winsorized mean still exists (clamping
    the single row to itself)."""
    import datetime as dt

    import duckdb

    rows = [
        (1, 1, "F", 100.00, dt.datetime(2024, 1, 1), "1-URGENT"),
        (2, 1, "F", 10.00, dt.datetime(2024, 1, 2), "2-HIGH"),
        (3, 2, "F", 20.00, dt.datetime(2024, 1, 3), "2-HIGH"),
        (4, 3, "F", 30.00, dt.datetime(2024, 1, 4), "2-HIGH"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    q = load_all()["agg_winsorized_trimmed_mean"]
    got = {r.priority: r.asDict() for r in q.fn(spark, str(tmp_path)).collect()}
    assert got["1-URGENT"]["n"] == 1
    assert got["1-URGENT"]["trimmed_mean_micro"] is None
    assert got["1-URGENT"]["winsorized_mean_micro"] == 10000 * 1_000_000

    con = duckdb.connect()
    con.execute("SET enable_progress_bar = false")
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{tmp_path}/orders.parquet/*.parquet')"
    )
    duck = {
        r[0]: r for r in con.execute(q.oracle).fetchall()
    }
    con.close()
    cols = [
        "priority", "n", "lo_cents", "hi_cents",
        "winsorized_mean_micro", "trimmed_mean_micro",
    ]
    for prio, row in duck.items():
        g = got[prio]
        assert tuple(g[c] for c in cols) == row, (prio, g, row)
