"""Fixture and property tests for the round-7 operators, beyond the
oracle-differential corpus: hand-built inputs with known answers, and
identity checks for the rewrites the implementations rely on."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def test_cusum_prefix_min_identity_matches_recursion():
    """The window rewrite S_i = P_i - min(0, min_{j<=i} P_j) must equal
    the textbook recursion S_i = max(0, S_{i-1} + d_i) on arbitrary
    integer series (pure-python check of the load-bearing identity)."""
    import random

    rng = random.Random(7)
    for _ in range(200):
        devs = [rng.randint(-50, 50) for _ in range(rng.randint(1, 60))]
        s_rec, out_rec = 0, []
        for d in devs:
            s_rec = max(0, s_rec + d)
            out_rec.append(s_rec)
        pref, minpref, out_win = 0, 0, []
        for d in devs:
            pref += d
            minpref = min(minpref, pref)
            out_win.append(pref - min(minpref, 0))
        assert out_rec == out_win


def test_cusum_flags_level_shift_not_baseline(spark, tmp_path):
    """A flat series with a late level shift must alarm after the shift
    and never before (CUSUM's defining behavior vs point outliers)."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        ts_changepoint_cusum,
    )

    rows = []
    base = dt.datetime(2024, 1, 1)
    for i in range(60):
        val = 10.0 if i < 40 else 30.0  # level shift at i=40
        rows.append((i, base + dt.timedelta(hours=i), 1, "shift", val, "{}"))
        rows.append((1000 + i, base + dt.timedelta(hours=i), 1, "flat", 10.0, "{}"))
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.event_type: r for r in ts_changepoint_cusum(spark, str(tmp_path)).collect()
    }
    assert got["flat"].n_alarms == 0
    assert got["shift"].n_alarms > 0
    assert got["shift"].first_alarm_event_id >= 40  # only after the shift


def test_rendezvous_moves_equal_new_shard_population(spark, sf_correctness):
    """Global HRW property: total moved docs == docs assigned to the new
    shard under N+1 (every move targets the new shard and nothing else
    moves), and expected movement ~ n/(N+1)."""
    from hbase_hadoop_flightsearch_spark.sources.layout import (
        HRW_SHARDS,
        layout_rendezvous_sharding,
    )

    rows = layout_rendezvous_sharding(spark, sf_correctness).collect()
    n = sum(r.n_docs for r in rows)
    moved = sum(r.n_moved for r in rows)
    assert all(r.moves_only_to_new for r in rows)
    # expected n/(N+1); allow wide statistical slack
    exp = n / (HRW_SHARDS + 1)
    assert 0.4 * exp <= moved <= 1.8 * exp, (moved, exp)


def test_substring_spans_known_duplicate(spark, tmp_path):
    """Two docs sharing one exact 8-token span (and nothing else shared
    as an 8-gram) must each report exactly the shared span covered."""
    from hbase_hadoop_flightsearch_spark.operators.dedup import (
        SUBSTR_K,
        dedup_substring_spans,
    )

    shared = " ".join(f"dup{i}" for i in range(SUBSTR_K))
    a = "a0 a1 a2 " + shared + " a3 a4"
    b = "b0 " + shared + " b1 b2 b3"
    c = "c0 c1 c2 c3 c4 c5 c6 c7 c8 c9"
    spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b)),
         (2, c, "en", "s", len(c))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.doc_id: r for r in dedup_substring_spans(spark, str(tmp_path)).collect()}
    assert got[0].dup_spans == 1 and got[0].covered_tokens == SUBSTR_K
    assert got[1].dup_spans == 1 and got[1].covered_tokens == SUBSTR_K
    assert got[2].dup_spans == 0 and got[2].covered_tokens == 0
    assert got[2].dup_ratio_micro == 0


def test_bot_detection_metronome_vs_bursty(spark, tmp_path):
    """A perfectly periodic user must flag as a bot; a bursty user with
    the same event count must not."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        BOT_USER_MOD,
        events_bot_detection,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    bot_uid, human_uid = 3, 23  # both % 20 == 3
    for i in range(30):
        rows.append((i, base + dt.timedelta(seconds=60 * i), bot_uid,
                     "t", 1.0, "{}"))
    # bursty: alternating 5 s and 3600 s gaps
    t = base
    for i in range(30):
        t += dt.timedelta(seconds=5 if i % 2 else 3600)
        rows.append((100 + i, t, human_uid, "t", 1.0, "{}"))
    assert bot_uid % BOT_USER_MOD == 3 and human_uid % BOT_USER_MOD == 3
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {r.user_id: r for r in events_bot_detection(spark, str(tmp_path)).collect()}
    assert got[bot_uid].bot_flag is True
    assert got[human_uid].bot_flag is False


def test_rouge_identical_pair_is_perfect(spark, tmp_path):
    """A candidate identical to its reference must score 1.0 (1e6 micro)
    on every ROUGE column; a disjoint pair must score 0."""
    from hbase_hadoop_flightsearch_spark.functions.text import (
        ml_eval_rouge_pairs,
    )

    same = "x0 x1 x2 x3 x4 x5"
    spark.createDataFrame(
        [(0, same, "en", "s", 1), (1, same, "en", "s", 1),
         (2, "y0 y1 y2 y3", "en", "s", 1), (3, "z0 z1 z2 z3", "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {r.cand_id: r for r in ml_eval_rouge_pairs(spark, str(tmp_path)).collect()}
    r0 = got[0]
    assert (r0.rouge1_p_micro, r0.rouge1_r_micro) == (1000000, 1000000)
    assert (r0.rouge2_p_micro, r0.rouge2_r_micro) == (1000000, 1000000)
    r2 = got[2]
    assert r2.rouge1_p_micro == 0 and r2.rouge2_r_micro == 0


def test_bm25_top_hit_contains_term(spark, sf_correctness):
    """Every BM25 top hit must actually contain its query term (scores
    come only from tf > 0 rows) and ranks must be 1..k dense."""
    from hbase_hadoop_flightsearch_spark.functions.text import text_bm25_topk
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    rows = text_bm25_topk(spark, sf_correctness).collect()
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in load_table(spark, sf_correctness, "documents").collect()
    }
    by_term: dict = {}
    for r in rows:
        assert r.term in docs[r.doc_id]
        by_term.setdefault(r.term, []).append(r.rnk)
    for term, rnks in by_term.items():
        assert sorted(rnks) == list(range(1, len(rnks) + 1)), term


def test_item_cf_never_recommends_owned_items(spark, sf_correctness):
    """Novelty contract: no recommended part may already be in the
    customer's purchase history."""
    from hbase_hadoop_flightsearch_spark.operators.mining import (
        ml_item_cf_recommendations,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    recs = ml_item_cf_recommendations(spark, sf_correctness).collect()
    li = load_table(spark, sf_correctness, "lineitem")
    orders = load_table(spark, sf_correctness, "orders")
    owned = {
        (r.o_custkey, r.l_partkey)
        for r in li.join(
            orders, li["l_orderkey"] == orders["o_orderkey"]
        ).select("o_custkey", "l_partkey").distinct().collect()
    }
    assert recs
    for r in recs:
        assert (r.o_custkey, r.part) not in owned


def test_semdedup_partitioning_invariance(spark, sf_smoke):
    """dedup_semdedup is driver-value-hashed, so its per-vector decisions
    must be bit-identical under different parallelism: the in-cell greedy
    sorts by vec_id before any numpy math, making row arrival order
    irrelevant — assert against a fresh local[3]/shuffle=3 session."""
    import subprocess
    import sys

    from hbase_hadoop_flightsearch_spark.operators.dedup import (
        semdedup_decisions,
    )

    here = sorted(map(tuple, semdedup_decisions(spark, sf_smoke).collect()))
    child = (
        "import sys\n"
        "sys.path.insert(0, '/root/repo')\n"
        "from pyspark.sql import SparkSession\n"
        "from hbase_hadoop_flightsearch_spark.operators.dedup import "
        "semdedup_decisions\n"
        "spark = (SparkSession.builder.master('local[3]')"
        ".config('spark.sql.shuffle.partitions', '3')"
        ".config('spark.ui.enabled', 'false')"
        ".config('spark.sql.session.timeZone', 'UTC').getOrCreate())\n"
        f"rows = sorted(map(tuple, semdedup_decisions(spark, {sf_smoke!r})"
        ".collect()))\n"
        "print(repr(rows))\n"
        "spark.stop()\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", child],
        capture_output=True,
        text=True,
        timeout=300,
        check=True,
    )
    there = eval(out.stdout.strip().splitlines()[-1])
    assert here == there


def test_ks_matches_sequential_reference(spark):
    """agg_ks_two_sample's windowed formulation must equal the direct
    two-sample KS computed sequentially on a synthetic orders table."""
    import datetime as dt
    import random

    from hbase_hadoop_flightsearch_spark.operators.aggregates import (
        agg_ks_two_sample,
    )

    rng = random.Random(11)
    rows = []
    for i in range(400):
        pri = "1-URGENT" if i % 3 == 0 else "3-NORMAL"
        # urgent skews higher so D is nonzero
        price = rng.randint(100, 500) + (200 if pri == "1-URGENT" else 0)
        rows.append(
            (i, i % 40, "O", float(price), dt.date(2024, 1, 1), pri)
        )
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    got = agg_ks_two_sample(spark, d).collect()[0]
    a = sorted(
        round(r[3] * 100) for r in rows if r[5] in ("1-URGENT", "2-HIGH")
    )
    b = sorted(round(r[3] * 100) for r in rows if r[5] not in ("1-URGENT", "2-HIGH"))
    na, nb = len(a), len(b)
    values = sorted(set(a) | set(b))
    import bisect

    d_cross = max(
        abs(bisect.bisect_right(a, v) * nb - bisect.bisect_right(b, v) * na)
        for v in values
    )
    assert (got.n_a, got.n_b) == (na, nb)
    assert got.d_cross == d_cross
    assert got.d_micro == (d_cross * 1000000) // (na * nb)


def test_poisson_bootstrap_multiplier_distribution(spark, sf_correctness):
    """The deterministic Poisson(1) draws must actually look Poisson:
    across replicates, resampled-row total stays within 3 sigma of n
    (Poisson(1) mean 1), and replicate totals vary (the CI is nonzero)."""
    from hbase_hadoop_flightsearch_spark.operators.sampling import (
        BOOT_REPS,
        sample_poisson_bootstrap,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    rows = sample_poisson_bootstrap(spark, sf_correctness).collect()
    n = load_table(spark, sf_correctness, "orders").count()
    assert len(rows) == BOOT_REPS
    for r in rows:
        # sum of n Poisson(1) draws: mean n, sd sqrt(n); capped at 4
        # shaves a hair off the upper tail
        assert abs(r.n_resampled - n) < 4 * (n ** 0.5) + 10, r
    totals = {r.replicate_cents for r in rows}
    assert len(totals) > 1  # replicates genuinely differ


def test_markov_attribution_critical_channel(spark, tmp_path):
    """A channel on EVERY converting path must absorb ~all removal
    effect; a channel appearing only on non-converting paths must get
    zero credit."""
    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        events_attribution_markov,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, i, et):
        nonlocal eid
        eid += 1
        rows.append((eid, base + dt.timedelta(minutes=i), uid, et, 1.0, "{}"))

    # 10 converting users: view -> critical -> purchase
    for u in range(10):
        ev(u, 0, "view")
        ev(u, 1, "critical")
        ev(u, 2, "purchase")
    # 5 non-converting users: view -> deadend (journey ends, no purchase)
    for u in range(100, 105):
        ev(u, 0, "view")
        ev(u, 1, "deadend")
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        r.channel: r
        for r in events_attribution_markov(spark, str(tmp_path)).collect()
    }
    assert got["critical"].conv_removed_micro == 0  # removal kills all conv
    assert got["critical"].removal_effect_micro == got["critical"].conv_base_micro
    assert got["deadend"].removal_effect_micro == 0
    assert got["deadend"].attribution_share_micro == 0
    # base conversion = 10/15 of journeys, truncation-exact in micro units
    assert abs(got["critical"].conv_base_micro - 666666) <= 2
