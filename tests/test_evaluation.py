"""Hand-computed fixtures for the ML-evaluation family and the round-8
corpus/pipeline additions (oracle-differential covers them at sf0.01;
these pin the math itself on tiny knowable inputs)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_auc_known_fixture(spark):
    """Perfect ranker -> AUC 1.0; anti-ranker -> 0; the registered query
    shape on a fixture whose rank-sum is checkable by hand."""
    from hbase_hadoop_flightsearch_spark.operators.evaluation import (
        AUC_PPM,
    )

    # scores: positives {3,4}, negatives {1,2} -> perfect separation
    rows = [(1, 0), (2, 0), (3, 1), (4, 1)]
    m = spark.createDataFrame(rows, "score long, y int")
    from pyspark.sql import Window

    ranked = m.select(
        "y",
        (
            2 * F.rank().over(Window.orderBy("score"))
            + F.count(F.lit(1)).over(Window.partitionBy("score"))
            - 1
        ).alias("r2"),
    )
    n_pos = F.sum("y")
    u_x2 = (
        F.sum(F.when(F.col("y") == 1, F.col("r2")).otherwise(0))
        - n_pos * (n_pos + 1)
    )
    row = ranked.agg(u_x2.alias("u2"), n_pos.alias("np")).collect()[0]
    # U = n_pos * n_neg = 4 for perfect separation -> u_x2 = 8
    assert row.u2 == 8 and row.np == 2
    assert AUC_PPM * row.u2 // (2 * 2 * 2) == AUC_PPM


def test_auc_registered_bounds(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    r = load_all()["ml_eval_auc_exact"].fn(spark, SF).collect()[0]
    assert r.n_pos + r.n_neg == 500
    assert 0 <= r.auc_ppm <= 1_000_000
    # identity: u_x2 is even-sum bounded by 2*n_pos*n_neg
    assert 0 <= r.u_x2 <= 2 * r.n_pos * r.n_neg


def test_calibration_partitions_corpus(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    rows = load_all()["ml_eval_calibration_bins"].fn(spark, SF).collect()
    assert sorted(r.bin for r in rows) == list(range(1, 11))
    assert sum(r.n for r in rows) == 500
    for r in rows:
        assert 0 <= r.pos_rate_ppm <= 1_000_000
        assert r.n_pos <= r.n


def test_lpa_two_cliques_bridge(spark):
    """Two 4-cliques joined by one bridge edge: after 4 synchronous
    min-tie-break rounds each clique converges to its own minimum
    label; the bridge endpoints stay with their cliques (3 in-clique
    neighbor votes beat 1 bridge vote)."""
    from hbase_hadoop_flightsearch_spark.operators.graph import (
        LPA_ROUNDS,
    )

    def clique(ids):
        return [
            (a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
        ]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        "a long, b long",
    )
    from pyspark.sql import Window

    sym = edges.select(
        F.col("a").alias("v"), F.col("b").alias("u")
    ).unionAll(edges.select(F.col("b").alias("v"), F.col("a").alias("u")))
    labels = sym.select("v").distinct().select(
        "v", F.col("v").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        counts = (
            sym.join(labels.select(F.col("v").alias("u"), "label"), "u")
            .groupBy("v", "label")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        w = Window.partitionBy("v").orderBy(F.desc("c"), F.asc("label"))
        labels = (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("v", "label")
        )
    got = {r.v: r.label for r in labels.collect()}
    assert all(got[v] == 1 for v in (1, 2, 3, 4))
    assert all(got[v] == 10 for v in (10, 11, 12, 13))


def test_pack_sequences_invariants(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all
    from hbase_hadoop_flightsearch_spark.plans.pipelines import (
        PACK_SEQ_LEN,
    )
    from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

    rows = load_all()["pipeline_pack_sequences"].fn(spark, SF).collect()
    docs = load_table(spark, SF, "documents")
    n_docs = docs.count()
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("t")
    ).collect()[0].t
    # every doc starts in exactly one sequence
    assert sum(r.n_docs_starting for r in rows) == n_docs
    # fill sums to the corpus token count; only the tail is partial
    assert sum(r.filled_tokens for r in rows) == total_tokens
    partial = [r for r in rows if r.filled_tokens < PACK_SEQ_LEN]
    assert len(partial) <= 1
    assert len(rows) == -(-total_tokens // PACK_SEQ_LEN)
    for r in rows:
        assert r.n_docs_split <= r.n_docs_starting <= r.n_docs_touching


def test_2hop_reach_path_graph(spark):
    """Path 1-2-3-4-5: 2-hop sets are {3},{4},{1,5},{2},{3}."""
    from hbase_hadoop_flightsearch_spark.operators.graph import (
        graph_2hop_reach,  # noqa: F401  (registered builder reused below)
    )
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    # exercise the same plan on a synthetic edge list via the module's
    # internals: reimplement the tiny reference here
    edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
    sym = spark.createDataFrame(
        edges + [(b, a) for a, b in edges], "v long, u long"
    )
    two = (
        sym.alias("s1")
        .join(
            sym.select(F.col("v").alias("u"), F.col("u").alias("w")),
            "u",
        )
        .filter(F.col("w") != F.col("v"))
        .select("v", "w")
        .distinct()
    )
    strict2 = two.join(
        sym.select("v", F.col("u").alias("w")), ["v", "w"], "left_anti"
    )
    got = {
        r.v: r.n for r in strict2.groupBy("v").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2, 4: 1, 5: 1}


def test_conformance_fixture(spark):
    """One user: signup->view->click->purchase->signup. The last hop is
    a violation (purchase->signup not in the model)."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        CONFORMANCE_ALLOWED,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + dt.timedelta(minutes=i), 1, et, 0.0, "{}")
        for i, et in enumerate(
            ["signup", "view", "click", "purchase", "signup"]
        )
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    allowed = set(CONFORMANCE_ALLOWED)
    got = [((r.src, r.dst), (r.src, r.dst) in allowed)
           for r in seq.collect()]
    assert (("purchase", "signup"), False) in got
    assert (("signup", "view"), True) in got
    assert sum(1 for _, ok in got if not ok) == 1


def test_lcc_triangle_with_tail(spark):
    """Triangle 1-2-3 with tail 3-4: lcc(1)=lcc(2)=1, lcc(3)=1/3,
    lcc(4)=0 (degree 1)."""
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    e1 = edges.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = edges.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = edges.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = e1.join(e2, "y").join(e3, ["x", "z"])
    tv = {
        r.v: r.n
        for r in tri.select(F.col("x").alias("v"))
        .unionAll(tri.select(F.col("y").alias("v")))
        .unionAll(tri.select(F.col("z").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert tv == {1: 1, 2: 1, 3: 1}
    # lcc denominators: deg(1)=2, deg(2)=2, deg(3)=3, deg(4)=1
    # -> micro lcc: 2e6*1/2 = 1e6 for 1,2; 2e6*1/6 = 333333 for 3
    assert 2_000_000 * tv[3] // (3 * 2) == 333_333


def test_training_mix_respects_quota(spark):
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    rows = load_all()["pipeline_training_mix"].fn(spark, SF).collect()
    assert len(rows) == 20  # one per source
    for r in rows:
        assert r.chars_selected <= r.quota_chars
        assert 0 <= r.utilization_ppm <= 1_000_000
    # the greedy fill should be close to full: median utilization > 90%
    utils = sorted(r.utilization_ppm for r in rows)
    assert utils[len(utils) // 2] > 900_000


def test_neyman_allocation_favors_high_variance_stratum(spark, tmp_path):
    """Two equal-size strata, one with 10x the acctbal spread: Neyman
    allocation must give the volatile stratum strictly more than the
    proportional split would, and the allocations must sum EXACTLY to
    the budget (largest-remainder apportionment)."""
    from hbase_hadoop_flightsearch_spark.operators.sampling import (
        NEYMAN_BUDGET,
        sample_neyman_allocation,
    )

    rows = []
    for i in range(200):
        # CALM: acctbal oscillates +/-1 around 100; WILD: +/-500
        rows.append((i, f"c{i}", 1, 100.0 + (i % 2), "CALM"))
        rows.append(
            (1000 + i, f"c{1000+i}", 1, 100.0 + (i % 2) * 1000.0, "WILD")
        )
    spark.createDataFrame(
        rows,
        "c_custkey bigint, c_name string, c_nationkey int, "
        "c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    got = {
        r.segment: r
        for r in sample_neyman_allocation(spark, str(tmp_path)).collect()
    }
    assert got["WILD"].alloc_neyman > got["WILD"].alloc_proportional
    assert got["CALM"].alloc_neyman < got["CALM"].alloc_proportional
    assert (
        got["WILD"].alloc_neyman + got["CALM"].alloc_neyman == NEYMAN_BUDGET
    )


def test_did_recovers_planted_lift(spark, tmp_path):
    """Planted effect: everyone purchases 10.00; treated users jump to
    15.00 in the post period. DiD must read exactly +5.00 (5e8 micro-
    cents) and the parallel-trends cells must be flat."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.timeseries import (
        events_did_lift,
    )

    rows = []
    eid = 0
    for day in range(1, 31):
        post = day >= 16
        for uid in (2, 4, 7, 9):  # two treated (even), two control
            treated = uid % 2 == 0
            val = 15.0 if (treated and post) else 10.0
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, day, 12, 0, 0),
                    uid,
                    "purchase",
                    val,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    row = events_did_lift(spark, str(tmp_path)).collect()[0]
    assert row.mean_c_pre_micro == row.mean_c_post_micro == 10_00 * 1_000_000
    assert row.mean_t_pre_micro == 10_00 * 1_000_000
    assert row.mean_t_post_micro == 15_00 * 1_000_000
    assert row.did_micro == 5_00 * 1_000_000
    assert row.did_rel_ppm == 500_000  # +50% of the control-pre mean


def test_stump_finds_separating_threshold(spark, tmp_path):
    """Perfectly separable labels (URGENT iff totalprice < 500): the
    best stump must have Gini cost 0, accuracy 1.0, and its threshold
    must sit exactly at the largest positive-class feature value."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.clustering import (
        ml_decision_stump_gini,
    )

    rows = []
    for i in range(300):
        price = 100.0 + i * 10.0  # 100 .. 3090
        prio = "1-URGENT" if price < 500.0 else "5-LOW"
        rows.append(
            (i, i % 50, "O", price, dt.datetime(2024, 1, 1), prio)
        )
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    best = ml_decision_stump_gini(spark, str(tmp_path)).collect()[0]
    assert best.gini_cost_scaled == 0
    assert best.stump_accuracy_ppm == 1_000_000
    assert best.threshold_cents == 49_000  # largest price below 500.00
    assert best.pos_left == best.n_left and best.pos_right == 0


def test_tree_depth2_carves_interval_exactly(spark, tmp_path):
    """y = URGENT iff price in [300, 700): one stump cannot separate an
    interval, but a depth-2 tree must — the root takes one boundary and
    the R child takes the other, leaving every leaf pure."""
    import datetime as dt

    from hbase_hadoop_flightsearch_spark.operators.clustering import (
        ml_decision_tree_depth2,
    )

    rows = []
    for i in range(400):
        price = 100.0 + i * 2.0  # 100 .. 898
        prio = "1-URGENT" if 300.0 <= price < 700.0 else "5-LOW"
        rows.append((i, i % 50, "O", price, dt.datetime(2024, 1, 1), prio))
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.node: r for r in ml_decision_tree_depth2(spark, str(tmp_path)).collect()}
    assert set(got) == {"root", "L", "R"}
    # root boundary: last price below 300 (prices step by 2 -> 298.00)
    assert got["root"].threshold_cents == 29_800
    assert got["root"].pos_left == 0  # left of root is pure LOW
    # R child takes the other boundary: last URGENT price 698.00
    assert got["R"].threshold_cents == 69_800
    assert got["R"].pos_left == got["R"].n_left  # [300,700) pure URGENT
    assert got["R"].pos_node == got["R"].pos_left  # nothing positive right
    assert got["R"].gini_cost_scaled == 0
    assert got["L"].gini_cost_scaled == 0  # pure side: any split costs 0


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_pr_curve_perfect_ranker(spark, tmp_path):
    """All positives score above all negatives: precision stays 1.0
    through the positive block, recall reaches 1.0 exactly there, and
    the best F1 point is (1.0, 1.0)."""
    from hbase_hadoop_flightsearch_spark.operators.evaluation import (
        ml_eval_pr_curve_exact,
    )

    rows = [(i, "t", "en", "s", 100 + i) for i in range(3)]  # pos: 100-102
    rows += [(10 + i, "t", "de", "s", 10 + i) for i in range(3)]  # neg
    _write_docs(spark, tmp_path, rows)
    pts = {
        r.threshold_score: r
        for r in ml_eval_pr_curve_exact(spark, str(tmp_path)).collect()
    }
    assert pts[100].precision_ppm == 1_000_000
    assert pts[100].recall_ppm == 1_000_000
    assert pts[100].f1_ppm == 1_000_000
    assert pts[102].recall_ppm == 333_333  # 1 of 3 positives
    assert pts[10].precision_ppm == 500_000  # all 6 predicted positive


def test_ndcg_ideal_vs_inverted_order(spark, tmp_path):
    """A group whose ranker order equals the ideal gain order must score
    ndcg_ppm == 1e6 exactly; a group ranked worst-first must score
    strictly less."""
    from hbase_hadoop_flightsearch_spark.operators.evaluation import (
        ml_eval_ndcg_at_10,
    )

    rows = []
    # lang 'aa': score order == gain order (gain = doc_id % 4)
    # doc_ids 3,2,1,0 -> gains 3,2,1,0; give scores 40,30,20,10
    for doc_id, score in [(3, 40), (2, 30), (1, 20), (0, 10)]:
        rows.append((doc_id, "t", "aa", "s", score))
    # lang 'bb': scores inverted vs gains
    for doc_id, score in [(7, 10), (6, 20), (5, 30), (4, 40)]:
        rows.append((doc_id, "t", "bb", "s", score))
    _write_docs(spark, tmp_path, rows)
    got = {r.lang: r for r in ml_eval_ndcg_at_10(spark, str(tmp_path)).collect()}
    assert got["aa"].ndcg_ppm == 1_000_000
    assert got["aa"].dcg_micro == got["aa"].idcg_micro
    assert got["bb"].ndcg_ppm < 1_000_000


def test_learning_curve_fixed_eval_and_perfect_pattern(spark, sf_correctness):
    """The eval split is FIXED: n_eval must be identical at every
    training fraction. On a corpus where 'view' is always followed by
    'click', the model must be perfect at every fraction."""
    import datetime

    import hbase_hadoop_flightsearch_spark.operators.evaluation as E

    rows = E.ml_eval_learning_curve(spark, sf_correctness).collect()
    assert {r["train_pct"] for r in rows} == set(E.LC_FRACTIONS)
    assert len({r["n_eval"] for r in rows}) == 1
    assert all(0 <= r["accuracy_ppm"] <= 1_000_000 for r in rows)

    ev_rows = []
    eid = 0
    for uid in range(60):
        for k, et in enumerate(["view", "click", "view", "click"]):
            ev_rows.append(
                (eid, datetime.datetime(2024, 1, 1, 8, 0, k), uid, et,
                 1.0, "{}")
            )
            eid += 1
    events = spark.createDataFrame(
        ev_rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    orig = E.load_table
    try:
        E.load_table = lambda _s, _d, _t: events
        perf = E.ml_eval_learning_curve(spark, "x").collect()
    finally:
        E.load_table = orig
    # ties on ts are broken by event_type ('click' < 'view'), so the
    # per-user sequence is deterministic; every prev has a single
    # dominant successor and accuracy is perfect at every fraction.
    assert perf and all(r["accuracy_ppm"] == 1_000_000 for r in perf)


def test_cost_optimal_threshold_is_argmin_of_sweep(spark, sf_correctness):
    """Recompute the cost sweep from the exact PR curve and assert the
    registered top-1 is its argmin (cost asc, score asc)."""
    import hbase_hadoop_flightsearch_spark.operators.evaluation as E

    pr = E.ml_eval_pr_curve_exact(spark, sf_correctness).collect()
    p_tot = max(r["n_true_pos"] for r in pr)
    sweep = [
        (
            E.COST_FP * (r["n_predicted_pos"] - r["n_true_pos"])
            + E.COST_FN * (p_tot - r["n_true_pos"]),
            r["threshold_score"],
        )
        for r in pr
    ]
    best_cost, best_score = min(sweep)
    got = E.ml_eval_cost_optimal_threshold(spark, sf_correctness).collect()[0]
    assert got["total_cost"] == best_cost
    assert got["threshold_score"] == best_score


def test_shapley_efficiency_identity_and_symmetry(spark, sf_correctness):
    """Shapley efficiency must hold exactly (phi_a + phi_b equals the
    full-coalition gain), and two IDENTICAL features must split credit
    equally (symmetry axiom) on a planted fixture."""
    import hbase_hadoop_flightsearch_spark.operators.evaluation as E

    r = E.ml_eval_shapley_two_features(spark, sf_correctness).collect()[0]
    assert r["phi_a_x2n"] + r["phi_b_x2n"] == r["phi_sum_x2n"]

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 == 0 else "de",
          300 if i % 3 == 0 else 100,
          " ".join(["w"] * (50 if i % 3 == 0 else 10)))
         for i in range(60)],
        "doc_id long, lang string, n_chars long, text string",
    ).withColumn("source", F.lit("s"))
    orig = E.load_table
    try:
        E.load_table = lambda _s, _d, _t: docs
        s = E.ml_eval_shapley_two_features(spark, "x").collect()[0]
    finally:
        E.load_table = orig
    # both features perfectly encode the label here -> symmetric credit
    assert s["phi_a_x2n"] == s["phi_b_x2n"]
    assert s["acc_ab"] == s["n"]  # AND-vote is perfect on this fixture


def test_conformal_coverage_meets_guarantee(spark, sf_correctness):
    """Split-conformal theory: coverage on exchangeable eval data is at
    least 1 - alpha in expectation; assert the realized coverage clears
    0.9 minus generous finite-sample slack, and the quantile really is
    the conformal order statistic of the calibration residuals."""
    import math

    import hbase_hadoop_flightsearch_spark.operators.evaluation as E

    r = E.ml_eval_conformal_snaive(spark, sf_correctness).collect()[0]
    n_eval = r["n_eval"]
    slack = 3.0 * math.sqrt(0.09 / max(n_eval, 1))  # ~3 sigma binomial
    assert r["coverage_ppm"] / 1e6 >= 0.9 - slack, r
    assert r["q_resid"] >= 0
    assert r["n_cal"] > 0 and n_eval > 0


def test_bleu_identical_pair_scores_one(spark):
    """A candidate identical to its reference scores BLEU-2 = 1.0; a
    disjoint-vocabulary pair scores 0."""
    import hbase_hadoop_flightsearch_spark.functions.text as T

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "alpha beta gamma delta epsilon zeta eta theta"),
            (3, "one two three four five six seven eight"),
        ],
        "doc_id long, text string",
    ).withColumn("source", F.lit("s")).withColumn("lang", F.lit("en")) \
     .withColumn("n_chars", F.length("text"))
    orig = T.load_table
    try:
        T.load_table = lambda _s, _d, _t: docs
        out = {r["cand_id"]: r for r in
               T.ml_eval_bleu_pairs(spark, "x").collect()}
    finally:
        T.load_table = orig
    assert out[0]["bleu2_r6"] == 1.0
    assert out[2]["bleu2_r6"] == 0.0
