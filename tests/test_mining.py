"""Mining-operator tests beyond the DuckDB oracle: algorithm cross-checks
(joinless expansion vs self-join; Spark triangles vs brute force) and the
basket-size cap contract."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.operators.mining import (
    copurchase_edges,
    copurchase_pairs,
    order_baskets,
    triangle_count,
)
from hbase_hadoop_flightsearch_spark.sources.catalog import load_table


def test_pairs_match_selfjoin_formulation(spark, sf_smoke):
    """The joinless array expansion must equal the textbook self-join,
    computed here in Spark (the DuckDB oracle re-proves this at sf0.01)."""
    li = load_table(spark, sf_smoke, "lineitem")
    got = {
        (r["part_a"], r["part_b"]): r["pair_count"]
        for r in copurchase_pairs(li).collect()
    }
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    want_df = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .count()
    )
    want = {(r["part_a"], r["part_b"]): r["count"] for r in want_df.collect()}
    assert got == want and len(got) > 0


def test_basket_cap_excludes_oversized_orders(spark):
    li = spark.createDataFrame(
        [(1, p) for p in range(10)] + [(2, 1), (2, 2), (3, 7)],
        "l_orderkey long, l_partkey long",
    )
    baskets = {r["l_orderkey"]: r["parts"] for r in order_baskets(li, cap=5).collect()}
    assert set(baskets) == {2}  # order 1 over cap, order 3 a singleton
    assert baskets[2] == [1, 2]


def test_triangles_match_bruteforce(spark, sf_smoke):
    edges = copurchase_edges(load_table(spark, sf_smoke, "lineitem"))
    es = {(r["a"], r["b"]) for r in edges.collect()}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for v, nbrs in adj.items()
        for x, y in combinations(sorted(nbrs), 2)
        if v < x < y and (x, y) in es
    )
    got = triangle_count(edges).first()["triangle_count"]
    assert got == want


def test_triangle_count_on_known_graph(spark):
    # K4 has 4 triangles; an attached pendant edge adds none.
    edges = spark.createDataFrame(
        [(a, b) for a, b in combinations(range(4), 2)] + [(3, 9)],
        "a long, b long",
    )
    assert triangle_count(edges).first()["triangle_count"] == 4


def test_bfs_distances_on_known_graph(spark):
    from hbase_hadoop_flightsearch_spark.operators.graph import bfs_distances

    # path 0-1-2-3 plus triangle shortcut 0-2; vertex 9 unreachable island
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 2), (8, 9)], "a long, b long"
    )
    got = {r["v"]: r["dist"] for r in bfs_distances(edges, source=0).collect()}
    assert got == {0: 0, 1: 1, 2: 1, 3: 2}


def test_bfs_depth_bound_truncates(spark):
    from hbase_hadoop_flightsearch_spark.operators.graph import bfs_distances

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "a long, b long"
    )
    got = {r["v"]: r["dist"] for r in bfs_distances(chain, 0, max_depth=3).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # vertices past depth 3 absent


def test_assoc_rules_hand_computed(spark):
    from hbase_hadoop_flightsearch_spark.operators.mining import association_rules

    # baskets: {1,2} x3, {1,3}, {2,3} -> N=5
    rows = []
    for o, parts in enumerate([(1, 2), (1, 2), (1, 2), (1, 3), (2, 3)]):
        rows += [(o, p) for p in parts]
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    got = {
        (r["ante"], r["cons"]): (r["pair_count"], r["confidence"], r["lift"])
        for r in association_rules(li).collect()
    }
    # n(1)=4, n(2)=4, n(3)=2, n(12)=3 -> conf(1->2)=0.75, lift=0.75/(4/5)
    assert got[(1, 2)] == (3, 0.75, round(0.75 / 0.8, 6))
    assert got[(2, 1)] == (3, 0.75, round(0.75 / 0.8, 6))
    assert (1, 3) not in got  # pair_count 1 < MIN_PAIR_SUPPORT


def test_triple_expansion_matches_itertools(spark, sf_smoke):
    """The nested-slice triple expression must enumerate exactly the
    C(n,3) sorted combinations of every basket."""
    from hbase_hadoop_flightsearch_spark.operators.mining import (
        frequent_triples,
        order_baskets,
    )

    li = load_table(spark, sf_smoke, "lineitem")
    baskets = [r["parts"] for r in order_baskets(li).collect()]
    want: dict[tuple, int] = {}
    for parts in baskets:
        for t in combinations(parts, 3):  # parts already sorted distinct
            want[t] = want.get(t, 0) + 1
    want = {t: c for t, c in want.items() if c >= 2}
    got = {
        (r["part_a"], r["part_b"], r["part_c"]): r["triple_count"]
        for r in frequent_triples(li).collect()
    }
    assert got == want


def test_textrank_hub_word_ranks_first(spark, tmp_path):
    """A word adjacent to every other word (the hub of a star-shaped
    co-occurrence graph) must out-rank the spokes, and every returned
    token must clear the vocabulary frequency floor."""
    from hbase_hadoop_flightsearch_spark.operators.mining import (
        TR_MIN_FREQ,
        text_textrank_keywords,
    )

    spokes = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = []
    for i, sp in enumerate(spokes * 6):  # every spoke seen 12x next to hub
        rows.append((i, f"hub {sp} hub", "en", "t", 10))
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, "
        "n_chars bigint",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = text_textrank_keywords(spark, str(tmp_path)).collect()
    assert out[0].token == "hub"
    assert out[0].rank_pico > out[1].rank_pico
    got = {r.token for r in out}
    assert got == {"hub", *spokes}
    # spokes are symmetric: identical ranks
    spoke_ranks = {r.rank_pico for r in out if r.token != "hub"}
    assert len(spoke_ranks) == 1
