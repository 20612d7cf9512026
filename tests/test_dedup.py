"""Self-checks for the non-oracle-able dedup path (SURVEY.md §7 R3):
SimHash has no SQL oracle (signature is hash-defined), so its output is
validated against the exact n-gram Jaccard operator instead.
"""

from __future__ import annotations

from hbase_hadoop_flightsearch_spark.operators.dedup import (
    dedup_ngram_jaccard,
    dedup_simhash,
)


def test_simhash_pairs_are_true_near_dups(spark, sf_correctness):
    """Hamming <= 3 on 64-bit 3-gram SimHash is a STRICTER notion of
    near-duplicate than 3-gram Jaccard >= 0.5: every SimHash pair must be
    a Jaccard pair (perfect precision w.r.t. the exact operator), and it
    must find a meaningful share of them."""
    jac = {
        (r.d1, r.d2)
        for r in dedup_ngram_jaccard(spark, sf_correctness).collect()
    }
    sim = {
        (r.d1, r.d2) for r in dedup_simhash(spark, sf_correctness).collect()
    }
    assert sim, "simhash found nothing"
    assert sim <= jac, f"false positives: {sorted(sim - jac)[:5]}"
    assert len(sim) >= len(jac) * 0.3, (
        f"simhash recall vs jaccard too low: {len(sim)}/{len(jac)}"
    )


def test_connected_components_closes_chains(spark):
    """A 5-node path graph (0-1-2-3-4) plus an isolated vertex: label
    propagation must close the full chain (diameter 4 > 1 round) and leave
    the singleton alone — proof of real transitivity, since the corpus'
    near-dup clusters are near-cliques that converge in one round."""
    from hbase_hadoop_flightsearch_spark.operators.graph import (
        connected_components,
    )

    vertices = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], ["d1", "d2"]
    )
    got = {
        (r.doc_id, r.component_id)
        for r in connected_components(vertices, chain).collect()
    }
    assert got == {(i, 0) for i in range(5)} | {(5, 5)}
