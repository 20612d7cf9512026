"""Unigram-LM scoring: hand-computed surprisal on a fixture the oracle
corpus can't isolate (power-of-two counts make the log2 values exact)."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.deep  # driver-default deselected tier (pytest.ini, VERDICT r15 #6)

from hbase_hadoop_flightsearch_spark.functions.text import unigram_logprob


def test_unigram_logprob_hand_computed(spark):
    """Corpus: 'a a b' + 'c' => counts a=2, b=1, c=1, T=4 (all powers of
    two, so every log2 is exact). Doc 1 mean surprisal =
    (2*(2-1) + 1*(2-0)) / 3 = 4/3; doc 2 = (2-0)/1 = 2."""
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "c")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    assert rows[1].n_tokens == 3 and rows[2].n_tokens == 1
    assert rows[1].avg_neg_log2p == round(4 / 3, 6)
    assert rows[2].avg_neg_log2p == 2.0


def test_unigram_logprob_rare_scores_above_common(spark):
    """A doc of corpus-rare tokens must outscore a doc of the corpus's
    most common token — the ordering a quality filter relies on."""
    docs = spark.createDataFrame(
        [(1, "the the the the"), (2, "zyzzyva qoph"), (3, "the the")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r.avg_neg_log2p for r in unigram_logprob(docs).collect()}
    assert rows[2] > rows[1]
    assert rows[1] == rows[3]  # same token mix => same score


def test_bpe_greedy_left_apply_semantics(spark):
    """The single-pass replace used to apply a merge must be greedy-left
    (the canonical BPE apply order): b b b with merge (b,b) -> [bb, b],
    and a b a b -> [ab, ab]; a merged symbol must not re-pair with the
    character it just consumed."""
    rows = [("x", 1, "b  b  b"), ("y", 1, "a  b  a  b")]
    df = spark.createDataFrame(rows, "word string, n int, t string")
    out = {
        r["word"]: r["t2"]
        for r in df.selectExpr(
            "word",
            "trim(replace(' ' || t || ' ', ' a  b ', ' ab ')) AS t2"
        ).collect()
    }
    assert out["y"] == "ab  ab"
    out = {
        r["word"]: r["t2"]
        for r in df.selectExpr(
            "word",
            "trim(replace(' ' || t || ' ', ' b  b ', ' bb ')) AS t2"
        ).collect()
    }
    assert out["x"] == "bb  b"


def test_bpe_merges_deterministic_and_wellformed(spark, sf_smoke):
    """Each learned merge concatenates the pair, counts are nonincreasing
    is NOT required (later merges can beat earlier residuals is false —
    argmax sequence must be nonincreasing when no new-pair creation
    intervenes; we assert the weaker invariants that always hold), and a
    repeat run is identical (pure determinism)."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    q = load_all()["text_bpe_train_merges"]
    a = q.fn(spark, sf_smoke).collect()
    b = q.fn(spark, sf_smoke).collect()
    assert a == b
    assert [r["merge_rank"] for r in a] == [1, 2, 3, 4]
    for r in a:
        assert r["merged"] == r["pair_left"] + r["pair_right"]
        assert r["pair_count"] > 0


def test_bpe_merge_apply_survives_quote_bearing_tokens(spark, tmp_path):
    """A winning pair containing ' (or \\) must not break the merge
    apply: the replace is built from column LITERALS, never spliced into
    a SQL string (VERDICT r5 #3). Corpus: \"don't\" x5 forces the
    apostrophe into the winning pair of merge 1 and into the SEARCH
    literal of merges 3-4."""
    import pandas as pd

    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    pdf = pd.DataFrame(
        {
            "doc_id": list(range(6)),
            "text": ["don't"] * 5 + ["zz"],
            "lang": ["en"] * 6,
            "source": ["t"] * 6,
            "n_chars": [5] * 5 + [2],
        }
    )
    sf = tmp_path / "sfq"
    sf.mkdir()
    pdf.to_parquet(sf / "documents.parquet")
    q = load_all()["text_bpe_train_merges"]
    got = [
        (r["merge_rank"], r["pair_left"], r["pair_right"], r["merged"],
         r["pair_count"])
        for r in q.fn(spark, str(sf)).collect()
    ]
    assert got == [
        (1, "'", "t", "'t", 5),
        (2, "d", "o", "do", 5),
        (3, "do", "n", "don", 5),
        (4, "don", "'t", "don't", 5),
    ]
