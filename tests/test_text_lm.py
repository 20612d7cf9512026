"""Unigram-LM scoring: hand-computed surprisal on a fixture the oracle
corpus can't isolate (power-of-two counts make the log2 values exact)."""

from __future__ import annotations

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
