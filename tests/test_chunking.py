"""Chunking / negative-sampling invariants beyond oracle parity:
coverage, overlap, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.functions.chunking import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    N_NEGATIVES,
)
from hbase_hadoop_flightsearch_spark.plans.registry import load_all
from hbase_hadoop_flightsearch_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_chunks_cover_every_token_with_expected_overlap(spark):
    chunks = load_all()["text_chunk_sliding"].fn(spark, SF).collect()
    docs = {
        r["doc_id"]: r["text"].split(" ")
        for r in load_table(spark, SF, "documents")
        .select("doc_id", "text")
        .collect()
    }
    by_doc = {}
    for r in chunks:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rows in by_doc.items():
        toks = docs[doc_id]
        rows.sort(key=lambda r: r["chunk_id"])
        covered = set()
        for r in rows:
            start = r["chunk_id"] * CHUNK_STRIDE
            expect = toks[start : start + CHUNK_TOKENS]
            assert r["chunk_text"].split(" ") == expect, doc_id
            assert r["chunk_tokens"] == len(expect) > 0, doc_id
            covered.update(range(start, start + len(expect)))
        # full coverage, no token left out of every chunk
        assert covered == set(range(len(toks))), doc_id
        # consecutive chunks overlap by exactly CHUNK_TOKENS - CHUNK_STRIDE
        # wherever a successor exists
        for a, b in zip(rows, rows[1:]):
            assert b["chunk_id"] == a["chunk_id"] + 1, doc_id


def test_negative_pairs_deterministic_and_bounded(spark):
    q = load_all()["sample_negative_pairs"]
    a = sorted(map(tuple, q.fn(spark, SF).collect()))
    b = sorted(map(tuple, q.fn(spark, SF).collect()))
    assert a == b  # no RNG state — re-run identical
    n_docs = load_table(spark, SF, "documents").count()
    per_doc = {}
    rows = q.fn(spark, SF).collect()
    for r in rows:
        assert 0 <= r["neg_id"] < n_docs
        assert r["neg_id"] != r["doc_id"]
        assert 0 <= r["j"] < N_NEGATIVES
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + 1
    assert per_doc and max(per_doc.values()) <= N_NEGATIVES


def test_skew_factor_sane(spark):
    rows = load_all()["diag_key_skew"].fn(spark, SF).collect()
    assert len(rows) == 10
    assert all(r["skew_factor"] >= 1.0 for r in rows)
    cnts = [r["cnt"] for r in sorted(rows, key=lambda r: r["rk"])]
    assert cnts == sorted(cnts, reverse=True)
    # the reported max key count is indeed the hottest key's count
    orders = load_table(spark, SF, "orders")
    true_max = (
        orders.groupBy("o_custkey").count().agg(F.max("count")).first()[0]
    )
    assert rows[0]["n_rows"] == orders.count()
    assert max(cnts) == true_max
