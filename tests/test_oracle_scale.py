"""The `oracle_scale` tier (VERDICT r14 #1): large-corpus restatements of
the heaviest DuckDB oracle replays.

The strict sf0.01 oracles for the jaccard family are DELIBERATELY
quadratic (all-pairs document cross join) — algorithmic independence from
the Spark posting-list plans is what the differential buys. At sf0.1 that
independence costs 400-650 s per replay against the 900 s per-name
watchdog (r14 sweep table), so each of those queries also registers an
`oracle_scale`: the same pair set via posting-list intersection counting,
still pure DuckDB (cross-ENGINE independence preserved), seconds instead
of minutes. tools/sweep_sf01.py selects it for sf0.1-class corpora via
SWEEP_ORACLE_TIER=scale.

This file is the equivalence gate: every scale restatement must produce
IDENTICAL columns, types, and row multisets to its strict twin — executed
entirely in DuckDB, so the check is engine-only and fast.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.deep  # driver-default deselected tier (pytest.ini, VERDICT r15 #6)

from hbase_hadoop_flightsearch_spark.plans.registry import Query, load_all

from .oracle_utils import (
    _duck_type_class,
    _normalize,
    compare_query_to_oracle,
    duckdb_con,
)
from .test_oracle_differential import _LINT_AUDITED_OK, lint_oracle_sql

REGISTRY = load_all()
SCALE_QUERIES = [q for q in REGISTRY.values() if q.oracle_scale is not None]

# The 8 heaviest r14 sf0.1 replays, all dominated by the same all-pairs
# jaccard stage (SCALE.md r14 table: 396-628 s solo each). Pinned so a
# drive-by addition cannot claim the scale tier without extending the
# equivalence evidence here, and a removal cannot silently re-open the
# watchdog margin.
EXPECTED_SCALE_NAMES = {
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_md5_estimate",
    "dedup_containment_prefix",
    "dedup_cross_source_matrix",
    "dedup_chaining_audit",
    "dedup_cc_clusters",
    "pipeline_corpus_prep_neardup",
}


def test_scale_tier_membership_pinned():
    assert {q.name for q in SCALE_QUERIES} == EXPECTED_SCALE_NAMES


@pytest.mark.parametrize("query", SCALE_QUERIES, ids=lambda q: q.name)
def test_scale_oracle_equals_strict_oracle(query, sf_correctness):
    """Both formulations, one DuckDB connection, full row-multiset diff.

    This is what makes the sweep's tier switch safe: the posting-list
    restatement is only trusted because THIS test proves it emits the
    exact rows of the quadratic original on the driver fixture corpus
    (plus the structural argument in dedup.py: any pair at a positive
    threshold shares >= 1 feature, so feature-equality candidate
    generation is lossless)."""
    con = duckdb_con(sf_correctness)
    try:
        strict = con.execute(query.oracle)
        s_cols = [d[0] for d in strict.description]
        s_rows = strict.fetchall()
        scale = con.execute(query.oracle_scale)
        c_cols = [d[0] for d in scale.description]
        c_rows = scale.fetchall()
        s_desc = con.execute(f"DESCRIBE {query.oracle}").fetchall()
        c_desc = con.execute(f"DESCRIBE {query.oracle_scale}").fetchall()
    finally:
        con.close()
    assert s_cols == c_cols, f"{query.name}: column mismatch"
    s_types = {r[0]: _duck_type_class(r[1]) for r in s_desc}
    c_types = {r[0]: _duck_type_class(r[1]) for r in c_desc}
    assert s_types == c_types, f"{query.name}: type-class drift"
    assert not any("HUGEINT" in str(r[1]).upper() for r in c_desc), (
        f"{query.name}: scale oracle emits HUGEINT"
    )
    ns, nc = _normalize(s_cols, s_rows), _normalize(c_cols, c_rows)
    assert len(s_rows) == len(c_rows), (
        f"{query.name}: row count strict={len(s_rows)} scale={len(c_rows)}"
    )
    if ns != nc:
        only_s = [r for r in ns if r not in set(nc)][:5]
        only_c = [r for r in nc if r not in set(ns)][:5]
        raise AssertionError(
            f"{query.name}: scale oracle diverges.\n only-strict: {only_s}"
            f"\n only-scale: {only_c}"
        )


@pytest.mark.parametrize("query", SCALE_QUERIES, ids=lambda q: q.name)
def test_scale_oracle_lint(query):
    """The scale restatements go through the same static lint as every
    strict oracle (bare integer '/', strftime directives)."""
    if query.name in _LINT_AUDITED_OK:
        pytest.skip("bare '/' hand-audited as float-safe (see allowlist)")
    assert not lint_oracle_sql(query.oracle_scale), lint_oracle_sql(
        query.oracle_scale
    )


def test_compare_honors_scale_tier_env(spark, sf_correctness, monkeypatch):
    """compare_query_to_oracle must replay `oracle_scale` exactly when
    SWEEP_ORACLE_TIER=scale, and the strict oracle otherwise. Proven with
    a synthetic query whose two formulations disagree, so tier selection
    is observable as pass/fail."""
    q = Query(
        name="__tier_probe__",
        fn=lambda s, _dir: s.sql("SELECT CAST(1 AS BIGINT) AS x"),
        oracle="SELECT CAST(2 AS BIGINT) AS x",  # strict: wrong on purpose
        headline=False,
        doc="",
        oracle_scale="SELECT CAST(1 AS BIGINT) AS x",
    )
    monkeypatch.setenv("SWEEP_ORACLE_TIER", "scale")
    compare_query_to_oracle(spark, q, sf_correctness)  # scale SQL: passes
    monkeypatch.delenv("SWEEP_ORACLE_TIER")
    with pytest.raises(AssertionError):
        compare_query_to_oracle(spark, q, sf_correctness)  # strict: fails


def test_scale_tier_requires_strict_oracle():
    """register() rejects a scale-only oracle — the tier restates an
    existing strict oracle, never replaces the sf0.01 gate."""
    from hbase_hadoop_flightsearch_spark.plans.registry import register

    with pytest.raises(ValueError, match="oracle_scale requires"):
        register("__scale_only__", oracle=None, oracle_scale="SELECT 1")(
            lambda s, d: None
        )
