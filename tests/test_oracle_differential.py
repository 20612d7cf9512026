"""Oracle-differential corpus: every SQL-expressible registry query must
match DuckDB on sf0.01 — the engine's sqllogictest equivalent (the reference
has zero tests; SURVEY.md §5)."""

from __future__ import annotations

import pytest

from hbase_hadoop_flightsearch_spark.plans.registry import load_all

from .oracle_utils import compare_query_to_oracle

REGISTRY = load_all()
ORACLE_QUERIES = [q for q in REGISTRY.values() if q.oracle is not None]
ROWS_ONLY_QUERIES = [q for q in REGISTRY.values() if q.oracle is None]


@pytest.mark.parametrize("query", ORACLE_QUERIES, ids=lambda q: q.name)
def test_matches_duckdb_oracle(spark, sf_correctness, query):
    compare_query_to_oracle(spark, query, sf_correctness)


def test_no_rows_only_queries_remain():
    """Every registry query carries a DuckDB oracle (the rows-only tier
    emptied out in round 3: approximate/hash-defined operators moved to
    bound-flag oracles). If a future query registers without an oracle,
    this fails loudly instead of silently weakening the gate — add an
    oracle (bound-flag if the output is approximate) or consciously
    re-introduce a rows-only check here."""
    assert not ROWS_ONLY_QUERIES, [q.name for q in ROWS_ONLY_QUERIES]


@pytest.mark.parametrize("query", ROWS_ONLY_QUERIES, ids=lambda q: q.name)
def test_rows_only_runs(spark, sf_correctness, query):
    df = query.fn(spark, sf_correctness)
    assert df.count() >= 0  # materializes without error, schema is stable
    assert len(df.columns) > 0
