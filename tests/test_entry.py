"""Smoke: the driver contract in __spark_entry__.py."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "carrier"
    assert len(df.columns) == 13


def test_contract_shape(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert "flight_delay_report" in qs
    assert set(oracles) <= set(qs)
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_query_order_covers_every_family_early():
    """The driver samples a prefix of queries(); the family-interleaved
    ordering must keep at least one query from EVERY source module inside
    the first 50 so a 50-query sample exercises every SURVEY §2 family.
    Guards future registrations from re-front-loading one family."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    reg = load_all()
    prefix = list(entrymod.queries())[:50]
    all_modules = {q.fn.__module__ for q in reg.values()}
    prefix_modules = {reg[name].fn.__module__ for name in prefix}
    missing = all_modules - prefix_modules
    assert not missing, f"families missing from driver prefix: {missing}"
