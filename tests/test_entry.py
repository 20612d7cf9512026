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
