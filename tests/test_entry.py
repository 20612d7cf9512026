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


def test_query_order_covers_every_family_at_any_seed(monkeypatch):
    """Family coverage in the 50-prefix must be invariant under the
    rotation seed — the first round-robin pass takes one query per module
    regardless of where the rotation starts."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    reg = load_all()
    all_modules = {q.fn.__module__ for q in reg.values()}
    for seed in range(0, 25, 3):
        monkeypatch.setattr(entrymod, "_round_seed", lambda s=seed: s)
        prefix = list(entrymod.queries())[:50]
        prefix_modules = {reg[name].fn.__module__ for name in prefix}
        assert all_modules <= prefix_modules, (
            f"seed {seed}: missing {all_modules - prefix_modules}"
        )


def test_prefix_rotates_vs_recorded_round3():
    """The rotation must actually change the driver's checked set: the
    current 50-prefix may not equal the r3-recorded one (keys of
    CORRECTNESS_r03.json), and the seed must move as rounds accrue."""
    import json
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "CORRECTNESS_r03.json")) as f:
        r3_prefix = list(json.load(f))
    assert entrymod._round_seed() >= 3  # r1-r3 artifacts are checked in
    now_prefix = list(entrymod.queries())[: len(r3_prefix)]
    assert now_prefix != r3_prefix, "prefix composition did not rotate"
    # Rotation re-orders the sweep; it must not drop the flagship.
    assert "flight_delay_report" in entrymod.queries()
