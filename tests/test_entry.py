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


def test_query_order_drains_unchecked_tail_first():
    """The driver samples a ~50-query prefix of queries(); while queries
    exist that the driver has never value-hashed green (VERDICT r4 #4),
    the prefix must be PACKED with them — never-checked/failed members
    lead, interleaved across their families — so the unchecked tail
    drains in ~1-2 rounds. Once the tail empties, the ordering reverts to
    the pure family interleave and the every-family-in-50 invariant below
    takes over."""
    from hbase_hadoop_flightsearch_spark.plans.registry import load_all

    reg = load_all()
    checked = entrymod._driver_checked_names()
    unchecked = [n for n in reg if n not in checked]
    prefix = list(entrymod.queries())[:50]
    if len(unchecked) >= 50:
        n_new = sum(1 for n in prefix if n not in checked)
        assert n_new == 50, f"only {n_new}/50 prefix slots are unchecked"
        # Age priority (r7): unchecked queries that existed at the r6
        # manifest drain BEFORE this round's additions, so the prefix
        # draws from the LEGACY pool while it lasts; the family-spread
        # invariant applies to whichever pool feeds the prefix.
        legacy = entrymod._r6_manifest_names()
        pool = [n for n in unchecked if n in legacy] or unchecked
        if len(pool) >= 50:
            assert all(n in legacy for n in prefix) or pool is unchecked, (
                "prefix admitted new-round names while >= 50 legacy "
                "unchecked names remain"
            )
        pool_modules = {reg[n].fn.__module__ for n in pool[:50] or pool}
        prefix_modules = {reg[n].fn.__module__ for n in prefix}
        n_fam = len({reg[n].fn.__module__ for n in pool})
        assert len(prefix_modules) >= min(n_fam, 20, len(pool_modules)), (
            f"prefix spans {len(prefix_modules)} of {n_fam} pool "
            "families — interleave broken"
        )
    else:
        # Tail (nearly) drained: every family must appear in the 50.
        all_modules = {q.fn.__module__ for q in reg.values()}
        missing = all_modules - {reg[n].fn.__module__ for n in prefix}
        assert not missing, f"families missing from driver prefix: {missing}"


def test_failed_queries_lead_the_ordering():
    """A query that failed its most recent driver check must sit at the
    very front so even the smallest driver prefix re-verifies the fix."""
    failed = entrymod._driver_failed_names()
    order = list(entrymod.queries())
    for name in failed:
        assert order.index(name) < len(failed), (
            f"{name} failed last round but is not at the front"
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
