"""As-of join: the window-union implementation (registered, DuckDB-ASOF-
oracled) and the cogrouped merge_asof implementation must agree row-for-row
— two independent formulations of the same operator."""

from __future__ import annotations

from hbase_hadoop_flightsearch_spark.operators.asof import (
    asof_join_events_orders,
    asof_merge_pandas,
)


def test_asof_implementations_agree(spark, sf_correctness):
    window_impl = sorted(
        map(tuple, asof_join_events_orders(spark, sf_correctness).collect())
    )
    cogroup_impl = sorted(
        map(tuple, asof_merge_pandas(spark, sf_correctness).collect())
    )
    assert window_impl, "as-of join returned nothing"
    assert window_impl == cogroup_impl
    # At this SF every event has a prior order (orders start years before
    # events), so matches must be total — a regression to "no match found"
    # (all NULL) would still satisfy pure agreement, this catches it.
    assert all(r[3] is not None for r in window_impl)
