"""Ties-everywhere adversarial property tests for the forward-as-of family
(VERDICT r14 #4).

`operators/asof.py::forward_running_window` evaluates the forward as-of
frame as a running last(ignorenulls) over the REVERSED sort — exact only
when rows tied on the full sort key carry no conflicting non-null
payloads. That invariant was comment-enforced; these tests make it
structural evidence:

1. Frame-level: for each sort-key/payload shape the production consumers
   actually use, a heavily-tied random tagged frame is evaluated through
   BOTH the reversed-sort running frame and the literal O(partition^2)
   `(currentRow, unboundedFollowing)` frame, row-for-row.
2. End-to-end: every consumer (the as-of query family, time-to-convert,
   multitouch attribution) runs over a ties-everywhere corpus — multiple
   views/clicks/purchases/orders at IDENTICAL microseconds per user —
   and must match its unchanged DuckDB oracle, which computes forward
   semantics natively.
"""

from __future__ import annotations

import datetime as dt
import random
import shutil

import pytest

pytestmark = pytest.mark.deep  # driver-default deselected tier (pytest.ini, VERDICT r15 #6)

from pyspark.sql import Window
from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.operators.asof import (
    forward_running_window,
)
from hbase_hadoop_flightsearch_spark.plans.registry import load_all
from hbase_hadoop_flightsearch_spark.schemas import TABLE_NAMES

from .conftest import SF_SMOKE
from .oracle_utils import compare_query_to_oracle

CONSUMERS = [
    "asof_join_events_orders",
    "asof_join_forward_next_purchase",
    "asof_join_tolerance",
    "asof_join_nearest_purchase",
    "events_time_to_convert_pctl",
    "events_multitouch_attribution",
]


def _literal_forward_window(partition_col, order_cols):
    """The O(partition^2) frame forward_running_window replaces — the
    semantic ground truth (first non-null from the current row to the
    partition end in FORWARD sort order)."""
    return (
        Window.partitionBy(partition_col)
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )


def _tagged_ties_frame(spark, payload_equals_ts: bool, seed: int):
    """Random union-tagged frame in the consumers' exact shape, with ~6
    distinct ts values per user so nearly every row is tied. Payload rows
    (is_left=0) carry p_id/p_ts; left rows carry NULLs. When
    `payload_equals_ts`, tied payload rows share an equal payload (the
    events_time_to_convert shape: order key (ts_us, is_left) is NOT
    unique across simultaneous purchases, but their payload p_ts == ts_us
    is identical, so the reversal stays exact)."""
    rng = random.Random(seed)
    rows = []
    rid = 0
    for user in range(1, 13):
        for _ in range(rng.randint(10, 60)):
            rid += 1
            ts = rng.choice([100, 200, 300, 400, 500, 600])
            if rng.random() < 0.5:
                rows.append((user, ts, 1, rid, None, None))
            else:
                rows.append(
                    (user, ts, 0, None, rid, ts if payload_equals_ts
                     else ts * 10 + (rid if not payload_equals_ts else 0))
                )
    return spark.createDataFrame(
        rows,
        "user_id bigint, ts_us bigint, is_left int, event_id bigint, "
        "p_id bigint, p_ts bigint",
    )


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_reversed_frame_equals_literal_forward_frame_unique_key(
    spark, seed
):
    """Production shape A (asof_join_forward_next_purchase /
    asof_join_nearest_purchase): order (ts_us, is_left, p_id). p_id is
    unique on payload rows, so ONLY null-payload left rows can tie —
    reversal must be exact row-for-row."""
    df = _tagged_ties_frame(spark, payload_equals_ts=False, seed=seed)
    order = ["ts_us", "is_left", "p_id"]
    fast = forward_running_window("user_id", order)
    slow = _literal_forward_window("user_id", order)
    out = df.select(
        "user_id", "ts_us", "is_left", "event_id",
        F.last("p_id", ignorenulls=True).over(fast).alias("got_id"),
        F.first("p_id", ignorenulls=True).over(slow).alias("want_id"),
        F.last("p_ts", ignorenulls=True).over(fast).alias("got_ts"),
        F.first("p_ts", ignorenulls=True).over(slow).alias("want_ts"),
    ).collect()
    assert out
    for r in out:
        assert r.got_id == r.want_id and r.got_ts == r.want_ts, r


@pytest.mark.parametrize("seed", [4, 5, 6])
def test_reversed_frame_equals_literal_forward_frame_equal_payloads(
    spark, seed
):
    """Production shape B (events_time_to_convert_pctl): order
    (ts_us, is_left) is NOT unique — simultaneous purchases tie — but
    each tied payload row carries the identical payload (p_ts == ts_us),
    the other leg of the invariant."""
    df = _tagged_ties_frame(spark, payload_equals_ts=True, seed=seed)
    order = ["ts_us", "is_left"]
    fast = forward_running_window("user_id", order)
    slow = _literal_forward_window("user_id", order)
    out = df.select(
        F.last("p_ts", ignorenulls=True).over(fast).alias("got"),
        F.first("p_ts", ignorenulls=True).over(slow).alias("want"),
    ).collect()
    assert out
    assert all(r.got == r.want for r in out)


def test_invariant_violation_is_detectable(spark):
    """Negative control: with a non-unique sort key AND conflicting
    payloads on tied rows (the exact shape the docstring forbids), the
    reversed frame genuinely diverges from the literal forward frame —
    proving these property tests would catch a future consumer that
    breaks the contract, rather than passing vacuously."""
    df = spark.createDataFrame(
        [(1, 100, 0, 11, 1111), (1, 100, 0, 12, 2222), (1, 50, 1, None, None)],
        "user_id bigint, ts_us bigint, is_left int, p_id bigint, p_ts bigint",
    )
    order = ["ts_us", "is_left"]  # ties on BOTH payload rows, p_id differs
    fast = forward_running_window("user_id", order)
    slow = _literal_forward_window("user_id", order)
    out = df.select(
        F.last("p_id", ignorenulls=True).over(fast).alias("got"),
        F.first("p_id", ignorenulls=True).over(slow).alias("want"),
    ).collect()
    assert any(r.got != r.want for r in out)


@pytest.fixture(scope="module")
def ties_corpus(tmp_path_factory):
    """Corpus where EVERY interesting timestamp is contested: per user,
    2 views + 2 clicks + 2 purchases at each of six identical instants
    (plus +1us near-misses), and per customer multiple orders sharing an
    o_orderdate. Non-event tables come from sf0.001 so every oracle's
    view registry resolves."""
    import pandas as pd

    d = tmp_path_factory.mktemp("ties_corpus")
    for t in TABLE_NAMES:
        if t not in ("events", "orders"):
            shutil.copy(f"{SF_SMOKE}/{t}.parquet", d / f"{t}.parquet")

    base = dt.datetime(2024, 3, 1, 0, 0, 0)
    instants = [base + dt.timedelta(hours=6 * k) for k in range(6)]
    ev, eid = [], 0
    for user in range(1, 9):
        for i, t in enumerate(instants):
            for etype in ("view", "view", "click", "click",
                          "purchase", "purchase"):
                eid += 1
                # user 7 never purchases; user 8 purchases only at the
                # final instant (forward-NULL tails)
                if etype == "purchase" and (
                    user == 7 or (user == 8 and i < 5)
                ):
                    continue
                ev.append((eid, t, user, etype,
                           round((eid % 700) / 7.0, 2), "{}"))
            # near-miss rows 1us after the contested instant
            eid += 1
            ev.append((eid, t + dt.timedelta(microseconds=1), user,
                       "view", 1.0, "{}"))
    # Write MICROSECOND timestamps: pandas' default timestamp[ns] would be
    # read as raw long under the session's legacy.parquet.nanosAsLong
    # conf (only events has the nanos codec; orders does not).
    edf = pd.DataFrame(
        ev, columns=["event_id", "ts", "user_id", "event_type",
                     "value", "props"],
    )
    edf["ts"] = edf["ts"].astype("datetime64[us]")
    edf.to_parquet(d / "events.parquet", index=False)

    orders, okey = [], 0
    for cust in range(1, 9):
        for i, t in enumerate(instants):
            for _ in range(3 if i % 2 == 0 else 1):  # tied o_orderdate
                okey += 1
                orders.append((okey, cust, "O", 100.0 + okey, t, "1-URGENT"))
    odf = pd.DataFrame(
        orders, columns=["o_orderkey", "o_custkey", "o_orderstatus",
                         "o_totalprice", "o_orderdate", "o_orderpriority"],
    )
    odf["o_orderdate"] = odf["o_orderdate"].astype("datetime64[us]")
    odf.to_parquet(d / "orders.parquet", index=False)
    return str(d)


@pytest.mark.parametrize("name", CONSUMERS)
def test_consumer_matches_oracle_on_ties_corpus(spark, ties_corpus, name):
    """Every forward_running_window consumer (and the backward-frame
    multitouch sibling) value-matches its unchanged DuckDB oracle on the
    ties-everywhere corpus — end-to-end proof that the reversal trick
    survives same-instant collisions at every call site."""
    compare_query_to_oracle(spark, load_all()[name], ties_corpus)
