"""Custom stateful streaming operator (SURVEY.md §2b E14/E15):
per-user activity accounting via `applyInPandasWithState`.

This is the pattern for operators Spark's built-in windowed aggregates
can't express: arbitrary per-key state (here: running count / sum / last
event time per user) maintained by an Arrow-batched pandas function. The
reference has no streaming at all (absence verified, SURVEY.md §2a), so
this is pure capability extension.

Design:
  * The stateful function is incremental — each microbatch folds its rows
    into (n, total, last_us) state and emits the updated summary for the
    keys it saw. Emitted rows therefore form an UPSERT stream keyed by
    user_id; the final value per key equals the batch aggregate over the
    whole input (asserted in tests).
  * State size is O(distinct users), independent of event volume — the
    100 TB/day concern is state growth, and a fixed-width struct per key
    is the smallest possible footprint. On a real deployment, pair with
    state TTL (GroupStateTimeout) to expire idle users.
  * The registry entry runs the BATCH twin (same semantics over a bounded
    input, SQL-oracle-checked); tests drive the true incremental path
    through readStream and assert it converges to the twin.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..plans.registry import register
from ..sources.catalog import load_table

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, last_ts_us bigint"
)
STATE_SCHEMA = "n bigint, total double, last_us bigint"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this microbatch's rows for one user into running state and emit
    the refreshed summary row."""
    if state.exists:
        n, total, last_us = state.get
    else:
        n, total, last_us = 0, 0.0, 0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        last_us = max(last_us, int(pdf["ts_us"].max()))
    state.update((n, total, last_us))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 2)],
            "last_ts_us": [last_us],
        }
    )


def user_activity_stateful(stream_events: DataFrame) -> DataFrame:
    """The custom stateful operator: streaming events -> per-user upsert
    stream of (n_events, total_value, last_ts_us)."""
    prepared = stream_events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_user_state,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_stateful_user_activity",
    oracle="""
SELECT user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS total_value,
  epoch_us(MAX(ts)) AS last_ts_us
FROM events
GROUP BY user_id
""",
    doc="Batch twin of the applyInPandasWithState per-user accumulator "
    "(E14): the converged value of the upsert stream. The incremental "
    "path is proven equal in tests/test_streaming.py.",
)
def stream_stateful_user_activity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    )
