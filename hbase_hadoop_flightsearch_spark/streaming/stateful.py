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

from ..operators.timeseries import ZSCORE_LOOKBACK, ZSCORE_MIN_N, ZSCORE_Z
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


# ---------------------------------------------------------------------------
# transformWithStateInPandas — Spark 4's successor to applyInPandasWithState:
# a StatefulProcessor object with typed state handles (ValueState/ListState/
# MapState), timers, and optional per-state TTL. Requires the RocksDB state
# store provider (the scale-grade store). Implementing the same accounting
# on BOTH APIs proves the engine tracks the current-generation operator
# surface, not just the legacy one.
#
# Environment note: the transformWithState runtime spawns a Python state
# server that talks protobuf to the JVM, so `google.protobuf` must be on
# the worker PYTHONPATH. The test suite shims a pure-Python protobuf
# runtime found on this box (tests/conftest.py) and the incremental
# RocksDB-backed run executes for real, converging to the batch twin
# (test_transform_with_state_converges_to_batch). On a box with neither
# pip protobuf nor the shim source, that one test importorskips; the
# batch twin below is oracle-checked either way, and the legacy
# applyInPandasWithState operator above also proves incremental
# convergence.

TWS_OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "first_ts_us bigint, last_ts_us bigint"
)


def _make_activity_processor():
    """Factory (deferred import: StatefulProcessor needs pyspark >= 4)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserActivitySpanProcessor(StatefulProcessor):
        """Per-user running (count, sum, first/last event time) held in a
        single fixed-width ValueState — state is O(users), never
        O(events). Emits the refreshed summary for keys seen in the
        microbatch (upsert stream, converges to the batch aggregate)."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "activity",
                "n bigint, total double, first_us bigint, last_us bigint",
            )

        def handleInputRows(self, key, rows, timerValues):
            if self._state.exists():
                n, total, first_us, last_us = self._state.get()
            else:
                n, total, first_us, last_us = 0, 0.0, None, 0
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                lo, hi = int(pdf["ts_us"].min()), int(pdf["ts_us"].max())
                first_us = lo if first_us is None else min(first_us, lo)
                last_us = max(last_us, hi)
            self._state.update((n, total, first_us, last_us))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "first_ts_us": [first_us],
                    "last_ts_us": [last_us],
                }
            )

        def close(self) -> None:
            pass

    return UserActivitySpanProcessor()


def user_activity_tws(stream_events: DataFrame) -> DataFrame:
    """transformWithStateInPandas twin of `user_activity_stateful`, plus
    first-seen tracking. Caller must enable the RocksDB state store
    provider (transformWithState requires it)."""
    prepared = stream_events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us")
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_activity_processor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


@register(
    "stream_tws_user_activity_span",
    oracle="""
SELECT user_id,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS total_value,
  epoch_us(MIN(ts)) AS first_ts_us,
  epoch_us(MAX(ts)) AS last_ts_us
FROM events
GROUP BY user_id
""",
    doc="Batch twin of the transformWithStateInPandas per-user span "
    "accumulator (E14, Spark 4 StatefulProcessor API with RocksDB-backed "
    "ValueState): converged value of the upsert stream incl. first/last "
    "seen. Incremental path proven equal in tests/test_streaming.py.",
)
def stream_tws_user_activity_span(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
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


# ---------------------------------------------------------------------------
# Streaming rolling z-score anomaly detection (twin of ts_anomaly_zscore)
# ---------------------------------------------------------------------------

ANOM_OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, "
    "value double, baseline_n bigint"
)
ANOM_STATE_SCHEMA = "buf array<bigint>"


def _update_anomaly_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user ring buffer of the trailing 20 cents values; each arriving
    event is judged against the buffer BEFORE being pushed (the batch
    operator's current-row exclusion), using the same exact-integer
    inequality — Python ints are arbitrary-precision, so the arithmetic
    is identical to the BIGINT plan."""
    from ..operators.timeseries import (
        ZSCORE_LOOKBACK,
        ZSCORE_MIN_N,
        ZSCORE_Z,
    )

    buf = list(state.get[0]) if state.exists else []
    out: list[dict] = []
    batch = pd.concat(list(pdfs), ignore_index=True)
    batch = batch.sort_values(["ts_us", "event_id"])
    for row in batch.itertuples(index=False):
        x = int(row.cents)
        n = len(buf)
        if n >= ZSCORE_MIN_N:
            s = sum(buf)
            q = sum(v * v for v in buf)
            dev = n * x - s
            if dev * dev * (n - 1) > ZSCORE_Z * ZSCORE_Z * n * (n * q - s * s):
                out.append(
                    {
                        "event_id": int(row.event_id),
                        "user_id": int(row.user_id),
                        "event_type": row.event_type,
                        "value": float(row.value),
                        "baseline_n": n,
                    }
                )
        buf.append(x)
        if len(buf) > ZSCORE_LOOKBACK:
            buf.pop(0)
    state.update((buf,))
    if out:
        yield pd.DataFrame(out)


def anomaly_zscore_stateful(stream_events: DataFrame) -> DataFrame:
    """Streaming twin of `anomaly_zscore`: an append stream of anomalous
    events. State is O(users) fixed-width ring buffers — the minimal
    footprint for trailing-window judgment; pair with state TTL on a
    real deployment."""
    prepared = stream_events.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _update_anomaly_state,
        outputStructType=ANOM_OUTPUT_SCHEMA,
        stateStructType=ANOM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


@register(
    "stream_anomaly_zscore",
    oracle=f"""
WITH cents AS (
  SELECT event_id, user_id, ts, value, event_type,
         CAST(round(value * 100) AS BIGINT) AS x
  FROM events
),
framed AS (
  SELECT event_id, user_id, value, event_type, x,
    SUM(x) OVER w AS s,
    SUM(x * x) OVER w AS q,
    COUNT(*) OVER w AS n
  FROM cents
  WINDOW w AS (
    PARTITION BY user_id ORDER BY ts, event_id
    ROWS BETWEEN {ZSCORE_LOOKBACK} PRECEDING AND 1 PRECEDING
  )
)
SELECT event_id, user_id, event_type, value,
       CAST(n AS BIGINT) AS baseline_n
FROM framed
WHERE n >= {ZSCORE_MIN_N}
  AND (n * x - s) * (n * x - s) * (n - 1)
      > {ZSCORE_Z * ZSCORE_Z} * n * (n * q - s * s)
""",
    doc="Batch twin of the streaming rolling-z-score anomaly detector "
    "(E14): applyInPandasWithState holds a per-user 20-value ring buffer "
    "and judges each event with the SAME exact-integer inequality as the "
    "batch window plan, so the streaming and batch answers are "
    "bit-identical on ordered input — proven across multi-microbatch "
    "replay in tests/test_streaming.py.",
)
def stream_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import anomaly_zscore

    return anomaly_zscore(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# transformWithState with EVENT-TIME TIMERS + ListState: session close-out
# ---------------------------------------------------------------------------
# The second current-gen StatefulProcessor, covering the API surface the
# span accumulator doesn't: event-time timeMode, per-key timer
# registration/deletion, handleExpiredTimer emission, and ListState. A
# session (gap > TWS_SESSION_GAP_US) closes in one of two ways — a later
# in-key event proves the gap (emitted from handleInputRows), or the
# WATERMARK passes end + gap with no such event and the registered timer
# fires (emitted from handleExpiredTimer). State per key is one
# fixed-width ValueState + a <=3-element ListState (the session's top-3
# event values) — O(users), never O(events).

TWS_SESSION_GAP_US = 21_600_000_000  # 6 h: the events fixture is sparse
# (~67 events/user over 30 days), so a sub-hour gap would make every
# session a singleton; 6 h yields real multi-event sessions for heavy
# users while staying semantically a "session".
TWS_TOP_N = 3


def _make_session_processor():
    """Factory (deferred import: StatefulProcessor needs pyspark >= 4)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    gap_us = TWS_SESSION_GAP_US

    class SessionTimerProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._sess = handle.getValueState(
                "sess", "start_us bigint, end_us bigint, n bigint, "
                "total double",
            )
            self._top = handle.getListState("top3", "v double")

        def _row(self, key) -> pd.DataFrame:
            start, end, n, total = self._sess.get()
            top = sorted(
                (r[0] for r in self._top.get()), reverse=True
            )[:TWS_TOP_N]
            self._sess.clear()
            self._top.clear()
            return pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "session_start_us": [start],
                    "session_end_us": [end],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                    "top3_sum": [round(sum(top), 2)],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            evs = []
            for pdf in rows:
                evs.extend(
                    zip(pdf["ts_us"].astype("int64"), pdf["value"])
                )
            evs.sort()
            out = []
            for t, v in evs:
                t = int(t)
                if self._sess.exists():
                    start, end, n, total = self._sess.get()
                    if t - end > gap_us:  # in-key gap proof: close now
                        out.append(self._row(key))
                        start, end, n, total = t, t, 0, 0.0
                else:
                    start, end, n, total = t, t, 0, 0.0
                self._sess.update(
                    (start, max(end, t), n + 1, total + float(v))
                )
                top = sorted(
                    [r[0] for r in self._top.get()] + [float(v)],
                    reverse=True,
                )[:TWS_TOP_N]
                self._top.put([(x,) for x in top])
            # re-arm: exactly one live timer per key, at end + gap
            for old in self._handle.listTimers():
                self._handle.deleteTimer(old)
            end_ms = self._sess.get()[1] // 1000
            self._handle.registerTimer(end_ms + gap_us // 1000)
            yield from iter(out)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # Guard against a stale timer racing a same-batch extension:
            # only close if the expiry really covers end + gap.
            if self._sess.exists():
                end_ms = self._sess.get()[1] // 1000
                if expiredTimerInfo.getExpiryTimeInMs() >= (
                    end_ms + TWS_SESSION_GAP_US // 1000
                ):
                    yield self._row(key)

        def close(self) -> None:
            pass

    return SessionTimerProcessor()


TWS_SESSION_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, total_value double, top3_sum double"
)


def user_sessions_tws(stream_events: DataFrame) -> DataFrame:
    """transformWithStateInPandas sessionization with event-time timers.
    Caller must enable the RocksDB state store provider and the input
    must carry a watermark (timeMode='EventTime')."""
    prepared = stream_events.select(
        "user_id", "value", F.unix_micros("ts").alias("ts_us"), "ts"
    )
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_session_processor(),
        outputStructType=TWS_SESSION_SCHEMA,
        outputMode="Append",
        timeMode="EventTime",
    )


@register(
    "stream_tws_sessions_top3",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS tus, value FROM events
),
lagd AS (
  SELECT *, LAG(tus) OVER (PARTITION BY user_id ORDER BY tus) AS prev
  FROM e
),
marks AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR tus - prev > {TWS_SESSION_GAP_US} THEN 1 ELSE 0
            END AS new_s
  FROM lagd
),
sess AS (
  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY tus
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marks
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
                               ORDER BY value DESC, tus) AS vr
  FROM sess
)
SELECT user_id,
  MIN(tus) AS session_start_us,
  MAX(tus) AS session_end_us,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 2) AS total_value,
  ROUND(SUM(CASE WHEN vr <= {TWS_TOP_N} THEN value ELSE 0 END), 2)
    AS top3_sum
FROM ranked
GROUP BY user_id, sid
""",
    doc="Batch twin of the timer-closing transformWithState "
    "sessionization (E14, Spark 4 StatefulProcessor with EVENT-TIME "
    f"TIMERS + ListState): {TWS_SESSION_GAP_US // 3_600_000_000}h-gap "
    "sessions per user with event count, value total, and top-3 value "
    "sum (the ListState's job — a metric a plain running aggregate "
    "can't keep). Batch plan is the gaps-and-islands classic: LAG gap "
    "marks -> running-sum session ids -> per-session aggregates + "
    "windowed top-3. The incremental path — sessions closed by "
    "in-key gap proof OR by the watermark-driven timer — is proven "
    "against this twin across multi-microbatch replay in "
    "tests/test_streaming.py.",
)
def stream_tws_sessions_top3(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    e = events.select(
        "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("tus")
    marks = e.withColumn("prev", F.lag("tus").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("tus") - F.col("prev") > TWS_SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    sess = marks.withColumn(
        "sid",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    ranked = sess.withColumn(
        "vr",
        F.row_number().over(
            Window.partitionBy("user_id", "sid").orderBy(
                F.desc("value"), F.asc("tus")
            )
        ),
    )
    return ranked.groupBy("user_id", "sid").agg(
        F.min("tus").alias("session_start_us"),
        F.max("tus").alias("session_end_us"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.round(
            F.sum(
                F.when(F.col("vr") <= TWS_TOP_N, F.col("value")).otherwise(
                    0.0
                )
            ),
            2,
        ).alias("top3_sum"),
    ).drop("sid")


# ---------------------------------------------------------------------------
# transformWithState with MapState (+ TTL plumbing): per-key sub-keyed stats
# ---------------------------------------------------------------------------
# Completes the typed-state surface: ValueState (span accumulator above),
# ListState + timers (session close-out above), and here MapState — the
# handle for per-key SUB-keyed state (user x event_type) without blowing
# the grouping key up into (user, type) and paying a wider shuffle for
# every downstream per-user consumer. State stays O(users x live types);
# the TTL argument is exercised with a deliberately huge duration so the
# plumbing runs while convergence stays deterministic (TTL expiry is
# processing-time-driven and belongs to ops, not semantics).

TWS_MAP_TTL_MS = 24 * 3600 * 1000


def _make_type_stats_processor():
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserTypeStatsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._m = handle.getMapState(
                "per_type",
                "event_type string",
                "n bigint, total double",
                ttlDurationMs=TWS_MAP_TTL_MS,
            )

        def handleInputRows(self, key, rows, timerValues):
            touched = {}
            for pdf in rows:
                for et, grp in pdf.groupby("event_type"):
                    et = str(et)
                    if self._m.containsKey((et,)):
                        n, total = self._m.getValue((et,))
                    else:
                        n, total = 0, 0.0
                    n += len(grp)
                    total += float(grp["value"].sum())
                    self._m.updateValue((et,), (n, total))
                    touched[et] = (n, total)
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(touched),
                    "event_type": list(touched),
                    "n_events": [v[0] for v in touched.values()],
                    "total_value": [
                        round(v[1], 2) for v in touched.values()
                    ],
                }
            )

        def close(self) -> None:
            pass

    return UserTypeStatsProcessor()


def user_type_stats_tws(stream_events: DataFrame) -> DataFrame:
    """transformWithStateInPandas with MapState: per-user map of
    event_type -> (count, value sum). Requires the RocksDB provider."""
    prepared = stream_events.select("user_id", "event_type", "value")
    return prepared.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_type_stats_processor(),
        outputStructType="user_id bigint, event_type string, "
        "n_events bigint, total_value double",
        outputMode="Update",
        timeMode="ProcessingTime",  # TTL requires a time mode; no timers
    )


@register(
    "stream_tws_user_type_stats",
    oracle="""
SELECT user_id, event_type,
  CAST(COUNT(*) AS BIGINT) AS n_events,
  ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY user_id, event_type
""",
    doc="Batch twin of the MapState transformWithState accumulator "
    "(E14; completes the typed-state triple: ValueState span, "
    "ListState+timers sessions, and MapState here): per-user map of "
    "event_type -> (count, value sum), the sub-keyed-state pattern "
    "that avoids widening the grouping key for every downstream "
    "per-user consumer. The TTL argument is exercised (24h) so the "
    "state-server TTL plumbing runs, while convergence stays "
    "deterministic. Incremental RocksDB run proven equal to this twin "
    "in tests/test_streaming.py.",
)
def stream_tws_user_type_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
