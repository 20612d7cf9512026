"""Structured Streaming operators (SURVEY.md §2b E14): tumbling / sliding /
session windows with watermarks over the `events` stream.

Design: each window shape is a BUILDER that accepts either a batch or a
streaming DataFrame — Structured Streaming's unified model means the same
logical plan serves both. The registry entries run the builders in batch
mode (DuckDB-oracle-checked, exploiting that a completed stream's output
== the batch query over the same data); `stream_from_dir` + tests run the
SAME builders through readStream -> watermark -> memory sink to prove the
incremental path.

Scale notes: windowed aggregation state lives in the state store keyed by
(window, group); the watermark bounds state size — without it a 100 TB/day
stream accumulates state forever. Session windows use Spark's native
session_window (merging state machine), not a custom stateful UDF.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import events_ts_codec, load_table

WATERMARK = "10 minutes"


# ---------------------------------------------------------------- builders
def tumbling_counts(events: DataFrame, width: str = "1 hour") -> DataFrame:
    return (
        events.groupBy(F.window("ts", width), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_seconds(F.col("window.start")).alias("window_start_s"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes"
) -> DataFrame:
    return (
        events.groupBy(F.window("ts", width, slide))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_seconds(F.col("window.start")).alias("window_start_s"),
            "n_events",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes") -> DataFrame:
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end")).alias(
                "session_end_us"
            ),
            "user_id",
            "n_events",
        )
    )


# ------------------------------------------------------- streaming harness
def stream_from_dir(spark: SparkSession, src_dir: str) -> DataFrame:
    """File-source stream over parquet event files (the standard pattern
    for replayable ingestion). The ts encoding (nanos-as-long vs NTZ
    micros) is detected from the staged file's footer by the SAME helper
    the batch reader uses — `events_ts_codec` — so the batch and stream
    paths can never diverge; a watermark bounds windowed state."""
    raw_schema, normalize = events_ts_codec(spark, src_dir)
    return normalize(
        spark.readStream.schema(raw_schema).parquet(src_dir)
    ).withWatermark("ts", WATERMARK)


def copy_events_to_dir(sf_dir: str, dest_dir: str) -> str:
    """Stage the events table as a file-stream source directory."""
    os.makedirs(dest_dir, exist_ok=True)
    shutil.copy(
        os.path.join(sf_dir, "events.parquet"),
        os.path.join(dest_dir, "events.parquet"),
    )
    return dest_dir


def run_stream_to_memory(
    stream_df: DataFrame, name: str, spark: SparkSession
) -> DataFrame:
    """Execute a streaming plan with availableNow (process-everything-then-
    stop) into a memory sink; returns the sink contents as a DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


# ------------------------------------------------------ registered queries
@register(
    "stream_tumbling_event_counts",
    oracle="""
SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
    AS window_start_s,
  event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""",
    headline=True,
    doc="Tumbling 1h window (E14), batch-equivalence form of the streaming "
    "plan (epoch-aligned, matching F.window).",
)
def stream_tumbling_event_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return tumbling_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_sliding_event_counts",
    oracle="""
WITH starts AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 1800000000.0) AS BIGINT) * 1800 AS w
  FROM events
  UNION ALL
  SELECT CAST(FLOOR(epoch_us(ts) / 1800000000.0) AS BIGINT) * 1800 - 1800
  FROM events
)
SELECT w AS window_start_s, COUNT(*) AS n_events
FROM starts
GROUP BY w
""",
    doc="Sliding 1h/30m window (E14): each event lands in exactly two "
    "epoch-aligned windows; the oracle enumerates them explicitly.",
)
def stream_sliding_event_counts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return sliding_counts(load_table(spark, sf_dir, "events"))


@register(
    "stream_session_windows",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
    CASE WHEN LAG(ts) OVER w IS NULL
              OR ts - LAG(ts) OVER w >= INTERVAL 5 MINUTE
         THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT epoch_us(MIN(ts)) AS session_start_us,
  epoch_us(MAX(ts) + INTERVAL 5 MINUTE) AS session_end_us,
  user_id,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    doc="Session windows, 5m gap (E14): Spark's merging session_window vs "
    "a gaps-and-islands SQL oracle. end = last event + gap (half-open).",
)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_counts(load_table(spark, sf_dir, "events"))


LATE_DELAY_US = 30 * 60 * 1_000_000  # 30-minute watermark delay
_HOUR_US = 3_600_000_000


@register(
    "stream_late_data_accounting",
    oracle=f"""
WITH arr AS (
  SELECT user_id, epoch_us(ts) AS us,
    MAX(epoch_us(ts)) OVER (
      PARTITION BY user_id ORDER BY event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
    ) AS hwm_us
  FROM events
)
SELECT (us // {_HOUR_US}) * 3600 AS window_start_s,
  CAST(SUM(CASE WHEN hwm_us IS NULL
        OR (us // {_HOUR_US} + 1) * {_HOUR_US}
           > hwm_us - {LATE_DELAY_US}
       THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted,
  CAST(SUM(CASE WHEN hwm_us IS NOT NULL
        AND (us // {_HOUR_US} + 1) * {_HOUR_US}
            <= hwm_us - {LATE_DELAY_US}
       THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped_late
FROM arr GROUP BY 1
""",
    doc="Watermark late-data accounting (E14): models Structured "
    "Streaming's drop rule — an event is dropped when its hour-window "
    "END is at or below the watermark (running max event time seen so "
    "far minus the 30-min delay) at its arrival. Arrival order is "
    "event_id within each user (mirroring per-partition watermark "
    "tracking before the global min), so the running max parallelizes "
    "per user instead of a single-partition global window. All "
    "arithmetic is integer microseconds; one Exchange(user_id) then an "
    "O(hours) aggregate.",
)
def stream_late_data_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arr = events.select(
        us.alias("us"), F.max(us).over(w).alias("hwm_us")
    )
    win_end = (F.col("us") / _HOUR_US).cast("bigint") * _HOUR_US + _HOUR_US
    dropped = F.col("hwm_us").isNotNull() & (
        win_end <= F.col("hwm_us") - LATE_DELAY_US
    )
    return (
        arr.groupBy(
            ((F.col("us") / _HOUR_US).cast("bigint") * 3600).alias(
                "window_start_s"
            )
        )
        .agg(
            F.sum(F.when(dropped, 0).otherwise(1))
            .cast("bigint")
            .alias("n_accepted"),
            F.sum(F.when(dropped, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped_late"),
        )
    )


GAP_PURCHASE_M, GAP_DEFAULT_M = 45, 5  # per-event-type session gaps


@register(
    "stream_session_dynamic_gap",
    oracle=f"""
WITH g AS (
  SELECT user_id, ts, event_id,
    epoch_us(ts) AS us,
    CASE WHEN event_type = 'purchase'
         THEN {GAP_PURCHASE_M * 60_000_000}
         ELSE {GAP_DEFAULT_M * 60_000_000} END AS gap_us
  FROM events
),
marked AS (
  SELECT user_id, us, gap_us,
    CASE WHEN MAX(us + gap_us) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) IS NULL
         OR us >= MAX(us + gap_us) OVER (
           PARTITION BY user_id ORDER BY us, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         )
    THEN 1 ELSE 0 END AS new_session
  FROM g
),
sessions AS (
  SELECT user_id, us, gap_us,
    SUM(new_session) OVER (PARTITION BY user_id ORDER BY us
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
  MIN(us) AS session_start_us,
  MAX(us + gap_us) AS session_end_us,
  COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, sid
""",
    doc="DYNAMIC-gap session windows (E14): the inactivity gap is an "
    "expression of the event (purchases hold a session open "
    f"{GAP_PURCHASE_M}m, everything else {GAP_DEFAULT_M}m) — Spark's "
    "session_window(ts, CASE...) merging state machine, which a fixed-gap "
    "sessionizer cannot express. Oracle derives the same merge from "
    "first principles: a session's end is the RUNNING MAX of ts+gap "
    "(not just last-event+gap — a long-gap event mid-session can "
    "outlive later short-gap events), and a new session starts exactly "
    "when an event's ts reaches that max (half-open intervals). All "
    "integer microseconds.",
)
def stream_session_dynamic_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit(f"{GAP_PURCHASE_M} minutes")
    ).otherwise(F.lit(f"{GAP_DEFAULT_M} minutes"))
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("session_window.start")).alias(
                "session_start_us"
            ),
            F.unix_micros(F.col("session_window.end")).alias(
                "session_end_us"
            ),
            "n_events",
        )
    )


STREAM_TOPK = 3


def topk_per_window(windowed: DataFrame, k: int = STREAM_TOPK) -> DataFrame:
    """Rank stage over an already-windowed count table: top-k event types
    per window with (count DESC, event_type) deterministic tiebreak."""
    from pyspark.sql import Window as W

    w = W.partitionBy("window_start_s").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    return (
        windowed.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
        .select("window_start_s", "rnk", "event_type", "n_events")
    )


@register(
    "stream_topk_per_window",
    oracle=f"""
WITH counts AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
      AS window_start_s,
    event_type, COUNT(*) AS n_events
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT window_start_s, event_type, n_events,
    ROW_NUMBER() OVER (PARTITION BY window_start_s
                       ORDER BY n_events DESC, event_type) AS rnk
  FROM counts
)
SELECT window_start_s, CAST(rnk AS INT) AS rnk, event_type, n_events
FROM ranked WHERE rnk <= {STREAM_TOPK}
""",
    doc=f"Streaming top-{STREAM_TOPK} trending event types per tumbling "
    "hour (E14). Ranking inside an append-mode stream is not allowed "
    "(a window's ranks are unstable until the watermark closes it), so "
    "the production split is: stage 1 = the watermark-bounded windowed "
    "count (incremental, state-store-backed — the same plan as "
    "stream_tumbling_event_counts); stage 2 = row_number over the "
    "COMPLETED windows (here: batch over the closed stream; in "
    "production: foreachBatch or a downstream batch job over the "
    "sink). tests/test_streaming.py proves stage 1 through a true "
    "readStream -> memory-sink run and re-ranks the sink to this same "
    "result. Tiebreak (count DESC, event_type) keeps ranks "
    "engine-deterministic. Top-k prunes with WindowGroupLimit before "
    "the rank's exchange — per-window state is O(types), bounded.",
)
def stream_topk_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = tumbling_counts(load_table(spark, sf_dir, "events")).drop(
        "total_value"
    )
    return topk_per_window(counts)


VALID_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")
GATE_TS_LO, GATE_TS_HI = "2024-01-01", "2024-12-31"


def gate_classify(events: DataFrame) -> DataFrame:
    """Append a `gate` column: 'ok' or the FIRST failing rule, over a
    deterministically mutated feed (event_id % 13 == 0 -> NULL value,
    % 17 == 3 -> unknown type, % 19 == 5 -> out-of-range timestamp) —
    the adversarial-input synthesis pattern shared with the bloom and
    integrity-audit queries. Works identically on a batch or streaming
    DataFrame (pure row-local expressions)."""
    mutated = events.select(
        "event_id",
        "user_id",
        F.when(F.col("event_id") % 13 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
        F.when(
            F.col("event_id") % 17 == 3,
            F.concat(F.lit("unknown_"), F.col("event_id").cast("string")),
        )
        .otherwise(F.col("event_type"))
        .alias("event_type"),
        F.when(
            F.col("event_id") % 19 == 5,
            F.col("ts") + F.expr("INTERVAL 2 YEARS"),
        )
        .otherwise(F.col("ts"))
        .alias("ts"),
    )
    return mutated.withColumn(
        "gate",
        F.when(F.col("value").isNull(), F.lit("null_value"))
        .when(~F.col("event_type").isin(*VALID_EVENT_TYPES),
              F.lit("unknown_type"))
        .when(
            ~F.col("ts").between(GATE_TS_LO, GATE_TS_HI),
            F.lit("ts_out_of_range"),
        )
        .otherwise(F.lit("ok")),
    )


@register(
    "stream_quality_gate",
    oracle=f"""
WITH mutated AS (
  SELECT event_id,
    CASE WHEN event_id % 13 = 0 THEN NULL ELSE value END AS value,
    CASE WHEN event_id % 17 = 3
         THEN 'unknown_' || CAST(event_id AS VARCHAR)
         ELSE event_type END AS event_type,
    CASE WHEN event_id % 19 = 5 THEN ts + INTERVAL 2 YEAR ELSE ts END
      AS ts
  FROM events
)
SELECT
  CASE WHEN value IS NULL THEN 'null_value'
       WHEN event_type NOT IN {VALID_EVENT_TYPES} THEN 'unknown_type'
       WHEN ts NOT BETWEEN TIMESTAMP '{GATE_TS_LO}'
                       AND TIMESTAMP '{GATE_TS_HI}'
            THEN 'ts_out_of_range'
       ELSE 'ok' END AS gate,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM mutated
GROUP BY 1 ORDER BY gate
""",
    doc="Streaming data-quality gate (E14 x DQ): classify every event "
    "against ordered validation rules (null value, unknown type, "
    "out-of-range timestamp — first failure wins) over a "
    "deterministically corrupted feed, and count per disposition. In "
    "production the same classifier runs inside foreachBatch, "
    "splitting each microbatch into the clean sink and a QUARANTINE "
    "table instead of dropping rows on the floor — "
    "tests/test_streaming.py proves the quarantine split through a "
    "true readStream run and that ok + quarantined == batch totals "
    "exactly. Row-local codegen expressions; the only shuffle carries "
    "O(4) disposition counts after partial aggregation.",
)
def stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    gated = gate_classify(load_table(spark, sf_dir, "events"))
    return (
        gated.groupBy("gate")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .orderBy("gate")
    )
