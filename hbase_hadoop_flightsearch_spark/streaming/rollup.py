"""Incremental hourly rollup — a continuous aggregate maintained by
`foreachBatch` (the hypertable-rollup pattern, e.g. TimescaleDB continuous
aggregates, re-expressed Spark-first).

Shape: stream -> per-microbatch partial aggregate -> MERGE into a
materialized rollup table keyed by (window_start, event_type). Readers get
O(windows) rows instead of re-scanning O(events) — at 100 TB/day of events
the rollup is what makes dashboard-latency queries possible at all.

Delivery guarantee — EXACTLY-ONCE via versioned commits: each microbatch
writes its merged state to a batch-id-named directory
(`batch-<id>/` + Spark's `_SUCCESS` marker as the commit record), reading
its predecessor as "the newest COMMITTED version with id < this batch".
A crash between the state write and the checkpoint commit replays the
batch, which recomputes the identical merge from the identical
predecessor and overwrites its OWN version directory — idempotent, so
replay cannot double-count the additive fields (n/sums/cents). This is
the same txn-version idea as Delta's idempotent `foreachBatch` writes
(`txnAppId`/`txnVersion`), built on plain parquet; on a real deployment
the bodies below become Delta/Iceberg `MERGE INTO` with that option.

The registered query is the batch twin (full-input rollup, SQL-oracled);
tests drive the incremental path over multiple microbatches and assert it
converges to the twin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import events_ts_codec, load_table


def hourly_rollup(events: DataFrame) -> DataFrame:
    """The rollup aggregate: additive partials only (count/sum), so batch
    partials merge losslessly into the materialized table."""
    return (
        events.groupBy(
            F.unix_seconds(F.window("ts", "1 hour").start).alias(
                "window_start_s"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
    )


def _committed_versions(state_path: str) -> list[int]:
    """Batch ids whose version directory carries Spark's `_SUCCESS`
    commit marker (a half-written dir from a crash has none)."""
    if not os.path.isdir(state_path):
        return []
    out = []
    for name in os.listdir(state_path):
        if name.startswith("batch-") and os.path.exists(
            os.path.join(state_path, name, "_SUCCESS")
        ):
            out.append(int(name.split("-", 1)[1]))
    return sorted(out)


def read_state(spark: SparkSession, state_path: str) -> DataFrame:
    """Read the newest committed version of a versioned state table."""
    versions = _committed_versions(state_path)
    if not versions:
        raise FileNotFoundError(f"no committed state under {state_path}")
    return spark.read.parquet(
        os.path.join(state_path, f"batch-{versions[-1]:09d}")
    )


def _versioned_merge(state_path: str, aggregate, combine):
    """Exactly-once foreachBatch body: merge this batch's `aggregate`
    partials with the newest committed version OLDER than this batch
    (replay leftovers with id >= batch_id are ignored), then overwrite
    this batch's own version dir — replays are byte-idempotent."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = aggregate(batch_df)
        prev = [v for v in _committed_versions(state_path) if v < batch_id]
        if prev:
            prev_df = spark.read.parquet(
                os.path.join(state_path, f"batch-{prev[-1]:09d}")
            )
            partial = combine(prev_df, partial)
        partial.write.mode("overwrite").parquet(
            os.path.join(state_path, f"batch-{batch_id:09d}")
        )
        # Prune all but the two newest committed versions (best-effort).
        import shutil

        for v in _committed_versions(state_path)[:-2]:
            shutil.rmtree(
                os.path.join(state_path, f"batch-{v:09d}"),
                ignore_errors=True,
            )

    return merge


def _merge_batch(rollup_path: str):
    """foreachBatch body: combine this batch's partials with the table."""

    def combine(current: DataFrame, partial: DataFrame) -> DataFrame:
        return (
            current.unionByName(partial)
            .groupBy("window_start_s", "event_type")
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").alias("sum_value"),
            )
        )

    return _versioned_merge(rollup_path, hourly_rollup, combine)


def run_incremental_rollup(
    spark: SparkSession, src_dir: str, rollup_path: str, ckpt: str
) -> None:
    """Drive the stream (availableNow) through foreachBatch merges. The ts
    encoding is footer-detected via the shared `events_ts_codec` helper so
    this reader tracks the batch path exactly."""
    raw_schema, normalize = events_ts_codec(spark, src_dir)
    stream = normalize(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_merge_batch(rollup_path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@register(
    "rollup_hourly_events",
    oracle="""
SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
    AS window_start_s,
  event_type,
  COUNT(*) AS n_events,
  ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
""",
    doc="Continuous-aggregate rollup (batch twin): hourly (window, type) "
    "partials. The incremental foreachBatch MERGE path is proven "
    "convergent in tests/test_streaming.py.",
)
def rollup_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hourly_rollup(load_table(spark, sf_dir, "events")).withColumn(
        "sum_value", F.round("sum_value", 2)
    )


@register(
    "batch_merge_upsert_rollup",
    oracle="""
WITH cut AS (
  SELECT epoch_us(MIN(ts)) + 3 * (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 5
      AS cut_hi,
    epoch_us(MIN(ts)) + 2 * (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 5
      AS cut_lo
  FROM events
),
old_t AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
      AS window_start_s,
    event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
  FROM events, cut WHERE epoch_us(ts) < cut_hi GROUP BY 1, 2
),
inc AS (
  SELECT CAST(FLOOR(epoch_us(ts) / 3600000000.0) AS BIGINT) * 3600
      AS window_start_s,
    event_type, COUNT(*) AS n_events, SUM(value) AS sum_value
  FROM events, cut WHERE epoch_us(ts) >= cut_lo GROUP BY 1, 2
)
SELECT window_start_s, event_type,
  CASE WHEN o.n_events IS NULL THEN 'insert'
       WHEN n.n_events IS NULL THEN 'keep'
       ELSE 'update' END AS merge_action,
  CAST(COALESCE(o.n_events, 0) + COALESCE(n.n_events, 0) AS BIGINT)
    AS n_events,
  ROUND(COALESCE(o.sum_value, 0) + COALESCE(n.sum_value, 0), 2)
    AS sum_value
FROM old_t o FULL OUTER JOIN inc n USING (window_start_s, event_type)
""",
    doc="Batch MERGE INTO-style upsert of a materialized rollup (the "
    "r11 #6 gap: the batch twin of this module's foreachBatch merge). "
    "The 'table' is the hourly rollup of the oldest 60% of the event "
    "log's ts range; the 'increment' is the newest 60%'s partials "
    "(cut points are O(1)-result bounds carried in-plan on a 1-row "
    "broadcast; the deliberate 20% overlap guarantees all three merge "
    "actions appear at every SF). The merge is what Delta/Iceberg compile "
    "MERGE INTO to: full outer join on the rollup key, additive fields "
    "combined, with merge_action exposing the three-way semantics "
    "(WHEN MATCHED -> update, WHEN NOT MATCHED -> insert, untouched "
    "table rows -> keep). At 100 TB both sides partial-aggregate "
    "map-side before the one key shuffle; the increment is typically "
    "<< the table so AQE broadcasts it, and with the table bucketed on "
    "the merge key the table-side exchange disappears entirely (same "
    "posture as operators/cdc.py's row-level merge).",
)
def batch_merge_upsert_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bounds = events.agg(
        F.expr(
            "unix_micros(min(ts)) + 3 * (unix_micros(max(ts)) "
            "- unix_micros(min(ts))) div 5"
        ).alias("cut_hi"),
        F.expr(
            "unix_micros(min(ts)) + 2 * (unix_micros(max(ts)) "
            "- unix_micros(min(ts))) div 5"
        ).alias("cut_lo"),
    )
    ev = events.crossJoin(F.broadcast(bounds))
    old_t = hourly_rollup(ev.filter(F.unix_micros("ts") < F.col("cut_hi")))
    inc = hourly_rollup(ev.filter(F.unix_micros("ts") >= F.col("cut_lo")))
    return merge_rollup(old_t, inc)


def merge_rollup(old_t: DataFrame, inc: DataFrame) -> DataFrame:
    """The MERGE INTO join itself, over any physical rollup input —
    shared by batch_merge_upsert_rollup (in-plan aggregate table side)
    and the bucketed-table plan contract in test_cdc.py, which proves
    the docstring's claim: when old_t is a table bucketed on the merge
    key, its side of this full-outer join plans with NO Exchange."""
    keys = ["window_start_s", "event_type"]
    merged = old_t.select(
        *keys,
        F.col("n_events").alias("o_n"),
        F.col("sum_value").alias("o_s"),
    ).join(
        inc.select(
            *keys,
            F.col("n_events").alias("i_n"),
            F.col("sum_value").alias("i_s"),
        ),
        keys,
        "full_outer",
    )
    return merged.select(
        *keys,
        F.when(F.col("o_n").isNull(), "insert")
        .when(F.col("i_n").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
        (F.coalesce("o_n", F.lit(0)) + F.coalesce("i_n", F.lit(0)))
        .cast("bigint")
        .alias("n_events"),
        F.round(
            F.coalesce("o_s", F.lit(0.0)) + F.coalesce("i_s", F.lit(0.0)), 2
        ).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# Continuous OHLC bars — order-statistic state through foreachBatch
# ---------------------------------------------------------------------------

def _merge_ohlc_batch(state_path: str):
    """foreachBatch body for candlesticks: per-batch OHLC state merged
    into the materialized bar table with the SAME merge the batch IVM
    operator uses (struct-min/max open/close — associative, so microbatch
    boundaries cannot change the bars). Versioned-commit exactly-once,
    like the hourly rollup."""
    from ..operators.incremental import merge_ohlc_states, ohlc_state

    return _versioned_merge(state_path, ohlc_state, merge_ohlc_states)


def run_incremental_ohlc(
    spark: SparkSession, src_dir: str, state_path: str, ckpt: str
) -> None:
    """Drive the OHLC continuous aggregate (availableNow, one file per
    microbatch) — the candlestick twin of run_incremental_rollup."""
    raw_schema, normalize = events_ts_codec(spark, src_dir)
    stream = normalize(
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_merge_ohlc_batch(state_path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


@register(
    "stream_ohlc_bars",
    oracle="""
WITH ranked AS (
  SELECT date_trunc('hour', ts) AS bucket_hour, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts), event_type
                       ORDER BY ts, event_id) AS rn_first,
    ROW_NUMBER() OVER (PARTITION BY date_trunc('hour', ts), event_type
                       ORDER BY ts DESC, event_id DESC) AS rn_last,
    CAST(round(value * 100) AS BIGINT) AS cents
  FROM events
)
SELECT bucket_hour, event_type,
  MAX(CASE WHEN rn_first = 1 THEN value END) AS open_value,
  MAX(value) AS high_value,
  MIN(value) AS low_value,
  MAX(CASE WHEN rn_last = 1 THEN value END) AS close_value,
  COUNT(*) AS n_events,
  CAST(SUM(cents) AS DOUBLE) / 100 AS total_value
FROM ranked
GROUP BY bucket_hour, event_type
""",
    doc="Continuous OHLC aggregate (batch twin): hourly bars maintained "
    "incrementally by foreachBatch with the mergeable order-statistic "
    "state of incremental_ohlc_merge; the streaming path is proven "
    "convergent to this twin across microbatches in "
    "tests/test_streaming.py.",
)
def stream_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import resample_ohlc

    return resample_ohlc(load_table(spark, sf_dir, "events"))
