"""Streaming exact dedup (E10 x E14): dropDuplicatesWithinWatermark.

At-least-once sources (Kafka replays, file-source restarts, upstream
retries) deliver duplicate records; exact dedup on a stream cannot buffer
all history, so Spark keys a state store by the dedup columns and the
WATERMARK bounds how long each key is remembered — a duplicate arriving
within the watermark horizon is dropped, one arriving later is the
operator's documented miss. That horizon-for-memory trade is the only way
streaming dedup exists at 100 TB/day: state is O(keys per horizon), not
O(keys ever).

The registered query is the batch-equivalence form (union-doubled events,
dedup restores the original multiset — DuckDB-oracled); the true
readStream path with duplicated input files is proven in
tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


def dedup_counts(events: DataFrame, streaming: bool = False) -> DataFrame:
    """Per-type counts after exact dedup on event_id. Streaming inputs use
    dropDuplicatesWithinWatermark (requires a watermark upstream); batch
    uses plain dropDuplicates — same semantics when all duplicates fall
    inside the horizon."""
    if streaming:
        deduped = events.dropDuplicatesWithinWatermark(["event_id"])
    else:
        deduped = events.dropDuplicates(["event_id"])
    return deduped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@register(
    "stream_dedup_event_counts",
    oracle="""
SELECT event_type, COUNT(*) AS n_events
FROM events
GROUP BY event_type
""",
    doc="Streaming exact dedup (E10 x E14), batch-equivalence form: the "
    "event stream doubled then deduped on event_id must restore the "
    "original per-type counts. readStream twin with "
    "dropDuplicatesWithinWatermark in tests/test_streaming.py.",
)
def stream_dedup_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type"
    )
    doubled = events.unionAll(events)
    return dedup_counts(doubled)
