"""Streaming CDC upsert — continuous MERGE INTO over a parquet snapshot.

The batch CDC apply (operators/cdc.py::merge_cdc) lifted onto Structured
Streaming: each microbatch of the change feed collapses to its latest
change per key and full-outer-resolves into the snapshot via the SAME
merge function — one code path serves batch backfill and continuous
apply, which is the whole point of Spark's unified batch/stream model.

Cross-batch semantics compose because the feed carries ABSOLUTE payloads
(not increments): applying batches sequentially in feed order converges to
the one-shot merge of the whole feed (asserted in test_streaming.py).
Snapshot persistence is the same single-writer read-combine-swap as the
rollup (streaming/rollup.py) — on a real lake the foreachBatch body
becomes a Delta/Iceberg MERGE INTO and the checkpointed exactly-once
batch ids make replays idempotent.

Scale notes (100 TB): the microbatch side is tiny (a CDC tick), so AQE
broadcasts it against the bucketed snapshot; with dynamic partition
overwrite only key-containing partitions rewrite per tick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.cdc import merge_cdc

FEED_SCHEMA = (
    "o_orderkey long, op string, new_price double, "
    "new_status string, seq int"
)


def _apply_batch(snapshot_path: str):
    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        snapshot = spark.read.parquet(snapshot_path)
        merged = merge_cdc(snapshot, batch_df)
        merged.cache().count()  # materialize before overwriting the input
        merged.write.mode("overwrite").parquet(snapshot_path + ".tmp")
        merged.unpersist()
        spark.read.parquet(snapshot_path + ".tmp").write.mode(
            "overwrite"
        ).parquet(snapshot_path)

    return apply


def run_streaming_upsert(
    spark: SparkSession, feed_dir: str, snapshot_path: str, ckpt: str
) -> None:
    """Apply change-feed files (one microbatch each) onto the snapshot."""
    stream = (
        spark.readStream.schema(FEED_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    q = (
        stream.writeStream.foreachBatch(_apply_batch(snapshot_path))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
