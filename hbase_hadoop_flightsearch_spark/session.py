"""SparkSession factory.

Defaults chosen for the 100 TB posture (AQE everywhere, partial-agg friendly
shuffle sizing, Arrow for any pandas exchange) while remaining correct on
local[N] test runs. The reference hard-codes 10 reducers
(Secondary/Main.java:198); here parallelism is a tuning knob owned by AQE.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hbase-hadoop-flightsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    On a real cluster, ``master`` is left to spark-submit; locally it
    defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 in the test env).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")

    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    conf = {
        # AQE: runtime re-planning — partition coalescing, skew-join split,
        # dynamic broadcast. Non-negotiable at scale.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Initial shuffle width; AQE coalesces down, so err high on clusters.
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        # Arrow for pandas UDF / toPandas exchange (vectorized, not per-row).
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # Broadcast threshold: dims (region/nation/supplier/part at test SF)
        # should broadcast; explicit F.broadcast() hints are still used on
        # known-small sides so plans survive stale stats at 100 TB.
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        # Parquet scan batching.
        "spark.sql.parquet.enableVectorizedReader": "true",
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
        # Keep event timestamps deterministic across engines.
        "spark.sql.session.timeZone": "UTC",
        # Quiet local runs.
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
