"""Parquet-backed table catalog.

Replaces the reference's two sources — HDFS text scan
(Secondary/Main.java:199) and HBase full-table scan (HCompute/Main.java:50-51)
— with schema'd Parquet reads. Because the reference stores random-UUID
rowkeys (HPopulate/Main.java:97-98) its ONLY access pattern is a full scan;
Parquet + Catalyst instead give free column pruning and predicate pushdown
(visible as PushedFilters/ReadSchema in .explain).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..schemas import TABLE_NAMES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table. Schema comes from the parquet footer (it
    matches TESTDATA_SCHEMAS; asserting here would add a blocking footer
    read per call)."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; one of {TABLE_NAMES}")
    # Timestamp semantics contract: every timestamp-bearing query (windows,
    # date parts, epoch conversions) and every DuckDB oracle assumes UTC.
    # Our session factory sets this, but the external driver's session may
    # not — pin it at the data boundary (dynamic conf, safe to set here).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet has shipped with two physical ts encodings:
        # TIMESTAMP(NANOS) (Spark's reader rejects it — read nanos as long,
        # truncate to micros with integer DIV exactly like DuckDB), and
        # TIMESTAMP(MICROS) without UTC adjustment (read as TIMESTAMP_NTZ).
        # Normalize both to session-UTC TIMESTAMP so every downstream
        # window/epoch expression and DuckDB oracle sees identical values.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        else:
            # NTZ -> LTZ under the UTC session zone preserves the wall value.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() queries work."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
