"""Python Data Source API behaviors (sources/pyds.py): partitioned reads,
filter pushdown into the generator, the text-sink writer, and raw_line
compatibility with the reference's positional parse path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.sources.ingest import parse_bts_line
from hbase_hadoop_flightsearch_spark.sources.pyds import (
    FORMAT_NAME,
    register_flights_synth,
)


def _read(spark, **opts):
    register_flights_synth(spark)
    r = spark.read.format(FORMAT_NAME)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partitioned_parallel_read(spark):
    df = _read(spark, rows=1200, partitions=6)
    assert df.count() == 1200
    n_parts = df.select(F.spark_partition_id()).distinct().count()
    assert n_parts == 6  # partitions() splits honored, not a 1-task scan


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark, rows=600).collect()))
    b = sorted(map(tuple, _read(spark, rows=600, partitions=3).collect()))
    assert a == b  # same corpus for ANY partitioning


def test_filter_pushdown_reaches_generator(spark, tmp_path):
    marker = str(tmp_path / "pushed.txt")
    df = _read(spark, rows=1200, pushdown_marker_path=marker).filter(
        (F.col("year") == 2008) & (F.col("arr_delay_minutes") > 60)
    )
    got = df.count()
    # pushFilters accepted the year EqualTo (marker written on the driver);
    # the > predicate was handed back to Spark and still applied.
    assert os.path.exists(marker)
    assert "year" in open(marker).read()
    want = sum(
        1
        for r in _read(spark, rows=1200).collect()
        if r.year == 2008 and r.arr_delay_minutes > 60
    )
    assert got == want > 0


def test_writer_text_sink_roundtrip(spark, tmp_path):
    out = str(tmp_path / "sink")
    df = _read(spark, rows=500, partitions=4)
    (
        df.write.format(FORMAT_NAME)
        .mode("append")
        .option("path", out)
        .save()
    )
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    parts = [p for p in os.listdir(out) if p.startswith("part-")]
    assert len(parts) >= 1
    n_lines = sum(
        sum(1 for _ in open(os.path.join(out, p))) for p in parts
    )
    assert n_lines == 500


def test_raw_line_parses_back_to_columns(spark):
    """The generated 44-field raw_line must reparse (positional indices
    0/2/6/37/41/43 — HCompute/Main.java:75-81) to the typed columns."""
    df = _read(spark, rows=300)
    parsed = df.select(
        "year", "month", "carrier", "cancelled",
        parse_bts_line(F.col("raw_line")).alias("p"),
    )
    # positional struct fields: _c0=year, _c2=month, _c6=carrier,
    # _c41=cancelled (HCompute/Main.java:75-81)
    bad = parsed.filter(
        (F.col("p._c0").cast("int") != F.col("year"))
        | (F.col("p._c2").cast("int") != F.col("month"))
        | (F.col("p._c6") != F.col("carrier"))
        | (F.col("p._c41").cast("double") != F.col("cancelled"))
    ).count()
    assert bad == 0
