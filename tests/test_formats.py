"""Columnar/row format round-trips beyond parquet (source surface): ORC
and JSON-lines must carry the events table losslessly, and the ORC read
path must push filters down to the scan like parquet does."""

from __future__ import annotations

from pyspark.sql import functions as F

from hbase_hadoop_flightsearch_spark.sources.catalog import load_table


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_orc_roundtrip_lossless_and_pushdown(spark, sf_smoke, tmp_path):
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_orc")
    events.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == events.schema
    assert _sorted_rows(back) == _sorted_rows(events)
    filtered = back.filter(F.col("user_id") == 7).select("event_id")
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "user_id" in plan.split(
        "PushedFilters"
    )[1].split("]")[0], plan


def test_jsonl_roundtrip_with_explicit_schema(spark, sf_smoke, tmp_path):
    """JSON-lines round trip with schema-on-read. Two 100 TB lessons
    encoded here: an explicit read schema avoids the inference scan, and
    the DEFAULT timestampFormat truncates to milliseconds — microsecond
    fidelity needs the SSSSSS format spelled on BOTH sides."""
    events = load_table(spark, sf_smoke, "events")
    path = str(tmp_path / "events_jsonl")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    events.write.mode("overwrite").option("timestampFormat", fmt).json(path)
    back = (
        spark.read.schema(events.schema)
        .option("timestampFormat", fmt)
        .json(path)
    )
    assert _sorted_rows(back) == _sorted_rows(events)


def test_jsonl_permissive_mode_accounts_corrupt_rows(spark, tmp_path):
    """PERMISSIVE + columnNameOfCorruptRecord: malformed lines become
    accountable rows, never task failures — the DQ contract for raw-feed
    ingestion."""
    p = tmp_path / "feed.jsonl"
    p.write_text(
        '{"id": 1, "v": 10.5}\n'
        "{broken json\n"
        '{"id": 3, "v": 2.0}\n'
        '{"id": "not_a_number", "v": 1.0}\n'
    )
    df = (
        spark.read.schema("id bigint, v double, _bad string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(str(p))
    )
    rows = df.collect()
    good = [r for r in rows if r._bad is None]
    bad = [r for r in rows if r._bad is not None]
    assert {r.id for r in good} == {1, 3}
    assert len(bad) == 2  # the broken line and the type-mismatch line
