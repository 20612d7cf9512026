"""True streaming-path tests (SURVEY.md §7 R5): the same builders that pass
the batch oracle are executed through readStream -> watermark -> memory
sink, and the incremental result must equal the batch result."""

from __future__ import annotations

from hbase_hadoop_flightsearch_spark.sources.catalog import load_table
from hbase_hadoop_flightsearch_spark.streaming.windows import (
    copy_events_to_dir,
    run_stream_to_memory,
    session_counts,
    stream_from_dir,
    tumbling_counts,
)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_tumbling_equals_batch(spark, sf_smoke, tmp_path):
    src = copy_events_to_dir(sf_smoke, str(tmp_path / "stream_src"))
    stream = stream_from_dir(spark, src)
    got = run_stream_to_memory(
        tumbling_counts(stream), "tumbling_sink", spark
    )
    want = tumbling_counts(load_table(spark, sf_smoke, "events"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_session_equals_batch(spark, sf_smoke, tmp_path):
    src = copy_events_to_dir(sf_smoke, str(tmp_path / "stream_src2"))
    stream = stream_from_dir(spark, src)
    got = run_stream_to_memory(
        session_counts(stream), "session_sink", spark
    )
    want = session_counts(load_table(spark, sf_smoke, "events"))
    assert _sorted_rows(got) == _sorted_rows(want)


def test_stream_is_actually_streaming(spark, sf_smoke, tmp_path):
    src = copy_events_to_dir(sf_smoke, str(tmp_path / "stream_src3"))
    stream = stream_from_dir(spark, src)
    assert stream.isStreaming
