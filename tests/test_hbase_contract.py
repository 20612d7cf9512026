"""HBase connector contract tests (SURVEY.md §2a S2/S3).

The live HBase edge cannot run here (no connector jar / no HBase in the
environment), so these tests pin the CONTRACT instead: the generated
hbase-spark catalog must match the reference's storage layout byte-for-byte
— one cell `info:data` holding the raw CSV line, keyed by a string rowkey
(HPopulate/Main.java:97-100; HCompute/Main.java:50-51 scans the same
family/qualifier).
"""

from __future__ import annotations

import json

import pytest

from hbase_hadoop_flightsearch_spark.sources.hbase import (
    HBaseConnectorUnavailable,
    flight_blob_catalog,
    read_flight_table,
)


def test_catalog_matches_reference_layout():
    cat = json.loads(flight_blob_catalog("FlightTable"))
    assert cat["table"] == {"namespace": "default", "name": "FlightTable"}
    assert cat["rowkey"] == "key"
    # The data cell: family `info`, qualifier `data`, string payload —
    # exactly the Put the reference writes (HPopulate/Main.java:97-100).
    assert cat["columns"]["raw_line"] == {
        "cf": "info",
        "col": "data",
        "type": "string",
    }
    # The rowkey mapping: string key under the reserved `rowkey` cf.
    assert cat["columns"]["rowkey"] == {
        "cf": "rowkey",
        "col": "key",
        "type": "string",
    }
    # Exactly these two logical columns — the reference stores nothing else.
    assert set(cat["columns"]) == {"rowkey", "raw_line"}


def test_catalog_is_deterministic_and_parametrized_by_table():
    """The reference disagrees with itself on the table name (FlightTable
    written, FlightRecords scanned), so the name must be a parameter; the
    rest of the catalog must be byte-identical across calls."""
    a, b = flight_blob_catalog("FlightRecords"), flight_blob_catalog(
        "FlightRecords"
    )
    assert a == b
    wrote = json.loads(flight_blob_catalog("FlightTable"))
    read = json.loads(flight_blob_catalog("FlightRecords"))
    wrote["table"]["name"] = read["table"]["name"] = "X"
    assert wrote == read


def test_reader_fails_actionably_without_connector(spark):
    """Without the site-matched connector jar the reader must raise the
    typed error pointing at the Parquet bronze path, not a raw JVM
    ClassNotFoundException from inside a job."""
    with pytest.raises(HBaseConnectorUnavailable, match="bronze"):
        read_flight_table(spark)


def test_writer_options_contract():
    """The writer's option map IS its connector contract: the catalog must
    byte-match the reader's (same layout both directions, unlike the
    reference's writer/reader table-name split), `newTable` must appear
    exactly when create-if-absent is requested (value = initial region
    count as a string — the connector parses it numerically), and nothing
    else may be passed (stray options silently change connector
    behavior)."""
    from hbase_hadoop_flightsearch_spark.sources.hbase import writer_options

    created = writer_options("FlightTable", create=True)
    assert set(created) == {"catalog", "newTable"}
    assert created["catalog"] == flight_blob_catalog("FlightTable")
    assert created["newTable"] == "5" and created["newTable"].isdigit()

    existing = writer_options("FlightTable", create=False)
    assert set(existing) == {"catalog"}
    assert existing["catalog"] == flight_blob_catalog("FlightTable")

    # The catalog the writer ships must cover exactly the columns the
    # writer selects (rowkey, raw_line) — a column the catalog doesn't
    # map would be dropped silently by the connector.
    cat = json.loads(created["catalog"])
    assert set(cat["columns"]) == {"rowkey", "raw_line"}


def test_writer_fails_actionably_without_connector(spark):
    """The writer must gate on the jar BEFORE building the DataFrameWriter,
    with the same actionable bronze-path message as the reader."""
    from hbase_hadoop_flightsearch_spark.sources.hbase import (
        write_flight_table,
    )

    df = spark.createDataFrame(
        [("k1", "2008,1,3,WN,...")], ["rowkey", "raw_line"]
    )
    with pytest.raises(HBaseConnectorUnavailable, match="bronze"):
        write_flight_table(df)
