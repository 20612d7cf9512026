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


def test_reader_options_contract():
    """Reader-side scan contract, symmetric to the writer's: exactly one
    option (the catalog — a stray option silently changes connector scan
    behavior), byte-identical layout to the writer's catalog, and the
    default table names mirror the reference's OWN split (reads scan
    FlightRecords per HCompute/Main.java:51; writes target FlightTable
    per HPopulate/Main.java:59) with the name as the composing knob."""
    from hbase_hadoop_flightsearch_spark.sources.hbase import (
        reader_options,
        writer_options,
    )

    opts = reader_options()
    assert set(opts) == {"catalog"}
    assert json.loads(opts["catalog"])["table"]["name"] == "FlightRecords"
    # Same layout both directions once the table-name knob is aligned.
    r = json.loads(reader_options("T")["catalog"])
    w = json.loads(writer_options("T", create=False)["catalog"])
    assert r == w


def test_scan_shape_composes_with_blob_parse(spark):
    """The connector's scan result shape — (rowkey string, raw_line
    string), pinned by the catalog — must compose with the bronze blob
    parser into typed flight columns, reproducing HCompute's
    scan->parse->filter mapper chain (HCompute/Main.java:85-93) with the
    scan simulated by an identically-shaped DataFrame (no jar in env)."""
    from hbase_hadoop_flightsearch_spark.sources.ingest import (
        flights_from_lines,
    )

    cells = ["x"] * 109
    cells[0], cells[2], cells[6] = "2008", "1", "WN"
    cells[37], cells[41], cells[43] = "15.00", "0.00", "0.00"
    line = ",".join(cells)
    scan_shaped = spark.createDataFrame(
        [("8d3f-uuid", line)], ["rowkey", "raw_line"]
    )
    parsed = flights_from_lines(scan_shaped)
    row = parsed.collect()[0]
    assert row.raw_line == line  # full-fidelity blob preserved
    assert (row.year, row.month, row.carrier) == (2008, 1, "WN")
    assert (row.cancelled, row.diverted) == (0.0, 0.0)
