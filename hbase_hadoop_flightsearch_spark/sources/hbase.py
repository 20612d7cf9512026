"""Optional HBase edge (SURVEY.md §7 R1) — config-gated, Parquet-default.

The reference's storage layer is HBase: HPopulate writes one cell
(`info:data` = raw CSV line) per random-UUID row into `FlightTable`
(HPopulate/Main.java:54-73,97-100) and HCompute full-scans `FlightRecords`
(HCompute/Main.java:50-51). Note the table-name mismatch between writer and
reader — evidence the HBase edge was never the tested contract, which is
why this engine treats HBase as an OPTIONAL connector and Parquet
(`sources/ingest.py`) as the physical layer.

When a deployment does have HBase, the Apache `hbase-spark` connector
(format ``org.apache.hadoop.hbase.spark``) maps the reference's layout via
the catalog below. The connector jar is not shippable with this repo (it
must match the site's HBase minor version), so this module only *builds*
the reader/writer and fails with an actionable message when the jar is
absent. Unlike the reference's mapper-side single `Put` per record, the
connector writes batched per partition.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

HBASE_FORMAT = "org.apache.hadoop.hbase.spark"

#: hbase-spark catalog for the reference's layout: rowkey + info:data blob.
#: Table name is a parameter, not a constant — the reference itself
#: disagrees about it (FlightTable vs FlightRecords).
def flight_blob_catalog(table: str) -> str:
    return json.dumps(
        {
            "table": {"namespace": "default", "name": table},
            "rowkey": "key",
            "columns": {
                "rowkey": {"cf": "rowkey", "col": "key", "type": "string"},
                "raw_line": {"cf": "info", "col": "data", "type": "string"},
            },
        }
    )


class HBaseConnectorUnavailable(RuntimeError):
    pass


def _check_connector(spark: SparkSession) -> None:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.hadoop.hbase.spark.DefaultSource"
        )
    except Exception as exc:  # jar not on the classpath
        raise HBaseConnectorUnavailable(
            "hbase-spark connector not on the classpath; add the "
            "hbase-spark jar matching your HBase version (reference stack "
            "is HBase 2.4.7, HCompute/pom.xml:16) or use the Parquet "
            "bronze layer (sources/ingest.py), which is the default and "
            "the correctness-tested path"
        ) from exc


def reader_options(table: str = "FlightRecords") -> dict[str, str]:
    """The exact option map handed to the hbase-spark DefaultSource reader
    — separable from .load() so the scan contract is testable without a
    jar, symmetric to `writer_options`. The default table name is
    `FlightRecords` because that is what the reference's query job scans
    (HCompute/Main.java:51), while its loader writes `FlightTable`
    (HPopulate/Main.java:59) — the name is a knob precisely because the
    reference's own pipeline does not compose (SURVEY.md §1.1a)."""
    return {"catalog": flight_blob_catalog(table)}


def read_flight_table(
    spark: SparkSession, table: str = "FlightRecords"
) -> DataFrame:
    """S2: connector-backed scan of the blob table. Filter pushdown on
    rowkey ranges comes from the connector; for the reference's random-UUID
    keys there is nothing to push — which is exactly why the bronze layer
    re-keys by year partition instead. The scan result shape is
    (rowkey string, raw_line string); `sources.ingest.flights_from_lines`
    is the downstream parse that turns it into typed flights columns —
    the composition the reference hand-codes in HCompute's mapper
    (HCompute/Main.java:85-93)."""
    _check_connector(spark)
    return (
        spark.read.format(HBASE_FORMAT)
        .options(**reader_options(table))
        .load()
    )


def writer_options(table: str, create: bool = True) -> dict[str, str]:
    """The exact option map handed to the hbase-spark DefaultSource writer
    — separable from .save() so the contract is testable without a jar.
    `newTable` is the connector's create-if-absent knob (value = initial
    region count, mirroring HPopulate's Admin DDL, HPopulate/Main.java:
    54-73); omitted entirely when the table must pre-exist."""
    opts = {"catalog": flight_blob_catalog(table)}
    if create:
        opts["newTable"] = "5"
    return opts


def write_flight_table(
    df: DataFrame, table: str = "FlightTable", create: bool = True
) -> None:
    """S3/S5: connector-backed write of (rowkey, raw_line), batched per
    partition (vs the reference's per-record synchronous Put,
    HPopulate/Main.java:100). `create` maps to the connector's newTable
    option (create-if-absent, like HPopulate's Admin DDL)."""
    _check_connector(df.sparkSession)
    (
        df.select("rowkey", "raw_line")
        .write.format(HBASE_FORMAT)
        .options(**writer_options(table, create))
        .save()
    )
