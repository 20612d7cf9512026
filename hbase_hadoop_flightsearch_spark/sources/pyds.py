"""Python Data Source API surface (Spark 4): a custom batch source/sink.

The reference's sources are a line-at-a-time HDFS text scan
(Secondary/Main.java:199) and an HBase full scan (HCompute/Main.java:50-51);
its sink is TextOutputFormat (HCompute/Main.java:64-67). This module
re-expresses "custom source/sink" the Spark-4-native way: a
``pyspark.sql.datasource.DataSource`` registered under a short name and
driven entirely by the planner — `spark.read.format("flights_synth")`.

The source generates the deterministic BTS-style flights corpus from pure
row-index arithmetic (no files), which makes it fully DuckDB-oracle-able:
the same arithmetic over ``range(n)`` reproduces every row (RANGE_SQL
below). It demonstrates the three things a production source must do:

  * **Partitioned parallel reads** — ``partitions()`` splits the row space
    into disjoint [start, end) ranges; each executor generates only its
    slice. At 100 TB-equivalent row counts the source scales linearly with
    executors, exactly like a parquet scan's splits.
  * **Filter pushdown** — ``pushFilters`` accepts EqualTo filters on
    year/carrier and evaluates them INSIDE the generator, so filtered rows
    are never materialized, never cross the Python->JVM Arrow boundary,
    and unsupported filters are returned to Spark for post-evaluation
    (the same contract as parquet PushedFilters; SURVEY.md §4).
  * **Partition-level writes** — the companion writer appends text part
    files (one per task, like TextOutputFormat) with a driver-side commit.

The reference's ingest quirks are preserved: ``raw_line`` is a 44-field
positional CSV whose indices 0/2/6/37/41/43 carry the semantic columns
(HCompute/Main.java:75-81), so the parse path (`parse_bts_line`) works on
generated rows too.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

from .flights import CARRIERS

FORMAT_NAME = "flights_synth"

FLIGHTS_SYNTH_SCHEMA = (
    "year int, quarter int, month int, carrier string, "
    "arr_delay_minutes double, cancelled double, diverted double, "
    "raw_line string"
)


def _row(r: int):
    """Row r of the corpus — pure arithmetic, mirrored by RANGE_SQL."""
    year = 2007 if r % 7 == 6 else 2008
    month = r % 12 + 1
    quarter = (month - 1) // 3 + 1
    carrier = CARRIERS[r % 18]
    delay = float((r * 7) % 120)
    cancelled = 1.0 if r % 50 == 0 else 0.0
    diverted = 1.0 if r % 97 == 3 else 0.0
    fields = [""] * 44
    fields[0] = str(year)
    fields[1] = str(quarter)
    fields[2] = str(month)
    fields[6] = carrier
    fields[37] = f"{delay:.2f}"
    fields[41] = f"{cancelled:.2f}"
    fields[43] = f"{diverted:.2f}"
    return (
        year,
        quarter,
        month,
        carrier,
        delay,
        cancelled,
        diverted,
        ",".join(fields),
    )


def _carrier_list_sql() -> str:
    return "[" + ", ".join(f"'{c}'" for c in CARRIERS) + "]"


def range_sql(n_rows: int) -> str:
    """DuckDB CTE generating the same rows as the source (sans raw_line)."""
    return f"""
flights_synth AS (
  SELECT
    CASE WHEN r % 7 = 6 THEN 2007 ELSE 2008 END AS year,
    CAST(r % 12 + 1 AS INT) AS month,
    ({_carrier_list_sql()})[CAST(r % 18 AS INT) + 1] AS carrier,
    CAST((r * 7) % 120 AS DOUBLE) AS arr_delay_minutes,
    CASE WHEN r % 50 = 0 THEN 1.0 ELSE 0.0 END AS cancelled,
    CASE WHEN r % 97 = 3 THEN 1.0 ELSE 0.0 END AS diverted
  FROM range({n_rows}) t(r)
)"""


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class FlightsSynthReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 6000))
        self.n_parts = int(options.get("partitions", 8))
        # Optional driver-side marker proving pushFilters ran (test hook).
        self.marker = options.get("pushdown_marker_path")
        self.year_eq: int | None = None
        self.carrier_eq: str | None = None

    def pushFilters(self, filters):  # noqa: N802 (API name)
        """Accept EqualTo on year/carrier; hand everything else back."""
        accepted = []
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("year",):
                self.year_eq = int(f.value)
                accepted.append(f)
            elif isinstance(f, EqualTo) and f.attribute == ("carrier",):
                self.carrier_eq = str(f.value)
                accepted.append(f)
            else:
                yield f  # unsupported -> Spark evaluates it post-scan
        if self.marker and accepted:
            with open(self.marker, "w") as fh:
                fh.write("\n".join(map(str, accepted)))

    def partitions(self):
        per = max(1, self.n_rows // self.n_parts)
        starts = list(range(0, self.n_rows, per))
        return [
            _Range(s, min(s + per, self.n_rows))
            for s in starts
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for r in range(partition.start, partition.end):
            row = _row(r)
            if self.year_eq is not None and row[0] != self.year_eq:
                continue
            if self.carrier_eq is not None and row[3] != self.carrier_eq:
                continue
            yield row


class _Done(WriterCommitMessage):
    def __init__(self, path: str, n: int):
        self.path, self.n = path, n


class FlightsSynthWriter(DataSourceWriter):
    """Text sink: one `part-<uuid>.txt` per task (the TextOutputFormat
    shape, S4), `_SUCCESS` written only by the driver-side commit — tasks
    that fail before commit leave no visible marker (best-effort cleanup
    in abort)."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("flights_synth writer requires option 'path'")
        self.overwrite = overwrite

    def write(self, iterator) -> WriterCommitMessage:
        import uuid

        os.makedirs(self.path, exist_ok=True)
        out = os.path.join(self.path, f"part-{uuid.uuid4().hex}.txt")
        n = 0
        with open(out, "w") as fh:
            for row in iterator:
                fh.write(row.raw_line + "\n")
                n += 1
        return _Done(out, n)

    def commit(self, messages):
        total = sum(m.n for m in messages)
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            fh.write(str(total))

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class FlightsSyntheticDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self) -> str:
        return FLIGHTS_SYNTH_SCHEMA

    def reader(self, schema: StructType) -> FlightsSynthReader:
        return FlightsSynthReader(self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return FlightsSynthWriter(self.options, overwrite)


def register_flights_synth(spark) -> None:
    """Register the source under `flights_synth` (idempotent re-register).

    Python-source filter pushdown is opt-in (dynamic conf); without it
    Spark refuses to plan a reader that implements pushFilters.
    """
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FlightsSyntheticDataSource)


# ---- registry entry: the source inside the oracled corpus ----------------

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from ..plans.registry import register  # noqa: E402

_N = 6000


@register(
    "source_pyds_flights_report",
    oracle=f"""
WITH {range_sql(_N)}
SELECT carrier, month,
  COUNT(*) AS n_flights,
  CAST(SUM(CAST(arr_delay_minutes AS BIGINT)) AS BIGINT) AS sum_delay
FROM flights_synth
WHERE year = 2008 AND cancelled <> 1.0 AND diverted <> 1.0
GROUP BY carrier, month
ORDER BY carrier, month
""",
    doc="Custom Python Data Source (Spark 4 DataSource API) feeding the "
    "completed-flights aggregate; generator arithmetic re-stated over "
    "DuckDB range() as the oracle. sf-independent by design.",
)
def source_pyds_flights_report(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reads from the registered `flights_synth` Python data source
    (partitioned generator, filter pushdown) and aggregates completed-2008
    flights per carrier-month. `sf_dir` is ignored — the source is its own
    deterministic dataset, which is the point: the WHOLE pipeline
    including the custom source is value-checked against DuckDB.

    Integer-exact outputs (COUNT + SUM of integral delays) keep the check
    float-free. The year filter is pushed INTO the generator via
    pushFilters; cancelled/diverted are post-filters Spark applies.
    """
    register_flights_synth(spark)
    df = (
        spark.read.format(FORMAT_NAME)
        .option("rows", _N)
        .option("partitions", 8)
        .load()
    )
    return (
        df.filter(
            (F.col("year") == 2008)
            & (F.col("cancelled") != 1.0)
            & (F.col("diverted") != 1.0)
        )
        .groupBy("carrier", "month")
        .agg(
            F.count(F.lit(1)).alias("n_flights"),
            F.sum(F.col("arr_delay_minutes").cast("bigint")).alias(
                "sum_delay"
            ),
        )
        .orderBy("carrier", "month")
    )
