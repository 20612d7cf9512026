"""Mini-driver: run a registry query on Spark and its oracle on DuckDB over
the same parquet tables, and compare order-insensitively.

Mirrors the external driver's check (row count + column names + value hash,
columns sorted by name, rows unordered) but compares actual values, which is
strictly stronger than a hash match.
"""

from __future__ import annotations

import datetime
import math

import duckdb

from hbase_hadoop_flightsearch_spark.schemas import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm_value(v):
    if v is None:
        return ("null",)
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, (int,)):
        return ("n", float(v)) if float(v).is_integer() else ("n", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        # floats in query outputs are pre-rounded by the queries themselves;
        # normalize through a 9-digit round to absorb repr noise only.
        return ("n", round(v, 9))
    if isinstance(v, datetime.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("l", tuple(_norm_value(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v).hex())
    return ("s", str(v))


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_query_to_oracle(spark, query, sf_dir: str) -> None:
    """Assert the Spark result of `query` matches its DuckDB oracle."""
    sdf = query.fn(spark, sf_dir)
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb_con(sf_dir)
    # Guard against DuckDB's integer-widening types: SUM(BIGINT) returns
    # HUGEINT, which the external driver's pandas path renders as float64
    # ("15000.0") while Spark emits int64 ("15000") — a value-hash mismatch
    # invisible to this fetchall()-based compare (fetchall gives Python
    # ints either way). Oracles must CAST such sums to BIGINT.
    desc = con.execute(f"DESCRIBE {query.oracle}").fetchall()
    huge = [(c[0], c[1]) for c in desc if "HUGEINT" in str(c[1]).upper()]
    assert not huge, (
        f"{query.name}: oracle emits HUGEINT column(s) {huge} — the driver "
        "coerces these to float64 and the value hash diverges from Spark's "
        "int64; wrap the expression in CAST(... AS BIGINT)"
    )
    res = con.execute(query.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{query.name}: column mismatch spark={sorted(spark_cols)} "
        f"duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{query.name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _normalize(spark_cols, spark_rows), _normalize(duck_cols, duck_rows)
    if ns != nd:
        diff_s = [r for r in ns if r not in set(nd)][:5]
        diff_d = [r for r in nd if r not in set(ns)][:5]
        raise AssertionError(
            f"{query.name}: value mismatch.\n only-spark: {diff_s}\n"
            f" only-duck:  {diff_d}"
        )
