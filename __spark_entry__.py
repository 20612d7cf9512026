"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over the engine's central query registry
(hbase_hadoop_flightsearch_spark/plans/registry.py): every implemented
operator registers a PySpark builder and (where SQL-expressible) a DuckDB
oracle there; this module just re-exposes the registry in the driver's
shape. See SURVEY.md §2 for the operator inventory.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from hbase_hadoop_flightsearch_spark.plans.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (per-carrier monthly delay pivot) on sf0.001."""
    registry = load_all()
    return registry["flight_delay_report"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
