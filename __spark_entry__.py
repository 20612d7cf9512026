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


def _round_seed() -> int:
    """Prefix-rotation seed = number of completed driver rounds, counted
    from the checked-in CORRECTNESS_r*.json artifacts. Changes every round
    with no manual bump, so successive rounds sweep DIFFERENT registry
    members through the driver's ~50-query prefix instead of re-checking
    the same 50 forever (VERDICT r3 #6)."""
    import glob
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    return len(glob.glob(os.path.join(here, "CORRECTNESS_r*.json")))


def _family_interleaved() -> dict[str, object]:
    """Registry reordered round-robin across source modules (operator
    families), so that ANY prefix of ~35+ queries exercises at least one
    query from every SURVEY.md §2 family — joins, aggregates, windows,
    set ops, dedup, graph, sampling, timeseries, similarity, sketches,
    clustering, quality, mining, CDC, scalar/text functions, multimodal,
    UDFs, and streaming — instead of front-loading a few families.

    Both the module order and each module's member order rotate by the
    round seed: the first full round-robin pass still takes exactly one
    query from every module (family coverage in any 50-prefix is
    invariant), but WHICH member leads each family changes per round."""
    from collections import OrderedDict

    by_module: "OrderedDict[str, list]" = OrderedDict()
    for q in load_all().values():
        by_module.setdefault(q.fn.__module__, []).append(q)
    seed = _round_seed()
    mods = list(by_module)
    mods = mods[seed % len(mods):] + mods[: seed % len(mods)]
    for mod in mods:
        lst = by_module[mod]
        k = seed % len(lst)
        by_module[mod] = lst[k:] + lst[:k]
    out: dict[str, object] = {}
    while any(by_module.values()):
        for mod in mods:
            if by_module[mod]:
                q = by_module[mod].pop(0)
                out[q.name] = q
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented query/operator from SURVEY.md §2."""
    return {name: q.fn for name, q in _family_interleaved().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {
        name: q.oracle
        for name, q in _family_interleaved().items()
        if q.oracle is not None
    }
