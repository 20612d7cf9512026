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


def _driver_history() -> tuple[set[str], set[str]]:
    """(green_names, failed_names) from the checked-in CORRECTNESS_r*.json
    artifacts; a name's latest-round status supersedes earlier rounds."""
    import glob
    import json
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    names: set[str] = set()
    failed: set[str] = set()
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        names.update(data.keys())
        for name, rec in data.items():
            ok = (
                rec.get("rows_match")
                and rec.get("schema_match")
                and rec.get("hash_match", True)
                and not rec.get("err")
            )
            if ok:
                failed.discard(name)
            else:
                failed.add(name)
    return names - failed, failed


def _driver_checked_names() -> set[str]:
    """Names whose MOST RECENT driver check was green. A query that failed
    its latest check is deliberately excluded so it re-queues with the
    never-checked priority group and the fix gets re-verified."""
    return _driver_history()[0]


def _driver_failed_names() -> set[str]:
    return _driver_history()[1]


def _r6_manifest_names() -> set[str]:
    """Registry names that existed at the end of round 6 (frozen manifest);
    used to age-prioritize the never-driver-checked queue."""
    import os

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "tools", "registry_names_r6.txt")
    try:
        with open(path) as f:
            return {line.strip() for line in f if line.strip()}
    except OSError:
        return set()


def _family_interleaved() -> dict[str, object]:
    """Registry reordered round-robin across source modules (operator
    families), so that ANY prefix of ~35+ queries exercises at least one
    query from every SURVEY.md §2 family — joins, aggregates, windows,
    set ops, dedup, graph, sampling, timeseries, similarity, sketches,
    clustering, quality, mining, CDC, scalar/text functions, multimodal,
    UDFs, and streaming — instead of front-loading a few families.

    Queries the driver has NEVER value-hashed (absent from every
    CORRECTNESS_r*.json) are interleaved FIRST so the unchecked tail
    drains in ~1-2 rounds (VERDICT r4 #4); already-checked queries follow
    in a second interleave pass. Module order and member order still
    rotate by the round seed so repeat passes vary which member leads."""
    from collections import OrderedDict

    seed = _round_seed()
    checked = _driver_checked_names()

    def interleave(queries: list) -> list:
        if not queries:
            return []
        by_module: "OrderedDict[str, list]" = OrderedDict()
        for q in queries:
            by_module.setdefault(q.fn.__module__, []).append(q)
        mods = list(by_module)
        mods = mods[seed % len(mods):] + mods[: seed % len(mods)]
        for mod in mods:
            lst = by_module[mod]
            k = seed % len(lst)
            by_module[mod] = lst[k:] + lst[:k]
        out: list = []
        while any(by_module.values()):
            for mod in mods:
                if by_module[mod]:
                    out.append(by_module[mod].pop(0))
        return out

    allq = list(load_all().values())
    never = [q for q in allq if q.name not in checked]
    seen = [q for q in allq if q.name in checked]
    # Within the never-checked group, queries that already existed at the
    # end of round 6 (tools/registry_names_r6.txt manifest) drain FIRST so
    # newly added queries cannot push the long-standing unchecked tail
    # past the driver's ~50-query prefix (VERDICT r6 #1).
    legacy = _r6_manifest_names()
    never_old = [q for q in never if q.name in legacy]
    never_new = [q for q in never if q.name not in legacy]
    ordered = interleave(never_old) + interleave(never_new) + interleave(seen)
    # Queries that FAILED their latest driver check lead the whole list so
    # the fix is re-verified even by the smallest driver prefix.
    failed_first = sorted(
        (q for q in ordered if q.name in _driver_failed_names()),
        key=lambda q: q.name,
    )
    rest = [q for q in ordered if q.name not in _driver_failed_names()]
    return {q.name: q for q in failed_first + rest}


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
