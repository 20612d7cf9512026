"""Distributed exact global-order primitives (VERDICT r10/r11 #1).

An unpartitioned ``Window.orderBy(...)`` is CORRECT in Spark but executes
behind an ``Exchange SinglePartition`` — every input row funnels through
ONE task, so the plan stops scaling the moment the ranked input is
fact-sized. At 100 TB that single task is the whole job. This module is
the shared replacement: exact global row numbers, running sums, and
NTILE buckets with NO single-task stage anywhere.

Construction (the classic two-pass distributed ranking):

1. ``repartitionByRange(P, *order)`` — one range exchange gives globally
   ordered partitions (partition i's keys all sort before partition
   i+1's), with EXPLICIT P so AQE never re-coalesces the read and the
   partition ids below are stable across the plan's two consumers.
2. ``spark_partition_id()`` is materialized as a column IMMEDIATELY
   above that exchange — both downstream branches consume the same
   shuffle output one-to-one, so they see identical ids.
3. Branch A: per-partition local rank / running sum via
   ``Window.partitionBy(pid).orderBy(*order)`` — a hash exchange on pid
   (P parallel tasks), never a single-task sort.
4. Branch B: per-partition totals via ``groupBy(pid)`` (map-side partial
   agg, P-row shuffle), folded to exclusive prefix-sum offsets plus the
   grand total in ONE bounded Arrow batch (``coalesce(1).mapInPandas``
   over P rows — deliberately not a window, so no plan in this family
   ever contains a Window fed by Exchange SinglePartition).
5. ``global = local + broadcast offset[pid]``.

Cost at scale: one range shuffle write of the input (REUSED by both
branches via AQE's stage cache — asserted over a parquet source in
tests/test_ranks.py; LocalRelation/ExistingRDD inputs re-scan instead,
which only matters for driver-local test data), two shuffle reads, one
hash exchange, one P-row broadcast. Skew caveat: the range partitioner
co-locates equal keys, so a key holding a large fraction of all rows
bounds parallelism — give row_number/ntile a high-cardinality tie-break
column (every call site here does: doc_id / event_id / o_orderkey).

The reference has no ranking operator anywhere (all three Main.java);
this primitive backs the nine SURVEY §2b plans that previously rode an
unpartitioned window (ml_eval_*, agg_histogram_equidepth,
sample_class_rebalance / _pps_systematic / _importance_dsir,
events_time_to_convert_pctl, pipeline_curriculum_stages).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StructField, StructType

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_PID = "__gr_pid"
_N = "__gr_n"
_OFF = "__gr_off"
_TOT = "__gr_tot"
_LOC = "__gr_loc"
_RN = "__gr_rn"

_OFFSETS_SCHEMA = StructType(
    [
        StructField(_PID, IntegerType(), False),
        StructField(_OFF, LongType(), False),
        StructField(_TOT, LongType(), False),
    ]
)


def _prefix_offsets(
    batches: "Iterator[pd.DataFrame]",
) -> "Iterator[pd.DataFrame]":
    """Exclusive prefix sums over the per-partition totals (one bounded
    batch: at most `shuffle.partitions` rows). Runs as a single task by
    construction (coalesce(1)) — that is fine, its input is O(P)."""
    import pandas as pd

    frames = [b for b in batches if len(b)]
    if not frames:
        return
    df = pd.concat(frames).sort_values(_PID)
    n = df[_N].astype("int64")
    yield pd.DataFrame(
        {
            _PID: df[_PID].astype("int32"),
            _OFF: n.cumsum() - n,
            _TOT: n.sum(),
        }
    )


def _annotate(
    df: DataFrame,
    order_exprs: Sequence[Column],
    measure: Column,
    local_over,
) -> DataFrame:
    """Shared engine: returns df + _LOC (per-partition local value),
    _OFF (sum of `measure` over all earlier range partitions) and _TOT
    (grand total of `measure`). Callers combine and drop."""
    spark = df.sparkSession
    try:
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        nparts = 32
    order_exprs = list(order_exprs)
    base = df.repartitionByRange(nparts, *order_exprs).withColumn(
        _PID, F.spark_partition_id()
    )
    w = Window.partitionBy(_PID).orderBy(*order_exprs)
    local = base.withColumn(_LOC, local_over(w))
    counts = base.groupBy(_PID).agg(measure.cast("long").alias(_N))
    offsets = counts.coalesce(1).mapInPandas(
        _prefix_offsets, _OFFSETS_SCHEMA
    )
    return local.join(F.broadcast(offsets), _PID, "inner")


def _finish(
    ann: DataFrame, out: str, total_col: str | None
) -> DataFrame:
    res = ann.withColumn(out, (F.col(_LOC) + F.col(_OFF)).cast("long"))
    if total_col is not None:
        res = res.withColumn(total_col, F.col(_TOT))
    return res.drop(_PID, _LOC, _OFF, _TOT)


def with_global_row_number(
    df: DataFrame,
    order_exprs: Sequence[Column],
    out: str = "rn",
    total_col: str | None = None,
) -> DataFrame:
    """ROW_NUMBER() OVER (ORDER BY *order_exprs) as a long column `out`,
    computed with no single-task stage. Exactly the built-in semantics:
    ties (if the order is not total) are broken arbitrarily but rows
    with distinct keys rank exactly. `total_col` optionally attaches
    COUNT(*) OVER () (the same broadcast, zero extra passes)."""
    ann = _annotate(
        df,
        order_exprs,
        F.count(F.lit(1)),
        lambda w: F.row_number().over(w).cast("long"),
    )
    return _finish(ann, out, total_col)


def with_global_cumsum(
    df: DataFrame,
    order_exprs: Sequence[Column],
    value: Column,
    out: str = "cum",
    total_col: str | None = None,
) -> DataFrame:
    """SUM(value) OVER (ORDER BY *order_exprs ROWS UNBOUNDED PRECEDING
    TO CURRENT ROW) — the inclusive running sum in exact longs —
    distributed the same way. `total_col` attaches SUM(value) OVER ()
    from the same broadcast (no extra full-frame window, no extra
    pass). The order should be total if per-row values must be exact
    (ties within the local window are summed in window order)."""
    ann = _annotate(
        df,
        order_exprs,
        F.sum(value),
        lambda w: F.sum(value)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long"),
    )
    return _finish(ann, out, total_col)


def with_global_ntile(
    df: DataFrame,
    order_exprs: Sequence[Column],
    n_buckets: int,
    out: str = "bucket",
) -> DataFrame:
    """NTILE(n_buckets) OVER (ORDER BY *order_exprs) as an int column
    `out`. Standard SQL semantics, derived in closed form from the
    distributed row number rn and total n: with q = n div B and
    r = n mod B, the first r buckets hold q+1 rows —
      rn <= r*(q+1):  bucket = (rn-1) div (q+1) + 1
      otherwise:      bucket = r + (rn-1-r*(q+1)) div q + 1
    (matches both Spark's and DuckDB's NTILE; when n < B the first
    branch always applies, so the q=0 division is unreachable)."""
    b = int(n_buckets)
    tot = _RN + "_tot"  # _TOT itself is dropped inside _finish
    res = with_global_row_number(df, order_exprs, out=_RN, total_col=tot)
    q = f"({tot} div {b})"
    r = f"({tot} % {b})"
    cut = f"({r} * ({q} + 1))"
    res = res.withColumn(
        out,
        F.expr(
            f"CAST(CASE WHEN {_RN} <= {cut}"
            f" THEN ({_RN} - 1) div ({q} + 1) + 1"
            f" ELSE {r} + ({_RN} - 1 - {cut}) div {q} + 1"
            f" END AS INT)"
        ),
    )
    return res.drop(_RN, tot)
