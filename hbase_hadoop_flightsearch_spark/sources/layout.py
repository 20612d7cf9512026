"""Z-order (Morton) clustering for multi-dimensional data skipping
(SURVEY.md §2 table-maintenance extension; the layout trick behind
Delta/Iceberg OPTIMIZE ZORDER).

Why it matters at 100 TB: parquet footers carry per-file/row-group
min-max stats, and the reader prunes files whose stats can't match the
predicate. A layout sorted on ONE column prunes only that column's
predicates; interleaving the bits of several columns into one sort key
gives every participating column locality, so a 2-D box predicate skips
most files. The z-value is pure JVM bit arithmetic (codegen'd — no UDF),
and the clustered write is `repartitionByRange(z) + sortWithinPartitions`,
i.e. one range-partitioner sampling pass + a local sort: the same cost
shape as any global sort Spark already does.

File-skipping effectiveness (z-order vs 1-D sort) is measured and
asserted in tests/test_layout.py via per-file min-max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from .catalog import load_table

ZBITS = 16  # bits interleaved per dimension (32-bit z-key for 2 dims)


def zvalue(a: Column, b: Column, bits: int = ZBITS) -> Column:
    """Interleave the low `bits` of two non-negative integer columns:
    bit i of `a` lands at position 2i, bit i of `b` at 2i+1. Pure
    shift/and/or expressions — whole-stage codegen, no UDF."""
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def _zvalue_duck(a: str, b: str, bits: int = ZBITS) -> str:
    """The identical interleave as DuckDB SQL (bit-for-bit)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int,
) -> None:
    """Cluster `df` into `n_files` parquet files by the z-order of
    (col_a, col_b). Range-partitioning on z gives globally disjoint
    z-ranges per file; the local sort tightens row-group stats too."""
    with_z = df.withColumn("__z", zvalue(F.col(col_a), F.col(col_b)))
    (
        with_z.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


@register(
    "layout_zorder_key",
    oracle=f"""
SELECT o_orderkey,
  {_zvalue_duck("o_custkey", "CAST(FLOOR(o_totalprice / 8) AS BIGINT)")}
    AS zval
FROM orders
WHERE o_orderkey < 500
""",
    doc="Z-order key computation (table maintenance): Morton-interleave "
    "of (o_custkey, price bucket) as pure bit arithmetic — the sort key "
    "behind multi-dimensional file clustering. Bit-for-bit oracled.",
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The clustering key itself, exposed as a query so the bit math is
    cross-engine verified (the write path in `write_zordered` uses the
    same expression)."""
    orders = load_table(spark, sf_dir, "orders")
    price_bucket = F.floor(F.col("o_totalprice") / 8).cast("long")
    return orders.filter(F.col("o_orderkey") < 500).select(
        "o_orderkey",
        zvalue(F.col("o_custkey"), price_bucket).alias("zval"),
    )


@register(
    "layout_file_skipping_stats",
    oracle="""
SELECT 'orders.parquet' AS file_name,
  CAST(COUNT(*) AS BIGINT) AS n_rows,
  CAST(MIN(o_orderdate) AS DATE) AS min_orderdate,
  CAST(MAX(o_orderdate) AS DATE) AS max_orderdate,
  CAST(MIN(o_orderkey) AS BIGINT) AS min_orderkey,
  CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
FROM orders
""",
    doc="Per-file skipping-stats audit via Spark's hidden _metadata "
    "column: for every physical file behind the orders table, the "
    "min/max of the prune-relevant columns plus row count — exactly the "
    "footer stats the reader consults when deciding to skip a file, "
    "surfaced as a queryable table. At 100 TB this is how you audit "
    "whether a layout (1-D sort, z-order) actually tightened per-file "
    "ranges. The driver fixture is one file per table, so the oracle "
    "pins that file's stats; the multi-file case is exercised in "
    "tests/test_layout.py.",
)
def layout_file_skipping_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.col("_metadata.file_name").alias("file_name"),
            "o_orderdate",
            "o_orderkey",
        )
        .groupBy("file_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min("o_orderdate").cast("date").alias("min_orderdate"),
            F.max("o_orderdate").cast("date").alias("max_orderdate"),
            F.min("o_orderkey").cast("bigint").alias("min_orderkey"),
            F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
        )
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning (OPTIMIZE binPack)
# ---------------------------------------------------------------------------

COMPACT_MAX_GROUPS = 3  # target compaction groups per partition
COMPACT_ROW_BYTES = 120  # manifest's estimated bytes per row
COMPACT_FILE_BUCKETS = 7  # simulated files per day-partition


@register(
    "layout_compaction_plan",
    oracle=f"""
WITH manifest AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS part_day,
         o_orderkey % {COMPACT_FILE_BUCKETS} AS file_bucket,
         CAST(COUNT(*) * {COMPACT_ROW_BYTES} AS BIGINT) AS size_bytes
  FROM orders GROUP BY 1, 2
),
sized AS (
  SELECT part_day, file_bucket, size_bytes,
    GREATEST(SUM(size_bytes) OVER (PARTITION BY part_day)
             // {COMPACT_MAX_GROUPS}, 1) AS target_bytes,
    COALESCE(SUM(size_bytes) OVER (
        PARTITION BY part_day ORDER BY file_bucket
        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS run
  FROM manifest
),
planned AS (
  SELECT part_day, file_bucket, size_bytes,
         CAST(run // target_bytes AS BIGINT) AS group_id
  FROM sized
)
SELECT part_day, file_bucket, size_bytes, group_id,
  CAST(SUM(size_bytes) OVER (PARTITION BY part_day, group_id) AS BIGINT)
    AS group_bytes,
  CAST(COUNT(*) OVER (PARTITION BY part_day, group_id) AS BIGINT)
    AS group_files
FROM planned
ORDER BY part_day, file_bucket
""",
    doc="Small-file compaction planner (table maintenance; the OPTIMIZE "
    "binPack step behind Delta/Iceberg): given a per-partition file "
    "manifest (simulated here as day-partitions x "
    f"{COMPACT_FILE_BUCKETS} key-bucketed files with row-count-derived "
    "sizes), assign files to compaction groups by sorted prefix-sum "
    "binning: group_id = floor(exclusive_running_bytes / target) "
    "within each partition, with the target derived from the "
    f"partition's total as total/{COMPACT_MAX_GROUPS} (the "
    "max-groups-per-partition knob real compactors expose; an absolute "
    "byte target works identically and is SF-dependent). Prefix "
    "binning is the deterministic one-window-pass approximation of bin "
    "packing that production compactors use — no driver loop, no "
    "quadratic pairing. Spark shape: one shuffle to the manifest "
    "rollup, then Window passes over the manifest only; at 100 TB the "
    "plan is O(files), never O(rows), because sizing rides the "
    "manifest, not the data.",
)
def layout_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    manifest = (
        orders.groupBy(
            F.date_trunc("day", F.col("o_orderdate")).cast("date").alias(
                "part_day"
            ),
            (F.col("o_orderkey") % COMPACT_FILE_BUCKETS).alias("file_bucket"),
        )
        .agg(
            (F.count(F.lit(1)) * COMPACT_ROW_BYTES)
            .cast("bigint")
            .alias("size_bytes")
        )
    )
    part = Window.partitionBy("part_day")
    running = (
        Window.partitionBy("part_day")
        .orderBy("file_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    planned = manifest.select(
        "part_day",
        "file_bucket",
        "size_bytes",
        F.floor(
            F.coalesce(F.sum("size_bytes").over(running), F.lit(0))
            / F.greatest(
                F.floor(F.sum("size_bytes").over(part) / COMPACT_MAX_GROUPS),
                F.lit(1),
            )
        )
        .cast("bigint")
        .alias("group_id"),
    )
    grp = Window.partitionBy("part_day", "group_id")
    return planned.select(
        "part_day",
        "file_bucket",
        "size_bytes",
        "group_id",
        F.sum("size_bytes").over(grp).cast("bigint").alias("group_bytes"),
        F.count(F.lit(1)).over(grp).cast("bigint").alias("group_files"),
    ).orderBy("part_day", "file_bucket")


@register(
    "layout_partition_key_advisor",
    oracle="""
WITH cands AS (
  SELECT 'o_orderpriority' AS candidate, o_orderpriority AS val
  FROM orders
  UNION ALL
  SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL
  SELECT 'order_year', CAST(EXTRACT(year FROM o_orderdate) AS VARCHAR)
  FROM orders
),
per_val AS (
  SELECT candidate, val, CAST(COUNT(*) AS BIGINT) AS n
  FROM cands GROUP BY candidate, val
)
SELECT candidate,
  CAST(COUNT(*) AS BIGINT) AS n_partitions,
  CAST(MIN(n) AS BIGINT) AS min_rows,
  CAST(MAX(n) AS BIGINT) AS max_rows,
  ROUND(MAX(n) * COUNT(*) * 1.0 / SUM(n), 6) AS skew_factor,
  ROUND(SUM(n * n) * 1.0 / (SUM(n) * SUM(n)), 6) AS collision_prob
FROM per_val
GROUP BY candidate
ORDER BY candidate
""",
    doc="Partition-key advisor (physical-design table maintenance): for "
    "each candidate partition column of the orders table, the "
    "partition count, min/max partition sizes, skew factor "
    "(max/mean), and the collision probability sum(n_i^2)/N^2 (the "
    "chance two random rows share a partition — low = fine-grained "
    "pruning, high = few fat partitions). This is the profiling pass "
    "run BEFORE committing a 100 TB table layout: too many tiny "
    "partitions (order_year=fine at low SF, catastrophic small-files "
    "at high SF) vs too few fat ones (status: 3 partitions, no "
    "pruning) is exactly what these four numbers expose. One scan, "
    "O(candidates x values) aggregate, O(3) output.",
)
def layout_partition_key_advisor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cands = (
        orders.select(
            F.lit("o_orderpriority").alias("candidate"),
            F.col("o_orderpriority").alias("val"),
        )
        .unionByName(
            orders.select(
                F.lit("o_orderstatus").alias("candidate"),
                F.col("o_orderstatus").alias("val"),
            )
        )
        .unionByName(
            orders.select(
                F.lit("order_year").alias("candidate"),
                F.year("o_orderdate").cast("string").alias("val"),
            )
        )
    )
    per_val = cands.groupBy("candidate", "val").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    return (
        per_val.groupBy("candidate")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_partitions"),
            F.min("n").cast("bigint").alias("min_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.round(
                F.max("n") * F.count(F.lit(1)) / F.sum("n"), 6
            ).alias("skew_factor"),
            F.round(
                F.sum(F.col("n") * F.col("n"))
                / (F.sum("n") * F.sum("n")),
                6,
            ).alias("collision_prob"),
        )
        .orderBy("candidate")
    )


# ---------------------------------------------------------------------------
# Schema-on-read corrupt-record accounting (raw-feed ingestion DQ)
# ---------------------------------------------------------------------------

JSON_CORRUPT_MOD = 7  # event_id % 7 == 3 -> the line arrives truncated


@register(
    "source_json_corrupt_audit",
    oracle=f"""
SELECT event_type,
  CAST(COUNT(*) AS BIGINT) AS n_lines,
  CAST(SUM(CASE WHEN event_id % {JSON_CORRUPT_MOD} = 3
                THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
  CAST(SUM(CASE WHEN event_id % {JSON_CORRUPT_MOD} != 3
                THEN CAST(round(value * 100) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS good_value_cents
FROM events
GROUP BY event_type ORDER BY event_type
""",
    doc="Schema-on-read ingestion audit (source surface x DQ): render "
    "each event as the JSON line a raw feed would deliver (to_json), "
    "deterministically truncate the lines whose event_id % 7 == 3 (the "
    "corrupt-arrival law), then parse back with an EXPLICIT schema via "
    "from_json — Spark's PERMISSIVE contract turns malformed lines "
    "into null-field rows, never task failures — and account per "
    "event type: line count, corrupt count, and cents-exact value sum "
    "over the rows that survived parsing. One scan, JVM-side to_json/"
    "from_json, no file I/O, no inference pass (the 100 TB rule: "
    "schema inference is a full extra scan). The oracle replicates "
    "the corruption law directly against the clean table.",
)
def source_json_corrupt_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    schema = (
        "event_id bigint, user_id bigint, event_type string, value double"
    )
    lines = events.select(
        "event_type",
        F.to_json(
            F.struct("event_id", "user_id", "event_type", "value")
        ).alias("line"),
        (F.col("event_id") % JSON_CORRUPT_MOD == 3).alias("chop"),
    ).select(
        "event_type",
        F.when(
            F.col("chop"),
            F.substring(F.col("line"), 1, 10),  # truncated arrival
        )
        .otherwise(F.col("line"))
        .alias("line"),
    )
    parsed = lines.select(
        "event_type", F.from_json("line", schema).alias("p")
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(F.col("p.event_id").isNull(), 1).otherwise(0)
            ).alias("n_corrupt"),
            F.sum(
                F.when(
                    F.col("p.event_id").isNotNull(),
                    F.round(F.col("p.value") * 100).cast("bigint"),
                ).otherwise(0)
            ).alias("good_value_cents"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Rendezvous (highest-random-weight) sharding: minimal-movement resharding
# ---------------------------------------------------------------------------

HRW_SHARDS = 10  # current shard count; the audit also evaluates +1


def _hrw_score(key_col, shard: int):
    """Portable polynomial hash of 'doc:<id>:<shard>' — the per-(key,
    shard) rendezvous weight, identical expression in DuckDB."""
    # shard token FIRST: each later Horner step diffuses it, so the
    # per-shard scores are pseudo-independent (appending it last made
    # the final +x step dominate and one shard always won)
    s = F.concat(
        F.lit(f"s{shard}:doc:"), key_col.cast("string")
    )
    # Nonlinear (squaring) mixing step: an affine Horner cascade makes
    # cross-shard score differences CONSTANT within a key-length class
    # (diff = (x1_s - x1_t) * 131^(L-1) mod p), so whole length classes
    # landed on one shard. t = l*131 + x; l' = (t^2 + x) mod 1000003 —
    # t <= 1.4e8 so t^2 fits BIGINT in both engines.
    def step(acc, x):
        t = acc * 131 + x
        return (t * t + x) % 1000003

    return F.aggregate(
        F.transform(
            F.sequence(F.lit(1), F.length(s)),
            lambda i: (
                F.ascii(F.substring(s, 1, 1000000).substr(i, F.lit(1)))
                * 31
                + i
            )
            % 1000003,
        ),
        F.lit(0).cast("long"),
        step,
    )


def _hrw_score_sql(shard: int) -> str:
    # list_prepend(0, ...): DuckDB's list_reduce seeds with the FIRST
    # element (Spark's aggregate seeds with 0) — prepend the 0 so both
    # engines run the identical squaring cascade.
    return f"""(
      list_reduce(
        list_prepend(0,
          [(ascii(('s{shard}:doc:' || CAST(doc_id AS VARCHAR))[i]) * 31 + i) % 1000003
           for i in range(1, length('s{shard}:doc:' || CAST(doc_id AS VARCHAR)) + 1)]),
        (l, x) -> ((l * 131 + x) * (l * 131 + x) + x) % 1000003)
    )"""


@register(
    "layout_rendezvous_sharding",
    oracle=f"""
WITH scores AS (
  SELECT doc_id,
    {', '.join(f'{_hrw_score_sql(s)} AS s{s}' for s in range(HRW_SHARDS + 1))}
  FROM documents
),
assign AS (
  SELECT doc_id,
    list_indexof([{', '.join(f's{s}' for s in range(HRW_SHARDS))}],
      list_max([{', '.join(f's{s}' for s in range(HRW_SHARDS))}])) - 1
      AS shard_old,
    list_indexof([{', '.join(f's{s}' for s in range(HRW_SHARDS + 1))}],
      list_max([{', '.join(f's{s}' for s in range(HRW_SHARDS + 1))}])) - 1
      AS shard_new
  FROM scores
)
SELECT CAST(shard_old AS INT) AS shard,
  CAST(COUNT(*) AS BIGINT) AS n_docs,
  CAST(SUM(CASE WHEN shard_new != shard_old THEN 1 ELSE 0 END) AS BIGINT)
    AS n_moved,
  bool_and(shard_new = shard_old OR shard_new = {HRW_SHARDS})
    AS moves_only_to_new
FROM assign GROUP BY shard_old ORDER BY shard
""",
    doc="Rendezvous / highest-random-weight sharding audit (Thaler & "
    "Ravishankar 1996 — how a 100 TB layout assigns keys to shards so "
    "that RESHARDING moves the theoretical minimum): each doc goes to "
    "the shard with the highest deterministic (key, shard) hash "
    "weight; the audit evaluates the same assignment with one shard "
    "ADDED and reports, per current shard, how many docs move — HRW "
    "guarantees every move targets ONLY the new shard (bool-flagged "
    "per shard) and expected movement is n/(N+1). The hash is the "
    "repo's portable polynomial (a Horner cascade mod 1e9+7), so "
    "both engines assign identically. Per-doc work is O(N_shards), "
    "embarrassingly parallel in the scan; no shuffle until the "
    "O(shards) aggregate.",
)
def layout_rendezvous_sharding(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    scored = docs.select(
        "doc_id",
        *[
            _hrw_score(F.col("doc_id"), s).alias(f"s{s}")
            for s in range(HRW_SHARDS + 1)
        ],
    )
    old_arr = F.array(*[F.col(f"s{s}") for s in range(HRW_SHARDS)])
    new_arr = F.array(*[F.col(f"s{s}") for s in range(HRW_SHARDS + 1)])
    assign = scored.select(
        "doc_id",
        (F.array_position(old_arr, F.array_max(old_arr)) - 1)
        .cast("int")
        .alias("shard_old"),
        (F.array_position(new_arr, F.array_max(new_arr)) - 1)
        .cast("int")
        .alias("shard_new"),
    )
    moved = F.col("shard_new") != F.col("shard_old")
    return (
        assign.groupBy(F.col("shard_old").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(moved.cast("int")).cast("bigint").alias("n_moved"),
            F.bool_and(
                ~moved | (F.col("shard_new") == HRW_SHARDS)
            ).alias("moves_only_to_new"),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Bucketed co-located join: the pre-shuffled table layout
# ---------------------------------------------------------------------------

BUCKETS = 8


def write_bucketed_pair(
    spark: SparkSession, sf_dir: str
) -> tuple[str, str]:
    """Write orders + customer as Spark BUCKETED tables (bucketBy the
    join key, sortBy within buckets) — the layout that lets every future
    equi-join/aggregate on the key run WITHOUT an Exchange: both sides
    are pre-hash-partitioned on disk into the same bucket count, so the
    join becomes a per-bucket merge. At 100 TB this converts the
    dominant repeated shuffle of a fact table into a one-time write
    cost (the standard warehouse trick: bucket the biggest fact on its
    hottest join key). Tables are per-SF-named and overwritten
    idempotently; the no-Exchange plan is asserted in
    tests/test_layout.py with broadcast disabled."""
    import os
    import shutil

    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_")
    t_orders, t_cust = f"b_orders_{tag}", f"b_customer_{tag}"
    # A fresh session's in-memory catalog does not know tables a previous
    # session left in the warehouse dir; DROP alone won't clear the
    # orphaned location and the write would fail LOCATION_ALREADY_EXISTS.
    wh = spark.conf.get(
        "spark.sql.warehouse.dir", "spark-warehouse"
    ).removeprefix("file:")
    for t in (t_orders, t_cust):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    (
        orders.write.mode("overwrite")
        .bucketBy(BUCKETS, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .saveAsTable(t_orders)
    )
    (
        cust.write.mode("overwrite")
        .bucketBy(BUCKETS, "c_custkey")
        .sortBy("c_custkey")
        .format("parquet")
        .saveAsTable(t_cust)
    )
    return t_orders, t_cust


@register(
    "layout_bucketed_join",
    oracle="""
SELECT c.c_mktsegment AS segment,
  CAST(COUNT(*) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
    AS revenue_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
""",
    doc="Join over BUCKETED tables (the pre-shuffled layout): orders and "
    "customer are written bucketBy(8, custkey)/sortBy so the equi-join "
    "needs no Exchange on either side — tests/test_layout.py asserts "
    "the shuffle-free SortMergeJoin plan with broadcast disabled, and "
    "this query value-checks the result against the plain parquet "
    "join. The write is the one-time cost that amortizes across every "
    "subsequent join/aggregate on the key; per-segment revenue rides "
    "exact cents.",
)
def layout_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    t_orders, t_cust = write_bucketed_pair(spark, sf_dir)
    o = spark.table(t_orders)
    c = spark.table(t_cust)
    return (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Transaction-log snapshot reconstruction ("time travel") — the Delta/
# Iceberg metadata operation: replay an add/remove file log to the live
# file set at every version. The log is synthesized deterministically from
# orders (one file per order: added at version o_orderkey % 7, removed
# 1 + o_orderkey % 3 versions later for even orderkeys, never for odd), so
# both engines replay byte-identical actions.

TT_VERSIONS = 10


@register(
    "layout_snapshot_time_travel",
    oracle=f"""
WITH log AS (
  SELECT o_orderkey AS file_id,
         CAST(o_orderkey % 7 AS BIGINT) AS add_v,
         CASE WHEN o_orderkey % 2 = 0
              THEN CAST(o_orderkey % 7 + 1 + o_orderkey % 3 AS BIGINT)
         END AS rem_v,
         CAST(round(o_totalprice * 100) AS BIGINT) AS bytes
  FROM orders
),
deltas AS (
  SELECT add_v AS version, 1 AS df, bytes AS db FROM log
  UNION ALL
  SELECT rem_v, -1, -bytes FROM log
  WHERE rem_v IS NOT NULL AND rem_v < {TT_VERSIONS}
),
spine AS (
  SELECT CAST(unnest(range({TT_VERSIONS})) AS BIGINT) AS version
),
per_v AS (
  SELECT s.version,
         CAST(COALESCE(SUM(d.df), 0) AS BIGINT) AS d_files,
         CAST(COALESCE(SUM(d.db), 0) AS BIGINT) AS d_bytes
  FROM spine s LEFT JOIN deltas d ON d.version = s.version
  GROUP BY s.version
)
SELECT version,
  CAST(SUM(d_files) OVER (ORDER BY version) AS BIGINT) AS live_files,
  CAST(SUM(d_bytes) OVER (ORDER BY version) AS BIGINT) AS live_bytes
FROM per_v
""",
    doc="Lakehouse time travel: reconstruct the live file set at every "
    "table version by replaying an add/remove transaction log — the "
    "Delta/Iceberg snapshot operation. Scale-honest plan: the naive "
    "form joins the log against every version (O(V*files)); this one "
    "converts each file to +/- DELTA events, aggregates to O(V) rows, "
    "and takes ONE running-sum window over the tiny version spine — "
    "O(files) scan, O(V) window, no fan-out. FULL value oracle (the "
    "synthesized log is deterministic in both engines).",
)
def layout_snapshot_time_travel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    log = orders.select(
        (F.col("o_orderkey") % 7).cast("bigint").alias("add_v"),
        F.when(
            F.col("o_orderkey") % 2 == 0,
            (F.col("o_orderkey") % 7 + 1 + F.col("o_orderkey") % 3).cast(
                "bigint"
            ),
        ).alias("rem_v"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("bytes"),
    )
    deltas = log.select(
        F.col("add_v").alias("version"),
        F.lit(1).alias("df"),
        F.col("bytes").alias("db"),
    ).unionAll(
        log.filter(
            F.col("rem_v").isNotNull() & (F.col("rem_v") < TT_VERSIONS)
        ).select(
            F.col("rem_v").alias("version"),
            F.lit(-1).alias("df"),
            (-F.col("bytes")).alias("db"),
        )
    )
    spine = spark.range(TT_VERSIONS).select(
        F.col("id").cast("bigint").alias("version")
    )
    per_v = (
        spine.join(deltas, "version", "left")
        .groupBy("version")
        .agg(
            F.coalesce(F.sum("df"), F.lit(0))
            .cast("bigint")
            .alias("d_files"),
            F.coalesce(F.sum("db"), F.lit(0))
            .cast("bigint")
            .alias("d_bytes"),
        )
    )
    w = Window.orderBy("version").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return per_v.select(
        "version",
        F.sum("d_files").over(w).cast("bigint").alias("live_files"),
        F.sum("d_bytes").over(w).cast("bigint").alias("live_bytes"),
    )
