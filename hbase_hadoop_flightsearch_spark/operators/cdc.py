"""CDC merge / upsert — MERGE INTO semantics on plain parquet.

A change-data-capture feed carries (key, op ∈ {I, U, D}, payload, seq);
applying it to a snapshot is the core of every incremental lake pipeline.
Table formats (Delta/Iceberg) expose this as MERGE INTO; what their engines
compile it to — and what plain-parquet Spark must write by hand — is
exactly this two-step plan:

  1. collapse the feed to the LATEST change per key (struct-argmax /
     row_number over seq — one shuffle on key),
  2. FULL OUTER join the snapshot with the collapsed feed on key, then
     per-row resolve: D → drop, U → feed payload, I → feed row,
     no-change → snapshot row.

The reference's HBase put path (HPopulate/Main.java:97-116) gets upsert
behavior for free from LSM versioned cells but can never DELETE-by-feed or
collapse multi-change keys; this operator restores full CDC semantics on
immutable columnar storage.

Scale notes (100 TB): both steps shuffle on the merge key only — the feed
is typically ≪ snapshot, so AQE plans the outer join with the feed as the
(possibly broadcast) build side; with the snapshot bucketed on the key the
snapshot-side exchange disappears entirely (see test_bucketing.py). In a
real lake the final write is partition-scoped (dynamic partition overwrite,
sources/ingest.py::overwrite_partitions_dynamic) so only partitions
containing changed keys are rewritten.

The change feed here is derived deterministically FROM the orders table
(keys ≡ 0 mod 10 get two competing updates — seq must win; ≡ 1 mod 10
deleted; ≡ 2 mod 10 re-inserted under a shifted key) so DuckDB can oracle
the merged result value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

_INSERT_KEY_SHIFT = 100_000_000  # > max o_orderkey at any test SF


def synthetic_change_feed(orders: DataFrame) -> DataFrame:
    """(o_orderkey, op, new_price, new_status, seq) derived from orders."""
    base = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    mod = F.col("o_orderkey") % 10

    def feed(cond, key, op, price, status, seq):
        return base.filter(cond).select(
            key.alias("o_orderkey"),
            F.lit(op).alias("op"),
            price.alias("new_price"),
            status.alias("new_status"),
            F.lit(seq).alias("seq"),
        )

    key = F.col("o_orderkey")
    price, status = F.col("o_totalprice"), F.col("o_orderstatus")
    return (
        feed(mod == 0, key, "U", price + 100, status, 1)
        .unionAll(feed(mod == 0, key, "U", price + 200, status, 2))
        .unionAll(
            feed(mod == 1, key, "D", F.lit(None).cast("double"),
                 F.lit(None).cast("string"), 1)
        )
        .unionAll(feed(mod == 2, key + _INSERT_KEY_SHIFT, "I", price, status, 1))
    )


def merge_cdc(snapshot: DataFrame, feed: DataFrame) -> DataFrame:
    """Apply a CDC feed to a snapshot; both keyed on ``o_orderkey``."""
    w = Window.partitionBy("o_orderkey").orderBy(F.desc("seq"))
    latest = (
        feed.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    merged = snapshot.select("o_orderkey", "o_totalprice", "o_orderstatus").join(
        latest, "o_orderkey", "full_outer"
    )
    return merged.filter(
        F.col("op").isNull() | (F.col("op") != "D")
    ).select(
        "o_orderkey",
        F.round(F.coalesce("new_price", "o_totalprice"), 2).alias("o_totalprice"),
        F.coalesce("new_status", "o_orderstatus").alias("o_orderstatus"),
    )


_CDC_ORACLE = f"""
WITH changes AS (
  SELECT o_orderkey, 'U' AS op, o_totalprice + 100 AS new_price,
         o_orderstatus AS new_status, 1 AS seq
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'U', o_totalprice + 200, o_orderstatus, 2
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'D', NULL, NULL, 1
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT o_orderkey + {_INSERT_KEY_SHIFT}, 'I', o_totalprice, o_orderstatus, 1
  FROM orders WHERE o_orderkey % 10 = 2
),
latest AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
    FROM changes
  ) WHERE rn = 1
),
merged AS (
  SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
         ROUND(COALESCE(c.new_price, b.o_totalprice), 2) AS o_totalprice,
         COALESCE(c.new_status, b.o_orderstatus) AS o_orderstatus,
         c.op
  FROM orders b FULL OUTER JOIN latest c ON b.o_orderkey = c.o_orderkey
)
SELECT o_orderkey, o_totalprice, o_orderstatus
FROM merged WHERE op IS NULL OR op <> 'D'
"""


def snapshot_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """CDC *capture*: classify each key across two snapshots as I/U/D.

    The exact inverse of :func:`merge_cdc` — ``merge_cdc(old,
    snapshot_diff(old, new))`` reproduces ``new`` (property-tested in
    test_cdc.py). One full-outer shuffle join on the key; payload change
    detection is a null-safe struct comparison so NULL payloads diff
    correctly. At 100 TB both snapshots bucketed on the key make this
    exchange-free; this is how you bootstrap a CDC feed when the source
    can't emit one.
    """
    o = old.select(
        "o_orderkey",
        F.struct("o_totalprice", "o_orderstatus").alias("old_p"),
    )
    n = new.select(
        "o_orderkey",
        F.struct("o_totalprice", "o_orderstatus").alias("new_p"),
    )
    j = o.join(n, "o_orderkey", "full_outer")
    return (
        j.withColumn(
            "op",
            F.when(F.col("old_p").isNull(), "I")
            .when(F.col("new_p").isNull(), "D")
            .when(~F.col("old_p").eqNullSafe(F.col("new_p")), "U"),
        )
        .filter(F.col("op").isNotNull())
        .select(
            "o_orderkey",
            "op",
            F.round(F.col("new_p.o_totalprice"), 2).alias("new_price"),
            F.col("new_p.o_orderstatus").alias("new_status"),
        )
    )


_DIFF_ORACLE = f"""
WITH new_snap AS ({_CDC_ORACLE}),
old_snap AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
j AS (
  SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
         o.o_orderkey IS NOT NULL AS in_old,
         n.o_orderkey IS NOT NULL AS in_new,
         o.o_totalprice AS op_price, o.o_orderstatus AS op_status,
         n.o_totalprice AS np_price, n.o_orderstatus AS np_status
  FROM old_snap o FULL OUTER JOIN new_snap n ON o.o_orderkey = n.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN NOT in_old THEN 'I' WHEN NOT in_new THEN 'D' ELSE 'U' END AS op,
       ROUND(np_price, 2) AS new_price,
       np_status AS new_status
FROM j
WHERE NOT in_old OR NOT in_new
   OR op_price IS DISTINCT FROM np_price
   OR op_status IS DISTINCT FROM np_status
"""


@register(
    "cdc_snapshot_diff",
    oracle=_DIFF_ORACLE,
    doc="CDC capture: I/U/D classification of two snapshots via one "
    "full-outer join with null-safe payload comparison (inverse of merge).",
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    new_snap = merge_cdc(orders, synthetic_change_feed(orders))
    return snapshot_diff(
        orders.select(
            "o_orderkey",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
        ),
        new_snap,
    )


@register(
    "cdc_merge_orders",
    oracle=_CDC_ORACLE,
    doc="MERGE INTO semantics on parquet: latest-change-per-key collapse "
    "(seq argmax) + full-outer resolve of I/U/D against the snapshot.",
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return merge_cdc(orders, synthetic_change_feed(orders))


# ---------------------------------------------------------------------------
# SCD2-producing CDC apply: the HISTORY-keeping merge (vs merge_cdc's
# latest-state collapse) — every change in the feed becomes a validity
# version, deletes close without replacement.
# ---------------------------------------------------------------------------

_SCD2_APPLY_ORACLE = f"""
WITH changes AS (
  SELECT o_orderkey, 'U' AS op, o_totalprice + 100 AS new_price,
         o_orderstatus AS new_status, 1 AS seq
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'U', o_totalprice + 200, o_orderstatus, 2
  FROM orders WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, 'D', NULL, NULL, 1
  FROM orders WHERE o_orderkey % 10 = 1
  UNION ALL
  SELECT o_orderkey + {_INSERT_KEY_SHIFT}, 'I', o_totalprice,
         o_orderstatus, 1
  FROM orders WHERE o_orderkey % 10 = 2
),
versions AS (
  SELECT o_orderkey, 'B' AS op,
         o_totalprice AS price, o_orderstatus AS status,
         0 AS from_seq
  FROM orders
  UNION ALL
  SELECT o_orderkey, op, new_price, new_status, seq FROM changes
),
closed AS (
  SELECT o_orderkey, op, price, status, from_seq,
    LEAD(from_seq) OVER (PARTITION BY o_orderkey
                         ORDER BY from_seq) AS to_seq
  FROM versions
)
SELECT o_orderkey,
  ROUND(price, 2) AS price,
  status,
  CAST(from_seq AS INT) AS valid_from_seq,
  CAST(to_seq AS INT) AS valid_to_seq,
  to_seq IS NULL AS is_current
FROM closed WHERE op <> 'D'
"""


@register(
    "cdc_scd2_apply",
    oracle=_SCD2_APPLY_ORACLE,
    doc="SCD Type-2 CDC apply — the HISTORY-keeping counterpart of "
    "cdc_merge_orders' latest-state collapse: every feed change opens a "
    "new validity version of its key, the LEAD over (key, seq) closes "
    "the previous one, and a delete closes without replacement (the D "
    "row participates in the LEAD ordering but emits no version). The "
    "whole dimension history materializes in ONE union + ONE window "
    "pass — no iteration over changes, so a key with k changes costs "
    "O(k log k) inside its partition and the plan is a single "
    "Exchange(key); at 100 TB this is the standard way a lakehouse "
    "builds an SCD2 dimension from a CDC stream in batch. Versions: "
    "base rows open at seq 0, double-updated keys carry three versions "
    "([0,1),[1,2),[2,inf)), deleted keys close at 1 with no current "
    "row, inserts open at their feed seq.",
)
def cdc_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    feed = synthetic_change_feed(orders)
    base = orders.select(
        "o_orderkey",
        F.lit("B").alias("op"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
        F.lit(0).alias("from_seq"),
    )
    versions = base.unionByName(
        feed.select(
            "o_orderkey",
            "op",
            F.col("new_price").alias("price"),
            F.col("new_status").alias("status"),
            F.col("seq").alias("from_seq"),
        )
    )
    w = Window.partitionBy("o_orderkey").orderBy("from_seq")
    closed = versions.withColumn("to_seq", F.lead("from_seq").over(w))
    return closed.filter(F.col("op") != "D").select(
        "o_orderkey",
        F.round("price", 2).alias("price"),
        "status",
        F.col("from_seq").cast("int").alias("valid_from_seq"),
        F.col("to_seq").cast("int").alias("valid_to_seq"),
        F.col("to_seq").isNull().alias("is_current"),
    )
