"""As-of join — the canonical "operator Spark lacks" (SURVEY.md §2b,
custom-operator guidance): for each event, the most recent order of the
same user at or before the event time.

Two implementations, mutually verified:

1. `asof_join_events_orders` (registered, oracled against DuckDB's native
   ASOF JOIN): the UNION + WINDOW formulation — tag both sides, union,
   and carry the latest order key forward with last(ignorenulls) over an
   event-time-ordered window per user. Pure JVM expressions, one shuffle
   on (user), state bounded by the window sort. This is how the operator
   survives 100 TB: it is exactly a sort-merge pass, the same shape the
   dedicated as-of implementations (kdb aj, QuestDB/DuckDB ASOF) use,
   with Spark's Exchange+Sort supplying the distribution.

2. `asof_merge_pandas` (tests): cogrouped applyInPandas running
   pandas.merge_asof per user group — the E15 cogroup surface, and an
   independent implementation the window version is checked against.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


def forward_running_window(partition_col: str, order_cols: list[str]):
    """The FORWARD as-of frame, evaluated in O(partition) instead of
    O(partition^2).

    ``first(x, ignorenulls) OVER (ORDER BY ... ROWS BETWEEN CURRENT ROW
    AND UNBOUNDED FOLLOWING)`` is quadratic per partition in Spark: the
    UnboundedFollowing frame re-evaluates the aggregate from the current
    row to the partition end for EVERY row (no incremental path exists
    for a shrinking frame). Invisible on the driver fixtures (max 99
    rows per user) — caught by the r14 25x hub-skew exec sweep, where
    one 109k-event Zipf-head user turned each forward as-of plan into a
    330-530 s single-task grind.

    The identical value is the running ``last(x, ignorenulls)`` over
    the REVERSED sort with the incremental
    ``[unboundedPreceding, currentRow]`` frame (both frames include the
    current row; rows tied on the full sort key carry no conflicting
    non-null payloads at any call site here, so reversal is exact).
    Costs one extra in-partition sort when a backward window shares the
    plan — O(n log n) against the O(n^2) it removes."""
    return (
        Window.partitionBy(partition_col)
        .orderBy(*[F.col(c).desc() for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # o_orderdate is TIMESTAMP_NTZ; under the catalog's pinned UTC
        # session the cast is wall-clock identity (matches DuckDB epoch_us).
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("ts_us"),
        "o_orderkey",
    )
    return events, orders


@register(
    "asof_join_events_orders",
    oracle="""
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
  o.o_orderkey AS last_orderkey
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey, o_orderkey,
    -- dedup equal timestamps per user: keep the max orderkey, matching
    -- the window formulation's "latest row wins at equal ts" semantics
    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC) AS rn,
    o_orderdate
  FROM orders
) o ON e.user_id = o.o_custkey AND o.rn = 1 AND e.ts >= o.o_orderdate
""",
    doc="As-of join (custom operator): latest order at-or-before each "
    "event, via union + last(ignorenulls) window — oracled against "
    "DuckDB's native ASOF JOIN.",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = _sides(spark, sf_dir)
    tagged = events.select(
        "user_id", "ts_us", F.lit(1).alias("is_event"), "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
    ).unionByName(
        orders.select(
            "user_id", "ts_us", F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"), "o_orderkey",
        )
    )
    # Orders sort before events at equal ts (asof is >=); among orders with
    # identical (user, ts), the largest orderkey wins (matches oracle rn=1).
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn(
            "last_orderkey", F.last("o_orderkey", ignorenulls=True).over(w)
        )
        .filter(F.col("is_event") == 1)
        .select("event_id", "user_id", "ts_us", "last_orderkey")
    )


def asof_merge_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Independent implementation: cogrouped applyInPandas + merge_asof.
    Each cogroup sees ONE user's events and orders; memory is bounded by
    the largest single user — the usual cogroup caveat."""
    events, orders = _sides(spark, sf_dir)

    def merge(key, ev: pd.DataFrame, od: pd.DataFrame) -> pd.DataFrame:
        ev = ev.sort_values("ts_us")
        od = (
            od.sort_values(["ts_us", "o_orderkey"])
            .drop_duplicates("ts_us", keep="last")
        )
        if od.empty:
            out = ev.copy()
            out["last_orderkey"] = pd.array(
                [None] * len(ev), dtype="Int64"
            )
        else:
            out = pd.merge_asof(
                ev,
                od[["ts_us", "o_orderkey"]].rename(
                    columns={"o_orderkey": "last_orderkey"}
                ),
                on="ts_us",
                direction="backward",
            )
        return out[["event_id", "user_id", "ts_us", "last_orderkey"]]

    return events.groupBy("user_id").cogroup(
        orders.groupBy("user_id")
    ).applyInPandas(
        merge,
        schema="event_id bigint, user_id bigint, ts_us bigint, "
        "last_orderkey bigint",
    )


@register(
    "asof_join_forward_next_purchase",
    oracle="""
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
  p.event_id AS next_purchase_id,
  epoch_us(p.ts) - epoch_us(e.ts) AS us_to_purchase
FROM events e
ASOF LEFT JOIN (
  SELECT user_id, event_id, ts,
    -- dedup identical timestamps per user: keep the MIN event_id,
    -- matching the window formulation's first()-in-sort-order semantics
    ROW_NUMBER() OVER (PARTITION BY user_id, ts
                       ORDER BY event_id ASC) AS rn
  FROM events WHERE event_type = 'purchase'
) p ON e.user_id = p.user_id AND p.rn = 1 AND e.ts < p.ts
WHERE e.event_type <> 'purchase'
""",
    doc="FORWARD as-of join: each non-purchase event joined to the "
    "user's next purchase STRICTLY after it — time-to-conversion / "
    "attribution, the forward direction the backward operator can't "
    "express. Same union + window machinery with the direction "
    "reversed — evaluated as a running last(ignorenulls) over the "
    "DESCENDING sort, because Spark's literal (currentRow, "
    "unboundedFollowing) frame is O(partition^2); "
    "oracled against DuckDB's native ASOF JOIN with the < inequality.",
)
def asof_join_forward_next_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Forward as-of within the event stream: one Exchange(user) + one
    sort, identical scale posture to the backward operator — the
    direction only flips the frame and the tie ordering. Strict '<'
    semantics: at equal timestamps the purchase does NOT match (left
    events sort after purchases at the same instant, and the frame
    starts one past the current row... realized by sorting purchases
    BEFORE left events at equal ts and using a following-only frame)."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    purchases = events.filter(F.col("event_type") == "purchase")
    left = events.filter(F.col("event_type") != "purchase")
    tagged = left.select(
        "user_id", "ts_us", F.lit(1).alias("is_left"), "event_id",
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("long").alias("p_ts"),
    ).unionByName(
        purchases.select(
            "user_id", "ts_us", F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts_us").alias("p_ts"),
        )
    )
    # Strict "after": purchases at the SAME ts as a left event must not
    # match it, so at equal ts purchases (is_left=0) sort FIRST and the
    # frame begins at 1 FOLLOWING... but a following-frame also skips
    # later same-ts purchases. Instead: purchases sort first and the
    # frame is anchored on the left row — a same-ts purchase then sits
    # BEFORE the left row, outside the frame, while any later-ts
    # purchase is inside. Among simultaneous purchases the smallest
    # event_id is first in sort order. Evaluated as the reversed-sort
    # running last() — see forward_running_window for why the literal
    # (currentRow, unboundedFollowing) frame is O(partition^2).
    w = forward_running_window("user_id", ["ts_us", "is_left", "p_id"])
    return (
        tagged.select(
            "user_id", "ts_us", "is_left", "event_id",
            F.last("p_id", ignorenulls=True).over(w).alias(
                "next_purchase_id"
            ),
            F.last("p_ts", ignorenulls=True).over(w).alias("p_ts_next"),
        )
        .filter(F.col("is_left") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            "next_purchase_id",
            (F.col("p_ts_next") - F.col("ts_us")).alias("us_to_purchase"),
        )
    )


ASOF_TOLERANCE_US = 7 * 24 * 3600 * 1_000_000  # max staleness: 7 days


@register(
    "asof_join_tolerance",
    oracle=f"""
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
  CASE WHEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
            <= {ASOF_TOLERANCE_US}
       THEN o.o_orderkey END AS recent_orderkey,
  CASE WHEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
            <= {ASOF_TOLERANCE_US}
       THEN epoch_us(e.ts) - epoch_us(o.o_orderdate)
  END AS staleness_us
FROM events e
ASOF LEFT JOIN (
  SELECT o_custkey, o_orderkey,
    ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                       ORDER BY o_orderkey DESC) AS rn,
    o_orderdate
  FROM orders
) o ON e.user_id = o.o_custkey AND o.rn = 1 AND e.ts >= o.o_orderdate
""",
    doc="As-of join WITH TOLERANCE (pandas merge_asof's `tolerance` "
    "semantics): the latest order at-or-before each event counts only "
    "if it is at most 7 days stale — older matches become NULL, exactly "
    "like a feature-store point-in-time lookup with a freshness SLA. "
    "Same union + last(ignorenulls) single-sort machinery as the plain "
    "backward as-of (the matched side's timestamp rides along in a "
    "second carried column, so staleness is one subtraction — no second "
    "join); oracled against DuckDB native ASOF + CASE.",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    events, orders = _sides(spark, sf_dir)
    tagged = events.select(
        "user_id", "ts_us", F.lit(1).alias("is_event"), "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("long").alias("o_ts_us"),
    ).unionByName(
        orders.select(
            "user_id", "ts_us", F.lit(0).alias("is_event"),
            F.lit(None).cast("long").alias("event_id"), "o_orderkey",
            F.col("ts_us").alias("o_ts_us"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "is_event", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    staleness = F.col("ts_us") - F.col("last_ots")
    fresh = staleness <= ASOF_TOLERANCE_US
    return (
        tagged.select(
            "ts_us", "is_event", "event_id", "user_id",
            F.last("o_orderkey", ignorenulls=True).over(w).alias(
                "last_orderkey"
            ),
            F.last("o_ts_us", ignorenulls=True).over(w).alias("last_ots"),
        )
        .filter(F.col("is_event") == 1)
        .select(
            "event_id",
            "user_id",
            "ts_us",
            F.when(fresh, F.col("last_orderkey")).alias("recent_orderkey"),
            F.when(fresh, staleness).alias("staleness_us"),
        )
    )


# ---------------------------------------------------------------------------
# NEAREST as-of join: closest match in either direction, ties backward
# ---------------------------------------------------------------------------


@register(
    "asof_join_nearest_purchase",
    oracle="""
WITH p AS (
  SELECT user_id, event_id, ts
  FROM (
    SELECT user_id, event_id, ts,
      ROW_NUMBER() OVER (PARTITION BY user_id, ts
                         ORDER BY event_id ASC) AS rn
    FROM events WHERE event_type = 'purchase'
  ) WHERE rn = 1
),
e AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type <> 'purchase'
),
b AS (
  SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
         pb.event_id AS b_id, epoch_us(pb.ts) AS b_ts
  FROM e ASOF LEFT JOIN p pb
    ON e.user_id = pb.user_id AND e.ts >= pb.ts
),
f AS (
  SELECT e.event_id, pf.event_id AS f_id, epoch_us(pf.ts) AS f_ts
  FROM e ASOF LEFT JOIN p pf
    ON e.user_id = pf.user_id AND e.ts < pf.ts
)
SELECT b.event_id, b.user_id, b.ts_us,
  CASE
    WHEN b.b_id IS NULL THEN f.f_id
    WHEN f.f_id IS NULL THEN b.b_id
    WHEN b.ts_us - b.b_ts <= f.f_ts - b.ts_us THEN b.b_id
    ELSE f.f_id END AS nearest_purchase_id,
  CASE
    WHEN b.b_id IS NULL THEN f.f_ts - b.ts_us
    WHEN f.f_id IS NULL THEN b.b_ts - b.ts_us
    WHEN b.ts_us - b.b_ts <= f.f_ts - b.ts_us THEN b.b_ts - b.ts_us
    ELSE f.f_ts - b.ts_us END AS signed_us_to_purchase
FROM b JOIN f ON b.event_id = f.event_id
""",
    doc="NEAREST as-of join (the third direction after backward and "
    "forward): each non-purchase event matched to the user's closest "
    "purchase in EITHER direction — |delta| minimized, exact ties "
    "resolved backward (the pandas merge_asof direction='nearest' "
    "contract). Spark computes BOTH candidates from ONE tagged union "
    "sharing ONE (user, ts) Exchange+Sort — a backward "
    "last(ignorenulls) frame and a forward first(ignorenulls) frame "
    "over the same sorted window, then a pure CASE pick — so nearest "
    "costs the same single shuffle as one-directional as-of at any "
    "scale. Same-instant purchases match backward (<=) not forward "
    "(<), same-ts purchase duplicates dedup to MIN event_id on both "
    "engines. Oracle: two native DuckDB ASOF JOINs + the same CASE.",
)
def asof_join_nearest_purchase(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type",
        F.unix_micros("ts").alias("ts_us"),
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id", "ts_us").orderBy("event_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    left = events.filter(F.col("event_type") != "purchase")
    tagged = left.select(
        "user_id", "ts_us", F.lit(1).alias("is_left"), "event_id",
        F.lit(None).cast("long").alias("p_id"),
        F.lit(None).cast("long").alias("p_ts"),
    ).unionByName(
        purchases.select(
            "user_id", "ts_us", F.lit(0).alias("is_left"),
            F.lit(None).cast("long").alias("event_id"),
            F.col("event_id").alias("p_id"),
            F.col("ts_us").alias("p_ts"),
        )
    )
    order = ["ts_us", "is_left", "p_id"]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Forward half via the reversed-sort running frame (one extra
    # in-partition sort; the literal forward frame is O(partition^2) —
    # see forward_running_window).
    w_fwd = forward_running_window("user_id", order)
    both = (
        tagged.select(
            "user_id", "ts_us", "is_left", "event_id",
            F.last("p_id", ignorenulls=True).over(w_back).alias("b_id"),
            F.last("p_ts", ignorenulls=True).over(w_back).alias("b_ts"),
            F.last("p_id", ignorenulls=True).over(w_fwd).alias("f_id"),
            F.last("p_ts", ignorenulls=True).over(w_fwd).alias("f_ts"),
        )
        .filter(F.col("is_left") == 1)
    )
    back_wins = (
        F.col("f_id").isNull()
        | (
            F.col("b_id").isNotNull()
            & (
                (F.col("ts_us") - F.col("b_ts"))
                <= (F.col("f_ts") - F.col("ts_us"))
            )
        )
    )
    return both.select(
        "event_id",
        "user_id",
        "ts_us",
        F.when(back_wins, F.col("b_id"))
        .otherwise(F.col("f_id"))
        .alias("nearest_purchase_id"),
        F.when(back_wins, F.col("b_ts") - F.col("ts_us"))
        .otherwise(F.col("f_ts") - F.col("ts_us"))
        .alias("signed_us_to_purchase"),
    )
