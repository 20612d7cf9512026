"""Window-function operators (SURVEY.md §2b E6-E7).

Absent from the reference (its only 'window' is the hand-pivoted Float[12]
month array, HCompute/Main.java:132-142). Spark window functions shuffle
once on partitionBy keys and sort within partitions; every ORDER BY below
includes a unique tiebreaker column so results are deterministic and
oracle-comparable.

Scale note: a window over partitionBy(c) is one Exchange(c) + in-partition
sort — same cost envelope as a groupBy(c) plus sort. The top-k pattern
(row_number <= k) never materializes a global sort; only per-group heads
survive the filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "window_topk_orders_per_segment",
    oracle="""
SELECT * FROM (
  SELECT c_mktsegment AS segment, o_orderkey, o_custkey,
    ROUND(o_totalprice, 2) AS totalprice,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY c_mktsegment
      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
""",
    doc="Top-k per group (E7): row_number window + filter, no global sort.",
)
def window_topk_orders_per_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("c_mktsegment").alias("segment"),
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            "rn",
        )
    )


@register(
    "window_order_gaps_lag",
    oracle="""
SELECT o_orderkey, o_custkey,
  CAST(date_diff('day',
    LAG(o_orderdate) OVER (PARTITION BY o_custkey
                           ORDER BY o_orderdate, o_orderkey),
    o_orderdate) AS INT) AS gap_days
FROM orders
""",
    doc="LAG (E6): days since the customer's previous order (NULL for first).",
)
def window_order_gaps_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lag("o_orderdate").over(w)
        ).alias("gap_days"),
    )


@register(
    "window_running_revenue",
    oracle="""
SELECT o_orderkey, o_custkey,
  ROUND(SUM(o_totalprice) OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
FROM orders
""",
    doc="Running sum with an explicit ROWS frame (E6).",
)
def window_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_moving_avg_3",
    oracle="""
SELECT o_orderkey, o_custkey,
  ROUND(AVG(o_totalprice) OVER (
    PARTITION BY o_custkey
    ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 3) AS moving_avg
FROM orders
""",
    doc="Sliding ROWS frame (E6): 3-order moving average per customer.",
)
def window_moving_avg_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, Window.currentRow)
    )
    # Rounded at 3 decimals: a 3-row average divides 2-decimal prices by
    # 1, 2 or 3, and /2 lands EXACTLY on .xx5 half-boundaries where Spark
    # and DuckDB round differently; at 3 decimals no divisor <=3 can
    # produce an exact half-boundary.
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.avg("o_totalprice").over(w), 3).alias("moving_avg"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
SELECT p_partkey, p_brand,
  CAST(RANK() OVER w AS INT) AS price_rank,
  CAST(DENSE_RANK() OVER w AS INT) AS price_dense_rank,
  CAST(NTILE(4) OVER w AS INT) AS price_quartile
FROM part
WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
""",
    doc="rank / dense_rank / ntile (E6) sharing one window spec.",
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return part.select(
        "p_partkey",
        "p_brand",
        F.rank().over(w).cast("int").alias("price_rank"),
        F.dense_rank().over(w).cast("int").alias("price_dense_rank"),
        F.ntile(4).over(w).cast("int").alias("price_quartile"),
    )


@register(
    "sort_orders_global",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_totalprice > 100000
ORDER BY o_totalprice DESC, o_orderkey
""",
    doc="Global total-order sort (O1/E7): Exchange rangepartitioning "
    "(sampled range bounds) + per-partition sort — the distributed upgrade "
    "of the MR framework's per-reducer key sort.",
)
def sort_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unlike the reference (sorted only WITHIN each of 10 reducer files,
    Secondary/Main.java:198), orderBy is a true total order: range
    partitioner samples bounds, so output partition i < partition i+1."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_totalprice") > 100000)
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@register(
    "window_time_range_frame",
    oracle="""
SELECT event_id, user_id,
  CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE) / 100
    AS trailing_1h_value,
  CAST(COUNT(*) OVER w AS BIGINT) AS trailing_1h_events
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
)
""",
    doc="Time-based RANGE frame (E6): per-event trailing-1-hour sum/count "
    "per user — the frame is bounded by event-time distance (integer "
    "microseconds), not row count; peers at equal timestamps are all "
    "included, so the result is order-independent and engine-exact.",
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frames need a numeric ordering key in the DataFrame API —
    unix_micros(ts) keeps the bound arithmetic in exact integers (the
    cents-cast keeps the double sum exact; see timeseries.py). Same
    single-exchange shape as any user-partitioned window."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.round(F.col("value") * 100, 0).cast("bigint")
    return events.select(
        "event_id",
        "user_id",
        (F.sum(cents).over(w).cast("double") / 100).alias(
            "trailing_1h_value"
        ),
        F.count(F.lit(1)).over(w).alias("trailing_1h_events"),
    )


@register(
    "window_value_functions",
    oracle="""
SELECT o_orderkey, o_custkey,
  FIRST_VALUE(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ) AS first_price,
  LAST_VALUE(o_totalprice) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS last_price,
  NTH_VALUE(o_totalprice, 2) OVER (
    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
  ) AS second_price,
  PERCENT_RANK() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
  ) AS price_pct_rank,
  CUME_DIST() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
  ) AS price_cume_dist
FROM orders
ORDER BY o_orderkey
""",
    doc="Window value functions (first/last/nth_value with explicit "
    "frames) plus percent_rank/cume_dist distribution functions.",
)
def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order history annotated with the first, last, and
    second order price, plus each order's relative price position.

    Frame semantics this query pins down: with an ORDER BY, the DEFAULT
    frame is RANGE UNBOUNDED PRECEDING..CURRENT ROW — fine for
    FIRST_VALUE, but LAST_VALUE/NTH_VALUE under the default frame
    degenerate to 'current row so far', so both get an explicit
    unbounded-both-ends ROWS frame (the classic window-function trap;
    identical rule in Spark and DuckDB, asserted by the oracle).
    NTH_VALUE(_, 2) is NULL for single-order customers — null-propagation
    is part of the check. percent_rank=(rank-1)/(n-1) and cume_dist are
    exact k/n doubles, engine-identical. Every ORDER BY carries the
    unique o_orderkey tiebreaker (o_orderdate and o_totalprice tie).

    Scale shape: all five functions share the o_custkey partitioning, so
    the plan is ONE Exchange(o_custkey) + two in-partition sorts (two
    distinct sort orders) — adding functions over the same partition key
    is free of extra shuffles.
    """
    orders = load_table(spark, sf_dir, "orders")
    by_date = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    by_date_full = by_date.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    by_price = Window.partitionBy("o_custkey").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        orders.select(
            "o_orderkey",
            "o_custkey",
            F.first_value("o_totalprice").over(by_date).alias("first_price"),
            F.last_value("o_totalprice")
            .over(by_date_full)
            .alias("last_price"),
            F.nth_value("o_totalprice", 2)
            .over(by_date_full)
            .alias("second_price"),
            F.percent_rank().over(by_price).alias("price_pct_rank"),
            F.cume_dist().over(by_price).alias("price_cume_dist"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "window_topk_with_ties",
    oracle="""
WITH r AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
    RANK() OVER (PARTITION BY c_mktsegment
                 ORDER BY round(c_acctbal, 0) DESC) AS rk
  FROM customer
)
SELECT c_mktsegment, c_custkey, c_acctbal, CAST(rk AS INT) AS rk
FROM r WHERE rk <= 5
""",
    doc="Top-k per group WITH TIES (E7): rank() instead of row_number(), "
    "so equal keys all survive and the result can exceed k rows per "
    "group — the WITH TIES semantics of SQL:2008 FETCH FIRST. Ranking on "
    "the rounded balance manufactures real ties (and makes the rank "
    "deterministic across engines: unrounded doubles rank identically, "
    "but the output row SET is what ties change). Same WindowGroupLimit "
    "partial-pushdown shape as the row_number top-k — rank() is "
    "group-limit-eligible, so each task emits at most rank<=k rows "
    "before the exchange.",
)
def window_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.round("c_acctbal", 0).desc()
    )
    return (
        cust.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.rank().over(w).cast("int").alias("rk"),
        )
        .filter(F.col("rk") <= 5)
    )


@register(
    "window_pct_change_mom",
    oracle="""
WITH monthly AS (
  SELECT o_orderpriority,
    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS rev_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, month, rev_cents,
  LAG(rev_cents) OVER w AS prev_cents,
  ROUND((rev_cents - LAG(rev_cents) OVER w) * 100.0
        / LAG(rev_cents) OVER w, 4) AS pct_change
FROM monthly
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
ORDER BY o_orderpriority, month
""",
    doc="Month-over-month revenue change per priority segment — the BI "
    "staple. Revenue folds to exact BIGINT cents before any window "
    "touches it (the percent ratio is the only float, computed once "
    "from two integers and rounded — engine-stable). Spark shape: one "
    "partial-agg shuffle to the monthly rollup, then a single LAG "
    "window over O(segments x months) rows; first month NULLs rather "
    "than fabricating a baseline.",
)
def window_pct_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        "o_orderpriority",
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias(
            "month"
        ),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.partitionBy("o_orderpriority").orderBy("month")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "o_orderpriority",
        "month",
        "rev_cents",
        prev.alias("prev_cents"),
        F.round((F.col("rev_cents") - prev) * 100.0 / prev, 4).alias(
            "pct_change"
        ),
    ).orderBy("o_orderpriority", "month")


@register(
    "events_inter_arrival_stats",
    oracle="""
WITH gaps AS (
  SELECT user_id,
    epoch_us(ts) - epoch_us(LAG(ts) OVER (
      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
  FROM events
),
arrs AS (
  SELECT user_id,
    CAST(COUNT(*) AS BIGINT) AS n_gaps,
    CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
    CAST(MAX(gap_us) AS BIGINT) AS max_gap_us,
    list_sort(list(CAST(gap_us AS BIGINT))) AS arr
  FROM gaps WHERE gap_us IS NOT NULL
  GROUP BY user_id
  HAVING COUNT(*) >= 20
)
SELECT user_id, n_gaps, min_gap_us, max_gap_us,
  (arr[CAST((n_gaps - 1) * 5 // 10 AS INT) + 1]
   + (COALESCE(arr[CAST((n_gaps - 1) * 5 // 10 AS INT) + 2],
               arr[CAST((n_gaps - 1) * 5 // 10 AS INT) + 1])
      - arr[CAST((n_gaps - 1) * 5 // 10 AS INT) + 1])
     * CAST((n_gaps - 1) * 5 % 10 AS DOUBLE) / CAST(10 AS DOUBLE))
    AS p50_gap_us,
  (arr[CAST((n_gaps - 1) * 9 // 10 AS INT) + 1]
   + (COALESCE(arr[CAST((n_gaps - 1) * 9 // 10 AS INT) + 2],
               arr[CAST((n_gaps - 1) * 9 // 10 AS INT) + 1])
      - arr[CAST((n_gaps - 1) * 9 // 10 AS INT) + 1])
     * CAST((n_gaps - 1) * 9 % 10 AS DOUBLE) / CAST(10 AS DOUBLE))
    AS p90_gap_us
FROM arrs
ORDER BY user_id
""",
    doc="Per-user inter-arrival-time distribution (min/max/p50/p90 gap "
    "in integer microseconds) for users with enough history — the "
    "activity-cadence profile behind engagement scoring and "
    "bot-vs-human screens. r10 hardening: p50/p90 interpolate via the "
    "explicit rank formula over the sorted per-user gap array — h = "
    "(n-1)*q held in exact tenths, neighbors from integer ranks, ONE "
    "final division of identical integers — because the engines' "
    "built-in interpolations (a + (b-a)*f vs a*(1-f) + b*f) are 1 ulp "
    "apart at non-dyadic q = 0.9 (the boundary class the altseed-777 "
    "differential caught on the money percentiles). One "
    "Exchange(user_id) shared by the LAG window and the per-user "
    "aggregate; the collected gap array is per-user-history-bounded. "
    "Output O(users).",
)
def events_inter_arrival_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = events.select(
        "user_id",
        (
            F.unix_micros(F.col("ts"))
            - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    def interp(mult: int) -> str:
        lo = f"element_at(arr, CAST((n_gaps - 1) * {mult} div 10 AS INT) + 1)"
        hi = (
            f"COALESCE(element_at(arr, CAST((n_gaps - 1) * {mult} div 10"
            f" AS INT) + 2), {lo})"
        )
        return (
            f"{lo} + ({hi} - {lo})"
            f" * CAST((n_gaps - 1) * {mult} % 10 AS DOUBLE)"
            f" / CAST(10 AS DOUBLE)"
        )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.min("gap_us").cast("bigint").alias("min_gap_us"),
            F.max("gap_us").cast("bigint").alias("max_gap_us"),
            F.sort_array(F.collect_list("gap_us")).alias("arr"),
        )
        .filter(F.col("n_gaps") >= 20)
        .select(
            "user_id",
            "n_gaps",
            "min_gap_us",
            "max_gap_us",
            F.expr(interp(5)).alias("p50_gap_us"),
            F.expr(interp(9)).alias("p90_gap_us"),
        )
        .orderBy("user_id")
    )


@register(
    "window_yoy_change",
    oracle="""
WITH monthly AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
    CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mth,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS rev_cents
  FROM orders GROUP BY 1, 2
)
SELECT yr, mth, rev_cents,
  LAG(rev_cents) OVER w AS prev_year_cents,
  ROUND((rev_cents - LAG(rev_cents) OVER w) * 100.0
        / LAG(rev_cents) OVER w, 4) AS yoy_pct
FROM monthly
WINDOW w AS (PARTITION BY mth ORDER BY yr)
ORDER BY yr, mth
""",
    doc="Year-over-year revenue change per calendar month: the "
    "seasonality-aware sibling of window_pct_change_mom — partitioning "
    "the LAG window BY MONTH makes 'previous row' mean 'same month "
    "last year', so no 12-step frame arithmetic and no seasonal "
    "aliasing. Exact BIGINT cents into the window; one ratio rounded. "
    "First observed year NULLs honestly.",
)
def window_yoy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mth"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    w = Window.partitionBy("mth").orderBy("yr")
    prev = F.lag("rev_cents").over(w)
    return monthly.select(
        "yr", "mth", "rev_cents",
        prev.alias("prev_year_cents"),
        F.round((F.col("rev_cents") - prev) * 100.0 / prev, 4).alias(
            "yoy_pct"
        ),
    ).orderBy("yr", "mth")


# ---------------------------------------------------------------------------
# Rolling regression: per-customer OLS slope over a trailing order window
# ---------------------------------------------------------------------------

ROLL_OLS_WIN = 8  # trailing orders per slope
ROLL_OLS_CUST_MOD = 50  # report customers with custkey % 50 == 7


@register(
    "window_rolling_regression_slope",
    oracle=f"""
WITH seq AS (
  SELECT o_custkey, o_orderkey,
    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS BIGINT) AS x,
    CAST(round(o_totalprice * 100) AS BIGINT) AS y
  FROM orders
),
sums AS (
  SELECT o_custkey, x,
    COUNT(*) OVER w AS n, SUM(x) OVER w AS sx, SUM(y) OVER w AS sy,
    SUM(x * y) OVER w AS sxy, SUM(x * x) OVER w AS sxx,
    MAX(x) OVER (PARTITION BY o_custkey) AS max_x
  FROM seq
  WINDOW w AS (PARTITION BY o_custkey ORDER BY x
               ROWS BETWEEN {ROLL_OLS_WIN - 1} PRECEDING AND CURRENT ROW)
)
SELECT o_custkey, CAST(n AS BIGINT) AS n_window,
  CAST(CASE WHEN n * sxx - sx * sx != 0
       THEN (n * sxy - sx * sy) * 1000000 // (n * sxx - sx * sx)
       END AS BIGINT) AS slope_micro_cents
FROM sums
WHERE x = max_x AND o_custkey % {ROLL_OLS_CUST_MOD} = 7
ORDER BY o_custkey
""",
    doc="Rolling ordinary-least-squares trend (E6 window family, the "
    "'is this customer's spend trending up' primitive): per customer, "
    "OLS slope of order value (cents) against order sequence over the "
    f"trailing {ROLL_OLS_WIN} orders, evaluated at the latest order. "
    "All five sufficient statistics (n, Sx, Sy, Sxy, Sxx) are BIGINT "
    "window sums over one frame, and the slope is exact integer "
    "micro-cents via bigint div — no float enters until never. Same "
    "closed-form-from-sufficient-stats pattern as ml_linear_regression "
    "but windowed: one shuffle on customer, one frame pass; at 100 TB "
    "each customer's history windows independently.",
)
def window_rolling_regression_slope(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.catalog import load_table

    orders = load_table(spark, sf_dir, "orders")
    wseq = Window.partitionBy("o_custkey").orderBy(
        "o_orderdate", "o_orderkey"
    )
    seq = orders.select(
        "o_custkey",
        F.row_number().over(wseq).cast("bigint").alias("x"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("y"),
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("x")
        .rowsBetween(-(ROLL_OLS_WIN - 1), Window.currentRow)
    )
    wall = Window.partitionBy("o_custkey")
    sums = seq.select(
        "o_custkey",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(w).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.max("x").over(wall).alias("max_x"),
    )
    return (
        sums.filter(
            (F.col("x") == F.col("max_x"))
            & (F.col("o_custkey") % ROLL_OLS_CUST_MOD == 7)
        )
        .select(
            "o_custkey",
            F.col("n").cast("bigint").alias("n_window"),
            F.expr(
                "CAST(CASE WHEN n * sxx - sx * sx != 0 "
                "THEN (n * sxy - sx * sy) * 1000000 div (n * sxx - sx * sx) "
                "END AS BIGINT)"
            ).alias("slope_micro_cents"),
        )
        .orderBy("o_custkey")
    )


# ---------------------------------------------------------------------------
# Exact sliding-window median (order statistic over a trailing frame)
# ---------------------------------------------------------------------------

MEDIAN_FRAME_DAYS = 7  # trailing frame width (rows = days after gap-free agg)


@register(
    "window_sliding_median_exact",
    oracle=f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM orders GROUP BY 1
),
framed AS (
  SELECT d, cents,
    list_sort(list(cents) OVER (ORDER BY d
      ROWS BETWEEN {MEDIAN_FRAME_DAYS - 1} PRECEDING AND CURRENT ROW))
      AS win
  FROM daily
)
SELECT d, cents,
  CAST(len(win) AS INT) AS n_in_frame,
  CAST(win[CAST((len(win) + 1) // 2 AS INT)] AS BIGINT) AS median_lo_cents,
  CAST(win[CAST(len(win) // 2 + 1 AS INT)] AS BIGINT) AS median_hi_cents
FROM framed
""",
    doc="Exact trailing-7-row sliding MEDIAN of daily revenue — the "
    "order statistic neither engine offers as a built-in window "
    "function (percentile_approx is a sketch; median() is not a window "
    "aggregate in Spark). Implemented as collect_list over the frame + "
    "array_sort + middle element(s): O(W log W) per row at constant "
    "W=7, fused in the window operator after one daily pre-aggregate, "
    "so the sort-per-row never touches raw orders. Both low and high "
    "middles ship so even-sized warmup frames stay integer-exact (no "
    "averaging division). At 100 TB the pattern is per-key (the window "
    "would be PARTITIONED BY series) and W stays constant — the global "
    "single-series frame here is the worst case, same class as "
    "sort_orders_global. DuckDB twin: list() window + list_sort.",
)
def window_sliding_median_exact(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("d").rowsBetween(-(MEDIAN_FRAME_DAYS - 1), 0)
    win = F.array_sort(F.collect_list("cents").over(w))
    framed = daily.select("d", "cents", win.alias("win"))
    n = F.size("win")
    return framed.select(
        "d",
        "cents",
        n.cast("int").alias("n_in_frame"),
        F.element_at("win", ((n + 1) / 2).cast("int"))
        .cast("bigint")
        .alias("median_lo_cents"),
        F.element_at("win", (n / 2 + 1).cast("int"))
        .cast("bigint")
        .alias("median_hi_cents"),
    )


# ---------------------------------------------------------------------------
# Maximum drawdown — the canonical risk statistic over a cumulative
# series: the deepest peak-to-trough fall of running revenue.


@register(
    "window_max_drawdown",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      AS rev_cents
  FROM orders GROUP BY 1
),
centered AS (
  SELECT day, rev_cents,
    rev_cents - (SELECT CAST(SUM(rev_cents) // COUNT(*) AS BIGINT)
                 FROM daily) AS dev
  FROM daily
),
cum AS (
  SELECT day, dev,
    CAST(SUM(dev) OVER (ORDER BY day) AS BIGINT) AS equity
  FROM centered
),
dd AS (
  SELECT day, equity,
    CAST(MAX(equity) OVER (ORDER BY day) AS BIGINT) AS peak
  FROM cum
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
  CAST(MAX(peak - equity) AS BIGINT) AS max_drawdown_cents,
  CAST(MIN(equity) AS BIGINT) AS min_equity_cents,
  CAST(MAX(equity) AS BIGINT) AS max_equity_cents
FROM dd
""",
    doc="Maximum drawdown of the mean-centered cumulative daily-revenue "
    "series (centering turns the monotone revenue sum into a "
    "fluctuating equity curve, which is what drawdown measures): "
    "running sum + running max + one aggregate, all exact BIGINT cents "
    "— two ordered window passes sharing one sort, O(days) rows after "
    "the first rollup. The risk-statistic complement to the "
    "anomaly/changepoint family.",
)
def window_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
        .cast("bigint")
        .alias("rev_cents")
    )
    mean = daily.agg(
        F.expr("CAST(SUM(rev_cents) div COUNT(*) AS BIGINT)").alias("mu")
    )
    centered = daily.crossJoin(F.broadcast(mean)).select(
        "day", (F.col("rev_cents") - F.col("mu")).alias("dev")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = centered.select(
        "day", F.sum("dev").over(w).cast("bigint").alias("equity")
    ).select(
        "day",
        "equity",
        F.max("equity")
        .over(Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("peak"),
    )
    return dd.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.max(F.col("peak") - F.col("equity"))
        .cast("bigint")
        .alias("max_drawdown_cents"),
        F.min("equity").cast("bigint").alias("min_equity_cents"),
        F.max("equity").cast("bigint").alias("max_equity_cents"),
    )
