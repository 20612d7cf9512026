"""The flagship query: per-carrier monthly average arrival delay.

This single query IS the reference — HCompute (HCompute/Main.java:73-162,
HBase scan input) and Secondary (Secondary/Main.java:82-182, CSV input) both
compute: for year 2008, excluding cancelled and diverted flights, the
per-carrier per-month average arrival delay, pivoted to 12 columns.

Quirks preserved in compat mode (SURVEY.md §4):
  * rounding is ``Math.round(sum/count + 0.5f)`` == floor(avg)+1 for avg>=0
    (HCompute/Main.java:145) — an exact average of 3.0 reports 4;
  * an empty carrier-month is 0f/0 = NaN, Math.round(NaN) == 0
    (HCompute/Main.java:143-146) — here the pivot yields NULL, filled to 0;
  * the cancelled/diverted test is float->int TRUNCATION
    ((int)Float.parseFloat(x) != 1, HCompute/Main.java:118-120);
  * the formatted line is "AIR-<carrier>\\t, (1,d1), …, (12,d12)" with a
    LEADING ", " (HCompute/Main.java:151-161).

Physical shape (vs the reference's MapReduce): scan → fused
filter+project (whole-stage codegen) → partial HashAggregate →
Exchange(carrier) → final HashAggregate. The reference ships every surviving
row through the shuffle (no combiner — absence at HCompute/Main.java:45-71);
Spark's partial aggregation shrinks shuffle volume to O(carriers × 12) per
task, which is what makes this plan survive 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.flights import FLIGHTS_CTE, FLIGHTS_EXT_CTE, flights
from .registry import register

MONTHS = list(range(1, 13))


def _completed_2008(fl: DataFrame) -> DataFrame:
    # F1 year filter (HCompute/Main.java:109-111) + F2 completed-flight
    # filter with the float->int truncation quirk (:118-120).
    return fl.filter(
        (F.col("year") == 2008)
        & (F.col("cancelled").cast("int") != 1)
        & (F.col("diverted").cast("int") != 1)
    )


_ORACLE_FILTER = (
    "year = 2008 AND CAST(FLOOR(cancelled) AS INT) != 1 "
    "AND CAST(FLOOR(diverted) AS INT) != 1"
)
# NB: DuckDB CAST(double AS INT) rounds-half-even while Spark truncates, so
# the oracle spells truncation as FLOOR. Values are exactly 0.0/1.0 in data;
# FLOOR keeps the quirk faithful for hypothetical 0.99 inputs too.


def delay_report_from(fl: DataFrame) -> DataFrame:
    """Compat-mode pivot over an arbitrary flights DataFrame (used by both
    the registered query and the golden quirk test)."""
    agg = (
        _completed_2008(fl)
        .groupBy("carrier")
        .pivot("month", MONTHS)
        .agg((F.floor(F.avg("arr_delay_minutes")) + 1).cast("int"))
        .na.fill(0)
    )
    return agg.select(
        "carrier", *[F.col(str(m)).alias(f"m{m}") for m in MONTHS]
    )


def format_report(pivoted: DataFrame) -> DataFrame:
    """X1/X2 rendering (HCompute/Main.java:151-161): 'AIR-<carrier>' key and
    the month list with its leading ', '."""
    return pivoted.select(
        F.concat(F.lit("AIR-"), F.col("carrier")).alias("report_key"),
        F.concat(
            *[
                F.format_string(", (%d,%d)", F.lit(m), F.col(f"m{m}"))
                for m in MONTHS
            ]
        ).alias("report_line"),
    )


@register(
    "flight_delay_report",
    oracle=FLIGHTS_CTE
    + """
SELECT carrier,
"""
    + ",\n".join(
        f"  COALESCE(CAST(FLOOR(AVG(arr_delay_minutes) "
        f"FILTER (WHERE month = {m})) AS INT) + 1, 0) AS m{m}"
        for m in MONTHS
    )
    + f"""
FROM flights
WHERE {_ORACLE_FILTER}
GROUP BY carrier
""",
    headline=True,
    doc="Flagship compat-mode pivot: floor(avg)+1, empty month -> 0.",
)
def flight_delay_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compat-mode flagship: carrier x month pivot of floor(avg)+1."""
    return delay_report_from(flights(spark, sf_dir))


@register(
    "flight_delay_report_formatted",
    oracle=FLIGHTS_CTE
    + """
, pivoted AS (
  SELECT carrier,
"""
    + ",\n".join(
        f"    COALESCE(CAST(FLOOR(AVG(arr_delay_minutes) "
        f"FILTER (WHERE month = {m})) AS INT) + 1, 0) AS m{m}"
        for m in MONTHS
    )
    + f"""
  FROM flights
  WHERE {_ORACLE_FILTER}
  GROUP BY carrier
)
SELECT 'AIR-' || carrier AS report_key,
  """
    + " || ".join(f"printf(', (%d,%d)', {m}, m{m})" for m in MONTHS)
    + """ AS report_line
FROM pivoted
""",
    doc="Exact reference output lines: AIR-<carrier> + ', (m,d)' x 12.",
)
def flight_delay_report_formatted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 string formatting (HCompute/Main.java:151-161), leading ', '
    included: the golden-output rendering of the flagship."""
    return format_report(flight_delay_report(spark, sf_dir))


@register(
    "flight_delay_clean",
    oracle=FLIGHTS_CTE
    + f"""
SELECT carrier, month,
  ROUND(SUM(arr_delay_minutes) * 100 / COUNT(*)) / 100 AS avg_delay,
  COUNT(*) AS n_flights
FROM flights
WHERE {_ORACLE_FILTER}
GROUP BY carrier, month
""",
    doc="Clean-mode long-format report (no quirks): avg delay per carrier-month.",
)
def flight_delay_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Idiomatic (non-compat) version: long format, true average.

    2-decimal rounding is spelled round(sum*100/count)/100, not
    round(avg, 2): delays are integers, so sum*100 is exact and a true
    half-way quotient is exactly representable — Spark (HALF_UP on the
    shortest decimal repr) and DuckDB (std::round on the binary value)
    agree at integer halves but NOT at fractional-scale halves like
    round(65.725, 2), where the binary value sits below the printed half."""
    return (
        _completed_2008(flights(spark, sf_dir))
        .groupBy("carrier", "month")
        .agg(
            (
                F.round(F.sum("arr_delay_minutes") * 100 / F.count(F.lit(1)))
                / 100
            ).alias("avg_delay"),
            F.count(F.lit(1)).alias("n_flights"),
        )
    )


@register(
    "flight_cancellation_rates",
    oracle=FLIGHTS_CTE
    + """
SELECT carrier,
  COUNT(*) AS n_total,
  CAST(SUM(CASE WHEN cancelled = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_cancelled,
  CAST(SUM(CASE WHEN diverted = 1.0 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_diverted,
  ROUND(SUM(CASE WHEN cancelled = 1.0 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 4)
    AS cancel_rate
FROM flights
GROUP BY carrier
""",
    doc="Carrier-level data-quality rollup over the raw (unfiltered) feed.",
)
def flight_cancellation_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extension query over the same feed: per-carrier cancel/divert counts."""
    fl = flights(spark, sf_dir)
    return fl.groupBy("carrier").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(F.col("cancelled") == 1.0, 1).otherwise(0))
        .cast("long")
        .alias("n_cancelled"),
        F.sum(F.when(F.col("diverted") == 1.0, 1).otherwise(0))
        .cast("long")
        .alias("n_diverted"),
        F.round(
            F.sum(F.when(F.col("cancelled") == 1.0, 1).otherwise(0))
            / F.count(F.lit(1)),
            4,
        ).alias("cancel_rate"),
    )


OTP_THRESHOLD_MIN = 15  # DOT definition: on time = arrival delay <= 15 min


@register(
    "flight_otp_ranking",
    headline=True,  # bench seat (r9, VERDICT r8 stretch #7): second
    # flights-domain seat — keeps the namesake surface honest under load
    # alongside flight_connection_search; pure partial-agg + window
    # ranking over the derived-flights scan, the cheap-scan class.
    oracle=FLIGHTS_CTE
    + f"""
SELECT carrier,
  CAST(COUNT(*) AS BIGINT) AS n_flights,
  CAST(SUM(CASE WHEN arr_delay_minutes <= {OTP_THRESHOLD_MIN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_on_time,
  CAST((SUM(CASE WHEN arr_delay_minutes <= {OTP_THRESHOLD_MIN}
                 THEN 1 ELSE 0 END) * 1000000) // COUNT(*) AS BIGINT)
    AS otp_micro,
  CAST(RANK() OVER (
    ORDER BY (SUM(CASE WHEN arr_delay_minutes <= {OTP_THRESHOLD_MIN}
                       THEN 1 ELSE 0 END) * 1000000) // COUNT(*) DESC,
             carrier) AS INT) AS otp_rank
FROM flights
WHERE {_ORACLE_FILTER}
GROUP BY carrier
ORDER BY otp_rank
""",
    doc="On-time-performance league table over the reference's own "
    "domain (the DOT metric the BTS dataset exists to publish: "
    f"on time = arrival delay <= {OTP_THRESHOLD_MIN} min): per "
    "carrier, completed-2008 flight count, on-time count, the OTP "
    "share in exact integer micro-units (bigint div — no float "
    "enters the RANK), and the resulting rank with carrier tiebreak. "
    "Same scan+filter+partial-agg shape as the flagship; the rank "
    "window is O(carriers).",
)
def flight_otp_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    fl = _completed_2008(flights(spark, sf_dir))
    on_time = F.sum(
        F.when(F.col("arr_delay_minutes") <= OTP_THRESHOLD_MIN, 1).otherwise(0)
    )
    agg = fl.groupBy("carrier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_flights"),
        on_time.cast("bigint").alias("n_on_time"),
    )
    agg = agg.withColumn(
        "otp_micro",
        F.expr("CAST((n_on_time * 1000000) div n_flights AS BIGINT)"),
    )
    return (
        agg.withColumn(
            "otp_rank",
            F.rank()
            .over(W.orderBy(F.desc("otp_micro"), F.asc("carrier")))
            .cast("int"),
        )
        .orderBy("otp_rank")
    )


# ---------------------------------------------------------------------------
# One-stop connection search — the reference repo's namesake "FlightSearch"
# capability, generalized: feasible itineraries A -> via -> B.
# ---------------------------------------------------------------------------

MIN_LAYOVER_MIN = 45
MAX_LAYOVER_MIN = 240


def _pairs_from_legs(legs: DataFrame, band_min: int = 1440) -> DataFrame:
    """Banded range self-join core over a legs DataFrame (origin, dest,
    dep_min, arr_min): every feasible one-stop itinerary pair, banded at
    ``band_min``-minute buckets. Arrivals explode into EVERY bucket their
    layover window [arr+MIN, arr+MAX] touches (sequence(lo, hi) — <= 2
    buckets at the 1440 day band because the window is narrower than a
    day, <= 5 at the 60-min hour band); departures key by their own
    single bucket; pairs meet on (airport, bucket) with the layover
    BETWEEN as a residual. A departure has exactly ONE bucket, so each
    feasible pair meets exactly once — no dedup pass at any band width.

    ``band_min`` is the HUB-SKEW knob (VERDICT r9 #4, turning SCALE.md's
    "narrow to (airport, hour) bands at 100 TB" note into tested code):
    a band's worst task is bounded by the largest (airport, bucket)
    partner group, and a mega-hub's departures spread over ~band_min
    minutes of schedule, so halving the band halves the hot task. The
    price is replication of the ARRIVAL side only (window/band_min + 1
    buckets vs <= 2), the classic banding trade. Cross-regime result
    equality + the per-bucket bound are proven on a mega-hub fixture in
    tests/test_flight_search.py."""
    a = legs.withColumn(
        "bkt",
        F.explode(
            F.sequence(
                F.expr(f"(arr_min + {MIN_LAYOVER_MIN}) div {band_min}"),
                F.expr(f"(arr_min + {MAX_LAYOVER_MIN}) div {band_min}"),
            )
        ),
    )
    b = legs.select(
        F.col("origin").alias("b_origin"),
        F.col("dest").alias("b_dest"),
        F.col("dep_min").alias("b_dep_min"),
        F.col("arr_min").alias("b_arr_min"),
        F.expr(f"dep_min div {band_min}").alias("b_bkt"),
    )
    # shuffle_merge hint: BOTH sides are fact-sized (the exploded arrivals
    # side doubly so), so Catalyst's size estimate otherwise picks a
    # BroadcastHashJoin whose 1.2M-row single-threaded build costs 4x the
    # whole distributed SMJ (measured 3.7s -> 0.86s at sf0.1) — and at
    # 100 TB a broadcast of either side is impossible anyway. SMJ on the
    # (airport, bucket) band key is the honest plan at every scale.
    return a.join(
        b.hint("shuffle_merge"),
        (F.col("dest") == F.col("b_origin"))
        & (F.col("bkt") == F.col("b_bkt"))
        & (F.col("b_dep_min") >= F.col("arr_min") + MIN_LAYOVER_MIN)
        & (F.col("b_dep_min") <= F.col("arr_min") + MAX_LAYOVER_MIN)
        & (F.col("b_dest") != F.col("origin")),
    )


def _connection_pairs(
    spark: SparkSession, sf_dir: str, band_min: int = 1440
) -> DataFrame:
    """All feasible one-stop itinerary pairs via the banded SMJ — the
    shared core of flight_connection_search (day band), its hour-band
    twin and flight_missed_connections. Columns: first-leg origin/dest/
    dep_min/arr_min plus second-leg b_origin/b_dest/b_dep_min/b_arr_min."""
    from ..sources.flights import flights_extended

    legs = (
        flights_extended(spark, sf_dir)
        .filter((F.col("cancelled") == 0.0) & (F.col("diverted") == 0.0))
        .drop("cancelled", "diverted")
    )
    return _pairs_from_legs(legs, band_min)


@register(
    "flight_connection_search",
    headline=True,  # bench seat: the namesake banded range-self-join
    oracle=f"""
WITH flights_ext AS (
  SELECT
    (['ATL','BOS','CLT','DEN','DFW','DTW','EWR','IAH','JFK','LAS',
      'LAX','MCO','MIA','MSP','ORD','PHL','PHX','SEA','SFO','SLC'])
      [CAST(l_suppkey % 20 AS INT) + 1] AS origin,
    (['ATL','BOS','CLT','DEN','DFW','DTW','EWR','IAH','JFK','LAS',
      'LAX','MCO','MIA','MSP','ORD','PHL','PHX','SEA','SFO','SLC'])
      [CAST((l_suppkey + 1 + l_partkey % 19) % 20 AS INT) + 1] AS dest,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440 AS BIGINT)
      AS dep_min,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440
         + 60 + (l_partkey * 3 % 7) * 30 AS BIGINT) AS arr_min
  FROM lineitem
  WHERE l_orderkey % 50 <> 0 AND l_orderkey % 97 <> 3
),
a AS (
  SELECT f.*, unnest(list_distinct(
    [(arr_min + {MIN_LAYOVER_MIN}) // 1440,
     (arr_min + {MAX_LAYOVER_MIN}) // 1440])) AS day
  FROM flights_ext f
),
pairs AS (
  SELECT a.origin, a.dest AS via, b.dest AS final_dest,
         b.dep_min - a.arr_min AS layover_min,
         b.arr_min - a.dep_min AS total_min
  FROM a JOIN flights_ext b
    ON a.dest = b.origin
   AND b.dep_min // 1440 = a.day
   AND b.dep_min BETWEEN a.arr_min + {MIN_LAYOVER_MIN}
                     AND a.arr_min + {MAX_LAYOVER_MIN}
   AND b.dest <> a.origin
)
SELECT origin, via, final_dest,
  CAST(COUNT(*) AS BIGINT) AS n_itineraries,
  CAST(MIN(layover_min) AS BIGINT) AS min_layover_min,
  CAST(MIN(total_min) AS BIGINT) AS min_total_min
FROM pairs GROUP BY origin, via, final_dest
""",
    doc="One-stop connection search — the reference repo's namesake "
    "capability (HBase-Hadoop-FlightSearch), generalized from its "
    "single delay report: all feasible A->via->B itineraries where the "
    f"second leg departs {MIN_LAYOVER_MIN}-{MAX_LAYOVER_MIN} minutes "
    "after the first arrives, both legs completed, no round trips. "
    "The time window makes a naive self-join a theta join "
    "(BroadcastNestedLoopJoin death at scale); Spark instead plans a "
    "DAY-BANDED equi join: each arriving leg explodes into the <=2 day "
    "buckets its layover window can touch, departures key by their own "
    "day, pairs meet on (airport, day) and the BETWEEN is a residual — "
    "each pair meets exactly once (a departure has one day bucket), so "
    "no dedup pass. Shuffle partners are bounded per (airport, day); "
    "hub-airport skew is the knob — the (airport, hour) regime is "
    "IMPLEMENTED and value-oracled as flight_connection_search_hourband "
    "(band_min=60), with cross-regime equality and per-bucket bounds "
    "proven on a mega-hub fixture. Aggregated to per-route itinerary counts + min layover/"
    "total travel, all exact integer minutes.",
)
def flight_connection_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _connection_pairs(spark, sf_dir)
    return pairs.groupBy(
        "origin",
        F.col("dest").alias("via"),
        F.col("b_dest").alias("final_dest"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_itineraries"),
        F.min(F.col("b_dep_min") - F.col("arr_min"))
        .cast("bigint")
        .alias("min_layover_min"),
        F.min(F.col("b_arr_min") - F.col("dep_min"))
        .cast("bigint")
        .alias("min_total_min"),
    )


@register(
    "flight_connection_search_hourband",
    headline=True,  # bench seat (r12, VERDICT r11 #5): the hub-skew
    # hour-band regime is what the connection search would run at
    # 100 TB, so it earns its own pin rather than an informational
    # reading. Same coalescing pin as the day-band seat (bench.py
    # PINNED_CONFS) — identical banded-SMJ plan family, same AQE
    # re-plan noise source.
    oracle=f"""
WITH flights_ext AS (
  SELECT
    (['ATL','BOS','CLT','DEN','DFW','DTW','EWR','IAH','JFK','LAS',
      'LAX','MCO','MIA','MSP','ORD','PHL','PHX','SEA','SFO','SLC'])
      [CAST(l_suppkey % 20 AS INT) + 1] AS origin,
    (['ATL','BOS','CLT','DEN','DFW','DTW','EWR','IAH','JFK','LAS',
      'LAX','MCO','MIA','MSP','ORD','PHL','PHX','SEA','SFO','SLC'])
      [CAST((l_suppkey + 1 + l_partkey % 19) % 20 AS INT) + 1] AS dest,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440 AS BIGINT)
      AS dep_min,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440
         + 60 + (l_partkey * 3 % 7) * 30 AS BIGINT) AS arr_min
  FROM lineitem
  WHERE l_orderkey % 50 <> 0 AND l_orderkey % 97 <> 3
),
a AS (
  SELECT f.*, unnest(range((arr_min + {MIN_LAYOVER_MIN}) // 60,
                           (arr_min + {MAX_LAYOVER_MIN}) // 60 + 1)) AS hb
  FROM flights_ext f
),
pairs AS (
  SELECT a.origin, a.dest AS via, b.dest AS final_dest,
         b.dep_min - a.arr_min AS layover_min,
         b.arr_min - a.dep_min AS total_min
  FROM a JOIN flights_ext b
    ON a.dest = b.origin
   AND b.dep_min // 60 = a.hb
   AND b.dep_min BETWEEN a.arr_min + {MIN_LAYOVER_MIN}
                     AND a.arr_min + {MAX_LAYOVER_MIN}
   AND b.dest <> a.origin
)
SELECT origin, via, final_dest,
  CAST(COUNT(*) AS BIGINT) AS n_itineraries,
  CAST(MIN(layover_min) AS BIGINT) AS min_layover_min,
  CAST(MIN(total_min) AS BIGINT) AS min_total_min
FROM pairs GROUP BY origin, via, final_dest
""",
    doc="Hour-banded regime of the namesake one-stop connection search — "
    "the HUB-SKEW fallback the day-banded plan documents for 100 TB "
    "(VERDICT r9 #4), now implemented and value-oracled rather than a "
    "doc note. Identical semantics and output to "
    "flight_connection_search; the only change is the band key: "
    "arrivals explode into every 60-minute bucket their "
    f"[arr+{MIN_LAYOVER_MIN}, arr+{MAX_LAYOVER_MIN}] window touches "
    "(<= 5 buckets vs <= 2 day buckets) and departures key by their "
    "own hour, so a mega-hub's worst shuffle partner group shrinks by "
    "~the band ratio — per-bucket partner counts are proven bounded on "
    "a skewed one-mega-hub fixture (tests/test_flight_search.py), and "
    "both regimes are proven to produce the exact same itinerary set. "
    "The DuckDB oracle replays the hour banding itself (unnest(range) "
    "over hour buckets + single-bucket departures), not just the "
    "aggregate, so the banding algebra is what is value-checked. "
    "Deploy rule: pick band_min so the hottest (airport, bucket) "
    "group fits one task — day bands until a hub's daily departures "
    "outgrow a task, then hour bands, the same knob family as "
    "dedup's max_df and levenshtein's length blocks.",
)
def flight_connection_search_hourband(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    pairs = _connection_pairs(spark, sf_dir, band_min=60)
    return pairs.groupBy(
        "origin",
        F.col("dest").alias("via"),
        F.col("b_dest").alias("final_dest"),
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_itineraries"),
        F.min(F.col("b_dep_min") - F.col("arr_min"))
        .cast("bigint")
        .alias("min_layover_min"),
        F.min(F.col("b_arr_min") - F.col("dep_min"))
        .cast("bigint")
        .alias("min_total_min"),
    )


MIN_CONNECT_MIN = 30  # realized connection floor: less than this after
# the first leg's delay lands and the itinerary is missed

# Deterministic synthetic arrival delay for the extended legs (minutes,
# 0..90): a fixed integer function of the leg's own schedule, so both
# engines derive it identically (the base flights table's delays are
# keyed columns the extended projection deliberately drops).
_LEG_DELAY = "((dep_min * 13 + (arr_min - dep_min)) % 91)"
# a-qualified twin for the oracle's pairs CTE, where both legs are in scope
_LEG_DELAY_A = "((a.dep_min * 13 + (a.arr_min - a.dep_min)) % 91)"


@register(
    "flight_missed_connections",
    oracle=FLIGHTS_EXT_CTE.rstrip()
    + f""",
legs AS (
  SELECT origin, dest, dep_min, arr_min
  FROM flights_ext WHERE cancelled = 0.0 AND diverted = 0.0
),
a AS (
  SELECT legs.*, unnest(list_distinct(
    [(arr_min + {MIN_LAYOVER_MIN}) // 1440,
     (arr_min + {MAX_LAYOVER_MIN}) // 1440])) AS day
  FROM legs
),
pairs AS (
  SELECT a.dest AS via,
         CASE WHEN b.dep_min - (a.arr_min + {_LEG_DELAY_A})
                   < {MIN_CONNECT_MIN}
              THEN 1 ELSE 0 END AS missed
  FROM a JOIN legs b
    ON a.dest = b.origin
   AND b.dep_min // 1440 = a.day
   AND b.dep_min BETWEEN a.arr_min + {MIN_LAYOVER_MIN}
                     AND a.arr_min + {MAX_LAYOVER_MIN}
   AND b.dest <> a.origin
)
SELECT via,
  CAST(COUNT(*) AS BIGINT) AS n_itineraries,
  CAST(SUM(missed) AS BIGINT) AS n_missed,
  CAST((SUM(missed) * 1000000) // COUNT(*) AS BIGINT) AS missed_ppm
FROM pairs GROUP BY via
""",
    doc="Missed-connection audit per hub — composes the namesake "
    "connection search with realized delays: every feasible scheduled "
    f"one-stop itinerary (layover {MIN_LAYOVER_MIN}-{MAX_LAYOVER_MIN} "
    "min, same day-banded SMJ plan as flight_connection_search) is "
    "classified MISSED when the first leg's deterministic synthetic "
    f"arrival delay leaves under {MIN_CONNECT_MIN} min of realized "
    "connect time. Per-via-airport itinerary counts, missed counts and "
    "integer-ppm miss rates — the operational question the reference's "
    "delay report exists to feed. Delay is an exact integer function "
    "of the leg's own schedule, so the oracle replays it verbatim; "
    "the banding depends only on SCHEDULED times, so the join plan "
    "(and its 100 TB posture) is identical to the search seat's.",
)
def flight_missed_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _connection_pairs(spark, sf_dir)
    missed = (
        F.col("b_dep_min")
        - (F.col("arr_min") + F.expr(_LEG_DELAY))
        < MIN_CONNECT_MIN
    ).cast("int")
    return (
        pairs.select(F.col("dest").alias("via"), missed.alias("missed"))
        .groupBy("via")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_itineraries"),
            F.sum("missed").cast("bigint").alias("n_missed"),
            F.expr("CAST((sum(missed) * 1000000) DIV count(1) AS BIGINT)")
            .alias("missed_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Congestion propagation — does an arrival bank at an airport predict the
# next hour's departure bank? The hub-and-spoke scheduling signature,
# quantified as an exact-moment Pearson correlation per airport.


@register(
    "flight_congestion_propagation",
    oracle=FLIGHTS_EXT_CTE + """,
arr AS (
  SELECT dest AS airport, CAST(arr_min // 60 AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS x
  FROM flights_ext GROUP BY 1, 2
),
dep AS (
  SELECT origin AS airport, CAST(dep_min // 60 AS BIGINT) AS hr,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM flights_ext GROUP BY 1, 2
),
paired AS (
  SELECT a.airport, a.x, d.y
  FROM arr a JOIN dep d ON d.airport = a.airport AND d.hr = a.hr + 1
),
m AS (
  SELECT airport,
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
    CAST(SUM(x * x) AS BIGINT) AS sxx,
    CAST(SUM(x * y) AS BIGINT) AS sxy,
    CAST(SUM(y * y) AS BIGINT) AS syy
  FROM paired GROUP BY airport
)
SELECT airport, n AS n_hour_pairs, sx AS arrivals, sy AS departures,
  ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS corr_r6
FROM m
WHERE n >= 24 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
""",
    doc="Congestion propagation per airport (the reference's flight "
    "domain, upgraded from reporting to inference): Pearson correlation "
    "between the hour-h arrival bank at an airport and its hour-h+1 "
    "departure bank, over co-present hour pairs with non-degenerate "
    "variance and >= 24 pairs. Exact BIGINT cross-product moments, one "
    "fixed-shape IEEE finish shared verbatim with the oracle. Plan: two "
    "hour rollups + one equi join on (airport, hour+1) + an O(airports) "
    "aggregate.",
)
def flight_congestion_propagation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..sources.flights import flights_extended

    fx = flights_extended(spark, sf_dir)
    arr = fx.groupBy(
        F.col("dest").alias("airport"),
        F.expr("arr_min div 60").cast("bigint").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    dep = fx.groupBy(
        F.col("origin").alias("airport"),
        F.expr("dep_min div 60").cast("bigint").alias("hr"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    paired = arr.join(
        dep.select(
            "airport", (F.col("hr") - 1).alias("hr"), "y"
        ),
        ["airport", "hr"],
    )
    m = paired.groupBy("airport").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    return m.filter(
        (F.col("n") >= 24)
        & (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") > 0)
        & (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy") > 0)
    ).select(
        "airport",
        F.col("n").alias("n_hour_pairs"),
        F.col("sx").alias("arrivals"),
        F.col("sy").alias("departures"),
        F.expr(
            "ROUND(CAST(n * sxy - sx * sy AS DOUBLE)"
            " / SQRT(CAST(n * sxx - sx * sx AS DOUBLE)"
            " * CAST(n * syy - sy * sy AS DOUBLE)), 6)"
        ).alias("corr_r6"),
    )


# ---------------------------------------------------------------------------
# Empirical-Bayes shrinkage of per-carrier cancellation rates (Efron &
# Morris 1975, the batting-average classic): a method-of-moments Beta
# prior fitted from the carrier-rate distribution pulls small-sample
# carriers toward the league rate — exactly what a ranking by raw rate
# gets wrong.


@register(
    "flight_eb_cancellation_shrinkage",
    oracle=FLIGHTS_CTE + """,
per AS (
  SELECT carrier, CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CAST(cancelled AS BIGINT)) AS BIGINT) AS x
  FROM flights GROUP BY carrier
),
mom AS (
  -- method-of-moments Beta fit on the carrier rate distribution:
  -- mu = mean rate, v = variance of rates; k = mu(1-mu)/v - 1
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n_carriers,
    SUM(CAST(x AS DOUBLE) / n) / COUNT(*) AS mu,
    SUM((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n)) / COUNT(*)
      - (SUM(CAST(x AS DOUBLE) / n) / COUNT(*))
        * (SUM(CAST(x AS DOUBLE) / n) / COUNT(*)) AS v
  FROM per
),
prior AS (
  SELECT mu, v,
    CASE WHEN v > 0 THEN mu * (1.0 - mu) / v - 1.0 ELSE 0.0 END AS k
  FROM mom
)
SELECT p.carrier, p.n, p.x,
  ROUND(CAST(p.x AS DOUBLE) / p.n, 6) AS raw_rate_r6,
  ROUND((pr.k * pr.mu + p.x) / (pr.k + p.n), 6) AS shrunk_rate_r6,
  CAST(p.x AS DOUBLE) / p.n > (pr.k * pr.mu + p.x) / (pr.k + p.n)
    AS shrunk_down
FROM per p, prior pr
""",
    doc="Empirical-Bayes shrinkage (Efron-Morris 1975) of per-carrier "
    "cancellation rates on the reference's own domain: method-of-"
    "moments Beta prior (k = mu(1-mu)/v - 1) fitted from the carrier "
    "rate distribution, posterior mean (k*mu + x)/(k + n) per carrier "
    "— small carriers shrink hard toward the league rate, big ones "
    "barely move (a property the fixture pins). All moments exact "
    "integers until the fixed-shape IEEE finish shared verbatim with "
    "the oracle. One carrier rollup + a broadcast 1-row prior.",
)
def flight_eb_cancellation_shrinkage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    fl = flights(spark, sf_dir)
    per = fl.groupBy("carrier").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("cancelled").cast("bigint")).cast("bigint").alias("x"),
    )
    mom = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_carriers"),
        F.expr("SUM(CAST(x AS DOUBLE) / n) / COUNT(*)").alias("mu"),
        F.expr(
            "SUM((CAST(x AS DOUBLE) / n) * (CAST(x AS DOUBLE) / n))"
            " / COUNT(*)"
            " - (SUM(CAST(x AS DOUBLE) / n) / COUNT(*))"
            " * (SUM(CAST(x AS DOUBLE) / n) / COUNT(*))"
        ).alias("v"),
    )
    prior = mom.select(
        "mu",
        F.expr(
            "CASE WHEN v > 0 THEN mu * (1.0 - mu) / v - 1.0"
            " ELSE 0.0 END"
        ).alias("k"),
    )
    return per.crossJoin(F.broadcast(prior)).select(
        "carrier",
        "n",
        "x",
        F.expr("ROUND(CAST(x AS DOUBLE) / n, 6)").alias("raw_rate_r6"),
        F.expr("ROUND((k * mu + x) / (k + n), 6)").alias(
            "shrunk_rate_r6"
        ),
        F.expr(
            "CAST(x AS DOUBLE) / n > (k * mu + x) / (k + n)"
        ).alias("shrunk_down"),
    )


# Delay-state Markov transitions: the operational "does a bad flight
# predict the next one" question, as an exact per-carrier transition
# matrix. States: 0 = on-time (delay < 15), 1 = late (15-59), 2 = severe
# (>= 60) — the DOT 15-minute convention plus a severe tier.


@register(
    "flight_delay_markov_transition",
    oracle=f"""
WITH legs AS (
  SELECT
    (SELECT list(c) FROM (VALUES ('AA'),('AS'),('B6'),('CO'),('DL'),('EV'),
      ('F9'),('FL'),('HA'),('MQ'),('NW'),('OH'),('OO'),('UA'),('US'),('WN'),
      ('XE'),('YV')) t(c))[CAST(l_suppkey % 18 AS INT) + 1] AS carrier,
    CAST(epoch_us(l_shipdate) // 60000000
         + (l_orderkey * 11 + l_linenumber * 17) % 1440 AS BIGINT)
      AS dep_min,
    CAST((l_orderkey * 7 + l_linenumber * 13) % 120 AS BIGINT) AS delay
  FROM lineitem
  WHERE l_orderkey % 50 <> 0 AND l_orderkey % 97 <> 3
),
st AS (
  SELECT carrier, dep_min,
         CASE WHEN delay < 15 THEN 0 WHEN delay < 60 THEN 1 ELSE 2 END
           AS state,
         delay
  FROM legs
),
seq AS (
  SELECT carrier, state,
         LAG(state) OVER (PARTITION BY carrier
                          ORDER BY dep_min, delay, state) AS prev_state
  FROM st
),
trans AS (
  SELECT carrier, prev_state AS from_state, state AS to_state,
         COUNT(*) AS n
  FROM seq WHERE prev_state IS NOT NULL
  GROUP BY carrier, prev_state, state
),
tot AS (
  SELECT carrier, from_state, SUM(n) AS row_n FROM trans
  GROUP BY carrier, from_state
)
SELECT t.carrier, CAST(t.from_state AS INT) AS from_state,
       CAST(t.to_state AS INT) AS to_state,
       CAST(t.n AS BIGINT) AS n_transitions,
       CAST((t.n * 1000000) // tt.row_n AS BIGINT) AS prob_ppm
FROM trans t JOIN tot tt USING (carrier, from_state)
ORDER BY carrier, from_state, to_state
""",
    doc="Per-carrier delay-state Markov transition matrix — the flights-"
    "domain sequence operator (does a late flight predict the next "
    "one?): completed flights ordered by schedule within carrier, "
    "states on-time/late/severe by the DOT 15-minute convention, LAG "
    "for consecutive pairs, exact transition counts and integer-ppm "
    "row-conditional probabilities. The window ORDER BY includes the "
    "delay and state tiebreaks so ties are only among interchangeable "
    "rows (identical ordering columns imply identical lagged state — "
    "partition-order independent, like every window query here). Spark "
    "shape: scan-fused projection -> ONE Exchange(carrier) -> Sort -> "
    "LAG -> partial-agg counts -> broadcast row-total re-join. At "
    "100 TB the shuffle carries (carrier, dep_min, state) triples and "
    "everything after the LAG is O(carriers x 9) rows.",
)
def flight_delay_markov_transition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from pyspark.sql import Window as W

    from ..sources.catalog import load_table
    from ..sources.flights import CARRIERS

    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_orderkey") % 50 != 0) & (F.col("l_orderkey") % 97 != 3)
    )
    carrier_arr = F.array(*[F.lit(c) for c in CARRIERS])
    dep_min = (
        F.expr("unix_micros(cast(l_shipdate as timestamp)) div 60000000")
        + (F.col("l_orderkey") * 11 + F.col("l_linenumber") * 17) % 1440
    )
    delay = (F.col("l_orderkey") * 7 + F.col("l_linenumber") * 13) % 120
    st = li.select(
        F.element_at(
            carrier_arr, (F.col("l_suppkey") % 18 + 1).cast("int")
        ).alias("carrier"),
        dep_min.cast("bigint").alias("dep_min"),
        F.when(delay < 15, 0).when(delay < 60, 1).otherwise(2).alias("state"),
        delay.cast("bigint").alias("delay"),
    )
    w = W.partitionBy("carrier").orderBy("dep_min", "delay", "state")
    seq = st.withColumn("prev_state", F.lag("state").over(w)).filter(
        F.col("prev_state").isNotNull()
    )
    trans = seq.groupBy(
        "carrier",
        F.col("prev_state").alias("from_state"),
        F.col("state").alias("to_state"),
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = trans.groupBy("carrier", "from_state").agg(
        F.sum("n").alias("row_n")
    )
    return (
        trans.join(F.broadcast(tot), ["carrier", "from_state"])
        .select(
            "carrier",
            F.col("from_state").cast("int").alias("from_state"),
            F.col("to_state").cast("int").alias("to_state"),
            F.col("n").cast("bigint").alias("n_transitions"),
            F.expr("CAST((n * 1000000) DIV row_n AS BIGINT)").alias(
                "prob_ppm"
            ),
        )
        .orderBy("carrier", "from_state", "to_state")
    )
