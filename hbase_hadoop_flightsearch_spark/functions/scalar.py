"""Scalar function surface (SURVEY.md §2b E9): string / date / math / JSON.

The reference's entire scalar repertoire is four casts and a string concat
(HCompute/Main.java:110,119,138-139,151-161). Everything here is built-in
`pyspark.sql.functions` — JVM-side, codegen'd, no Python in the hot path.
Functions chosen to have bit-identical semantics in DuckDB so the whole
surface is oracle-checkable (e.g. sqrt is IEEE-exact in both; ln/exp are
libm-dependent and deliberately avoided in oracle outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table


@register(
    "scalar_events_enriched",
    oracle="""
SELECT event_id,
  upper(event_type) AS type_upper,
  substr(event_type, 1, 3) AS type_prefix,
  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k,
  epoch_us(ts) AS ts_us,
  CAST(year(ts) AS INT) AS y,
  CAST(month(ts) AS INT) AS m,
  CAST(day(ts) AS INT) AS d,
  CAST(hour(ts) AS INT) AS h,
  ROUND(sqrt(value), 6) AS value_sqrt,
  ROUND(value * value, 4) AS value_sq,
  CAST(FLOOR(value) AS BIGINT) % 7 AS value_mod7,
  'user_' || CAST(user_id AS VARCHAR) AS user_label
FROM events
""",
    doc="Row-level enrichment: JSON extraction, date parts, math, strings.",
)
def scalar_events_enriched(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.upper("event_type").alias("type_upper"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.unix_micros("ts").alias("ts_us"),
        F.year("ts").alias("y"),
        F.month("ts").alias("m"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.round(F.sqrt("value"), 6).alias("value_sqrt"),
        F.round(F.col("value") * F.col("value"), 4).alias("value_sq"),
        # FLOOR, not a bare cast: DuckDB's double->bigint CAST rounds while
        # Spark's truncates; floor is unambiguous for the positive domain.
        (F.floor("value") % 7).alias("value_mod7"),
        F.concat(F.lit("user_"), F.col("user_id").cast("string")).alias(
            "user_label"
        ),
    )


@register(
    "scalar_json_value_by_type",
    oracle="""
SELECT event_type,
  ROUND(AVG(CAST(json_extract_string(props, '$.k') AS INT)), 4) AS avg_k,
  CAST(MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k,
  COUNT(*) AS n
FROM events
GROUP BY event_type
""",
    doc="JSON path extraction feeding an aggregate (E9 + E4).",
)
def scalar_json_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.groupBy("event_type").agg(
        F.round(F.avg(k), 4).alias("avg_k"),
        F.max(k).cast("int").alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "scalar_string_surgery",
    oracle="""
SELECT c_custkey,
  CAST(length(c_name) AS INT) AS name_len,
  replace(c_name, 'Customer#', 'C-') AS short_name,
  CAST(CAST(substr(c_name, 10) AS BIGINT) AS BIGINT) AS parsed_id,
  lower(c_mktsegment) AS segment_lower,
  CASE WHEN c_acctbal < 0 THEN 'debt'
       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS balance_band
FROM customer
""",
    doc="String functions + CASE banding (E9) on customer.",
)
def scalar_string_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.length("c_name").alias("name_len"),
        F.regexp_replace("c_name", "Customer#", "C-").alias("short_name"),
        F.substring("c_name", 10, 100).cast("bigint").alias("parsed_id"),
        F.lower("c_mktsegment").alias("segment_lower"),
        F.when(F.col("c_acctbal") < 0, "debt")
        .when(F.col("c_acctbal") < 5000, "mid")
        .otherwise("high")
        .alias("balance_band"),
    )


@register(
    "scalar_array_map_ops",
    oracle="""
SELECT p_partkey,
  array_to_string(string_split(p_name, '_'), '|') AS name_parts,
  CAST(length(string_split(p_name, '_')) AS INT) AS n_parts,
  CAST(p_size * 2 AS INT) AS size_doubled,
  CAST(greatest(p_size, 25) AS INT) AS size_floor25
FROM part
""",
    doc="Array construction + element ops (E9): split, size, greatest. "
    "The array is joined back to a string for the cross-engine hash.",
)
def scalar_array_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    parts = F.split("p_name", "_")
    return part.select(
        "p_partkey",
        F.array_join(parts, "|").alias("name_parts"),
        F.size(parts).alias("n_parts"),
        (F.col("p_size") * 2).cast("int").alias("size_doubled"),
        F.greatest(F.col("p_size"), F.lit(25)).cast("int").alias(
            "size_floor25"
        ),
    )


@register(
    "scalar_variant_json",
    oracle="""
SELECT event_id,
  CAST(json_extract_string(props, '$.k') AS INT) AS k,
  CAST(json(props) AS VARCHAR) AS normalized_json
FROM events
""",
    doc="Semi-structured VARIANT surface (E9, Spark 4): parse_json -> "
    "variant_get typed extraction + to_json normalization roundtrip. "
    "Variant stores a parsed binary form, so repeated path access skips "
    "re-parsing the string — the semi-structured scale path.",
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """variant_get(v, path, type) does typed extraction off the binary
    variant encoding; to_json(v) canonicalizes (minified, like DuckDB's
    json()) — which is what makes the roundtrip oracle-able."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        F.to_json(v).alias("normalized_json"),
    )


@register(
    "scalar_try_arithmetic",
    oracle="""
SELECT o_orderkey,
  o_totalprice / NULLIF(CAST(o_custkey % 3 AS DOUBLE), 0) AS safe_div,
  TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS prio_num,
  TRY_CAST(o_orderstatus AS INT) AS bad_cast,
  ([10, 20, 30])[CAST(1 + o_orderkey % 5 AS INT)] AS maybe_elem
FROM orders
""",
    doc="Error-safe scalar surface (E9, Spark 4 ANSI mode): try_divide / "
    "try_cast / try_element_at return NULL where strict ANSI would kill "
    "the job — the difference between one bad cell and a dead 100 TB "
    "pipeline. Oracled via NULLIF/TRY_CAST/1-based-OOB equivalents.",
)
def scalar_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Under ANSI mode (Spark 4 default) plain /0, bad casts, and OOB
    element_at all throw; the try_ family is the production spelling."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice"), (F.col("o_custkey") % 3).cast("double")
        ).alias("safe_div"),
        F.substring("o_orderpriority", 1, 1)
        .try_cast("int")
        .alias("prio_num"),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.try_element_at(
            F.array(F.lit(10), F.lit(20), F.lit(30)),
            (1 + F.col("o_orderkey") % 5).cast("int"),
        ).alias("maybe_elem"),
    )


@register(
    "scalar_null_semantics",
    oracle="""
SELECT st,
  COUNT(*) AS n_rows,
  COUNT(st) AS n_nonnull,
  CAST(SUM(CASE WHEN st IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END)
       AS BIGINT) AS n_null_safe_hits,
  CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
FROM (SELECT NULLIF(o_orderstatus, 'P') AS st, o_totalprice FROM orders)
GROUP BY st
""",
    doc="NULL semantics surface (E9): NULLIF-manufactured nulls through "
    "grouping (nulls form ONE group), COUNT(col) vs COUNT(*), and "
    "null-safe equality (<=> / IS NOT DISTINCT FROM) — the three places "
    "engines classically disagree about NULL.",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The testdata has no physical NULLs, so the query manufactures them
    deterministically (status 'P' -> NULL) and pins the semantics: SQL
    grouping treats all NULLs as equal, COUNT(col) skips them,
    and <=> is the equality that does NOT return NULL on NULL input."""
    orders = load_table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return (
        orders.select(st.alias("st"), "o_totalprice")
        .groupBy("st")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("st").alias("n_nonnull"),
            F.sum(
                F.col("st").eqNullSafe(F.lit(None).cast("string")).cast("int")
            )
            .cast("long")
            .alias("n_null_safe_hits"),
            F.max("o_totalprice").cast("double").alias("max_price"),
        )
    )


@register(
    "scalar_date_surface",
    oracle="""
SELECT o_orderkey,
  CAST(o_orderdate AS DATE) AS order_date,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01')
    AS days_to_1999,
  CAST(o_orderdate + INTERVAL 3 MONTH AS DATE) AS plus_3_months,
  CAST(year(o_orderdate) AS INT) AS yr,
  CAST(quarter(o_orderdate) AS INT) AS qtr,
  CAST(dayofweek(CAST(o_orderdate AS DATE)) AS INT) AS dow
FROM orders
WHERE o_orderkey < 200
""",
    doc="Date/interval function surface (E9): last_day, datediff, "
    "add_months, year/quarter/dayofweek — calendar arithmetic is pure "
    "integer math, engine-exact. (DuckDB dayofweek is 0=Sunday vs "
    "Spark's 1=Sunday dayofweek; the oracle uses DuckDB's dayofweek "
    "which matches Spark's dayofweek-1.)",
)
def scalar_date_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderkey") < 200
    )
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        d.alias("order_date"),
        F.last_day(d).alias("month_end"),
        F.datediff(F.lit("1999-01-01").cast("date"), d).alias(
            "days_to_1999"
        ),
        F.add_months(d, 3).alias("plus_3_months"),
        F.year(d).cast("int").alias("yr"),
        F.quarter(d).cast("int").alias("qtr"),
        (F.dayofweek(d) - 1).cast("int").alias("dow"),
    )


@register(
    "scalar_bitwise_surface",
    oracle="""
SELECT o_orderpriority,
  CAST(bit_and(o_orderkey) AS BIGINT) AS key_bit_and,
  CAST(bit_or(o_orderkey) AS BIGINT) AS key_bit_or,
  CAST(bit_xor(o_orderkey) AS BIGINT) AS key_bit_xor,
  CAST(SUM(o_orderkey & 255) AS BIGINT) AS sum_low_byte,
  CAST(SUM(CASE WHEN (o_orderkey >> 4) & 1 = 1 THEN 1 ELSE 0 END)
       AS BIGINT) AS n_bit4_set
FROM orders GROUP BY o_orderpriority
""",
    doc="Bitwise function surface (E9): the bit_and/bit_or/bit_xor "
    "AGGREGATES (the checksum/flag-fold primitives behind "
    "dq_table_fingerprint and the Bloom build) plus scalar shift/mask "
    "expressions, per group. All integer arithmetic — bit-identical "
    "across engines by construction; partial-aggregated like any "
    "hash agg (bitwise folds are associative+commutative, the property "
    "that makes them shuffle-safe).",
)
def scalar_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return orders.groupBy("o_orderpriority").agg(
        F.bit_and(k).cast("bigint").alias("key_bit_and"),
        F.bit_or(k).cast("bigint").alias("key_bit_or"),
        F.bit_xor(k).cast("bigint").alias("key_bit_xor"),
        F.sum(k.bitwiseAND(F.lit(255))).cast("bigint").alias("sum_low_byte"),
        F.sum(
            F.when(F.shiftright(k, 4).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(0)
        ).cast("bigint").alias("n_bit4_set"),
    )


# ---------------------------------------------------------------------------
# Spark 4 collation surface: case-insensitive semantics as a COLUMN TYPE
# ---------------------------------------------------------------------------


@register(
    "scalar_collation_surface",
    oracle="""
SELECT lower(o_orderpriority) AS priority_ci,
  CAST(COUNT(*) AS BIGINT) AS n,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM orders
   WHERE lower(o_orderpriority) = '1-urgent') AS n_urgent_ci_global
FROM orders
GROUP BY lower(o_orderpriority)
""",
    doc="Spark 4 COLLATION surface (SPARK-46830): UTF8_LCASE collation "
    "makes case-insensitivity a property of the COLUMN TYPE — "
    "grouping, equality, and joins honor it without sprinkling "
    "lower() through every predicate. The query groups a "
    "case-mangled priority column under UTF8_LCASE; the oracle "
    "expresses the same semantics through explicit lower() (DuckDB "
    "collations differ in surface syntax — the semantics are what is "
    "checked; output is canonicalized through lower() on both sides "
    "so the hash compares equal).",
)
def scalar_collation_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    # Deterministically mangle case (odd orderkeys upper, even lower),
    # then let the COLLATED column re-unify the groups.
    mangled = orders.select(
        F.when(
            F.col("o_orderkey") % 2 == 1, F.upper("o_orderpriority")
        )
        .otherwise(F.lower("o_orderpriority"))
        .alias("pri_raw")
    )
    collated = mangled.select(
        F.expr("pri_raw COLLATE UTF8_LCASE").alias("pri_ci")
    )
    urgent_total = F.sum(
        F.when(F.col("pri_ci") == F.lit("1-URGENT"), 1).otherwise(0)
    )  # collated equality: matches any case
    out = collated.groupBy("pri_ci").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    n_urgent = collated.agg(urgent_total.cast("bigint").alias("u"))
    return out.crossJoin(F.broadcast(n_urgent)).select(
        # canonicalize for the cross-engine hash: LCASE collation keeps
        # the first-seen casing (engine-arbitrary), and the collated
        # string TYPE itself must be reset to binary collation or the
        # driver's schema class check sees a non-plain string
        F.expr("collate(lower(pri_ci), 'UTF8_BINARY')").alias(
            "priority_ci"
        ),
        "n",
        F.col("u").alias("n_urgent_ci_global"),
    )
