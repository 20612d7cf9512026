"""Skew-hardened aggregation (SCALE.md): explicit two-stage salted groupBy.

AQE's skew handling covers joins and partition coalescing, but a groupBy
whose key distribution is pathological (one mega-key) still funnels that
key's partial aggregates into one reducer. For algebraic aggregates the
classic fix is salting: group on (key, salt) first — the hot key's rows
spread across `n_salts` tasks — then merge the per-salt partials in a
second, tiny groupBy. Result is bit-identical to the direct aggregate
(sum/count are associative+commutative), which the DuckDB oracle verifies.

Here the skewed domain is the token stream of `documents` (natural-language
token frequencies are Zipfian: the hottest token's posting dwarfs the
median — exactly the 100 TB failure shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

N_SALTS = 16


@register(
    "skew_salted_token_stats",
    oracle="""
SELECT token,
  COUNT(*) AS freq,
  CAST(SUM(CAST(length(token) AS BIGINT)) AS BIGINT) AS total_chars
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
GROUP BY token
""",
    doc="Salted two-stage aggregation over a Zipfian key (the skew "
    "pattern): groupBy(token, salt) spreads hot keys across tasks, then a "
    "tiny merge groupBy(token) — bit-identical to the direct aggregate.",
)
def skew_salted_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tokens = docs.select(F.explode(F.split("text", " ")).alias("token"))
    salted = tokens.withColumn(
        # Deterministic salt from a second hash seed, NOT random: keeps the
        # operator reproducible and re-runnable (speculative tasks, stage
        # retries) without double counting.
        "salt",
        F.pmod(F.xxhash64("token", F.monotonically_increasing_id()), N_SALTS),
    )
    partial = salted.groupBy("token", "salt").agg(
        F.count(F.lit(1)).alias("freq_p"),
        F.sum(F.length("token").cast("long")).alias("chars_p"),
    )
    return partial.groupBy("token").agg(
        F.sum("freq_p").alias("freq"),
        F.sum("chars_p").alias("total_chars"),
    )


@register(
    "diag_key_skew",
    oracle="""
WITH per_key AS (
  SELECT o_custkey AS key, COUNT(*) AS cnt FROM orders GROUP BY o_custkey
),
stats AS (
  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
    MAX(cnt) AS max_cnt
  FROM per_key
),
top AS (
  SELECT key, cnt, ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
  FROM per_key
)
SELECT t.rk, t.key, t.cnt,
  s.n_keys, s.n_rows,
  ROUND(CAST(s.max_cnt AS DOUBLE) * s.n_keys / s.n_rows, 4)
    AS skew_factor
FROM top t, stats s
WHERE t.rk <= 10
""",
    doc="Key-skew diagnosis (ops): per-key count profile of the join/agg "
    "key — top-10 hottest keys plus max/avg skew factor. The thing you "
    "run BEFORE choosing salting vs AQE skew-join on a 100 TB shuffle; "
    "cost is one partial-agg groupBy + an O(keys) top-k.",
)
def diag_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 hottest o_custkey values with global skew stats attached
    (skew_factor = max_cnt / mean_cnt; 1.0 = perfectly uniform)."""
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    # TakeOrdered top-10 over the per-key counts (key-cardinality-sized
    # at 100 TB) — the unpartitioned rank-filter idiom would single-task
    # sort it (no WindowGroupLimit for empty partitionSpec; r15 audit).
    from .ranks import global_topk

    top = global_topk(
        per_key, [F.desc("cnt"), F.asc("key")], 10, out="rk"
    )
    return top.crossJoin(F.broadcast(stats)).select(
        "rk",
        "key",
        "cnt",
        "n_keys",
        "n_rows",
        F.round(
            F.col("max_cnt").cast("double")
            * F.col("n_keys")
            / F.col("n_rows"),
            4,
        ).alias("skew_factor"),
    )


JOIN_SALTS = 8  # replication factor for hot build-side keys


@register(
    "skew_salted_join_events",
    oracle="""
SELECT e.user_id,
  c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY e.user_id, c.c_mktsegment
""",
    doc="Salted equi-join (the OTHER skew pattern, complementing the "
    "salted aggregation): the probe side appends a deterministic salt to "
    "its key, the build side is replicated once per salt value, and the "
    "join runs on (key, salt) so one hot user's rows spread across "
    f"{8} tasks instead of one. Result is bit-identical to the plain "
    "join (proven by the unsalted oracle). At 100 TB this is the manual "
    "fallback when AQE's skew split cannot apply (e.g. bucketed inputs "
    "or non-shuffle joins); replication cost is build_rows x salts, "
    "which is why it pairs with a SMALL or pre-filtered build side.",
)
def skew_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select("user_id")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    # Probe side: deterministic per-row salt (hash of a row-unique id —
    # never rand(), which breaks on stage retry/speculation).
    probe = events.withColumn(
        "salt",
        F.pmod(
            F.xxhash64("user_id", F.monotonically_increasing_id()),
            JOIN_SALTS,
        ).cast("int"),
    )
    # Build side: replicate each row across all salt values.
    build = cust.withColumn(
        "salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(JOIN_SALTS - 1)).cast("array<int>")
        ),
    )
    return (
        probe.join(
            build,
            (probe.user_id == build.c_custkey)
            & (probe.salt == build.salt),
        )
        .groupBy("user_id", "c_mktsegment")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
