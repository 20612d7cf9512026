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
