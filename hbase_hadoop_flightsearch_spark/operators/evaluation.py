"""Model-evaluation metrics (SURVEY.md §2b ML-eval family): exact ROC
AUC and calibration analysis — the measurement half of any
training-data/model pipeline, next to the baselines in timeseries.py
(`ml_eval_next_event_baseline`) and text.py (`ml_eval_langid_confusion`).

Everything here is EXACT integer arithmetic so the DuckDB oracles are
full value oracles:
  - AUC is computed through its rank-sum identity (AUC = U / (n1*n0),
    the Mann-Whitney connection) with DOUBLED midranks, the same
    integer-exact device as agg_mann_whitney_u — no float ever ranks.
  - Calibration bins are deterministic NTILE deciles with integer
    cross-product rates (ppm), never float division on the compare path.

Scale posture: one global-order window over (score) for AUC (a
range-partitioned sort at cluster scale — same class as
sort_orders_global) and one NTILE window for calibration; every
aggregate is partial-agg friendly. The evaluated "model" is a
deterministic feature (n_chars as a ranking score for lang='en'), so
results are engine- and run-stable; a real model's scores would flow
through the identical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

AUC_PPM = 1_000_000
CALIB_BINS = 10


@register(
    "ml_eval_auc_exact",
    oracle=f"""
WITH m AS (
  SELECT n_chars AS score,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM documents
),
ranked AS (
  SELECT y,
    -- doubled midrank: integer even under ties (cf. agg_mann_whitney_u)
    2 * RANK() OVER (ORDER BY score)
      + COUNT(*) OVER (PARTITION BY score) - 1 AS r2
  FROM m
),
agg AS (
  SELECT CAST(SUM(y) AS BIGINT) AS n_pos,
         CAST(SUM(1 - y) AS BIGINT) AS n_neg,
         CAST(SUM(CASE WHEN y = 1 THEN r2 ELSE 0 END)
              - SUM(y) * (SUM(y) + 1) AS BIGINT) AS u_x2
  FROM ranked
)
SELECT n_pos, n_neg, u_x2,
       CAST(({AUC_PPM} * u_x2) // (2 * n_pos * n_neg) AS BIGINT)
         AS auc_ppm
FROM agg
""",
    doc="Exact tie-aware ROC AUC via the rank-sum identity AUC = "
    "U/(n1*n0) (Mann-Whitney connection): scores ranked once globally "
    "with doubled integer midranks, U in 2x units, AUC floored to ppm "
    "by integer division — no float on the compare path, so the DuckDB "
    "twin is value-exact. Evaluated ranker: n_chars as a score for "
    "lang='en' (a deterministic stand-in with the same plan shape as "
    "any model-score column). One global-order window + one aggregate.",
)
def ml_eval_auc_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        F.col("n_chars").alias("score"),
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
    )
    ranked = m.select(
        "y",
        (
            2 * F.rank().over(Window.orderBy("score"))
            + F.count(F.lit(1)).over(Window.partitionBy("score"))
            - 1
        ).alias("r2"),
    )
    n_pos = F.sum("y")
    n_neg = F.sum(1 - F.col("y"))
    u_x2 = (
        F.sum(F.when(F.col("y") == 1, F.col("r2")).otherwise(0))
        - n_pos * (n_pos + 1)
    )
    agg = ranked.agg(
        n_pos.cast("bigint").alias("n_pos"),
        n_neg.cast("bigint").alias("n_neg"),
        u_x2.cast("bigint").alias("u_x2"),
    )
    # `div` (integral division) — NOT floor(a/b), which routes through a
    # double and loses exactness once the ppm-scaled numerator exceeds
    # 2^53. All quantities are positive, so div == floor == DuckDB //.
    return agg.select(
        "n_pos",
        "n_neg",
        "u_x2",
        F.expr(
            f"CAST(({AUC_PPM} * u_x2) div (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


@register(
    "ml_eval_calibration_bins",
    oracle=f"""
WITH m AS (
  SELECT n_chars,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         NTILE({CALIB_BINS}) OVER (ORDER BY n_chars, doc_id) AS bin
  FROM documents
)
SELECT CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       CAST(({AUC_PPM} * SUM(y)) // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_score_floor
FROM m GROUP BY bin
""",
    doc="Calibration / reliability table: deterministic NTILE deciles "
    "over the score (ties broken by doc_id so both engines cut "
    "identically), per-bin positive rate as an exact integer ppm "
    "cross-product and floored mean score — the reliability-diagram "
    "input with zero float on the compare path. One NTILE window + one "
    "grouped aggregate; at 100 TB the decile cuts would come from "
    "approx_percentile and the same grouped pass.",
)
def ml_eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "n_chars",
        F.when(F.col("lang") == "en", 1).otherwise(0).alias("y"),
        F.ntile(CALIB_BINS)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("bin"),
    )
    agg = m.groupBy(F.col("bin").cast("int").alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
        F.sum("n_chars").cast("bigint").alias("sum_score"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.expr(f"CAST(({AUC_PPM} * n_pos) div n AS BIGINT)").alias(
            "pos_rate_ppm"
        ),
        F.expr("CAST(sum_score div n AS BIGINT)").alias(
            "mean_score_floor"
        ),
    )
