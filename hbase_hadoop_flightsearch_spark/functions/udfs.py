"""Python UDF surface (SURVEY.md §2b E15): pandas UDF (Arrow-vectorized),
row UDF, and UDTF registration.

Engine guidance encoded here: built-ins > pandas UDF > row UDF. The pandas
UDF is the only sanctioned Python hot path (Arrow batches, ~10-100x the
row-at-a-time UDF); the row UDF exists to prove the surface and is
deliberately used on a tiny projection.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf
from pyspark.sql.types import DoubleType, IntegerType, StringType

from ..plans.registry import register
from ..sources.catalog import load_table


@F.pandas_udf(IntegerType())
def pandas_token_count(text: pd.Series) -> pd.Series:
    """Vectorized whitespace token count (Arrow batch in, batch out)."""
    return (text.str.count(" ") + 1).astype("int32")


@F.pandas_udf(StringType())
def pandas_head_tail(text: pd.Series) -> pd.Series:
    """First and last token joined — exercises string vector ops."""
    toks = text.str.split(" ")
    return toks.str[0] + "..." + toks.str[-1]


@register(
    "udf_pandas_text_features",
    oracle="""
SELECT doc_id,
  CAST(length(text) - length(replace(text, ' ', '')) + 1 AS INT)
    AS token_count,
  string_split(text, ' ')[1] || '...' ||
    string_split(text, ' ')[-1] AS head_tail
FROM documents
""",
    doc="pandas UDF surface (E15): Arrow-vectorized feature extraction, "
    "value-parity-checked against pure SQL.",
)
def udf_pandas_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        pandas_token_count(F.col("text")).alias("token_count"),
        pandas_head_tail(F.col("text")).alias("head_tail"),
    )


@register(
    "udf_row_python",
    oracle="""
SELECT lang, upper(lang) || '!' AS shouted, COUNT(*) AS n
FROM documents
GROUP BY lang
""",
    doc="Row-at-a-time Python UDF surface (E15) — the documented slow path, "
    "applied post-aggregation so only O(groups) rows cross into Python.",
)
def udf_row_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    shout = F.udf(lambda s: s.upper() + "!", StringType())
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("lang", shout(F.col("lang")).alias("shouted"), "n")
    )


@register(
    "udf_grouped_map_zscore",
    oracle="""
SELECT doc_id, lang,
  ROUND((n_chars - AVG(n_chars) OVER (PARTITION BY lang))
        / STDDEV_SAMP(n_chars) OVER (PARTITION BY lang), 6) AS len_zscore
FROM documents
""",
    doc="Grouped-map applyInPandas surface (E15): per-language z-score of "
    "document length — whole-group pandas transform, one Arrow exchange "
    "per group, checked against the SQL window twin.",
)
def udf_grouped_map_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The grouped-map shape: the pandas function sees one COMPLETE group
    at a time (unlike scalar pandas UDFs, which see arbitrary batches) —
    the right tool when the transform needs whole-group statistics. State
    per task is one group's rows; at 100 TB the group key must be chosen
    so no single group exceeds executor memory (lang: ~5 groups here, fine;
    for unbounded groups use window functions instead — as the oracle
    itself demonstrates)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "lang": pdf["lang"],
                "len_zscore": ((pdf["n_chars"] - mu) / sd).round(6),
            }
        )

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", "n_chars").groupBy("lang").applyInPandas(
        zscore, schema="doc_id bigint, lang string, len_zscore double"
    )


@udtf(returnType="pos int, token string")
class TokenizeUdtf:
    """Table function: one input row -> one row per token with its
    position. The UDTF shape (one-to-many with per-row Python state) is
    what `explode` can't express when emission logic is imperative."""

    def eval(self, text: str):
        for i, tok in enumerate(text.split(" ")):
            yield i + 1, tok


@register(
    "udtf_tokenize_lateral",
    oracle="""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id, CAST(i AS INT) AS pos, toks[i] AS token
FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i)
WHERE doc_id < 100
""",
    doc="Python UDTF surface (E15): LATERAL table function expanding each "
    "document into (pos, token) rows, value-checked against SQL unnest.",
)
def udtf_tokenize_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.udtf.register("tokenize_udtf", TokenizeUdtf)
    load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < 100
    ).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.pos, t.token "
        "FROM _udtf_docs d, LATERAL tokenize_udtf(d.text) t"
    )


@F.pandas_udf(DoubleType())
def pandas_weighted_mean(v: pd.Series, w: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF): Arrow ships each group's columns as
    Series, Python returns one scalar. The UDAF completes the E15 matrix
    (scalar pandas UDF / row UDF / grouped-map / grouped-agg / UDTF).

    Exact-integer formulation (ADVICE r3): prices quantize to cents via
    floor(v*100 + 0.5) — the identical IEEE ops DuckDB runs, with no
    tie-rule dependence — then sums are exact int64 and the half-up
    cent quotient is pure integer math, so a quotient landing on a
    half-cent boundary can never round differently across engines'
    float summation orders."""
    import numpy as np

    cents = np.floor(v.to_numpy() * 100.0 + 0.5).astype("int64")
    wi = w.to_numpy().astype("int64")
    n, d = int((cents * wi).sum()), int(wi.sum())
    return ((2 * n + d) // (2 * d)) / 100.0


@register(
    "udf_grouped_agg_weighted_mean",
    oracle="""
WITH t AS (
  SELECT o_orderpriority AS priority,
    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
    o_orderkey % 7 + 1 AS w
  FROM orders
)
SELECT priority,
  ((2 * SUM(cents * w) + SUM(w)) // (2 * SUM(w))) / 100.0 AS wmean_price
FROM t GROUP BY priority
""",
    doc="Grouped-agg pandas UDF / UDAF surface (E15): per-priority "
    "weighted mean price via an Arrow-batched aggregate UDF, "
    "value-parity-checked against the pure-SQL weighted mean. Note the "
    "scale caveat encoded in the plan: a grouped-agg UDF cannot partial-"
    "aggregate map-side (each whole group must reach one task), so "
    "built-in sum/count compositions remain the 100 TB default — this "
    "query exists to prove the surface.",
)
def udf_grouped_agg_weighted_mean(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_totalprice").cast("double").alias("price"),
        # deterministic synthetic weight in [1, 7]
        (F.col("o_orderkey") % 7 + 1).cast("double").alias("wt"),
    )
    return orders.groupBy("priority").agg(
        pandas_weighted_mean(F.col("price"), F.col("wt")).alias(
            "wmean_price"
        )
    )


def _arrow_doc_stats(batches):
    """pyarrow-NATIVE batch transform: no pandas materialization at all —
    the Arrow RecordBatch coming off the JVM is processed with
    pyarrow.compute kernels (C++-vectorized) and a new batch goes
    straight back. This is the zero-copy fast path below even pandas
    UDFs: no BlockManager, no object boxing."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        text = batch.column(batch.schema.get_field_index("text"))
        words = pc.split_pattern(text, " ")
        out = pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                pc.cast(pc.utf8_length(text), pa.int64()),
                pc.cast(pc.list_value_length(words), pa.int64()),
                pc.cast(
                    pc.count_substring(text, "the"), pa.int64()
                ),
            ],
            names=["doc_id", "n_chars_utf8", "n_words", "n_the"],
        )
        yield out


@register(
    "udf_map_in_arrow",
    oracle="""
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars_utf8,
  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
  CAST((length(text) - length(replace(text, 'the', ''))) // 3
       AS BIGINT) AS n_the
FROM documents
""",
    doc="mapInArrow (E15's Arrow-native tier, below even pandas UDFs): "
    "the RecordBatch from the JVM is transformed entirely with "
    "pyarrow.compute kernels — utf8_length, split counts, substring "
    "counts — and returned without ever materializing pandas objects. "
    "The right tool when the per-batch work is itself expressible as "
    "Arrow kernels: zero object boxing, zero BlockManager cost, and "
    "the same doc_id+text pruned scan / no shuffle plan shape as the "
    "mapInPandas codecs.",
)
def udf_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        _arrow_doc_stats,
        schema="doc_id bigint, n_chars_utf8 bigint, n_words bigint, "
        "n_the bigint",
    )
