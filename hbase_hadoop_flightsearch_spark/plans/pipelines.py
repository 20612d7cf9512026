"""Composite training-data prep pipeline (the end-to-end E10+E12 story):

    quality filter -> language ID -> exact dedup (keeper = min doc_id)
    -> per-language token budget

Each stage is an operator that exists standalone in the registry; this
query proves they compose into the pipeline a real corpus build runs, and
that the COMPOSITION is still one Catalyst plan: filters fuse into the
scan, the dedup groupBy is the only wide stage, and the final rollup rides
the same exchange. At 100 TB this is one shuffle over the deduped corpus —
not four chained jobs with materialization between stages (the MapReduce
shape the reference would have needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import (
    BPE_ISH_PATTERN,
    _BPE_SQL,
    ngram_lang_pred,
    ngram_lang_pred_duck,
)
from ..sources.catalog import load_table
from .registry import register

MIN_TOKENS, MAX_TOKENS = 20, 200


@register(
    "pipeline_corpus_prep",
    oracle=f"""
WITH scored AS (
  SELECT doc_id, text,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
    {ngram_lang_pred_duck("text")} AS lang_pred
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
),
deduped AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keeper, ANY_VALUE(lang_pred) AS lang_pred,
    ANY_VALUE(len(regexp_extract_all(text, '{_BPE_SQL}'))) AS bpe_tokens
  FROM kept
  GROUP BY md5(text)
)
SELECT lang_pred,
  COUNT(*) AS n_docs,
  CAST(SUM(bpe_tokens) AS BIGINT) AS total_bpe_tokens,
  CAST(MIN(keeper) AS BIGINT) AS first_keeper
FROM deduped
GROUP BY lang_pred
""",
    doc="Composite corpus-prep pipeline (E10+E12): quality filter + lang-ID "
    "+ exact dedup + per-language token budget, fused into one plan.",
)
def pipeline_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1
    )
    kept = docs.select(
        "doc_id",
        "text",
        ngram_lang_pred(text).alias("lang_pred"),
        F.regexp_count(text, F.lit(BPE_ISH_PATTERN))
        .cast("int")
        .alias("bpe_tokens"),
    ).filter(n_tokens.between(MIN_TOKENS, MAX_TOKENS))
    deduped = kept.groupBy(F.md5(text.cast("binary")).alias("h")).agg(
        F.min("doc_id").alias("keeper"),
        F.first("lang_pred").alias("lang_pred"),
        F.first("bpe_tokens").alias("bpe_tokens"),
    )
    return deduped.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
        F.min("keeper").cast("long").alias("first_keeper"),
    )
