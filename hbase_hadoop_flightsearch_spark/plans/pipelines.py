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
from ..operators.dedup import _JACCARD_PAIRS_DUCK
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


# -- near-dup variant: the production-grade pipeline ---------------------
# Exact-hash dedup only removes byte-identical copies; real corpus prep
# clusters NEAR-duplicates (jaccard >= 0.5 here) and keeps one canonical
# doc per cluster. The clustering step is the iterative connected-
# components operator — so this composite cannot be one SQL statement,
# but its ORACLE can: DuckDB closes the pair graph with a recursive CTE.
_NEARDUP_ORACLE = f"""
WITH RECURSIVE scored AS (
  SELECT doc_id, text,
    length(text) - length(replace(text, ' ', '')) + 1 AS n_tokens,
    {{lang_pred}} AS lang_pred,
    len(regexp_extract_all(text, '{{bpe}}')) AS bpe_tokens
  FROM documents
),
kept AS (
  SELECT * FROM scored
  WHERE n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
),
jp AS ({{jaccard_pairs}}),
kp AS (
  SELECT d1, d2 FROM jp
  WHERE d1 IN (SELECT doc_id FROM kept)
    AND d2 IN (SELECT doc_id FROM kept)
),
edges AS (
  SELECT d1 AS src, d2 AS dst FROM kp
  UNION ALL SELECT d2, d1 FROM kp
),
reach(src, dst) AS (
  SELECT doc_id, doc_id FROM kept
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
),
comp AS (
  SELECT src AS doc_id, MIN(dst) AS component_id FROM reach GROUP BY src
),
members AS (
  SELECT component_id, COUNT(*) AS n_members FROM comp GROUP BY component_id
)
SELECT k.lang_pred,
  COUNT(*) AS n_clusters,
  CAST(SUM(m.n_members - 1) AS BIGINT) AS n_docs_removed,
  CAST(SUM(k.bpe_tokens) AS BIGINT) AS total_bpe_tokens
FROM comp c
JOIN members m ON c.component_id = m.component_id
JOIN kept k ON k.doc_id = c.doc_id
WHERE c.doc_id = c.component_id
GROUP BY k.lang_pred
"""


@register(
    "pipeline_corpus_prep_neardup",
    oracle=_NEARDUP_ORACLE.format(
        lang_pred=ngram_lang_pred_duck("text"),
        bpe=_BPE_SQL,
        jaccard_pairs=_JACCARD_PAIRS_DUCK,
    ),
    doc="Production corpus-prep composite: quality filter -> lang-ID -> "
    "NEAR-dup clustering (ngram-jaccard pairs + connected components) -> "
    "one keeper per cluster -> per-language token budget. The iterative "
    "clustering step runs the distributed CC loop; the oracle closes the "
    "same graph with a recursive CTE.",
)
def pipeline_corpus_prep_neardup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pairs are mined once on the full corpus (the posting-list plan) and
    semi-joined down to quality-surviving docs — jaccard between two docs
    does not depend on the rest of the corpus, so filtering pairs equals
    mining pairs on the filtered subset. Keeper stats aggregate in one
    final shuffle on (lang_pred)."""
    from ..operators.dedup import dedup_ngram_jaccard
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    text = F.col("text")
    n_tokens = (
        F.length(text) - F.length(F.regexp_replace(text, " ", "")) + 1
    )
    kept = (
        docs.select(
            "doc_id",
            "text",
            ngram_lang_pred(text).alias("lang_pred"),
            F.regexp_count(text, F.lit(BPE_ISH_PATTERN))
            .cast("int")
            .alias("bpe_tokens"),
        )
        .filter(n_tokens.between(MIN_TOKENS, MAX_TOKENS))
        .localCheckpoint()  # reused by pairs-filter, vertices, and rollup
    )
    ids = kept.select("doc_id")
    pairs = (
        dedup_ngram_jaccard(spark, sf_dir)
        .join(ids.withColumnRenamed("doc_id", "d1"), "d1", "left_semi")
        .join(ids.withColumnRenamed("doc_id", "d2"), "d2", "left_semi")
        .select("d1", "d2")
    )
    labels = connected_components(ids, pairs)
    members = labels.groupBy("component_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    keepers = (
        labels.filter(F.col("doc_id") == F.col("component_id"))
        .join(members, "component_id")
        .join(kept, "doc_id")
    )
    return keepers.groupBy("lang_pred").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        F.sum(F.col("n_members") - 1).cast("long").alias("n_docs_removed"),
        F.sum("bpe_tokens").cast("long").alias("total_bpe_tokens"),
    )
