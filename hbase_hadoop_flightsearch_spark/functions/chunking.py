"""Training-sample construction (SURVEY.md §2b E12/E15 extensions):
sliding-window token chunking and deterministic negative-pair sampling.

Both are pure row-local expression work (higher-order array functions,
md5 arithmetic) — they fuse into the scan under whole-stage codegen, so
at 100 TB they are I/O-bound with zero shuffles before the (optional)
downstream joins. No Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap between consecutive chunks
N_NEGATIVES = 4


@register(
    "text_chunk_sliding",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
n AS (
  SELECT doc_id, toks,
    GREATEST(1, (len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE + 1})
                  // {CHUNK_STRIDE} + 1) AS n_chunks
  FROM t
)
SELECT doc_id, s AS chunk_id,
  array_to_string(
    toks[s * {CHUNK_STRIDE} + 1 : s * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
    ' ') AS chunk_text,
  LEAST({CHUNK_TOKENS}, len(toks) - s * {CHUNK_STRIDE}) AS chunk_tokens
FROM (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS s FROM n)
""",
    doc=f"Sliding-window chunking (E12): {CHUNK_TOKENS}-token windows at "
    f"stride {CHUNK_STRIDE} (overlap {CHUNK_TOKENS - CHUNK_STRIDE}) — the "
    "standard context-window sample builder. Row-local explode, no "
    "shuffle; chunk count derives from token count by integer math.",
)
def text_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, chunk_id, chunk_text, chunk_tokens); the final chunk is
    the tail remainder (shorter than CHUNK_TOKENS when the stride
    overshoots). Chunk math is integer-exact in both engines."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.greatest(
        F.lit(1).cast("long"),
        F.floor(
            (F.size(toks) - (CHUNK_TOKENS - CHUNK_STRIDE + 1))
            / F.lit(CHUNK_STRIDE)
        )
        + 1,
    )
    with_toks = docs.select(
        "doc_id", toks.alias("toks"), n_chunks.alias("n_chunks")
    )
    exploded = with_toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("s"),
    )
    start = F.col("s") * CHUNK_STRIDE
    return exploded.select(
        "doc_id",
        F.col("s").alias("chunk_id"),
        F.concat_ws(
            " ", F.slice("toks", start + 1, CHUNK_TOKENS)
        ).alias("chunk_text"),
        F.least(
            F.lit(CHUNK_TOKENS), F.size("toks") - start
        ).cast("long").alias("chunk_tokens"),
    )


def _md5_mod(parts: list[Column], mod: Column) -> Column:
    """Deterministic cross-engine pseudo-random int in [0, mod): first 8
    md5 hex chars as an integer (the repo's standard hash primitive)."""
    h = F.md5(F.concat_ws("-", *parts))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % mod


@register(
    "sample_negative_pairs",
    oracle=f"""
WITH n AS (SELECT COUNT(*) AS n_docs FROM documents),
cand AS (
  SELECT d.doc_id, j,
    ('0x' || substr(md5(d.doc_id::VARCHAR || '-' || j::VARCHAR), 1, 8))
      ::BIGINT % n.n_docs AS neg_id
  FROM documents d, n, range(0, {N_NEGATIVES}) AS u(j)
)
SELECT c.doc_id, c.j, c.neg_id, nd.lang AS neg_lang
FROM cand c JOIN documents nd ON nd.doc_id = c.neg_id
WHERE c.neg_id <> c.doc_id
""",
    doc="Deterministic negative sampling (E12): per doc, "
    f"{N_NEGATIVES} pseudo-random partner docs via md5 arithmetic — "
    "reproducible across engines and runs, no RNG state. The join back "
    "to documents is on the (unskewed) uniform hash value.",
)
def sample_negative_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-training negatives: (doc_id, j, neg_id, neg_lang).
    Self-pairs are dropped (hash collisions with own id), so per-doc
    negative counts may be N_NEGATIVES-1 — deterministic either way."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.select(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    base = docs.select("doc_id").crossJoin(F.broadcast(n_docs))
    cand = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(0), F.lit(N_NEGATIVES - 1))
        ).alias("j"),
        "n_docs",
    ).select(
        "doc_id",
        "j",
        _md5_mod(
            [F.col("doc_id").cast("string"), F.col("j").cast("string")],
            F.col("n_docs"),
        ).alias("neg_id"),
    )
    neg_side = docs.select(
        F.col("doc_id").alias("neg_id"), F.col("lang").alias("neg_lang")
    )
    return cand.filter(F.col("neg_id") != F.col("doc_id")).join(
        neg_side, "neg_id"
    ).select("doc_id", "j", "neg_id", "neg_lang")


@register(
    "pipeline_chunk_dedup",
    oracle=f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
),
n AS (
  SELECT doc_id, toks,
    GREATEST(1, (len(toks) - {CHUNK_TOKENS - CHUNK_STRIDE + 1})
                  // {CHUNK_STRIDE} + 1) AS n_chunks
  FROM t
),
chunks AS (
  SELECT doc_id, s AS chunk_id,
    md5(array_to_string(
      toks[s * {CHUNK_STRIDE} + 1 : s * {CHUNK_STRIDE} + {CHUNK_TOKENS}],
      ' ')) AS h
  FROM (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS s FROM n)
),
ranked AS (
  SELECT doc_id, h,
    ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id, chunk_id) AS rn
  FROM chunks
)
SELECT doc_id, COUNT(*) AS n_chunks,
  CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM ranked GROUP BY doc_id
""",
    doc="Chunk-level exact dedup (LLM-pipeline composition, E10+E12): "
    "chunk every document, then keep only the FIRST occurrence of each "
    "distinct chunk corpus-wide (deterministic winner: lowest "
    "(doc_id, chunk_id)) — the paragraph/boilerplate dedup pass corpus "
    "pipelines run between document-level dedup and packing. Output is "
    "per-doc (total chunks, surviving chunks).",
)
def pipeline_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup key is md5(chunk_text), projected BEFORE the shuffle so
    the exchange carries 32-byte hashes, never chunk text — at 100 TB
    that is ~10x less shuffle volume for 32-token chunks. One exchange
    on the hash (first-occurrence window), one on doc_id (stats)."""
    from pyspark.sql import Window

    chunks = text_chunk_sliding(spark, sf_dir).select(
        "doc_id", "chunk_id", F.md5(F.col("chunk_text")).alias("h")
    )
    w = Window.partitionBy("h").orderBy("doc_id", "chunk_id")
    ranked = chunks.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum((F.col("rn") == 1).cast("bigint")).alias("n_kept"),
    )
