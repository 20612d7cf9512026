"""Multimodal columns (SURVEY.md §2b E13).

Pattern: media is an opaque BinaryType column plus a typed metadata struct;
decode / feature-extract run as Arrow-batched pandas functions over
`mapInPandas` (never row-at-a-time Python). The image/audio codecs are NOT
in this container, so the codec step is stubbed (`decode_media` raises
NotImplementedError unless `fake=True`), while everything Spark-side —
schema, binary handling, Arrow batch shape, partitioning — is real and
oracle-verified: the fake "decoder" derives dimensions from byte length
with arithmetic DuckDB reproduces from octet_length.

Scale notes: binary payloads ride the normal columnar path (Parquet binary
+ Arrow), so filters/metadata projections prune without touching bytes.
`mapInPandas` streams batches (spark.sql.execution.arrow.maxRecordsPerBatch)
— memory stays bounded no matter the partition size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, byte_len int, width int, height int"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents rendered as a multimodal table: opaque binary payload +
    typed metadata struct."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.col("n_chars"), F.col("lang"), F.col("source")
        ).alias("meta"),
    )


def decode_media(payload: bytes, media_type: str, fake: bool = False):
    """Codec entry point. Real decoders (PIL/librosa/av) are not available
    in this environment — the deterministic fake derives dimensions from
    the byte length so the distributed plumbing is testable end-to-end."""
    if not fake:
        raise NotImplementedError(
            "media codecs (PIL/librosa/av) are not installed in this "
            "environment; pass fake=True for the deterministic stub"
        )
    n = len(payload)
    return {"byte_len": n, "width": n % 640 + 1, "height": (n * 7) % 480 + 1}


def _extract_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode' pass; one pandas frame per Arrow batch."""
    for pdf in batches:
        decoded = [
            decode_media(p, t, fake=True)
            for p, t in zip(pdf["payload"], pdf["media_type"])
        ]
        out = pd.DataFrame(decoded)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        out.insert(1, "media_type", pdf["media_type"].values)
        yield out


@register(
    "multimodal_extract_metadata",
    oracle="""
SELECT doc_id, 'text/plain' AS media_type,
  CAST(octet_length(encode(text)) AS INT) AS byte_len,
  CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
  CAST((octet_length(encode(text)) * 7) % 480 + 1 AS INT) AS height
FROM documents
""",
    doc="Multimodal decode plumbing (E13): binary payload -> mapInPandas "
    "Arrow batches -> typed metadata. Codec stubbed; plumbing real.",
)
def multimodal_extract_metadata(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    media = media_table(spark, sf_dir).select(
        "doc_id", "payload", "media_type"
    )
    return media.mapInPandas(_extract_batches, schema=MEDIA_SCHEMA)


@register(
    "multimodal_payload_stats",
    oracle="""
SELECT lang,
  COUNT(*) AS n_media,
  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
  CAST(MAX(octet_length(encode(text))) AS INT) AS max_bytes
FROM documents
GROUP BY lang
""",
    doc="Binary-column metadata aggregation (E13): stats without ever "
    "decoding payload bytes.",
)
def multimodal_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir)
    return media.groupBy(F.col("meta.lang").alias("lang")).agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("int").alias("max_bytes"),
    )


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, thumb_w int, thumb_h int, "
    "thumb_bytes int"
)
THUMB_MAX = 128  # longest thumbnail edge


def resize_media(payload: bytes, fake: bool = False):
    """Resize codec entry point — stubbed like decode_media. The fake
    derives source dims from byte length (same law as decode_media) and
    scales the longest edge down to THUMB_MAX preserving aspect ratio with
    integer truncation; 'thumbnail' size is w*h*3 (RGB)."""
    if not fake:
        raise NotImplementedError(
            "image codecs are not installed; pass fake=True for the stub"
        )
    n = len(payload)
    w, h = n % 640 + 1, (n * 7) % 480 + 1
    longest = max(w, h)
    scale_num = min(longest, THUMB_MAX)
    tw = max(1, (w * scale_num) // longest)
    th = max(1, (h * scale_num) // longest)
    return {
        "width": w, "height": h,
        "thumb_w": tw, "thumb_h": th, "thumb_bytes": tw * th * 3,
    }


def _resize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = pd.DataFrame([resize_media(p, fake=True) for p in pdf["payload"]])
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


@register(
    "multimodal_resize",
    oracle=f"""
WITH m AS (
  SELECT doc_id,
    octet_length(encode(text)) % 640 + 1 AS w,
    (octet_length(encode(text)) * 7) % 480 + 1 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
  CAST(GREATEST(1, w * LEAST(GREATEST(w, h), {THUMB_MAX}) // GREATEST(w, h))
    AS INT) AS thumb_w,
  CAST(GREATEST(1, h * LEAST(GREATEST(w, h), {THUMB_MAX}) // GREATEST(w, h))
    AS INT) AS thumb_h,
  CAST(GREATEST(1, w * LEAST(GREATEST(w, h), {THUMB_MAX}) // GREATEST(w, h))
     * GREATEST(1, h * LEAST(GREATEST(w, h), {THUMB_MAX}) // GREATEST(w, h))
     * 3 AS INT) AS thumb_bytes
FROM m
""",
    doc="Multimodal resize plumbing (E13): aspect-preserving thumbnail "
    "dims via Arrow-batched mapInPandas. Codec stubbed; batch shape, "
    "schema and arithmetic real and oracle-checked.",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInPandas(_resize_batches, schema=RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"
FRAME_BYTES = 64  # fake fixed-size frame
FRAME_STRIDE = 4  # sample every 4th frame


def _frame_sample_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """One-to-many expansion: each 'video' payload yields a row per sampled
    frame. The imperative emission loop is the part explode can't express
    when the real codec (e.g. av keyframe iteration) drives it."""
    for pdf in batches:
        ids, idxs, offs = [], [], []
        for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(p) // FRAME_BYTES
            for i in range(0, n_frames, FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                offs.append(i * FRAME_BYTES)
        yield pd.DataFrame(
            {"doc_id": ids, "frame_idx": idxs, "frame_offset": offs}
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
WITH m AS (
  SELECT doc_id, octet_length(encode(text)) // {FRAME_BYTES} AS n_frames
  FROM documents
)
SELECT doc_id, CAST(i AS INT) AS frame_idx,
  CAST(i * {FRAME_BYTES} AS INT) AS frame_offset
FROM m, LATERAL (
  SELECT unnest(generate_series(0, n_frames - 1, {FRAME_STRIDE})) AS i
)
WHERE n_frames > 0
""",
    doc="Multimodal frame sampling (E13): every 4th fixed-size frame per "
    "payload via one-to-many mapInPandas. Codec stubbed; plumbing real.",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = media_table(spark, sf_dir).select("doc_id", "payload")
    return media.mapInPandas(_frame_sample_batches, schema=FRAME_SCHEMA)
