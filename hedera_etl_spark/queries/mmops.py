"""Multimodal-column registry entries (operators/multimodal.py).

The binary payload is the UTF-8 encoding of documents.text (no real media
in the container), which lets the DuckDB oracle reproduce every derived
value: octet_length(encode(text)) for byte math, md5(text) for the
deterministic fake decode (python hashlib.md5 over UTF-8 bytes == SQL
md5 over the VARCHAR).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hedera_etl_spark.operators.multimodal import (
    decode_image_metadata,
    payload_stats,
    sample_frames,
    with_payload,
)
from hedera_etl_spark.queries import query
from hedera_etl_spark.tables import load_table


@query(
    "mm_payload_decode",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           md5(text) AS content_md5,
           hex(encode(substring(text, 1, 8))) AS prefix_hex,
           CASE (('0x' || substring(md5(text), 5, 1))::INT % 3)
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format,
           16 + ('0x' || substring(md5(text), 1, 2))::BIGINT AS width,
           16 + ('0x' || substring(md5(text), 3, 2))::BIGINT AS height
    FROM documents ORDER BY doc_id
    """,
    tags=("mm", "binary", "decode", "pandas-udf"),
)
def mm_payload_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both multimodal metadata paths in one entry, joined on the doc key:
    decode-free binary stats (byte length / content hash / hex prefix —
    pure JVM built-ins that never leave codegen) and the Arrow-batched
    mapInPandas decode path, run for real with the deterministic stub
    decoder (real decode gated behind real_decode=True /
    NotImplementedError — no media libs in this container)."""
    docs = with_payload(load_table(spark, sf_dir, "documents"))
    stats = payload_stats(docs)
    meta = decode_image_metadata(docs).select("doc_id", "format", "width", "height")
    return stats.join(meta, "doc_id").orderBy("doc_id")


@query(
    "mm_frame_sample",
    """
    SELECT doc_id, frame_idx, frame_idx * 1000 AS frame_ts_ms
    FROM (
      SELECT doc_id,
             unnest(generate_series(0, (n_chars * 40) // 1000)) AS frame_idx
      FROM documents
    )
    ORDER BY doc_id, frame_idx
    """,
    tags=("mm", "video", "explode"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling fan-out: explode over a computed per-row index
    sequence (duration faked from n_chars) — the production plan shape for
    per-frame processing of a video table."""
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(docs).orderBy("doc_id", "frame_idx")
