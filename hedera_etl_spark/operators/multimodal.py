"""Multimodal column operators: opaque binary payloads + typed metadata.

Design (SURVEY-adjacent LLM-pipeline surface): image/audio/video content
travels as an opaque ``binary`` column with typed metadata columns beside
it.  All Spark-side plumbing — schema, partitioning, Arrow batch shape,
mapInPandas signatures — is real and tested; the actual media decode is
STUBBED behind ``real_decode=True`` (raises NotImplementedError: no
PIL/opencv/ffmpeg in this container) with a deterministic md5-derived fake
as the default so results stay oracle-checkable.

Scale notes:
- payloads stay columnar end to end; mapInPandas moves them executor-side
  in Arrow record batches (zero driver involvement, no collect);
- metadata extraction that needs no decode (byte length, content hash,
  magic-prefix) is pure JVM built-ins — no Python at all;
- frame/chunk sampling is an explode over a computed index sequence, so a
  100 TB video table fans out executor-side with ordinary partitioning.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.LongType()),
        T.StructField("height", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

#: format table for the deterministic fake decode
_FORMATS = ("png", "jpeg", "webp")


def with_payload(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Attach an opaque binary payload column (UTF-8 bytes of the text —
    the container has no real media, so text bytes stand in as content)."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    )


def payload_stats(docs_with_payload: DataFrame) -> DataFrame:
    """Decode-free binary metadata: byte length, content md5, hex prefix.

    Pure JVM built-ins over the binary column — the fast path for routing /
    dedup / magic-byte sniffing before any Python decode runs.
    """
    return docs_with_payload.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.md5("payload").alias("content_md5"),
        F.hex(F.encode(F.substring("text", 1, 8), "UTF-8")).alias("prefix_hex"),
    )


def decode_image_metadata(
    docs_with_payload: DataFrame, real_decode: bool = False
) -> DataFrame:
    """Image decode -> metadata via Arrow-batched mapInPandas.

    ``real_decode=True`` is the production path (PIL/opencv) — stubbed here
    with NotImplementedError since the libs aren't in this container.  The
    default fake derives (format, width, height) deterministically from the
    payload's md5, so the full mapInPandas plumbing (batch iteration, typed
    output schema, Arrow transfer) runs for real and the result is
    oracle-checkable.
    """

    def gen(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/opencv (not in this container); "
                    "run with real_decode=False for the deterministic stub"
                )
            digests = pdf["payload"].map(lambda b: hashlib.md5(bytes(b)).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": digests.map(lambda h: _FORMATS[int(h[4], 16) % 3]),
                    "width": digests.map(lambda h: 16 + int(h[0:2], 16)).astype("int64"),
                    "height": digests.map(lambda h: 16 + int(h[2:4], 16)).astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        gen, schema=IMAGE_META_SCHEMA
    )


def sample_frames(
    docs: DataFrame, ms_per_char: int = 40, frame_interval_ms: int = 1000
) -> DataFrame:
    """Frame sampling for video-shaped rows: one output row per sampled
    frame timestamp.  Duration here is faked as n_chars * ms_per_char (no
    real media); the fan-out itself — explode over a computed index
    sequence — is exactly the production plan shape.
    """
    dur = F.expr(f"(n_chars * {ms_per_char}) div {frame_interval_ms}")
    return (
        docs.select("doc_id", dur.alias("n_frames"))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_frames"))).alias("frame_idx"),
        )
        .select(
            "doc_id",
            "frame_idx",
            (F.col("frame_idx") * frame_interval_ms).alias("frame_ts_ms"),
        )
    )
