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


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.LongType()),
        T.StructField("out_height", T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("n_bytes_out", T.LongType()),
    ]
)


def resize_images(
    docs_with_payload: DataFrame,
    target: tuple[int, int] = (64, 64),
    real_decode: bool = False,
) -> DataFrame:
    """Image resize via Arrow-batched mapInPandas.

    ``real_decode=True`` is the production branch (PIL
    ``Image.open(...).resize(target)``) — stubbed with NotImplementedError
    in this container.  The default fake emits a deterministic
    pseudo-thumbnail: the first ``w*h // 16`` bytes of md5-keyed content
    (repeatable from payload alone), so the full pipeline — binary in,
    binary out, typed metadata beside it — runs and is assertable.  At
    scale this is the canonical shape for byte-transform stages: Arrow
    batches both ways, no driver involvement, output stays columnar for a
    downstream parquet/lance sink.
    """
    w, h = target

    def gen(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd

        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image resize requires PIL (not in this container); "
                    "run with real_decode=False for the deterministic stub"
                )
            n_out = (w * h) // 16

            def fake_resize(b: bytes) -> bytes:
                seed = hashlib.md5(bytes(b)).digest()
                reps = (n_out // len(seed)) + 1
                return (seed * reps)[:n_out]

            out = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": w,
                    "out_height": h,
                    "resized": out,
                    "n_bytes_out": out.map(len).astype("int64"),
                }
            )

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        gen, schema=RESIZED_SCHEMA
    )


def audio_chunk_features(
    docs_with_payload: DataFrame,
    chunk_bytes: int = 400,
    real_decode: bool = False,
) -> DataFrame:
    """Audio feature extraction: chunk the byte stream, one feature row
    per chunk — JVM-side end to end (no Python), because the fake
    features are byte statistics the engine can compute with built-ins.

    The production branch (``real_decode=True``: ffmpeg decode + real
    frame features via mapInPandas, same plumbing as ``resize_images``)
    raises NotImplementedError in this container.  The chunking explode
    is the load-bearing scale shape: a 100 TB audio table fans out to
    per-chunk rows executor-side with ordinary partitioning, exactly like
    ``sample_frames`` for video.
    """
    if real_decode:
        raise NotImplementedError(
            "real audio decode requires ffmpeg/librosa (not in this container); "
            "run with real_decode=False for the byte-statistics features"
        )
    n_chunks = F.greatest(
        (F.octet_length("payload") + chunk_bytes - 1) / F.lit(chunk_bytes), F.lit(1)
    ).cast("long")
    chunks = docs_with_payload.select(
        "doc_id",
        "payload",
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_idx"),
    ).select(
        "doc_id",
        "chunk_idx",
        F.expr(f"substring(payload, chunk_idx * {chunk_bytes} + 1, {chunk_bytes})").alias(
            "chunk"
        ),
    )
    # features over the chunk's bytes: decode byte values from the hex
    # encoding (hex pairs -> ints), then energy = sum, peak = max — all
    # JVM built-ins, integer-exact on any engine.  sequence(1, 0) DESCENDS
    # in Spark, so an empty chunk (empty payload) must short-circuit to an
    # empty array, giving energy=0 / peak=0 instead of NULL garbage.
    #
    # The hex encoding is PROJECTED once into __hex (the shingles()
    # inlining discipline, textanalysis._repetition_base): referencing
    # F.hex("chunk") straight inside the per-byte transform lambda
    # re-hexes the WHOLE chunk for every byte index — O(chunk_bytes^2)
    # per chunk.  __hex is referenced three times below, so
    # CollapseProject keeps the projection barrier instead of inlining.
    with_hex = chunks.select(
        "doc_id", "chunk_idx", "chunk", F.hex("chunk").alias("__hex")
    )
    byte_vals = F.when(F.length("__hex") > 0, F.transform(
        F.sequence(F.lit(1), (F.length("__hex") / F.lit(2)).cast("int")),
        lambda i: F.conv(F.substring(F.col("__hex"), (i - 1) * 2 + 1, 2), 16, 10).cast(
            "long"
        ),
    )).otherwise(F.array().cast("array<long>"))
    with_bytes = with_hex.select("doc_id", "chunk_idx", "chunk", byte_vals.alias("__b"))
    return with_bytes.select(
        "doc_id",
        "chunk_idx",
        F.octet_length("chunk").cast("long").alias("n_bytes"),
        F.aggregate("__b", F.lit(0).cast("long"), lambda a, x: a + x).alias("energy"),
        F.coalesce(F.array_max("__b"), F.lit(0).cast("long")).alias("peak"),
        F.md5("chunk").alias("chunk_md5"),
    )


# ---------------------------------------------------------------------------
# content-defined chunking (CDC) — chunk-level dedup for binary payloads
# ---------------------------------------------------------------------------

#: Gear table: 256 deterministic 64-bit constants (md5 of the byte value,
#: first 8 bytes big-endian).  Derivation is pure so the operator, the
#: in-test Python reference, and any other engine reproduce it exactly.
def _gear_table():
    import hashlib

    return [
        int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ]


def cdc_chunks(
    docs_with_payload,
    min_size: int = 64,
    avg_bits: int = 8,
    max_size: int = 4096,
    window: int = 48,
):
    """Content-defined chunking of the ``payload`` binary column —
    (doc_id, chunk_idx, offset, n_bytes, chunk_md5) rows.

    Fixed-size chunking breaks EVERY downstream chunk hash when one
    byte is inserted; CDC cuts where a rolling gear hash of the last
    ``window`` bytes masks to zero (expected chunk ~2^avg_bits bytes),
    so edits only disturb the chunk containing them — the property
    backup/dedup systems (LBFS, FastCDC) rely on, applied here to
    binary dataset columns (shifted/re-encoded media payloads dedup at
    the chunk level even when whole-file hashes differ).

    NULL payloads produce zero chunk rows (the null-propagating choice
    of this module's other operators; a crash inside mapInPandas would
    kill the job for one unpopulated row).

    Executor shape: Arrow-batched ``mapInPandas``; per payload the gear
    hash is VECTORIZED in numpy (h_i = sum over the window of
    gear[b_(i-j)] << j, uint64 wraparound — ``window`` shifted
    adds, no per-byte Python), then a short Python walk over the few
    CANDIDATE boundaries enforces min/max chunk sizes (greedy accept at
    >= min_size since the last cut; force a cut at max_size).  Output
    is chunk-metadata-sized, never payload-sized.  Zero shuffles.
    """
    import hashlib
    from typing import Iterator

    import numpy as np
    import pandas as pd

    if not (0 < min_size <= max_size):
        raise ValueError("need 0 < min_size <= max_size")
    gear = np.array(_gear_table(), dtype=np.uint64)
    mask = np.uint64((1 << avg_bits) - 1)

    def boundaries(data: bytes) -> list:
        n = len(data)
        if n == 0:
            return [0]
        b = np.frombuffer(data, dtype=np.uint8)
        h = np.zeros(n, dtype=np.uint64)
        for j in range(min(window, n)):
            h[j:] += gear[b[: n - j]] << np.uint64(j)
        cand = np.nonzero((h & mask) == 0)[0] + 1  # cut AFTER position i
        cuts, last = [], 0
        for c in cand:
            while c - last > max_size:  # force-split oversized gaps
                last += max_size
                cuts.append(last)
            if c - last >= min_size:
                cuts.append(int(c))
                last = int(c)
        while n - last > max_size:
            last += max_size
            cuts.append(last)
        if not cuts or cuts[-1] != n:
            cuts.append(n)
        return cuts

    def gen(batches: Iterator) -> Iterator:
        for pdf in batches:
            out = {"doc_id": [], "chunk_idx": [], "offset": [],
                   "n_bytes": [], "chunk_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                data = bytes(payload)
                start = 0
                for idx, cut in enumerate(boundaries(data)):
                    out["doc_id"].append(doc_id)
                    out["chunk_idx"].append(idx)
                    out["offset"].append(start)
                    out["n_bytes"].append(cut - start)
                    out["chunk_md5"].append(
                        hashlib.md5(data[start:cut]).hexdigest()
                    )
                    start = cut
            yield pd.DataFrame(out)

    return docs_with_payload.select("doc_id", "payload").mapInPandas(
        gen,
        "doc_id long, chunk_idx int, offset long, n_bytes long, chunk_md5 string",
    )


def cdc_dedup_stats(chunks) -> "DataFrame":
    """One-row chunk-level dedup report over ``cdc_chunks`` output:
    total vs distinct chunk bytes and the byte-level dedup ratio — the
    number that says whether chunk-level storage/transfer dedup pays.
    Two hash aggregates (chunk_md5 is the key), both map-side combined."""
    per_chunk = chunks.groupBy("chunk_md5").agg(
        F.count("*").alias("refs"), F.first("n_bytes").alias("n_bytes")
    )
    return per_chunk.agg(
        F.count("*").alias("distinct_chunks"),
        F.sum("refs").alias("total_chunks"),
        F.sum(F.col("refs") * F.col("n_bytes")).alias("total_bytes"),
        F.sum("n_bytes").alias("distinct_bytes"),
        (
            1
            - F.sum("n_bytes").cast("double")
            / F.sum(F.col("refs") * F.col("n_bytes")).cast("double")
        ).alias("dedup_ratio"),
    )


# ---------------------------------------------------------------------------
# perceptual near-dup (dHash): the image-dedup stage
# ---------------------------------------------------------------------------
#: dHash grid geometry: 8 rows x 9 cols of grayscale cells -> 64
#: adjacent-cell comparisons -> a 64-bit fingerprint.
_DHASH_ROWS, _DHASH_COLS = 8, 9


def fake_gray_grid(docs_with_payload: DataFrame) -> DataFrame:
    """(doc_id, payload, gray) — the deterministic stand-in for
    decode+downsample: cell (r, c) is the first md5 byte of
    ``md5(payload):r:c``.  Same contract as the image_meta fake — the
    REAL path (PIL decode, grayscale, 9x8 resize) plugs in behind the
    identical ``gray: array<int>`` column; everything downstream
    (dHash, banding, verify) is production code either way.  Pure JVM
    expressions, so the relation is oracle-checkable."""
    digest = F.md5(F.col("payload"))
    grid = F.transform(
        F.sequence(F.lit(0), F.lit(_DHASH_ROWS * _DHASH_COLS - 1)),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        digest,
                        (i / _DHASH_COLS).cast("int").cast("string"),
                        (i % _DHASH_COLS).cast("string"),
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int"),
    )
    return docs_with_payload.select("doc_id", "payload", grid.alias("gray"))


def dhash_halves(gray_col) -> tuple:
    """The REAL dHash kernel: bit b (row r = b//8, col c = b%8) is set
    iff cell (r, c) is brighter than its right neighbor — the standard
    difference hash, gradient-based so real-image variants (re-encode,
    resize, small crops) land within a few bits.  Returned as two
    32-bit halves ``(fp_hi, fp_lo)`` — bit 63 does not fit a SIGNED
    long as a positive weight, and halves keep every band/xor step in
    exact nonneg arithmetic (the simhash_fingerprints representation).
    The 64 comparison terms unroll python-side (64 flat when-exprs —
    tiny plan, full codegen)."""

    def bit(b: int):
        idx = (b // 8) * _DHASH_COLS + (b % 8) + 1
        return F.when(
            F.element_at(gray_col, idx) > F.element_at(gray_col, idx + 1),
            F.lit(1 << (b % 32)).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    lo = F.lit(0).cast("long")
    for b in range(32):
        lo = lo + bit(b)
    hi = F.lit(0).cast("long")
    for b in range(32, 64):
        hi = hi + bit(b)
    return hi, lo


def image_dhash(
    docs_with_payload: DataFrame, real_decode: bool = False
) -> DataFrame:
    """(doc_id, dhash) — 64-bit perceptual fingerprints for every
    payload.  ``real_decode=True`` raises (no PIL in this container —
    the documented stub contract); the fake grid exercises the full
    fingerprint pipeline."""
    if real_decode:
        raise NotImplementedError(
            "real image decode requires PIL/opencv (not in this container); "
            "run with real_decode=False for the deterministic fake grid"
        )
    grids = fake_gray_grid(docs_with_payload)
    hi, lo = dhash_halves(F.col("gray"))
    return grids.select(
        "doc_id", hi.alias("fp_hi"), lo.alias("fp_lo")
    )


def phash_neardups(
    docs_with_payload: DataFrame,
    n_bands: int = 8,
    max_hamming: int = 6,
    max_bucket: int | None = None,
    fps: DataFrame | None = None,
) -> DataFrame:
    """Perceptual near-dup pairs: (doc_a, doc_b, hamming) with
    hamming(dhash_a, dhash_b) <= ``max_hamming``, banded blocking over
    the (fp_hi, fp_lo) 32-bit-half fingerprints.

    Pigeonhole-complete: fingerprints within ``max_hamming`` bits agree
    on at least one of ``n_bands`` disjoint bands whenever
    ``n_bands > max_hamming`` (the simhash_neardups scheme; 8 bands of
    8 bits here — image thresholds run higher than text simhash's, so
    more, narrower bands).  One fingerprint pass, one shuffle on
    (band, value), pairs generated inside each bucket; ``max_bucket``
    is the loud degenerate-bucket guard.  Pass ``fps`` (doc_id, dhash)
    to rank REAL decoder output through the same machinery."""
    if n_bands <= max_hamming:
        raise ValueError(
            f"blocking is lossy unless n_bands > max_hamming "
            f"(got {n_bands} <= {max_hamming})"
        )
    if n_bands % 2 or 64 % n_bands:
        raise ValueError(f"n_bands must be even and divide 64 (got {n_bands})")
    band_bits = 64 // n_bands
    per_half = n_bands // 2
    if fps is None:
        fps = image_dhash(docs_with_payload)

    def band_value(b: int):
        half = F.col("fp_lo") if b < per_half else F.col("fp_hi")
        shift = (b % per_half) * band_bits
        return F.shiftrightunsigned(half, shift).bitwiseAND(
            F.lit((1 << band_bits) - 1)
        )

    bands_arr = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_value(b).alias("bv"))
            for b in range(n_bands)
        ]
    )
    buckets = fps.select(
        "doc_id", "fp_hi", "fp_lo", F.explode(bands_arr).alias("bk")
    ).select(
        "doc_id", "fp_hi", "fp_lo",
        F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv"),
    )
    if max_bucket is not None:
        from pyspark.sql import Window as W

        wb = W.partitionBy("band", "bv")
        buckets = (
            buckets.withColumn("__bn", F.count("*").over(wb))
            .filter((F.col("__bn") >= 2) & (F.col("__bn") <= max_bucket))
            .drop("__bn")
        )
    member = F.struct("doc_id", "fp_hi", "fp_lo")
    grouped = buckets.groupBy("band", "bv").agg(
        F.array_sort(F.collect_list(member)).alias("ds")
    )
    pairs = grouped.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        F.col("ds"),
                        lambda a, i: F.transform(
                            F.slice(
                                F.col("ds"),
                                i + 2,
                                F.greatest(
                                    F.size(F.col("ds")) - i - 1, F.lit(0)
                                ),
                            ),
                            lambda b_: F.struct(
                                a["doc_id"].alias("doc_a"),
                                b_["doc_id"].alias("doc_b"),
                                (
                                    F.bit_count(
                                        a["fp_hi"].bitwiseXOR(b_["fp_hi"])
                                    )
                                    + F.bit_count(
                                        a["fp_lo"].bitwiseXOR(b_["fp_lo"])
                                    )
                                ).alias("hamming"),
                            ),
                        ),
                    )
                ),
                lambda p: p["hamming"] <= max_hamming,
            )
        ).alias("p")
    ).select("p.doc_a", "p.doc_b", "p.hamming")
    return pairs.distinct()
