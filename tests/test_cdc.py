"""Content-defined chunking (operators/multimodal.cdc_chunks):
reference equality, the shift-resilience property fixed-size chunking
lacks, size bounds, and the dedup report."""

import hashlib
import random

import numpy as np
import pytest

from hedera_etl_spark.operators.multimodal import (
    _gear_table,
    cdc_chunks,
    cdc_dedup_stats,
)

KW = dict(min_size=16, avg_bits=6, max_size=256, window=48)


def _py_cdc(data: bytes, min_size, avg_bits, max_size, window) -> list:
    """Sequential reference: same gear polynomial, same greedy walk."""
    gear = _gear_table()
    mask = (1 << avg_bits) - 1
    n = len(data)
    if n == 0:
        return [(0, 0, hashlib.md5(b"").hexdigest())]
    cand = []
    for i in range(n):
        h = 0
        for j in range(min(window, i + 1)):
            h = (h + (gear[data[i - j]] << j)) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            cand.append(i + 1)
    cuts, last = [], 0
    for c in cand:
        while c - last > max_size:
            last += max_size
            cuts.append(last)
        if c - last >= min_size:
            cuts.append(c)
            last = c
    while n - last > max_size:
        last += max_size
        cuts.append(last)
    if not cuts or cuts[-1] != n:
        cuts.append(n)
    out, start = [], 0
    for cut in cuts:
        out.append((start, cut - start, hashlib.md5(data[start:cut]).hexdigest()))
        start = cut
    return out


def _payloads(spark, blobs):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in enumerate(blobs)],
        "doc_id long, payload binary",
    )


def _collect(spark, blobs, **kw):
    rows = cdc_chunks(_payloads(spark, blobs), **kw).collect()
    out = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        out.setdefault(r.doc_id, []).append((r.offset, r.n_bytes, r.chunk_md5))
    return out


def test_matches_sequential_reference(spark):
    rng = random.Random(11)
    blobs = [
        bytes(rng.randrange(256) for _ in range(n)) for n in (0, 1, 15, 300, 2000)
    ]
    got = _collect(spark, blobs, **KW)
    for i, b in enumerate(blobs):
        assert got[i] == _py_cdc(b, **KW), (i, len(b))


def test_chunks_tile_payload_within_bounds(spark):
    rng = random.Random(5)
    blob = bytes(rng.randrange(256) for _ in range(5000))
    chunks = _collect(spark, [blob], **KW)[0]
    assert chunks[0][0] == 0
    assert sum(c[1] for c in chunks) == len(blob)
    for (off, n, _), (off2, _, _) in zip(chunks, chunks[1:]):
        assert off + n == off2
    assert all(n <= KW["max_size"] for _, n, _ in chunks)
    # every non-final chunk respects the floor (the final one may not)
    assert all(n >= KW["min_size"] for _, n, _ in chunks[:-1])


def test_shift_resilience_beats_fixed_chunking(spark):
    """Insert 3 bytes at the front: CDC re-synchronizes and most chunk
    hashes survive; fixed-size splitting shares (almost) none."""
    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(4000))
    shifted = b"xyz" + base
    got = _collect(spark, [base, shifted], **KW)
    h0 = {h for _, _, h in got[0]}
    h1 = {h for _, _, h in got[1]}
    assert len(h0 & h1) >= 0.7 * len(h0)
    fixed0 = {hashlib.md5(base[i : i + 64]).hexdigest() for i in range(0, len(base), 64)}
    fixed1 = {
        hashlib.md5(shifted[i : i + 64]).hexdigest()
        for i in range(0, len(shifted), 64)
    }
    assert len(fixed0 & fixed1) <= 1


def test_dedup_stats(spark):
    rng = random.Random(9)
    blob = bytes(rng.randrange(256) for _ in range(2000))
    # two identical payloads + one unique
    other = bytes(rng.randrange(256) for _ in range(2000))
    chunks = cdc_chunks(_payloads(spark, [blob, blob, other]), **KW)
    row = cdc_dedup_stats(chunks).collect()[0]
    assert row.total_bytes == 2 * 2000 + 2000
    assert row.distinct_bytes <= 2000 + 2000
    assert row.dedup_ratio == pytest.approx(
        1 - row.distinct_bytes / row.total_bytes
    )
    assert row.total_chunks > row.distinct_chunks


def test_validation(spark):
    with pytest.raises(ValueError):
        cdc_chunks(_payloads(spark, [b"x"]), min_size=0)


def test_null_payload_yields_no_chunks(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"hello world bytes")), (2, None)],
        "doc_id long, payload binary",
    )
    rows = cdc_chunks(df, **KW).collect()
    assert {r.doc_id for r in rows} == {1}


class TestPerceptualHash:
    """dHash + banded hamming near-dup (operators/multimodal.py):
    kernel correctness on hand-built grids, controlled-hamming recall
    through the fps injection path, completeness bound, exact-clone
    class, and the real-decode gate."""

    def test_dhash_kernel_on_handbuilt_grids(self, spark):
        from pyspark.sql import functions as F

        from hedera_etl_spark.operators.multimodal import dhash_halves

        # grid of strictly increasing cells: every right neighbor is
        # brighter -> NO bit set; strictly decreasing -> ALL bits set
        inc = list(range(72))
        dec = list(range(72, 0, -1))
        df = spark.createDataFrame(
            [(0, inc), (1, dec)], "doc_id long, gray array<int>"
        )
        hi, lo = dhash_halves(F.col("gray"))
        r = {x["doc_id"]: x for x in df.select("doc_id", hi.alias("h"), lo.alias("l")).collect()}
        assert (r[0]["h"], r[0]["l"]) == (0, 0)
        assert (r[1]["h"], r[1]["l"]) == ((1 << 32) - 1, (1 << 32) - 1)

    def test_controlled_hamming_pairs_via_fps_injection(self, spark):
        from hedera_etl_spark.operators.multimodal import phash_neardups

        # fingerprints with known pairwise hamming: base, 3-bit flip
        # (in one band), 6-bit flip spread across bands, 9-bit flip
        fps = spark.createDataFrame(
            [
                (1, 0, 0),
                (2, 0, 0b111),                # hamming 3 vs 1
                (3, 0b1_00000001, 0b1_00000001 << 8),  # spread bits
                (4, (1 << 32) - 1, (1 << 32) - 1),     # far from all
            ],
            "doc_id long, fp_hi long, fp_lo long",
        )
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in phash_neardups(None, fps=fps, max_hamming=6).collect()
        }
        assert pairs[(1, 2)] == 3
        assert pairs[(1, 3)] == 4
        assert (1, 4) not in pairs and (2, 4) not in pairs
        # completeness bound: lossy blocking refused loudly
        import pytest as _pt

        with _pt.raises(ValueError, match="lossy"):
            phash_neardups(None, fps=fps, n_bands=4, max_hamming=6)

    def test_exact_clone_class_and_decode_gate(self, spark):
        import pytest as _pt
        from pyspark.sql import functions as F

        from hedera_etl_spark.operators.multimodal import (
            image_dhash,
            phash_neardups,
            with_payload,
        )

        docs = spark.createDataFrame(
            [(i, f"document number {i} with some words") for i in range(30)],
            "doc_id long, text string",
        )
        corpus = with_payload(docs).unionByName(
            with_payload(
                docs.filter(F.col("doc_id") % 10 == 0).select(
                    (F.col("doc_id") + 1000).alias("doc_id"), "text"
                )
            )
        )
        pairs = phash_neardups(corpus).collect()
        assert {(r["doc_a"], r["doc_b"], r["hamming"]) for r in pairs} == {
            (0, 1000, 0), (10, 1010, 0), (20, 1020, 0)
        }
        with _pt.raises(NotImplementedError, match="PIL"):
            image_dhash(corpus, real_decode=True)
