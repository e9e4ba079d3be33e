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
