"""Sequence packing: capacity, totality, determinism, oversize policy,
fill quality, and the documents-table integration path."""

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.packing import pack_sequences, packing_stats

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    # varied sizes incl. an oversize doc and an empty doc
    rows = [(i, "tok " * (5 + (i * 37) % 90)) for i in range(200)]
    rows.append((200, "big " * 500))  # oversize vs max_tokens=128
    rows.append((201, ""))  # zero tokens
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_every_doc_assigned_exactly_once(spark, corpus):
    out = pack_sequences(corpus, max_tokens=128, n_groups=8)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(202))


def test_no_regular_bin_exceeds_capacity(spark, corpus):
    out = pack_sequences(corpus, max_tokens=128, n_groups=8)
    fills = (
        out.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
        .collect()
    )
    assert fills and all(r["fill"] <= 128 for r in fills)


def test_oversize_flagged_and_alone(spark, corpus):
    out = pack_sequences(corpus, max_tokens=128, n_groups=8)
    over = out.filter(F.col("oversize")).collect()
    assert [r["doc_id"] for r in over] == [200]
    # its bin contains only itself
    bin_members = out.filter(F.col("bin_id") == over[0]["bin_id"]).count()
    assert bin_members == 1


def test_deterministic_across_runs(spark, corpus):
    a = sorted(map(tuple, pack_sequences(corpus, 128, n_groups=8).collect()))
    b = sorted(map(tuple, pack_sequences(corpus, 128, n_groups=8).collect()))
    assert a == b


def test_zero_token_doc_packs_without_consuming_budget(spark, corpus):
    out = pack_sequences(corpus, max_tokens=128, n_groups=8)
    row = out.filter(F.col("doc_id") == 201).collect()[0]
    assert row["n_tokens"] == 0 and not row["oversize"]


def test_bin_ids_unique_across_groups(spark, corpus):
    out = pack_sequences(corpus, max_tokens=128, n_groups=8)
    pairs = out.select("group_id", "bin_id").distinct().collect()
    by_bin = {}
    for r in pairs:
        assert by_bin.setdefault(r["bin_id"], r["group_id"]) == r["group_id"]


def test_ffd_fill_quality(spark):
    # uniform 32-token docs into 128-token bins: every bin must hold
    # exactly 4 docs (FFD is optimal here), so fill_rate == 1.0 for all
    # full bins and the bin count is within one-per-group of total/4
    docs = spark.createDataFrame(
        [(i, "w " * 32) for i in range(256)], ["doc_id", "text"]
    )
    out = pack_sequences(docs, max_tokens=128, n_groups=4)
    stats = packing_stats(out, 128).collect()[0]
    assert stats["n_docs"] == 256 and stats["n_oversize"] == 0
    assert stats["max_fill"] == 128
    # 256 docs / 4 per bin = 64 optimal; per-group rounding adds < n_groups
    assert stats["n_bins"] <= 64 + 4


def test_precounted_column_path(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 120)], ["doc_id", "n_tok"]
    )
    out = pack_sequences(docs, 128, n_groups=2, count_col="n_tok").collect()
    assert {r["doc_id"]: r["n_tokens"] for r in out} == {1: 10, 2: 20, 3: 120}


def test_documents_table_integration(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = pack_sequences(docs, max_tokens=512, n_groups=16)
    stats = packing_stats(out, 512).collect()[0]
    assert stats["n_docs"] == docs.count()
    assert 0.5 < stats["fill_rate"] <= 1.0


# ---------------------------------------------------------------------------
# concat-and-chunk packer (pack_concat) — the window-form zero-loss twin
# ---------------------------------------------------------------------------
def test_concat_every_doc_assigned_once(spark, corpus):
    from hedera_etl_spark.operators.packing import pack_concat

    out = pack_concat(corpus, max_tokens=128, n_groups=8)
    ids = [r["doc_id"] for r in out.select("doc_id").collect()]
    assert sorted(ids) == list(range(202))


def test_concat_offsets_are_contiguous_within_groups(spark, corpus):
    from hedera_etl_spark.operators.packing import pack_concat

    out = pack_concat(corpus, max_tokens=128, n_groups=8).collect()
    by_group = {}
    for r in sorted(out, key=lambda r: (r["group_id"], r["doc_id"])):
        expect = by_group.get(r["group_id"], 0)
        assert r["start_offset"] == expect
        by_group[r["group_id"]] = expect + r["n_tokens"]


def test_concat_bin_and_split_flags(spark, corpus):
    from hedera_etl_spark.operators.packing import pack_concat

    for r in pack_concat(corpus, max_tokens=128, n_groups=8).collect():
        first = r["start_offset"] // 128
        last = (r["start_offset"] + max(r["n_tokens"] - 1, 0)) // 128
        assert r["bin_id"] == r["group_id"] * 1_000_000_000 + first
        assert r["split_across"] == (r["n_tokens"] > 0 and last > first)


def test_concat_wastes_no_tokens(spark, corpus):
    """Every bin except each group's LAST is EXACTLY full.  Reconstruct
    per-bin fills from the (start_offset, n_tokens) spans — the previous
    form only re-asserted contiguity (max(start+n) == sum(n)), which any
    prefix-sum layout satisfies even if bins were mis-sized."""
    from collections import defaultdict

    from hedera_etl_spark.operators.packing import pack_concat

    max_tokens = 128
    out = pack_concat(corpus, max_tokens=max_tokens, n_groups=4).collect()
    for g in {r["group_id"] for r in out}:
        rows = [r for r in out if r["group_id"] == g]
        fills = defaultdict(int)
        for r in rows:
            s, n = r["start_offset"], r["n_tokens"]
            for b in range(s // max_tokens, max(s + n - 1, s) // max_tokens + 1):
                lo = max(s, b * max_tokens)
                hi = min(s + n, (b + 1) * max_tokens)
                fills[b] += max(hi - lo, 0)
        total = sum(r["n_tokens"] for r in rows)
        assert sum(fills.values()) == total
        last = max(fills)
        for b, fill in fills.items():
            if b < last:
                assert fill == max_tokens, f"group {g} bin {b} underfull: {fill}"
        assert 0 < fills[last] <= max_tokens
