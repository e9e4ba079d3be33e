"""Deterministic corpus shuffle (operators/ordershuffle.py): the seeded
hash permutation must be a reproducible total order, bit-equal to the
single-window form, invariant to partitioning, and the fixed-size shard
export must verify."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hedera_etl_spark.operators.ordershuffle import (
    assign_fixed_shards,
    export_ordered_shards,
    shuffled_order,
)
from hedera_etl_spark.operators.sampling import hash_bucket


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.range(1_000).select(F.col("id").alias("doc_id"))


def test_rank_is_a_deterministic_permutation(corpus):
    ranked = shuffled_order(corpus, ["doc_id"], salt="s1")
    rows = {r["doc_id"]: r["shuffle_rank"] for r in ranked.collect()}
    assert sorted(rows.values()) == list(range(1, 1_001))
    again = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffled_order(corpus, ["doc_id"], salt="s1").collect()
    }
    assert rows == again
    # a new salt draws a DIFFERENT permutation (epoch re-shuffle)
    other = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffled_order(corpus, ["doc_id"], salt="s2").collect()
    }
    assert rows != other
    # ...and the permutation is not the identity (it actually shuffles)
    assert rows != {i: i + 1 for i in range(1_000)}


def test_rank_equals_single_window_form(corpus):
    """The distributed prefix-sum rank must be bit-equal to the naive
    one-window row_number over the same order."""
    got = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffled_order(corpus, ["doc_id"], salt="w").collect()
    }
    naive = corpus.withColumn(
        "rn",
        F.row_number().over(
            W.orderBy(hash_bucket("doc_id", salt="w").asc(), F.col("doc_id").asc())
        ),
    )
    want = {r["doc_id"]: r["rn"] for r in naive.collect()}
    assert got == want


def test_rank_invariant_to_partitioning(corpus):
    a = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffled_order(corpus, ["doc_id"], salt="p", n_partitions=3).collect()
    }
    b = {
        r["doc_id"]: r["shuffle_rank"]
        for r in shuffled_order(
            corpus.repartition(17), ["doc_id"], salt="p", n_partitions=29
        ).collect()
    }
    assert a == b


def test_fixed_shards_are_fixed_size(corpus):
    sharded = assign_fixed_shards(corpus, 64, ["doc_id"], salt="f")
    sizes = {
        r["shard_id"]: r["n"]
        for r in sharded.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
    }
    assert set(sizes) == set(range(16))  # 1000 rows / 64 = 15 full + tail
    assert all(sizes[i] == 64 for i in range(15))
    assert sizes[15] == 1_000 - 15 * 64
    # pos_in_shard is 0..size-1 within every shard, aligned with rank
    rows = sharded.collect()
    for r in rows:
        assert r["shard_id"] == (r["shuffle_rank"] - 1) // 64
        assert r["pos_in_shard"] == (r["shuffle_rank"] - 1) % 64


def test_export_ordered_shards_verifies_and_orders(spark, corpus, tmp_path):
    from hedera_etl_spark.operators.export import verify_shards

    out = str(tmp_path / "ordshards")
    manifest = export_ordered_shards(
        corpus.withColumn("n_tokens", F.lit(3)), out, 256, ["doc_id"],
        salt="e", token_count_col="n_tokens",
    )
    m = manifest.collect()
    assert [r["shard_id"] for r in m] == [0, 1, 2, 3]
    assert [r["n_rows"] for r in m] == [256, 256, 256, 232]
    assert all(r["ok"] for r in verify_shards(spark, out).collect())
    # within-file physical order IS the training order
    first = spark.read.parquet(f"{out}/shards/shard_id=0")
    pos = [r["pos_in_shard"] for r in first.collect()]
    assert pos == list(range(256))


def test_reserved_column_guard(corpus):
    with pytest.raises(ValueError, match="reserved"):
        shuffled_order(corpus.withColumn("__shuffle_one", F.lit(1)), ["doc_id"])
    with pytest.raises(ValueError, match="shard_size"):
        assign_fixed_shards(corpus, 0, ["doc_id"])
    # output-column collisions are LOUD, never silent overwrites (r9
    # review finding: a frame already carrying a shard_id from a prior
    # export must not have it silently replaced)
    with pytest.raises(ValueError, match="collide"):
        assign_fixed_shards(corpus.withColumn("shard_id", F.lit(0)), 64, ["doc_id"])
    with pytest.raises(ValueError, match="collide"):
        assign_fixed_shards(
            corpus.withColumn("pos_in_shard", F.lit(0)), 64, ["doc_id"]
        )
