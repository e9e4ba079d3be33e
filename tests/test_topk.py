"""grouped_topk: two-phase == single-window bit-equality, shard-count
invariance, tie-break determinism, and the plan shape (two ranked
windows, phase-2 input bounded)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hedera_etl_spark.operators.topk import grouped_topk


@pytest.fixture(scope="module")
def scored(spark):
    rows = [
        (i, ["web", "books", "code"][i % 3], float((i * 37) % 101))
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, score double")


def _single_window(df, k):
    w = W.partitionBy("source").orderBy(F.col("score").desc(), "doc_id")
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _key(rows):
    return sorted((r["source"], r["rank"], r["doc_id"], r["score"]) for r in rows)


def test_two_phase_equals_single_window(spark, scored):
    for k in (1, 3, 10):
        got = grouped_topk(
            scored, ["source"], [F.col("score").desc(), "doc_id"], k,
            shard_on="doc_id",
        )
        assert _key(got.collect()) == _key(_single_window(scored, k).collect())


def test_shard_count_invariance(spark, scored):
    base = None
    for n in (1, 2, 7, 64):
        got = _key(
            grouped_topk(
                scored, ["source"], [F.col("score").desc(), "doc_id"], 5,
                shard_on="doc_id", n_shards=n,
            ).collect()
        )
        base = base or got
        assert got == base, f"n_shards={n} changed the result"


def test_k_boundary_ties_resolved_by_total_order(spark):
    # every row has the SAME score: the doc_id tie-break must select the
    # lowest ids deterministically
    df = spark.createDataFrame(
        [(i, "d", 1.0) for i in range(20)],
        "doc_id long, source string, score double",
    )
    got = grouped_topk(
        df, ["source"], [F.col("score").desc(), "doc_id"], 3, shard_on="doc_id"
    )
    assert sorted(r["doc_id"] for r in got.collect()) == [0, 1, 2]


def test_more_shards_than_rows_per_group(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", 1.0), (3, "b", 9.0)],
        "doc_id long, source string, score double",
    )
    got = grouped_topk(
        df, ["source"], [F.col("score").desc(), "doc_id"], 2,
        shard_on="doc_id", n_shards=256,
    ).collect()
    assert _key(got) == [("a", 1, 1, 2.0), ("a", 2, 2, 1.0), ("b", 1, 3, 9.0)]


def test_rejects_degenerate_params(spark, scored):
    with pytest.raises(ValueError):
        grouped_topk(scored, ["source"], ["score"], 0, shard_on="doc_id")
    with pytest.raises(ValueError):
        grouped_topk(scored, ["source"], ["score"], 3, shard_on="doc_id", n_shards=0)


def test_plan_has_two_windows_sharded_first(spark, scored):
    plan = grouped_topk(
        scored, ["source"], [F.col("score").desc(), "doc_id"], 3,
        shard_on="doc_id",
    )._jdf.queryExecution().executedPlan().toString().split("== Initial Plan ==")[0]
    assert plan.count("Window") >= 2
    # phase 1 partitions on (source, __shard): the shard key must appear
    # in an exchange/window spec so no single-domain reducer exists
    assert "__shard" in plan


def test_rejects_colliding_input_columns(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0, 9)], "doc_id long, source string, score double, rank long"
    )
    with pytest.raises(ValueError, match="collide"):
        grouped_topk(df, ["source"], ["score"], 1, shard_on="doc_id")
    ok = grouped_topk(
        df, ["source"], ["score"], 1, shard_on="doc_id", rank_col="qrank"
    )
    assert {"rank", "qrank"} <= set(ok.columns)  # caller's column kept


def test_collision_guard_is_case_insensitive(spark):
    # Spark resolves withColumn/drop case-insensitively by default, so a
    # differently-cased column must also be rejected
    df = spark.createDataFrame(
        [(1, "a", 1.0, 9)], "doc_id long, source string, score double, Rank long"
    )
    with pytest.raises(ValueError, match="collide"):
        grouped_topk(df, ["source"], ["score"], 1, shard_on="doc_id")


def test_shard_on_expression_equals_column_name(spark):
    """shard_on accepts an expression; the shard assignment can never
    change the answer, only the spread — pinned bit-equal."""
    from pyspark.sql import functions as F

    from hedera_etl_spark.operators.topk import grouped_topk

    df = spark.range(3_000).select(
        (F.col("id") % 4).cast("string").alias("g"),
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("score"),
    )
    order = [F.col("score").desc(), F.col("doc_id")]
    a = grouped_topk(df, ["g"], order, 7, shard_on="doc_id").collect()
    b = grouped_topk(
        df, ["g"], order, 7, shard_on=F.xxhash64("g", "doc_id")
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
