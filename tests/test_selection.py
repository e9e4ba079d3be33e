"""Budget-constrained selection / distributed running totals
(operators/selection.py): the two-exchange prefix-sum plan must be
bit-equal to the naive single-window form under every data shape,
including total-tie skew."""

from __future__ import annotations

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hedera_etl_spark.operators.selection import (
    running_total,
    select_to_token_budget,
)


def _corpus(spark, n=4_000, tie_every=None):
    """Deterministic corpus: quality from a hash (many exact ties when
    tie_every divides the space), tokens in [1, 100]."""
    q = (F.xxhash64("doc_id") % (tie_every or 1_000_000)).cast("double")
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        q.alias("quality_score"),
        (F.pmod(F.xxhash64("id", F.lit("t")), F.lit(100)) + 1).alias("n_tokens"),
    )


def _naive(df, budget):
    w = (
        W.orderBy(F.col("quality_score").desc_nulls_last(), F.col("doc_id"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        df.withColumn("cum_tokens", F.sum("n_tokens").over(w).cast("long"))
        .filter(F.col("cum_tokens") <= budget)
    )


@pytest.mark.parametrize("tie_every", [None, 7, 1])
def test_budget_select_equals_single_window(spark, tie_every):
    """Distributed prefix sum == one global window, for distinct
    qualities, heavy ties, and the all-tied worst case (tie_every=1:
    one quality value for the whole corpus)."""
    df = _corpus(spark, tie_every=tie_every)
    got = select_to_token_budget(df, 60_000).collect()
    want = _naive(df, 60_000).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert got, "budget must select a non-trivial prefix"


def test_budget_select_is_nested_and_bounded(spark):
    df = _corpus(spark, n=1_000)
    big = {r["doc_id"]: r["cum_tokens"] for r in
           select_to_token_budget(df, 20_000).collect()}
    small = {r["doc_id"]: r["cum_tokens"] for r in
             select_to_token_budget(df, 5_000).collect()}
    # smaller budget = prefix of the bigger selection, same running totals
    assert set(small) <= set(big)
    assert all(big[d] == c for d, c in small.items())
    assert all(c <= 5_000 for c in small.values())
    # rails
    assert select_to_token_budget(df, 0).count() == 0
    total = df.agg(F.sum("n_tokens")).collect()[0][0]
    assert select_to_token_budget(df, int(total)).count() == 1_000
    with pytest.raises(ValueError, match="budget"):
        select_to_token_budget(df, -1)


def test_budget_select_stable_under_partitioning(spark):
    df = _corpus(spark, n=2_000)
    a = select_to_token_budget(df, 30_000).collect()
    b = select_to_token_budget(df.repartition(17), 30_000, n_partitions=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_running_total_collision_guard(spark):
    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit(1).alias("n_tokens"),
        F.lit(0).alias("__PID"),
    )
    with pytest.raises(ValueError, match="collide"):
        running_total(df, [F.col("doc_id")], "n_tokens")


def test_running_total_null_quality_orders_last(spark):
    rows = [(1, 5.0, 10), (2, None, 10), (3, 9.0, 10)]
    df = spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_tokens long"
    )
    out = {r["doc_id"]: r["cum_tokens"]
           for r in select_to_token_budget(df, 100).collect()}
    # order: 3 (9.0), 1 (5.0), 2 (NULL last)
    assert out == {3: 10, 1: 20, 2: 30}


def test_running_total_rejects_out_col_named_like_internals(spark):
    df = spark.range(5).select(F.col("id").alias("doc_id"), F.lit(1).alias("v"))
    with pytest.raises(ValueError, match="internals"):
        running_total(df, [F.col("doc_id")], "v", out_col="__off")


def test_running_total_rejects_float_values(spark):
    """A double prefix sum is association-order-dependent, so the
    distributed form could disagree with the single window (and with
    itself across n_partitions) — rejected, not silently truncated."""
    df = spark.range(5).select(
        F.col("id").alias("doc_id"), F.lit(0.7).alias("v")
    )
    with pytest.raises(ValueError, match="exact integral/decimal"):
        running_total(df, [F.col("doc_id")], "v")


def test_running_total_decimal_is_exact_across_partitionings(spark):
    df = spark.range(1_000).select(
        F.col("id").alias("doc_id"),
        (F.lit(0.7).cast("decimal(10,2)")).alias("v"),
    )
    order = [F.col("doc_id")]
    a = running_total(df, order, "v", n_partitions=2).collect()
    b = running_total(df, order, "v", n_partitions=9).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    by_id = {r["doc_id"]: r["running_total"] for r in a}
    from decimal import Decimal
    assert by_id[999] == Decimal("700.00")
    assert by_id[0] == Decimal("0.70")


def test_running_total_null_values_contribute_zero_any_partitioning(spark):
    """A NULL value landing at a range-partition head must not poison
    that row's running total (bare window sums are NULL over an all-NULL
    local prefix) — NULLs contribute 0 under every n_partitions."""
    rows = [(0, 1), (1, 1), (2, None), (3, 1)]
    df = spark.createDataFrame(rows, "doc_id long, v long")
    for n in (1, 2, 4):
        out = {
            r["doc_id"]: r["running_total"]
            for r in running_total(
                df, [F.col("doc_id")], "v", n_partitions=n
            ).collect()
        }
        assert out == {0: 1, 1: 2, 2: 2, 3: 3}, f"n_partitions={n}"


# ---------------------------------------------------------------------------
# corpus snapshot diff (operators/corpusdiff.py) — colocated here with the
# other corpus-management ops
# ---------------------------------------------------------------------------
def test_corpus_diff_statuses_and_summary(spark):
    from hedera_etl_spark.operators.corpusdiff import corpus_diff, diff_summary

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "c2"), (4, None), (5, "e")],
        "doc_id long, text string",
    )
    d = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
    assert d == {
        1: "removed", 2: "unchanged", 3: "changed", 4: "unchanged", 5: "added"
    }
    s = {r["status"]: r["n"] for r in diff_summary(corpus_diff(old, new)).collect()}
    assert s == {"added": 1, "removed": 1, "changed": 1, "unchanged": 2}


def test_corpus_diff_null_shift_and_null_vs_empty_are_changes(spark):
    """ADVICE r8 #2 regression: with multi-column content, a NULL moving
    between columns must read as 'changed' (concat_ws alone would skip
    the NULL and collide), and NULL vs empty string must differ."""
    from hedera_etl_spark.operators.corpusdiff import corpus_diff

    old = spark.createDataFrame(
        [(1, None, "x"), (2, None, "y")], "doc_id long, title string, text string"
    )
    new = spark.createDataFrame(
        [(1, "x", None), (2, "", "y")], "doc_id long, title string, text string"
    )
    d = {
        r["doc_id"]: r["status"]
        for r in corpus_diff(old, new, content_cols=("title", "text")).collect()
    }
    assert d == {1: "changed", 2: "changed"}


def test_corpus_diff_join_is_pruned_to_id_and_hash(spark):
    """The full-outer join must move (id, md5) only — document bodies
    stay in their scans (scale contract of the module docstring)."""
    from hedera_etl_spark.operators.corpusdiff import corpus_diff

    old = spark.range(100).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text"),
        F.lit("x").alias("payload"),
    )
    plan = corpus_diff(old, old)._jdf.queryExecution().executedPlan().toString()
    import re
    join_line = next(l for l in plan.splitlines() if "SortMergeJoin" in l)
    assert "text" not in join_line and "payload" not in join_line


def test_running_total_offsets_join_broadcasts(spark):
    """The offsets frame is dimension-sized (one row per partition), so
    its join-back must be a BroadcastHashJoin — never a sort-merge or
    cartesian over the corpus."""
    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97).cast("decimal(10,2)").alias("q"),
        F.lit(10).alias("n_tokens"),
    )
    out = running_total(df, [F.col("q").desc(), F.col("doc_id")], "n_tokens")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
