"""Mergeable sketch layer (operators/sketches.py): accuracy bounds vs
exact, and the merge-equals-direct property that makes persisted
per-partition sketches trustworthy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.sketches import (
    approx_distinct_by,
    approx_quantiles_by,
    distinct_sketches,
    merge_distinct_estimate,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def test_hll_estimate_within_published_error(spark, orders):
    est = approx_distinct_by(orders, ["o_orderpriority"], "o_custkey").collect()
    exact = {
        r["o_orderpriority"]: r["d"]
        for r in orders.groupBy("o_orderpriority")
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()
    }
    for r in est:
        rel = abs(r["approx_distinct"] - exact[r["o_orderpriority"]]) / exact[
            r["o_orderpriority"]
        ]
        assert rel < 0.05, (r, exact[r["o_orderpriority"]])


def test_merged_daily_sketches_equal_direct_estimate(spark, orders):
    """The pre-agg contract: per-day sketches unioned at query time give
    EXACTLY the estimate a direct one-pass sketch gives (DataSketches
    union is lossless at equal lgK) — so persisting the daily layer
    costs no accuracy."""
    by_day = distinct_sketches(
        orders.withColumn("day", F.to_date("o_orderdate")),
        ["day"],
        "o_custkey",
    )
    assert by_day.count() > 5  # genuinely partitioned input
    merged = merge_distinct_estimate(by_day).collect()[0]
    direct = (
        orders.agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg("o_custkey", F.lit(12))
            ).alias("approx_distinct")
        ).collect()[0]
    )
    assert merged["approx_distinct"] == direct["approx_distinct"]
    assert merged["n_rows"] == orders.count()


def test_sketches_roundtrip_through_parquet(spark, orders, tmp_path):
    """The persisted layer: binary sketch columns survive a parquet
    write/read and still merge."""
    path = str(tmp_path / "daily_sketches")
    by_day = distinct_sketches(
        orders.withColumn("day", F.to_date("o_orderdate")), ["day"], "o_custkey"
    )
    by_day.write.parquet(path)
    reread = spark.read.parquet(path)
    a = merge_distinct_estimate(by_day).collect()[0]["approx_distinct"]
    b = merge_distinct_estimate(reread).collect()[0]["approx_distinct"]
    assert a == b


def test_range_query_over_sketch_subset(spark, orders):
    """Answering a date-range distinct count from the persisted layer
    touches only the selected rows of the (tiny) sketch table."""
    by_day = distinct_sketches(
        orders.withColumn("day", F.to_date("o_orderdate")), ["day"], "o_custkey"
    ).cache()
    days = sorted(r["day"] for r in by_day.select("day").collect())
    lo, hi = days[1], days[-2]
    sub = by_day.filter((F.col("day") >= lo) & (F.col("day") <= hi))
    est = merge_distinct_estimate(sub).collect()[0]["approx_distinct"]
    exact = (
        orders.filter(
            (F.to_date("o_orderdate") >= lo) & (F.to_date("o_orderdate") <= hi)
        )
        .agg(F.countDistinct("o_custkey").alias("d"))
        .collect()[0]["d"]
    )
    assert abs(est - exact) / exact < 0.05
    by_day.unpersist()


def test_approx_quantiles_rank_error(spark, orders):
    qs = approx_quantiles_by(
        orders, ["o_orderpriority"], "o_totalprice", quantiles=[0.5, 0.95]
    ).collect()
    for r in qs:
        vals = [
            x["o_totalprice"]
            for x in orders.filter(
                F.col("o_orderpriority") == r["o_orderpriority"]
            ).collect()
        ]
        vals.sort()
        n = len(vals)
        for q, col in ((0.5, "q5"), (0.95, "q95")):
            # value must sit within +-1% of the true rank
            import bisect

            rank = bisect.bisect_left(vals, r[col])
            assert abs(rank - q * n) <= max(0.01 * n, 2), (r, q, rank, n)
