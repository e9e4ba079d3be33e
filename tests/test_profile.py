"""One-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.profile import profile_table


@pytest.fixture(scope="module")
def prof(spark):
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    return (
        orders,
        {r["column"]: r for r in profile_table(orders, exact=True).collect()},
    )


def test_counts_nulls_distincts_exact(spark, prof):
    orders, p = prof
    n = orders.count()
    assert all(r["n_rows"] == n for r in p.values())
    assert p["o_orderkey"]["n_nulls"] == 0 and p["o_orderkey"]["null_frac"] == 0.0
    assert p["o_orderkey"]["approx_distinct"] == n  # primary key
    k = orders.select("o_orderpriority").distinct().count()
    assert p["o_orderpriority"]["approx_distinct"] == k


def test_ranges_and_moments(spark, prof):
    orders, p = prof
    lo, hi = orders.agg(F.min("o_totalprice"), F.max("o_totalprice")).collect()[0]
    assert float(p["o_totalprice"]["min"]) == pytest.approx(float(lo))
    assert float(p["o_totalprice"]["max"]) == pytest.approx(float(hi))
    mean = orders.agg(F.avg("o_totalprice")).collect()[0][0]
    assert p["o_totalprice"]["mean"] == pytest.approx(float(mean), rel=1e-9)
    # quantiles ordered and inside the range
    assert float(lo) <= p["o_totalprice"]["q50"] <= p["o_totalprice"]["q95"] <= float(hi)
    # non-numeric columns have no moments but do have min/max
    assert p["o_orderpriority"]["mean"] is None
    assert p["o_orderpriority"]["min"] == "1-URGENT"


def test_null_accounting(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, None), (4, "b")], ["k", "s"]
    )
    p = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    assert p["s"]["n_nulls"] == 2 and p["s"]["null_frac"] == 0.5
    assert p["s"]["approx_distinct"] == 2


def test_single_pass_plan(spark):
    """The profile must be ONE aggregate over the table (one scan), not
    per-column jobs."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    from pyspark.sql import functions as F

    # count scans via the plan of the aggregate the profiler builds:
    # approximate by asserting hll path profiles a 9-column table without
    # error and returns one row per column
    out = profile_table(orders)
    assert out.count() == len(orders.columns)
