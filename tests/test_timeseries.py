"""Time-series resampling (operators/timeseries.py): LOCF and linear
gap-fill, grid shape, ties, and the events-table end to end."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _series(spark):
    """Key A: observations at t=10 (v=1.0), t=40 (v=4.0), t=70 (v=10.0);
    key B: one observation."""
    rows = [
        ("A", 10, 1.0),
        ("A", 40, 4.0),
        ("A", 70, 10.0),
        ("B", 25, 5.0),
    ]
    return spark.createDataFrame(rows, ["k", "ts", "v"]).select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    )


def test_locf_grid_and_values(spark):
    from hedera_etl_spark.operators.timeseries import resample_locf

    out = {
        (r["k"], int(r["tick_ts"].timestamp())): r["v"]
        for r in resample_locf(_series(spark), "k", "ts", "v", 20).collect()
    }
    # A's grid: floor(10/20)*20=0 .. 70 -> ticks 0,20,40,60
    assert out[("A", 0)] is None  # before first obs
    assert out[("A", 20)] == 1.0
    assert out[("A", 40)] == 4.0  # tick ON an observation carries it
    assert out[("A", 60)] == 4.0
    # B: ticks 20 (before obs -> None)
    assert out[("B", 20)] is None
    assert set(k for k, _ in out) == {"A", "B"}


def test_linear_interpolation_exact(spark):
    from hedera_etl_spark.operators.timeseries import resample_linear

    out = {
        (r["k"], int(r["tick_ts"].timestamp())): r["v"]
        for r in resample_linear(_series(spark), "k", "ts", "v", 20).collect()
    }
    # t=20 sits 1/3 of the way from (10,1.0) to (40,4.0) -> 2.0
    assert out[("A", 20)] == pytest.approx(2.0)
    # t=60 sits 2/3 of the way from (40,4.0) to (70,10.0) -> 8.0
    assert out[("A", 60)] == pytest.approx(8.0)
    assert out[("A", 40)] == pytest.approx(4.0)  # exact on the observation
    assert out[("A", 0)] is None  # no extrapolation


def test_locf_property_equals_max_earlier_obs(spark):
    """Every LOCF tick equals the latest observation at-or-before it —
    checked against a brute-force join."""
    from hedera_etl_spark.operators.timeseries import resample_locf

    s = _series(spark)
    ticks = resample_locf(s, "k", "ts", "v", 15)
    obs = s.select("k", F.col("ts").cast("long").alias("ot"), F.col("v").alias("ov"))
    brute = (
        ticks.select("k", F.col("tick_ts").cast("long").alias("t"))
        .join(obs, "k", "left")
        .filter(F.col("ot") <= F.col("t"))
        .withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("k", "t")
                .orderBy(F.col("ot").desc())
            ),
        )
        .filter("rn = 1")
        .select("k", "t", F.col("ov").alias("expected"))
    )
    joined = ticks.select(
        "k", F.col("tick_ts").cast("long").alias("t"), "v"
    ).join(brute, ["k", "t"], "left")
    bad = joined.filter(
        (F.col("expected").isNotNull() & (F.col("v") != F.col("expected")))
        | (F.col("expected").isNull() & F.col("v").isNotNull())
    )
    assert bad.count() == 0


def test_events_table_end_to_end_one_window_exchange(spark):
    from hedera_etl_spark.operators.timeseries import resample_locf
    from hedera_etl_spark.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "user_id",
        F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP)").alias("ts"),
        "value",
    )
    out = resample_locf(ev, "user_id", "ts", "value", 3600)
    assert out.count() > 0
    # grid covers every user
    assert (
        out.select("user_id").distinct().count()
        == ev.select("user_id").distinct().count()
    )
