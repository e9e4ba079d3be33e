"""Time-series resampling: per-key gap-filling onto a regular tick grid
(the hypertable-rollup / time_bucket_gapfill surface of time-series
engines, re-expressed as DataFrame ops).

Shape: ONE aggregate discovers each key's observed range, the tick grid
explodes from a ``sequence`` (map-side fan-out, no shuffle), and the
fill itself is a single window over (key, time) that the grid rows share
with the observations — so the whole operator costs one aggregate plus
one keyed window exchange regardless of series length or key count.
Grid density is the caller's contract: ticks per key = range/interval,
generated distributed (never on the driver).

Fills:
- LOCF (last observation carried forward): ``last(value, ignorenulls)``
  over the running frame — the standard fill for state-like series;
- linear: previous and next observations bracketing each tick via
  running ``last``/``first`` over struct(ts, value), then the exact
  lerp; ticks before the first / after the last observation stay NULL
  (no extrapolation).

Determinism: ties between an observation and a tick at the same instant
order observation-first, so a tick ON an observation reproduces that
observation exactly in both fills.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _grid(obs: DataFrame, key_col: str, ts_long, interval_sec: int) -> DataFrame:
    """Per-key tick timestamps: floor(min_ts) .. max_ts step interval —
    derived with one aggregate, exploded map-side."""
    i = int(interval_sec)
    rng = obs.groupBy(key_col).agg(
        ((F.min(ts_long) / i).cast("long") * i).alias("__lo"),
        F.max(ts_long).alias("__hi"),
    )
    return rng.select(
        key_col,
        F.explode(F.sequence("__lo", "__hi", F.lit(i))).alias("__tick"),
    )


def resample_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
) -> DataFrame:
    """(key, tick_ts, value) at every ``interval_sec`` tick of each key's
    observed range, value = last observation at-or-before the tick."""
    ts_long = F.col(ts_col).cast("long")
    obs = df.select(
        F.col(key_col),
        ts_long.alias("__t"),
        F.col(value_col).cast("double").alias("__v"),
        F.lit(0).alias("__is_tick"),
    )
    ticks = _grid(df.select(key_col, ts_col), key_col, ts_long, interval_sec).select(
        key_col,
        F.col("__tick").alias("__t"),
        F.lit(None).cast("double").alias("__v"),
        F.lit(1).alias("__is_tick"),
    )
    # observation sorts before the tick at the same instant, so a tick ON
    # an observation carries it (not the previous one)
    w = (
        W.partitionBy(key_col)
        .orderBy("__t", "__is_tick")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        obs.unionByName(ticks)
        .withColumn("__fill", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_tick") == 1)
        .select(
            key_col,
            F.col("__t").cast("timestamp").alias("tick_ts"),
            F.col("__fill").alias(value_col),
        )
    )


def resample_linear(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    interval_sec: int,
) -> DataFrame:
    """Like :func:`resample_locf` but linearly interpolating between the
    bracketing observations; ticks outside the observed value range stay
    NULL (no extrapolation)."""
    ts_long = F.col(ts_col).cast("long")
    obs = df.select(
        F.col(key_col),
        ts_long.alias("__t"),
        F.struct(ts_long.alias("t"), F.col(value_col).cast("double").alias("v")).alias(
            "__obs"
        ),
        F.lit(0).alias("__is_tick"),
    )
    ticks = _grid(df.select(key_col, ts_col), key_col, ts_long, interval_sec).select(
        key_col,
        F.col("__tick").alias("__t"),
        F.lit(None).cast("struct<t:bigint,v:double>").alias("__obs"),
        F.lit(1).alias("__is_tick"),
    )
    wb = (
        W.partitionBy(key_col)
        .orderBy("__t", "__is_tick")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key_col)
        .orderBy("__t", "__is_tick")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    prev, nxt = F.col("__prev"), F.col("__next")
    lerp = F.when(
        prev.isNull() | nxt.isNull(), F.lit(None).cast("double")
    ).when(
        nxt["t"] == prev["t"], prev["v"]
    ).otherwise(
        prev["v"]
        + (nxt["v"] - prev["v"])
        * (F.col("__t") - prev["t"])
        / (nxt["t"] - prev["t"])
    )
    return (
        obs.unionByName(ticks)
        .withColumn("__prev", F.last("__obs", ignorenulls=True).over(wb))
        .withColumn("__next", F.first("__obs", ignorenulls=True).over(wf))
        .filter(F.col("__is_tick") == 1)
        .select(
            key_col,
            F.col("__t").cast("timestamp").alias("tick_ts"),
            lerp.alias(value_col),
        )
    )
