"""Time-series gap-fill registry entries (operators/timeseries.py).

The two entries trade the family's driver-window slot across rotations
(``ts_gapfill_locf`` holds it since r12, ``ts_gapfill_linear`` before
that) — they share the union-of-(observations, ticks) relation and the
keyed IGNORE-NULLS window.  Parked or not, both stay fully
oracle-checked by ``tools/verify_oracle.py``: the DuckDB twin builds
the same union-of-(observations, ticks) relation and fills with the
same IGNORE NULLS window navigation, pinning LOCF carry semantics,
the observation-before-tick tie rule, and the exact lerp.

Output keeps the tick as BIGINT epoch-seconds rather than a timestamp:
the value under test is the fill, and integer ticks hash identically
across engines without timezone/precision ceremony.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_etl_spark.operators.timeseries import resample_linear, resample_locf
from hedera_etl_spark.queries import query
from hedera_etl_spark.tables import load_table

_INTERVAL = 3600  # hourly ticks over the events span

# shared oracle scaffolding: per-user observations at epoch-second
# resolution, the tick grid, and their union.  ``is_tick`` orders the
# observation BEFORE a tick at the same instant (the tie rule: a tick ON
# an observation reproduces it exactly).
_TS_BASE = f"""
    o AS (
      -- one observation per (user, second): ties collapse to MAX so the
      -- series is a function of time and the window fill is order-free
      SELECT user_id, epoch_ns(ts) // 1000000000 AS t,
             MAX(CAST(value AS DOUBLE)) AS v, 0 AS is_tick
      FROM events GROUP BY 1, 2
    ),
    rng AS (
      SELECT user_id, MIN(t) // {_INTERVAL} * {_INTERVAL} AS lo, MAX(t) AS hi
      FROM o GROUP BY user_id
    ),
    ticks AS (
      SELECT user_id, unnest(generate_series(lo, hi, {_INTERVAL})) AS t,
             CAST(NULL AS DOUBLE) AS v, 1 AS is_tick
      FROM rng
    ),
    u AS (SELECT * FROM o UNION ALL SELECT * FROM ticks)
"""


@query(
    "ts_gapfill_locf",
    f"""
    WITH {_TS_BASE},
    f AS (
      SELECT user_id, t, is_tick,
             last_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_tick
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fill
      FROM u
    )
    SELECT user_id, CAST(t AS BIGINT) AS tick_sec, fill AS value
    FROM f WHERE is_tick = 1
    ORDER BY user_id, tick_sec
    """,
    tags=("timeseries", "gapfill", "locf", "window"),
    # Driver-green r14; parked r15 (slot ceded to the r11-stale cohort):
    # ts_gapfill_linear (IN r15) drives the same union relation, keyed
    # IGNORE-NULLS window and tie rule through the driver; the LOCF carry
    # value is pinned in test_timeseries.py; local oracle each round.
    driver_visible=False,
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LOCF gap-fill onto an hourly grid: one aggregate for the per-key
    range, map-side sequence explode for the ticks, one keyed window
    shared by grid and observations (operators/timeseries.resample_locf).
    The carried value passes through un-recomputed, so the hash needs no
    float discipline at all."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("ts_ns div 1000000000").alias("tsec"), "value")
        # collapse same-second ties to MAX: the fill must be a function
        # of (user, tick), not of nondeterministic within-tie order
        .groupBy("user_id", "tsec")
        .agg(F.max(F.col("value").cast("double")).alias("value"))
    )
    out = resample_locf(ev, "user_id", "tsec", "value", _INTERVAL)
    return out.select(
        "user_id",
        F.col("tick_ts").cast("long").alias("tick_sec"),
        "value",
    ).orderBy("user_id", "tick_sec")


@query(
    "ts_gapfill_linear",
    f"""
    WITH {_TS_BASE},
    f AS (
      SELECT user_id, t, is_tick,
             last_value(CASE WHEN is_tick = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_tick
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
             last_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_tick
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
             first_value(CASE WHEN is_tick = 0 THEN t END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_tick
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
             first_value(v IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY t, is_tick
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
      FROM u
    )
    SELECT user_id, CAST(t AS BIGINT) AS tick_sec,
           CAST(floor(
             CASE WHEN pt IS NULL OR nt IS NULL THEN NULL
                  WHEN nt = pt THEN pv
                  ELSE pv + (nv - pv) * (t - pt) / (nt - pt)
             END * CAST(1000000 AS DOUBLE)) AS BIGINT) AS value_u
    FROM f WHERE is_tick = 1
    ORDER BY user_id, tick_sec
    """,
    tags=("timeseries", "gapfill", "lerp", "window"),
    # rotated back IN r15 (VERDICT r14 #1 — r11-stale cohort).
    )
def ts_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation gap-fill: bracketing observations via running
    last/first over the shared keyed window, exact lerp between them, no
    extrapolation past either end (operators/timeseries.resample_linear).
    The lerp is mirrored op-for-op in the oracle (each step one
    correctly-rounded IEEE double op, verified bit-identical), and the
    hash canon is ``floor(value * 1e6)`` micro-units: a floor of a
    bit-identical product is immune to the engines' double->DECIMAL
    rounding-mode divergence (Spark HALF_UP via BigDecimal vs DuckDB's
    multiply-then-round ties — observed flipping exact .5e-6 cases)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.expr("ts_ns div 1000000000").alias("tsec"), "value")
        # collapse same-second ties to MAX: the fill must be a function
        # of (user, tick), not of nondeterministic within-tie order
        .groupBy("user_id", "tsec")
        .agg(F.max(F.col("value").cast("double")).alias("value"))
    )
    out = resample_linear(ev, "user_id", "tsec", "value", _INTERVAL)
    return out.select(
        "user_id",
        F.col("tick_ts").cast("long").alias("tick_sec"),
        F.floor(F.col("value") * F.lit(1000000.0)).cast("long").alias("value_u"),
    ).orderBy("user_id", "tick_sec")


# ---------------------------------------------------------------------------
# table profiler (operators/profile.py) — exact mode over hash-portable
# statistic kinds.  The profile's doubles (mean/stddev/approx quantiles,
# Python-rounded null_frac) are excluded from the hashed projection:
# distributed double sums are order-dependent and percentile_approx is a
# sketch, neither is cross-engine canon.  What IS hashed pins the
# one-pass shape end-to-end: row counts, null accounting, exact
# cardinalities, and string-rendered integer/string ranges.
# ---------------------------------------------------------------------------
_PROFILE_ORACLE = """
    WITH a AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nid,
             CAST(COUNT(DISTINCT event_id) AS BIGINT) AS did,
             CAST(MIN(event_id) AS VARCHAR) AS mnid,
             CAST(MAX(event_id) AS VARCHAR) AS mxid,
             CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nuid,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS duid,
             CAST(MIN(user_id) AS VARCHAR) AS mnuid,
             CAST(MAX(user_id) AS VARCHAR) AS mxuid,
             CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nty,
             CAST(COUNT(DISTINCT event_type) AS BIGINT) AS dty,
             CAST(MIN(event_type) AS VARCHAR) AS mnty,
             CAST(MAX(event_type) AS VARCHAR) AS mxty
      FROM events
    )
    SELECT 'event_id' AS "column", 'bigint' AS dtype, n_rows,
           nid AS n_nulls, did AS approx_distinct, mnid AS "min", mxid AS "max"
    FROM a
    UNION ALL
    SELECT 'event_type', 'string', n_rows, nty, dty, mnty, mxty FROM a
    UNION ALL
    SELECT 'user_id', 'bigint', n_rows, nuid, duid, mnuid, mxuid FROM a
    ORDER BY "column"
"""


@query(
    "llm_profile",  # rotated into the driver window r7
    _PROFILE_ORACLE,
    tags=("profile", "stats", "aggregate"),
        # profile_table is EAGER (one aggregate collect + driver-side
    # unpivot); caching its local-DataFrame result would freeze a
    # materialization, same rule as the streaming entries.
    cache_plan=False,
)
def llm_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass table profile (operators/profile.profile_table,
    exact=True) over the events id/type columns: every statistic is an
    aggregate expression in ONE scan + one one-row shuffle; the tidy
    unpivot is driver-side, bounded by column count.  Hashed projection
    excludes the order-dependent doubles (see module comment)."""
    from hedera_etl_spark.operators.profile import profile_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    prof = profile_table(ev, exact=True)
    return prof.select(
        "column", "dtype", "n_rows", "n_nulls", "approx_distinct", "min", "max"
    ).orderBy("column")
