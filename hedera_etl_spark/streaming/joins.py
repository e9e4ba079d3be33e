"""Watermarked stream-stream joins.

The reference never joins two streams (its one stream lands in BigQuery
and all joins happen there), but a training-data pipeline does: pairing a
document stream with a late-arriving labels/quality stream, or
transactions with a record-file stream.  Structured Streaming supports
this natively when BOTH sides carry watermarks and the join condition
bounds how far the sides can drift — that bound is what lets each side's
buffered state be evicted (state size ~ rate * window, independent of
stream lifetime).

Without the time-range condition Spark would have to buffer one side
forever (any future row might still match); with it, a row older than
``max_delay`` behind the other side's watermark can never match again and
is dropped from state.  This is the canonical scale-safe shape for
stream-stream equi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "1 hour",
    watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Join two STREAMING DataFrames on ``on`` with bounded state.

    Both sides get a ``watermark`` on their event-time column; the join
    adds the time-range predicate
    ``right_ts BETWEEN left_ts - max_delay AND left_ts + max_delay``
    so the state store evicts rows once the opposite watermark passes
    their match horizon.  ``how`` supports inner and left_outer /
    right_outer (outer rows emit with nulls only after the watermark
    proves no match can arrive — Spark's documented semantics).

    Column conflicts: every right column except the key is suffixed
    ``_r`` so downstream code can address both sides.
    """
    if how not in ("inner", "left_outer", "right_outer"):
        raise ValueError(f"unsupported stream-stream join type: {how!r}")

    lw = left.withWatermark(left_ts, watermark)
    renames = {c: f"{c}_r" for c in right.columns if c != on}
    rw = right
    for old, new in renames.items():
        rw = rw.withColumnRenamed(old, new)
    rw = rw.withWatermark(renames.get(right_ts, right_ts), watermark)

    rts = renames.get(right_ts, right_ts)
    cond = (
        (lw[on] == rw[on])
        & (F.col(rts) >= F.expr(f"{left_ts} - INTERVAL {max_delay}"))
        & (F.col(rts) <= F.expr(f"{left_ts} + INTERVAL {max_delay}"))
    )
    joined = lw.join(rw, cond, how)
    # outer rows carry the key only on their own side — coalesce before
    # dropping, or a right_outer row would surface with a NULL key
    return (
        joined.withColumn("__key", F.coalesce(lw[on], rw[on]))
        .drop(lw[on])
        .drop(rw[on])
        .withColumnRenamed("__key", on)
    )
