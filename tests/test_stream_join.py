"""Stream-stream join: two file-stream sources joined with watermarks and
a time-range bound (the scale-safe state-evicting shape)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.streaming.joins import stream_stream_join

BASE_US = 1_570_800_000_000_000


def _write(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows))


@pytest.fixture()
def sources(tmp_path):
    l, r = tmp_path / "left", tmp_path / "right"
    l.mkdir(); r.mkdir()
    return l, r


def _stream(spark, path, schema):
    return (
        spark.readStream.schema(schema).json(str(path))
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    )


def test_stream_stream_join_matches_within_bound(spark, sources, tmp_path):
    l_dir, r_dir = sources
    # left: doc events; right: quality labels, some within 1h, one 3h late
    _write(l_dir, "l.json", [
        {"k": 1, "ts_us": BASE_US, "text": "a"},
        {"k": 2, "ts_us": BASE_US + 60_000_000, "text": "b"},
        {"k": 3, "ts_us": BASE_US, "text": "c"},  # label too far away
    ])
    _write(r_dir, "r.json", [
        {"k": 1, "ts_us": BASE_US + 30 * 60_000_000, "score": 9},      # +30m: match
        {"k": 2, "ts_us": BASE_US + 50 * 60_000_000, "score": 7},      # +49m: match
        {"k": 3, "ts_us": BASE_US + 3 * 3600 * 1_000_000, "score": 1}, # +3h: out of bound
    ])

    left = _stream(spark, l_dir, "k LONG, ts_us LONG, text STRING")
    right = _stream(spark, r_dir, "k LONG, ts_us LONG, score LONG")
    joined = stream_stream_join(
        left, right, on="k", left_ts="ts", right_ts="ts_r",
        max_delay="1 hour", watermark="10 minutes",
    )

    q = (
        joined.writeStream.outputMode("append").format("memory")
        .queryName("ssj_out").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    rows = {(r["k"], r["score_r"]) for r in spark.table("ssj_out").collect()}
    assert rows == {(1, 9), (2, 7)}  # k=3 outside the time bound: no match


def test_stream_stream_join_rejects_full_outer_misuse(spark, sources):
    l_dir, r_dir = sources
    left = _stream(spark, l_dir, "k LONG, ts_us LONG, text STRING")
    right = _stream(spark, r_dir, "k LONG, ts_us LONG, score LONG")
    with pytest.raises(ValueError):
        stream_stream_join(left, right, on="k", left_ts="ts", right_ts="ts_r", how="full")


def test_right_outer_preserves_key_batch_mode(spark):
    """Review regression: an unmatched right row must surface with ITS
    key, not NULL (the key is coalesced across sides before the drop).
    Batch mode exercises the identical projection logic."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, 1000)], "k LONG, ts_us LONG"
    ).withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    right = spark.createDataFrame(
        [(1, 2000, 9), (5, 3000, 7)], "k LONG, ts_us LONG, score LONG"
    ).withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    out = stream_stream_join(
        left, right, on="k", left_ts="ts", right_ts="ts_r",
        max_delay="1 hour", how="right_outer",
    ).collect()
    got = {(r["k"], r["score_r"]) for r in out}
    assert got == {(1, 9), (5, 7)}  # k=5 unmatched but key preserved
