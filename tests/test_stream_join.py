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


def test_session_window_runs_under_real_streaming(spark, tmp_path):
    """ST6: the session_window aggregation (q18's expression) executes
    under Structured Streaming with a watermark — two micro-batches, late
    rows within the watermark merge into their session."""
    import json

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    base = 1_600_000_000_000_000  # µs
    MIN = 60_000_000

    def write(name, rows):
        (src / name).write_text("\n".join(json.dumps(r) for r in rows))

    # batch 1: user 1 has two events 10 min apart (one session), user 2 one
    write("b1.json", [
        {"u": 1, "ts_us": base, "v": 1},
        {"u": 1, "ts_us": base + 10 * MIN, "v": 2},
        {"u": 2, "ts_us": base, "v": 5},
    ])

    stream = (
        spark.readStream.schema("u LONG, ts_us LONG, v LONG").json(str(src))
        .withColumn("ts", F.expr("timestamp_micros(ts_us)"))
    )
    agg = (
        stream.withWatermark("ts", "2 hours")
        .groupBy("u", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("sess_out").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    # batch 2: a row 20 min after user 1's last -> extends the SAME session
    write("b2.json", [{"u": 1, "ts_us": base + 30 * MIN, "v": 3}])
    q = (
        agg.writeStream.outputMode("complete").format("memory")
        .queryName("sess_out").option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()

    rows = spark.table("sess_out").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["u"], []).append((r["n"], r["total"]))
    assert by_user[1] == [(3, 6)]   # one merged session across batches
    assert by_user[2] == [(1, 5)]
