"""applyInPandasWithState operator: state evolves across micro-batches
and survives a checkpointed restart."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hedera_etl_spark.streaming.stateful import user_activity_stream

SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts_us", T.LongType()),
    ]
)


def run_stream(spark, input_dir, ckpt, out_dir):
    """foreachBatch parquet sink: supports checkpoint recovery (the
    memory sink does not)."""
    stream = spark.readStream.schema(SCHEMA).parquet(str(input_dir))

    def sink(batch_df, batch_id):
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            str(out_dir)
        )

    q = (
        user_activity_stream(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", str(ckpt))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snaps = spark.read.parquet(str(out_dir))
    # latest snapshot per user = the one from the highest batch
    latest = snaps.groupBy("user_id").agg(
        F.max_by("n_events", "batch_id").alias("n_events"),
        F.max_by("last_us", "batch_id").alias("last_us"),
        F.max("batch_id").alias("last_batch"),
    )
    return latest


def test_state_accumulates_across_restarts(spark, tmp_path):
    input_dir = tmp_path / "in"
    ckpt = tmp_path / "ckpt"
    out_dir = tmp_path / "out"
    rows1 = [(1, 100), (1, 200), (2, 50)]
    spark.createDataFrame(rows1, SCHEMA).write.mode("append").parquet(str(input_dir))
    out1 = run_stream(spark, input_dir, ckpt, out_dir)
    snap1 = {r["user_id"]: (r["n_events"], r["last_us"]) for r in out1.collect()}
    assert snap1 == {1: (2, 200), 2: (1, 50)}

    # second run, same checkpoint: state picks up where it left off
    rows2 = [(1, 500), (3, 10)]
    spark.createDataFrame(rows2, SCHEMA).write.mode("append").parquet(str(input_dir))
    out2 = run_stream(spark, input_dir, ckpt, out_dir)
    rows = {r["user_id"]: r for r in out2.collect()}
    assert (rows[1]["n_events"], rows[1]["last_us"]) == (3, 500)  # 2 prior + 1 new
    assert (rows[3]["n_events"], rows[3]["last_us"]) == (1, 10)
    # untouched key did NOT re-emit in the second run (update mode):
    # its latest snapshot is still from an earlier batch
    assert rows[2]["last_batch"] < rows[1]["last_batch"]
    assert (rows[2]["n_events"], rows[2]["last_us"]) == (1, 50)
