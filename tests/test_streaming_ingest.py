"""Streaming ingest pipeline tests (SURVEY §7 step 4): feed JSON files
incrementally with injected duplicates and corrupt lines; assert the
transactions table, the errors table, checkpoint-backed restart dedup,
and the observability counters (ST7).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.streaming.ingest import IngestPipeline


def tx_line(i: int, ns_base: int = 1_570_800_000_000_000_000) -> str:
    return json.dumps(
        {
            "consensusTimestamp": ns_base + i * 1_000_000_000,
            "transactionType": 7 + i % 21,
            "transaction": {"body": {"transactionFee": str(100 + i), "memo": f"m{i}"}},
        }
    )


@pytest.fixture()
def dirs(tmp_path):
    d = {
        "input": tmp_path / "in",
        "table": str(tmp_path / "table"),
        "errors": str(tmp_path / "errors"),
        "ckpt": str(tmp_path / "ckpt"),
    }
    d["input"].mkdir()
    return d


def make_pipeline(spark, dirs, **kw):
    return IngestPipeline(
        spark, str(dirs["input"]), dirs["table"], dirs["errors"], dirs["ckpt"], **kw
    )


def test_ingest_valid_and_corrupt_split(spark, dirs):
    lines = [tx_line(i) for i in range(20)]
    corrupt = ['{"consensusTimestamp":157080, truncated', "not json at all"]
    (dirs["input"] / "f1.json").write_text("\n".join(lines + corrupt))

    metrics = make_pipeline(spark, dirs).run_to_completion()

    table = spark.read.parquet(dirs["table"])
    errors = spark.read.parquet(dirs["errors"])
    assert table.count() == 20
    assert errors.count() == 2
    assert metrics.valid_rows == 20 and metrics.error_rows == 2
    # typed fields landed: quoted int64 fee cast, partition col derived
    fees = {r["transactionFee"] for r in
            table.select("transaction.body.transactionFee").collect()}
    assert fees == {100 + i for i in range(20)}
    assert table.select("part_date").distinct().count() >= 1
    assert {r["table_row"] for r in errors.select("table_row").collect()} == set(corrupt)


def test_in_stream_dedup_within_run(spark, dirs):
    """Replayed deliveries inside one run collapse via watermark +
    dropDuplicates on the key (the Pub/Sub idAttribute analogue, ST2)."""
    lines = [tx_line(i) for i in range(10)]
    replays = [tx_line(i) for i in range(0, 10, 2)]
    (dirs["input"] / "f1.json").write_text("\n".join(lines + replays))

    make_pipeline(spark, dirs).run_to_completion()
    table = spark.read.parquet(dirs["table"])
    assert table.count() == 10
    assert table.select("consensusTimestamp").distinct().count() == 10


def test_dedup_state_survives_restart(spark, dirs):
    """ST1: the checkpoint carries the dedup state across restarts — a
    redelivery arriving in a later run (new pipeline object, same
    checkpoint) is still dropped."""
    (dirs["input"] / "f1.json").write_text("\n".join(tx_line(i) for i in range(10)))
    make_pipeline(spark, dirs).run_to_completion()

    # second run: 5 replays + 5 new rows
    (dirs["input"] / "f2.json").write_text(
        "\n".join([tx_line(i) for i in range(5)] + [tx_line(i) for i in range(10, 15)])
    )
    metrics = make_pipeline(spark, dirs).run_to_completion()

    table = spark.read.parquet(dirs["table"])
    assert table.count() == 15
    assert table.select("consensusTimestamp").distinct().count() == 15
    assert metrics.valid_rows == 5  # only the genuinely new rows landed


def test_errors_never_dedup_to_nothing(spark, dirs):
    """Distinct malformed lines must each reach the errors table even
    though they all lack an event timestamp."""
    corrupt = [f'{{"consensusTimestamp":bad_{i}' for i in range(5)]
    (dirs["input"] / "f1.json").write_text("\n".join(corrupt))
    metrics = make_pipeline(spark, dirs).run_to_completion()
    assert spark.read.parquet(dirs["errors"]).count() == 5
    assert metrics.error_rows == 5
    assert metrics.valid_rows == 0
    # the table got no rows (an empty append may still create the dir)
    if os.path.exists(dirs["table"]):
        files = [f for f in os.listdir(dirs["table"]) if f.startswith("part_date=")]
        assert files == []


def test_metrics_history_per_batch(spark, dirs):
    (dirs["input"] / "f1.json").write_text("\n".join(tx_line(i) for i in range(7)))
    metrics = make_pipeline(spark, dirs).run_to_completion()
    assert metrics.batches >= 1
    assert sum(h["valid"] for h in metrics.history) == 7
    assert metrics.latest_event_ts is not None


def test_dedupe_disabled_passthrough(spark, dirs):
    """dedupe_in_stream=False: at-least-once ingest keeps replays (the
    downstream DedupeJob heals them — the reference's two-tier design)."""
    lines = [tx_line(i) for i in range(6)] + [tx_line(0)]
    (dirs["input"] / "f1.json").write_text("\n".join(lines))
    make_pipeline(spark, dirs, dedupe_in_stream=False).run_to_completion()
    table = spark.read.parquet(dirs["table"])
    assert table.count() == 7
    assert table.select("consensusTimestamp").distinct().count() == 6


def test_late_event_lands_instead_of_vanishing(spark, dirs):
    """ADVICE regression: an event whose time is far behind the advanced
    watermark must still land in the table (possibly un-deduplicated) —
    plain dropDuplicates would silently discard it.  At-least-once with
    downstream DedupeJob healing is the two-tier contract."""
    base = 1_570_800_000_000_000_000
    # run 1: events 2h ahead advance the watermark well past `base`
    ahead = [tx_line(i, ns_base=base + 2 * 3600 * 1_000_000_000) for i in range(5)]
    (dirs["input"] / "f1.json").write_text("\n".join(ahead))
    make_pipeline(spark, dirs).run_to_completion()

    # run 2 (same checkpoint): one event at `base` — over an hour late
    (dirs["input"] / "f2.json").write_text(tx_line(0, ns_base=base))
    metrics = make_pipeline(spark, dirs).run_to_completion()

    table = spark.read.parquet(dirs["table"])
    assert metrics.valid_rows == 1  # the late row landed
    assert table.count() == 6
    late_ns = {r[0] for r in table.select("consensusTimestamp").collect()}
    assert base in late_ns


def test_rate_source_through_same_pipeline(spark, dirs):
    """S1 source swap, executed: the SAME transform + sinks run from a
    rate-micro-batch source (a second Spark streaming source standing in
    for Kafka/PubSub — swapping requires only the reader, proving the
    'one reader' claim in the module docstring)."""
    import json as _json

    def rate_source(s):
        raw = (
            s.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 10)
            .option("startTimestamp", 0)
            .load()
        )
        # shape rate rows into the wire JSON; every 7th row malformed
        doc = F.to_json(
            F.struct(
                (F.col("value") * 1_000_000_000 + 1_570_800_000_000_000_000)
                .cast("string")
                .alias("consensusTimestamp"),
                (F.col("value") % 21 + 7).cast("string").alias("transactionType"),
                F.struct(
                    F.struct(
                        (F.col("value") * 10).cast("string").alias("transactionFee"),
                        F.concat(F.lit("r"), F.col("value")).alias("memo"),
                    ).alias("body")
                ).alias("transaction"),
            )
        )
        return raw.select(
            F.when(F.col("value") % 7 == 6, F.substring(doc, 1, 30))
            .otherwise(doc)
            .alias("value")
        )

    pipe = IngestPipeline(
        spark,
        str(dirs["input"]),  # unused: source_fn wins
        dirs["table"],
        dirs["errors"],
        dirs["ckpt"],
        source_fn=rate_source,
    )
    q = pipe.start(available_now=False)
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline and pipe.metrics.batches < 2:
            time.sleep(1)
    finally:
        q.stop()
    assert pipe.metrics.batches >= 2
    assert pipe.metrics.valid_rows >= 10
    assert pipe.metrics.error_rows >= 1
    table = spark.read.parquet(dirs["table"])
    # typed wire fields parsed from the rate-shaped JSON
    fees = {r[0] for r in table.select("transaction.body.transactionFee").collect()}
    assert 0 in fees and 10 in fees


def test_ingest_delay_metric_recorded(spark, dirs):
    """ST7: the end-to-end lag gauge (batch wall time minus newest event
    time) is recorded per batch and on the aggregate metrics object."""
    (dirs["input"] / "f1.json").write_text("\n".join(tx_line(i) for i in range(3)))
    metrics = make_pipeline(spark, dirs).run_to_completion()
    assert metrics.ingest_delay_sec is not None
    # fixture events are dated 2019 -> delay is huge and positive
    assert metrics.ingest_delay_sec > 0
    assert any(h["ingest_delay_sec"] for h in metrics.history)
