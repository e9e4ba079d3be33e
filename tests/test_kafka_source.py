"""Kafka source branch (S1 message-bus parity, reference
PubSubToBigQueryPipeline.java:39-41) — option wiring and value-parse
projection tested without a broker: the options builder is pure, and the
projection applies identically to a batch DataFrame with Kafka's frame
schema.
"""

from __future__ import annotations

import pytest

from hedera_etl_spark.streaming.sources import (
    kafka_source,
    kafka_source_options,
    kafka_value_projection,
    rate_json_source,
)


def test_options_subscribe_list_and_backpressure():
    opts = kafka_source_options(
        "b1:9092,b2:9092",
        ["tx", "tx2"],
        starting_offsets="latest",
        max_offsets_per_trigger=1_000_000,
    )
    assert opts == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "tx,tx2",
        "startingOffsets": "latest",
        "failOnDataLoss": "true",
        "maxOffsetsPerTrigger": "1000000",
    }


def test_options_assign_serializes_to_kafka_json():
    opts = kafka_source_options("b:9092", assign={"tx": [0, 1, 2]})
    assert opts["assign"] == '{"tx": [0, 1, 2]}'
    assert "subscribe" not in opts and "subscribePattern" not in opts


def test_options_pattern_and_extra_passthrough():
    opts = kafka_source_options(
        "b:9092",
        subscribe_pattern="tx-.*",
        fail_on_data_loss=False,
        extra={"kafka.security.protocol": "SSL"},
    )
    assert opts["subscribePattern"] == "tx-.*"
    assert opts["failOnDataLoss"] == "false"
    assert opts["kafka.security.protocol"] == "SSL"


def test_options_require_exactly_one_subscription_mode():
    with pytest.raises(ValueError):
        kafka_source_options("b:9092")
    with pytest.raises(ValueError):
        kafka_source_options("b:9092", "tx", subscribe_pattern="tx-.*")
    # eager validation at factory construction, before any Spark call
    with pytest.raises(ValueError):
        kafka_source("b:9092")


def test_value_projection_decodes_kafka_frame(spark):
    """The projection applied to a batch frame with Kafka's schema
    (key/value binary + metadata) yields the ingest contract: one string
    ``value`` column, UTF-8 decoded."""
    raw = spark.createDataFrame(
        [(b"k1", b'{"consensusTimestamp": "1"}', "tx", 0, 0, None)],
        "key binary, value binary, topic string, partition int, offset long, "
        "timestamp timestamp",
    )
    out = kafka_value_projection(raw)
    assert out.columns == ["value"]
    assert dict(out.dtypes)["value"] == "string"
    assert out.collect()[0]["value"] == '{"consensusTimestamp": "1"}'


def test_rate_json_source_runs_ingest_end_to_end(spark, tmp_path):
    """The rate twin of the Kafka factory drives the real pipeline: same
    contract (string ``value``), valid JSON rows land in the table."""
    from hedera_etl_spark.streaming.ingest import IngestPipeline

    pipe = IngestPipeline(
        spark,
        str(tmp_path / "unused_input"),
        str(tmp_path / "table"),
        str(tmp_path / "errors"),
        str(tmp_path / "ckpt"),
        source_fn=rate_json_source(rows_per_second=50),
    )
    q = pipe.start(available_now=False)
    try:
        import time

        deadline = time.time() + 120
        while time.time() < deadline and pipe.metrics.valid_rows < 5:
            time.sleep(1)
    finally:
        q.stop()
    assert pipe.metrics.valid_rows >= 5
    assert pipe.metrics.error_rows == 0
    table = spark.read.parquet(str(tmp_path / "table"))
    assert table.filter("consensusTimestamp IS NOT NULL").count() >= 5


def test_cli_kafka_flags_build_the_source():
    """CLI wiring: --kafka-* flags construct a kafka source_fn with the
    right options (validated eagerly, no broker needed) and are mutually
    exclusive with --input-dir."""
    import pytest as _pytest

    from hedera_etl_spark.cli import build_parser

    parser = build_parser()
    args = parser.parse_args([
        "ingest", "--kafka-bootstrap-servers", "b:9092", "--kafka-topic", "tx,tx2",
        "--transactions-table", "t", "--errors-table", "e", "--checkpoint", "c",
        "--kafka-max-offsets-per-trigger", "5000",
    ])
    assert args.kafka_bootstrap_servers == "b:9092"
    opts = kafka_source_options(
        args.kafka_bootstrap_servers,
        args.kafka_topic.split(","),
        starting_offsets=args.kafka_starting_offsets,
        max_offsets_per_trigger=args.kafka_max_offsets_per_trigger,
    )
    assert opts["subscribe"] == "tx,tx2"
    assert opts["maxOffsetsPerTrigger"] == "5000"
    with _pytest.raises(SystemExit):
        parser.parse_args([
            "ingest", "--input-dir", "d", "--kafka-bootstrap-servers", "b:9092",
            "--transactions-table", "t", "--errors-table", "e", "--checkpoint", "c",
        ])
