"""Streaming source factories for the ingest pipeline (S1).

The reference's source is Pub/Sub with broker-side id-attribute dedup
(PubSubToBigQueryPipeline.java:39-41).  The engine's ``IngestPipeline``
accepts any ``source_fn`` producing a streaming DataFrame with a string
``value`` column; this module ships the message-bus branch for Kafka —
the self-hosted analogue of Pub/Sub — as such a factory.

Design notes:

- ``kafka_source_options`` is a PURE function (dict in, dict out) so the
  option wiring is unit-testable without a broker or the
  spark-sql-kafka connector JAR on the classpath.
- ``kafka_value_projection`` is the parse step applied to the raw Kafka
  frame (key/value binary, topic/partition/offset/timestamp metadata) —
  also applied to batch DataFrames in tests, since the projection is
  identical in both modes.
- Broker-side dedup parity: Kafka has no idAttribute; the pipeline's own
  arrival-time ``dropDuplicatesWithinWatermark`` (streaming/ingest.py)
  provides the same best-effort processing-time dedup window, so no
  source-side knob is needed.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_source_options(
    bootstrap_servers: str,
    subscribe: str | list[str] | None = None,
    *,
    subscribe_pattern: str | None = None,
    assign: dict[str, list[int]] | None = None,
    starting_offsets: str = "earliest",
    fail_on_data_loss: bool = True,
    max_offsets_per_trigger: int | None = None,
    extra: dict[str, str] | None = None,
) -> dict[str, str]:
    """Build the option map for ``spark.readStream.format("kafka")``.

    Exactly one of ``subscribe`` (topic or topic list),
    ``subscribe_pattern`` (regex) or ``assign`` (topic -> partition list,
    serialized to Kafka's JSON assign format) must be given.

    ``fail_on_data_loss=True`` is the at-least-once-preserving default:
    silently skipping aged-out offsets would violate the pipeline's
    delivery contract (the reference never drops messages either —
    BigQueryErrorsSink.java:63 alwaysRetry).  Set False only for
    exploratory reads.  ``max_offsets_per_trigger`` bounds micro-batch
    size — the backpressure knob for a 100 TB backlog replay, without
    which the first batch after a long stop is the entire topic.
    """
    chosen = [
        name
        for name, v in (
            ("subscribe", subscribe),
            ("subscribePattern", subscribe_pattern),
            ("assign", assign),
        )
        if v is not None
    ]
    if len(chosen) != 1:
        raise ValueError(
            f"exactly one of subscribe/subscribe_pattern/assign is required, got {chosen or 'none'}"
        )
    opts: dict[str, str] = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if subscribe is not None:
        opts["subscribe"] = (
            subscribe if isinstance(subscribe, str) else ",".join(subscribe)
        )
    if subscribe_pattern is not None:
        opts["subscribePattern"] = subscribe_pattern
    if assign is not None:
        opts["assign"] = json.dumps(assign, sort_keys=True)
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(int(max_offsets_per_trigger))
    opts.update(extra or {})
    return opts


def kafka_value_projection(raw: DataFrame) -> DataFrame:
    """Kafka frame -> the ingest contract: a string ``value`` column.

    Kafka delivers ``value`` as binary; the JSON payload is its UTF-8
    decode.  Kept as a named function (not inlined in the factory) so the
    projection is testable on a batch DataFrame with the same schema and
    can never drift from what the streaming path applies.
    """
    return raw.selectExpr("CAST(value AS STRING) AS value")


def kafka_source(
    bootstrap_servers: str,
    subscribe: str | list[str] | None = None,
    **kwargs,
):
    """Return a ``source_fn`` for ``IngestPipeline`` reading Kafka.

    Usage::

        IngestPipeline(spark, ..., source_fn=kafka_source(
            "broker1:9092,broker2:9092", "transactions",
            max_offsets_per_trigger=1_000_000))

    Requires the spark-sql-kafka connector on the session's classpath
    (``spark.jars.packages=org.apache.spark:spark-sql-kafka-0-10_2.13:<ver>``);
    the options are validated eagerly here so a bad wiring fails at
    construction, not first trigger.
    """
    opts = kafka_source_options(bootstrap_servers, subscribe, **kwargs)

    def source_fn(spark: SparkSession) -> DataFrame:
        return kafka_value_projection(
            spark.readStream.format("kafka").options(**opts).load()
        )

    return source_fn


def rate_json_source(rows_per_second: int = 100):
    """A self-contained load-generating source: the rate source shaped
    into JSON lines matching the ingest parse schema — the test/dev twin
    of the Kafka factory (same contract, zero infrastructure)."""

    def source_fn(spark: SparkSession) -> DataFrame:
        rate = spark.readStream.format("rate").option(
            "rowsPerSecond", str(int(rows_per_second))
        ).load()
        # wire format: protobuf JSON serializes int64 as STRINGS
        # (schema.parse_schema docstring) — cast both fields
        return rate.select(
            F.to_json(
                F.struct(
                    F.expr("CAST(unix_micros(timestamp) * 1000 + value AS STRING)").alias(
                        "consensusTimestamp"
                    ),
                    F.expr("CAST(value % 21 + 7 AS STRING)").alias("transactionType"),
                )
            ).alias("value")
        )

    return source_fn
