"""Streaming ingest pipeline: JSON lines -> partitioned transactions table
+ dead-letter errors table.

The Spark form of the reference's entire first module
(PubSubToBigQueryPipeline.java:36-57 + BigQueryErrorsSink.java:49-91):

- S1 source: file-stream of JSON lines by default, or ANY streaming
  source via ``source_fn`` (a callable returning a streaming DataFrame
  with a ``value`` string column) — the "swap one reader" claim made
  executable.  The message-bus branch ships as
  ``streaming.sources.kafka_source`` (options builder + binary-value
  decode, broker-free tests in tests/test_kafka_source.py), the
  self-hosted analogue of the reference's Pub/Sub reader; tests also
  drive the identical transform+sinks from a rate source.  The reference's broker-side best-effort dedup
  (withIdAttribute("consensusTimestamp"),
  PubSubToBigQueryPipeline.java:41) becomes an in-stream
  ARRIVAL-time watermark + dropDuplicatesWithinWatermark on the parsed
  key (ST2): bounded state, replayed deliveries collapse inside the
  horizon, and no row is ever classified late (arrival time is monotone
  per trigger) — an event whose EVENT time lags arbitrarily still lands
  in the table.  An event-time watermark here would silently discard
  late data (every stateful operator filters rows behind its watermark);
  at-least-once with downstream healing (the DedupeJob) is the
  reference's own two-tier contract, and losing late data would break
  it.  Malformed rows use the raw line as dedup key, so they pass the
  stateful operator untouched.
- S2 sink: checkpointed foreachBatch appending valid rows to the
  DAY-partitioned parquet table.  Checkpointing makes delivery
  at-least-once end to end (a crash between the append and the checkpoint
  commit replays the batch) — the same guarantee the reference chose, and
  the same healer: the downstream DedupeJob (ST3 two-tier design,
  docs/design/1_hedera_etl.md:109-125).
- S3 errors sink: the invalid branch of the same batch appends
  (table_row, errors) rows to the errors table — never dropped, mirroring
  alwaysRetry (BigQueryErrorsSink.java:63).
- ST7 observability: per-batch Observation metrics (valid rows, error
  rows, latest event timestamp, ingestion delay) accumulated on the
  driver — the Beam Counter/Distribution surface
  (TransactionJsonToTableRow.java:44-49, BigQueryErrorsSink.java:70-72).

Scale: the only state is the dedup operator's keyed store (bounded by the
watermark) and the file-source log; parse/cast/write are embarrassingly
parallel per batch.  Partition count of each append follows the source
batch; AQE coalescing keeps small micro-batches from writing confetti
files.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from hedera_etl_spark.schema import CORRUPT_COL, parse_schema
from hedera_etl_spark.transform import cast_to_table, corrupt_predicate, errors_projection


@dataclass
class IngestMetrics:
    """Driver-side mirror of the reference's counters/gauges."""

    batches: int = 0
    valid_rows: int = 0
    error_rows: int = 0
    latest_event_ts: object = None
    #: wall-clock seconds between batch processing time and the newest
    #: event time in it — the reference's end-to-end lag Distribution
    ingest_delay_sec: float | None = None
    history: list = field(default_factory=list)


class IngestPipeline:
    """File-stream JSON -> transactions table + errors table."""

    def __init__(
        self,
        spark: SparkSession,
        input_dir: str,
        table_path: str,
        errors_path: str,
        checkpoint_dir: str,
        watermark: str = "1 hour",
        dedupe_in_stream: bool = True,
        archive_path: str | None = None,
        source_fn=None,
    ):
        self.spark = spark
        self.input_dir = input_dir
        #: optional source swap (S1): any callable SparkSession -> streaming
        #: DataFrame with a `value` STRING column (Kafka: selectExpr
        #: "CAST(value AS STRING)"; rate: a JSON-shaping projection)
        self.source_fn = source_fn
        self.table_path = table_path
        self.errors_path = errors_path
        self.checkpoint_dir = checkpoint_dir
        self.watermark = watermark
        self.dedupe_in_stream = dedupe_in_stream
        #: optional raw-line cold archive (S5 — the stock
        #: Cloud_PubSub_to_GCS_Text side pipeline,
        #: scripts/deploy-etl-pipeline.sh:53-65)
        self.archive_path = archive_path
        self.metrics = IngestMetrics()

    # -- the streaming DAG ---------------------------------------------------
    def _stream(self) -> DataFrame:
        if self.source_fn is not None:
            raw = self.source_fn(self.spark)
        else:
            raw = self.spark.readStream.text(self.input_dir)
        parsed = raw.select(
            F.col("value"),
            F.from_json(
                "value",
                parse_schema(),
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("__p"),
        )
        if not self.dedupe_in_stream:
            return parsed
        # The dedup state is watermarked on ARRIVAL time, not event time.
        # An event-time watermark makes every stateful operator FILTER
        # rows older than the horizon — in continuous mode a late-arriving
        # event would silently vanish instead of landing in the table
        # (r2 ADVICE; dropDuplicatesWithinWatermark late-filters too).
        # Arrival time is monotone per trigger, so nothing is ever late:
        # every row passes, replayed deliveries collapse while their key
        # is inside the horizon, and state stays bounded by the watermark.
        # This is also the closer parity: Pub/Sub withIdAttribute
        # (PubSubToBigQueryPipeline.java:41) is itself a best-effort
        # ~10-minute PROCESSING-time dedup window.  Replays that outlive
        # the horizon pass through un-deduplicated — at-least-once, healed
        # by the downstream DedupeJob (ST3 two-tier design).
        keyed = parsed.select(
            "*",
            F.current_timestamp().alias("__arrival_ts"),
            F.coalesce(F.col("__p.consensusTimestamp"), F.col("value")).alias("__dedup_key"),
        )
        return (
            keyed.withWatermark("__arrival_ts", self.watermark)
            .dropDuplicatesWithinWatermark(["__dedup_key"])
            .drop("__dedup_key", "__arrival_ts")
        )

    # -- per-batch processing (S2/S3/P1-P4) ----------------------------------
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.persist()
        try:
            if self.archive_path is not None:
                # S5 cold archive: raw lines as text, before any parsing
                batch_df.select("value").write.mode("append").text(self.archive_path)
            # shared definition of 'invalid' with the batch path
            # (transform.corrupt_predicate) so the two can never drift
            is_bad = corrupt_predicate("__p")

            valid_obs = Observation(f"ingest_valid_{batch_id}")
            typed = cast_to_table(batch_df.filter(~is_bad).select("__p.*"))
            typed = (
                typed.withColumn(
                    "consensusTimestampTruncated",
                    F.expr("timestamp_micros(consensusTimestamp div 1000)"),
                )
                .withColumn("part_date", F.to_date("consensusTimestampTruncated"))
                # administrative column for the downstream DedupeJob's
                # window predicates (the reference's UNIX_SECONDS filter
                # column; `dedupe` scratch is the analogous precedent)
                .withColumn("ts_sec", F.expr("consensusTimestamp div 1000000000"))
            )
            typed = typed.observe(
                valid_obs,
                F.count(F.lit(1)).alias("rows"),
                F.max("consensusTimestampTruncated").alias("latest_ts"),
            )
            typed.write.mode("append").partitionBy("part_date").parquet(self.table_path)

            err_obs = Observation(f"ingest_errors_{batch_id}")
            errors = batch_df.filter(is_bad).select(
                *errors_projection(F.col("value"))
            )
            errors = errors.observe(err_obs, F.count(F.lit(1)).alias("rows"))
            errors.write.mode("append").parquet(self.errors_path)

            m = self.metrics
            v, e = valid_obs.get, err_obs.get
            m.batches += 1
            m.valid_rows += v["rows"]
            m.error_rows += e["rows"]
            delay = None
            if v["latest_ts"] is not None:
                if m.latest_event_ts is None or v["latest_ts"] > m.latest_event_ts:
                    m.latest_event_ts = v["latest_ts"]
                import datetime

                latest = v["latest_ts"]
                if latest.tzinfo is None:
                    # PySpark converts TimestampType to the DRIVER's local
                    # wall time (not the session TZ) — astimezone() on a
                    # naive datetime attaches the local zone, so the delta
                    # is correct on any host TZ
                    latest = latest.astimezone()
                delay = (
                    datetime.datetime.now(datetime.timezone.utc) - latest
                ).total_seconds()
                m.ingest_delay_sec = delay
            m.history.append(
                {
                    "batch_id": batch_id,
                    "valid": v["rows"],
                    "errors": e["rows"],
                    "ingest_delay_sec": delay,
                }
            )
        finally:
            batch_df.unpersist()

    # -- lifecycle -----------------------------------------------------------
    def start(self, available_now: bool = True) -> StreamingQuery:
        """Start the checkpointed query.  ``available_now=True`` processes
        everything currently in the input dir then stops (test/batch-drain
        mode); False runs continuously with the default micro-batch trigger
        (the reference's always-on Dataflow job)."""
        writer = (
            self._stream()
            .writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self) -> IngestMetrics:
        """Drain the input dir and wait (availableNow semantics)."""
        q = self.start(available_now=True)
        q.awaitTermination()
        return self.metrics
