"""Pipeline-parity queries: the reference's own operator shapes, run as
registry entries so the driver's oracle validates them.

- JSON parse + schema projection (P1/P2: TransactionJsonToTableRow.java:51-66)
  demonstrated as a to_json -> from_json round trip whose oracle is DuckDB's
  JSON extraction over the identically constructed strings.
- The dedup pipeline end-to-end (A1+A2+J1) over a deterministically
  duplicated stream-shaped table, oracle = ROW_NUMBER()=1.
- A real Structured Streaming query (rows-only check: streaming semantics
  are not ANSI-SQL-expressible) exercising watermark + dropDuplicates (ST2).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hedera_etl_spark.queries import query
from hedera_etl_spark.queries.core import duped_events, _DUPED_EVENTS_SQL
from hedera_etl_spark.tables import load_table

DEC = "decimal(18,2)"


# ---------------------------------------------------------------------------
# P1/P2 — JSON -> typed row with lenient projection
# ---------------------------------------------------------------------------
_EVENT_JSON_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts_ns", T.LongType()),
    ]
)


@query(
    "hed_json_parse",
    """
    WITH raw AS (
      SELECT event_id AS orig_id,
             to_json(struct_pack(event_id := event_id, user_id := user_id,
                                 event_type := event_type, ts_ns := ts_ns,
                                 unknown_field := 'dropped')) AS payload
      FROM events
    )
    SELECT CAST(json_extract(payload, '$.event_id') AS BIGINT) AS event_id,
           CAST(json_extract(payload, '$.user_id') AS BIGINT) AS user_id,
           CAST(json_extract_string(payload, '$.event_type') AS VARCHAR) AS event_type,
           make_timestamp(CAST(json_extract(payload, '$.ts_ns') AS BIGINT) // 1000) AS ts_us
    FROM raw
    ORDER BY event_id
    """,
    tags=("json", "transform"),
)
def hed_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest transform P1/P2: parse a JSON payload with a declared
    schema — unknown fields silently dropped, exactly the
    ignoreUnknownValues() semantics of PubSubToBigQueryPipeline.java:46 —
    and derive the microsecond-truncated timestamp from int64 nanos
    (TransactionJsonToTableRow.java:57-58).  from_json is the JVM-side,
    codegen'd replacement for the reference's Jackson per-row function."""
    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.to_json(
            F.struct(
                "event_id",
                "user_id",
                "event_type",
                "ts_ns",
                F.lit("dropped").alias("unknown_field"),
            )
        ).alias("payload")
    )
    parsed = raw.select(F.from_json("payload", _EVENT_JSON_SCHEMA).alias("d")).select("d.*")
    return parsed.select(
        "event_id",
        "user_id",
        "event_type",
        F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP_NTZ)").alias("ts_us"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# ST4/A1/A2/J1 — the dedup pipeline end-to-end
# ---------------------------------------------------------------------------
@query(
    "hed_dedupe_pipeline",
    f"""
    WITH dups AS ({_DUPED_EVENTS_SQL}),
    deduped AS (
      SELECT event_id, ts, user_id, event_type, value
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY ingest_seq) rn
            FROM dups)
      WHERE rn = 1
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_keys,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS total_value
    FROM deduped
    """,
    tags=("dedup", "pipeline"),
    bench=True,
)
def hed_dedupe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup over a stream-shaped table with every 5th row
    duplicated (the reference integration test's generator pattern,
    TransactionsGenerator.java:70-81): detect via GROUP BY/HAVING, collapse
    via deterministic first-per-group, verify via invariant aggregates.
    Uses the same operators the DedupeJob drives (operators/dedupe.py)."""
    from hedera_etl_spark.operators.dedupe import collapse_duplicates, find_duplicates

    dups = duped_events(spark, sf_dir)
    # A1: detection runs first, as in AbstractDeduplication.java:109-116 —
    # the collapse is only triggered when duplicates exist.
    _ = find_duplicates(dups, "event_id")
    deduped = collapse_duplicates(dups, "event_id", ["ingest_seq"])
    return deduped.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_keys"),
        F.sum(F.col("value").cast(DEC)).cast("decimal(28,2)").alias("total_value"),
    )


# ---------------------------------------------------------------------------
# ST2 — streaming dedup with watermark (rows-only check)
# ---------------------------------------------------------------------------
@query(
    "hed_stream_dedup",
    None,  # streaming semantics: driver records a rows-only check
    tags=("streaming", "dedup"),
)
def hed_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real Structured Streaming micro-batch run: file source over the
    events parquet -> watermark + dropDuplicates on the unique key (the
    Spark-native form of Pub/Sub idAttribute dedup,
    PubSubToBigQueryPipeline.java:41) -> windowed count aggregate -> memory
    sink, driven to completion synchronously.  Returns the final result
    table; correctness of the same aggregate is hash-checked in batch mode
    by q16/q03."""
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/events.parquet")
        .withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", F.expr("timestamp_micros(ts_ns div 1000)"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .dropDuplicates(["event_id"])
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n")
    )
    name = f"hed_stream_dedup_{abs(hash(sf_dir)) % 10_000}"
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        result = spark.table(name).orderBy("window_start", "event_type")
        # materialize before the checkpoint dir disappears
        rows = result.collect()
    return spark.createDataFrame(rows, result.schema)
