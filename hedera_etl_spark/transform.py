"""Batch JSON -> typed rows: the ingest transform (P1-P4).

Spark-native port of the reference's only per-row code
(TransactionJsonToTableRow.java:51-66) plus the error routing of
BigQueryErrorsSink.java:49-91 — expressed entirely with from_json /
cast / to_json built-ins (no Python in the row path):

1. ``from_json`` with the all-string wire schema (see schema.py: protobuf
   JSON carries int64 as strings) in PERMISSIVE mode with a corrupt-record
   column — malformed JSON yields a captured raw line instead of an
   exception (the Spark form of the IllegalArgumentException counter at
   TransactionJsonToTableRow.java:61-65).
2. A cast-expression tree generated from TRANSACTIONS_SPEC turns the
   string leaves into the typed schema: INTEGER -> try_cast(long)
   (lossless for int64 > 2^53 since the text never transits a double),
   BYTES -> unbase64, null structs stay null.  Unknown JSON fields never
   appear (from_json drops them — the ignoreUnknownValues() semantics of
   PubSubToBigQueryPipeline.java:46).
3. consensusTimestampTruncated = timestamp_micros(consensusTimestamp div
   1000) — the nanos->micros derivation and DAY-partition key
   (TransactionJsonToTableRow.java:57-58).
4. The valid/invalid split returns (typed rows, errors-shaped rows):
   errors carry (table_row, errors) JSON strings exactly like
   errors-schema.json:1-12.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.schema import (
    CORRUPT_COL,
    TRANSACTIONS_SPEC,
    parse_schema,
)


# ---------------------------------------------------------------------------
# spec-driven cast tree (wire strings -> typed)
# ---------------------------------------------------------------------------
#: strict base64: 4-char groups with valid tail padding — anything else
#: would make unbase64 fail the TASK (there is no try_unbase64)
_BASE64_RE = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"


def _cast_leaf(col: Column, ftype: str) -> Column:
    if ftype == "INTEGER":
        # try_cast: a non-numeric string nulls the field instead of failing
        # the job under ANSI mode (BigQuery would reject the row; field-level
        # nulling is the lenient-projection analogue)
        return col.try_cast("long")
    if ftype == "BYTES":
        # malformed base64 nulls the field instead of killing the job
        return F.when(col.rlike(_BASE64_RE), F.unbase64(col))
    if ftype == "TIMESTAMP":
        return col.try_cast("timestamp")
    return col  # STRING


def _cast_field(col: Column, spec: dict) -> Column:
    if spec["type"] != "RECORD":
        return _cast_leaf(col, spec["type"])
    if spec.get("mode") == "REPEATED":
        # the same null-stays-null guard as the plain-record branch below:
        # without it a NULL array ELEMENT would cast to a non-null struct
        # of all-NULL fields
        return F.transform(
            col,
            lambda x: F.when(
                x.isNotNull(),
                F.struct(
                    *[
                        _cast_field(x[f["name"]], f).alias(f["name"])
                        for f in spec["fields"]
                    ]
                ),
            ),
        )
    inner = F.struct(
        *[_cast_field(col[f["name"]], f).alias(f["name"]) for f in spec["fields"]]
    )
    # a missing/null record stays null instead of becoming a struct of nulls
    return F.when(col.isNotNull(), inner)


def cast_to_table(parsed: DataFrame, spec: list[dict] | None = None) -> DataFrame:
    """Project the all-string parsed struct columns to the typed schema."""
    spec = spec or TRANSACTIONS_SPEC
    return parsed.select(
        *[_cast_field(F.col(f["name"]), f).alias(f["name"]) for f in spec]
    )


# ---------------------------------------------------------------------------
# the transform entry point
# ---------------------------------------------------------------------------
def corrupt_predicate(parsed_col: str = "__p") -> Column:
    """True for rows the wire parse failed on — the single definition of
    'invalid' shared by the batch and streaming ingest paths (they had
    drifted copies)."""
    return F.col(f"{parsed_col}.{CORRUPT_COL}").isNotNull() | F.col(parsed_col).isNull()


def errors_projection(raw_col: Column) -> list[Column]:
    """The errors-table row shape (errors-schema.json:1-12): the offending
    raw line plus a JSON error object — shared by batch and streaming."""
    return [
        raw_col.alias("table_row"),
        F.to_json(
            F.struct(
                F.lit("PARSE_ERROR").alias("reason"),
                F.lit("malformed JSON (TransactionJsonToTableRow.java:61-65 analogue)").alias(
                    "message"
                ),
            )
        ).alias("errors"),
    ]


def parse_transactions(
    raw: DataFrame, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """JSON lines -> (typed transactions rows, errors rows).

    Returns two DataFrames computed from one pass over ``raw``:
    valid rows in the typed TRANSACTIONS_SCHEMA with the derived
    consensusTimestampTruncated; invalid rows shaped like the errors table
    (table_row = the offending line, errors = a JSON error object).

    Note on the valid/errors split: both branches reference the same
    ``from_json`` expression; an A/B with an exchange barrier after the
    parse (forcing single evaluation) measured SLOWER than re-evaluating
    the parse per branch — shuffling the wide parsed struct costs more
    than tokenizing the JSON again — so the split deliberately stays
    exchange-free.  The streaming path materializes the batch once via
    persist() anyway (streaming/ingest.py).
    """
    wire = parse_schema()
    parsed = raw.select(
        F.col(value_col).alias("__raw"),
        F.from_json(
            F.col(value_col),
            wire,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__p"),
    )

    is_bad = corrupt_predicate("__p")

    errors = parsed.filter(is_bad).select(*errors_projection(F.col("__raw")))

    typed = cast_to_table(parsed.filter(~is_bad).select("__p.*"))
    # integer div, never float: 1.57e18 nanos does not survive a double
    typed = typed.withColumn(
        "consensusTimestampTruncated",
        F.expr("timestamp_micros(consensusTimestamp div 1000)"),
    )
    return typed, errors
