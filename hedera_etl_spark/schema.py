"""The transactions data model — Spark transliteration of the reference's
BigQuery schemas.

``TRANSACTIONS_SPEC`` mirrors hedera-etl-bigquery/src/main/resources/
transactions-schema.json (403 lines) field-for-field: BigQuery INTEGER ->
LongType (int64 tinybars/nanos — never double), TIMESTAMP -> TimestampType
(µs precision, matching BigQuery), BYTES -> BinaryType (JSON carries
base64), RECORD -> StructType, mode REPEATED -> ArrayType(StructType).

Two StructTypes derive from the one spec:

- ``parse_schema()``  — the *wire* schema handed to ``from_json``: every
  leaf is StringType.  Protobuf's JSON mapping serializes int64 as JSON
  *strings* ("transactionFee": "500000000") but int32 as numbers, and
  Spark's JSON parser does not coerce strings to longs (it nulls them) —
  parsing everything as string first and casting after is the only
  lossless path, including int64 > 2^53 like sendRecordThreshold
  5000000000000000000 (reference fixture transactions.txt:4).
- ``table_schema()``  — the typed at-rest schema.

``transform.cast_to_table`` walks the same spec to build the cast
expression tree, so wire schema, table schema and casts can never drift.

Derived/administrative columns (outside the source JSON):
- consensusTimestampTruncated: nanos floored to micros, the DAY-partition
  key (TransactionJsonToTableRow.java:57-58).
- dedupe INTEGER: scratch column owned by the dedup job
  (transactions-schema.json:397-401).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# the spec (transliterated from transactions-schema.json)
# ---------------------------------------------------------------------------


def _f(name: str, ftype: str, fields: list | None = None, mode: str = "") -> dict:
    d = {"name": name, "type": ftype}
    if fields is not None:
        d["fields"] = fields
    if mode:
        d["mode"] = mode
    return d


def _account_id(name: str = "accountID") -> dict:
    # the ubiquitous (shardNum, realmNum, accountNum) triple
    return _f(name, "RECORD", [
        _f("shardNum", "INTEGER"),
        _f("realmNum", "INTEGER"),
        _f("accountNum", "INTEGER"),
    ])


def _account_amounts(name: str) -> dict:
    # transferList.accountAmounts / nonFeeTransfers element shape
    # (transactions-schema.json:335-364, :368-396)
    return _f(name, "RECORD", [
        _account_id(),
        _f("amount", "INTEGER"),
    ], mode="REPEATED")


TRANSACTIONS_SPEC: list[dict] = [
    _f("consensusTimestampTruncated", "TIMESTAMP"),   # :2-6 (derived at ingest)
    _f("consensusTimestamp", "INTEGER"),              # :7-10 (epoch nanos, int64)
    _f("transactionType", "INTEGER"),                 # :11-14
    _f("entity", "RECORD", [                          # :16-36
        _f("shardNum", "INTEGER"),
        _f("realmNum", "INTEGER"),
        _f("entityNum", "INTEGER"),
        _f("type", "INTEGER"),
    ]),
    _f("transaction", "RECORD", [                     # :38-...
        _f("body", "RECORD", [
            _f("transactionID", "RECORD", [
                _f("transactionValidStart", "RECORD", [
                    _f("seconds", "INTEGER"),
                    _f("nanos", "INTEGER"),
                ]),
                _account_id(),
            ]),
            _account_id("nodeAccountID"),
            _f("transactionFee", "INTEGER"),          # :101-104 (int64-as-string in JSON)
            _f("transactionValidDuration", "RECORD", [
                _f("seconds", "INTEGER"),
            ]),
            _f("memo", "STRING"),                     # :115-117
            _f("cryptoCreateAccount", "RECORD", [
                _f("initialBalance", "INTEGER"),
                _account_id("proxyAccountID"),
            ]),
            _f("contractCall", "RECORD", [
                _f("gas", "INTEGER"),
                _f("amount", "INTEGER"),
                _f("functionParameters", "BYTES"),    # :159-162
            ]),
            _f("contractCreateInstance", "RECORD", [
                _f("gas", "INTEGER"),
                _f("initialBalance", "INTEGER"),
                _account_id("proxyAccountID"),
                _f("constructorParameters", "BYTES"),
                _f("memo", "STRING"),
            ]),
            _f("cryptoAddClaim", "RECORD", [
                _f("claim", "RECORD", [
                    _f("hash", "BYTES"),
                ]),
            ]),
            _f("consensusSubmitMessage", "RECORD", [
                _f("message", "BYTES"),
            ]),
            _f("fileCreate", "RECORD", [
                _f("contents", "BYTES"),              # :234-239
            ]),
            _f("fileAppend", "RECORD", [
                _f("contents", "BYTES"),
            ]),
            _f("fileUpdate", "RECORD", [
                _f("contents", "BYTES"),
            ]),
        ]),
    ]),
    _f("transactionRecord", "RECORD", [
        _f("receipt", "RECORD", [
            _f("status", "STRING"),                   # :273-276
            _f("topicSequenceNumber", "INTEGER"),
            _f("topicRunningHash", "BYTES"),
        ]),
        _f("transactionHash", "BYTES"),               # :287-290
        _f("transactionFee", "INTEGER"),
        _f("contractCallResult", "RECORD", [
            _f("contractCallResult", "BYTES"),
            _f("errorMessage", "STRING"),
            _f("gasUsed", "INTEGER"),
        ]),
        _f("contractCreateResult", "RECORD", [
            _f("contractCallResult", "BYTES"),
            _f("errorMessage", "STRING"),
            _f("gasUsed", "INTEGER"),
        ]),
        _f("transferList", "RECORD", [                # :335-364
            _account_amounts("accountAmounts"),
        ]),
    ]),
    _account_amounts("nonFeeTransfers"),              # :368-396
    _f("dedupe", "INTEGER"),                          # :397-401
]


# ---------------------------------------------------------------------------
# StructType builders
# ---------------------------------------------------------------------------
_TYPED = {
    "INTEGER": T.LongType(),
    "STRING": T.StringType(),
    "BYTES": T.BinaryType(),
    "TIMESTAMP": T.TimestampType(),
}


def _to_struct(fields: list[dict], wire: bool) -> T.StructType:
    out = []
    for f in fields:
        if f["type"] == "RECORD":
            dt: T.DataType = _to_struct(f["fields"], wire)
        elif wire:
            dt = T.StringType()
        else:
            dt = _TYPED[f["type"]]
        if f.get("mode") == "REPEATED":
            dt = T.ArrayType(dt)
        out.append(T.StructField(f["name"], dt, True))
    return T.StructType(out)


CORRUPT_COL = "_corrupt_record"


def parse_schema(spec: list[dict] | None = None) -> T.StructType:
    """Wire schema for from_json: all leaves StringType, plus the
    PERMISSIVE-mode corrupt-record column for malformed-JSON routing
    (the Spark form of TransactionJsonToTableRow.java:61-65)."""
    s = _to_struct(spec or TRANSACTIONS_SPEC, wire=True)
    return T.StructType(list(s.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)])


def table_schema(spec: list[dict] | None = None) -> T.StructType:
    """Typed at-rest schema (the transliterated transactions-schema.json)."""
    return _to_struct(spec or TRANSACTIONS_SPEC, wire=False)


TRANSACTIONS_SCHEMA = table_schema()


# ---------------------------------------------------------------------------
# companion table schemas
# ---------------------------------------------------------------------------
#: errors dead-letter table (errors-schema.json:1-12; BigQueryErrorsSink.java:79-81)
ERRORS_SCHEMA = T.StructType([
    T.StructField("table_row", T.StringType(), True),
    T.StructField("errors", T.StringType(), True),
])

#: dedupe_state KV table (state-schema.json:1-13) — re-exported by operators.dedupe
STATE_SCHEMA = T.StructType([
    T.StructField("name", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
])

#: transaction_types dimension seed — the 21 rows of transaction-types.csv /
#: scripts/create-tables.sh:38-59 (S7)
TRANSACTION_TYPES: list[tuple[int, str]] = [
    (7, "CONTRACTCALL"),
    (8, "CONTRACTCREATEINSTANCE"),
    (9, "CONTRACTUPDATEINSTANCE"),
    (10, "CRYPTOADDLIVEHASH"),
    (11, "CRYPTOCREATEACCOUNT"),
    (12, "CRYPTODELETE"),
    (13, "CRYPTODELETELIVEHASH"),
    (14, "CRYPTOTRANSFER"),
    (15, "CRYPTOUPDATEACCOUNT"),
    (16, "FILEAPPEND"),
    (17, "FILECREATE"),
    (18, "FILEDELETE"),
    (19, "FILEUPDATE"),
    (20, "SYSTEMDELETE"),
    (21, "SYSTEMUNDELETE"),
    (22, "CONTRACTDELETEINSTANCE"),
    (23, "FREEZE"),
    (24, "CONSENSUSCREATETOPIC"),
    (25, "CONSENSUSUPDATETOPIC"),
    (26, "CONSENSUSDELETETOPIC"),
    (27, "CONSENSUSSUBMITMESSAGE"),
]

TRANSACTION_TYPES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType(), False),
    T.StructField("name", T.StringType(), False),
])


def transaction_types_df(spark):
    """The broadcast-joinable dimension (S7/J3)."""
    return spark.createDataFrame(TRANSACTION_TYPES, TRANSACTION_TYPES_SCHEMA)
