"""Golden tests for the ingest transform (P1-P4) against the reference
fixture — the Spark port of TransactionJsonToTableRowTest.java:36-62.

Fixture: hedera-etl-bigquery/src/test/resources/data/
TransactionJsonToTableRowTest/transactions.txt (6 JSON rows: crypto
update/transfer/delete/create, fileAppend, fileCreate) and
expectedTableRows.txt.  Tests skip if the read-only reference checkout is
absent (they assert against values extracted from the fixture itself, not
against hardcoded copies).
"""

from __future__ import annotations

import base64
import json
import re
from pathlib import Path

import pytest
from pyspark.sql import functions as F

FIXTURE_DIR = Path(
    "/root/reference/hedera-etl-bigquery/src/test/resources/data/TransactionJsonToTableRowTest"
)

pytestmark = pytest.mark.skipif(
    not FIXTURE_DIR.exists(), reason="reference fixture checkout not present"
)


@pytest.fixture(scope="module")
def fixture_lines() -> list[str]:
    lines = (FIXTURE_DIR / "transactions.txt").read_text().splitlines()
    return [ln for ln in lines if ln.strip()]


@pytest.fixture(scope="module")
def expected_lines() -> list[str]:
    lines = (FIXTURE_DIR / "expectedTableRows.txt").read_text().splitlines()
    return [ln for ln in lines if ln.strip()]


@pytest.fixture(scope="module")
def transformed(spark, fixture_lines):
    from hedera_etl_spark.transform import parse_transactions

    raw = spark.createDataFrame([(ln,) for ln in fixture_lines], ["value"])
    valid, errors = parse_transactions(raw)
    return valid.orderBy("consensusTimestamp").collect(), errors.collect()


def test_all_fixture_rows_parse(transformed, fixture_lines):
    valid, errors = transformed
    assert len(valid) == len(fixture_lines)
    assert errors == []


def test_consensus_timestamp_exact_int64(transformed, fixture_lines):
    """Nanos are int64 epoch values ~1.57e18 — must round-trip exactly
    (never transiting a double)."""
    expected = sorted(json.loads(ln)["consensusTimestamp"] for ln in fixture_lines)
    actual = [r["consensusTimestamp"] for r in transformed[0]]
    assert actual == expected


def test_truncated_timestamp_matches_reference_output(transformed, expected_lines):
    """consensusTimestampTruncated must equal the reference's derivation
    (TransactionJsonToTableRow.java:57-58), read back from
    expectedTableRows.txt's ISO strings."""
    iso = re.compile(r"consensusTimestampTruncated=([0-9T:.\-]+Z)")
    expected = sorted(m.group(1) for ln in expected_lines for m in [iso.search(ln)] if m)
    actual = sorted(
        r["consensusTimestampTruncated"].strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
        for r in transformed[0]
        if r["consensusTimestampTruncated"] is not None
    )
    # every expected line's truncated ts appears in our output
    assert set(expected) <= set(actual)


def test_quoted_int64_fields_cast(transformed, fixture_lines):
    """Protobuf JSON int64-as-string ("transactionFee": "500000000") must
    land as exact longs."""
    expected = {
        json.loads(ln)["consensusTimestamp"]: int(
            json.loads(ln)["transaction"]["body"]["transactionFee"]
        )
        for ln in fixture_lines
    }
    for r in transformed[0]:
        assert r["transaction"]["body"]["transactionFee"] == expected[r["consensusTimestamp"]]


def test_int64_above_2_53_no_precision_loss(spark):
    """sendRecordThreshold: 5000000000000000000 > 2^53 (SURVEY §7 risk
    register) — prove the string->long path is lossless on a field that IS
    in the schema (initialBalance carries the big value here)."""
    from hedera_etl_spark.transform import parse_transactions

    big = 5_000_000_000_000_000_019  # not representable in double (odd tail)
    line = json.dumps(
        {
            "consensusTimestamp": 1570800942789822000,
            "transactionType": 11,
            "transaction": {
                "body": {"cryptoCreateAccount": {"initialBalance": str(big)}}
            },
        }
    )
    raw = spark.createDataFrame([(line,)], ["value"])
    valid, _ = parse_transactions(raw)
    row = valid.collect()[0]
    assert row["transaction"]["body"]["cryptoCreateAccount"]["initialBalance"] == big
    assert float(big) != big or int(float(big)) != big  # the double path WOULD corrupt it


def test_transfer_list_shape(transformed, fixture_lines):
    """transferList.accountAmounts (REPEATED RECORD, the load-bearing
    nested shape) — element counts and zero-sum invariant per row."""
    by_ts = {json.loads(ln)["consensusTimestamp"]: json.loads(ln) for ln in fixture_lines}
    for r in transformed[0]:
        src = by_ts[r["consensusTimestamp"]]
        src_amounts = src["transactionRecord"]["transferList"]["accountAmounts"]
        got = r["transactionRecord"]["transferList"]["accountAmounts"]
        assert len(got) == len(src_amounts)
        assert sum(a["amount"] for a in got) == sum(int(a["amount"]) for a in src_amounts)
        # accountNum triple casts through the nested struct
        assert [a["accountID"]["accountNum"] for a in got] == [
            int(a["accountID"]["accountNum"]) for a in src_amounts
        ]


def test_bytes_base64_roundtrip(transformed, fixture_lines):
    """BYTES fields (transactionHash) decode from base64 to the exact bytes."""
    by_ts = {json.loads(ln)["consensusTimestamp"]: json.loads(ln) for ln in fixture_lines}
    for r in transformed[0]:
        src_b64 = by_ts[r["consensusTimestamp"]]["transactionRecord"]["transactionHash"]
        assert bytes(r["transactionRecord"]["transactionHash"]) == base64.b64decode(src_b64)


def test_unknown_fields_dropped(transformed):
    """sigMap / generateRecord / exchangeRate are in the input JSON but not
    the schema — ignoreUnknownValues() semantics: they must simply not
    exist in the output rows."""
    row = transformed[0][0]
    body = row["transaction"]["body"].asDict()
    assert "generateRecord" not in body
    assert "sigMap" not in row["transaction"].asDict()


def test_malformed_json_routes_to_errors(spark):
    """The negative case of TransactionJsonToTableRowTest.java:53-62: a
    truncated JSON line goes to the errors output, not an exception, and
    carries the raw line (BigQueryErrorsSink.java:79-81 shape)."""
    from hedera_etl_spark.transform import parse_transactions

    bad = '{"consensusTimestamp":1570802944412586000,"entity":{"shardNum":0,'
    good = json.dumps({"consensusTimestamp": 1, "transactionType": 14})
    raw = spark.createDataFrame([(bad,), (good,)], ["value"])
    valid, errors = parse_transactions(raw)
    err_rows = errors.collect()
    assert [r["consensusTimestamp"] for r in valid.collect()] == [1]
    assert len(err_rows) == 1
    assert err_rows[0]["table_row"] == bad
    assert "PARSE_ERROR" in err_rows[0]["errors"]


def test_schema_field_paths_match_reference_json():
    """Field-for-field parity with transactions-schema.json: every path in
    the reference schema resource exists in TRANSACTIONS_SCHEMA with the
    mapped Spark type."""
    import hedera_etl_spark.schema as S

    ref_path = Path(
        "/root/reference/hedera-etl-bigquery/src/main/resources/transactions-schema.json"
    )
    ref = json.loads(ref_path.read_text())

    def paths(fields, prefix=""):
        for f in fields:
            p = f"{prefix}{f['name']}"
            yield p, f["type"], f.get("mode", "")
            if f["type"] == "RECORD":
                yield from paths(f["fields"], p + ".")

    ours = dict()
    for p, t, m in paths(S.TRANSACTIONS_SPEC):
        ours[p] = (t, m)
    for p, t, m in paths(ref):
        assert p in ours, f"missing field path {p}"
        assert ours[p] == (t, m), f"type/mode mismatch at {p}: {ours[p]} != {(t, m)}"
    assert len(ours) == len(list(paths(ref)))


def test_invalid_base64_nulls_field_not_job(spark):
    """A malformed base64 BYTES value must null that field, never kill
    the job (unbase64 has no try_ variant; ANSI mode fails the task)."""
    import json as _json

    from hedera_etl_spark.transform import parse_transactions

    line = _json.dumps(
        {
            "consensusTimestamp": 7,
            "transactionRecord": {"transactionHash": "!!!not-base64!!!"},
        }
    )
    ok = _json.dumps(
        {
            "consensusTimestamp": 8,
            "transactionRecord": {"transactionHash": "grJr"},
        }
    )
    valid, errors = parse_transactions(spark.createDataFrame([(line,), (ok,)], ["value"]))
    rows = {r["consensusTimestamp"]: r for r in valid.collect()}
    assert errors.count() == 0
    assert rows[7]["transactionRecord"]["transactionHash"] is None
    assert bytes(rows[8]["transactionRecord"]["transactionHash"]) == b"\x82\xb2k"


def test_null_repeated_element_stays_null(spark):
    """A NULL element inside a REPEATED record must survive as NULL, not
    become a struct of all-NULL fields (same invariant the plain-record
    branch documents)."""
    import json

    from hedera_etl_spark.transform import parse_transactions

    line = json.dumps(
        {
            "consensusTimestamp": 1_570_800_000_000_000_000,
            "transactionType": 7,
            "transactionRecord": {
                "transferList": {
                    "accountAmounts": [
                        None,
                        {"accountID": {"accountNum": "3"}, "amount": "5"},
                    ]
                }
            },
        }
    )
    raw = spark.createDataFrame([(line,)], ["value"])
    valid, errors = parse_transactions(raw)
    assert errors.count() == 0
    amounts = valid.select(
        F.col("transactionRecord.transferList.accountAmounts").alias("aa")
    ).collect()[0]["aa"]
    assert amounts[0] is None
    assert amounts[1]["amount"] == 5
