"""Regression guard for the r4 fixture wipeout: the driver's events.parquet
has shipped with `ts` as parquet TIMESTAMP(NANOS) in some generations and
TIMESTAMP(MICROS) in others.  ``normalize_events`` must yield the identical
(ts TIMESTAMP_NTZ, ts_ns int64) contract for BOTH physical flavors — this
test writes the same logical rows in each flavor via pyarrow and asserts the
normalized outputs are byte-identical.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hedera_etl_spark.tables import normalize_events

# Deliberately includes a sub-microsecond-truncatable value and an exact
# second boundary.
_ROWS = {
    "event_id": [0, 1, 2, 3],
    "ts_us": [
        1704067798778549,  # 2024-01-01 00:09:58.778549
        1704068166738090,
        1704067200000000,  # exact boundary
        1893456000123456,  # 2030
    ],
    "user_id": [10, 11, 12, 13],
    "event_type": ["a", "b", "a", "c"],
    "value": [1.5, 2.5, 3.5, 4.5],
    "props": ['{"k":1}', "{}", "{}", "{}"],
}


def _write_flavor(path: str, unit: str) -> None:
    ts = pa.array([v * 1000 for v in _ROWS["ts_us"]], pa.timestamp("ns"))
    if unit == "us":
        ts = ts.cast(pa.timestamp("us"))
    table = pa.table(
        {
            "event_id": pa.array(_ROWS["event_id"], pa.int64()),
            "ts": ts,
            "user_id": pa.array(_ROWS["user_id"], pa.int64()),
            "event_type": pa.array(_ROWS["event_type"], pa.string()),
            "value": pa.array(_ROWS["value"], pa.float64()),
            "props": pa.array(_ROWS["props"], pa.string()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def flavor_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_flavors")
    nanos = root / "nanos.parquet"
    micros = root / "micros.parquet"
    _write_flavor(str(nanos), "ns")
    _write_flavor(str(micros), "us")
    return str(nanos), str(micros)


def _normalized_rows(spark, path):
    df = normalize_events(spark.read.parquet(path))
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"
    assert dict(df.dtypes)["ts_ns"] == "bigint"
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value", "props", "ts_ns"]
    return [r.asDict() for r in df.orderBy("event_id").collect()]


def test_both_parquet_timestamp_flavors_normalize_identically(spark, flavor_dirs):
    nanos_path, micros_path = flavor_dirs
    # sanity: the two files really do scan as different physical types
    raw_nanos = dict(spark.read.parquet(nanos_path).dtypes)["ts"]
    raw_micros = dict(spark.read.parquet(micros_path).dtypes)["ts"]
    assert raw_nanos == "bigint"  # nanosAsLong in effect
    assert raw_micros.startswith("timestamp")

    a = _normalized_rows(spark, nanos_path)
    b = _normalized_rows(spark, micros_path)
    assert a == b
    # and the values are the expected micros-derived ones
    assert [r["ts_ns"] for r in a] == [v * 1000 for v in _ROWS["ts_us"]]


def test_normalize_events_rejects_unknown_type(spark):
    df = spark.range(3).withColumnRenamed("id", "ts")
    df = df.selectExpr("CAST(ts AS STRING) AS ts", "ts AS event_id")
    with pytest.raises(TypeError):
        normalize_events(df)


def test_normalize_events_is_idempotent(spark, flavor_dirs):
    """Applying normalize_events to an already-normalized frame must be a
    no-op — specifically it must NOT re-derive ts_ns from the
    µs-truncated ts, which would silently drop sub-microsecond digits.
    Pinned with a hand-built frame whose ts_ns has live nano digits."""
    import pyspark.sql.functions as F

    nanos_path, _ = flavor_dirs
    once = normalize_events(spark.read.parquet(nanos_path))
    twice = normalize_events(once)
    assert once.columns == twice.columns
    assert [r.asDict() for r in once.orderBy("event_id").collect()] == [
        r.asDict() for r in twice.orderBy("event_id").collect()
    ]

    # sub-µs digits survive a re-normalize
    nano = (
        spark.range(1)
        .select(
            F.lit(7).alias("event_id"),
            F.expr("CAST(timestamp_micros(1704067798778549) AS TIMESTAMP_NTZ)").alias("ts"),
            F.lit(1).alias("user_id"),
            F.lit("a").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
            F.lit(1704067798778549123).alias("ts_ns"),
        )
    )
    out = normalize_events(nano).collect()[0]
    assert out["ts_ns"] == 1704067798778549123
