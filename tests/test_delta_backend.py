"""Delta backend for the dedup engine (J1 atomic rewrite / J2 MERGE).

These run ONLY when delta-spark is importable — it is NOT baked into
this container and network installs are unavailable, so here they skip
by construction.  The branch is still executed in CI terms by
tests/test_delta_mocked.py, which injects a fake delta package and
asserts the exact MERGE chain / replaceWhere commit the engine hands a
real installation; the parquet temp-path-swap fallback is covered by
test_dedupe_job.py.  On an environment with delta-spark installed this
module runs the same DedupeJob/StateStore suite over a real Delta table.
"""

from __future__ import annotations

import os

import pytest

from hedera_etl_spark.operators.dedupe import (
    INCREMENTAL_STATE_KEY,
    DedupeJob,
    StateStore,
    delta_available,
    is_delta_table,
)

pytestmark = pytest.mark.skipif(
    not delta_available(), reason="delta-spark not installed in this environment"
)


def _make_delta_table(spark, tmp_path):
    from tests.test_dedupe_job import ROW_SCHEMA, gen_rows

    path = os.path.join(str(tmp_path), "tx_delta")
    df = spark.createDataFrame(gen_rows(100), ROW_SCHEMA)
    df.write.format("delta").partitionBy("part_date").save(path)
    assert is_delta_table(path)
    return path


def test_delta_incremental_dedupe_roundtrip(spark, tmp_path):
    path = _make_delta_table(spark, tmp_path)
    state = StateStore(spark, os.path.join(str(tmp_path), "state"))
    job = DedupeJob(spark, path, state, key="consensus_timestamp", tiebreak="ingest_seq")

    first = job.run_incremental()
    assert first.duplicates_removed == 20  # every 5th of 100 duplicated
    final = spark.read.format("delta").load(path)
    assert final.count() == 100
    assert final.select("consensus_timestamp").distinct().count() == 100

    second = job.run_incremental()
    assert second.duplicates_removed == 0  # idempotent no-op


def test_delta_state_merge_upsert(spark, tmp_path):
    from hedera_etl_spark.operators.dedupe import STATE_SCHEMA

    path = os.path.join(str(tmp_path), "state_delta")
    spark.createDataFrame([("seed", "0")], STATE_SCHEMA).write.format("delta").save(path)
    state = StateStore(spark, path)
    state.upsert(INCREMENTAL_STATE_KEY, "123")
    state.upsert(INCREMENTAL_STATE_KEY, "456")  # update, not append
    got = state.read()
    assert got[INCREMENTAL_STATE_KEY] == "456"
    assert got["seed"] == "0"
