"""Delta-branch construction tests with a MOCKED delta package.

delta-spark cannot be installed in this container (no network installs;
tests/test_delta_backend.py carries the real-Delta suite and skips).
These tests make the branch EXECUTE anyway: a fake ``delta`` package is
injected into sys.modules so ``delta_available()`` is True, the Spark
writer chain is intercepted with a recording stand-in, and the engine's
own code paths run end to end — asserting the exact MERGE chain
(SetStateQuery.java:34-40) and replaceWhere overwrite
(RemoveDuplicatesTemplateQuery.java:29-43) the engine would hand a real
Delta installation.
"""

from __future__ import annotations

import datetime
import os
import sys
import types

import pytest

from hedera_etl_spark.operators.dedupe import (
    STATE_SCHEMA,
    StateStore,
    replace_where_predicate,
)


class _RecordingMerge:
    """Stand-in for delta.tables.DeltaTable's merge builder: records the
    chain and emulates MERGE semantics against a plain dict store."""

    instances: list["_RecordingMerge"] = []

    def __init__(self, store: dict):
        self.store = store
        self.condition = None
        self.matched_set = None
        self.insert_all = False
        self.src_rows = None
        self.executed = False
        _RecordingMerge.instances.append(self)

    def merge(self, src, condition):
        self.condition = condition
        self.src_rows = [(r["name"], r["value"]) for r in src.collect()]
        return self

    def whenMatchedUpdate(self, set=None):
        self.matched_set = set
        return self

    def whenNotMatchedInsertAll(self):
        self.insert_all = True
        return self

    def execute(self):
        assert self.condition == "t.name = s.name"
        assert self.matched_set == {"value": "s.value"}
        assert self.insert_all
        for name, value in self.src_rows:
            self.store[name] = value  # upsert: update-or-insert
        self.executed = True


@pytest.fixture
def fake_delta(monkeypatch):
    """Inject a fake ``delta`` package; yields the dict store backing the
    fake DeltaTable."""
    store: dict = {}

    class _FakeDeltaTable:
        @staticmethod
        def forPath(spark, path):
            m = _RecordingMerge(store)
            m.path = path
            return types.SimpleNamespace(alias=lambda a: m)

    delta_mod = types.ModuleType("delta")
    tables_mod = types.ModuleType("delta.tables")
    tables_mod.DeltaTable = _FakeDeltaTable
    delta_mod.tables = tables_mod
    monkeypatch.setitem(sys.modules, "delta", delta_mod)
    monkeypatch.setitem(sys.modules, "delta.tables", tables_mod)
    _RecordingMerge.instances.clear()
    yield store


class _RecordingWriter:
    """Stand-in for DataFrame.write recording format/mode/options/path."""

    recorded: list[dict] = []

    def __init__(self, df):
        self.calls = {"df": df, "options": {}}

    def format(self, fmt):
        self.calls["format"] = fmt
        return self

    def mode(self, m):
        self.calls["mode"] = m
        return self

    def option(self, k, v):
        self.calls["options"][k] = v
        return self

    def partitionBy(self, *cols):
        self.calls["partitionBy"] = cols
        return self

    def save(self, path):
        self.calls["path"] = path
        _RecordingWriter.recorded.append(self.calls)


@pytest.fixture
def recording_writes(monkeypatch):
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    monkeypatch.setattr(
        ClassicDF, "write", property(lambda self: _RecordingWriter(self))
    )
    _RecordingWriter.recorded.clear()
    yield _RecordingWriter.recorded


def test_replace_where_predicate_quotes_dates():
    dates = [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]
    assert (
        replace_where_predicate(dates)
        == "part_date IN ('2024-01-01', '2024-01-02')"
    )


def test_state_store_merge_chain_on_existing_delta_table(spark, tmp_path, fake_delta):
    path = str(tmp_path / "state_delta")
    os.makedirs(os.path.join(path, "_delta_log"))  # marks it a Delta table
    fake_delta["seed"] = "0"

    state = StateStore(spark, path)
    state.upsert("incrementalLatestEndTimestamp", "123")
    state.upsert("incrementalLatestEndTimestamp", "456")

    merges = [m for m in _RecordingMerge.instances if m.executed]
    assert len(merges) == 2
    assert all(m.path == path for m in merges)
    # MERGE semantics: second upsert UPDATED, did not append; seed intact
    assert fake_delta == {"seed": "0", "incrementalLatestEndTimestamp": "456"}


def test_state_store_creates_delta_on_first_write(
    spark, tmp_path, fake_delta, recording_writes
):
    path = str(tmp_path / "fresh_state")
    StateStore(spark, path).upsert("k", "v")
    assert len(recording_writes) == 1
    w = recording_writes[0]
    assert w["format"] == "delta" and w["path"] == path
    assert [tuple(r) for r in w["df"].collect()] == [("k", "v")]


def test_dedupe_swap_partitions_issues_replace_where(
    spark, tmp_path, fake_delta, recording_writes
):
    """The J1 rewrite branch: _swap_partitions on a Delta table must be a
    single overwrite commit scoped by replaceWhere to exactly the touched
    partitions — no directory swap, no temp path."""
    from hedera_etl_spark.operators.dedupe import DedupeJob

    table = str(tmp_path / "tx_delta")
    os.makedirs(os.path.join(table, "_delta_log"))
    job = DedupeJob(
        spark,
        table,
        StateStore(spark, str(tmp_path / "state")),
        key="consensus_timestamp",
        tiebreak="ingest_seq",
    )
    replacement = spark.createDataFrame(
        [(1, datetime.date(2024, 1, 1))], "consensus_timestamp long, part_date date"
    )
    job._swap_partitions(replacement, [datetime.date(2024, 1, 1)])

    assert len(recording_writes) == 1
    w = recording_writes[0]
    assert w["format"] == "delta"
    assert w["mode"] == "overwrite"
    assert w["options"] == {"replaceWhere": "part_date IN ('2024-01-01')"}
    assert w["path"] == table
    assert not os.path.exists(f"{table}.__rewrite"), "no temp-swap artifacts"
