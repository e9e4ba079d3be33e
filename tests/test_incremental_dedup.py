"""Incremental corpus dedup against the persistent signature store
(operators/incremental_dedup.py): cross-batch exact + near dedup,
retry idempotence, and crash-window healing."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import Row

from hedera_etl_spark.operators.incremental_dedup import (
    CorpusSignatureStore,
    incremental_dedup_batch,
)

BASE = "the quick brown fox jumps over the lazy dog and keeps running fast today"


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


@pytest.fixture()
def store(spark, tmp_path):
    return CorpusSignatureStore(spark, str(tmp_path / "store"))


def test_first_batch_accepts_uniques_and_collapses_in_batch(spark, store):
    docs = _docs(
        spark,
        [
            (1, BASE),
            (2, BASE),  # exact clone of 1 (in-batch)
            (3, BASE + " zzz"),  # near-dup of 1 (in-batch)
            (4, "completely different words about spark execution plans here"),
            (5, "tiny"),  # shingle-less: must pass through
        ],
    )
    accepted, stats = incremental_dedup_batch(store, docs, "b1")
    ids = sorted(r["doc_id"] for r in accepted.collect())
    assert ids == [1, 4, 5]
    assert stats.rows_in == 5
    assert stats.exact_in_batch == 1
    assert stats.near_in_batch == 1
    assert stats.accepted == 3
    assert store.has_batch("b1")


def test_second_batch_dedups_against_store(spark, store):
    incremental_dedup_batch(store, _docs(spark, [(1, BASE)]), "b1")
    b2 = _docs(
        spark,
        [
            (10, BASE),  # exact clone of stored doc 1
            (11, BASE + " zzz"),  # near-dup of stored doc 1
            (12, "fresh unseen content that shares nothing with the first batch"),
        ],
    )
    accepted, stats = incremental_dedup_batch(store, b2, "b2")
    assert sorted(r["doc_id"] for r in accepted.collect()) == [12]
    assert stats.exact_vs_store == 1
    assert stats.near_vs_store == 1
    assert stats.accepted == 1


def test_retry_replays_decision_without_reinserting(spark, store):
    b1 = _docs(spark, [(1, BASE), (2, "other text entirely different from base")])
    a1, s1 = incremental_dedup_batch(store, b1, "b1")
    before = sorted(map(tuple, store.content().collect()))
    a2, s2 = incremental_dedup_batch(store, b1, "b1")  # retry
    assert s2.already_committed
    assert sorted(r["doc_id"] for r in a2.collect()) == sorted(
        r["doc_id"] for r in a1.collect()
    )
    assert sorted(map(tuple, store.content().collect())) == before


def test_crash_window_heals_and_batch_reruns(spark, store):
    incremental_dedup_batch(store, _docs(spark, [(1, BASE)]), "b1")
    # simulate a crash between the two commit renames: content live,
    # sigs missing
    shutil.rmtree(os.path.join(store.sigs_dir, "batch=b1"))
    healed = CorpusSignatureStore(spark, store.path)
    assert not healed.has_batch("b1")
    assert healed.content().count() == 0  # orphan discarded
    accepted, stats = incremental_dedup_batch(
        healed, _docs(spark, [(1, BASE)]), "b1"
    )
    assert not stats.already_committed
    assert [r["doc_id"] for r in accepted.collect()] == [1]
    assert healed.has_batch("b1")


def test_store_grows_append_only_per_batch(spark, store):
    incremental_dedup_batch(store, _docs(spark, [(1, BASE)]), "b1")
    incremental_dedup_batch(
        store, _docs(spark, [(2, "unrelated second corpus batch content here")]), "b2"
    )
    assert store.committed_batches() == {"batch=b1", "batch=b2"}
    assert sorted(r["doc_id"] for r in store.content().collect()) == [1, 2]
    assert sorted(r["doc_id"] for r in store.signatures().collect()) == [1, 2]


def test_transitive_in_batch_chain_keeps_min_id(spark, store):
    """A ~ B and B ~ C but A !~ C: connected components must still
    collapse the chain to one keeper."""
    docs = _docs(
        spark,
        [
            (30, BASE),
            (31, BASE + " zzz"),
            (32, BASE + " zzz yyy"),
        ],
    )
    accepted, _ = incremental_dedup_batch(store, docs, "b1", threshold=0.4)
    assert [r["doc_id"] for r in accepted.collect()] == [30]


def test_compact_preserves_dedup_behavior(spark, store):
    incremental_dedup_batch(store, _docs(spark, [(1, BASE)]), "b1")
    incremental_dedup_batch(
        store, _docs(spark, [(2, "second batch unrelated content here")]), "b2"
    )
    incremental_dedup_batch(
        store, _docs(spark, [(3, "third batch of totally other words")]), "b3"
    )
    before_content = sorted(map(tuple, store.content().collect()))
    assert store.compact() == 3
    assert len(store.committed_batches()) == 1
    assert sorted(map(tuple, store.content().collect())) == before_content
    assert store.signatures().count() == 3
    # dedup against the compacted history still fires
    accepted, stats = incremental_dedup_batch(
        store, _docs(spark, [(10, BASE), (11, BASE + " zzz")]), "b4"
    )
    assert accepted.count() == 0
    assert stats.exact_vs_store == 1 and stats.near_vs_store == 1
    # idempotent when single batch... b4 added a second dir; compact again
    assert store.compact() == 2
    assert store.compact() == 0


def test_compact_crash_window_converges(spark, store):
    """Crash after target commit, before source removal: a re-run folds
    the leftovers into a fresh target without row duplication."""
    import os
    import shutil

    incremental_dedup_batch(store, _docs(spark, [(1, BASE)]), "b1")
    incremental_dedup_batch(
        store, _docs(spark, [(2, "other unrelated prose lives here")]), "b2"
    )
    # simulate: run compact but resurrect one source batch afterwards to
    # mimic "removal never happened"
    import hashlib

    old = sorted(store.committed_batches())
    store.compact()
    target = next(iter(store.committed_batches()))
    # duplicate a copy of the target under another batch name (pretend a
    # leftover source survived with overlapping rows)
    for root in (store.content_dir, store.sigs_dir):
        shutil.copytree(os.path.join(root, target), os.path.join(root, "batch=left"))
    assert len(store.committed_batches()) == 2
    store.compact()
    assert len(store.committed_batches()) == 1
    assert store.content().count() == 2  # dropDuplicates folded the overlap
    assert store.signatures().count() == 2
