"""Continuous corpus ingestion (streaming/corpus.py): cross-batch
streaming dedup through the signature store, restart resumption, and
replay idempotence."""

from __future__ import annotations

import json
import os

import pytest

from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline

BASE = "the quick brown fox jumps over the lazy dog and keeps running fast today"
OTHER = "completely different prose concerning spark execution plans and shuffles"


def _write_jsonl(path, rows):
    with open(path, "w") as fh:
        for doc_id, text in rows:
            fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    (tmp_path / "in").mkdir()
    return {
        "in": str(tmp_path / "in"),
        "corpus": str(tmp_path / "corpus"),
        "store": str(tmp_path / "store"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _pipeline(spark, dirs):
    return CorpusIngestPipeline(
        spark,
        input_dir=dirs["in"],
        corpus_table=dirs["corpus"],
        store_path=dirs["store"],
        checkpoint=dirs["ckpt"],
    )


def test_streamed_batches_dedup_against_history(spark, dirs):
    _write_jsonl(
        os.path.join(dirs["in"], "b1.jsonl"),
        [(1, BASE), (2, BASE), (3, OTHER)],  # 2 is an in-batch clone
    )
    p1 = _pipeline(spark, dirs)
    m1 = p1.run_until_drained()
    assert m1.accepted == 2 and m1.dropped_exact == 1
    assert sorted(r["doc_id"] for r in p1.read_corpus().collect()) == [1, 3]

    # second run, same checkpoint: only the new file processes, and its
    # rows dedup against the PERSISTED history
    _write_jsonl(
        os.path.join(dirs["in"], "b2.jsonl"),
        [(10, BASE), (11, BASE + " zzz"), (12, "fresh new content words here")],
    )
    p2 = _pipeline(spark, dirs)
    m2 = p2.run_until_drained()
    assert m2.rows_in == 3  # b1 not reprocessed
    assert m2.accepted == 1
    assert m2.dropped_exact == 1 and m2.dropped_near == 1
    assert sorted(r["doc_id"] for r in p2.read_corpus().collect()) == [1, 3, 12]


def test_epoch_replay_is_idempotent(spark, dirs):
    """Replaying a processed epoch (crash between store/corpus commit and
    checkpoint commit) must not change the corpus."""
    _write_jsonl(os.path.join(dirs["in"], "b1.jsonl"), [(1, BASE), (2, OTHER)])
    p = _pipeline(spark, dirs)
    p.run_until_drained()
    before = sorted(map(tuple, p.read_corpus().collect()))

    batch = spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"])
    p._process_batch(batch, 0)  # simulate the replayed epoch
    assert p.metrics.replayed_batches == 1
    assert sorted(map(tuple, p.read_corpus().collect())) == before


def test_lost_append_window_heals_on_replay(spark, dirs):
    """Crash window 2: store committed, corpus batch dir never landed.
    The replay must regenerate the batch directory from the recorded
    decision."""
    import shutil

    _write_jsonl(os.path.join(dirs["in"], "b1.jsonl"), [(1, BASE), (2, OTHER)])
    p = _pipeline(spark, dirs)
    p.run_until_drained()
    shutil.rmtree(os.path.join(dirs["corpus"], "batch-stream-0"))
    assert p.read_corpus().count() == 0

    batch = spark.createDataFrame([(1, BASE), (2, OTHER)], ["doc_id", "text"])
    p._process_batch(batch, 0)
    assert sorted(r["doc_id"] for r in p.read_corpus().collect()) == [1, 2]


def test_cli_corpus_ingest_roundtrip(spark, dirs, capsys):
    from hedera_etl_spark import cli

    _write_jsonl(
        os.path.join(dirs["in"], "b1.jsonl"), [(1, BASE), (2, BASE), (3, OTHER)]
    )
    rc = cli.main(
        [
            "corpus-ingest",
            "--input-dir", dirs["in"],
            "--corpus-table", dirs["corpus"],
            "--store", dirs["store"],
            "--checkpoint", dirs["ckpt"],
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "accepted=2" in out and "dropped_exact=1" in out
