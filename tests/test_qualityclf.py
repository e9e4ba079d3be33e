"""fastText-style quality classifier (operators/qualityclf.py): score
agreement with an independent Python reference, the NULL/empty-text
contract the oracle data can't exercise, custom-weight override, and
the broadcast-scoring plan pin."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.qualityclf import (
    FEAT_SALT,
    WEIGHT_SALT,
    doc_features,
    linear_weights,
    quality_classifier_scores,
)
from tests.planutil import plan_of

B = 64
SCALE = 1000


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_bucket(feat: str, n_buckets: int = B) -> int:
    return int(hashlib.md5(f"{FEAT_SALT}{feat}".encode()).hexdigest()[:8], 16) % n_buckets


def _py_weight(bucket: int, scale: int = SCALE) -> int:
    h = int(hashlib.md5(f"{WEIGHT_SALT}{bucket}".encode()).hexdigest()[:8], 16)
    return h % (2 * scale + 1) - scale


def _py_features(text: str) -> list[str]:
    toks = [t for t in text.lower().split() if t]
    return toks + [f"{a}\x1f{b}" for a, b in zip(toks, toks[1:])]


def _py_score(text: str) -> tuple[int, int, float, bool]:
    feats = _py_features(text)
    w_sum = sum(_py_weight(_py_bucket(f)) for f in feats)
    n = len(feats)
    raw = w_sum / (SCALE * max(n, 1))
    score = 0.5 + raw / (2.0 * (1.0 + abs(raw)))
    return n, w_sum, round(score, 6), w_sum >= 0


ROWS = [
    (1, "The quick Brown fox jumps over the LAZY dog"),
    (2, "single"),
    (3, "two tokens"),
    (4, "  leading and   trailing   whitespace  "),
    (5, "repeat repeat repeat repeat"),
]


def test_scores_match_python_reference(spark):
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(
            _docs(spark, ROWS), n_buckets=B, scale=SCALE
        ).collect()
    }
    assert len(out) == len(ROWS)
    for doc_id, text in ROWS:
        n, w_sum, score, keep = _py_score(text)
        row = out[doc_id]
        assert row["n_feats"] == n, (doc_id, text)
        assert row["w_sum"] == w_sum, (doc_id, text)
        assert row["score"] == pytest.approx(score, abs=1e-6), (doc_id, text)
        assert row["keep"] == keep, (doc_id, text)


def test_null_and_empty_text_kept_at_midpoint(spark):
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(
            _docs(spark, [(1, None), (2, ""), (3, "   "), (4, "real text here")]),
            n_buckets=B,
        ).collect()
    }
    assert len(out) == 4  # unscorable docs are NOT silently dropped
    for doc_id in (1, 2, 3):
        row = out[doc_id]
        assert (row["n_feats"], row["w_sum"]) == (0, 0)
        assert row["score"] == 0.5
        assert row["keep"] is True
    assert out[4]["n_feats"] == 5  # 3 unigrams + 2 bigrams


def test_feature_bag_is_unigrams_plus_bigrams(spark):
    feats = (
        doc_features(_docs(spark, [(7, "a b c")]), n_buckets=B)
        .groupBy("bucket")
        .count()
        .collect()
    )
    expect: dict[int, int] = {}
    for f in ["a", "b", "c", "a\x1fb", "b\x1fc"]:
        b = _py_bucket(f)
        expect[b] = expect.get(b, 0) + 1
    assert {r["bucket"]: r["count"] for r in feats} == expect


def test_custom_weights_override_standin(spark):
    # all-positive weights -> every scored doc keeps, score > 0.5
    wdf = spark.range(B).select(
        F.col("id").alias("bucket"), F.lit(7).cast("long").alias("w_int")
    )
    row = quality_classifier_scores(
        _docs(spark, [(1, "alpha beta")]), weights=wdf, n_buckets=B
    ).collect()[0]
    assert row["w_sum"] == 3 * 7  # 2 unigrams + 1 bigram
    assert row["keep"] is True and row["score"] > 0.5


def test_weight_table_bounded_and_deterministic(spark):
    rows = linear_weights(spark, n_buckets=B, scale=SCALE).collect()
    assert len(rows) == B
    for r in rows:
        assert -SCALE <= r["w_int"] <= SCALE
        assert r["w_int"] == _py_weight(r["bucket"])


def test_scoring_plan_broadcasts_weights_single_doc_exchange(spark):
    plan = plan_of(
        quality_classifier_scores(_docs(spark, ROWS), n_buckets=B)
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    # the corpus side must never shuffle on bucket — doc-keyed exchanges only
    assert "hashpartitioning(bucket" not in plan


def test_prepare_text_classifier_floor(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus
    from hedera_etl_spark.operators.provenance import RemovalLedger

    # stand-in scores straddle 0.5: alpha/gamma/delta high, beta/theta/kappa low
    rows = [
        (1, "alpha gamma"),
        (2, "beta theta"),
        (3, "delta iota"),
        (4, "kappa kappa"),
        (5, "gamma delta iota"),
        (6, "theta beta kappa"),
    ]
    docs = _docs(spark, rows)
    expect_keep = sorted(
        doc_id for doc_id, text in rows if _py_score(text)[2] >= 0.5
    )
    expect_drop = sorted(
        doc_id for doc_id, text in rows if _py_score(text)[2] < 0.5
    )
    assert expect_keep and expect_drop  # the fixture must exercise both sides

    ledger = RemovalLedger()
    out = prepare_training_corpus(
        docs,
        near_threshold=None,
        min_tokens=1,
        text_classifier_weights=True,
        text_classifier_min_score=0.5,
        text_classifier_buckets=B,
        text_classifier_scale=SCALE,
        removal_ledger=ledger,
    )
    assert sorted(r["doc_id"] for r in out.collect()) == expect_keep
    dropped = {
        r["doc_id"]
        for r in ledger.df().filter(F.col("reason") == "text_classifier").collect()
    }
    assert dropped == set(expect_drop)


def test_prepare_text_classifier_trained_weights_override(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    docs = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    all_negative = spark.range(B).select(
        F.col("id").alias("bucket"), F.lit(-3).cast("long").alias("w_int")
    )
    out = prepare_training_corpus(
        docs,
        near_threshold=None,
        min_tokens=1,
        text_classifier_weights=all_negative,
        text_classifier_buckets=B,
    )
    assert out.count() == 0  # trained table wins over the stand-in


def test_train_nb_weights_separates_classes(spark):
    from hedera_etl_spark.operators.qualityclf import train_nb_weights

    pos = _docs(
        spark,
        [(i, "curated encyclopedia prose reads cleanly and cites sources")
         for i in range(1, 9)],
    )
    neg = _docs(
        spark,
        [(i, "click here buy now cheap pills winner jackpot spam")
         for i in range(1, 9)],
    )
    w = train_nb_weights(pos, neg, n_buckets=B, scale=SCALE)
    rows = w.collect()
    assert len(rows) == B
    assert all(-SCALE <= r["w_int"] <= SCALE for r in rows)

    held_out = _docs(
        spark,
        [
            (1, "encyclopedia prose cites sources"),        # pos-like
            (2, "cheap pills jackpot spam click"),          # neg-like
        ],
    )
    out = {
        r["doc_id"]: r
        for r in quality_classifier_scores(
            held_out, weights=w, n_buckets=B, scale=SCALE
        ).collect()
    }
    assert out[1]["keep"] is True and out[1]["score"] > 0.5
    assert out[2]["keep"] is False and out[2]["score"] < 0.5
    assert out[1]["score"] > out[2]["score"]


def test_train_nb_weights_unseen_buckets_near_zero(spark):
    from hedera_etl_spark.operators.qualityclf import train_nb_weights

    # balanced corpora over a tiny vocab -> the many untouched buckets
    # carry only the smoothing prior, which cancels when totals match
    pos = _docs(spark, [(1, "aaa bbb")])
    neg = _docs(spark, [(1, "ccc ddd")])
    w = {r["bucket"]: r["w_int"]
         for r in train_nb_weights(pos, neg, n_buckets=B, scale=SCALE).collect()}
    touched = set()
    for f in ["aaa", "bbb", "ccc", "ddd", "aaa\x1fbbb", "ccc\x1fddd"]:
        touched.add(_py_bucket(f))
    for b, wi in w.items():
        if b not in touched:
            assert wi == 0, (b, wi)


def test_cli_classifier_train_then_prepare(spark, tmp_path, capsys):
    """classifier-train writes a (bucket, w_int) parquet and prints a
    JSON summary; prepare --text-classifier-weights consumes it and the
    trained floor separates the held-out corpus."""
    import json
    import os

    from hedera_etl_spark import cli

    pos_dir = str(tmp_path / "pos")
    neg_dir = str(tmp_path / "neg")
    _docs(
        spark,
        [(i, "curated encyclopedia prose reads cleanly and cites sources")
         for i in range(1, 9)],
    ).write.parquet(pos_dir)
    _docs(
        spark,
        [(i, "click here buy now cheap pills winner jackpot spam")
         for i in range(1, 9)],
    ).write.parquet(neg_dir)

    w_dir = str(tmp_path / "weights")
    rc = cli.main(
        [
            "classifier-train",
            "--pos-input", pos_dir,
            "--neg-input", neg_dir,
            "--out", w_dir,
            "--n-buckets", str(B),
        ]
    )
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["n_buckets"] == B and summary["nonzero"] > 0

    mixed_dir = str(tmp_path / "mixed")
    _docs(
        spark,
        [(1, "encyclopedia prose cites sources properly and cleanly today"),
         (2, "cheap pills jackpot spam click here winner now")],
    ).write.parquet(mixed_dir)
    out_dir = str(tmp_path / "shards")
    rc = cli.main(
        [
            "prepare",
            "--input", mixed_dir,
            "--out-dir", out_dir,
            "--max-tokens", "64",
            "--n-shards", "1",
            "--exact-only",
            "--min-tokens", "1",
            "--text-classifier-weights", w_dir,
            "--text-classifier-buckets", str(B),
        ]
    )
    assert rc == 0
    kept = {
        r["doc_id"]
        for r in spark.read.parquet(os.path.join(out_dir, "shards")).collect()
    }
    assert kept == {1}
