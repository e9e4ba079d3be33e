"""Trainable quality filter (operators/qualityfilter.py): convergence on
separable data, loss decrease, scorer purity, end-to-end filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hedera_etl_spark.operators.qualityfilter import (
    FEATURES,
    filter_by_quality,
    log_loss,
    quality_features,
    score_quality,
    train_quality_lr,
)


def _corpus(spark):
    """Good docs: varied prose.  Bad docs: keyword-stuffed repetition —
    separable on top_token_frac / ttr by construction."""
    good = [
        (i, f"document number {i} discusses a range of distinct topics with varied words item{i} detail{i} aspect{i}")
        for i in range(40)
    ]
    bad = [
        (100 + i, ("spam " * 12 + f"x{i}").strip())
        for i in range(40)
    ]
    return (
        spark.createDataFrame(good + bad, ["doc_id", "text"]),
        spark.createDataFrame(
            [(i, 1.0) for i, _ in good] + [(i, 0.0) for i, _ in bad],
            ["doc_id", "label"],
        ),
    )


@pytest.fixture(scope="module")
def trained(spark):
    docs, labels = _corpus(spark)
    feats = quality_features(docs).persist()
    w = train_quality_lr(feats, labels, iters=40, lr=1.0)
    return docs, labels, feats, w


def test_training_reduces_loss_and_separates(spark, trained):
    docs, labels, feats, w = trained
    assert log_loss(feats, labels, w) < log_loss(feats, labels, [0.0] * (len(FEATURES) + 1))
    scored = score_quality(feats, w).join(labels, "doc_id")
    acc = scored.filter(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1.0))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0.0))
    ).count() / scored.count()
    assert acc >= 0.9, acc


def test_retraining_reproduces_weights_and_decisions(spark, trained):
    """Float aggregate combine-order varies with task completion, so
    exact weight equality is NOT promised (the docstring's persist-the-
    weights caveat); re-training must still land within float-noise and
    produce identical keep/drop decisions."""
    docs, labels, feats, w = trained
    again = train_quality_lr(feats, labels, iters=40, lr=1.0)
    for a, b in zip(w, again):
        assert a == pytest.approx(b, rel=1e-6, abs=1e-9)
    d1 = {r["doc_id"] for r in filter_by_quality(docs, w).collect()}
    d2 = {r["doc_id"] for r in filter_by_quality(docs, again).collect()}
    assert d1 == d2


def test_scorer_is_pure_projection(spark, trained):
    """The corpus-wide pass must be shuffle-free and JVM-only above its
    feature inputs."""
    docs, labels, feats, w = trained
    plan = (
        score_quality(feats, w)._jdf.queryExecution().optimizedPlan().toString()
    )
    assert "pythonUDF" not in plan and "PythonUDF" not in plan


def test_filter_by_quality_end_to_end(spark, trained):
    docs, labels, feats, w = trained
    kept = {r["doc_id"] for r in filter_by_quality(docs, w, min_prob=0.5).collect()}
    good_ids = {r["doc_id"] for r in labels.filter("label = 1.0").collect()}
    bad_ids = {r["doc_id"] for r in labels.filter("label = 0.0").collect()}
    # overwhelmingly keeps good, drops bad
    assert len(kept & good_ids) >= 0.9 * len(good_ids)
    assert len(kept & bad_ids) <= 0.1 * len(bad_ids)


def test_feature_stage_matches_contract(spark):
    docs, _ = _corpus(spark)
    cols = quality_features(docs).columns
    assert cols == ["doc_id", *FEATURES]


def test_weights_round_trip_and_contract_guard(spark, trained, tmp_path):
    from hedera_etl_spark.operators.qualityfilter import load_weights, save_weights

    docs, labels, feats, w = trained
    path = str(tmp_path / "weights.json")
    save_weights(w, path)
    assert load_weights(path) == [float(x) for x in w]
    # contract mismatch must refuse loudly, not mis-apply weights
    import json

    bad = {"features": ["other"], "weights": [0.0]}
    badpath = str(tmp_path / "bad.json")
    with open(badpath, "w") as fh:
        json.dump(bad, fh)
    with pytest.raises(ValueError):
        load_weights(badpath)


def test_pipeline_applies_trained_filter(spark, trained):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    docs, labels, feats, w = trained
    out = prepare_training_corpus(
        docs,
        near_threshold=None,
        min_tokens=0,
        quality_weights=w,
        min_quality_prob=0.5,
    )
    kept = {r["doc_id"] for r in out.collect()}
    bad_ids = {r["doc_id"] for r in labels.filter("label = 0.0").collect()}
    assert len(kept & bad_ids) <= 0.1 * len(bad_ids)
