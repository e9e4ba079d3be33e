"""Trainable quality filter: logistic regression over the engine's text
signals, trained with the bounded-driver-state iterative pattern.

Production pipelines (CCNet, Llama's quality filtering) train a small
classifier on weak labels (known-good reference text vs raw crawl) and
score the full corpus with it.  The Spark-shaped version:

- features are the engine's own per-doc signals (quality_scores +
  repetition_scores) — named DOUBLE columns, so the whole feature
  stage is codegen'd projection;
- training is batch gradient descent where each iteration is ONE
  aggregate producing d+1 gradient sums (d = feature count, single
  digits) — the driver holds only the weight vector between rounds,
  the same bounded-collect discipline as ``ivf_train_kmeans``'s
  k x dims statistics.  Train on a sample (``hash_sample``) when the
  corpus is large: the scorer, not the trainer, is the 100 TB pass;
- scoring is a pure per-row projection (sigmoid of a literal-weight
  dot) — zero shuffle, runs inline in any pipeline stage.

Determinism: features are exact-integer-derived DECIMAL-rounded
doubles, but the gradient aggregate sums floats in task-completion
order, so re-trained weights agree only to float noise (same caveat as
``ivf_train_kmeans``).  PERSIST THE WEIGHTS — scoring with a stored
weight vector is exactly reproducible anywhere; training is the
one-off.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.operators.textanalysis import (
    quality_scores,
    repetition_scores_scalable,
)

#: Feature column order — the weight vector contract.
FEATURES = [
    "ttr",
    "avg_token_len",
    "stopword_ratio",
    "dup_line_frac",
    "top_token_frac",
    "top_bigram_char_frac",
    "log_n_tokens",
]


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, <FEATURES...>) — the standard feature projection feeding
    both training and scoring."""
    q = quality_scores(docs, text_col, id_col).select(
        "doc_id",
        "ttr",
        "avg_token_len",
        "stopword_ratio",
        F.log(F.col("n_tokens") + 1).alias("log_n_tokens"),
    )
    r = repetition_scores_scalable(docs, text_col, id_col).select(
        "doc_id", "dup_line_frac", "top_token_frac", "top_bigram_char_frac"
    )
    return q.join(r, "doc_id").select("doc_id", *FEATURES)


def _z(weights: list[float]):
    """Linear term with literal weights (weights[0] is the intercept)."""
    z = F.lit(float(weights[0]))
    for w, name in zip(weights[1:], FEATURES):
        z = z + F.lit(float(w)) * F.col(name)
    return z


def train_quality_lr(
    features: DataFrame,
    labels: DataFrame,
    iters: int = 30,
    lr: float = 1.0,
    l2: float = 0.0,
) -> list[float]:
    """Batch-gradient logistic regression on (doc_id, label 0/1) rows.

    Each iteration: one aggregate over the joined training rows
    computing d+1 gradient sums (and the count for normalization) —
    full map-side combine, nothing corpus-sized ever reaches the
    driver.  Returns [intercept, w_1..w_d] ordered as ``FEATURES``.
    """
    train = features.join(labels, "doc_id").persist()
    try:
        n = train.count()
        if n == 0:
            raise ValueError("empty training set")
        weights = [0.0] * (len(FEATURES) + 1)
        for _ in range(iters):
            p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights)))
            err = p - F.col("label")
            row = train.agg(
                F.sum(err).alias("g0"),
                *[
                    F.sum(err * F.col(name)).alias(f"g{j + 1}")
                    for j, name in enumerate(FEATURES)
                ],
            ).collect()[0]
            grads = [float(row[f"g{j}"]) / n for j in range(len(weights))]
            weights = [
                w - lr * (g + l2 * w) for w, g in zip(weights, grads)
            ]
        return weights
    finally:
        train.unpersist()


def score_quality(features: DataFrame, weights: list[float]) -> DataFrame:
    """(doc_id, quality_prob) — pure per-row projection with literal
    weights; the pass that actually touches the full corpus."""
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights)))
    return features.select("doc_id", p.alias("quality_prob"))


def log_loss(features: DataFrame, labels: DataFrame, weights: list[float]) -> float:
    """Mean negative log-likelihood — one aggregate (training telemetry)."""
    eps = 1e-12
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights)))
    row = (
        features.join(labels, "doc_id")
        .agg(
            F.avg(
                -(
                    F.col("label") * F.log(F.greatest(p, F.lit(eps)))
                    + (1 - F.col("label"))
                    * F.log(F.greatest(1 - p, F.lit(eps)))
                )
            ).alias("nll")
        )
        .collect()[0]
    )
    return float(row["nll"])


def filter_by_quality(
    docs: DataFrame,
    weights: list[float],
    min_prob: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``docs`` whose classifier probability reaches ``min_prob`` — the
    deployable corpus filter (same left-semi shape as the heuristic
    floors in llm_pipeline)."""
    keep = (
        score_quality(quality_features(docs, text_col, id_col), weights)
        .filter(F.col("quality_prob") >= min_prob)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(keep, id_col, "left_semi")


def save_weights(weights: list[float], path: str) -> None:
    """Persist a weight vector with its feature contract — scoring with
    stored weights is exactly reproducible anywhere (training is not,
    see module docstring)."""
    import json

    with open(path, "w") as fh:
        json.dump({"features": FEATURES, "weights": list(map(float, weights))}, fh)


def load_weights(path: str) -> list[float]:
    import json

    with open(path) as fh:
        obj = json.load(fh)
    if obj.get("features") != FEATURES:
        raise ValueError(
            f"weight file {path} was trained on features {obj.get('features')}; "
            f"this build expects {FEATURES}"
        )
    return [float(w) for w in obj["weights"]]


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))
