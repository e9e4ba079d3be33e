"""Bigram-LM scoring semantics (operators/lmscore.py): hand-computed
probabilities, the two backoff regimes, and the perplexity filter."""

import math
from decimal import ROUND_HALF_UP, Decimal

from hedera_etl_spark.operators.lmscore import (
    bigram_lm,
    lm_scores,
    perplexity_filter,
)


def _lp(p: float) -> float:
    """ln(p) rounded to the operator's DECIMAL(12,6) grid (HALF_UP,
    Spark's decimal-cast rounding)."""
    return float(
        Decimal(repr(math.log(p))).quantize(Decimal("0.000001"), ROUND_HALF_UP)
    )


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_hand_computed_model_and_scores(spark):
    # corpus: "a b a b" + "a b" -> c2={(a,b):3,(b,a):1}, c1={a:3,b:1}, V=2
    docs = _docs(spark, [(0, "a b a b"), (1, "a b")])
    model = bigram_lm(docs)
    got = {(r.w1, r.w2): (r.c2, r.c1, r.v) for r in model.collect()}
    assert got == {("a", "b"): (3, 3, 2), ("b", "a"): (1, 1, 2)}

    p_b_a = (3 + 0.5) / (3 + 0.5 * 2)  # 0.875
    p_a_b = (1 + 0.5) / (1 + 0.5 * 2)  # 0.75
    scores = {r.doc_id: r for r in lm_scores(docs, model).collect()}
    assert scores[0].n_bigrams == 3
    exp0 = round(2 * _lp(p_b_a) + _lp(p_a_b), 6)
    assert scores[0].sum_logp == exp0
    assert scores[0].avg_logp == exp0 / 3
    assert scores[1].n_bigrams == 1
    assert scores[1].sum_logp == _lp(p_b_a)


def test_backoff_regimes(spark):
    train = _docs(spark, [(0, "a b a b"), (1, "a b")])
    model = bigram_lm(train)
    # seen context, unseen continuation: p = K / (c1 + K*V) = 0.5 / 4
    # unseen context: p = K / (K*V) = 1 / V = 0.5
    new = _docs(spark, [(10, "a c"), (11, "z q")])
    scores = {r.doc_id: r for r in lm_scores(new, model).collect()}
    assert scores[10].sum_logp == _lp(0.5 / (3 + 0.5 * 2))
    assert scores[11].sum_logp == _lp(0.5 / (0.5 * 2))


def test_no_bigram_docs_are_excluded_from_scores(spark):
    docs = _docs(spark, [(0, "a b"), (1, "solo"), (2, "")])
    model = bigram_lm(docs)
    assert [r.doc_id for r in lm_scores(docs, model).collect()] == [0]


def test_perplexity_filter_drops_surprising_docs(spark):
    train = _docs(spark, [(i, "a b a b a b") for i in range(5)])
    model = bigram_lm(train)
    mixed = _docs(spark, [(100, "a b a b"), (101, "b b b b")])
    scores = {r.doc_id: r.avg_logp for r in lm_scores(mixed, model).collect()}
    assert scores[100] > scores[101]  # fluent beats repetitive-unseen
    cut = (scores[100] + scores[101]) / 2
    kept = perplexity_filter(mixed, model, min_avg_logp=cut).collect()
    assert [r.doc_id for r in kept] == [100]
    # short docs pass through unjudged
    shorties = _docs(spark, [(200, "solo")])
    assert perplexity_filter(shorties, model, min_avg_logp=0.0).count() == 1


def test_pipeline_lm_floor(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    # distinct fluent texts (identical ones would exact-dedup away) +
    # one rare-phrasing doc; self-trained LM ranks it lowest
    fluent = [
        (i, f"the quick brown fox number {i} jumps over the lazy dog")
        for i in range(8)
    ]
    weird = [(100, "dog the over fox quick jumps lazy brown the")]
    docs = _docs(spark, fluent + weird)
    model = bigram_lm(docs)
    scores = {r.doc_id: r.avg_logp for r in lm_scores(docs, model).collect()}
    assert scores[100] == min(scores.values())
    cut = (scores[100] + sorted(scores.values())[1]) / 2
    out = prepare_training_corpus(
        docs, near_threshold=None, min_tokens=0, lm_min_avg_logp=cut
    )
    ids = sorted(r["doc_id"] for r in out.collect())
    assert ids == list(range(8))


def test_pipeline_lm_floor_with_reference_model(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    ref = _docs(spark, [(i, "a b c d a b c d") for i in range(4)])
    model = bigram_lm(ref)
    docs = _docs(spark, [(1, "a b c d"), (2, "q w e r")])
    out = prepare_training_corpus(
        docs,
        near_threshold=None,
        min_tokens=0,
        lm_model=model,
        # doc 1 scores ~ln(0.85) ~ -0.16; doc 2 is all unseen contexts
        # at p = 1/V = 0.25 -> avg ~ -1.386
        lm_min_avg_logp=-0.7,
    )
    assert [r["doc_id"] for r in out.collect()] == [1]
