"""BM25 / TF-IDF retrieval: scoring correctness against a hand
-computable corpus, ranking sanity, plan shape, and determinism."""

import math

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.retrieval import (
    C1,
    C2,
    C3,
    bm25_topk,
    term_postings,
    tfidf_vectors,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "apple banana apple cherry"),          # tf(apple)=2, dl=4
        (2, "apple banana banana banana durian"),  # dl=5
        (3, "cherry cherry cherry cherry"),        # no query terms below
        (4, "apple"),                              # dl=1
        (5, "durian elder fig grape"),             # dl=4
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_postings_tf_and_dl(spark, corpus):
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"])
        for r in term_postings(corpus, ["apple", "banana"]).collect()
    }
    assert rows == {
        (1, "apple"): (2, 4),
        (1, "banana"): (1, 4),
        (2, "apple"): (1, 5),
        (2, "banana"): (3, 5),
        (4, "apple"): (1, 1),
    }


def _bm25_ref(tf, dl, df, n_docs, avgdl):
    idf = (n_docs - df + 0.5) / (df + 0.5)
    return idf * (tf * C1) / (tf + (C2 + C3 * (dl / avgdl)))


def test_scores_match_reference_formula(spark, corpus):
    out = {r["doc_id"]: r for r in bm25_topk(corpus, ["apple", "banana"], k=10).collect()}
    n_docs, avgdl = 5, (4 + 5 + 4 + 1 + 4) / 5
    dfs = {"apple": 3, "banana": 2}
    expect = {
        1: _bm25_ref(2, 4, 3, n_docs, avgdl) + _bm25_ref(1, 4, 2, n_docs, avgdl),
        2: _bm25_ref(1, 5, 3, n_docs, avgdl) + _bm25_ref(3, 5, 2, n_docs, avgdl),
        4: _bm25_ref(1, 1, 3, n_docs, avgdl),
    }
    assert set(out) == set(expect)
    for d, s in expect.items():
        # engine rounds per-term to DECIMAL(12,6) before the sum
        assert math.isclose(out[d]["score"], s, abs_tol=2e-6)
    assert out[1]["n_terms_hit"] == 2 and out[4]["n_terms_hit"] == 1


def test_topk_limits_and_orders(spark, corpus):
    rows = bm25_topk(corpus, ["apple", "banana"], k=2).collect()
    assert len(rows) == 2
    assert rows[0]["score"] >= rows[1]["score"]
    # doc 3 and 5 contain no query terms — never retrieved
    all_rows = bm25_topk(corpus, ["apple", "banana"], k=10).collect()
    assert {r["doc_id"] for r in all_rows} == {1, 2, 4}


def test_topk_plan_is_take_ordered(spark, corpus):
    plan = bm25_topk(corpus, ["apple"], k=3)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_tfidf_values(spark, corpus):
    rows = {
        (r["doc_id"], r["term"]): r["tfidf"]
        for r in tfidf_vectors(corpus, ["apple", "banana"]).collect()
    }
    # doc 4: tf=1, dl=1, df(apple)=3, N=5 -> 1.0 * (5-3+0.5)/(3+0.5)
    assert math.isclose(rows[(4, "apple")], 2.5 / 3.5, abs_tol=1e-6)
    # doc 2 banana: tf=3, dl=5, df=2 -> 0.6 * 3.5/2.5
    assert math.isclose(rows[(2, "banana")], 0.6 * 3.5 / 2.5, abs_tol=1e-6)


def test_deterministic_across_runs(spark, corpus):
    a = [tuple(r) for r in bm25_topk(corpus, ["apple", "banana"], k=5).collect()]
    b = [tuple(r) for r in bm25_topk(corpus, ["apple", "banana"], k=5).collect()]
    assert a == b


def test_rare_term_idf_beyond_decimal12_scale_no_null_dropout(spark):
    """ADVICE r7 regression: rational idf ~ N/df overflows a
    DECIMAL(12,6) intermediate (~1e6 cap) for rare terms once the corpus
    passes ~7e5 docs; before the DECIMAL(38,6) widening, a non-ANSI CAST
    would NULL the WHOLE document score silently (ANSI would throw).
    Drive the real product path with a 2M-doc corpus whose rare-term idf
    is ~1.3e6 — above the old cap — and pin: every returned score is
    non-null, the rare+common doc wins, and its score itself exceeds the
    old 1e6 ceiling (proof the intermediate actually crossed it)."""
    n = 2_000_000
    docs = spark.range(n).selectExpr(
        "id AS doc_id",
        # doc 0 holds the rare term 4 times -> BM25 tf saturation keeps
        # its contribution ~ idf * 1.0 ~ (n-0.5)/1.5 ~ 1.33e6
        "CASE WHEN id = 0 THEN 'rare rare rare rare common'"
        "     ELSE 'common filler' END AS text",
    )
    top = bm25_topk(docs, ["rare", "common"], k=5).collect()
    assert len(top) == 5
    assert all(r["score"] is not None for r in top)
    assert top[0]["doc_id"] == 0
    assert top[0]["n_terms_hit"] == 2
    # the winning score embeds the ~1.33e6 idf term: past DECIMAL(12,6)
    assert top[0]["score"] > 1_000_000.0
    # every other doc scores only the ubiquitous term: its idf
    # ~0.5/2e6 rounds to 0 at decimal scale 6 — non-NULL is the point
    assert all(0.0 <= r["score"] < 1.0 for r in top[1:])
