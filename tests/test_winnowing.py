"""Winnowing fingerprint semantics (operators/textanalysis.winnow
_fingerprints / fingerprint_overlap): the MOSS guarantee and the
selection rule, against a sequential reference implementation."""

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from hedera_etl_spark.operators.textanalysis import (
    fingerprint_overlap,
    winnow_fingerprints,
)


def _hash60(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int) -> set:
    toks = text.split(" ")
    if len(toks) < k:
        return set()
    hs = [_hash60(" ".join(toks[i : i + k])) for i in range(len(toks) - k + 1)]
    n_win = max(len(hs) - w + 1, 1)
    return {min(hs[j : j + w]) for j in range(n_win)}


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _fps(spark, texts, k=4, w=5):
    out = {}
    for r in winnow_fingerprints(_docs(spark, texts), k=k, w=w).collect():
        out.setdefault(r.doc_id, set()).add(r.fp)
    return out


def test_matches_reference_implementation(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "short doc",
        "a b c d",  # exactly k tokens: one gram, one fingerprint
        "",
    ]
    got = _fps(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, 4, 5), i


def test_winnowing_guarantee_shared_run(spark):
    # docs share a run of w + k - 1 = 8 tokens inside different contexts
    # -> the guarantee forces at least one common fingerprint
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    a = f"alpha beta {shared} gamma delta"
    b = f"one two three {shared} four"
    got = _fps(spark, [a, b])
    assert got[0] & got[1]


def test_disjoint_docs_share_nothing(spark):
    got = _fps(spark, ["a b c d e f g h i", "q r s t u v w x y"])
    assert not (got[0] & got[1])


def test_overlap_detector(spark):
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = _docs(
        spark,
        [f"alpha beta {shared}", f"one two {shared} three", "totally different text here okay"],
    )
    fps = winnow_fingerprints(docs, k=4, w=5)
    pairs = {
        (r.doc_a, r.doc_b): r.shared
        for r in fingerprint_overlap(fps).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(2 not in p for p in pairs)


def test_validation(spark):
    with pytest.raises(ValueError):
        winnow_fingerprints(_docs(spark, ["a"]), k=0)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(st.text(alphabet="ab", min_size=1, max_size=3), min_size=0, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=5,
    ),
    k=st.integers(1, 4),
    w=st.integers(1, 5),
)
def test_any_corpus_matches_reference(spark, texts, k, w):
    got = _fps(spark, texts, k=k, w=w)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _py_winnow(t, k, w), (i, t)


def test_pipeline_winnow_detector(spark):
    """near_dup_method='winnow' catches CONTAINMENT (a page embedded in
    a larger doc) that set-Jaccard minhash under-scores."""
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    page = " ".join(f"p{i}" for i in range(30))
    docs = _docs(
        spark,
        [
            page,  # doc 0: the page alone
            "intro words " + page + " plus a long unrelated tail "
            + " ".join(f"t{i}" for i in range(40)),  # doc 1: contains it
            "completely different content " + " ".join(f"z{i}" for i in range(25)),
        ],
    )
    # minhash at 0.5: jaccard(page, doc1) ~ 30/95 < 0.5 -> no collapse
    mh = prepare_training_corpus(
        docs, id_col="doc_id", min_tokens=0, near_threshold=0.5
    )
    assert sorted(r.doc_id for r in mh.collect()) == [0, 1, 2]
    # winnow: the shared 30-token run forces shared fingerprints
    wn = prepare_training_corpus(
        docs, id_col="doc_id", min_tokens=0, near_threshold=0.5,
        near_dup_method="winnow", winnow_min_shared=3,
    )
    assert sorted(r.doc_id for r in wn.collect()) == [0, 2]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="near_dup_method"):
        prepare_training_corpus(
            docs, min_tokens=0, near_threshold=0.5, near_dup_method="nope"
        ).collect()


def test_hot_fingerprint_cap(spark):
    """r7 second-review finding: a boilerplate fingerprint shared by N
    docs must not go quadratic — over-cap fps drop from pairing."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = _docs(spark, [f"d{i} filler {shared}" for i in range(6)])
    fps = winnow_fingerprints(docs, k=4, w=5)
    capped = fingerprint_overlap(fps, min_shared=1, max_fp=3).collect()
    uncapped = fingerprint_overlap(fps, min_shared=1, max_fp=None).collect()
    assert len(uncapped) == 15  # all C(6,2) pairs via the shared run
    # the shared-run fps exceed the cap; only doc-specific overlap remains
    assert len(capped) < len(uncapped)
