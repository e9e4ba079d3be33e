"""BPE merge-loop semantics (operators/vocab.bpe_merges / bpe_segment).

Pins the training loop against hand-computed merges and against an
independent in-Python reference implementation, including the greedy
left-to-right non-overlap rule that the oracle expresses as
gaps-and-islands.
"""

from collections import Counter

import pytest

from hedera_etl_spark.operators.vocab import bpe_merges, bpe_segment


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _py_bpe(texts, k):
    """Independent reference: classic dict-of-word-tuples BPE trainer."""
    words = Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[w] += 1
    state = {tuple(w): c for w, c in words.items()}
    merges = []
    for step in range(1, k + 1):
        pairs = Counter()
        for syms, c in state.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # argmax with (tf DESC, lhs ASC, rhs ASC) tie-break
        (lhs, rhs), tf = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, lhs, rhs, lhs + rhs, tf))
        new_state = {}
        for syms, c in state.items():
            out = []
            for s in syms:
                if out and out[-1] == lhs and s == rhs:
                    out[-1] = lhs + rhs
                else:
                    out.append(s)
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + c
        state = new_state
    return merges


def test_hand_computed_two_rounds(spark):
    # corpus "ab ab abc": round 1 pair (a,b) tf=3; round 2 (ab,c) tf=1
    out = bpe_merges(_docs(spark, ["ab ab", "abc"]), k=5).collect()
    got = [(r.step, r.lhs, r.rhs, r.merged, r.tf) for r in out]
    assert got == [(1, "a", "b", "ab", 3), (2, "ab", "c", "abc", 1)]


def test_greedy_nonoverlap_rule(spark):
    # "aaaa": candidates (a,a) at positions 1..3 overlap; greedy
    # left-to-right applies positions 1 and 3 -> ["aa","aa"], so round 1
    # tf counts 3 CANDIDATES but round 2 sees exactly one (aa,aa) pair.
    out = bpe_merges(_docs(spark, ["aaaa"]), k=3).collect()
    got = [(r.step, r.lhs, r.rhs, r.merged, r.tf) for r in out]
    assert got == [(1, "a", "a", "aa", 3), (2, "aa", "aa", "aaaa", 1)]


def test_odd_run_leaves_singleton(spark):
    # "aaa" -> ["aa","a"]; the leftover single 'a' then merges as
    # (aa,a) in round 2.
    out = bpe_merges(_docs(spark, ["aaa"]), k=3).collect()
    got = [(r.step, r.lhs, r.rhs, r.merged) for r in out]
    assert got == [(1, "a", "a", "aa"), (2, "aa", "a", "aaa")]


def test_matches_python_reference(spark):
    texts = [
        "low low low lower lowest",
        "new newer newest newest",
        "wide wider widest low new",
        "seen unseen scene",
    ]
    k = 10
    expected = _py_bpe(texts, k)
    out = bpe_merges(_docs(spark, texts), k=k).collect()
    got = [(r.step, r.lhs, r.rhs, r.merged, r.tf) for r in out]
    assert got == expected


def test_early_stop_when_exhausted(spark):
    # single one-word corpus: only len-1 merges possible, then no pairs
    out = bpe_merges(_docs(spark, ["ab"]), k=10).collect()
    assert len(out) == 1
    assert out[0].merged == "ab"


def test_segment_applies_merges_in_order(spark):
    docs = _docs(spark, ["ab ab", "abc"])
    merges = [
        (r.step, r.lhs, r.rhs, r.merged, r.tf)
        for r in bpe_merges(docs, k=5).collect()
    ]
    seg = {
        (r.doc_id, r.term): list(r.pieces)
        for r in bpe_segment(docs, merges).collect()
    }
    assert seg[(0, "ab")] == ["ab"]
    assert seg[(1, "abc")] == ["abc"]
    # unseen word segments with the learned pieces, greedily
    unseen = bpe_segment(_docs(spark, ["abab abd"]), merges).collect()
    got = {r.term: list(r.pieces) for r in unseen}
    assert got["abab"] == ["ab", "ab"]
    assert got["abd"] == ["ab", "d"]


def test_k_validation(spark):
    with pytest.raises(ValueError):
        bpe_merges(_docs(spark, ["ab"]), k=0)


def test_bpe_encode_ids_and_roundtrip(spark):
    """bpe_encode: piece sequences reassemble every term exactly, ids
    are frequency-ranked (most frequent piece = id 1), and the encode is
    deterministic across runs."""
    from hedera_etl_spark.operators.vocab import bpe_encode, bpe_merges

    docs = spark.createDataFrame(
        [
            (1, "low low low lower lowest"),
            (2, "low lower newer newest"),
        ],
        ["doc_id", "text"],
    )
    merges = [
        (r["step"], r["lhs"], r["rhs"])
        for r in bpe_merges(docs, k=4).orderBy("step").collect()
    ]
    enc = bpe_encode(docs, merges)
    rows = enc.collect()
    # reassembly: concatenating a term's pieces in piece_pos order gives
    # the term back, for every (doc, term)
    by_term = {}
    for r in rows:
        by_term.setdefault((r["doc_id"], r["term"]), []).append(
            (r["piece_pos"], r["piece"])
        )
    for (_, term), pieces in by_term.items():
        assert "".join(p for _, p in sorted(pieces)) == term
    # ids: dense 1..V, frequency-ranked with the (freq desc, piece) tie rule
    ids = {r["piece"]: r["piece_id"] for r in rows}
    assert sorted(set(ids.values())) == list(range(1, len(ids) + 1))
    # the most frequent piece (by per-OCCURRENCE count) must hold id 1
    from collections import Counter

    seg = {t: [p for _, p in sorted(v)] for (d, t), v in by_term.items()}
    c = Counter()
    for _, text in [(1, "low low low lower lowest"), (2, "low lower newer newest")]:
        for t in text.split(" "):
            c.update(seg[t])
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
    assert ids[top] == 1
    # deterministic
    again = bpe_encode(docs, merges)
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))
