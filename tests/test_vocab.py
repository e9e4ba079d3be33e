"""Tokenizer-corpus statistics: hand-computable counts, coverage curve
monotonicity, and pair derivation."""

import math

from hedera_etl_spark.operators.vocab import pair_stats, vocab_stats


def test_vocab_counts_and_coverage(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a c"), (3, "b")], ["doc_id", "text"]
    )
    rows = {r["term"]: r for r in vocab_stats(docs).collect()}
    # tf: a=3, b=2, c=1 (6 tokens total); df: a=2, b=2, c=1
    assert (rows["a"]["tf"], rows["a"]["df"]) == (3, 2)
    assert (rows["b"]["tf"], rows["b"]["df"]) == (2, 2)
    assert (rows["c"]["tf"], rows["c"]["df"]) == (1, 1)
    assert [rows[t]["rank"] for t in ("a", "b", "c")] == [1, 2, 3]
    assert math.isclose(rows["a"]["cum_frac"], 3 / 6)
    assert math.isclose(rows["b"]["cum_frac"], 5 / 6)
    assert math.isclose(rows["c"]["cum_frac"], 1.0)


def test_coverage_curve_monotone_and_complete(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} w{i % 7}") for i in range(40)],
        ["doc_id", "text"],
    )
    rows = sorted(vocab_stats(docs).collect(), key=lambda r: r["rank"])
    fracs = [r["cum_frac"] for r in rows]
    assert all(b >= a for a, b in zip(fracs, fracs[1:]))
    assert math.isclose(fracs[-1], 1.0)
    assert sum(r["tf"] for r in rows) == 40 * 3


def test_pair_counts(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "b a"), (3, "solo")], ["doc_id", "text"]
    )
    rows = {(r["left"], r["right"]): r["tf"] for r in pair_stats(docs).collect()}
    # doc1 pairs: (a,b),(b,a),(a,b); doc2: (b,a); doc3 has no pair
    assert rows == {("a", "b"): 2, ("b", "a"): 2}
