"""Benchmark decontamination (operators/decontam.py): exact n-gram
overlap against an eval set — correctness, edge cases, and the
broadcast-probe plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from hedera_etl_spark.operators.decontam import (
    contaminated_ids,
    contamination_profile,
    decontaminate,
)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            # exact copy of the eval item -> fully contaminated
            Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
            # contains the eval 5-gram inside fresh text -> partial hit
            Row(doc_id=2, text="intro words then the quick brown fox jumps and more tail text"),
            # clean document, same vocabulary, different order
            Row(doc_id=3, text="dog lazy the over jumps fox brown quick the"),
            # shorter than n tokens: no n-grams, must survive
            Row(doc_id=4, text="tiny doc"),
        ]
    )


@pytest.fixture(scope="module")
def eval_set(spark):
    return spark.createDataFrame(
        [Row(doc_id=100, text="the quick brown fox jumps over the lazy dog")]
    )


def test_profile_counts_exact_overlap(spark, corpus, eval_set):
    prof = {
        r["doc_id"]: r
        for r in contamination_profile(corpus, eval_set, n=5).collect()
    }
    # doc 1 is the eval item verbatim: every 5-gram hits
    assert prof[1]["n_hits"] == prof[1]["n_grams"] == 5
    assert prof[1]["contamination"] == 1.0
    # doc 2 embeds exactly one eval 5-gram ("the quick brown fox jumps")
    assert prof[2]["n_hits"] == 1
    assert 0 < prof[2]["contamination"] < 1
    # doc 3 shares vocabulary but no 5-gram
    assert prof[3]["n_hits"] == 0
    # doc 4 has no 5-grams at all -> no profile row
    assert 4 not in prof


def test_decontaminate_drops_hits_keeps_short_docs(spark, corpus, eval_set):
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, eval_set, n=5).collect())
    assert kept == [3, 4]
    # schema passes through untouched
    assert decontaminate(corpus, eval_set, n=5).columns == corpus.columns


def test_min_hits_threshold(spark, corpus, eval_set):
    # requiring >=2 overlapping grams exonerates the single-gram doc 2
    ids = sorted(
        r["doc_id"] for r in contaminated_ids(corpus, eval_set, n=5, min_hits=2).collect()
    )
    assert ids == [1]


def test_eval_probe_broadcasts_and_stays_jvm(spark, corpus, eval_set):
    """Scale shape: the corpus side is probed by a BROADCAST join (the
    100 TB side is never shuffled for the probe) and no Python UDF leaks
    into the plan."""
    df = contamination_profile(corpus, eval_set, n=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in opt and "PythonUDF" not in opt


def test_shuffled_fallback_matches_broadcast(spark, corpus, eval_set):
    a = sorted(
        tuple(r)
        for r in contamination_profile(corpus, eval_set, n=5, broadcast_eval=True).collect()
    )
    b = sorted(
        tuple(r)
        for r in contamination_profile(corpus, eval_set, n=5, broadcast_eval=False).collect()
    )
    assert a == b


def test_self_decontamination_flags_everything(spark, corpus):
    """Using the corpus as its own eval set contaminates every doc that
    has at least one n-gram."""
    with_grams = corpus.filter(F.size(F.split("text", " ")) >= 5)
    survivors = decontaminate(corpus, corpus, n=5)
    assert survivors.join(with_grams, "doc_id", "left_semi").count() == 0


class TestFuzzyDecontamination:
    """operators/decontam.fuzzy_contamination_pairs / fuzzy_decontaminate."""

    def _pairs(self, spark, docs_rows, eval_rows, n=3, threshold=0.5):
        from hedera_etl_spark.operators.decontam import fuzzy_contamination_pairs

        docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
        evals = spark.createDataFrame(eval_rows, "eval_id long, text string")
        return fuzzy_contamination_pairs(
            docs, evals, n=n, threshold=threshold, eval_id_col="eval_id"
        ).collect()

    def test_hand_computed_jaccard(self, spark):
        # doc shingles (n=3): {a b c, b c d, c d e} ; eval: {a b c, b c d}
        # inter=2, union=3 -> J = 0.666667 (DECIMAL(9,6) HALF_UP)
        rows = self._pairs(
            spark,
            [(1, "a b c d e")],
            [(10, "a b c d")],
            threshold=0.5,
        )
        assert len(rows) == 1
        assert rows[0].doc_id == 1 and rows[0].eval_id == 10
        assert rows[0].jaccard == 0.666667

    def test_threshold_boundary_exclusive_below(self, spark):
        # same geometry, threshold just above the value -> no pair
        assert self._pairs(
            spark, [(1, "a b c d e")], [(10, "a b c d")], threshold=0.67
        ) == []

    def test_identical_doc_scores_one(self, spark):
        rows = self._pairs(spark, [(1, "a b c d")], [(10, "a b c d")], threshold=0.99)
        assert rows[0].jaccard == 1.0

    def test_fuzzy_decontaminate_drops_and_keeps(self, spark):
        from hedera_etl_spark.operators.decontam import fuzzy_decontaminate

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six"),
                (3, "xs"),  # too short for any shingle: must survive
            ],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            # near-dup of doc 1 (prepended token), nothing like doc 2
            [(7, "pre alpha beta gamma delta epsilon zeta")],
            "eval_id long, text string",
        )
        out = fuzzy_decontaminate(
            docs, evals, n=3, threshold=0.7, eval_id_col="eval_id"
        )
        assert sorted(r.doc_id for r in out.collect()) == [2, 3]

    def test_no_banding_loss_multi_eval(self, spark):
        # one doc can hit several eval items; all pairs surface
        rows = self._pairs(
            spark,
            [(1, "a b c d e f")],
            [(10, "a b c d e f"), (11, "z a b c d e f")],
            threshold=0.5,
        )
        assert sorted((r.doc_id, r.eval_id) for r in rows) == [(1, 10), (1, 11)]

    def test_pipeline_fuzzy_stage(self, spark):
        from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

        docs = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six"),
            ],
            "doc_id long, text string",
        )
        evals = spark.createDataFrame(
            [(7, "pre alpha beta gamma delta epsilon zeta")],
            "doc_id long, text string",
        )
        # exact 13-gram decontam misses the paraphrase; the fuzzy stage
        # catches it
        exact_only = prepare_training_corpus(
            docs, near_threshold=None, min_tokens=0, eval_docs=evals
        )
        assert sorted(r.doc_id for r in exact_only.collect()) == [1, 2]
        fuzzy = prepare_training_corpus(
            docs, near_threshold=None, min_tokens=0, eval_docs=evals,
            fuzzy_decontam_threshold=0.7, fuzzy_decontam_n=3,
        )
        assert sorted(r.doc_id for r in fuzzy.collect()) == [2]


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination (giant-reference scale path)
# ---------------------------------------------------------------------------
class TestBloomDecontam:
    def test_equals_exact_operator(self, spark, corpus, eval_set):
        from hedera_etl_spark.operators.decontam import (
            bloom_contaminated_ids,
            contaminated_ids,
        )

        exact = {r["doc_id"] for r in contaminated_ids(corpus, eval_set, n=5).collect()}
        got = {
            r["doc_id"]
            for r in bloom_contaminated_ids(corpus, eval_set, n=5).collect()
        }
        assert got == exact and got  # same decision, nonempty

    def test_forced_false_positives_are_verified_away(self, spark):
        """An undersized Bloom fires on nearly everything; the exact
        verify must still produce the identical contaminated set."""
        from hedera_etl_spark.operators.decontam import (
            bloom_contaminated_ids,
            contaminated_ids,
        )
        from pyspark.sql import functions as F

        docs = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.substring(F.md5(F.concat(F.col("id"), F.lit(f"t{i}"))), 1, 5)
                    for i in range(8)
                ],
            ).alias("text"),
        )
        ref = docs.filter(F.col("doc_id") % 23 == 0).select(
            "doc_id", F.col("text")
        )
        exact = {r["doc_id"] for r in contaminated_ids(docs, ref, n=5).collect()}
        # 64 bits, 2 probes: FP rate near 1 -> almost every shingle is a
        # candidate; equality proves the verify is load-bearing
        got = {
            r["doc_id"]
            for r in bloom_contaminated_ids(docs, ref, n=5, m_bits=64, k=2).collect()
        }
        assert got == exact and got

    def test_min_hits_and_decontaminate(self, spark, corpus, eval_set):
        from hedera_etl_spark.operators.decontam import bloom_decontaminate

        out = {
            r["doc_id"]
            for r in bloom_decontaminate(corpus, eval_set, n=5).collect()
        }
        assert out == {3, 4}  # clean + short survive, 1 and 2 drop
        strict = {
            r["doc_id"]
            for r in bloom_decontaminate(corpus, eval_set, n=5, min_hits=3).collect()
        }
        assert 2 in strict  # only 2 shared 5-grams -> survives min_hits=3

    def test_bloom_table_is_fixed_size_and_probes_broadcast(self, spark, corpus, eval_set):
        from hedera_etl_spark.operators.decontam import (
            bloom_contaminated_ids,
            ngram_bloom,
        )
        from hedera_etl_spark.operators.textdedup import doc_shingles

        sh = doc_shingles(eval_set, n=5).select("shingle").distinct()
        assert ngram_bloom(sh, m_bits=4096, k=4).count() <= 64
        plan = (
            bloom_contaminated_ids(corpus, eval_set, n=5, k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("== Initial Plan ==")[0]
        )
        # the k probes are broadcast hash joins: the corpus side never
        # shuffles before the candidate filter
        assert plan.count("BroadcastHashJoin") >= 3

    def test_k_validation(self, spark, eval_set):
        import pytest as _pytest

        from hedera_etl_spark.operators.decontam import ngram_bloom
        from hedera_etl_spark.operators.textdedup import doc_shingles

        sh = doc_shingles(eval_set, n=5).select("shingle")
        with _pytest.raises(ValueError, match="k must be"):
            ngram_bloom(sh, k=8)
        with _pytest.raises(ValueError, match="k must be"):
            ngram_bloom(sh, k=0)


class TestBloomAutoSizing:
    def test_auto_params_hit_target_fp(self):
        import math

        from hedera_etl_spark.operators.decontam import (
            _BLOOM_MAX_K,
            auto_bloom_params,
            _estimated_fill,
        )

        for n in (100, 10_000, 5_000_000):
            m, k = auto_bloom_params(n, target_fp=0.01)
            assert m % 64 == 0 and 1 <= k <= _BLOOM_MAX_K
            fp = _estimated_fill(n, m, k) ** k
            # k is clamped to the ANSI bound, so the realized FP can sit
            # above the unclamped optimum but must stay the same order
            assert fp <= 0.03, (n, m, k, fp)
        with pytest.raises(ValueError, match="target_fp"):
            auto_bloom_params(1000, target_fp=1.5)

    def test_saturated_explicit_filter_warns_loudly(self, spark, corpus, eval_set):
        import warnings

        from hedera_etl_spark.operators.decontam import bloom_contaminated_ids

        # ~200 distinct 5-gram shingles >> a 64-bit filter's capacity
        big_ref = spark.createDataFrame(
            [(i, " ".join(f"ref{i}w{j}" for j in range(10))) for i in range(40)],
            ["doc_id", "text"],
        )
        # explicit m WITHOUT k: the sizing count runs, so saturation warns
        with pytest.warns(UserWarning, match="saturating"):
            bloom_contaminated_ids(corpus, big_ref, n=5, m_bits=64).collect()
        # fully explicit + caller-provided n_ref: no count job, still loud
        with pytest.warns(UserWarning, match="saturating"):
            bloom_contaminated_ids(
                corpus, big_ref, n=5, m_bits=64, k=2, n_ref=200
            ).collect()
        # the auto size is quiet
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)
            bloom_contaminated_ids(corpus, big_ref, n=5).collect()

    def test_fully_explicit_sizing_skips_reference_count(
        self, spark, corpus, eval_set, monkeypatch
    ):
        """ADVICE r10: with both m_bits and k given (and no n_ref) the
        approx_count_distinct job over the reference must not run — the
        count only phrased a warning there."""
        import hedera_etl_spark.operators.decontam as dc

        def _boom(*a, **kw):
            raise AssertionError("reference count job should be skipped")

        monkeypatch.setattr(dc.F, "approx_count_distinct", _boom)
        got = dc.bloom_contaminated_ids(
            corpus, eval_set, n=5, m_bits=1 << 16, k=4
        ).collect()
        assert got is not None  # ran end-to-end without the count
        # ...but auto sizing still needs (and uses) the count
        with pytest.raises(AssertionError, match="skipped"):
            dc.bloom_contaminated_ids(corpus, eval_set, n=5).collect()

    def test_pipeline_bloom_mode_equals_exact(self, spark, corpus, eval_set):
        from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

        kw = dict(near_threshold=None, min_tokens=0, eval_docs=eval_set)
        exact = prepare_training_corpus(corpus, decontam_mode="exact", **kw)
        bloom = prepare_training_corpus(corpus, decontam_mode="bloom", **kw)
        auto = prepare_training_corpus(corpus, decontam_mode="auto", **kw)
        e = sorted(r["doc_id"] for r in exact.collect())
        assert e == sorted(r["doc_id"] for r in bloom.collect())
        assert e == sorted(r["doc_id"] for r in auto.collect())
        with pytest.raises(ValueError, match="decontam_mode"):
            prepare_training_corpus(corpus, decontam_mode="bogus", **kw).collect()

    def test_auto_mode_token_bound_short_circuit(
        self, spark, corpus, eval_set, monkeypatch
    ):
        """r16: auto mode decides 'exact' from the cheap token-count upper
        bound when it is under the threshold — the explode+distinct+HLL
        reference pass must not run (sum(tokens) >= distinct shingles, so
        the decision is provably identical).  A tiny threshold forces the
        fall-through to the precise count and must still pick bloom, with
        results unchanged."""
        import hedera_etl_spark.operators.decontam as dc
        from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

        kw = dict(near_threshold=None, min_tokens=0, eval_docs=eval_set)
        exact = sorted(
            r["doc_id"]
            for r in prepare_training_corpus(
                corpus, decontam_mode="exact", **kw
            ).collect()
        )
        # threshold 1: bound always exceeds it -> precise count -> bloom
        got = prepare_training_corpus(
            corpus, decontam_mode="auto", bloom_auto_threshold=1, **kw
        )
        assert exact == sorted(r["doc_id"] for r in got.collect())

        def _boom(*a, **kw_):
            raise AssertionError("reference HLL pass should be short-circuited")

        monkeypatch.setattr(dc.F, "approx_count_distinct", _boom)
        # default threshold (2M) dwarfs the eval token bound -> short-circuit
        got = prepare_training_corpus(corpus, decontam_mode="auto", **kw)
        assert exact == sorted(r["doc_id"] for r in got.collect())

    def test_partial_explicit_sizing_pairs_correctly(self, spark, corpus, eval_set):
        """m given without k -> k optimal for THAT m; k given without m
        -> m sized for THAT k (r10 review: pairing an auto value computed
        for the other auto counterpart mismatches)."""
        import warnings

        from hedera_etl_spark.operators.decontam import (
            bloom_contaminated_ids,
            contaminated_ids,
        )

        exact = {r["doc_id"] for r in contaminated_ids(corpus, eval_set, n=5).collect()}
        with warnings.catch_warnings():
            warnings.simplefilter("error", UserWarning)  # well-paired = quiet
            got_m = {
                r["doc_id"]
                for r in bloom_contaminated_ids(
                    corpus, eval_set, n=5, m_bits=1 << 12
                ).collect()
            }
            got_k = {
                r["doc_id"]
                for r in bloom_contaminated_ids(corpus, eval_set, n=5, k=3).collect()
            }
        assert got_m == exact and got_k == exact

    def test_bloom_plus_fuzzy_warns(self, spark, corpus, eval_set):
        from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

        with pytest.warns(UserWarning, match="BROADCASTS"):
            prepare_training_corpus(
                corpus, near_threshold=None, min_tokens=0, eval_docs=eval_set,
                decontam_mode="bloom", fuzzy_decontam_threshold=0.7,
                fuzzy_decontam_n=3,
            ).collect()


def test_contamination_by_eval_item(spark, corpus, eval_set):
    """The inverse-direction leak report: per eval item, how many
    training docs and total gram hits."""
    from hedera_etl_spark.operators.decontam import contamination_by_eval_item

    rows = {
        r["eval_id"]: (r["n_docs"], r["n_gram_hits"])
        for r in contamination_by_eval_item(corpus, eval_set, n=5).collect()
    }
    # eval item 100: doc 1 shares all 5 grams, doc 2 shares 1 -> 2 docs, 6 hits
    assert rows == {100: (2, 6)}
    # a clean eval set reports nothing
    clean = spark.createDataFrame(
        [(7, "totally novel benchmark question nobody leaked yet")],
        ["doc_id", "text"],
    )
    assert contamination_by_eval_item(corpus, clean, n=5).count() == 0


def test_decontaminate_against_shingles_equals_batch_form(spark, corpus, eval_set):
    from hedera_etl_spark.operators.decontam import (
        _ref_shingle_dim,
        decontaminate,
        decontaminate_against_shingles,
    )

    eval_sh = _ref_shingle_dim(eval_set, 5, "text").localCheckpoint()
    a = sorted(r["doc_id"] for r in decontaminate(corpus, eval_set, n=5).collect())
    b = sorted(
        r["doc_id"]
        for r in decontaminate_against_shingles(corpus, eval_sh, n=5).collect()
    )
    assert a == b
