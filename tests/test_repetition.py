"""Gopher-style repetition quality signals
(operators/textanalysis.repetition_scores + its explode-based scale twin)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hedera_etl_spark.operators.textanalysis import (
    repetition_scores,
    repetition_scores_scalable,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            # 4 lines, one exact repeat -> dup_line_frac 1/4
            Row(doc_id=1, text="nav home\nreal content here\nnav home\nfooter"),
            # keyword stuffing: 'buy' is 4 of 6 tokens
            Row(doc_id=2, text="buy buy buy buy now cheap"),
            # repeated bigram 'ha ho': 3 occurrences x 5 chars over 17 chars
            Row(doc_id=3, text="ha ho ha ho ha ho"),
            # clean single-line prose, all tokens distinct
            Row(doc_id=4, text="every token here is entirely unique"),
            # single token: no bigrams at all
            Row(doc_id=5, text="word"),
        ]
    )


def test_dup_line_frac(spark, docs):
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert rows[1]["n_lines"] == 4
    assert rows[1]["dup_line_frac"] == 0.25
    assert rows[4]["n_lines"] == 1 and rows[4]["dup_line_frac"] == 0.0


def test_top_token_frac(spark, docs):
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    assert rows[2]["top_token_frac"] == pytest.approx(4 / 6, abs=1e-6)
    assert rows[4]["top_token_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert rows[5]["top_token_frac"] == 1.0


def test_top_bigram_char_frac(spark, docs):
    rows = {r["doc_id"]: r for r in repetition_scores(docs).collect()}
    # doc 3: "ha ho" occurs 3x, 5 chars each, text is 17 chars
    assert rows[3]["top_bigram_char_frac"] == pytest.approx(15 / 17, abs=1e-6)
    # no bigrams -> 0, not NULL
    assert rows[5]["top_bigram_char_frac"] == 0.0


def test_scalable_twin_is_bit_equal(spark, docs):
    a = sorted(tuple(r) for r in repetition_scores(docs).collect())
    b = sorted(tuple(r) for r in repetition_scores_scalable(docs).collect())
    assert a == b


def test_scalable_twin_on_real_table(spark):
    from hedera_etl_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    a = sorted(tuple(r) for r in repetition_scores(d).collect())
    b = sorted(tuple(r) for r in repetition_scores_scalable(d).collect())
    assert a == b
    assert len(a) == d.count()


def test_per_row_form_has_no_shuffle(spark, docs):
    """The per-row form must stay a pure projection — zero exchanges."""
    plan = repetition_scores(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_scalable_plan_never_inlines_construction_into_filters(spark):
    """Regression pin for the InferFiltersFromGenerate hazard: a plain
    explode gets a synthesized size(arr)>0 filter pushed below the
    projections, inlining the whole bigram construction (split included)
    into a per-row Filter — 5x measured.  The healthy plan has OUTER
    generates and no Filter evaluating a transform()."""
    from hedera_etl_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    plan = (
        repetition_scores_scalable(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    bad = [
        line
        for line in plan.splitlines()
        if "Filter" in line and "transform(" in line
    ]
    assert not bad, bad
    gens = [line for line in plan.splitlines() if "Generate explode" in line]
    assert gens and all(", true, " in g for g in gens), gens  # outer=true


def test_bundle_projection_compiles_without_codegen_overflow(spark):
    """r15: the single-scan bundle packs the whole profile — md5 gram
    fingerprint, two array_sorts and two run-length folds — into one
    Project; assert the generated code stays under janino's 64 KB method
    limit by running with codegen fallback DISABLED (an overflow then
    raises instead of silently paying a failed compile + interpreted
    run, the r14 join-condition lesson)."""
    from hedera_etl_spark.operators.textanalysis import text_stats_bundle
    from hedera_etl_spark.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    old = spark.conf.get("spark.sql.codegen.fallback", "true")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        assert text_stats_bundle(docs, gram=5).count() == docs.count()
    finally:
        spark.conf.set("spark.sql.codegen.fallback", old)


def test_text_stats_bundle_equals_four_operator_composition(spark):
    """text_stats_bundle (r15: the fused two-scan llm_text_stats
    relation) must be column-for-column identical to the
    token_stats ⋈ quality_scores ⋈ char_fingerprints ⋈
    repetition_scores_scalable composition it replaced — including the
    NULL-text, empty-text and single-token rails."""
    from pyspark.sql import Row

    from hedera_etl_spark.operators.textanalysis import (
        char_fingerprints,
        quality_scores,
        text_stats_bundle,
        token_stats,
    )
    from hedera_etl_spark.tables import load_table

    extra = spark.createDataFrame(
        [
            Row(doc_id=9_000_001, text=None),
            # NOTE: empty-string text is outside BOTH forms' domain —
            # top_bigram_char_frac divides by n_chars=0, an ANSI
            # DIVIDE_BY_ZERO in the old composition and the bundle alike
            Row(doc_id=9_000_003, text="word"),
            Row(doc_id=9_000_004, text="nav home\nnav home\nbuy buy buy"),
        ],
        "doc_id long, text string",
    )
    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .unionByName(extra)
    )
    from hedera_etl_spark.operators.textanalysis import (
        repetition_scores_scalable,
    )

    quality = quality_scores(docs).select(
        "doc_id", "ttr", "avg_token_len", "stopword_ratio", "quality_score"
    )
    old = (
        token_stats(docs)
        .join(quality, "doc_id")
        .join(char_fingerprints(docs, gram=5), "doc_id")
        .join(repetition_scores_scalable(docs), "doc_id")
    )
    new = text_stats_bundle(docs, gram=5)
    assert old.columns == new.columns
    a = sorted(tuple(r) for r in old.collect())
    b = sorted(tuple(r) for r in new.collect())
    assert a == b
