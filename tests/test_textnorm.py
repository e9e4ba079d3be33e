"""Unicode normalization semantics (operators/textnorm.normalize_text)."""

import pytest

from hedera_etl_spark.operators.textnorm import normalize_text


def _one(spark, text, **kw):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return normalize_text(df, **kw).collect()[0]["text"]


def test_nfc_composes_decomposed_sequences(spark):
    assert _one(spark, "Café") == "Café"


def test_nfkc_folds_compatibility_forms(spark):
    # ligature fi + fullwidth A + superscript 2
    assert _one(spark, "ﬁ Ａ ²", form="NFKC") == "fi A 2"


def test_nfc_keeps_compatibility_forms(spark):
    assert _one(spark, "ﬁ", form="NFC") == "ﬁ"


def test_lowercase_after_normalization(spark):
    assert _one(spark, "CAFÉ", lowercase=True) == "café"


def test_whitespace_collapse_and_controls(spark):
    assert _one(spark, "  a\x00b\tc   d  ") == "ab c d"
    assert (
        _one(spark, "  a\x00b  ", collapse_whitespace=False, strip_controls=False)
        == "  a\x00b  "
    )


def test_null_text_passes_through(spark):
    df = spark.createDataFrame([(1, None)], "doc_id long, text string")
    assert normalize_text(df).collect()[0]["text"] is None


def test_idempotent_and_dedup_unifying(spark):
    # composed and decomposed spellings normalize to the SAME bytes —
    # the property every downstream dedup hash relies on
    a = _one(spark, "Café au lait")
    b = _one(spark, "Café au lait")
    assert a == b
    assert _one(spark, a) == a  # idempotent


def test_bad_form_raises(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_pipeline_normalization_unifies_dedup(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    docs = spark.createDataFrame(
        [
            (1, "Caf\u00e9 au lait fort"),   # composed
            (2, "Cafe\u0301 au lait fort"),  # decomposed twin   # decomposed twin
            (3, "something else entirely ok"),
        ],
        "doc_id long, text string",
    )
    # without normalization the twins are byte-different: both survive
    plain = prepare_training_corpus(docs, near_threshold=None, min_tokens=0)
    assert sorted(r.doc_id for r in plain.collect()) == [1, 2, 3]
    # with NFC they exact-dedup to the min-id keeper
    normed = prepare_training_corpus(
        docs, near_threshold=None, min_tokens=0, normalize_form="NFC"
    )
    assert sorted(r.doc_id for r in normed.collect()) == [1, 3]
