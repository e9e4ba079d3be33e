"""Exact repeated-span removal (operators/spandedup.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from hedera_etl_spark.operators.spandedup import (
    remove_repeated_spans,
    repeated_spans,
)

HEADER = "standard license header text appears here"  # 6 tokens


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{HEADER} first document real content alpha beta"),
            Row(doc_id=2, text=f"{HEADER} second document other words gamma delta"),
            Row(doc_id=3, text="entirely unique text with no shared spans at all"),
            Row(doc_id=4, text="short doc"),
        ]
    )


def test_repeated_spans_finds_cross_doc_boilerplate(spark, docs):
    hits = repeated_spans(docs, n=6, min_count=2).collect()
    by_doc = {}
    for r in hits:
        by_doc.setdefault(r["doc_id"], []).append(r["pos"])
    # the 6-token header starts at position 1 in docs 1 and 2 only
    assert by_doc == {1: [1], 2: [1]}


def test_remove_cuts_all_occurrences_keeps_rest(spark, docs):
    out = {r["doc_id"]: r["text"] for r in remove_repeated_spans(docs, n=6).collect()}
    assert out[1] == "first document real content alpha beta"
    assert out[2] == "second document other words gamma delta"
    # untouched docs pass through byte-identical
    assert out[3] == "entirely unique text with no shared spans at all"
    assert out[4] == "short doc"


def test_keep_first_retains_one_canonical_occurrence(spark, docs):
    out = {
        r["doc_id"]: r["text"]
        for r in remove_repeated_spans(docs, n=6, keep_first=True).collect()
    }
    # min-(doc_id, pos) owner: doc 1 keeps the header, doc 2 loses it
    assert out[1].startswith(HEADER)
    assert out[2] == "second document other words gamma delta"


def test_overlapping_spans_merge_coverage(spark):
    """A run repeated across docs longer than n produces overlapping
    flagged spans; coverage must merge, not double-cut or leave slivers."""
    run = "a b c d e f g h"  # 8 tokens, n=5 -> starts 1..4 all repeated
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{run} one tail here"),
            Row(doc_id=2, text=f"{run} two tail there"),
        ]
    )
    out = {r["doc_id"]: r["text"] for r in remove_repeated_spans(docs, n=5).collect()}
    assert out[1] == "one tail here"
    assert out[2] == "two tail there"


def test_within_doc_repetition_counts(spark):
    """min_count counts occurrences, not documents: a span repeated
    twice INSIDE one doc is cut."""
    phrase = "repeat me five tokens now"
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=f"{phrase} middle words {phrase} end bits")]
    )
    out = remove_repeated_spans(docs, n=5).collect()[0]["text"]
    assert out == "middle words end bits"


def test_no_python_and_outer_generate(spark, docs):
    df = remove_repeated_spans(docs, n=6)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in plan and "PythonUDF" not in plan
    bad = [
        line
        for line in plan.splitlines()
        if "Filter" in line and "xxhash64(concat_ws" in line
    ]
    assert not bad, bad  # the span construction never inlines into a Filter


def test_pipeline_span_stage(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"{HEADER} first unique body content words"),
            Row(doc_id=2, text=f"{HEADER} second unique body different words"),
        ]
    )
    out = {
        r["doc_id"]: r["text"]
        for r in prepare_training_corpus(
            docs, near_threshold=None, min_tokens=0, span_dedup_n=6
        ).collect()
    }
    assert out[1].startswith(HEADER)  # canonical occurrence kept
    assert out[2] == "second unique body different words"
