"""URL canonicalization + canonical-URL dedup (operators/urlnorm.py):
rule-by-rule normalization and the single-exchange dedup shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.urlnorm import (
    canonical_url_sql,
    canonical_urls,
    url_dedup,
    url_dedup_decisions,
)


def _canon(spark, url: str) -> str:
    row = spark.createDataFrame([(url,)], ["url"]).select(
        F.expr(canonical_url_sql("url")).alias("c")
    ).first()
    return row["c"]


@pytest.mark.parametrize(
    "raw,canonical",
    [
        # rule 1: fragment dropped
        ("https://a.com/x#frag", "https://a.com/x"),
        # rule 2: scheme+authority lowercase, PATH case preserved
        ("HTTPS://A.COM/Keep/Case", "https://a.com/Keep/Case"),
        # rule 3: explicit default ports dropped, other ports kept
        ("https://a.com:443/x", "https://a.com/x"),
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:8443/x", "https://a.com:8443/x"),
        # rule 4: tracking params stripped (prefix utm_, exact ids)
        (
            "https://a.com/x?utm_source=f&utm_medium=m&q=1",
            "https://a.com/x?q=1",
        ),
        ("https://a.com/x?fbclid=abc&gclid=d&msclkid=e", "https://a.com/x"),
        # rule 4: bare value-less tracking keys strip too (ADVICE r10)
        ("https://a.com/x?fbclid", "https://a.com/x"),
        ("https://a.com/x?gclid&a=1", "https://a.com/x?a=1"),
        # ...but a key merely PREFIXED by a tracking id survives
        ("https://a.com/x?fbclid2=v", "https://a.com/x?fbclid2=v"),
        # rule 5: surviving params sort; emptied query drops its '?'
        ("https://a.com/x?b=2&a=1", "https://a.com/x?a=1&b=2"),
        ("https://a.com/x?utm_source=f", "https://a.com/x"),
        # rule 6: trailing slashes dropped, bare root collapses
        ("https://a.com/x/", "https://a.com/x"),
        ("https://a.com/", "https://a.com"),
        ("https://a.com", "https://a.com"),
        # composition: everything at once
        (
            "HTTP://WWW.Site.ORG:80/Path/Sub/?z=9&utm_campaign=c&a=1#top",
            "http://www.site.org/Path/Sub?a=1&z=9",
        ),
    ],
)
def test_canonicalization_rules(spark, raw, canonical):
    assert _canon(spark, raw) == canonical


def test_variants_collapse_to_one_keeper(spark):
    variants = [
        (1, "https://a.com/x?a=1&b=2"),
        (2, "HTTPS://A.COM/x?b=2&a=1"),
        (3, "https://a.com:443/x/?a=1&b=2&utm_source=f"),
        (4, "https://a.com/x?a=1&b=2#frag"),
        (10, "https://a.com/other"),
    ]
    docs = spark.createDataFrame(variants, ["doc_id", "url"])
    decisions = {
        r["canonical_url"]: (r["keeper_id"], r["n_dups"])
        for r in url_dedup_decisions(docs).collect()
    }
    assert decisions["https://a.com/x?a=1&b=2"] == (1, 4)
    assert decisions["https://a.com/other"] == (10, 1)
    kept = url_dedup(docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 10]
    assert kept.columns == docs.columns  # schema passthrough


def test_null_and_empty_urls_pass_through(spark):
    """Rule 7 (ADVICE r10 medium): docs with NULL or empty URLs must all
    survive dedup individually — NULL canonical keys must never merge."""
    rows = [
        (1, "https://a.com/x"),
        (2, "HTTPS://A.COM/x"),  # dup of 1
        (3, None),
        (4, None),
        (5, ""),
        (6, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    kept = sorted(r["doc_id"] for r in url_dedup(docs).collect())
    assert kept == [1, 3, 4, 5, 6]

    decisions = url_dedup_decisions(docs).collect()
    # one decision row per missing-URL doc, surfaced with NULL key
    null_rows = sorted(
        (r["keeper_id"], r["n_dups"])
        for r in decisions
        if r["canonical_url"] is None
    )
    assert null_rows == [(3, 1), (4, 1), (5, 1), (6, 1)]
    assert {
        r["keeper_id"]: r["n_dups"]
        for r in decisions
        if r["canonical_url"] is not None
    } == {1: 2}


def test_dedup_plan_is_one_exchange_no_python(spark):
    docs = spark.createDataFrame(
        [(i, f"https://h{i % 3}.com/p?a={i % 2}") for i in range(50)],
        ["doc_id", "url"],
    )
    df = url_dedup_decisions(docs)
    df.collect()
    plan = (
        df._jdf.queryExecution()
        .executedPlan()
        .toString()
        .split("== Initial Plan ==")[0]
    )
    assert plan.count("Exchange hashpartitioning") == 1, plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "pythonUDF" not in opt and "PythonUDF" not in opt
