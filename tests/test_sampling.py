"""Deterministic hash sampling (operators/sampling.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hedera_etl_spark.operators.sampling import (
    hash_bucket,
    hash_sample,
    stratified_hash_sample,
)


def test_hash_sample_is_deterministic_and_rate_accurate(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, ["k"], 0.3).collect()}
    b = {r["k"] for r in hash_sample(df, ["k"], 0.3).collect()}
    assert a == b  # bit-identical across runs
    assert 0.27 < len(a) / 20_000 < 0.33  # ~binomial(20k, .3)
    # nested property: a lower-rate sample is a subset of a higher-rate
    # one over the same salt (same bucket, smaller threshold)
    c = {r["k"] for r in hash_sample(df, ["k"], 0.1).collect()}
    assert c <= a


def test_salt_decorrelates_samples(spark):
    df = spark.range(20_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, ["k"], 0.3, salt="train").collect()}
    b = {r["k"] for r in hash_sample(df, ["k"], 0.3, salt="eval").collect()}
    overlap = len(a & b) / 20_000
    assert 0.06 < overlap < 0.12  # independent: ~0.09, not 0.3 or 0


def test_stratified_rates_and_default(spark):
    df = spark.range(30_000).select(
        F.col("id").alias("k"),
        F.element_at(F.array(F.lit("en"), F.lit("de"), F.lit("zz")),
                     (F.col("id") % 3 + 1).cast("int")).alias("lang"),
    )
    out = stratified_hash_sample(
        df, "lang", {"en": 0.2, "de": 1.0}, key_cols=["k"], default_rate=0.0
    )
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["de"] == 10_000          # keep all
    assert "zz" not in by_lang              # default 0 drops the stratum
    assert 0.17 < by_lang["en"] / 10_000 < 0.23


def test_bucket_stable_under_relabeling(spark):
    """The bucket hashes the KEY only, so re-labeling a row's stratum
    never changes which side of a threshold it falls on."""
    df = spark.range(1000).withColumnRenamed("id", "k")
    b1 = df.select("k", hash_bucket("k").alias("b"))
    with_lang = df.withColumn("lang", F.lit("en"))
    b2 = with_lang.select("k", hash_bucket("k").alias("b"))
    assert b1.collect() == b2.collect()


def test_rate_validation(spark):
    df = spark.range(10).withColumnRenamed("id", "k")
    with pytest.raises(ValueError):
        hash_sample(df, ["k"], 1.5)
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "k", {"x": -0.1}, key_cols=["k"])
    with pytest.raises(ValueError):
        stratified_hash_sample(df, "k", {"x": 0.5}, key_cols=["k"], default_rate=2.0)


def test_sample_composition_equals_intersection(spark):
    """Sampling at rate r1 then filtering the result to the r2-bucket set
    (same salt) equals sampling at min(r1, r2): the decision is a pure
    per-row function, so composition is set intersection."""
    from pyspark.sql import functions as F

    df = spark.range(5_000).withColumnRenamed("id", "k")
    a = hash_sample(hash_sample(df, ["k"], 0.5), ["k"], 0.2)
    b = hash_sample(df, ["k"], 0.2)
    assert {r["k"] for r in a.collect()} == {r["k"] for r in b.collect()}
