"""Prepared-plan cache semantics (queries/__init__.py).

The cache exists to amortize driver-side plan construction (py4j round
trips) across repeat calls; these tests pin the three properties that
keep it SAFE: identity reuse for pure entries, exclusion for entries
whose re-execution must rebuild state (streaming side effects,
localCheckpoint-pinned intermediates), and per-(sf_dir) keying so two
scale factors never share a plan.
"""

from __future__ import annotations

SF1 = "/root/testdata/sf0.001"
SF2 = "/root/testdata/sf0.01"


def _registry():
    from hedera_etl_spark.queries import load_registry

    return load_registry()


def test_pure_entries_reuse_the_same_dataframe(spark):
    reg = _registry()
    spec = reg["q01_filter_project"]
    a = spec.spark_fn(spark, SF1)
    b = spec.spark_fn(spark, SF1)
    assert a is b


def test_cache_is_keyed_by_sf_dir(spark):
    reg = _registry()
    spec = reg["q01_filter_project"]
    assert spec.spark_fn(spark, SF1) is not spec.spark_fn(spark, SF2)


def test_checkpoint_bearing_entries_are_not_cached(spark):
    """minhash/ngram plans pin a lazy localCheckpoint; serving a cached
    plan would silently reuse the MATERIALIZED intermediate instead of
    recomputing it — they must rebuild every call."""
    reg = _registry()
    for name in ("llm_minhash_neardup", "llm_ngram_jaccard"):
        spec = reg[name]
        assert spec.spark_fn(spark, SF1) is not spec.spark_fn(spark, SF1), name


def test_streaming_entries_are_not_cached():
    """Side-effectful entries (fresh temp dirs + a real streaming run per
    call) must never serve a prior call's result plan.  Asserted without
    running them: the registered callable must be the RAW function, not
    the caching wrapper."""
    reg = _registry()
    for name in (
        "hed_stream_ingest",
        "hed_stream_join",
        "hed_stream_dedup",
        "hed_stateful_user_activity",
        "hed_dedupe_job",
    ):
        fn = reg[name].spark_fn
        assert fn.__name__ != "run", name  # caching wrapper is named `run`


def test_cached_plan_still_executes_fresh_shuffles(spark):
    """The cache is PLAN reuse, not result reuse: a new aggregate built on
    top of the cached DataFrame is a new query execution, so repeat
    benchmark runs re-execute every stage (this is the line between the
    r6 plan cache and the r3-rejected same-DataFrame re-collect timing —
    docs/PERF_NOTES.md)."""
    from pyspark.sql import functions as F

    reg = _registry()
    df = reg["q02_groupby_having"].spark_fn(spark, SF1)
    a = df.agg(F.count("*")).collect()[0][0]
    b = df.agg(F.count("*")).collect()[0][0]
    assert a == b and a > 0
