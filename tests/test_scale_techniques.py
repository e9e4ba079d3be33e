"""Scale-technique demonstrations pinned by tests: skew-join salting and
bucketed (co-located) joins — the 100 TB levers the docstrings promise.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_salted_join_equals_plain_join(spark):
    """Salting must be a pure physical rewrite: same rows out."""
    from hedera_etl_spark.operators.joins import salted_join

    # heavily skewed left: one hot key with 5k rows, tail keys with 1
    left = spark.range(5000).select(F.lit(7).alias("k"), F.col("id").alias("payload"))
    tail = spark.range(20).select((F.col("id") + 100).alias("k"), F.col("id").alias("payload"))
    left = left.unionByName(tail)
    right = spark.createDataFrame(
        [(7, "hot"), (105, "cold"), (999, "unmatched")], ["k", "name"]
    )

    plain = left.join(right, "k").select("k", "payload", "name")
    salted = salted_join(left, right, "k").select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_spreads_identical_hot_rows(spark):
    """The exact pathology salting exists for: N byte-IDENTICAL rows of
    one hot key must land in multiple salt shards (a content-derived salt
    gives them all the same shard — the r2 VERDICT regression)."""
    from hedera_etl_spark.operators.joins import salt_col, salted_join

    n = 8
    # 2000 byte-identical rows: same key, same payload
    left = spark.range(2000).select(F.lit(7).alias("k"), F.lit(42).alias("payload"))
    right = spark.createDataFrame([(7, "hot")], ["k", "name"])

    shards = left.select(salt_col(n).alias("s")).distinct().count()
    assert shards >= min(n, 2000) // 2 + 1  # must use MANY shards, not 1
    assert salted_join(left, right, "k", n_salts=n).count() == 2000


def test_salted_join_salt_on_is_deterministic_and_spreads(spark):
    """salt_on=<id column> is the retry-safe production path: the salt is
    a pure function of the row (re-execution replays it bit-for-bit), it
    spreads a hot key across shards, and the join equals the plain join."""
    from hedera_etl_spark.operators.joins import salted_join

    n = 8
    left = spark.range(5000).select(
        F.lit(7).alias("k"), F.col("id").alias("row_id")
    )
    right = spark.createDataFrame([(7, "hot"), (8, "unmatched")], ["k", "name"])

    out = salted_join(left, right, "k", n_salts=n, salt_on="row_id")
    assert out.count() == 5000
    # deterministic: two independent evaluations produce identical salts
    from pyspark.sql.functions import pmod, xxhash64

    s1 = left.select(pmod(xxhash64("row_id"), F.lit(n)).alias("s")).collect()
    s2 = left.select(pmod(xxhash64("row_id"), F.lit(n)).alias("s")).collect()
    assert [r["s"] for r in s1] == [r["s"] for r in s2]
    assert len({r["s"] for r in s1}) == n  # hot key spreads over all shards


def test_salted_join_default_salt_is_pinned_against_retry(spark):
    """salt_on=None materializes the salted left via lazy localCheckpoint
    so task retries replay identical salts — pinned by checking the plan
    no longer recomputes from the source (lineage truncated)."""
    from hedera_etl_spark.operators.joins import salted_join

    left = spark.range(100).select(F.lit(7).alias("k"), F.col("id").alias("p"))
    right = spark.createDataFrame([(7, "hot")], ["k", "name"])
    out = salted_join(left, right, "k", n_salts=4)
    assert out.count() == 100
    # the checkpointed scan appears in the physical plan in place of the
    # original range scan lineage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan or "Checkpoint" in plan


def test_salted_join_left_keeps_unmatched_and_rejects_outer(spark):
    """how='left' keeps unmatched left rows exactly once; right/full are
    rejected (the replicated right side would duplicate them)."""
    import pytest as _pytest

    from hedera_etl_spark.operators.joins import salted_join

    left = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "payload"])
    right = spark.createDataFrame([(1, "one")], ["k", "name"])
    out = salted_join(left, right, "k", n_salts=4, how="left").collect()
    assert sorted((r["k"], r["name"]) for r in out) == [(1, "one"), (2, None)]
    for how in ("right", "full", "left_anti"):
        with _pytest.raises(ValueError):
            salted_join(left, right, "k", how=how)


def test_bucketed_tables_join_without_shuffle(spark, tmp_path):
    """Pre-bucketed tables on the join key join with ZERO Exchange in the
    plan — the co-located join that amortizes one shuffle at write time
    across every future join (SURVEY §4 / session docstring claim)."""
    import uuid

    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force the issue
    suffix = uuid.uuid4().hex[:8]
    ta, tb = f"bk_orders_{suffix}", f"bk_lines_{suffix}"
    try:
        a = spark.range(10_000).select(F.col("id").alias("k"), (F.col("id") % 97).alias("va"))
        b = spark.range(30_000).select((F.col("id") % 10_000).alias("k"), F.col("id").alias("vb"))
        a.write.bucketBy(8, "k").sortBy("k").saveAsTable(ta)
        b.write.bucketBy(8, "k").sortBy("k").saveAsTable(tb)

        joined = spark.table(ta).join(spark.table(tb), "k")
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 30_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_pushdown_barrier_invariant_holds(spark):
    """transform.py leans on two Catalyst behaviors for its pushdown
    barrier (`pred | spark_partition_id() < 0`): (a) the disjunction is
    nondeterministic-flagged, so the filter is NOT pushed below an
    exchange; (b) the barrier term is always false, so semantics are
    unchanged.  A Spark upgrade breaking either must fail HERE, loudly,
    not as a silent perf cliff in every tx query."""
    import pyspark.sql.functions as F

    df = spark.range(1000).repartition(8)
    pred = (F.col("id") % 2 == 0) | (F.spark_partition_id() < 0)
    filtered = df.filter(pred)

    # (b) never filters anything beyond the deterministic conjunct
    assert filtered.count() == 500

    # (a) the Filter must sit ABOVE the repartition in the optimized plan
    # (deterministic filters are pushed below it; the barrier pins it)
    plan = filtered._jdf.queryExecution().optimizedPlan().toString()
    f_pos = plan.index("Filter")
    r_pos = plan.index("Repartition")
    assert f_pos < r_pos, plan  # parent-first tree string: Filter on top

    # control: WITHOUT the barrier the same filter is pushed below
    ctrl = df.filter(F.col("id") % 2 == 0)
    ctrl_plan = ctrl._jdf.queryExecution().optimizedPlan().toString()
    assert ctrl_plan.index("Filter") > ctrl_plan.index("Repartition"), ctrl_plan


def test_dataframe_memo_attribute_invariant_holds(spark):
    """tables.ensure_parallelism memoizes via setattr on the DataFrame
    object (a py4j wrapper).  If a Spark upgrade adds __slots__ or
    otherwise rejects attribute assignment, every load would silently pay
    the ~50 ms plan build per call — fail here instead."""
    from hedera_etl_spark.tables import ensure_parallelism, load_table

    df = load_table(spark, "/root/testdata/sf0.001", "events")
    a = ensure_parallelism(df)
    b = ensure_parallelism(df)
    assert a is b  # memo hit: same object, no second .rdd plan build
    # the memo attribute really lives on the wrapper
    assert any(k.startswith("_hes_ensured_") for k in vars(df))


def test_percentiles_histogram_equals_window_form(spark):
    """The histogram-compressed exact percentile (scale path: the serial
    pass runs over DISTINCT values, not raw rows) must select the same
    values as q23's row_number window form."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from hedera_etl_spark.queries.extops import percentiles_by_histogram

    df = spark.createDataFrame(
        [(g, v) for g in ("a", "b") for v in [5, 3, 3, 9, 1, 7, 7, 7, 2]]
        + [("c", 4)],  # single-row group: every quantile = the value
        "g STRING, v LONG",
    )
    got = {
        r["g"]: (r["p_50"], r["p_90"], r["lo"], r["hi"])
        for r in percentiles_by_histogram(df, "g", "v").collect()
    }
    w = W.partitionBy("g").orderBy("v")
    ranked = df.select(
        "g", "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("g")).alias("n"),
    )
    pick = lambda q: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")).cast("long"), F.col("v"))
    )
    want = {
        r["g"]: (r["p50"], r["p90"], r["lo"], r["hi"])
        for r in ranked.groupBy("g")
        .agg(pick(0.5).alias("p50"), pick(0.9).alias("p90"),
             F.min("v").alias("lo"), F.max("v").alias("hi"))
        .collect()
    }
    assert got == want


def test_groupwise_norm_scalable_equals_grouped_map(spark):
    """The broadcast-join normalization (scale path: per-group state is
    just (min, max)) must be bit-identical to the applyInPandas form —
    including the span=0 single-value group and exact integer ppm math."""
    from hedera_etl_spark.operators.textanalysis import (
        groupwise_minmax_norm,
        groupwise_minmax_norm_scalable,
    )

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "en", 55), (3, "en", 100), (4, "de", 7), (5, "de", 7)],
        "doc_id LONG, lang STRING, n_chars LONG",
    )
    a = {tuple(r) for r in groupwise_minmax_norm(df).collect()}
    b = {tuple(r) for r in groupwise_minmax_norm_scalable(df).collect()}
    assert a == b and len(a) == 5
