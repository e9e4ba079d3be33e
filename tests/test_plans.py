"""Physical-plan audits: the scale claims in the query docstrings, held
to by the actual executed plans.  A plan regression here is a 100 TB
performance bug even when results stay correct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def registry():
    from hedera_etl_spark.queries import load_registry

    return load_registry()


def test_q01_pushdown_and_pruning(spark, registry):
    """Predicate AND projection must reach the parquet scan."""
    df = registry["q01_filter_project"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "PushedFilters: [" in plan and "GreaterThanOrEqual(l_quantity" in plan
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double>" in plan


def test_q05_broadcasts_dimensions(spark, registry):
    """The orders fact side must never shuffle for any of the three joins.

    customer carries NO hint (it grows with SF — a hard hint is a
    cluster-scale OOM); it must still broadcast at this SF via
    autoBroadcastJoinThreshold, so all three joins plan broadcast."""
    df = registry["q05_dim_join_agg"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    # AQE plan strings repeat the tree (initial + final) — require the
    # joins to be broadcast and none to have degraded to sort-merge
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_q07_takeordered_not_global_sort(spark, registry):
    df = registry["q07_bigjoin_topk"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    # orders is unhinted (fact table); the size-aware planner must still
    # elect broadcast for its single-column projection at this SF
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_tx_types_join_broadcasts(spark, registry):
    df = registry["hed_tx_types_join"].spark_fn(spark, SF)
    df.collect()
    assert "BroadcastHashJoin" in plan_of(df)


def test_asof_join_is_window_not_join(spark, registry):
    """The as-of construction must plan as a window, never a nested loop."""
    df = registry["q17_asof_join"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "RunningWindowFunction" in plan or "Window" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_no_python_udf_in_relational_queries(spark, registry):
    """U1 policy: core/extended relational queries stay fully JVM-side
    (the only sanctioned Python is the multimodal mapInPandas stub)."""
    for name in [
        "q01_filter_project", "q02_groupby_having", "q05_dim_join_agg",
        "q07_bigjoin_topk", "q09_window_rank", "q14_explode_tokens",
        "q16_window_tumbling", "q17_asof_join", "llm_minhash_neardup",
        "llm_simhash_fp", "sim_bruteforce_topk",
    ]:
        df = registry[name].spark_fn(spark, SF)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "pythonUDF" not in plan and "PythonUDF" not in plan, name


def test_clustered_write_gives_rowgroup_stats(spark, tmp_path):
    """S6/O2: sortWithinPartitions clustering orders the column within
    files so min/max row-group stats enable data skipping."""
    from hedera_etl_spark.operators.tablemgmt import write_day_partitioned

    from hedera_etl_spark.tables import load_table

    ev = load_table(spark, SF, "events").select(
        F.expr("CAST(timestamp_micros(ts_ns div 1000) AS TIMESTAMP)").alias(
            "consensusTimestampTruncated"
        ),
        (F.col("event_id") % 21 + 7).alias("transactionType"),
        "user_id",
    )
    path = str(tmp_path / "tx")
    write_day_partitioned(ev, path, cluster_by="transactionType", mode="overwrite")

    out = spark.read.parquet(path)
    assert out.count() == ev.count()
    # within each file, the cluster column must be sorted
    import pyarrow.parquet as pq
    import glob

    files = glob.glob(f"{path}/part_date=*/*.parquet")
    assert files
    for f in files[:5]:
        vals = pq.read_table(f, columns=["transactionType"])["transactionType"].to_pylist()
        assert vals == sorted(vals), f


def test_bucketed_range_join_is_equi_join(spark):
    """The bucketized range join must plan as a hash equi-join, never a
    nested loop — that's its entire reason to exist.  (No longer a
    registry entry after the r6 consolidation; the function is pinned
    here instead.)"""
    from hedera_etl_spark.queries.core import q08c

    df = q08c(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "HashJoin" in plan  # broadcast- or shuffled-hash on __bucket


def test_bucketed_range_join_matches_bnlj_form(spark):
    """The bucketed rewrite and the naive BETWEEN (BNLJ) form must emit
    identical rows — the semantics-preservation proof that backed the
    former q08_range_join oracle entry, kept as a pytest pin since the
    r6 registry consolidation."""
    from hedera_etl_spark.queries.core import q08c, q08_range_join_broadcast

    a = sorted(tuple(r) for r in q08c(spark, SF).collect())
    b = sorted(tuple(r) for r in q08_range_join_broadcast(spark, SF).collect())
    assert a == b and len(a) > 0


def test_asof_bucketed_single_fullsize_shuffle(spark):
    """The bucketed as-of's cost-shape claim (operators/joins.py): the
    full-size union is shuffled exactly ONCE (the carry window's
    REPARTITION_BY_COL on (key, bucket)); the seed branch must aggregate
    map-side BEFORE its own exchange so it ships ~(keys x buckets) rows,
    never the raw union."""
    from hedera_etl_spark.operators.joins import as_of_join_bucketed

    ldf = spark.createDataFrame([(1, 10, 5), (2, 4, 6)], "k LONG, lts LONG, lid LONG")
    rdf = spark.createDataFrame([(1, 3, 7), (2, 9, 8)], "k LONG, rts LONG, v LONG")
    out = as_of_join_bucketed(
        ldf, rdf, on="k", left_ts="lts", right_ts="rts",
        right_payload=["v"], bucket_width=3,
    )
    out.collect()
    plan = plan_of(out)
    # AQE plan strings print the tree twice (initial + final); compare the
    # two exchange kinds within the same string, so the doubling cancels.
    n_repart = plan.count("REPARTITION_BY_COL")
    assert n_repart == plan.count("Exchange hashpartitioning") - plan.count(
        "ENSURE_REQUIREMENTS"
    ) or n_repart > 0
    # exactly ONE distinct full-size repartition exchange per tree: the
    # seed branch must NOT hang off it (it would re-shuffle the union)
    half = plan.index("+- == Initial Plan ==") if "Initial Plan" in plan else len(plan)
    final_tree = plan[:half]
    assert final_tree.count("REPARTITION_BY_COL") == 1, final_tree
    # the seed aggregate partial-combines below its exchange
    assert "partial_max_by" in plan, plan


def test_simhash_neardups_single_fingerprint_pass(spark):
    """Grouped in-bucket pair generation (r6): the fingerprint subtree —
    rooted at the token explode over split(text) — must appear exactly
    ONCE in the optimized plan.  The pre-r6 bucket self-join carried it
    twice (two distinct join inputs, no exchange reuse)."""
    from hedera_etl_spark.operators.textdedup import simhash_neardups

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    plan = (
        simhash_neardups(docs)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("split(text") == 1, plan


def test_simhash_pair_dedup_filters_before_exchange(spark):
    """r15 shuffle-fewer-bytes pin: the candidate-pair dedup must hash-
    partition on the POST-hamming-filter 3-column projection
    (doc_a, doc_b, hamming), never the 6-column fingerprint-carrying
    candidates, and the hamming cut must sit BELOW that exchange."""
    from hedera_etl_spark.operators.textdedup import simhash_neardups

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    df = simhash_neardups(docs, n_bands=4, max_hamming=3)
    df.collect()
    plan = plan_of(df)
    # the dedup exchange keys on exactly the 3 output columns
    import re
    assert re.search(
        r"Exchange hashpartitioning\(doc_a#\d+L?, doc_b#\d+L?, hamming#\d+", plan
    ), plan
    # no exchange ships the per-pair fingerprint halves
    assert not re.search(r"Exchange hashpartitioning\([^)]*hi_a", plan), plan


def test_tx_parse_evaluates_from_json_once(spark):
    """r15 single-evaluation barrier (transform.parse_transactions): the
    typed branch's physical plan must contain exactly ONE from_json —
    the filter references the projected attribute instead of inlining a
    second copy of the parse."""
    from hedera_etl_spark.queries import load_registry

    df = load_registry()["hed_tx_transform"].spark_fn(spark, SF)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert plan.count("from_json") == 1, plan


def test_minhash_signature_stage_has_no_exchange(spark):
    """The shingle->signature stage is pure per-row array math: its plan
    must contain ZERO Exchange nodes (the r2 form paid two — a distinct
    on (doc, shingle) and a groupBy(doc))."""
    from hedera_etl_spark.operators.textdedup import (
        minhash_signatures_from_sets,
        shingle_sets,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    # well-partitioned input: the parallelism guard must not add a shuffle
    sig = minhash_signatures_from_sets(shingle_sets(docs.repartition(8)), 9, with_size=True)
    sig.collect()
    plan = plan_of(sig)
    import re
    assert not re.search(r"Exchange hashpartitioning", plan), plan


def test_ensure_parallelism_is_noop_on_wide_input(spark):
    """The small-file guard repartitions ONLY below default parallelism —
    on an input already at or above it, the plan is untouched."""
    from hedera_etl_spark.tables import ensure_parallelism

    n = spark.sparkContext.defaultParallelism
    wide = spark.range(10_000).repartition(n)
    assert ensure_parallelism(wide) is wide
    narrow = spark.range(10_000).coalesce(1)
    assert ensure_parallelism(narrow).rdd.getNumPartitions() == n


def test_ensure_parallelism_skips_probe_on_composed_plan(spark, monkeypatch):
    """The ``.rdd`` partition probe forces FULL physical planning of the
    frame — seconds of driver time on a composed pipeline plan (the r15
    pack_sequences regression, VERDICT r15 #6).  A frame whose logical
    plan exceeds the node threshold must pass through UNTOUCHED without
    the probe ever firing: ``.rdd`` is patched to explode, so any probe
    attempt fails the test."""
    from hedera_etl_spark.tables import _PROBE_MAX_PLAN_NODES, ensure_parallelism

    # a composed plan: joins + aggregates stacked well past the threshold
    df = spark.range(1_000).withColumnRenamed("id", "k")
    composed = df
    for i in range(_PROBE_MAX_PLAN_NODES):
        composed = composed.withColumn(f"c{i}", F.col("k") + i)
    composed = composed.join(df, "k").groupBy("k").count()

    def _boom(self):
        raise AssertionError("ensure_parallelism probed .rdd on a composed plan")

    # patch the CONCRETE class (pyspark.sql.classic.dataframe.DataFrame in
    # Spark 4) — the abstract pyspark.sql.DataFrame's property is shadowed
    monkeypatch.setattr(type(composed), "rdd", property(_boom))
    assert ensure_parallelism(composed) is composed
    # a checkpoint-rooted frame must not probe either: under AQE the
    # probe EXECUTES the stages between the checkpoint and this frame
    ckpt = df.localCheckpoint(eager=True).withColumn("c", F.col("k") * 2)
    assert ensure_parallelism(ckpt) is ckpt
    # a scan-shaped frame still probes (and here, still spreads)
    with pytest.raises(AssertionError, match="probed .rdd"):
        ensure_parallelism(spark.range(10).coalesce(1))


def test_minhash_set_and_exploded_signatures_agree(spark):
    """The per-row array signature and the exploded groupBy signature are
    the same function (min over the same hashed set) — pinned so the fast
    path can never drift from the oracle-mirrored form."""
    from hedera_etl_spark.operators.textdedup import (
        minhash_signatures,
        minhash_signatures_from_sets,
        shingle_sets,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text").limit(100)
    sets = shingle_sets(docs, 3)
    sh = sets.select("doc_id", F.explode("sh_set").alias("shingle"))
    a = {tuple(r) for r in minhash_signatures_from_sets(sets, 9, with_size=True).collect()}
    b = {tuple(r) for r in minhash_signatures(sh, 9, with_size=True).collect()}
    assert a == b


def test_range_join_broadcast_form_is_bnlj(spark):
    """The broadcast fallback of the range join plans as a
    BroadcastNestedLoopJoin (acceptable only because supplier is a
    dimension) — pinned here so q08_range_join_broadcast stays live and
    its docstring claim stays true."""
    from hedera_etl_spark.queries.core import q08_range_join_broadcast

    df = q08_range_join_broadcast(spark, SF)
    df.collect()
    assert "BroadcastNestedLoopJoin" in plan_of(df)


def test_mapside_operators_have_no_pre_sort_exchange(spark, registry):
    """Chunking, PII scrub, audio chunking, resize and sampling are pure
    per-row fan-outs/projections — their plans must contain NO exchange
    except the final presentation sort (zero-shuffle claim in the
    operator docstrings)."""
    from hedera_etl_spark.queries.mmops import mm_resize

    for name in [
        "llm_chunking", "llm_pii_scrub", "llm_stratified_sample",
        "mm_audio_features", mm_resize,
    ]:
        fn = registry[name].spark_fn if isinstance(name, str) else name
        df = fn(spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_exchanges = plan.count("Exchange")
        n_range = plan.count("rangepartitioning")
        assert n_exchanges == n_range, (name, plan)  # only the sort's


def test_q12_expand_sits_above_leaf_aggregate(spark, registry):
    """ROLLUP must Expand the (n_name, p_brand) LEAF AGGREGATE, not the
    joined fact rows: Spark plans Expand below the rollup's partial
    aggregation, so a direct rollup triples every fact row map-side.
    The pre-aggregated form pins Expand's input to a HashAggregate —
    a regression here is 3x the fact through the hash table at 100 TB."""
    df = registry["q12_rollup"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "Expand" in plan
    # the Expand's child must be an aggregate, not a join/scan: in the
    # tree string the first Expand is followed by HashAggregate before
    # any join operator appears
    after_expand = plan.split("Expand", 1)[1]
    first_agg = after_expand.find("HashAggregate")
    first_join = after_expand.find("BroadcastHashJoin")
    assert first_agg != -1 and (first_join == -1 or first_agg < first_join)


def test_bounded_sort_skips_range_exchange(spark, registry):
    """bounded_sort entries (q05 et al.) must plan NO RangePartitioning
    exchange — the single-partition merge sort replaces the sampling
    pass + range shuffle — while keeping the upstream aggregation's
    hash exchange (the parallelism-preserving part of the contract)."""
    df = registry["q05_dim_join_agg"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "rangepartitioning" not in plan.lower()
    assert "hashpartitioning" in plan.lower()
    # and the output really is totally ordered
    rows = df.collect()
    keys = [(r["r_name"], r["n_name"]) for r in rows]
    assert keys == sorted(keys)


def test_unbounded_outputs_keep_global_sort(spark, registry):
    """The data-proportional entries must NOT have been converted to a
    single-task sort: q17's 150k-row output keeps RangePartitioning."""
    df = registry["q17_asof_join"].spark_fn(spark, SF)
    df.collect()
    plan = plan_of(df)
    assert "rangepartitioning" in plan.lower()


def test_bm25_topk_no_corpus_shuffle(spark, registry):
    """The r7 two-scan BM25 plan (operators/retrieval.bm25_topk): the
    only exchanges are the one-row stats aggregate (SinglePartition +
    its broadcast) and TakeOrderedAndProject's result collection — a
    corpus-keyed hashpartitioning exchange or a sort-merge join here
    means the postings groupBy crept back in."""
    df = registry["llm_bm25_topk"].spark_fn(spark, SF)
    df.collect()
    # AQE's toString appends an "== Initial Plan ==" copy — audit the
    # final plan section only
    plan = plan_of(df).split("== Initial Plan ==")[0]
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange SinglePartition") == 1
    assert "BroadcastNestedLoopJoin BuildRight, Cross" in plan


def test_span_flagging_single_pass_no_join_no_broadcast(spark):
    """repeated_spans (r13 window form): ONE corpus pass, ONE exchange
    (on the span hash), NO join of any kind — the r7 aggregate +
    join-back form is forbidden because its flagged side is an
    unbounded dimension that AQE eventually promotes to a driver-built
    broadcast (the 10x-rung OOM recorded in docs/PERF_NOTES.md r13)."""
    from hedera_etl_spark.operators.spandedup import repeated_spans
    from hedera_etl_spark.tables import load_table

    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    df = repeated_spans(docs, n=3)
    plan = plan_of(df)
    # exactly one tokenize+fan-out pass and one exchange; no join node
    assert plan.count("Generate explode") == 1
    assert plan.count("Exchange hashpartitioning") == 1
    for node in ("Join", "BroadcastExchange", "CartesianProduct"):
        assert node not in plan, node
