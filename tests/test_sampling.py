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


def test_mixture_rates_solve_target_composition(spark):
    """300 web / 200 code / 100 books rows; target 40/30/30 by rows.
    books is binding (100/0.3 is smallest), so T = 333.3: books keeps
    100%, web keeps (0.4*333.3)/300, code keeps (0.3*333.3)/200."""
    from hedera_etl_spark.operators.sampling import mixture_rates

    rows = (
        [("web", i) for i in range(300)]
        + [("code", i) for i in range(200)]
        + [("books", i) for i in range(100)]
    )
    df = spark.createDataFrame(rows, ["domain", "k"])
    r = mixture_rates(df, "domain", {"web": 0.4, "code": 0.3, "books": 0.3})
    assert r["books"] == 1.0
    assert r["web"] == pytest.approx((0.4 * (100 / 0.3)) / 300)
    assert r["code"] == pytest.approx((0.3 * (100 / 0.3)) / 200)


def test_mixture_sample_hits_target_and_reproduces(spark):
    from hedera_etl_spark.operators.sampling import mixture_sample

    rows = (
        [("web", i) for i in range(6000)]
        + [("code", i) for i in range(2000)]
        + [("books", i) for i in range(1000)]
    )
    df = spark.createDataFrame(rows, ["domain", "k"])
    out = mixture_sample(df, "domain", {"web": 0.5, "code": 0.25, "books": 0.25}, ["k"])
    counts = {r["domain"]: r["c"] for r in out.groupBy("domain").agg(F.count("*").alias("c")).collect()}
    total = sum(counts.values())
    # books binds: all 1000 kept; web/code within Bernoulli noise of target
    assert counts["books"] == 1000
    assert counts["web"] / total == pytest.approx(0.5, abs=0.05)
    assert counts["code"] / total == pytest.approx(0.25, abs=0.05)
    # exact reproducibility
    again = mixture_sample(df, "domain", {"web": 0.5, "code": 0.25, "books": 0.25}, ["k"])
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mixture_sample_weighted_by_tokens(spark):
    """Weighting by a token-count column targets TOKEN share, not row
    share: long web docs force a lower web keep-rate than row-weighting
    would."""
    from hedera_etl_spark.operators.sampling import mixture_rates

    rows = [("web", i, 1000) for i in range(100)] + [
        ("books", i, 100) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["domain", "k", "n_tokens"])
    r = mixture_rates(df, "domain", {"web": 0.5, "books": 0.5}, weight_col="n_tokens")
    # books: 10k tokens binding at weight .5 -> T=20k; web keeps 10k/100k
    assert r["books"] == 1.0
    assert r["web"] == pytest.approx(0.1)


def test_mixture_unachievable_and_invalid_weights(spark):
    from hedera_etl_spark.operators.sampling import mixture_rates

    df = spark.createDataFrame([("web", 1)], ["domain", "k"])
    with pytest.raises(ValueError):
        mixture_rates(df, "domain", {"web": 0.5, "missing": 0.5})
    with pytest.raises(ValueError):
        mixture_rates(df, "domain", {"web": -1.0})


def test_mixture_untargeted_domains_drop(spark):
    from hedera_etl_spark.operators.sampling import mixture_sample

    rows = [("web", i) for i in range(100)] + [("spam", i) for i in range(100)]
    df = spark.createDataFrame(rows, ["domain", "k"])
    out = mixture_sample(df, "domain", {"web": 1.0}, ["k"])
    assert out.filter(F.col("domain") == "spam").count() == 0
    assert out.count() == 100


class TestTrainValTestSplit:
    def _docs(self, spark, n=400):
        return spark.createDataFrame(
            [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
        )

    def test_partition_is_total_and_disjoint(self, spark):
        from hedera_etl_spark.operators.sampling import train_val_test_split

        out = train_val_test_split(
            self._docs(spark), ["doc_id"], val_frac=0.1, test_frac=0.1
        )
        counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
        assert sum(counts.values()) == 400
        assert set(counts) == {"train", "val", "test"}
        # deterministic: identical on re-run
        again = train_val_test_split(
            self._docs(spark), ["doc_id"], val_frac=0.1, test_frac=0.1
        )
        a = sorted((r.doc_id, r.split) for r in out.collect())
        b = sorted((r.doc_id, r.split) for r in again.collect())
        assert a == b

    def test_stable_under_corpus_growth(self, spark):
        from hedera_etl_spark.operators.sampling import train_val_test_split

        small = train_val_test_split(self._docs(spark, 100), ["doc_id"])
        big = train_val_test_split(self._docs(spark, 400), ["doc_id"])
        small_map = {r.doc_id: r.split for r in small.collect()}
        big_map = {r.doc_id: r.split for r in big.collect()}
        assert all(big_map[d] == s for d, s in small_map.items())

    def test_salt_draws_independent_split(self, spark):
        from hedera_etl_spark.operators.sampling import train_val_test_split

        a = {r.doc_id: r.split for r in train_val_test_split(
            self._docs(spark), ["doc_id"], salt="s1").collect()}
        b = {r.doc_id: r.split for r in train_val_test_split(
            self._docs(spark), ["doc_id"], salt="s2").collect()}
        assert a != b

    def test_validation(self, spark):
        import pytest

        from hedera_etl_spark.operators.sampling import train_val_test_split

        with pytest.raises(ValueError):
            train_val_test_split(self._docs(spark, 5), ["doc_id"], val_frac=0.6, test_frac=0.6)

    def test_degenerate_fractions(self, spark):
        from hedera_etl_spark.operators.sampling import train_val_test_split

        docs = self._docs(spark, 50)
        all_train = train_val_test_split(docs, ["doc_id"], val_frac=0.0, test_frac=0.0)
        assert {r.split for r in all_train.collect()} == {"train"}
        all_test = train_val_test_split(docs, ["doc_id"], val_frac=0.0, test_frac=1.0)
        assert {r.split for r in all_test.collect()} == {"test"}


# ---------------------------------------------------------------------------
# weighted (importance) sampling
# ---------------------------------------------------------------------------
def test_weighted_sample_keeps_proportionally_to_weight(spark):
    from hedera_etl_spark.operators.sampling import weighted_hash_sample

    df = spark.range(30_000).select(
        F.col("id").alias("k"),
        # thirds at weight 0.1 / 0.5 / 0.9
        F.element_at(
            F.array(F.lit(0.1), F.lit(0.5), F.lit(0.9)),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("w"),
    )
    kept = weighted_hash_sample(df, ["k"], "w").groupBy("w").count().collect()
    rates = {round(r["w"], 1): r["count"] / 10_000 for r in kept}
    assert 0.08 < rates[0.1] < 0.12
    assert 0.46 < rates[0.5] < 0.54
    assert 0.86 < rates[0.9] < 0.94


def test_weighted_sample_clamps_and_is_monotone(spark):
    from hedera_etl_spark.operators.sampling import weighted_hash_sample

    df = spark.range(5_000).withColumnRenamed("id", "k")
    # out-of-range weights clamp: w<=0 drops everything, w>=1 keeps all
    none = weighted_hash_sample(df.withColumn("w", F.lit(-3.0)), ["k"], "w")
    allr = weighted_hash_sample(df.withColumn("w", F.lit(7.5)), ["k"], "w")
    assert none.count() == 0
    assert allr.count() == 5_000
    # per-row monotone: raising every weight never drops a kept row
    lo = {r["k"] for r in weighted_hash_sample(
        df.withColumn("w", F.lit(0.3)), ["k"], "w").collect()}
    hi = {r["k"] for r in weighted_hash_sample(
        df.withColumn("w", F.lit(0.7)), ["k"], "w").collect()}
    assert lo <= hi and len(lo) < len(hi)


def test_same_salt_stages_correlate_distinct_salts_compose(spark):
    """r9 review finding, pinned: two sampling stages sharing a salt
    share their buckets, so they compose as bucket < min(rates) — the
    lower rate subsumes the other.  Distinct (derived) salts compose as
    independent thinning ~ product of rates.  prepare_training_corpus
    derives a per-stage salt for exactly this reason."""
    from hedera_etl_spark.operators.sampling import (
        hash_sample,
        weighted_hash_sample,
    )

    df = spark.range(20_000).withColumnRenamed("id", "k").withColumn(
        "w", F.lit(0.8)
    )
    # same salt: importance at 0.8 then sample at 0.5 keeps ~0.5 (w ignored)
    same = hash_sample(
        weighted_hash_sample(df, ["k"], "w", salt="s"), ["k"], 0.5, salt="s"
    ).count()
    assert abs(same / 20_000 - 0.5) < 0.02
    # derived salts: ~0.8 * 0.5 = 0.4
    inde = hash_sample(
        weighted_hash_sample(df, ["k"], "w", salt="s#importance"),
        ["k"], 0.5, salt="s#sample",
    ).count()
    assert abs(inde / 20_000 - 0.4) < 0.02


def test_pipeline_sampling_stages_thin_independently(spark):
    """The composed pipeline must show product-of-rates thinning (the
    derived-salt fix), not min-of-rates."""
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    docs = spark.range(8_000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("unique document text number "), F.col("id").cast("string"),
                 F.lit(" with enough tokens to pass the floor")).alias("text"),
        F.lit(0.8).alias("imp"),
    )
    kept = prepare_training_corpus(
        docs,
        near_threshold=None,
        min_tokens=1,
        importance_col="imp",
        sample_rate=0.5,
        salt="corr",
    ).count()
    assert abs(kept / 8_000 - 0.4) < 0.03  # 0.8 * 0.5, not min(0.8, 0.5)


def test_weighted_sample_null_weight_is_explicit(spark):
    """ADVICE r8 #4 regression: NULL weights follow null_weight — drop
    by default, keep-all at 1.0 — never an accident of greatest()."""
    from hedera_etl_spark.operators.sampling import weighted_hash_sample

    df = spark.range(1_000).withColumnRenamed("id", "k").withColumn(
        "w", F.when(F.col("k") % 2 == 0, F.lit(1.0))  # odd rows unscored
    )
    kept_default = weighted_hash_sample(df, ["k"], "w")
    assert kept_default.filter(F.col("k") % 2 == 1).count() == 0
    assert kept_default.count() == 500
    kept_all = weighted_hash_sample(df, ["k"], "w", null_weight=1.0)
    assert kept_all.count() == 1_000


# ---------------------------------------------------------------------------
# exactly-k-per-group uniform sampling
# ---------------------------------------------------------------------------
def test_grouped_sample_draws_k_per_group_uniformly(spark):
    from hedera_etl_spark.operators.sampling import grouped_hash_sample

    df = spark.range(9_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("g")
    )
    out = grouped_hash_sample(df, ["g"], k=50, key_cols=["k"]).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append(r)
    assert set(by_g) == {"0", "1", "2"}
    for rows in by_g.values():
        assert sorted(r["sample_rank"] for r in rows) == list(range(1, 51))
    # uniform over the group: the 50 draws from 3000 ids should span the
    # id range, not cluster (split the range in half, expect both sides)
    for g, rows in by_g.items():
        ids = [r["k"] for r in rows]
        assert sum(1 for i in ids if i < 4_500) >= 10
        assert sum(1 for i in ids if i >= 4_500) >= 10


def test_grouped_sample_is_stable_and_nested(spark):
    """Same draw across re-runs and partitionings; rank<=j is the j-draw."""
    from hedera_etl_spark.operators.sampling import grouped_hash_sample

    df = spark.range(2_000).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("g")
    )
    a = grouped_hash_sample(df, ["g"], k=20, key_cols=["k"]).collect()
    b = grouped_hash_sample(df.repartition(7), ["g"], k=20, key_cols=["k"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    small = grouped_hash_sample(df, ["g"], k=5, key_cols=["k"]).collect()
    assert {(r["g"], r["k"]) for r in small} == {
        (r["g"], r["k"]) for r in a if r["sample_rank"] <= 5
    }
    # a group smaller than k keeps every row
    tiny = df.filter(F.col("k") < 8)
    assert grouped_hash_sample(tiny, ["g"], k=20, key_cols=["k"]).count() == 8


def test_pipeline_token_weighted_mixture(spark):
    """mixture_weight_col makes the target mixture hold by TOKEN mass:
    a domain of long docs must downsample harder than its doc count
    suggests."""
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus
    from pyspark.sql import functions as F

    rows = []
    for i in range(200):  # web: 200 docs x 4 tokens
        rows.append((i, f"web w{i} x{i} y{i}", "web"))
    for i in range(200, 250):  # code: 50 docs x 40 tokens (2000 tokens)
        rows.append((i, " ".join(f"c{i}t{j}" for j in range(40)), "code"))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    docs = docs.withColumn("n_tok", F.size(F.split("text", " ")))

    kw = dict(
        near_threshold=None, min_tokens=0, sample_rate=1.0,
        mixture={"web": 0.5, "code": 0.5}, salt="tw",
    )
    by_docs = prepare_training_corpus(docs, **kw)
    by_tokens = prepare_training_corpus(docs, mixture_weight_col="n_tok", **kw)

    def token_share(out, domain):
        agg = (
            out.groupBy("source").agg(F.sum("n_tok").alias("t")).collect()
        )
        tot = sum(r["t"] for r in agg)
        return {r["source"]: r["t"] / tot for r in agg}[domain]

    # doc-count mixture: code docs are 10x longer, so a 50/50 DOC target
    # leaves code massively over-represented by tokens
    assert token_share(by_docs, "code") > 0.75
    # token-weighted mixture: code's token share lands near 0.5
    assert abs(token_share(by_tokens, "code") - 0.5) < 0.15


def test_temperature_weights_hand_math(spark):
    """w_d ∝ c_d^alpha: the multilingual-LM exponential smoothing —
    alpha=1 reproduces the natural mixture, smaller alpha flattens it."""
    from hedera_etl_spark.operators.sampling import (
        mixture_rates,
        temperature_weights,
    )

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, ["doc_id", "dom"])
    w1 = temperature_weights(docs, "dom", alpha=1.0)
    assert w1 == {"big": 400.0, "small": 100.0}  # natural mixture
    w5 = temperature_weights(docs, "dom", alpha=0.5)
    assert w5 == {"big": 20.0, "small": 10.0}  # sqrt smoothing, exact
    # fed into the solver: 'small' binds at rate 1, 'big' downsamples to
    # give the 2:1 smoothed mixture instead of the natural 4:1
    rates = mixture_rates(docs, "dom", w5)
    assert rates["small"] == 1.0
    assert abs(rates["big"] - 0.5) < 1e-12  # 100 * (20/10) / 400
    with pytest.raises(ValueError, match="alpha"):
        temperature_weights(docs, "dom", alpha=0.0)


def test_temperature_mixture_sample_distributed_matches_dict_form(spark):
    """The fully-distributed form (dimension windows + broadcast join)
    keeps exactly the rows the dict-form composition keeps (modulo the
    DECIMAL(9,6) rate quantization, which both sides here share)."""
    from hedera_etl_spark.operators.sampling import (
        mixture_rates,
        stratified_hash_sample,
        temperature_mixture_sample,
        temperature_weights,
    )

    rows = (
        [(i, "a") for i in range(400)]
        + [(1000 + i, "b") for i in range(100)]
        + [(2000 + i, "c") for i in range(25)]
    )
    docs = spark.createDataFrame(rows, ["doc_id", "dom"])
    dist = temperature_mixture_sample(
        docs, "dom", key_cols=["doc_id"], alpha=0.5, salt="t"
    )
    rates = mixture_rates(docs, "dom", temperature_weights(docs, "dom", 0.5))
    rates_q = {d: float(round(r, 6)) for d, r in rates.items()}
    dict_form = stratified_hash_sample(docs, "dom", rates_q, ["doc_id"], salt="t")
    assert sorted(r["doc_id"] for r in dist.collect()) == sorted(
        r["doc_id"] for r in dict_form.collect()
    )
    # the binding (scarcest-per-weight) domain keeps everything
    kept_c = dist.filter(F.col("dom") == "c").count()
    assert kept_c == 25
    # deterministic under re-run
    again = temperature_mixture_sample(
        docs, "dom", key_cols=["doc_id"], alpha=0.5, salt="t"
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, dist.collect()))


def test_pipeline_mixture_temperature_param(spark):
    from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

    # unique text per doc (identical texts would exact-dedup to one row
    # before the mixture stage ever runs)
    rows = [(i, f"w{i} " * 20, "big") for i in range(200)] + [
        (1000 + i, f"x{i} " * 20, "small") for i in range(50)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = prepare_training_corpus(
        docs, near_threshold=None, min_tokens=0, mixture_temperature=0.5
    )
    by_dom = {r["source"]: r["n"] for r in out.groupBy("source").agg(
        F.count("*").alias("n")).collect()}
    # smoothed target 2:1 (sqrt(4):sqrt(1) on the 200:50 corpus...
    # sqrt(200):sqrt(50) = 2:1), small binds at 1.0 -> expect ~100 big
    assert by_dom["small"] == 50
    assert 75 <= by_dom["big"] <= 125  # Bernoulli noise around 100
    with pytest.raises(ValueError, match="not both"):
        prepare_training_corpus(
            docs, near_threshold=None, min_tokens=0,
            mixture={"big": 1.0}, mixture_temperature=0.5,
        )


def test_temperature_mixture_null_and_zero_mass_domains_drop(spark):
    """r12 review finding: NULL-domain rows and zero-mass domains (all
    weights 0) drop cleanly — no NaN rates poisoning the solver."""
    from hedera_etl_spark.operators.sampling import temperature_mixture_sample

    docs = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "z", 0.0), (4, None, 5.0)],
        ["doc_id", "dom", "w"],
    )
    out = temperature_mixture_sample(
        docs, "dom", key_cols=["doc_id"], alpha=0.5,
        weight_col="w", salt="t",
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert 3 not in ids and 4 not in ids  # zero-mass + NULL domain drop
    assert ids <= {1, 2} and ids  # the positive-mass domain survives
    # rates are finite for every surviving row
    assert all(r["rate"] == r["rate"] and r["rate"] > 0 for r in out.collect())


def test_cluster_balanced_sample_composition_and_balance(spark):
    """cluster_balanced_sample: clusters come from the IVF assignment
    kernel, rare clusters keep everything (rate 1.0), over-represented
    ones downsample toward c^alpha shares, and the kept set is
    deterministic under repartitioning."""
    import hashlib

    from hedera_etl_spark.operators.sampling import cluster_balanced_sample
    from hedera_etl_spark.operators.similarity import ivf_assign, ivf_centroids

    dims, k = 8, 4
    cents = ivf_centroids(k, dims)
    # skew: 60 vectors near centroid 1, 6 near each of the others
    rows = []
    vid = 0
    for ci, n in ((0, 60), (1, 6), (2, 6), (3, 6)):
        for _ in range(n):
            jitter = [
                0.01 * (int(hashlib.md5(f"{vid}:{d}".encode()).hexdigest()[:4], 16)
                        / 65535.0 - 0.5)
                for d in range(dims)
            ]
            rows.append((vid, [cents[ci][d] + jitter[d] for d in range(dims)]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = cluster_balanced_sample(
        emb, n_clusters=k, alpha=0.5, dims=dims, centroids=cents, salt="t"
    )
    got = out.collect()
    # composition: the cluster column IS the IVF assignment
    assign = {r["vec_id"]: r["bucket"] for r in ivf_assign(emb, cents).collect()}
    assert all(assign[r["vec_id"]] == r["cluster"] for r in got)
    rates = {r["cluster"]: r["rate"] for r in got}
    # rare clusters bind at 1.0; the hot cluster downsamples
    hot = assign[0]
    assert rates[hot] < 1.0
    assert all(v == 1.0 for c, v in rates.items() if c != hot)
    # water-filling at alpha=.5: hot rate = sqrt(c_hot)*min_other_share
    # relation — concretely, expected share ratio sqrt(60)/sqrt(6) vs
    # raw 10x: the kept hot mass shrinks toward ~sqrt
    kept_hot = sum(1 for r in got if r["cluster"] == hot)
    assert kept_hot < 60 * rates[hot] + 10  # Bernoulli, loose bound
    # determinism under repartitioning
    again = cluster_balanced_sample(
        emb.repartition(7), n_clusters=k, alpha=0.5, dims=dims,
        centroids=cents, salt="t",
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
