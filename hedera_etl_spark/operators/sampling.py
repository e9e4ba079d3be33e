"""Deterministic sampling for training-data pipelines.

Corpus downsampling in production must be REPRODUCIBLE — re-running the
pipeline (or re-executing a failed stage) has to select the identical
rows, and an auditor has to be able to re-derive the sample from the raw
table.  ``rand()``-based sampling fails all of that (per-task RNG state,
partition-order dependence), so these operators derive the sampling
decision from a content hash of the row's key: a row is kept iff its
md5-derived bucket in [0, 1) falls below the rate.

md5 (not xxhash64) so any engine reproduces the exact sample — the
DuckDB oracle twin computes the same buckets from the same hex digits
(the same cross-engine determinism contract as textdedup's signatures).

Scale: pure per-row projections — no shuffle, no state; the stratified
variant broadcasts a tiny rates map.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Bucket resolution: 8 hex digits = 32 bits → rates resolve to ~2^-32.
_BUCKET_MOD = 1 << 32


def hash_bucket(*cols: Column | str, salt: str = "") -> Column:
    """Uniform [0, 1) bucket from the md5 of the concatenated key columns.

    ``salt`` decorrelates independent sampling decisions over the same
    key (e.g. a 1% eval split drawn independently of a 10% train
    downsample) — different salts give independent buckets.
    """
    parts = [F.col(c) if isinstance(c, str) else c for c in cols]
    digest = F.md5(F.concat_ws("\x1f", F.lit(salt), *[p.cast("string") for p in parts]))
    return F.conv(F.substring(digest, 1, 8), 16, 10).cast("long") / F.lit(
        float(_BUCKET_MOD)
    )


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Keep each row iff bucket(key) < rate — deterministic Bernoulli
    sampling, identical under retries, re-runs and engines."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate!r}")
    return df.filter(hash_bucket(*key_cols, salt=salt) < rate)


def stratified_hash_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-data mixture
    knob (e.g. keep 100% of low-resource languages, 10% of the crawl).

    ``rates`` maps stratum value -> keep rate; strata not listed keep
    ``default_rate`` (0.0 = drop, 1.0 = keep all).  The decision hash
    uses the key columns only, NOT the stratum, so a row's bucket is
    stable even if it is re-labeled into a different stratum later.
    """
    for stratum, rate in rates.items():
        if not 0.0 <= rate <= 1.0:
            raise ValueError(f"rate for {stratum!r} must be in [0, 1], got {rate!r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate!r}")
    rate_col = F.lit(float(default_rate))
    for stratum, rate in sorted(rates.items()):
        rate_col = F.when(F.col(strata_col) == stratum, F.lit(float(rate))).otherwise(
            rate_col
        )
    return df.filter(hash_bucket(*key_cols, salt=salt) < rate_col)


def mixture_rates(
    docs: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    weight_col: str | None = None,
) -> dict[str, float]:
    """Per-domain keep-rates that reshape the corpus into a target
    mixture — the training-data composition knob (e.g. "40% web, 30%
    code, 30% books" BY TOKENS, not by accident of crawl size).

    Downsampling only (rates ≤ 1): the achievable output size is
    ``T = min_d(c_d / w_d)`` over the targeted domains (c_d = the
    domain's current mass — row count, or ``sum(weight_col)`` when
    given, e.g. a token count column), and each domain keeps
    ``r_d = w_d * T / c_d``.  The scarcest domain relative to its
    target weight is binding: its rate is exactly 1.0, every other
    domain downsamples to match.  A targeted domain absent from the
    corpus (or with zero mass) makes the mixture unachievable → raises.

    The per-domain totals aggregate is the ONLY driver materialization:
    one row per domain — dimension-sized by definition, safe at any
    corpus size (same bounded-collect discipline as the IVF k-means
    stats, operators/similarity.py).
    """
    bad = {d: w for d, w in target_weights.items() if w <= 0}
    if bad:
        raise ValueError(f"target weights must be positive, got {bad!r}")
    total_w = sum(target_weights.values())
    mass = F.count("*") if weight_col is None else F.sum(weight_col)
    counts = {
        r["d"]: r["c"]
        for r in docs.filter(F.col(domain_col).isin(list(target_weights)))
        .groupBy(F.col(domain_col).alias("d"))
        .agg(mass.cast("long").alias("c"))
        .collect()
    }
    missing = [d for d in target_weights if not counts.get(d)]
    if missing:
        raise ValueError(
            f"domains {missing!r} have no mass in the corpus; the target "
            "mixture is unachievable by downsampling"
        )
    norm = {d: w / total_w for d, w in target_weights.items()}
    t_out = min(counts[d] / w for d, w in norm.items())
    return {d: min(w * t_out / counts[d], 1.0) for d, w in norm.items()}


def temperature_weights(
    docs: DataFrame,
    domain_col: str,
    alpha: float = 0.3,
    weight_col: str | None = None,
) -> dict[str, float]:
    """Temperature-smoothed target mixture from the corpus's OWN domain
    masses: ``w_d ∝ c_d^alpha`` (the multilingual-LM exponential
    smoothing — alpha=1 reproduces the natural mixture, alpha→0
    approaches uniform; mT5 trains at alpha=0.3).  Boosts low-resource
    domains relative to their crawl share without hand-writing a target
    dict.  One dimension-sized aggregate is the only driver
    materialization (the ``mixture_rates`` discipline); feed the result
    straight into ``mixture_rates`` / ``mixture_sample``."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha!r}")
    mass = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    counts = {
        r["d"]: r["c"]
        for r in docs.filter(F.col(domain_col).isNotNull())
        .groupBy(F.col(domain_col).alias("d"))
        .agg(mass.cast("double").alias("c"))
        .collect()
        if r["c"]
    }
    if not counts:
        raise ValueError(f"no non-null {domain_col!r} mass in the corpus")
    return {d: c**alpha for d, c in counts.items()}


def temperature_mixture_sample(
    docs: DataFrame,
    domain_col: str,
    key_cols: list[str],
    alpha: float = 0.3,
    weight_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Temperature-smoothed mixture resampling, fully DISTRIBUTED — no
    driver materialization at all, so ``domain_col`` may have any
    cardinality (per-site mixing over millions of hosts, not just a
    handful of languages).

    Same math as ``temperature_weights`` + ``mixture_rates`` fused into
    the plan: one dimension-sized aggregate, the normalizing sum and
    the binding-domain min as single-partition windows over that
    DIMENSION (never the corpus), one broadcast join back, one
    md5-bucket filter.  Output keeps the input schema plus ``rate``
    (the domain's keep-rate, DECIMAL(9,6)-rounded — the rounding is the
    cross-engine hash canon, and quantizing the Bernoulli threshold to
    1e-6 is immaterial to the mixture).

    ``alpha=0.5`` computes the smoothing via ``sqrt`` — IEEE-exact in
    every engine, unlike ``pow`` whose last ulp is libm-specific —
    making the whole plan bit-portable (the oracle-checked
    configuration).

    Rows with a NULL domain, and rows of a domain whose total mass is
    zero (``weight_col`` all zeros), DROP — the ``mixture_sample``
    outside-target semantics; a mixture has no share for them.
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha!r}")
    smooth = F.sqrt if alpha == 0.5 else (lambda c: F.pow(c, F.lit(alpha)))
    dim_w = Window.partitionBy()  # dimension-sized frame only
    dims = (
        docs.filter(F.col(domain_col).isNotNull())
        .groupBy(domain_col)
        .agg(
            (
                F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
            ).cast("double").alias("__c")
        )
        # a domain whose mass is zero (all row weights 0) has no target
        # share and would otherwise poison the solver with NaN rates —
        # its rows drop via the inner join, exactly like NULL-domain
        # rows (r12 review finding; mixture_sample's outside-target
        # semantics)
        .filter(F.col("__c") > 0)
        .withColumn("__w", smooth(F.col("__c")))
        .withColumn("__wsum", F.sum("__w").over(dim_w))
        .withColumn(
            "__t", F.min(F.col("__c") * F.col("__wsum") / F.col("__w")).over(dim_w)
        )
        .select(
            domain_col,
            F.least(
                F.lit(1.0),
                (F.col("__w") / F.col("__wsum")) * F.col("__t") / F.col("__c"),
            )
            .cast("decimal(9,6)")
            .cast("double")
            .alias("rate"),
        )
    )
    return docs.join(F.broadcast(dims), domain_col).filter(
        hash_bucket(*key_cols, salt=salt) < F.col("rate")
    )


def mixture_sample(
    docs: DataFrame,
    domain_col: str,
    target_weights: dict[str, float],
    key_cols: list[str],
    weight_col: str | None = None,
    salt: str = "",
) -> DataFrame:
    """Deterministically resample ``docs`` to the target domain mixture:
    ``mixture_rates`` solves for per-domain keep-rates, then the standard
    md5-bucket stratified sample applies them (domains outside the target
    drop entirely).  Expected output composition matches
    ``target_weights`` up to Bernoulli noise; the realized sample is
    exactly reproducible across retries, re-runs, and engines."""
    rates = mixture_rates(docs, domain_col, target_weights, weight_col)
    return stratified_hash_sample(
        docs, domain_col, rates, key_cols=key_cols, default_rate=0.0, salt=salt
    )


def weighted_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: Column | str,
    salt: str = "",
    null_weight: float = 0.0,
) -> DataFrame:
    """Keep each row iff bucket(key) < weight — per-row importance
    sampling, the DSIR-style "resample the corpus proportionally to a
    quality/relevance score" knob (each row's keep probability IS its
    weight instead of one global rate).

    ``weight_col`` is a column (or name) of per-row keep probabilities;
    values are clamped into [0, 1] so an unnormalized score can't
    silently invert the filter (w <= 0 drops, w >= 1 always keeps).
    A NULL weight is EXPLICITLY coalesced to ``null_weight`` (default
    0.0 = drop unscored rows; pass 1.0 to keep them — ADVICE r8 #4: on
    a sparsely-scored corpus the default silently loses every unscored
    row, so the choice must be the caller's, not an accident of
    ``greatest``'s NULL skipping).
    Same md5-bucket determinism contract as ``hash_sample``: the decision
    hashes the KEY only, so re-runs, retries, and the oracle engine
    reproduce the identical sample, and per-row keep decisions are
    monotone in the weight (raising a row's weight never drops it).

    Scale: one per-row projection + filter — zero shuffles, no state.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    w = F.coalesce(w.cast("double"), F.lit(float(null_weight)))
    clamped = F.least(F.greatest(w, F.lit(0.0)), F.lit(1.0))
    return df.filter(hash_bucket(*key_cols, salt=salt) < clamped)


def grouped_hash_sample(
    df: DataFrame,
    group_cols: list[str],
    k: int,
    key_cols: list[str],
    salt: str = "",
    n_shards: int = 32,
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Exactly-k-per-group uniform sample (reservoir semantics, made
    deterministic): the k rows with the smallest md5 buckets win, so the
    draw is uniform over each group yet reproducible across retries,
    re-runs, engines, and row arrival order — everything
    ``df.sampleBy``'s RNG is not.  Groups smaller than k keep all rows.

    ``key_cols`` must uniquely identify rows (the same contract as
    ``grouped_topk``'s total order): rows sharing the full key also
    share their (bucket, key) sort position, so at a group's k-boundary
    ``row_number`` would pick a partition-order-dependent duplicate and
    the reproducibility contract above breaks exactly there.

    Plan shape is ``grouped_topk``'s two-phase local-then-global top-k
    (operators/topk.py) ordered by (bucket, key): group columns are
    low-cardinality at corpus scale (languages, sources), so the naive
    one-window form would sort each whole group on a single reducer.
    Output carries ``rank_col`` (1-based draw order) — stable, so
    ``rank <= j`` for j < k is the same sample drawn smaller.
    """
    from hedera_etl_spark.operators.topk import grouped_topk

    order = [hash_bucket(*key_cols, salt=salt).asc()] + [
        F.col(c).asc() for c in key_cols
    ]
    return grouped_topk(
        df,
        keys=group_cols,
        order=order,
        k=k,
        # shard on the FULL key: a composite key's first column alone can
        # be coarse (e.g. ["source", "doc_id"]), which would cap each
        # group's phase-1 spread at that column's distinct count
        shard_on=F.xxhash64(*key_cols),
        n_shards=n_shards,
        rank_col=rank_col,
    )


def train_val_test_split(
    df: DataFrame,
    key_cols: list[str],
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Label every row ``train`` / ``val`` / ``test`` by disjoint md5
    bucket ranges — the deterministic three-way split a training
    pipeline cuts exactly once.

    One bucket, three ranges (``[0, test) -> test``, ``[test,
    test+val) -> val``, rest train), so membership is a pure function of
    the key + salt: stable under retries, re-runs, engines, data
    arrival order, and CORPUS GROWTH — a document's split never changes
    when more data arrives (the property random splits lack, and the
    reason eval contamination sneaks in when splits are re-rolled).
    Change ``salt`` to draw an independent split; the same salt in
    ``hash_sample`` draws correlated subsets, so keep split salts
    distinct from sampling salts.

    Zero shuffles — one projection; filter on ``split_col`` for the
    subsets or write partitioned by it.
    """
    if not 0.0 <= val_frac <= 1.0 or not 0.0 <= test_frac <= 1.0:
        raise ValueError("val_frac and test_frac must be in [0, 1]")
    if val_frac + test_frac > 1.0:
        raise ValueError("val_frac + test_frac must not exceed 1.0")
    b = hash_bucket(*key_cols, salt=salt)
    return df.withColumn(
        split_col,
        F.when(b < test_frac, F.lit("test"))
        .when(b < test_frac + val_frac, F.lit("val"))
        .otherwise(F.lit("train")),
    )


def cluster_balanced_sample(
    emb: DataFrame,
    n_clusters: int = 16,
    alpha: float = 0.5,
    dims: int = 64,
    centroids: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt: str = "",
) -> DataFrame:
    """Cluster-balanced resampling — the EMBEDDING-SPACE mixture knob
    (the topic-rebalancing practice of DataComp/DCLM and SemDeDup's
    cluster framing, both public literature): documents group by
    CONTENT, not metadata — every vector assigns to its argmax-dot
    centroid (the IVF coarse-quantizer kernel: one zero-shuffle in-row
    pass over broadcast centroid literals), then the temperature
    mixture solver reweights CLUSTERS exactly like languages or
    sources — over-represented topics downsample toward c^alpha
    shares via the exact water-filling rates, rare topics keep
    everything.

    A pure composition of two independently-oracled kernels
    (similarity.ivf_assign + temperature_mixture_sample), so the
    combined relation is itself hash-checkable cross-engine when the
    deterministic md5 centroid grid stands in for training; pass
    ``similarity.ivf_train_kmeans(...)`` output for the production
    quantizer.  Returns (id_col, cluster, rate) for kept rows —
    ``rate`` is the cluster's keep-rate, DECIMAL(9,6)-rounded (the
    house float canon)."""
    from hedera_etl_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
    )

    centroids = centroids or ivf_centroids(n_clusters, dims)
    assigned = ivf_assign(emb, centroids, id_col, vec_col).select(
        F.col("vec_id").alias(id_col),
        F.col("bucket").cast("long").alias("cluster"),
    )
    return temperature_mixture_sample(
        assigned, "cluster", key_cols=[id_col], alpha=alpha, salt=salt
    )
