"""DSIR-style data selection: hashed n-gram importance weights plus
Gumbel top-k resampling (Xie et al., NeurIPS 2023, "Data Selection for
Language Models via Importance Resampling").

The method: featurize every document as a bag of HASHED unigrams and
bigrams over ``n_buckets`` buckets, fit two bag-of-buckets models — one
on a small high-quality TARGET corpus, one on the RAW crawl — and weight
each raw document by the log-likelihood ratio of its feature bag under
the two models.  Resampling k documents with probability proportional to
the weight is then one Gumbel-top-k pass.  The repo already ships the
downstream acceptance step (``sampling.weighted_hash_sample`` /
``prepare_training_corpus(importance_col=...)``); this module computes
the weights themselves.

Scale shape (the whole point of the hashing trick):

- the MODEL is ``n_buckets`` rows — a FIXED size at any corpus scale,
  like the Bloom table in operators/decontam.py.  Fitting is one
  map-side-combined bucket aggregate per corpus; the log-ratio table
  broadcasts by construction.
- SCORING is one per-row feature explode + one broadcast hash join on
  the bucket id + ONE doc-keyed exchange with partial aggregation —
  the corpus text never shuffles, only (doc_id, 6-decimal) pairs.
- RESAMPLING is a global top-k over (log-weight + Gumbel noise), i.e.
  TakeOrderedAndProject — per-partition heaps, no global sort, no
  driver-side weight normalization (the Gumbel-max trick needs only
  log-weights up to an additive constant).

Float canon (the cross-engine determinism rule from
operators/lmscore.py): smoothed probabilities are single
correctly-rounded divisions of exact integer operands; every ``ln`` —
the one library-dependent call — rounds to DECIMAL(12,6) immediately,
and per-document sums run over exact decimals (order-free).  The
Gumbel key is likewise a rounded-``ln`` decimal added to the decimal
log-weight, so top-k ranks identically across engines (ties break on
doc_id).

Reference parity note: the reference pipelines (hedera-etl /
hedera-deduplication-bigquery) have no analogue — this is part of the
beyond-reference LLM training-data surface the build brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^32 — the md5-prefix modulus shared with sampling.hash_bucket.
_BUCKET_MOD = 1 << 32

#: 2^32 - 1 — mask for the xxhash64 production mode (textdedup._U32).
_U32 = (1 << 32) - 1

#: Unit separator — the concat_ws delimiter every hashed key in the
#: repo uses (sampling.hash_bucket).
_SEP = "\x1f"


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"unknown hash_fn: {hash_fn!r} (expected 'md5' or 'xxhash64')"
        )


def hashed_feature_rows(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(doc_id, bucket[, *carry_cols]) — one row PER OCCURRENCE of each
    unigram and bigram feature, hashed into ``n_buckets`` buckets.
    ``carry_cols`` ride along unchanged (e.g. a target-membership flag
    for the one-scan fit).

    Everything up to the explode is a per-row projection (tokenize once,
    build the bigram list off the SAME tokenization, hash inside the
    array — the lambda-inlining discipline from lmscore._doc_bigrams),
    so the operator adds ZERO shuffle of its own.  Multiplicity is kept:
    DSIR's NB model is a bag, not a set.

    ``hash_fn='md5'`` is the oracle canon (DuckDB twin:
    ``('0x' || substring(md5(...), 1, 8))::BIGINT % n_buckets``);
    ``'xxhash64'`` is the production mode — one native JVM hash instead
    of an interpreted hex parse, same bucket-uniformity guarantees, no
    SQL twin (pair-set behavior pinned in tests).
    """
    _check_hash_fn(hash_fn)
    if n_buckets < 2:
        raise ValueError(f"n_buckets must be >= 2, got {n_buckets!r}")
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
        *[F.col(c) for c in carry_cols],
    )
    tc = F.col("__t")
    bigrams = F.when(
        F.size(tc) < 2, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(tc, i), F.element_at(tc, i + 1)
            ),
        )
    )
    if hash_fn == "md5":
        def bucket_of(s):
            digest = F.md5(F.concat_ws(_SEP, F.lit(salt), s))
            return (
                F.conv(F.substring(digest, 1, 8), 16, 10).cast("long")
                % F.lit(n_buckets)
            )
    else:
        def bucket_of(s):
            return (
                F.xxhash64(F.lit(salt), s).bitwiseAND(F.lit(_U32))
                % F.lit(n_buckets)
            )
    buckets = F.transform(F.concat(tc, bigrams), bucket_of)
    return (
        toked.select(
            "doc_id",
            F.explode_outer(buckets).alias("bucket"),
            *[F.col(c) for c in carry_cols],
        )
        .filter(F.col("bucket").isNotNull())
    )


def bucket_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
) -> DataFrame:
    """(bucket, cnt) — the bag-of-buckets model of a corpus.  Output is
    at most ``n_buckets`` rows regardless of corpus size; the aggregate
    is map-side combined on the way in."""
    return hashed_feature_rows(
        docs, text_col, id_col, n_buckets, salt, hash_fn
    ).groupBy("bucket").agg(F.count("*").cast("long").alias("cnt"))


def _ratio_from_counts(counts: DataFrame, n_buckets: int) -> DataFrame:
    """(bucket, target_cnt, raw_cnt) -> the rounded-ln log_ratio table.

    Totals come from ONE single-partition window over the counts frame
    (<= n_buckets rows — a dimension, so the global window is free),
    NOT from separate total-aggregates cross-joined back: that shape
    made the counts subtree a three-consumer plan, re-running the
    corpus feature explode once per consumer and pairing it with
    one-row nested-loop joins (caught by the r12 plan audit: 7
    exchanges and a BNLJ on the registry entry; now 4 and none)."""
    w = Window.partitionBy()
    totals = counts.select(
        "bucket",
        "target_cnt",
        "raw_cnt",
        F.sum("target_cnt").over(w).cast("long").alias("__nt"),
        F.sum("raw_cnt").over(w).cast("long").alias("__nr"),
    )
    lt = F.log(
        (F.col("target_cnt") + F.lit(1.0))
        / (F.col("__nt").cast("double") + F.lit(float(n_buckets)))
    ).cast("decimal(12,6)")
    lr = F.log(
        (F.col("raw_cnt") + F.lit(1.0))
        / (F.col("__nr").cast("double") + F.lit(float(n_buckets)))
    ).cast("decimal(12,6)")
    return totals.select(
        "bucket",
        "target_cnt",
        "raw_cnt",
        (lt - lr).cast("decimal(13,6)").alias("log_ratio"),
    )


def dsir_log_ratio_table(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
) -> DataFrame:
    """The importance model: (bucket, target_cnt, raw_cnt, log_ratio).

    ``log_ratio`` is the per-occurrence add-one-smoothed NB evidence

        ln((target_cnt + 1) / (N_target + n_buckets))
      - ln((raw_cnt    + 1) / (N_raw    + n_buckets))

    with each ``ln`` rounded to DECIMAL(12,6) before the subtraction
    (exact thereafter).  The domain is the UNION of buckets observed in
    either corpus — scoring the raw corpus itself therefore never
    misses; scoring unseen future docs falls back to
    ``dsir_scores(default_log_ratio=...)``.

    Table size is ≤ ``n_buckets`` rows at ANY corpus scale — the
    corpus-size-independent-model property that makes the whole method
    a broadcast join rather than a shuffle.  Totals enter the plan as
    one-row cross joins (broadcast), not driver collects.

    Small-target caveat: with a target corpus much smaller than the
    raw vocabulary, add-one smoothing dominates — a token the target
    never saw but the raw corpus barely saw scores ln(1/(Nt+B)) -
    ln(2/(Nr+B)) > 0, i.e. rare junk looks target-likely.  Use a
    target with token mass comparable to the vocabulary it should
    dominate (the paper fits on corpus-sized targets), or shrink
    ``n_buckets`` toward the target's feature count.
    """
    tgt = bucket_counts(
        target_docs, text_col, id_col, n_buckets, salt, hash_fn
    ).withColumnRenamed("cnt", "target_cnt")
    raw = bucket_counts(
        raw_docs, text_col, id_col, n_buckets, salt, hash_fn
    ).withColumnRenamed("cnt", "raw_cnt")
    joined = tgt.join(raw, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("target_cnt", F.lit(0)).cast("long").alias("target_cnt"),
        F.coalesce("raw_cnt", F.lit(0)).cast("long").alias("raw_cnt"),
    )
    return _ratio_from_counts(joined, n_buckets)


def dsir_scores(
    docs: DataFrame,
    ratio_table: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
    default_log_ratio: float | None = None,
    broadcast_table: bool = True,
) -> DataFrame:
    """(doc_id, n_features, dsir_logw) for every document WITH TEXT.

    Documents whose ``text_col`` is NULL produce no feature rows and
    therefore NO SCORE ROW — downstream samplers see a NULL weight
    after their join, which is exactly the case
    ``weighted_hash_sample(null_weight=...)`` /
    ``prepare_training_corpus(importance_null_weight=...)`` already
    owns, so the policy for unscorable docs stays in ONE place.  (An
    empty STRING still scores: it is one empty-token unigram.)

    ``dsir_logw`` is the summed log-likelihood ratio of the document's
    feature bag — the DSIR importance log-weight (up to the additive
    constant the Gumbel-max trick doesn't need).  One explode + one
    broadcast join + ONE doc-keyed exchange; the decimal sum is exact
    and order-free, so the value is partitioning-invariant.
    ``ratio_table`` must hold each bucket at most once (the
    ``dsir_log_ratio_table`` output contract); a duplicated bucket
    would double-count every feature that hashes to it.

    ``n_buckets``/``salt``/``hash_fn`` must match the table's fit (they
    parameterize the same feature hash).  Buckets absent from the table
    contribute ``default_log_ratio`` (rounded to 6 decimals); leaving it
    ``None`` raises on a miss at execution time only if one occurs —
    pass it when scoring docs outside the fitted corpora.
    """
    fr = hashed_feature_rows(
        docs, text_col, id_col, n_buckets, salt, hash_fn
    )
    tbl = ratio_table.select("bucket", "log_ratio")
    if broadcast_table:
        tbl = F.broadcast(tbl)
    if default_log_ratio is None:
        lr = F.when(
            F.col("log_ratio").isNull(),
            F.raise_error(F.lit(
                "dsir_scores: feature bucket missing from ratio_table and "
                "no default_log_ratio given"
            )).cast("decimal(13,6)"),
        ).otherwise(F.col("log_ratio"))
    else:
        lr = F.coalesce(
            F.col("log_ratio"),
            F.lit(round(float(default_log_ratio), 6)).cast("decimal(13,6)"),
        )
    return (
        fr.join(tbl, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum(lr).cast("decimal(38,6)").cast("double").alias("dsir_logw"),
        )
    )


def gumbel_topk_resample(
    scores: DataFrame,
    k: int,
    salt: str = "dsirg",
    id_col: str = "doc_id",
    logw_col: str = "dsir_logw",
) -> DataFrame:
    """Sample ``k`` documents WITHOUT replacement with probability
    proportional to exp(log-weight) — the Gumbel-top-k trick: add
    independent Gumbel(0,1) noise to each log-weight and take the k
    largest keys.  Input columns pass through plus ``gumbel_key``.

    The noise is hash-derived (md5 of salt + id, the repo's
    deterministic-draw idiom), so the sample is reproducible across
    retries, partitionings and engines; the ORDER BY ... LIMIT k form
    compiles to TakeOrderedAndProject — per-partition heaps of size k,
    no global sort, no weight normalization pass.

    Float canon: u = (md5-prefix + 0.5) / 2^32 lies strictly inside
    (0, 1), the nested ``ln`` rounds to DECIMAL(12,6) once, and the key
    is that decimal plus the (re-rounded) decimal log-weight — exact
    decimal compare, doc_id tiebreak.  The RANKING runs on the exact
    decimal; the output column is its (injective at 6 decimals) DOUBLE
    image, per the registry's no-decimal-outputs canon.

    Rows with a NULL log-weight (e.g. a NULL-text doc that never got a
    score, reattached by a caller's outer join) get a NULL key, sort
    LAST under the descending order, and are therefore never sampled —
    the conservative default for unscorable documents; resolve them
    upstream (``default_log_ratio`` / ``importance_null_weight``) to
    opt them in.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k!r}")
    digest = F.md5(
        F.concat_ws(_SEP, F.lit(salt), F.col(id_col).cast("string"))
    )
    u = (
        F.conv(F.substring(digest, 1, 8), 16, 10).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_BUCKET_MOD))
    gumbel = (-F.log(-F.log(u))).cast("decimal(12,6)")
    # decimal(20,6) holds |logw| < 1e14 — a 1e12-feature document at the
    # ~30-per-term ln bound before overflow, far beyond any real doc.
    key = (
        gumbel + F.col(logw_col).cast("decimal(20,6)")
    ).cast("decimal(21,6)")
    return (
        scores.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), F.col(id_col))
        .limit(k)
        .withColumn("gumbel_key", F.col("gumbel_key").cast("double"))
    )


def dsir_keep_probs(
    scores: DataFrame,
    rate: float,
    logw_col: str = "dsir_logw",
    id_col: str = "doc_id",
    max_iters: int = 20,
) -> DataFrame:
    """Map DSIR log-weights to per-row Bernoulli keep PROBABILITIES with
    an exact expected keep fraction — the bridge into the pipeline's
    ``weighted_hash_sample`` / ``prepare_training_corpus(
    importance_col=...)`` acceptance step, which consumes a [0, 1]
    keep-probability column rather than a rank.

    Solves the water-filling problem: p_i = min(1, c * exp(logw_i))
    with c chosen so that sum(p_i) = rate * N exactly.  Heavy
    documents cap at 1 and their excess mass redistributes to the
    rest; each redistribution round is ONE bounded aggregate (count +
    log-sum-exp over the still-uncapped rows, computed stably as
    max + ln sum exp(x - max)), and the capped set only grows, so the
    loop terminates in at most the number of distinct capped levels —
    the bpe_merges bounded-driver pattern.  All arithmetic stays in
    log space until the final per-row ``exp``, so huge log-weights
    never overflow.

    Returns the input columns plus ``keep_prob``.  Deterministic given
    the input; rows with a NULL log-weight get keep_prob NULL (the
    downstream ``null_weight`` policy decides them).  ``rate >= 1``
    returns all-1s; an empty frame returns empty.
    """
    import math

    if not 0.0 <= rate:
        raise ValueError(f"rate must be >= 0, got {rate!r}")
    lw = F.col(logw_col)
    # the water-filling loop is inherently multi-consumer (one count +
    # one log-sum-exp + one crossing count per round, then the final
    # projection) — pin the scores once or every aggregate re-runs the
    # whole upstream scoring/fit subtree (checkpoint-vs-rescan: the
    # frame is one row per doc at ~3 columns, cheap to materialize)
    scores = scores.localCheckpoint(eager=False)
    n_total = scores.filter(lw.isNotNull()).count()
    if n_total == 0 or rate >= 1.0:
        return scores.withColumn(
            "keep_prob",
            F.when(lw.isNotNull(), F.lit(min(1.0, rate))).otherwise(
                F.lit(None).cast("double")
            ),
        )
    target = rate * n_total
    t = math.inf  # cap threshold: rows with logw >= t get p = 1
    n_cap = 0
    log_c = None
    for _ in range(max_iters):
        agg = (
            scores.filter(lw.isNotNull() & (lw < F.lit(t)))
            .agg(
                F.count("*").alias("n"),
                F.max(lw).alias("mx"),
            )
            .collect()[0]
        )
        n_un, mx = int(agg["n"]), agg["mx"]
        mass = target - n_cap
        if n_un == 0 or mass <= 0:
            # every row capped (rate*N >= N can't happen here) or the
            # cap set alone exhausts the budget: uncapped rows get 0
            log_c = -math.inf
            break
        mx = float(mx)
        lse = scores.filter(lw.isNotNull() & (lw < F.lit(t))).agg(
            (
                F.lit(mx)
                + F.log(F.sum(F.exp(lw - F.lit(mx))))
            ).alias("lse")
        ).collect()[0]["lse"]
        log_c = math.log(mass) - float(lse)
        new_t = -log_c  # rows with logw >= -log_c would exceed p = 1
        crossing = int(
            scores.filter(
                lw.isNotNull() & (lw < F.lit(t)) & (lw >= F.lit(new_t))
            ).count()
        )
        if crossing == 0:
            break
        n_cap += crossing
        t = new_t
    p = F.when(lw.isNull(), F.lit(None).cast("double")).otherwise(
        F.when(lw >= F.lit(t), F.lit(1.0)).otherwise(
            F.least(F.lit(1.0), F.exp(lw + F.lit(log_c)))
        )
    )
    return scores.withColumn("keep_prob", p)


def dsir_log_ratio_table_where(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
) -> DataFrame:
    """One-scan fit for the common case where the TARGET is a
    predicate-identified slice of the raw corpus itself (a source
    label, a quality tier, a language): both count tables fall out of
    a single feature pass via conditional aggregation, instead of the
    two corpus scans ``dsir_log_ratio_table(docs.filter(cond), docs)``
    pays.  At 100 TB that is the difference between two full reads and
    one.

    Output is BIT-IDENTICAL to the two-frame form on the same data
    (same counts -> same exact totals -> same rounded ``ln`` terms;
    pinned in tests), so the same oracle covers both.  ``target_cond``
    is a boolean Column over ``docs``' columns.
    """
    fr = hashed_feature_rows(
        docs.withColumn("__is_t", target_cond),
        text_col,
        id_col,
        n_buckets,
        salt,
        hash_fn,
        carry_cols=("__is_t",),
    )
    counts = fr.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0))
        .cast("long")
        .alias("target_cnt"),
        F.count("*").cast("long").alias("raw_cnt"),
    )
    return _ratio_from_counts(counts, n_buckets)


def dsir_feature_rows_where(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
) -> DataFrame:
    """The (doc_id, bucket, __is_t) feature plan ``dsir_scores_where``
    checkpoints — exposed separately so repeat callers can build the
    expression-heavy plan ONCE and hand it in via ``feature_rows``:
    the nested lambda/transform tree costs ~0.5 s of driver-side
    construction per build (measured, r15), a constant the per-run
    checkpoint otherwise re-pays because checkpoint-bearing plans are
    excluded from the registry's prepared-plan cache.  A pure logical
    plan — no data is pinned until a downstream checkpoint
    materializes it."""
    return hashed_feature_rows(
        docs.withColumn("__is_t", target_cond),
        text_col,
        id_col,
        n_buckets,
        salt,
        hash_fn,
        carry_cols=("__is_t",),
    )


def dsir_scores_where(
    docs: DataFrame,
    target_cond,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    salt: str = "dsir",
    hash_fn: str = "md5",
    default_log_ratio: float | None = None,
    feature_rows: DataFrame | None = None,
) -> DataFrame:
    """Fit AND score in ONE feature pass — the fused form of
    ``dsir_scores(docs, dsir_log_ratio_table_where(docs, cond))``.

    That composition hashes every token+bigram occurrence TWICE: the fit
    explodes and md5-buckets the corpus to build the ratio table, and
    the scorer explodes and md5-buckets the SAME corpus again to join
    against it — Catalyst cannot share the subtree because column
    pruning specializes the two copies (the fit carries ``__is_t``, the
    scorer does not), so exchange reuse never fires (r15 optimization
    round, measured).  Here the (doc_id, bucket, __is_t) feature rows
    are materialized once via a lazy ``localCheckpoint`` — the
    minhash_lsh_neardups multi-consumer idiom — and both the bucket
    aggregate (fit) and the doc aggregate (score) read the checkpointed
    rows: ONE tokenize+hash pass instead of two, i.e. one corpus scan
    instead of two at 100 TB, at the cost of materializing ~25-byte
    rows per feature occurrence on the executors.

    Output is BIT-IDENTICAL to the two-call composition (same feature
    rows -> same counts -> same rounded-ln ratios -> same exact decimal
    sums; pinned in tests/test_dsir.py), so the same oracle covers both.
    Callers that score a DIFFERENT corpus than they fit still need the
    two-call form.  NOTE: the embedded checkpoint pins materialized
    data, so registry entries built on this must opt out of the
    prepared-plan cache (``cache_plan=False``), like every other
    checkpoint-bearing entry.
    """
    _check_hash_fn(hash_fn)
    if feature_rows is None:
        feature_rows = dsir_feature_rows_where(
            docs, target_cond, text_col, id_col, n_buckets, salt, hash_fn
        )
    fr = feature_rows.localCheckpoint(eager=False)
    counts = fr.groupBy("bucket").agg(
        F.sum(F.when(F.col("__is_t"), 1).otherwise(0))
        .cast("long")
        .alias("target_cnt"),
        F.count("*").cast("long").alias("raw_cnt"),
    )
    ratio = _ratio_from_counts(counts, n_buckets)
    tbl = F.broadcast(ratio.select("bucket", "log_ratio"))
    if default_log_ratio is None:
        lr = F.when(
            F.col("log_ratio").isNull(),
            F.raise_error(F.lit(
                "dsir_scores_where: feature bucket missing from ratio table"
                " — impossible when scoring the fitted corpus"
            )).cast("decimal(13,6)"),
        ).otherwise(F.col("log_ratio"))
    else:
        lr = F.coalesce(
            F.col("log_ratio"),
            F.lit(round(float(default_log_ratio), 6)).cast("decimal(13,6)"),
        )
    return (
        fr.join(tbl, "bucket", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_features"),
            F.sum(lr).cast("decimal(38,6)").cast("double").alias("dsir_logw"),
        )
    )
