"""fastText-style linear quality classifier scoring over hashed n-gram
features (Joulin et al. 2017, "Bag of Tricks for Efficient Text
Classification"; the model family behind the CCNet / FineWeb-Edu
quality filters).

The serving shape — the only part that matters at corpus scale — is:
featurize each document as a bag of hashed unigrams + bigrams over
``n_buckets`` buckets, look every feature up in a bucket-indexed weight
table, mean-pool, and squash to a [0, 1] score whose threshold decides
keep/drop.  Training happens offline on a few thousand labelled rows;
what a 100 TB pipeline distributes is exactly this scoring pass.

Scale shape (same skeleton as operators/dsir.py, which the design
deliberately shares so the two read as one family):

- the MODEL is ``n_buckets`` rows of (bucket, integer weight) — fixed
  size at any corpus scale, broadcast by construction;
- SCORING is one per-row feature explode + one broadcast hash join on
  the bucket id + ONE doc-keyed exchange with map-side partial
  aggregation (SUM/COUNT over longs) — the corpus text never shuffles;
- the left join back to the doc spine is doc-keyed too, so AQE plans
  it alongside the aggregate without a second wide exchange.

Float canon (the operators/lmscore.py determinism rule): weights are
EXACT INTEGERS in [-scale, +scale] so the per-document sum is
order-free; the raw activation is one correctly-rounded division of
exact operands; and the squash is the rational fast-sigmoid
``0.5 + r / (2 * (1 + |r|))`` — add/abs/divide only, each IEEE
correctly rounded, so Spark and DuckDB produce bit-identical doubles
(a transcendental ``exp`` would be library-dependent in its last ulp
and could flip a rounded boundary).  ``keep`` is ``w_sum >= 0``,
integer-exact.

The shipped weight table is a deterministic md5-derived stand-in (the
same pretrained-model convention as the BM25/LM entries — no labelled
corpus ships with the repo); production callers pass their trained
``weights`` DataFrame with the same (bucket, w_int) schema, or train
one in-cluster with ``train_nb_weights`` (Naive-Bayes log-odds from a
positive/negative corpus pair — one aggregate per class, no
iteration).

Reference parity note: the reference pipelines (hedera-etl /
hedera-deduplication-bigquery) have no analogue — beyond-reference
LLM training-data surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Feature-hash salts: distinct domains for the feature->bucket map and
#: the bucket->weight stand-in so the two md5 streams never collide.
FEAT_SALT = "qcf:"
WEIGHT_SALT = "qcw:"
#: chr(31) — the repo-wide unit separator for composite hash inputs.
_SEP = "\x1f"


def _md5_long(col, salt: str):
    """First 8 md5 hex chars of ``salt || col`` as a non-negative long
    (< 2^32) — the repo's standard cross-engine hash primitive
    (operators/sampling.py:38, DuckDB twin ('0x' || substring(...))."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8), 16, 10
    ).cast("long")


def linear_weights(
    spark: SparkSession, n_buckets: int = 2048, scale: int = 1000
) -> DataFrame:
    """The deterministic stand-in weight table: (bucket, w_int) with
    ``w_int`` uniform over [-scale, +scale] from the bucket's salted
    md5.  n_buckets rows total — broadcastable at any corpus scale."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        (
            _md5_long(F.col("id").cast("string"), WEIGHT_SALT)
            % F.lit(2 * scale + 1)
            - F.lit(scale)
        ).cast("long").alias("w_int"),
    )


def doc_features(
    docs: DataFrame,
    n_buckets: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, bucket) — one row per hashed unigram/bigram occurrence.

    Tokenization is lowercase whitespace splitting; bigrams join
    adjacent tokens with the unit separator.  The bigram build is
    slice + zip_with (NOT ``sequence(1, size-1)``: Spark's sequence
    DESCENDS when start > stop, so a single-token doc would yield
    [1, 0] index garbage); zip_with's null padding marks the final
    unpaired token, and the filter drops it.

    The token array is materialized through its own projection BEFORE
    the bigram build: referencing the split expression directly from
    four places inlines ``split(lower(text))`` four times into the
    Generate node (no common-subexpression factoring across lambda
    boundaries — verified in the formatted plan), quadrupling the
    per-row tokenize cost."""
    from hedera_etl_spark.tables import ensure_parallelism

    toks = F.col("__toks")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, F.greatest(F.size(toks), F.lit(1))),
            lambda x, y: F.when(y.isNotNull(), F.concat_ws(_SEP, x, y)),
        ),
        lambda g: g.isNotNull(),
    )
    # one md5 per feature occurrence — spread the small-file scan split
    return (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("doc_id"),
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
            ).alias("__toks"),
        )
        .select(
            "doc_id",
            F.explode(F.concat(toks, bigrams)).alias("__feat"),
        )
        .select(
            "doc_id",
            (_md5_long(F.col("__feat"), FEAT_SALT) % n_buckets).alias("bucket"),
        )
    )


def quality_classifier_scores(
    docs: DataFrame,
    weights: DataFrame | None = None,
    n_buckets: int = 2048,
    scale: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document with the linear classifier: (doc_id,
    n_feats, w_sum, score, keep) — ``score`` in [0, 1] via the rational
    fast-sigmoid of the mean feature weight, ``keep`` = w_sum >= 0.

    Documents with NULL/empty text have no features: n_feats 0,
    w_sum 0, score 0.5, keep true — a featureless document carries no
    quality evidence either way, and a filter that silently drops
    unscorable rows would be a correctness hazard (the caller can
    always AND in a length floor; prepare_training_corpus does)."""
    spark = docs.sparkSession
    if weights is None:
        weights = linear_weights(spark, n_buckets, scale)
    agg = (
        doc_features(docs, n_buckets, text_col, id_col)
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("w_int").alias("__w_sum"),
            F.count(F.lit(1)).alias("__n"),
        )
    )
    raw = F.col("w_sum").cast("double") / (
        F.lit(float(scale)) * F.greatest(F.col("n_feats"), F.lit(1)).cast("double")
    )
    score = F.lit(0.5) + raw / (F.lit(2.0) * (F.lit(1.0) + F.abs(raw)))
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("__n"), F.lit(0)).cast("long").alias("n_feats"),
            F.coalesce(F.col("__w_sum"), F.lit(0)).cast("long").alias("w_sum"),
        )
        .withColumn("score", score.cast("decimal(12,6)").cast("double"))
        .withColumn("keep", F.col("w_sum") >= 0)
    )


def train_nb_weights(
    pos_docs: DataFrame,
    neg_docs: DataFrame,
    n_buckets: int = 2048,
    scale: int = 1000,
    log_cap: float = 8.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train the (bucket, w_int) table as Naive-Bayes log-odds — the
    fastText-as-NB reading (Joulin et al. §2: a linear classifier over
    averaged hashed features; with add-one-smoothed per-class bucket
    log-odds as the weights this is multinomial NB, the standard
    no-iteration baseline that trains in ONE aggregate per class).

    ``pos_docs`` is the high-quality exemplar corpus (curated pages,
    reference text), ``neg_docs`` the rejection class (raw crawl).
    Weights are ``round(scale * log_odds / log_cap)`` clamped to
    [-scale, +scale] — ``log_cap`` is the log-odds magnitude that
    saturates the integer range (8 ~= an e^8 likelihood ratio; beyond
    that a single feature should not dominate the mean-pool anyway).

    Scale shape: one feature explode + map-side-combined bucket count
    per class (the dsir.bucket_counts shape), a 1-row totals broadcast,
    and a ``n_buckets``-row result — nothing driver-side, nothing
    corpus-sized after the aggregates.  Training uses ``ln`` (library-
    dependent in its last ulp) but only the ROUNDED INTEGER weights
    flow downstream, so serving determinism (see module docstring) is
    unaffected; training itself has no cross-engine oracle — it is the
    offline half of the family, tested by separation behavior, not by
    hash equality."""
    spark = pos_docs.sparkSession

    def _counts(docs: DataFrame, name: str) -> DataFrame:
        return (
            doc_features(docs, n_buckets, text_col, id_col)
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias(name))
        )

    pos = _counts(pos_docs, "__cp")
    neg = _counts(neg_docs, "__cn")
    totals = pos.agg(F.sum("__cp").alias("__np")).crossJoin(
        neg.agg(F.sum("__cn").alias("__nn"))
    )
    grid = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    joined = (
        grid.join(pos, "bucket", "left")
        .join(neg, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.coalesce("__cp", F.lit(0)).alias("__cp"),
            F.coalesce("__cn", F.lit(0)).alias("__cn"),
            F.coalesce("__np", F.lit(0)).alias("__np"),
            F.coalesce("__nn", F.lit(0)).alias("__nn"),
        )
    )
    log_odds = F.log(
        (F.col("__cp") + 1).cast("double")
        / (F.col("__np") + F.lit(n_buckets)).cast("double")
    ) - F.log(
        (F.col("__cn") + 1).cast("double")
        / (F.col("__nn") + F.lit(n_buckets)).cast("double")
    )
    w = F.round(log_odds * F.lit(float(scale) / log_cap)).cast("long")
    return joined.select(
        "bucket",
        F.greatest(F.least(w, F.lit(scale)), F.lit(-scale)).alias("w_int"),
    )
