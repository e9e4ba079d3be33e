"""N-gram language-model scoring: the perplexity-style quality signal.

The CCNet / Gopher / Llama data pipelines all gate documents on an
n-gram (or small neural) LM's perplexity — text that a corpus-level LM
finds surprising is disproportionately boilerplate, OCR noise, or
machine-generated spam.  The reference system has no LM surface; this
extends the engine's LLM-pipeline quality operators (SURVEY §2 extras)
with the classic add-k-smoothed bigram model:

    p(w2 | w1) = (c(w1, w2) + k) / (c(w1) + k * V)

Scale shape:
- training (:func:`bigram_lm`) is two hash aggregates over one
  tokenization (bigram counts + unigram counts) and one broadcastable
  dimension join — the model is BIGRAM-VOCABULARY-sized, never
  corpus-sized;
- scoring (:func:`lm_scores`) explodes each document's bigrams off one
  tokenization, joins the model (broadcast when it fits, shuffled
  equi-join otherwise — linear either way), and aggregates one row per
  document.

Engine portability (the repo-wide hashed-aggregate canon): every
probability is ONE correctly-rounded IEEE division of exactly
representable operands (counts + k = 0.5 halves, all < 2^52), and each
bigram's ln(p) rounds to DECIMAL(12,6) BEFORE the per-document sum, so
the aggregate is an exact order-free decimal sum.  ``ln`` itself is the
one library-dependent call (<= ~2 ulp across engines, ~4e-15 absolute
at these magnitudes); the 1e-6 rounding grid makes a cross-engine flip
a ~4e-9-per-term event — the same judgment BM25 documents for its
rational-idf trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Add-k smoothing constant — 0.5 (Jeffreys); exactly representable, so
#: count + K and count + K * V are single exact double constructions.
K = 0.5


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per adjacent token pair, built per-row
    off ONE tokenization into a projected column (the lambda-inlining
    discipline), exploded outer + output-column null filter."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
    )
    tc = F.col("__t")
    pairs = F.when(
        F.size(tc) < 2, F.array().cast("array<struct<w1:string,w2:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - 1),
            lambda i: F.struct(
                F.element_at(tc, i).alias("w1"),
                F.element_at(tc, i + 1).alias("w2"),
            ),
        )
    )
    return (
        toked.select("doc_id", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .select("doc_id", "p.w1", "p.w2")
    )


def bigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the model: (w1, w2, c2, c1, v) rows — bigram count, the
    left word's unigram-as-context count (= how many bigrams start with
    w1), and the context vocabulary size V (constant column).  The
    smoothed probability is derived at scoring time so the table stays
    integer-exact and engine-portable.

    ``c1`` counts w1's occurrences AS A BIGRAM CONTEXT (i.e. excluding
    each document's final token), which makes the conditional sum to 1
    over the vocabulary — the textbook formulation."""
    bg = _doc_bigrams(docs, text_col, id_col)
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = bg.groupBy("w1").agg(F.count("*").alias("c1"))
    v = bg.select(F.col("w2").alias("w")).union(
        bg.select(F.col("w1").alias("w"))
    ).agg(F.countDistinct("w").cast("long").alias("v"))
    return c2.join(F.broadcast(c1), "w1").crossJoin(F.broadcast(v))


def lm_scores(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
) -> DataFrame:
    """(doc_id, n_bigrams, sum_logp, avg_logp) for every document with
    at least one bigram.  ``avg_logp`` is the mean ln-probability —
    perplexity is exp(-avg_logp), monotone, so thresholds apply to
    avg_logp directly (kept in log space to avoid a second
    library-dependent transcendental call).

    Unseen bigrams back off inside the same formula: an unseen (w1, w2)
    under a seen w1 scores (0 + K)/(c1 + K*V); a wholly unseen w1
    scores K/(K*V) = 1/V.  Both fall out of coalescing the join's
    missing counts to zero, so one expression covers every case."""
    bg = _doc_bigrams(docs, text_col, id_col)
    # c2 keys on the bigram, c1 on the context alone — separate joins,
    # else a seen-w1/unseen-w2 bigram would lose its context count and
    # the backoff formula would collapse to the unseen-context case
    m2 = model.select("w1", "w2", "c2")
    m1 = model.select("w1", "c1").dropDuplicates(["w1"])
    v = model.select("v").limit(1)
    if broadcast_model:
        m2, m1 = F.broadcast(m2), F.broadcast(m1)
    logp = F.expr(
        "CAST(ln((CAST(coalesce(c2, 0) AS DOUBLE) + 0.5D)"
        "        / (CAST(coalesce(c1, 0) AS DOUBLE) + 0.5D * CAST(v AS DOUBLE)))"
        "     AS DECIMAL(12,6))"
    )
    return (
        bg.join(m2, ["w1", "w2"], "left")
        .join(m1, "w1", "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", logp.alias("__lp"))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("__lp").alias("__sum"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("__sum").cast("decimal(38,6)").cast("double").alias("sum_logp"),
            (
                F.col("__sum").cast("decimal(38,6)").cast("double")
                / F.col("n_bigrams")
            ).alias("avg_logp"),
        )
    )


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    min_avg_logp: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep documents whose mean bigram ln-probability clears the floor
    (equivalently: perplexity below exp(-min_avg_logp)).  Documents too
    short to have a bigram pass through unjudged — length floors are the
    quality_scores operator's job, not the LM's."""
    scored = lm_scores(docs, model, text_col, id_col)
    drop = scored.filter(F.col("avg_logp") < min_avg_logp).select(
        F.col("doc_id").alias(id_col)
    )
    return docs.join(drop, id_col, "left_anti")
