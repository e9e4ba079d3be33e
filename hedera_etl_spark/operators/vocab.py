"""Tokenizer-corpus statistics: vocabulary frequency tables, the
coverage curve, and adjacent-pair counts.

The pre-tokenizer audit a training pipeline runs before fitting a BPE /
unigram vocabulary: term and document frequencies, the rank-ordered
coverage curve ("the top-k types cover X% of the token stream" — where
to cap the vocab), and adjacent-pair frequencies (the seed statistic of
BPE's first merge round).  The reference system has no tokenizer
surface; this extends the engine's LLM-pipeline operators (SURVEY §2
extras).

Scale shape: both statistics are one explode + one hash aggregate over
the corpus (map-side combined, shuffle keyed by term / pair — the
aggregate output is VOCABULARY-sized, not corpus-sized).  The coverage
ranking then runs as a single-partition window over that vocabulary
table: bounded by |vocab| (≈10^5..10^6 for natural corpora), never by
corpus bytes — the same dimension-vs-fact judgment as the profiler's
driver-side unpivot.  explode_OUTER + output-column null filter per the
repo-wide InferFiltersFromGenerate discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.split(F.col(text_col), " ").alias("__t"),
        )
        .select("doc_id", F.explode_outer("__t").alias("term"))
        .filter(F.col("term").isNotNull())
    )


def vocab_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, tf, df, rank, cum_frac): corpus term frequency, document
    frequency, frequency rank (ties broken by term for a total order),
    and the cumulative share of the token stream covered by ranks 1..r.

    ``cum_frac`` is an exact-integer cumulative sum divided once per row
    (single correctly-rounded double op — engine-portable)."""
    counts = (
        _tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(
            F.count("*").alias("tf"),
            F.countDistinct("doc_id").alias("df"),
        )
    )
    order = W.orderBy(F.col("tf").desc(), F.col("term"))
    run = order.rowsBetween(W.unboundedPreceding, W.currentRow)
    total = W.partitionBy()
    return counts.select(
        "term",
        "tf",
        "df",
        F.row_number().over(order).cast("long").alias("rank"),
        (F.sum("tf").over(run) / F.sum("tf").over(total)).alias("cum_frac"),
    )


def pair_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(left, right, tf): adjacent-token pair frequencies — BPE's
    round-one merge statistic.  Pairs derive from ONE tokenization into a
    projected column (the lambda-inlining hazard shingles() documents),
    exploded outer, one hash aggregate."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
    )
    tc = F.col("__t")
    pairs = F.when(
        F.size(tc) < 2, F.array().cast("array<struct<l:string,r:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - 1),
            lambda i: F.struct(
                F.element_at(tc, i).alias("l"),
                F.element_at(tc, i + 1).alias("r"),
            ),
        )
    )
    return (
        toked.select(F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.count("*").alias("tf"))
    )
