"""Tokenizer-corpus statistics and BPE training: vocabulary frequency
tables, the coverage curve, adjacent-pair counts, and the full
byte-pair-encoding merge loop.

The pre-tokenizer audit a training pipeline runs before fitting a BPE /
unigram vocabulary: term and document frequencies, the rank-ordered
coverage curve ("the top-k types cover X% of the token stream" — where
to cap the vocab), adjacent-pair frequencies (the seed statistic of
BPE's first merge round), and :func:`bpe_merges` — the iterated merge
loop itself (Sennrich et al. 2016), with :func:`bpe_segment` as its
inference half.  The reference system has no tokenizer surface; this
extends the engine's LLM-pipeline operators (SURVEY §2 extras).

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


def _adjacent_pair_counts(state: DataFrame) -> DataFrame:
    """(lhs, rhs, tf) over the symbolized word table — pair frequency
    weighted by word count.  Vocabulary-sized input, pair-sized output."""
    syms = F.col("__syms")
    pairs = F.when(
        F.size(syms) < 2, F.array().cast("array<struct<l:string,r:string>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda i: F.struct(
                F.element_at(syms, i).alias("l"),
                F.element_at(syms, i + 1).alias("r"),
            ),
        )
    )
    return (
        state.select("cnt", F.explode_outer(pairs).alias("p"))
        .filter(F.col("p").isNotNull())
        .groupBy(F.col("p.l").alias("lhs"), F.col("p.r").alias("rhs"))
        .agg(F.sum("cnt").alias("tf"))
    )


def _apply_merge(syms, lhs: str, rhs: str):
    """Greedy left-to-right non-overlapping merge of adjacent (lhs, rhs)
    symbol pairs — the standard BPE application rule.  A sequential fold:
    append each symbol, but when the accumulator ends in ``lhs`` and the
    incoming symbol is ``rhs``, replace that tail with the merged symbol.
    Leftmost-first falls out naturally: once merged, the tail equals
    lhs||rhs != lhs, so a chained occurrence (e.g. 'a a a' under (a, a))
    does not re-merge — matching the scan-left-to-right canon."""
    merged = lhs + rhs
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(lhs))
            & (x == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize-to-ids — the step that hands a packed corpus to a
    trainer: apply a trained merge list and map every piece to a
    frequency-ranked integer id.  Output one row per (doc, term, piece):
    (doc_id, term, piece_pos, piece, piece_id), piece_pos 1-based.

    Scale shape: segmentation runs over the DISTINCT-term VOCABULARY
    (``bpe_segment`` on a deduped term frame — the per-row merge folds
    are the expensive part and the vocabulary is orders of magnitude
    smaller than the corpus), then joins back to per-document terms;
    the piece-id ranking is a single-partition window over the PIECE
    dimension only (the ``vocab_stats`` discipline).  Ids are
    deterministic: rank by (corpus piece frequency DESC, piece) with
    exact integer counts — identical across engines and re-runs.
    """
    toks = _tokens(docs, text_col, id_col)  # one row per occurrence
    terms = toks.select("term").distinct()
    seg = bpe_segment(
        terms.withColumn("__d", F.lit(0)), merges, text_col="term", id_col="__d"
    ).select("term", "pieces")
    # occurrence-weighted piece frequencies -> ranked ids (piece dim only)
    occ = toks.join(seg, "term").select(F.explode("pieces").alias("piece"))
    vocab = (
        occ.groupBy("piece")
        .agg(F.count(F.lit(1)).alias("__freq"))
        .withColumn(
            "piece_id",
            F.row_number()
            .over(
                W.partitionBy().orderBy(
                    F.col("__freq").desc(), F.col("piece")
                )
            )
            .cast("long"),
        )
        .drop("__freq")
    )
    per_term = toks.select("doc_id", "term").distinct().join(seg, "term")
    out = per_term.select(
        "doc_id",
        "term",
        F.posexplode("pieces").alias("__p", "piece"),
    ).withColumn("piece_pos", (F.col("__p") + 1).cast("int")).drop("__p")
    return out.join(F.broadcast(vocab), "piece").select(
        "doc_id", "term", "piece_pos", "piece", "piece_id"
    )


def bpe_merges(
    docs: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The BPE merge TABLE: k rounds of (most-frequent adjacent symbol
    pair -> merge), the complete byte-pair-encoding training loop over
    the corpus (extends :func:`pair_stats`, which is round one's
    statistic only).

    Returns (step, lhs, rhs, merged, tf) — one row per merge, in order.
    Ties break deterministically by (tf DESC, lhs ASC, rhs ASC).

    Scale shape (the kmeans/qualityfilter bounded-driver pattern): BPE
    statistics depend only on the (word, count) table, so ONE corpus
    -sized aggregate runs up front and every merge round operates on the
    VOCABULARY-sized symbolized-word table — per round: one pair
    aggregate (vocab x word-length input), one LIMIT-1 argmax of which
    exactly ONE ROW reaches the driver, and a lazy localCheckpoint of
    the updated state so plan depth stays bounded across rounds (the
    connected-components discipline).  Driver state is the merge list
    alone.  Word-internal merging is embarrassingly parallel; no
    corpus-sized stage repeats after round zero.

    Words start as character sequences (no end-of-word sentinel —
    documented choice: the synthetic corpus is whitespace-tokenized, so
    word boundaries are already explicit in the word table)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    chars = F.filter(F.split(F.col("term"), ""), lambda c: c != F.lit(""))
    state = (
        _tokens(docs, text_col, id_col)
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .select("cnt", chars.alias("__syms"))
        .localCheckpoint(eager=False)
    )
    spark = docs.sparkSession
    merges: list[tuple] = []
    for step in range(1, k + 1):
        best = (
            _adjacent_pair_counts(state)
            .orderBy(F.col("tf").desc(), F.col("lhs"), F.col("rhs"))
            .limit(1)
            .collect()
        )
        if not best:  # every word fully merged — corpus exhausted
            break
        lhs, rhs, tf = best[0]["lhs"], best[0]["rhs"], best[0]["tf"]
        merges.append((step, lhs, rhs, lhs + rhs, tf))
        state = state.select(
            "cnt", _apply_merge(F.col("__syms"), lhs, rhs).alias("__syms")
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        merges, "step int, lhs string, rhs string, merged string, tf bigint"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to the corpus: (doc_id, term, pieces).
    One pass, per-row folds — the inference half of the BPE story."""
    out = _tokens(docs, text_col, id_col).select(
        "doc_id",
        "term",
        F.filter(F.split(F.col("term"), ""), lambda c: c != F.lit("")).alias(
            "pieces"
        ),
    )
    for m in merges:
        lhs, rhs = m[1], m[2]
        out = out.select(
            "doc_id",
            "term",
            _apply_merge(F.col("pieces"), lhs, rhs).alias("pieces"),
        )
    return out
