"""Keyword retrieval over the corpus: TF-IDF / BM25 top-k scoring.

The data-selection and audit tool a training-data pipeline reaches for
constantly: "which documents match these terms" (eval-set leakage
triage, targeted domain harvesting, quality spot checks).  The reference
system has no retrieval surface (its analytics delegate to BigQuery
SQL); this extends the engine's LLM-pipeline operators (SURVEY §2
extras).

Scoring is BM25 with one engine-portability twist: ``idf`` is the
RATIONAL form ``(N - df + 0.5) / (df + 0.5)`` rather than its log.  The
log is a monotone transform PER TERM, so dropping it changes multi-term
score mixing slightly (high-idf terms weigh relatively more), but it
buys bit-exact cross-engine reproducibility: every operation in the
score is then a single correctly-rounded IEEE-754 double op on exact
integer inputs (+ the fixed k1/b constants), and IEEE division /
multiplication are deterministic across engines while ``ln`` is
library-dependent in the last ulp.  Each term's contribution is rounded
to DECIMAL(38,6) BEFORE the per-document sum, so the aggregate is an
order-free exact decimal sum (the repo-wide rule for hashed aggregates
over doubles; 38 digits because the rational idf is ~N/df and must not
overflow for rare terms on huge corpora).

Plan shape (all built-ins, zero Python) — bm25_topk:
- pass 1: one corpus scan -> ONE one-row aggregate carrying n_docs,
  sum_dl and every query term's df (terms are literals, so df is a
  plain SUM(array_contains(...)) — no postings shuffle at all);
- pass 2: one corpus scan -> per-row (term, tf) pairs from the match
  array, the broadcast stats row, an exact DECIMAL fold, and
  TakeOrderedAndProject top-k — never a global sort.

At 100 TB the only data-proportional stages are the two scans; every
exchange carries exactly one row (the stats aggregate) or k rows (the
top-k).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: BM25 constants — the Robertson defaults.
K1 = 1.2
B = 0.75
#: Compound constants PRE-FOLDED in Python so both engines receive one
#: literal double each instead of folding (K1 + 1) etc. themselves —
#: constant folding order is engine-dependent, a folded literal is not.
#: The oracle interpolates repr() of these (shortest round-trip string)
#: behind a CAST(... AS DOUBLE), giving bit-identical constants.
C1 = K1 + 1.0          # tf numerator factor
C2 = K1 * (1.0 - B)    # length-norm intercept
C3 = K1 * B            # length-norm slope


def _tokenized_base(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, dl, __q) — ONE tokenize pass over the corpus: the doc's
    whitespace token count (its BM25 length) plus its query-term matches,
    text projected away.  Every downstream statistic (postings, corpus
    stats, document frequencies) derives from this compact projection, so
    the expensive tokenization is paid once however many consumers fork
    off it (the naive three-consumer form re-tokenized the corpus three
    times — Catalyst does not share subtrees across join inputs)."""
    lits = F.array(*[F.lit(t) for t in terms])
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("__t"),
    ).select(
        "doc_id",
        # NULL text must yield NULL dl (legacy size(NULL) is -1, which
        # would pollute sum_dl); Spark's SUM then skips the row exactly
        # like the oracle's SUM over len(string_split(NULL, ' ')).
        F.when(F.col("__t").isNotNull(), F.size("__t"))
        .cast("long")
        .alias("dl"),
        F.filter("__t", lambda x: F.array_contains(lits, x)).alias("__q"),
    )


def _postings_of(base: DataFrame) -> DataFrame:
    """(doc_id, dl, term, tf) from a tokenized base — explode bounded by
    the per-row match count, one hash aggregate."""
    return (
        base.select("doc_id", "dl", F.explode_outer("__q").alias("term"))
        .filter(F.col("term").isNotNull())
        .groupBy("doc_id", "dl", "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def term_postings(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, dl) for every query term occurring in a doc."""
    return _postings_of(_tokenized_base(docs, terms, id_col, text_col))


def bm25_topk(
    docs: DataFrame,
    terms: Sequence[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents by (rational-idf) BM25 over ``terms``.

    Returns (doc_id, n_terms_hit, score) — score is the DECIMAL-summed
    BM25, ties broken by doc_id ascending for a total order.

    Scale shape — exactly TWO corpus scans and ZERO corpus-sized
    shuffles:

    1. a single one-row aggregate produces n_docs, sum_dl AND every
       query term's document frequency at once (the terms are literals,
       so ``df(t) = SUM(array_contains(__q, t))`` is an ordinary
       map-side-combined sum — no postings table, no per-term groupBy,
       no countDistinct);
    2. the scoring pass rebuilds each doc's (term, tf) pairs IN ITS OWN
       ROW (array_distinct + count over the match array), crossJoins the
       one broadcast stats row, folds DECIMAL(38,6) term contributions
       (exact, order-free), and ends in TakeOrderedAndProject.

    The previous form localCheckpoint'ed the tokenized base to share it
    across three consumers; the A/B (docs/PERF_NOTES.md r7) showed the
    checkpoint's corpus-sized executor-disk write cost ~1.2 s/run at
    sf0.1 and dwarfed the tokenization it saved — and at 100 TB it would
    write a corpus-sized projection per query.  Re-tokenizing once more
    (scan + split are codegen'd, pushed-down column reads) is strictly
    cheaper at every scale, and the plan is pure again so the registry
    entry can use the prepared-plan cache.

    Intermediates are DECIMAL(38,6): the rational idf is ~N/df, so a
    DECIMAL(12,6) cap (~1e6) would overflow for rare terms beyond ~7e5
    docs and Spark's non-ANSI CAST would NULL the whole score silently;
    38,6 holds idf*tf products past 1e31 — unreachable for any corpus.

    Every float op is one correctly-rounded IEEE double operation whose
    association the oracle mirrors literally; the constants are repr()
    literals CAST from strings on BOTH sides (see queries/corpusops).
    """
    base = _tokenized_base(docs, terms, id_col, text_col)
    stats = F.broadcast(
        base.agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").alias("sum_dl"),
            *[
                F.sum(F.array_contains("__q", F.lit(t)).cast("long")).alias(
                    f"__df_{i}"
                )
                for i, t in enumerate(terms)
            ],
        ).select(
            "n_docs",
            "sum_dl",
            F.map_from_arrays(
                F.array(*[F.lit(t) for t in terms]),
                F.array(
                    *[
                        F.coalesce(F.col(f"__df_{i}"), F.lit(0))
                        for i in range(len(terms))
                    ]
                ),
            ).alias("__dfmap"),
        )
    )
    contrib = (
        "CAST((((CAST(n_docs - element_at(__dfmap, x.term) AS DOUBLE) + 0.5D)"
        "       / (CAST(element_at(__dfmap, x.term) AS DOUBLE) + 0.5D))"
        f"      * (CAST(x.tf AS DOUBLE) * CAST('{C1!r}' AS DOUBLE)))"
        "     / (CAST(x.tf AS DOUBLE)"
        f"        + (CAST('{C2!r}' AS DOUBLE)"
        f"           + CAST('{C3!r}' AS DOUBLE)"
        "             * (CAST(dl AS DOUBLE)"
        "                / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
        " AS DECIMAL(38,6))"
    )
    return (
        base.filter(F.size("__q") > 0)
        .selectExpr(
            "doc_id",
            "dl",
            "transform(array_distinct(__q), t -> named_struct("
            "'term', t, 'tf', CAST(size(filter(__q, x -> x = t)) AS BIGINT)"
            ")) AS __tfs",
        )
        .crossJoin(stats)
        .selectExpr(
            "doc_id",
            "CAST(size(__tfs) AS BIGINT) AS n_terms_hit",
            "CAST(aggregate(__tfs, CAST(0 AS DECIMAL(38,6)),"
            f" (acc, x) -> CAST(acc + {contrib} AS DECIMAL(38,6)))"
            " AS DOUBLE) AS score",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(k)
    )


def tfidf_vectors(
    docs: DataFrame,
    terms: Sequence[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, term, tf, df, tfidf) rows over the query vocabulary —
    the materialized-index form (write it out, probe it repeatedly).
    tfidf = tf/dl * (N - df + 0.5)/(df + 0.5), rounded DECIMAL(38,6)
    for engine-portable hashing, same rational-idf rationale as bm25
    (and the same overflow-proof precision: idf ~ N/df exceeds a
    DECIMAL(12,6) cap for rare terms past ~7e5 docs)."""
    post = term_postings(docs, terms, id_col, text_col)
    n_docs = docs.select(F.count("*").cast("long").alias("n_docs"))
    dfreq = post.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    return (
        post.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (
                (F.col("tf") / F.col("dl"))
                * ((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            )
            .cast("decimal(38,6)")
            .cast("double")
            .alias("tfidf"),
        )
    )
