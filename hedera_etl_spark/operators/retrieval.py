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
to DECIMAL(12,6) BEFORE the per-document sum, so the aggregate is an
order-free exact decimal sum (the repo-wide rule for hashed aggregates
over doubles).

Plan shape (all built-ins, zero Python):
- one corpus scan -> explode to (doc_id, term) ONLY for query terms
  (the ``array_intersect`` against the literal term array runs per-row
  before the generate, so the explode fan-out is bounded by
  |query terms| per doc, not doc length);
- term frequencies: one hash aggregate on (doc_id, term);
- document frequencies: one hash aggregate on term over the tf table
  (already tiny: <= |terms| rows out);
- N and avgdl: one one-row aggregate, crossJoined (1-row broadcast);
- top-k: orderBy + limit -> TakeOrderedAndProject, never a global sort.

At 100 TB the only data-proportional stages are the scan and the
(doc_id, term) aggregate whose key space is bounded by |matching docs| x
|query terms|; everything downstream is dimension-sized.
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
        F.size("__t").cast("long").alias("dl"),
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

    Scale shape — ZERO corpus-sized shuffles: the tokenized base is
    localCheckpoint'ed (lazy) so tokenization is paid once; each doc's
    (term, tf) pairs are built IN ITS OWN ROW (array_distinct + count
    over the match array — no postings groupBy); document frequencies
    and corpus stats reduce to one map-side-combined aggregate each and
    come back as one-row broadcasts; the per-doc score is a sequential
    in-row fold over DECIMAL(12,6) term contributions (exact, order
    -free); top-k is TakeOrderedAndProject.  The only exchanges left
    carry |terms| rows and 1 row respectively.  Lineage note: the
    checkpoint means callers must not cache this plan across input
    changes (the registry entry sets cache_plan=False, same rule as the
    minhash entries).

    Every float op is one correctly-rounded IEEE double operation whose
    association the oracle mirrors literally; the constants are repr()
    literals CAST from strings on BOTH sides (see queries/corpusops).
    """
    base = _tokenized_base(docs, terms, id_col, text_col).localCheckpoint(
        eager=False
    )
    # per-term df + corpus stats, each one tiny aggregate -> 1-row map
    dfmap = (
        _postings_of(base)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("term", "df"))
            ).alias("__dfmap")
        )
    )
    stats = base.select(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
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
        " AS DECIMAL(12,6))"
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
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfmap))
        .selectExpr(
            "doc_id",
            "CAST(size(__tfs) AS BIGINT) AS n_terms_hit",
            "CAST(CAST(aggregate(__tfs, CAST(0 AS DECIMAL(12,6)),"
            f" (acc, x) -> CAST(acc + {contrib} AS DECIMAL(12,6)))"
            " AS DECIMAL(18,6)) AS DOUBLE) AS score",
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
    tfidf = tf/dl * (N - df + 0.5)/(df + 0.5), rounded DECIMAL(12,6)
    for engine-portable hashing, same rational-idf rationale as bm25."""
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
            .cast("decimal(12,6)")
            .cast("double")
            .alias("tfidf"),
        )
    )
