"""Exact repeated-span removal: cut token spans that occur verbatim in
more than one document (or more than once overall).

Lee et al., "Deduplicating Training Data Makes Language Models Better"
(ExactSubstr): document-level dedup misses boilerplate REUSED INSIDE
otherwise-distinct documents (license headers, navigation, quoted
chain-mail), so production pipelines also cut repeated substrings above
a length floor.  The reference implementation builds a corpus-wide
suffix array — inherently single-machine.  The Spark-shaped equivalent
trades the exact minimal-cut of a suffix array for a fixed span width
``n`` (the published setting is 50 tokens):

1. explode each document's n-token spans WITH their token positions —
   one map-side fan-out off a single tokenization (the projected-column
   discipline of textdedup/textanalysis);
2. one hash aggregate counts each span hash's corpus frequency; spans at
   or above ``min_count`` become the repeated-span dimension.  Frequency
   counting uses xxhash64(span) — a 64-bit collision risk of ~n_spans²/2⁶⁴
   (≪1 even at 10¹² spans), and a collision only over-cuts one span;
3. join flagged hashes back to (doc, position) — broadcastable when the
   repeated dimension is small, shuffled equi-join otherwise, linear
   either way;
4. per document: collect the flagged start positions (bounded by the
   doc's own span count), merge them into coverage, and rebuild the
   text keeping tokens outside every flagged [start, start+n) interval.
   The rebuild is a pure per-row filter over the projected token array —
   coverage testing is "any flagged start within n-1 positions before
   me", evaluated against the per-row sorted starts array.

Cut semantics: ALL occurrences of a repeated span are removed (the
published ExactSubstr choice: keeping one canonical occurrence requires
a global owner election per span; ``keep_first=True`` does that election
with a deterministic min-(doc_id, pos) rule at the cost of one extra
aggregate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_rows(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, span_hash) for every n-token span (pos is 1-based
    token position of the span start)."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("__toks")
    )
    tc = F.col("__toks")
    spans = F.when(
        F.size(tc) < n, F.array().cast("array<struct<pos:int,h:bigint>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(n - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(
                    F.concat_ws(" ", *[F.element_at(tc, i + j) for j in range(n)])
                ).alias("h"),
            ),
        )
    )
    return (
        toked.withColumn("__sp", spans)
        .select("doc_id", F.explode_outer("__sp").alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def repeated_spans(
    docs: DataFrame,
    n: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, pos) of every n-token span whose verbatim content occurs
    at least ``min_count`` times across the corpus."""
    rows = _span_rows(docs, n, text_col, id_col)
    flagged = (
        rows.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
        .select("h")
    )
    return rows.join(flagged, "h").select("doc_id", "pos")


def remove_repeated_spans(
    docs: DataFrame,
    n: int = 50,
    min_count: int = 2,
    keep_first: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document with every repeated n-token span cut out.

    Returns the input schema with ``text_col`` rewritten (documents with
    no repeated span pass through byte-identical).  ``keep_first`` keeps
    the single deterministic min-(doc_id, pos) occurrence of each span
    uncut (one extra aggregate electing the owner)."""
    rows = _span_rows(docs, n, text_col, id_col)
    counted = rows.groupBy("h").agg(F.count("*").alias("cnt"))
    flagged = rows.join(
        counted.filter(F.col("cnt") >= min_count).select("h"), "h"
    )
    if keep_first:
        owner = flagged.groupBy("h").agg(
            F.min(F.struct("doc_id", "pos")).alias("o")
        )
        flagged = flagged.join(owner, "h").filter(
            ~((F.col("doc_id") == F.col("o.doc_id")) & (F.col("pos") == F.col("o.pos")))
        )
    cuts = flagged.groupBy("doc_id").agg(
        F.array_sort(F.collect_list("pos")).alias("__cuts")
    )

    toks = F.split(F.col(text_col), " ")
    # token at position p survives iff no flagged start s satisfies
    # s <= p < s + n — an exists() over the doc's own flagged starts
    # (O(tokens x cuts) per row, both bounded by the document itself)
    covered = lambda p: F.exists(
        F.col("__cuts"), lambda s: (s <= p) & (p < s + F.lit(n))
    )
    rebuilt = F.array_join(
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks")),
                lambda p: F.when(~covered(p), F.element_at("__toks", p)),
            ),
            lambda x: x.isNotNull(),
        ),
        " ",
    )
    joined = docs.join(
        cuts.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn("__toks", toks)
    return joined.select(
        *[
            F.when(F.col("__cuts").isNull(), F.col(text_col))
            .otherwise(rebuilt)
            .alias(c)
            if c == text_col
            else F.col(c)
            for c in docs.columns
        ]
    )
