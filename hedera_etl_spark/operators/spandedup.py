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
2. one COUNT-OVER-WINDOW partitioned by the span hash flags every
   (doc, position) whose span content reaches ``min_count`` corpus
   occurrences — a single exchange on the hash, no join, no broadcast
   (r13: the former aggregate+join-back form broadcast-OOM'd once the
   flagged dimension outgrew the driver; the window form is also
   faster).  Hashing is xxhash64 over the span's per-token-hash
   slice — a 64-bit collision risk of ~n_spans²/2⁶⁴, and a collision
   only over-cuts one span;
3. per document: collect the flagged start positions (bounded by the
   doc's own span count), merge them into coverage, and rebuild the
   text keeping tokens outside every flagged [start, start+n) interval.
   The rebuild is a pure per-row filter over the projected token array —
   coverage testing is "any flagged start within n-1 positions before
   me", evaluated against the per-row sorted starts array.

Cut semantics: ALL occurrences of a repeated span are removed (the
published ExactSubstr choice: keeping one canonical occurrence requires
a global owner election per span; ``keep_first=True`` does that election
with a deterministic min-(doc_id, pos) rule as a second window function
on the same exchange).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _span_rows(
    docs: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, pos, span_hash) for every n-token span (pos is 1-based
    token position of the span start).

    Hashing: one per-token xxhash64 pass projects the document into an
    ``array<long>``, then each span hashes the n-long SLICE of that
    array — two interpreted higher-order calls per span (slice +
    xxhash64), each a native JVM loop.  The r7 A/B at sf0.1/n=50
    (docs/PERF_NOTES.md) ranked the alternatives: per-span 50-token
    concat_ws + xxhash64 (the r6 form) 1.38 s, an unrolled dual-31-bit
    polynomial 2.84 s (HOF lambdas evaluate INTERPRETED, so ~300
    interpreted expression evals per span lose to 2 calls that dispatch
    native), slice over the string tokens 1.02 s, slice over the
    token-hash longs 0.88 s — shipped.  Collision odds are unchanged
    (64-bit hash over the token-hash sequence, ~n_spans pairs / 2^64;
    a collision only over-cuts one span).  The hash array is a PROJECTED
    column so the span lambda references it without re-tokenizing (the
    textanalysis inlining hazard)."""
    toked = docs.select(
        F.col(id_col).alias("doc_id"), F.split(text_col, " ").alias("__toks")
    ).select(
        "doc_id",
        F.size("__toks").alias("__nt"),
        F.transform("__toks", lambda t: F.xxhash64(t)).alias("__h"),
    )
    spans = F.when(
        F.col("__nt") < n, F.array().cast("array<struct<pos:int,h:bigint>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.col("__nt") - F.lit(n - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(F.slice("__h", i, n)).alias("h"),
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
    at least ``min_count`` times across the corpus.

    Flagging is a COUNT OVER a window partitioned by the span hash —
    ONE exchange on h, no join, no broadcast, no materialized
    intermediate.  r13 replaced the r7 aggregate + join-back +
    localCheckpoint form after a 10x scale rung OOM'd it: the
    flagged-hash side of that join is an UNBOUNDED dimension (it grows
    with the corpus), so AQE's size estimate eventually promotes the
    join-back to a driver-built broadcast — which cannot degrade
    gracefully, it throws when the build exceeds driver memory.  The
    window form cannot broadcast by construction, AND measured faster
    at sf0.1/w=20 (0.82 s vs 1.07 s, docs/PERF_NOTES.md r13): the
    checkpoint materialization and the join both disappear, and the
    span-rows subtree now has exactly ONE consumer so no checkpoint is
    needed at all."""
    from pyspark.sql import Window

    rows = _span_rows(docs, n, text_col, id_col)
    w = Window.partitionBy("h")
    return (
        rows.withColumn("__cnt", F.count(F.lit(1)).over(w))
        .filter(F.col("__cnt") >= min_count)
        .select("doc_id", "pos")
    )


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
    uncut — the owner election is a second window function over the
    SAME (h)-partitioned window spec, so it rides the one existing
    exchange instead of adding an aggregate + join.

    Same window-form rationale as :func:`repeated_spans` (r13): the
    old aggregate + join-back broadcast-OOMs once the flagged
    dimension outgrows the driver, and the window form is faster at
    bench SF anyway."""
    from pyspark.sql import Window

    rows = _span_rows(docs, n, text_col, id_col)
    w = Window.partitionBy("h")
    flagged = rows.withColumn("__cnt", F.count(F.lit(1)).over(w))
    if keep_first:
        flagged = flagged.withColumn(
            "__o", F.min(F.struct("doc_id", "pos")).over(w)
        )
    flagged = flagged.filter(F.col("__cnt") >= min_count)
    if keep_first:
        flagged = flagged.filter(
            ~(
                (F.col("doc_id") == F.col("__o.doc_id"))
                & (F.col("pos") == F.col("__o.pos"))
            )
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


# ---------------------------------------------------------------------------
# ExactSubstr: arbitrary-length repeated-substring dedup (Lee et al. 2022)
# ---------------------------------------------------------------------------
def repeated_intervals(
    docs: DataFrame,
    min_len: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Maximal repeated-coverage intervals per document: (doc_id, start,
    end_pos, n_tokens), 1-based inclusive token positions, for every
    maximal run of positions covered by SOME repeated substring of
    >= ``min_len`` tokens — the exact removal set of ExactSubstr
    (Lee et al. 2022, "Deduplicating Training Data Makes Language
    Models Better") at ANY repeat length and alignment.

    Why fixed-width windows suffice (the equivalence that makes this
    EXACT rather than an approximation, pinned against a brute-force
    any-length reference in tests/test_spandedup.py):

      position p is covered by a repeated substring of length >= w
      iff p is covered by a flagged stride-1 w-window.

    (=>) a repeat R = [a, b) with b-a >= w containing p contains a full
    w-window [s, s+w) ⊆ R with s in [max(a, p-w+1), min(p, b-w)] — that
    window is a substring of R, so it occurs wherever R occurs and is
    flagged.  (<=) a flagged w-window containing p IS a repeated
    substring of length w >= w containing p.  So the union of flagged
    w-windows equals the union of >= w-token repeats, and a suffix
    array's generality buys nothing for the coverage/cut semantics —
    only for reporting each repeat's full extent as one unit, which the
    interval MERGE below recovers (overlapping/adjacent windows chain
    into the maximal covered run).

    Plan shape (the 100 TB story): span fan-out + the count-over-window
    flag are :func:`repeated_spans` (one span pass, ONE exchange on the
    span hash — no join, no broadcast); the merge adds a lag window +
    running-sum island ids + a (doc, island) aggregate — ONE further
    doc-keyed exchange whose window partitions by doc_id, never a
    corpus-wide sort.  The oracle mirrors the merge with the identical
    lag/sum/groupBy chain over string-equality span groups.
    """
    from pyspark.sql import Window

    w = int(min_len)
    starts = repeated_spans(
        docs, n=w, min_count=min_count, text_col=text_col, id_col=id_col
    )
    order = Window.partitionBy("doc_id").orderBy("pos")
    # two flagged windows at starts a < b chain iff b <= a + w: their
    # coverage [a, a+w) and [b, b+w) overlaps or abuts into one run
    brk = F.when(
        F.col("pos") - F.lag("pos").over(order) <= w, F.lit(0)
    ).otherwise(F.lit(1))
    grouped = (
        starts.withColumn("__brk", brk)
        .withColumn(
            "__g",
            F.sum("__brk").over(
                order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return (
        grouped.groupBy("doc_id", "__g")
        .agg(
            F.min("pos").alias("start"),
            (F.max("pos") + w - 1).cast("int").alias("end_pos"),
            (F.max("pos") + w - F.min("pos")).cast("int").alias("n_tokens"),
        )
        .select("doc_id", "start", "end_pos", "n_tokens")
    )


def exact_substr_dedup(
    docs: DataFrame,
    min_len: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Rebuild each document with every repeated substring of
    >= ``min_len`` tokens cut out — distributed ExactSubstr.  Returns
    the input schema with ``text_col`` rewritten; untouched documents
    pass through byte-identical.

    Cut semantics follow the published choice: ALL occurrences go (no
    owner election — see :func:`remove_repeated_spans` ``keep_first``
    for the window-level variant).  By the coverage equivalence in
    :func:`repeated_intervals` this equals ``remove_repeated_spans``
    at ``n=min_len`` (equality pinned in tests); the interval form
    tests each token against the doc's MERGED islands rather than
    every flagged window start — fewer in-row comparisons on
    boilerplate-heavy documents, same output."""
    ivals = repeated_intervals(
        docs, min_len=min_len, min_count=min_count,
        text_col=text_col, id_col=id_col,
    )
    per_doc = ivals.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("start", "end_pos"))
        ).alias("__iv")
    )
    toks = F.split(F.col(text_col), " ")
    covered = lambda p: F.exists(
        F.col("__iv"),
        lambda iv: (iv["start"] <= p) & (p <= iv["end_pos"]),
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
        per_doc.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn("__toks", toks)
    return joined.select(
        *[
            F.when(F.col("__iv").isNull(), F.col(text_col))
            .otherwise(rebuilt)
            .alias(c)
            if c == text_col
            else F.col(c)
            for c in docs.columns
        ]
    )
