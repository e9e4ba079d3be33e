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

from hedera_etl_spark import fsutil


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
    textanalysis inlining hazard).

    r16 (guide §2.5 input skew): the fan-out below — per-token xxhash64
    plus a 20-token slice hash per span — is the module's dominant CPU
    and chains directly onto the caller's scan; a small/single-split
    parquet table runs the whole thing on ONE core (measured: the sf0.1
    documents table is one split, and the benched entry's 8-core run
    matched its 32-core run).  ``ensure_parallelism`` spreads it; on
    production tables with thousands of splits it is a no-op, and on
    checkpoint-rooted epoch frames it passes through untouched
    (tables._probe_is_safe)."""
    from hedera_etl_spark.tables import ensure_parallelism

    toked = ensure_parallelism(docs).select(
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
    skew_safe: bool = False,
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
    needed at all.

    Skew exposure (r13 advice, disclosed): the window partitions by
    the span hash, so EVERY occurrence of one ultra-hot hash (a
    ubiquitous cookie banner, a license header) buffers in a single
    task's window partition — a straggler/spill task on
    boilerplate-heavy corpora, with no map-side partial combine.
    ``skew_safe=True`` is the escape hatch: per-hash counts via
    groupBy (partial aggregation combines the hot hash map-side, each
    map task emits ONE row per distinct hash) joined back with an
    explicit SHUFFLE_HASH hint — the hint forbids the driver-built
    broadcast that OOM'd the r7 join-back form (the build side stays
    partition-wise and bounded by distinct flagged hashes, and the
    occurrence side STREAMS through the probe instead of buffering).
    Cost: the span-rows subtree gains a second consumer, i.e. one
    extra corpus scan (deterministic recompute — cheaper than
    checkpointing corpus-sized span rows).  Default stays the window
    form: faster when no hash is pathologically hot (one exchange, no
    join, docs/PERF_NOTES.md r13); equality of the two forms is
    pytest-pinned."""
    from pyspark.sql import Window

    rows = _span_rows(docs, n, text_col, id_col)
    if skew_safe:
        flagged_h = (
            rows.groupBy("h")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .filter(F.col("__cnt") >= min_count)
            .select("h")
        )
        return rows.join(
            flagged_h.hint("shuffle_hash"), "h", "left_semi"
        ).select("doc_id", "pos")
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
    skew_safe: bool = False,
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
    bench SF anyway.  Same hot-hash skew exposure too —
    ``skew_safe=True`` switches to the groupBy + SHUFFLE_HASH-hinted
    join-back (map-side partial combine for the count AND the
    min-struct owner election, both algebraic; occurrences stream
    through the probe instead of buffering in one window partition) at
    the cost of a second span-rows scan; see repeated_spans."""
    from pyspark.sql import Window

    rows = _span_rows(docs, n, text_col, id_col)
    if skew_safe:
        # owner election only when keep_first needs it (r14 review:
        # the default cut-all path shouldn't pay a second corpus-scale
        # aggregate and carry __o through the join for nothing)
        aggs = [F.count(F.lit(1)).alias("__cnt")]
        if keep_first:
            aggs.append(F.min(F.struct("doc_id", "pos")).alias("__o"))
        agg = (
            rows.groupBy("h")
            .agg(*aggs)
            .filter(F.col("__cnt") >= min_count)
            .select("h", *(["__o"] if keep_first else []))
        )
        flagged = rows.join(agg.hint("shuffle_hash"), "h", "inner")
        if keep_first:
            flagged = flagged.filter(
                ~(
                    (F.col("doc_id") == F.col("__o.doc_id"))
                    & (F.col("pos") == F.col("__o.pos"))
                )
            )
    else:
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
    skew_safe: bool = False,
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
    w = int(min_len)
    starts = repeated_spans(
        docs, n=w, min_count=min_count, text_col=text_col, id_col=id_col,
        skew_safe=skew_safe,
    )
    return _starts_to_intervals(starts, w)


def _starts_to_intervals(starts: DataFrame, w: int) -> DataFrame:
    """Merge flagged (doc_id, pos) window starts into maximal covered
    runs: (doc_id, start, end_pos, n_tokens).  Lag + running-sum island
    ids + one (doc, island) aggregate — one doc-keyed exchange."""
    from pyspark.sql import Window

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
    skew_safe: bool = False,
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
        text_col=text_col, id_col=id_col, skew_safe=skew_safe,
    )
    return _cut_by_intervals(docs, ivals, text_col, id_col)


def _cut_by_intervals(
    docs: DataFrame, ivals: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Rebuild ``text_col`` with every token inside an interval cut;
    documents with no interval pass through byte-identical."""
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


# ---------------------------------------------------------------------------
# incremental ExactSubstr: cross-epoch repeated-substring cutting
# ---------------------------------------------------------------------------
def _span_hash_schema():
    from pyspark.sql import types as T

    # ``n`` (r15, VERDICT r14 #6) = SHIPPED occurrences of the hash in
    # that committed batch, so the history probe can honor min_count>2.
    # Nullable: stores written before r15 carry presence-only rows, and
    # hashes() coalesces a missing n to 1 (each old row was committed
    # DISTINCT, i.e. "at least one shipped occurrence" — the exact
    # information the old min_count=2 path consumed, so old stores stay
    # correct at min_count=2 and conservatively UNDER-count — never
    # over-cut — at higher thresholds).
    # ``b`` = committing batch id.  The count path sums per-hash counts
    # across batches, and a crash-interrupted compaction can transiently
    # leave a batch's rows in BOTH source and target dirs — the presence
    # path absorbs that through its semi-join, the count path dedups by
    # (hash, batch) before summing.  Constant per batch dir, so parquet
    # dictionary-encodes it to nothing.
    return T.StructType(
        [
            T.StructField("span_hash", T.LongType(), False),
            T.StructField("n", T.LongType(), True),
            T.StructField("b", T.StringType(), True),
        ]
    )


class SpanHashStore:
    """Append-only parquet store of ACCEPTED span hashes (one xxhash64
    per surviving w-token window) — the persisted history that lets the
    continuous-ingest pipeline cut repeated substrings ACROSS epochs,
    completing the dedup-granularity matrix (content / URL / paragraph
    / semantic stores already exist; ParagraphHashStore defines the
    protocol this mirrors: fsutil batch-dir commits, single rename,
    single-writer per path, replay-heal across compaction).

    Storage honesty (the reason published ExactSubstr is a BATCH job):
    the history carries ~one 8-byte hash per accepted TOKEN, i.e. the
    store is corpus-order sized (at parquet encoding, roughly 2-6% of
    the text bytes it covers).  That is the true cost of exact
    cross-epoch substring dedup at any engine — the suffix array pays
    the same order at build time; here it is spread across epochs,
    compactable (``compact``), and probed with ZERO history shuffles
    (the inverted-probe discipline)."""

    def __init__(self, spark, path: str):
        import os

        self.spark = spark
        self.path = path
        self.hashes_dir = os.path.join(path, "hashes")
        os.makedirs(self.hashes_dir, exist_ok=True)
        fsutil.sweep_staging(self.hashes_dir)

    def committed_batches(self) -> set:
        return fsutil.batch_dirs(self.hashes_dir)

    def has_batch(self, batch_id: str) -> bool:
        return f"batch={batch_id}" in self.committed_batches() or (
            f"batch={batch_id}" in fsutil.folded_batches(self.hashes_dir)
        )

    def hashes(self, exclude_batch: str | None = None) -> DataFrame:
        """Committed hashes, optionally excluding one batch (a RETRY of
        a committed batch must judge against the store as it stood
        before that batch).  Exclusion survives compaction via the
        ``origin_batch`` attribution — same replay-heal semantics as
        ParagraphHashStore.hashes."""
        import os

        entry = f"batch={exclude_batch}" if exclude_batch is not None else None
        batches = sorted(self.committed_batches())
        if entry is not None:
            batches = [b for b in batches if b != entry]
        if not batches:
            return self.spark.createDataFrame([], _span_hash_schema())
        if entry is not None and entry in fsutil.folded_batches(self.hashes_dir):
            ext = fsutil.with_origin_schema(_span_hash_schema())
            out = (
                self.spark.read.schema(ext)
                .parquet(*[os.path.join(self.hashes_dir, b) for b in batches])
                .filter(
                    F.col(fsutil.ORIGIN_COL).isNull()
                    | (F.col(fsutil.ORIGIN_COL) != entry)
                )
                .drop(fsutil.ORIGIN_COL)
            )
        else:
            out = self.spark.read.schema(_span_hash_schema()).parquet(
                *[os.path.join(self.hashes_dir, b) for b in batches]
            )
        # presence-only rows from pre-r15 stores read n as NULL -> 1
        return out.withColumn("n", F.coalesce(F.col("n"), F.lit(1)))

    def commit_batch(self, batch_id: str, hashes: DataFrame) -> None:
        """``hashes`` is either (span_hash, n) — one row per hash with
        its shipped-occurrence count, the r15 form — or a bare
        span_hash column from a pre-r15 caller, stored as n=1 per row
        (presence)."""
        entry = f"batch={batch_id}"
        if self.has_batch(batch_id):
            return
        if "n" not in hashes.columns:
            hashes = hashes.withColumn("n", F.lit(1).cast("long"))
        hashes = hashes.select(
            "span_hash",
            F.col("n").cast("long").alias("n"),
            F.lit(batch_id).alias("b"),
        )
        staged = fsutil.stage_batch_dir(self.hashes_dir, entry, hashes)
        fsutil.publish_batch_dir(self.hashes_dir, entry, staged)

    def compact(self) -> int:
        """Fold all batch dirs into one (file-count maintenance after
        thousands of epochs), replay-heal preserved via origin
        attribution — the shared fsutil primitive."""
        return fsutil.compact_batch_dirs(
            self.spark, self.hashes_dir, _span_hash_schema(), track_origin=True
        )


def incremental_exact_substr_plan(
    docs: DataFrame,
    store: SpanHashStore,
    batch_id: str,
    min_len: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """One epoch of continuous ExactSubstr WITHOUT the store commit:
    cut every >= ``min_len``-token substring present in any earlier
    committed epoch (ALL occurrences — history already ships the
    canonical copy), plus within-batch repeats with KEEP-FIRST
    semantics (the min-(doc_id, pos) occurrence survives).  Returns
    ``(rebuilt_docs, new_canon_hashes)`` where the second frame is
    (doc_id, span_hash) for every SURVIVING window — the rows a caller
    commits after its downstream acceptance decision (the deferred-
    commit contract of incremental_paragraph_dedup_plan: committing a
    span whose document is later rejected would permanently cut
    content that never shipped).

    Why keep-first WITHIN the batch (vs the batch operator's published
    all-occurrences choice): this stage runs BEFORE document-level
    dedup in the streaming pipeline, where all-occurrences is
    self-destructive — two identical documents arriving in one epoch
    would annihilate EACH OTHER (every shared run repeated, both cut
    to empty) before doc dedup could elect a keeper.  Keep-first makes
    the composition safe: content survives in exactly one place, the
    canonical copy, and doc dedup judges post-cut text — the same
    ordering contract as the paragraph stage.  The batch
    ``exact_substr_dedup`` keeps the published all-occurrences
    semantics (it runs AFTER doc dedup in ``prepare``).

    Survivor rule (the seam caveat, documented not hidden): a window
    commits only if it was not cut AND none of its positions fall in a
    cut interval —
    cutting concatenates the text around the seam, and windows
    straddling a seam describe token runs that no longer exist in the
    shipped text.  Seam-created NEW runs are not fingerprinted (the
    one approximation vs a from-scratch re-scan; a re-run of the batch
    form over the compacted corpus recovers them, the same way the
    two-tier batch dedup heals the streaming tier's misses).

    Late-duplicate asymmetry (same as every incremental store here): a
    span accepted in epoch 1 stays in epoch 1's shipped text; a copy
    arriving in epoch 3 is cut from epoch 3 only.

    ``min_count`` semantics (r15, VERDICT r14 #6 — batch parity
    restored): the store carries per-hash SHIPPED-occurrence counts
    (one bounded int per hash per batch; history total = sum across
    committed batches), so any threshold the batch form accepts works
    here.  A window cuts when history + batch occurrences reach
    ``min_count``; if history already ships a copy, ALL batch
    occurrences cut (the canonical copy lives in an earlier epoch),
    else the min-(doc_id, pos) batch occurrence survives as keeper —
    the same keep-first composition rule as min_count=2.  Below the
    threshold every occurrence ships and its count commits, so a hash
    crossing the threshold in a LATER epoch cuts from that epoch on
    while earlier shipped copies stay (the documented late-duplicate
    asymmetry; the published algorithm's fixed min_count=2 is the
    degenerate case where presence alone decides, and that path keeps
    its r14 plan shape bit-for-bit).  Pre-r15 presence-only store rows
    count as 1 — exact at min_count=2, conservatively under-counting
    (never over-cutting) above it.

    Scale shape: the within-batch flag is the count-over-window form
    (one exchange on the span hash, no join); the history probe is
    INVERTED (the batch's own distinct hash set broadcasts, history
    scans map-side to the tiny hit set — one history scan, ZERO
    history shuffles, plan-pinned); the merge + cut are the batch
    operators unchanged."""
    from pyspark.sql import Window

    from hedera_etl_spark.operators.joins import inverted_store_probe

    if int(min_count) < 2:
        raise ValueError("min_count must be >= 2 (1 would cut everything)")
    w = int(min_len)
    rows = _span_rows(docs, w, text_col, id_col)
    win = Window.partitionBy("h")
    counted = rows.withColumn(
        "__cnt", F.count(F.lit(1)).over(win)
    ).localCheckpoint(eager=False)
    history = store.hashes(exclude_batch=batch_id).withColumnRenamed(
        "span_hash", "h"
    )
    batch_hashes = counted.select("h").distinct()
    # prune before the probe: the presence path consumes only h (scan
    # reads one column, r14 plan shape byte-identical); the count path
    # also needs (n, b) for the per-batch sums
    probe_cols = ["h"] if int(min_count) == 2 else ["h", "n", "b"]
    hits = inverted_store_probe(
        history.select(*probe_cols), batch_hashes, "h"
    ).localCheckpoint(eager=True)
    # within-batch: the min-(doc_id, pos) occurrence of each repeated
    # hash is the canonical keeper — its election rides the SAME
    # h-partitioned window as the count, no extra exchange
    owner = F.min(F.struct("doc_id", "pos")).over(win)
    not_owner = ~(
        (F.col("doc_id") == F.col("__own.doc_id"))
        & (F.col("pos") == F.col("__own.pos"))
    )
    if int(min_count) == 2:
        # presence path, r14 plan shape unchanged: any history hit IS
        # the second occurrence; duplicate hit keys are semi-join-safe
        vs_store = counted.join(F.broadcast(hits), "h", "left_semi").select(
            "doc_id", "pos"
        )
        in_batch = (
            counted.withColumn("__own", owner)
            .filter((F.col("__cnt") >= min_count) & not_owner)
            .select("doc_id", "pos")
        )
        starts = vs_store.unionByName(in_batch).distinct()
    else:
        # count path (r15): total = history shipped occurrences + batch
        # occurrences.  The hit-set aggregate dedups compaction-debris
        # rows per (h, committing batch) first — compact can transiently
        # leave a batch's rows in both source and target dirs, and
        # summing the duplicate would inflate history counts (the same
        # duplicate-tolerance rule the presence path gets from its
        # semi-join).  Pre-r15 presence rows have b NULL: distinct old
        # batches sharing a hash then collapse to one row — an
        # UNDER-count, the documented conservative direction.
        hit_counts = (
            hits.dropDuplicates(["h", "b"])
            .groupBy("h")
            .agg(F.sum("n").alias("__hn"))
        )
        flagged = (
            counted.withColumn("__own", owner)
            .join(F.broadcast(hit_counts), "h", "left")
            .withColumn("__hn", F.coalesce(F.col("__hn"), F.lit(0)))
        )
        starts = (
            flagged.filter(
                (F.col("__hn") + F.col("__cnt") >= min_count)
                & ((F.col("__hn") >= 1) | not_owner)
            )
            .select("doc_id", "pos")
            .distinct()
        )
    ivals = _starts_to_intervals(starts, w).localCheckpoint(eager=False)
    out = _cut_by_intervals(docs, ivals, text_col, id_col)
    # surviving canon: every occurrence that was not cut (anti-join on
    # the start set covers history hits AND within-batch non-canonical
    # copies) and is clear of every cut interval (per-doc bounded
    # exists) — seam-straddling windows describe token runs that no
    # longer exist in the shipped text
    per_doc = ivals.groupBy("doc_id").agg(
        F.collect_list(F.struct("start", "end_pos")).alias("__iv")
    )
    candidates = (
        counted.join(starts, ["doc_id", "pos"], "left_anti")
        .join(per_doc, "doc_id", "left")
    )
    clear = F.col("__iv").isNull() | ~F.exists(
        F.col("__iv"),
        lambda iv: (iv["start"] <= F.col("pos") + F.lit(w - 1))
        & (F.col("pos") <= iv["end_pos"]),
    )
    new_canon = candidates.filter(clear).select(
        "doc_id", F.col("h").alias("span_hash")
    )
    return out, new_canon


def incremental_exact_substr(
    docs: DataFrame,
    store: SpanHashStore,
    batch_id: str,
    min_len: int = 50,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The committing form: plan, then commit every surviving span hash.
    Deterministic under retries without storing outputs — the store
    read excludes ``batch_id`` itself, so a replay judges against the
    same history it saw the first time (pinned in tests); the commit is
    one idempotent rename."""
    out, new_canon = incremental_exact_substr_plan(
        docs, store, batch_id, min_len, min_count, text_col, id_col
    )
    store.commit_batch(
        batch_id,
        # per-hash SHIPPED-occurrence counts (r15): the history side of
        # the min_count threshold for later epochs
        new_canon.groupBy("span_hash").agg(
            F.count(F.lit(1)).cast("long").alias("n")
        ),
    )
    return out
