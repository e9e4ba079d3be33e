"""Benchmark decontamination: drop training documents that overlap an
evaluation/benchmark set on word n-grams.

The standard training-data hygiene step (GPT-3 appendix C / Llama-style
13-gram decontamination): a training document is contaminated when it
shares at least one word n-gram with any document in the held-out
evaluation set.  Published pipelines sweep this with exact n-gram match
because near-dup thresholds under-fire on short benchmark items.

Spark-first shape (operators, not a port of any reference code):

- Both sides reuse ``textdedup.doc_shingles`` — per-row DISTINCT shingle
  sets exploded map-side, ZERO shuffle to produce either side.
- The eval side collapses to a distinct-shingle dimension.  Benchmarks
  are dimension-sized next to a training corpus (thousands of items vs
  billions of documents), so the contamination probe is a BROADCAST hash
  join against the corpus shingles: the 100 TB side is never shuffled.
  ``broadcast_eval=False`` degrades to a shuffled equi-join for the
  rare giant-eval-set case — still linear, never all-pairs.
- Hit counting and shingle counting happen in ONE aggregate over the
  left-joined shingles (count(*) + sum(hit flag)), so the corpus is
  scanned once and the only shuffle in the whole operator is the
  per-doc_id hash aggregate, which AQE sizes from real bytes.

Determinism: md5-free — pure set overlap on shingle strings, so the
DuckDB oracle reproduces every count exactly; the contamination ratio is
a single IEEE division of exact integers rounded through DECIMAL(9,6)
(house canonicalization rule, queries/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.operators.textdedup import doc_shingles


def contamination_profile(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-document contamination profile against an evaluation set.

    Returns (doc_id, n_grams, n_hits, contamination) where ``n_grams``
    is the document's distinct n-gram count, ``n_hits`` how many of
    those also occur anywhere in ``eval_docs``, and ``contamination`` =
    n_hits / n_grams.  Documents shorter than ``n`` tokens have no
    n-grams and produce no row (they cannot be contaminated under this
    definition; ``decontaminate`` keeps them).
    """
    eval_text_col = eval_text_col or text_col
    corpus_sh = doc_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    # eval ids are irrelevant — only the union of eval n-grams matters,
    # so collapse to a distinct-shingle dimension before the join
    eval_sh = _ref_shingle_dim(eval_docs, n, eval_text_col).withColumn(
        "__hit", F.lit(1)
    )
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    return (
        corpus_sh.join(eval_sh, "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).alias("n_hits"),
        )
        .withColumn(
            "contamination",
            (F.col("n_hits") / F.col("n_grams")).cast("decimal(9,6)").cast("double"),
        )
    )


def contaminated_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    **kwargs,
) -> DataFrame:
    """doc_ids whose eval-overlapping n-gram count reaches ``min_hits``."""
    return (
        contamination_profile(docs, eval_docs, n=n, **kwargs)
        .filter(F.col("n_hits") >= min_hits)
        .select("doc_id")
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """``docs`` minus contaminated documents (same schema as ``docs``).

    Anti-join against the contaminated-id set; documents with fewer than
    ``n`` tokens survive by construction (no n-grams → no profile row →
    nothing to anti-join on).
    """
    bad = contaminated_ids(
        docs, eval_docs, n=n, min_hits=min_hits, text_col=text_col, id_col=id_col, **kwargs
    ).withColumnRenamed("doc_id", id_col)
    return docs.join(bad, id_col, "left_anti")


def contamination_by_eval_item(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Per-EVAL-ITEM leak report: (eval_id, n_docs, n_gram_hits) — how
    many training documents share at least one n-gram with each eval
    item, and how many (doc, gram) hits in total.  The inverse direction
    of ``contamination_profile``: that one tells you which TRAINING docs
    to drop; this one tells a benchmark owner which EVAL items are
    compromised (an item leaked into thousands of pages is dead for
    evaluation regardless of how well the training side scrubs).

    Scale: the eval side keeps (shingle, eval_id) postings — still
    dimension-sized — and broadcasts; the corpus scans once, and the two
    aggregates (distinct docs, total hits per eval item) ride ONE
    eval-id-keyed exchange over genuinely-overlapping rows only.
    """
    eval_text_col = eval_text_col or text_col
    eval_sh = doc_shingles(
        eval_docs.select(
            F.col(eval_id_col).alias("doc_id"), F.col(eval_text_col).alias("__t")
        ),
        n=n,
        text_col="__t",
    ).select(F.col("doc_id").alias("eval_id"), "shingle")
    if broadcast_eval:
        eval_sh = F.broadcast(eval_sh)
    corpus_sh = doc_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    hits = corpus_sh.join(eval_sh, "shingle")
    return (
        hits.groupBy("eval_id")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_gram_hits"),
        )
    )


def contaminating_eval_ids(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """(doc_id, eval_id): the MIN eval item sharing an n-gram with each
    doc — the removal-provenance attribution (provenance.RemovalLedger).
    Deterministic (min over eval ids); one broadcast postings join over
    ``docs`` — callers pass the DROPPED slice, not the corpus, so the
    shingling cost is proportional to removed documents."""
    eval_text_col = eval_text_col or text_col
    eval_sh = doc_shingles(
        eval_docs.select(
            F.col(eval_id_col).alias("doc_id"), F.col(eval_text_col).alias("__t")
        ),
        n=n,
        text_col="__t",
    ).select(F.col("doc_id").alias("eval_id"), "shingle")
    corpus_sh = doc_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    return (
        corpus_sh.join(F.broadcast(eval_sh), "shingle")
        .groupBy("doc_id")
        .agg(F.min("eval_id").alias("eval_id"))
    )


def decontaminate_against_shingles(
    docs: DataFrame,
    eval_sh: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``decontaminate`` (min_hits=1) against a PREBUILT reference
    shingle dimension — the repeated-probe form: a long-lived caller
    (the streaming corpus pipeline) computes the eval side once
    (``_ref_shingle_dim`` + localCheckpoint) and probes every
    micro-batch against the pinned frame instead of re-shingling the
    eval set per epoch.  Semantics pinned equal to ``decontaminate``."""
    corpus_sh = doc_shingles(docs, n=n, text_col=text_col, id_col=id_col)
    bad = (
        corpus_sh.join(F.broadcast(eval_sh.select("shingle")), "shingle", "left_semi")
        .select(F.col("doc_id").alias(id_col))
        .distinct()
    )
    return docs.join(bad, id_col, "left_anti")


def fuzzy_contamination_pairs(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "doc_id",
    eval_text_col: str | None = None,
    broadcast_eval: bool = True,
) -> DataFrame:
    """NEAR-duplicate contamination: (doc_id, eval_id, jaccard) for
    every corpus document whose n-gram shingle set has exact Jaccard >=
    ``threshold`` with some eval document.

    Exact-match decontamination (``decontaminate``) catches verbatim
    leakage; the fuzzy form catches paraphrased/reformatted eval items
    (whitespace changes, reordered answer options, light rewording) the
    way the GPT-3/Llama-style sweeps pair the two.  Unlike the
    corpus-corpus near-dup detectors this needs NO LSH banding: the
    eval side is dimension-sized, so its full (shingle, eval_id, size)
    postings broadcast and candidate generation is a map-side hash join
    against one corpus scan.  The per-pair intersection count is exact
    (every shared shingle counts — no blocking filter to undermine the
    verify), and the only shuffle is the (doc, eval) pair aggregate,
    bounded by genuinely-overlapping pairs.  Skew note: a shingle
    occurring in many eval items fans out by its eval df; at the default
    n=5 shingles are specific enough that eval dfs stay ~1 — the same
    dimension-side judgment ``contamination_profile`` documents.

    Jaccard rounds through DECIMAL(9,6) (house rule) so the threshold
    comparison is engine-portable.
    """
    from hedera_etl_spark.operators.textdedup import shingle_sets

    eval_text_col = eval_text_col or text_col

    def _sized(src: DataFrame, tcol: str, icol: str, sz: str) -> DataFrame:
        # per-row set -> in-row size -> map-side explode: sizes ride
        # along with ZERO shuffle (a groupBy-count + join-back would put
        # a corpus-sized exchange in front of the probe)
        sets = shingle_sets(src, n=n, text_col=tcol, id_col=icol)
        return sets.select(
            "doc_id",
            F.size("sh_set").cast("long").alias(sz),
            F.explode("sh_set").alias("shingle"),
        )

    corpus_sized = _sized(docs, text_col, id_col, "sz_a")
    eval_sized = _sized(
        eval_docs.select(
            F.col(eval_id_col).alias("doc_id"), F.col(eval_text_col).alias("__t")
        ),
        "__t",
        "doc_id",
        "sz_b",
    ).withColumnRenamed("doc_id", "eval_id")
    if broadcast_eval:
        eval_sized = F.broadcast(eval_sized)
    inter = (
        corpus_sized.join(eval_sized, "shingle")
        .groupBy("doc_id", "eval_id", "sz_a", "sz_b")
        .agg(F.count("*").alias("inter"))
    )
    jac = (
        (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
        .cast("decimal(9,6)")
        .cast("double")
    )
    return inter.select(
        "doc_id", "eval_id", jac.alias("jaccard")
    ).filter(F.col("jaccard") >= threshold)


def fuzzy_decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """``docs`` minus documents near-duplicating any eval item (same
    schema as ``docs``); short documents survive by construction."""
    bad = (
        fuzzy_contamination_pairs(
            docs, eval_docs, n=n, threshold=threshold,
            text_col=text_col, id_col=id_col, **kwargs
        )
        .select("doc_id")
        .distinct()
        .withColumnRenamed("doc_id", id_col)
    )
    return docs.join(bad, id_col, "left_anti")


# ---------------------------------------------------------------------------
# Bloom-prefiltered decontamination: the giant-reference-set scale path.
#
# The broadcast probe above is right when the contaminant list is an
# EVAL SUITE (dimension-sized).  Decontaminating against another CORPUS
# (benchmark web originals, a held-out crawl, a licensing blocklist)
# breaks that: the reference n-gram set is itself huge, and both the
# broadcast form (driver/executor memory) and the plain shuffled join
# (the ENTIRE corpus shingle stream shuffles) stop being free.
#
# The Bloom form keeps the corpus map-side: the reference n-grams fold
# into a FIXED-SIZE bit table (m_bits bits as m_bits/64 (word_idx, bits)
# rows — a few thousand rows at any reference size), the corpus probes
# it with k broadcast hash joins (no explode, no new shuffle), and only
# the surviving candidate slice — true hits plus the ~(1-e^(-kn/m))^k
# false-positive fraction — goes through the exact shuffled verify.
# Bloom errors are one-sided, and the verify join removes every false
# positive, so the result is pinned EQUAL to the exact operator.
#
# Hash canon: k bit positions from one md5 per shingle via the same
# Kirsch-Mitzenmacher construction as textdedup (h1 + i*h2, two 60-bit
# halves of the digest) — engine-portable, so a DuckDB oracle can
# re-derive the identical bit table and probes.  ANSI bound: i*h2 with
# h2 < 2^60 stays inside a long for i <= 7, hence the k cap.
# ---------------------------------------------------------------------------

_BLOOM_MAX_K = 7


def auto_bloom_params(n_shingles: int, target_fp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) sized for ``n_shingles`` distinct reference n-grams at
    ``target_fp`` false-positive rate: the textbook optimum
    m = -n·ln(p)/ln²2 rounded up to a whole 64-bit word and
    k = (m/n)·ln 2 clamped to [1, _BLOOM_MAX_K] (the ANSI long bound on
    the Kirsch-Mitzenmacher probe).  FP rate trades only VERIFY-SLICE
    COST — the exact verify removes every false positive — so a 1%
    target keeps the shuffled slice within ~1% of the corpus shingle
    stream while the bit table stays ~1.2 GB per 10⁹ reference n-grams
    (broadcastable at any realistic blocklist size)."""
    import math

    if not 0 < target_fp < 1:
        raise ValueError(f"target_fp must be in (0, 1) (got {target_fp})")
    n = max(1, n_shingles)
    m = int(math.ceil(-n * math.log(target_fp) / (math.log(2) ** 2)))
    k = min(_BLOOM_MAX_K, max(1, round(m / n * math.log(2))))
    # when k is CLAMPED below its optimum the textbook m no longer hits
    # target_fp: re-derive m for the fixed k from fill^k = p, i.e.
    # m = -k·n / ln(1 - p^(1/k)) — at k=7 and p=0.001 this is ~5% more
    # bits than the unclamped formula, and without it the realized FP
    # drifts above target as references grow
    m = max(m, int(math.ceil(-k * n / math.log(1.0 - target_fp ** (1.0 / k)))))
    m = ((m + 63) // 64) * 64
    return m, k


def _estimated_fill(n_shingles: int, m_bits: int, k: int) -> float:
    """Expected fraction of set bits after inserting ``n_shingles``
    items: 1 - e^(-k·n/m); the per-probe FP rate is this to the k-th."""
    import math

    return 1.0 - math.exp(-k * n_shingles / m_bits)


def _bloom_pos(shingle_col, i: int, m_bits: int):
    """Bit position i of the shingle's k-probe family."""
    d = F.md5(shingle_col)
    h1 = F.conv(F.substring(d, 1, 15), 16, 10).cast("long")
    h2 = F.conv(F.substring(d, 17, 15), 16, 10).cast("long")
    return F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))


def _ref_shingle_dim(ref_docs: DataFrame, n: int, text_col: str) -> DataFrame:
    """Collapse a reference/eval set to its distinct-shingle dimension —
    ids are irrelevant, only the union of n-grams matters (shared by the
    broadcast probe and the Bloom build)."""
    return (
        doc_shingles(
            ref_docs.select(F.lit(0).alias("doc_id"), F.col(text_col).alias("__t")),
            n=n,
            text_col="__t",
        )
        .select("shingle")
        .distinct()
    )


def ngram_bloom(
    shingles: DataFrame, m_bits: int = 1 << 20, k: int = 4
) -> DataFrame:
    """Fold a ``shingle`` column into a Bloom bit table: ``(word_idx,
    bits)`` rows, ``m_bits / 64`` of them at most.  One k-wide map-side
    fan-out and one bit_or aggregate whose output is table-sized, not
    reference-sized."""
    if not 1 <= k <= _BLOOM_MAX_K:
        raise ValueError(f"k must be in [1, {_BLOOM_MAX_K}] (ANSI long bound)")
    pos = F.explode(
        F.array(*[_bloom_pos(F.col("shingle"), i, m_bits) for i in range(k)])
    ).alias("pos")
    return (
        shingles.select(pos)
        .select(
            F.expr("pos div 64").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("bits"))
    )


def bloom_contaminated_ids(
    docs: DataFrame,
    ref_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    m_bits: int | None = None,
    k: int | None = None,
    target_fp: float = 0.01,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str | None = None,
    n_ref: int | None = None,
) -> DataFrame:
    """(doc_id, n_hits) for documents sharing >= ``min_hits`` exact word
    n-grams with ``ref_docs`` — same decision as ``contaminated_ids``
    (pinned equal in tests), built for reference sets too large to
    broadcast: k broadcast joins against the fixed-size Bloom table
    prefilter the corpus map-side, then only the candidate slice meets
    the reference in one exact shuffled semi-join.

    ``m_bits``/``k`` default to AUTO (ADVICE r9): one
    ``approx_count_distinct`` pass over the reference shingle dimension
    sizes the filter for ``target_fp`` via :func:`auto_bloom_params` —
    the r9 fixed default (2^20 bits) silently saturated beyond a few
    hundred thousand reference n-grams, degenerating the prefilter into
    the full verify join with no signal.  Explicit values are honored
    but LOUD: when the estimated fill factor exceeds 50% a warning names
    the saturation and the auto-sized alternative (the max_bucket /
    cap_observations convention — a recall-or-cost trade must never be
    silent; here correctness is safe either way, only the scale benefit
    dies).

    The reference-cardinality job runs ONLY when needed (ADVICE r10):
    callers that already counted the reference pass ``n_ref`` (the
    pipeline's auto mode counts once and forwards it), and when BOTH
    ``m_bits`` and ``k`` are explicit with no ``n_ref`` the count is
    skipped entirely — the saturation warning then becomes best-effort
    (it needs the cardinality) rather than costing a full reference
    scan just to phrase a warning."""
    import warnings

    ref_text_col = ref_text_col or text_col
    # two consumers (bloom build + exact verify): pin the distinct
    ref_sh = _ref_shingle_dim(ref_docs, n, ref_text_col).localCheckpoint(eager=False)
    if n_ref is None and (m_bits is None or k is None):
        # sizing needs the cardinality; fully explicit callers skip the job
        n_ref = ref_sh.agg(
            F.approx_count_distinct("shingle").alias("n")
        ).first()["n"]
    if m_bits is None and k is None:
        m_bits, k = auto_bloom_params(n_ref, target_fp)
    elif k is None:
        # k optimal FOR THE GIVEN m (pairing the auto-m's k with an
        # explicit m would mismatch — r10 review finding)
        import math

        k = min(_BLOOM_MAX_K, max(1, round(m_bits / max(1, n_ref) * math.log(2))))
    elif m_bits is None:
        # m sized for the GIVEN k from fill^k = target_fp
        import math

        m_bits = int(
            math.ceil(
                -k * max(1, n_ref) / math.log(1.0 - target_fp ** (1.0 / k))
            )
        )
        m_bits = ((m_bits + 63) // 64) * 64
    fill = _estimated_fill(n_ref, m_bits, k) if n_ref is not None else 0.0
    if fill**k > 0.1:  # >=10% of corpus shingles would spuriously verify
        auto_m, auto_k = auto_bloom_params(n_ref, target_fp)
        warnings.warn(
            f"bloom_contaminated_ids: ~{n_ref} reference n-grams fill an "
            f"m_bits={m_bits} filter to ~{fill:.0%} (per-probe FP "
            f"~{fill ** k:.1%}) — the prefilter is saturating and most of "
            f"the corpus will pay the exact verify join; results stay "
            f"correct, but pass m_bits>={auto_m}, k={auto_k} (the "
            f"target_fp={target_fp} auto size) to restore the scale path."
        )
    bloom = F.broadcast(ngram_bloom(ref_sh, m_bits, k))
    # ONE digest per shingle: h1/h2 project once ahead of the join
    # chain, so the k probe positions are integer math over shared
    # columns — interleaving the hash into each join's projection was
    # measured re-evaluating the md5 chain k times (r9 review finding)
    d = F.md5(F.col("shingle"))
    probe = doc_shingles(docs, n=n, text_col=text_col, id_col=id_col).select(
        "doc_id",
        "shingle",
        F.conv(F.substring(d, 1, 15), 16, 10).cast("long").alias("__h1"),
        F.conv(F.substring(d, 17, 15), 16, 10).cast("long").alias("__h2"),
    )
    probe = probe.select(
        "doc_id",
        "shingle",
        *[
            F.pmod(F.col("__h1") + F.lit(i) * F.col("__h2"), F.lit(m_bits)).alias(
                f"__p{i}"
            )
            for i in range(k)
        ],
    )
    # k broadcast hash joins, each on this row's i-th probe word — no
    # explode, no shuffle; a missing word_idx row means all-zero bits
    hit_all = F.lit(True)
    for i in range(k):
        pos_col = f"__p{i}"
        b = bloom.select(
            F.col("word_idx").alias(f"__w{i}"), F.col("bits").alias(f"__b{i}")
        )
        probe = probe.join(
            b, F.expr(f"{pos_col} div 64") == F.col(f"__w{i}"), "left"
        )
        hit_all = hit_all & (
            F.coalesce(F.col(f"__b{i}"), F.lit(0))
            .bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({pos_col} % 64 AS INT))")
            )
            != 0
        )
    candidates = probe.filter(hit_all).select("doc_id", "shingle")
    verified = candidates.join(ref_sh, "shingle", "left_semi")
    return (
        verified.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") >= min_hits)
    )


def bloom_decontaminate(
    docs: DataFrame,
    ref_docs: DataFrame,
    n: int = 13,
    min_hits: int = 1,
    m_bits: int | None = None,
    k: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """``docs`` minus documents contaminated against a giant reference
    set — ``decontaminate``'s exact semantics on the Bloom scale path
    (``m_bits``/``k`` auto-size from the reference shingle count by
    default, see :func:`bloom_contaminated_ids`)."""
    bad = bloom_contaminated_ids(
        docs, ref_docs, n=n, min_hits=min_hits, m_bits=m_bits, k=k,
        text_col=text_col, id_col=id_col, **kwargs,
    ).select(F.col("doc_id").alias(id_col))
    return docs.join(bad, id_col, "left_anti")
