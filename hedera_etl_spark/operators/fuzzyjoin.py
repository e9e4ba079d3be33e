"""Edit-distance similarity join (fuzzy key join): pairs of rows whose
string keys are within Levenshtein distance ``d`` — the entity-
resolution primitive (near-identical names/urls/ids from independent
sources) that equi-joins can't express and a cross join can't survive.

Algorithm: segment blocking in the PassJoin family (Li, Deng, Feng:
"PASS-JOIN: a partition-based method for similarity joins", PVLDB 2011
— public literature), verified with the engine's native ``levenshtein``:

1. PROBE side: split each key into ``d + 1`` contiguous segments
   (as-equal-as-possible lengths).  Pigeonhole: if ed(u, v) <= d, at
   most d of u's d+1 segments can be touched by an edit, so at least
   one appears in v VERBATIM, start-shifted by at most d.
2. CANDIDATE side: every substring whose (length, position) could be a
   probe segment under the length filter |len(u) - len(v)| <= d — a
   bounded explode of O(|v| * d) rows per key (for 12-char keys at
   d=1: ~36).
3. Candidates are the equi-join on the substring value (+ length and
   position-window filters) — the ONLY shuffle, and it moves segment-
   sized rows.  Hot segments (boilerplate prefixes) are skew-capped
   with the repo's loud cap (stats.observe_bucket_cap): capping trades
   recall for boundedness and must never be silent.
4. Exact verify: ``levenshtein(a, b) <= d`` on the deduplicated pairs —
   classic Wagner-Fischer in both Spark and DuckDB, so the result is
   engine-portable and the DuckDB oracle can brute-force the same
   answer.

Blocking is SOUND (never loses a true pair) whenever the probe key has
at least d+1 characters, i.e. every segment is non-empty.  Shorter
probe keys are routed through an explicit small-side broadcast block
against length-compatible candidates, keeping the operator total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments_expr(key: str, d: int) -> str:
    """SQL expression: array of (pos, seg) structs — ``key`` split into
    d+1 contiguous segments, segment i spanning [floor(i*L/(d+1)),
    floor((i+1)*L/(d+1))) (0-based; substring() is 1-based)."""
    n = d + 1
    return (
        f"transform(sequence(0, {d}), i -> named_struct("
        f"'pos', CAST(floor(i * length({key}) / {n}) AS INT), "
        f"'seg', substring({key}, CAST(floor(i * length({key}) / {n}) AS INT) + 1, "
        f"CAST(floor((i + 1) * length({key}) / {n}) - floor(i * length({key}) / {n}) AS INT))))"
    )


def _substrings_expr(key: str, d: int) -> str:
    """SQL expression: array of (pos, sub) structs — every substring of
    ``key`` whose length equals a possible probe-segment length under
    the |len(u) - len(v)| <= d filter: ceil/floor of L'/(d+1) for
    L' in [length(key) - d, length(key) + d]."""
    n = d + 1
    # distinct plausible segment lengths, then one (pos, sub) per start
    return (
        f"flatten(transform("
        f"  array_distinct(flatten(transform("
        f"    sequence(greatest(length({key}) - {d}, {n}), length({key}) + {d}),"
        f"    lp -> array(CAST(floor(lp / {n}) AS INT), CAST(ceil(lp / {n}) AS INT))))),"
        f"  sl -> CASE WHEN sl < 1 OR sl > length({key}) THEN array()"
        f"        ELSE transform(sequence(0, length({key}) - sl),"
        f"             p -> named_struct('pos', CAST(p AS INT),"
        f"                               'sub', substring({key}, p + 1, sl))) END))"
    )


def fuzzy_key_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
    max_dist: int = 1,
    max_segment: int | None = 10_000,
    cap_observations: dict | None = None,
) -> DataFrame:
    """All pairs ``(id_a, id_b, key_a, key_b, dist)`` with
    ``levenshtein(key_a, key_b) <= max_dist``, ``left`` as the probe
    side and ``right`` as the candidate side.  NULL keys never match
    (engine-portable null semantics).  For a self-join pass the same
    frame twice and filter ``id_a < id_b`` (or use
    :func:`fuzzy_neardup_pairs`).

    ``max_segment`` caps candidates per segment value — the same loud
    recall-for-boundedness trade as every LSH bucket cap (see module
    docstring); pass ``cap_observations`` to read the dropped counts.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = max_dist

    # No ensure_parallelism spread here (r16, tried and reverted): the
    # per-row fan-out is light (short keys, d+1 segments / O(|key|*d)
    # substrings), and an alternating same-window A/B measured the
    # spread exchange costing more than the single-split explode it
    # parallelizes at sf0.1 (0.902 s with vs 0.787 s without, control
    # entry flat) — the opposite of spandedup's heavy span fan-out.
    a = left.select(
        F.col(id_col).alias("id_a"), F.col(key_col).cast("string").alias("key_a")
    ).filter(F.col("key_a").isNotNull())
    b = right.select(
        F.col(id_col).alias("id_b"), F.col(key_col).cast("string").alias("key_b")
    ).filter(F.col("key_b").isNotNull())

    # long probes: sound segment blocking (every segment non-empty)
    probes = (
        a.filter(F.length("key_a") >= d + 1)
        .select(
            "id_a", "key_a",
            F.explode(F.expr(_segments_expr("key_a", d))).alias("s"),
        )
        .select("id_a", "key_a", F.col("s.pos").alias("pos_a"),
                F.col("s.seg").alias("seg"))
    )
    cands = b.select(
        "id_b", "key_b",
        F.explode(F.expr(_substrings_expr("key_b", d))).alias("s"),
    ).select("id_b", "key_b", F.col("s.pos").alias("pos_b"),
             F.col("s.sub").alias("seg"))
    if max_segment is not None:
        from pyspark.sql import Window as W

        from hedera_etl_spark.operators.stats import observe_bucket_cap

        cands = cands.withColumn(
            "__sn", F.count("*").over(W.partitionBy("seg"))
        )
        cands = observe_bucket_cap(
            cands, "__sn", max_segment, cap_observations, "fuzzy_segment_cap"
        )
        cands = cands.filter(F.col("__sn") <= max_segment).drop("__sn")

    blocked = (
        probes.join(cands, "seg")
        .filter(
            (F.abs(F.col("pos_a") - F.col("pos_b")) <= d)
            & (F.abs(F.length("key_a") - F.length("key_b")) <= d)
        )
        .select("id_a", "key_a", "id_b", "key_b")
    )

    # short probes (< d+1 chars): a segment would be empty, so block
    # explicitly — broadcast the (tiny) short-key side against length-
    # compatible candidates; at most (2d+1) distinct candidate lengths
    short = a.filter(F.length("key_a") < d + 1)
    short_pairs = F.broadcast(short).join(
        b, F.abs(F.length("key_a") - F.length("key_b")) <= d
    ).select("id_a", "key_a", "id_b", "key_b")

    # Dedup on the FULL (id, key) pair: a pair can be blocked by several
    # segments, but two rows sharing an id with different keys are
    # distinct pairs — deduping on ids alone could keep a non-matching
    # key pair and drop a true one (ADVICE r8 #1).  id_a == id_b pairs
    # are legitimate here: left and right are independent sources whose
    # id spaces may overlap; the self-join wrapper excludes them.
    return (
        blocked.unionByName(short_pairs)
        .dropDuplicates(["id_a", "id_b", "key_a", "key_b"])
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= d)
    )


def fuzzy_neardup_pairs(
    df: DataFrame,
    key_col: str = "key",
    id_col: str = "id",
    max_dist: int = 1,
    max_segment: int | None = 10_000,
    cap_observations: dict | None = None,
) -> DataFrame:
    """Self-join form: unordered key pairs within ``max_dist`` edits,
    canonicalized as ``id_a < id_b`` (self-pairs — the same row probed
    against itself — drop) — feed into components.connected_components
    for typo-cluster collapse.  Assumes ``id_col`` is unique within
    ``df`` (a corpus primary key).

    Canonicalization SWAPS a reverse-direction row instead of filtering
    it (r9 review finding): under an active ``max_segment`` cap the two
    probe directions of one pair can survive asymmetrically — an indel
    shifts the segment alignment, so direction u->v can match through a
    distinct (kept) substring value while v->u only matches through a
    capped boilerplate value.  A plain ``id_a < id_b`` filter would
    throw away the surviving direction whenever the probe side happened
    to carry the larger id."""
    pairs = fuzzy_key_join(
        df, df, key_col, id_col, max_dist, max_segment, cap_observations
    )
    swap = F.col("id_a") > F.col("id_b")
    return (
        pairs.select(
            F.when(swap, F.col("id_b")).otherwise(F.col("id_a")).alias("id_a"),
            F.when(swap, F.col("id_a")).otherwise(F.col("id_b")).alias("id_b"),
            F.when(swap, F.col("key_b")).otherwise(F.col("key_a")).alias("key_a"),
            F.when(swap, F.col("key_a")).otherwise(F.col("key_b")).alias("key_b"),
            "dist",
        )
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b", "key_a", "key_b"])
    )
