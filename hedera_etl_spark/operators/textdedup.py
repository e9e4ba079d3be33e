"""Document deduplication operators for large-scale training-data pipelines.

Exact dedup, MinHash+LSH, SimHash and n-gram-Jaccard near-dup detection —
all expressed with JVM-side built-ins only (md5 / transform / explode /
groupBy / joins), no Python UDFs, so every stage stays in whole-stage codegen
and scales by partitioning alone.

Cross-engine determinism: hashes derive from md5 hex digests (see
hedera_etl_spark.functions) so the DuckDB oracle reproduces every value
bit-for-bit.  MinHash exploits that the lexicographic MIN of fixed-length
hex strings equals the numeric MIN of the underlying 128-bit values.

Scale design (100 TB corpus, 1000 executors):
- (doc, shingle) is the widest intermediate; it is produced by explode and
  immediately hash-partitioned by the groupBy/join key — no global sorts.
- MinHash signatures are ONE hash-aggregate pass producing k columns (not k
  passes), then bands explode to (band, sig) buckets; the candidate self-join
  is an equi-join on (band, sig), broadcast-free, and skew-capped (see
  ``lsh_candidates(max_bucket=...)``: degenerate buckets are dropped exactly
  like stop-shingles, a standard LSH production guard).
- SimHash blocking uses the pigeonhole principle: fingerprints within
  hamming distance d share at least one of d+1 bands, so candidate
  generation is an equi-join on (band_id, band_value) — never all-pairs.
- n-gram Jaccard blocks on rare shingles (document-frequency cap), the
  prefix-filtering idea: a pair is a candidate only if it co-occurs in a
  shingle rare enough to be discriminative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------
def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: hash-aggregate on content, keep min id.

    Returns (keep_id, n_copies) per distinct content.  At scale, group on
    md5(text) instead of raw text to shrink shuffle width — semantics are
    identical modulo md5 collisions (2^-64 at corpus scale).

    NO ensure_parallelism spread: ONE md5 per row is not CPU-heavy enough
    to pay for a round-robin exchange of the raw text (measured 3x slower
    with it at sf0.1) — the groupBy's own exchange spreads the aggregate,
    and the map side is just the digest.  Contrast minhash/simhash below,
    whose ~100 digests per row do warrant the spread.
    """
    return (
        docs.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_copies"))
        .select("keep_id", "n_copies")
    )


# ---------------------------------------------------------------------------
# shingling
# ---------------------------------------------------------------------------
def shingle_sets(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, sh_set) with sh_set the DISTINCT, NON-EMPTY shingle array
    per doc (docs shorter than ``n`` tokens are excluded — they carry no
    shingle evidence, matching the exploded form where they produce no
    rows).

    A document's shingles all live in its own row, so the dedup is
    ``array_distinct`` — a per-row map-side operation, not a shuffle.
    Tokenizes into a projected column first so the shingle transform
    references a materialized array instead of re-splitting the text per
    shingle (see functions.shingles).

    The exclusion is deliberately phrased on the TOKEN count, not
    ``size(sh_set) > 0``: a predicate over ``sh_set`` inlines the whole
    shingle transform when Catalyst pushes it below an exchange (e.g. the
    ``ensure_parallelism`` repartition), silently moving the per-shingle
    work onto the few pre-shuffle input splits.  ``size(tokens) >= n`` is
    equivalent (t tokens yield t-n+1 >= 1 shingles) and costs one split()
    wherever the optimizer lands it.

    Expressions are SQL text, not Column chains — higher-order-function
    lambdas are the most expensive Columns to build over py4j (see
    simhash_fingerprints' driver-cost note).  The transform keeps the
    short-doc CASE guard even though the filter already excludes those
    rows: codegen subexpression elimination can hoist a subexpression out
    of a merged conjunction and evaluate it BEFORE the size conjunct, and
    an unguarded ``sequence(1, size-n+1)`` then descends to [1, 0] and
    crashes ``slice`` with start=0 on a filtered-out row."""
    # shingle = concat of n INDEXED elements, not array_join(slice(...)):
    # identical strings (verified incl. empty tokens) but ~40% faster at
    # sf0.1 — slice+join allocates an intermediate array per shingle,
    # indexed concat does not.  Indices are 0-based ([]), the sequence
    # position i is 1-based, so element j of shingle i is __toks[i-1+j].
    concat_terms = ", ' ', ".join(f"__toks[i-1+{j}]" if j else "__toks[i-1]" for j in range(int(n)))
    guarded = (
        f"CASE WHEN size(__toks) < {int(n)} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, size(__toks) - {int(n) - 1}),"
        f" i -> concat({concat_terms}))) END"
    )
    return (
        docs.selectExpr(f"{id_col} AS doc_id", f"split({text_col}, ' ') AS __toks")
        .filter(f"size(__toks) >= {int(n)}")
        .selectExpr("doc_id", f"{guarded} AS sh_set")
    )


def hashed_shingle_sets(
    docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, sh_set) with sh_set the distinct xxhash64 values of the
    doc's n-token shingles — the PRODUCTION twin of :func:`shingle_sets`
    that never materializes a shingle STRING.

    Each shingle hashes its n tokens directly via multi-argument
    xxhash64 (Spark chains per-argument hashing with the running hash as
    seed, so token boundaries are preserved with no separator/concat
    allocation), and everything downstream — array_distinct, the KM
    signature family, the exact-Jaccard array_intersect verify — runs
    over BIGINTs instead of strings.  Measured at sf0.1 (r10
    PERF_NOTES): the string form's concat was the single largest
    remaining cost of the xxhash64 near-dup mode.

    Trade: two distinct shingles collide with probability ~s²/2^65
    corpus-wide (s = distinct shingles) — at 10^10 shingles that is
    ~0.003 expected merged pairs, immaterial to Jaccard estimates and
    the verify; the md5 oracle canon keeps exact strings, and the
    production pair set is pinned equal to it on the seeded corpus."""
    args = ", ".join(
        f"__toks[i-1+{j}]" if j else "__toks[i-1]" for j in range(int(n))
    )
    guarded = (
        f"CASE WHEN size(__toks) < {int(n)} THEN array() "
        f"ELSE array_distinct(transform(sequence(1, size(__toks) - {int(n) - 1}),"
        f" i -> xxhash64({args}))) END"
    )
    return (
        docs.selectExpr(f"{id_col} AS doc_id", f"split({text_col}, ' ') AS __toks")
        .filter(f"size(__toks) >= {int(n)}")
        .selectExpr("doc_id", f"{guarded} AS sh_set")
    )


def minhash_signatures_from_hashed_sets(
    sets: DataFrame, k: int = 9, with_size: bool = False
) -> DataFrame:
    """KM-family MinHash over :func:`hashed_shingle_sets` output: the
    (h1, h2) base pair is the two 32-bit halves of the set element
    ITSELF, so this operator performs zero digest calls — the hash was
    paid once when the set was built (compare
    ``minhash_signatures_from_sets``, which re-digests every shingle
    string here)."""
    hs_expr = (
        "transform(sh_set, x -> named_struct("
        f"'h1', shiftright(x, 32) & {_U32}, "
        f"'h2', x & {_U32})) AS __hs"
    )
    hashed = sets.selectExpr(
        "doc_id", "CAST(size(sh_set) AS BIGINT) AS __n", hs_expr
    )
    cols = [
        f"array_min(transform(__hs, p -> (p.h1 + {i} * p.h2) % {_KM_MOD})) AS mh_{i}"
        for i in range(k)
    ]
    if with_size:
        cols.append("__n")
    return hashed.selectExpr("doc_id", *cols)


def doc_shingles(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Distinct (doc_id, shingle) pairs; shingles are n-token windows.

    Derived by exploding the per-row distinct shingle set — the whole
    thing is a map-side projection with ZERO shuffle (the previous form
    exploded raw shingles then ran a global ``.distinct()``, paying a full
    exchange on (doc_id, shingle) for a dedup that is local to each row).

    explode_OUTER, not explode: a plain explode triggers Catalyst's
    InferFiltersFromGenerate, which synthesizes ``size(sh_set) > 0`` and
    pushes it below the projection — inlining the ENTIRE shingle
    transform into a per-row Filter that then evaluates a second time in
    the Project (the same 5x hazard pinned for the repetition operators,
    test_repetition.py).  shingle_sets' token-count filter already
    guarantees non-empty sets, so the outer generate emits no null rows;
    the null filter on the OUTPUT column is a correctness backstop that
    cannot be pushed below the Generate."""
    return (
        shingle_sets(docs, n, text_col, id_col)
        .selectExpr("doc_id", "explode_outer(sh_set) AS shingle")
        .filter("shingle IS NOT NULL")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
#: Modulus for the Kirsch-Mitzenmacher hash family (2^32).
_KM_MOD = 1 << 32


#: 2^32 - 1 — mask for splitting a 64-bit hash into two 32-bit halves.
_U32 = (1 << 32) - 1


def _check_hash_fn(hash_fn: str) -> None:
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(
            f"unknown hash_fn: {hash_fn!r} (expected 'md5' or 'xxhash64')"
        )


def _km_base(shingle_col, hash_fn: str = "md5"):
    """(h1, h2) base pair for the Kirsch-Mitzenmacher hash family: two
    32-bit values from ONE hash of the shingle.  Family member i is
    (h1 + i*h2) mod 2^32 — pure integer arithmetic, so a k-member
    signature costs one digest per shingle instead of k (the classic
    g_i = h1 + i*h2 construction, same collision guarantees as k
    independent hashes for minhash purposes).

    ``hash_fn`` picks the digest (VERDICT r8 #2):

    - ``"md5"`` — cross-engine oracle canon: DuckDB re-derives the
      identical pair via ``('0x' || substring(md5(s), 1, 8))::BIGINT``
      and chars 9-16.  Cost: the hex digest + conv parse evaluate
      INTERPRETED inside HOF lambdas (~2x the whole-query time at
      sf0.1).
    - ``"xxhash64"`` — production mode: one native JVM hash split into
      its 32-bit halves.  No DuckDB twin exists (xxhash64 is absent
      there), so oracle-gated entries keep md5; everything downstream
      (banding, candidate generation, exact-Jaccard verify) is
      hash-value-free, so the near-dup PAIR SET is the same wherever
      both modes' LSH recall coincides (pinned on a seeded corpus in
      tests/test_textdedup.py).
    """
    _check_hash_fn(hash_fn)
    if hash_fn == "xxhash64":
        x = F.xxhash64(shingle_col)
        h1 = F.shiftright(x, 32).bitwiseAND(F.lit(_U32))
        h2 = x.bitwiseAND(F.lit(_U32))
    else:
        d = F.md5(shingle_col)
        h1 = F.conv(F.substring(d, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(d, 9, 8), 16, 10).cast("long")
    return F.struct(h1.alias("h1"), h2.alias("h2"))


def minhash_signatures(
    sh: DataFrame, k: int = 9, with_size: bool = False, hash_fn: str = "md5"
) -> DataFrame:
    """k-member MinHash signature in a single aggregate pass over
    exploded (doc_id, shingle) rows — Kirsch-Mitzenmacher family, one
    digest per shingle (``hash_fn``: see ``_km_base``).  ``with_size``
    rides the shingle-set cardinality along on the same aggregate (free
    map-side combine) so downstream Jaccard math needs no separate
    sizes pass.
    """
    base = _km_base(F.col("shingle"), hash_fn)
    aggs = [
        F.min((base["h1"] + i * base["h2"]) % F.lit(_KM_MOD)).alias(f"mh_{i}")
        for i in range(k)
    ]
    if with_size:
        aggs.append(F.count("*").alias("__n"))
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_signatures_from_sets(
    sets: DataFrame, k: int = 9, with_size: bool = False, hash_fn: str = "md5"
) -> DataFrame:
    """MinHash signature as a pure per-row projection over ``sh_set``
    (from ``shingle_sets``): array_min over the hashed set — the whole
    doc's shingles live in its row, so no grouping shuffle exists at all.
    Identical values to ``minhash_signatures`` (min over the same set).
    ``shingle_sets`` already excludes shingle-less docs, so NO emptiness
    filter exists here — see its docstring for why a ``size(sh_set)``
    predicate is a pushdown hazard (Catalyst inlines the whole shingle
    transform below the parallelizing exchange).  A caller hand-building
    ``sets`` with empty arrays would get NULL signature members
    (array_min of []) rather than a dropped row.

    The digest runs once per shingle into a projected (h1, h2) array;
    each family member is then an integer transform over that array.
    SQL-text expressions throughout (HOF lambdas are the priciest
    Columns to build over py4j — see simhash_fingerprints' driver-cost
    note).  ``hash_fn="xxhash64"`` swaps the interpreted hex-digest
    parse for one native JVM hash call (see ``_km_base``) — but as of
    r10 the production near-dup path does not come through here at all:
    ``minhash_lsh_neardups(hash_fn="xxhash64")`` builds
    :func:`hashed_shingle_sets` (shingles as longs, no strings) and
    signs them with :func:`minhash_signatures_from_hashed_sets` (zero
    digest calls).  This function remains the md5 ORACLE-canon signer
    and the string-set xxhash64 form for callers that need both modes
    over one sets frame (the incremental signature store).
    """
    _check_hash_fn(hash_fn)
    if hash_fn == "xxhash64":
        hs_expr = (
            "transform(transform(sh_set, s -> xxhash64(s)), x -> named_struct("
            f"'h1', shiftright(x, 32) & {_U32}, "
            f"'h2', x & {_U32})) AS __hs"
        )
    else:
        hs_expr = (
            "transform(sh_set, s -> named_struct("
            "'h1', CAST(conv(substring(md5(s), 1, 8), 16, 10) AS BIGINT), "
            "'h2', CAST(conv(substring(md5(s), 9, 8), 16, 10) AS BIGINT))) AS __hs"
        )
    hashed = sets.selectExpr(
        "doc_id",
        "CAST(size(sh_set) AS BIGINT) AS __n",
        hs_expr,
    )
    cols = [
        f"array_min(transform(__hs, p -> (p.h1 + {i} * p.h2) % {_KM_MOD})) AS mh_{i}"
        for i in range(k)
    ]
    if with_size:
        cols.append("__n")
    return hashed.selectExpr("doc_id", *cols)


def band_structs_expr(bands: int, rows: int):
    """Array of (band, sig) structs over the ``mh_*`` signature columns —
    the LSH banding expression shared by :func:`lsh_candidates` and the
    incremental store's inverted candidate probe
    (incremental_dedup.store_candidate_sigs), so the two sides bucket
    IDENTICALLY by construction."""
    structs = ", ".join(
        "named_struct('band', {b}, 'sig', concat_ws('|', {cols}))".format(
            b=b, cols=", ".join(f"mh_{b * rows + j}" for j in range(rows))
        )
        for b in range(bands)
    )
    return F.expr(f"array({structs})")


def lsh_candidates(
    sig: DataFrame,
    bands: int = 3,
    rows: int = 3,
    max_bucket: int | None = None,
    cap_observations: dict | None = None,
) -> DataFrame:
    """Candidate pairs: docs sharing at least one LSH band signature.

    Bands explode to (doc_id, band, sig); bucket members are then gathered
    with ONE hash aggregate on (band, sig) and pairs are generated inside
    each bucket row by a sorted-array combination transform.  This is
    deliberately NOT a bucket self-join: a self-join evaluates the
    signature subtree twice (the two join inputs are distinct plans, so
    Catalyst cannot reuse the exchange across them — measured at ~2x the
    whole signature cost at sf0.1), while the grouped form pays one
    signature pass and one shuffle, the same shuffle the join needed
    anyway.

    ``max_bucket`` drops degenerate buckets (skew guard for production
    corpora where boilerplate shingles collapse many docs into one
    bucket) BEFORE the members are gathered: a count-over-window on the
    same (band, sig) partitioning filters oversized buckets ahead of the
    collect_list, so the aggregation buffer itself is bounded by
    max_bucket — WindowExec's row buffer is spillable, a non-spillable
    collect_list over a boilerplate bucket is not (ADVICE r5: filtering
    AFTER collection bounded the pair fan-out but still materialized the
    whole degenerate bucket in one buffer).  The window reuses the
    exchange the groupBy needs anyway (same keys: no second shuffle,
    one extra in-partition sort).  Pass None only for exhaustive
    small-corpus runs — that path collects every bucket whole.  Each doc
    appears once per band, so buckets hold distinct docs and no
    self-pairs arise; ``array_sort`` on the (doc_id, ...) structs yields
    doc_a < doc_b for free.

    The cap is a RECALL TRADE and must never be silent (VERDICT r7):
    pass ``cap_observations`` and the dropped-member count rides the
    caller's own action under key ``"lsh_bucket_cap"`` —
    ``capped_members`` counts (doc, band) bucket memberships dropped
    over-cap (singleton buckets are not drops: they never pair), plus
    ``max_bucket_size`` for tuning.  See stats.observe_bucket_cap.
    """
    carry = [c for c in sig.columns if c == "__n"]
    band_structs = band_structs_expr(bands, rows)
    buckets = sig.select("doc_id", *carry, F.explode(band_structs).alias("bk")).select(
        "doc_id", *carry, F.col("bk.band").alias("band"), F.col("bk.sig").alias("sig")
    )
    if max_bucket is not None:
        from hedera_etl_spark.operators.stats import observe_bucket_cap

        buckets = buckets.selectExpr(
            "*", "count(1) OVER (PARTITION BY band, sig) AS __bn"
        )
        buckets = observe_bucket_cap(
            buckets, "__bn", max_bucket, cap_observations, "lsh_bucket_cap"
        )
        buckets = buckets.filter(
            f"__bn >= 2 AND __bn <= {int(max_bucket)}"
        ).drop("__bn")
    member = "struct(doc_id{})".format(", " + ", ".join(carry) if carry else "")
    grouped = buckets.groupBy("band", "sig").agg(
        F.expr(f"array_sort(collect_list({member}))").alias("ds")
    )
    # >= 2 is a no-op on the capped path (pre-filtered above) but load-
    # bearing when max_bucket is None
    size_pred = F.size("ds") >= 2
    n_fields = ", '__n_a', a.__n, '__n_b', b.__n" if carry else ""
    pair_expr = (
        "explode(flatten(transform(ds, (a, i) -> "
        "transform(slice(ds, i + 2, size(ds) - i - 1), b -> "
        f"named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id{n_fields}))))) AS p"
    )
    return (
        grouped.filter(size_pred)
        .selectExpr(pair_expr)
        .select("p.doc_a", "p.doc_b", *[f"p.__n_{s}" for s in ("a", "b") if carry])
        .distinct()
    )


def verify_jaccard(sh: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for candidate pairs.

    Intersection counts come from a pair-scoped equi-join on shingle.
    When the pairs carry set sizes (``__n_a``/``__n_b`` from
    ``lsh_candidates`` over a ``with_size`` signature), no sizes pass or
    joins are needed at all; otherwise sizes come from one aggregate over
    ``sh`` plus two small joins.  Returns (doc_a, doc_b, inter, n_a, n_b,
    jaccard) with jaccard rounded through DECIMAL(9,6) then cast DOUBLE —
    the division is a single IEEE op over exact integers, so the value is
    engine-independent, and the final DOUBLE keeps trailing-zero decimals
    out of downstream hash canonicalizers.
    """
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")

    def with_jaccard(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "jaccard",
            (
                F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            )
            .cast("decimal(9,6)")
            .cast("double"),
        ).select("doc_a", "doc_b", "inter", "n_a", "n_b", "jaccard")

    if "__n_a" in pairs.columns:
        inter = (
            pairs.join(sh_a, "doc_a")
            .join(sh_b, ["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b", "__n_a", "__n_b")
            .agg(F.count("*").alias("inter"))
            .withColumnRenamed("__n_a", "n_a")
            .withColumnRenamed("__n_b", "n_b")
        )
        return with_jaccard(inter)

    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh_a, "doc_a")
        .join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    n_a = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    n_b = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return with_jaccard(inter.join(n_a, "doc_a").join(n_b, "doc_b"))


def verify_jaccard_sets(sets: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact Jaccard for candidate pairs via per-row set intersection.

    Joins each pair back to its two shingle SETS and computes
    ``size(array_intersect(a, b))`` — a per-pair array operation — instead
    of a shingle-level equi-join + re-aggregation (two extra corpus-wide
    shuffles).  Candidate pairs are few by construction (that is the whole
    point of LSH/rare-shingle blocking), so the two pair-to-sets joins
    broadcast the pair side at any scale where blocking works at all.
    Sizes ride along from ``lsh_candidates(with_size)`` pairs when
    present, else fall back to ``size(sh_set)``.

    Output (doc_a, doc_b, inter, n_a, n_b, jaccard) matches
    ``verify_jaccard``: the division is a single IEEE op over exact
    integers rounded through DECIMAL(9,6) then cast DOUBLE (trailing-zero
    decimals hash differently per engine).
    """
    # Two per-side equi-joins, pairs as the streaming probe.  Callers
    # pass CHECKPOINTED sets (minhash_lsh_neardups / ngram docstrings),
    # so reading the plan twice costs two block reads, not two corpus
    # re-shingles — and the pair stream never carries a shingle array
    # through a shuffle.  (An explode-pair + single-join + regroup form
    # was tried: one scan, but it shuffles BOTH members' sets per pair —
    # measured 46 s vs ~3 s here when weak blocking produced 1.3M
    # candidate pairs at sf0.1.  Joins it is.)
    #
    # Broadcast adjudication (r14, after a 10x ladder OOM in a
    # 1g-driver session): AQE promotes the SETS side of these joins to
    # broadcast at small/mid scale.  That promotion is a RUNTIME
    # decision from MEASURED shuffle bytes, hard-capped by
    # spark.sql.adaptive.autoBroadcastJoinThreshold (~10 MB
    # compressed), so the driver-side build is bounded at
    # compression-ratio x threshold — tens of MB on any properly
    # provisioned driver, and at 100 TB the measured size simply
    # disqualifies promotion.  This is NOT the r13 span-join-back
    # hazard, which was a STATIC plan from aggregate estimates (those
    # can be arbitrarily wrong, so that build was unbounded).  A
    # SHUFFLE_HASH hint on the sets side was built and A/B'd anyway:
    # 3x slower on the benched minhash entries at sf0.1 (the sets
    # exchange + lost AQE coalescing), so the hint was rejected and
    # the harness under-provisioning fixed instead
    # (docs/PERF_NOTES.md r14).
    carry = [c for c in ("__n_a", "__n_b") if c in pairs.columns]
    sa = sets.selectExpr("doc_id AS doc_a", "sh_set AS __set_a")
    sb = sets.selectExpr("doc_id AS doc_b", "sh_set AS __set_b")
    joined = pairs.join(sa, "doc_a").join(sb, "doc_b")
    if carry:
        n_a, n_b = "__n_a", "__n_b"
    else:
        n_a = "CAST(size(__set_a) AS BIGINT)"
        n_b = "CAST(size(__set_b) AS BIGINT)"
    return (
        joined.selectExpr(
            "doc_a",
            "doc_b",
            "CAST(size(array_intersect(__set_a, __set_b)) AS BIGINT) AS inter",
            f"{n_a} AS n_a",
            f"{n_b} AS n_b",
        )
        # a zero-intersection pair is a non-candidate: the shingle-join
        # form (and the DuckDB oracle's inner join) emit no row for it,
        # so this form must not either — exact equivalence is pinned by
        # test_verify_jaccard_set_and_exploded_forms_agree
        .filter("inter > 0")
        .selectExpr(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            "CAST(CAST(inter / (n_a + n_b - inter) AS DECIMAL(9,6)) "
            "AS DOUBLE) AS jaccard",
        )
    )


def minhash_lsh_neardups(
    docs: DataFrame,
    n: int = 3,
    k: int = 9,
    bands: int = 3,
    threshold: float = 0.5,
    max_bucket: int | None = 500,
    cap_observations: dict | None = None,
    hash_fn: str = "md5",
    sorted_pairs: bool = True,
) -> DataFrame:
    """Full MinHash/LSH near-dup pipeline: shingle -> sign -> band ->
    candidate join -> exact-Jaccard verify -> threshold.

    ``hash_fn="xxhash64"`` is the production signature mode (native JVM
    hash instead of interpreted per-shingle md5 hex parsing — measured
    the dominant CPU cost of this operator at sf0.1); ``"md5"`` stays
    the default because it is the cross-engine oracle canon (see
    ``_km_base``).  Everything downstream of the signature is
    hash-value-free, so both modes yield the same verified pair set
    wherever their LSH recall coincides.

    ``max_bucket`` defaults ON (500): on a real corpus one boilerplate
    shingle bucket otherwise goes quadratic in the candidate self-join;
    dropping degenerate buckets is the standard LSH production guard
    (pass None to disable for exhaustive small-corpus runs).  Pass
    ``cap_observations`` to get the dropped-membership count under
    ``"lsh_bucket_cap"`` riding your own action (lsh_candidates
    docstring) — the cap is a recall trade and should be monitored, not
    silent."""
    from hedera_etl_spark.tables import ensure_parallelism

    rows = k // bands
    # The shingle sets feed TWO consumers — the signature/banding branch
    # and the Jaccard verify — and tokenize+shingle+distinct is the
    # pipeline's dominant per-row cost, so computing it once matters:
    # the lazy localCheckpoint materializes sh_set on first use and the
    # second branch reads the stored blocks (measured 1.16s -> 0.82s at
    # sf0.1; plain persist() barely helps because both InMemoryTableScan
    # branches of the single action race to populate the cache).  The
    # trade, same as salted_join's pinned salt: checkpoint blocks are not
    # recomputable, so an executor loss fails the job for a clean retry
    # instead of silently recomputing.
    # production mode: shingles live as xxhash64 LONGS end-to-end — no
    # shingle-string allocation, signature halves come free from the set
    # elements, and the verify intersects longs (r10: the string concat
    # was the largest remaining cost once the digest went native; the
    # md5 canon keeps exact strings for the DuckDB oracle)
    if hash_fn == "xxhash64":
        sets = hashed_shingle_sets(ensure_parallelism(docs), n).localCheckpoint(
            eager=False
        )
        sig = minhash_signatures_from_hashed_sets(sets, k, with_size=True)
    else:
        sets = shingle_sets(ensure_parallelism(docs), n).localCheckpoint(eager=False)
        # signatures AND set sizes are per-row array math over sh_set —
        # the shingle->signature stage has zero exchanges (the
        # exploded+grouped form paid two: distinct on (doc,shingle) and
        # the groupBy(doc)); sizes flow through the candidate join, and
        # verify intersects the per-row sets directly, so no
        # shingle-level join exists anywhere
        sig = minhash_signatures_from_sets(sets, k, with_size=True, hash_fn=hash_fn)
    cand = lsh_candidates(
        sig, bands, rows, max_bucket=max_bucket,
        cap_observations=cap_observations,
    )
    # The r15 best-case-jaccard prefilter that sat here was REMOVED in
    # r16 after paired adjudication (VERDICT r15 #3): Catalyst pushes
    # the bound's decimal-cast chain BELOW lsh_candidates' dedup
    # distinct, so it evaluates on every pre-distinct banded pair while
    # dropping almost nothing on a near-dup-planted corpus — measured
    # +13-15% on both benched minhash entries in an alternating
    # same-window A/B (with: 1.208/0.992 s, without: 1.047/0.864 s,
    # control entry flat), agreeing with the driver's own r15 numbers.
    # The verify join is already candidate-bounded, so the bound's
    # at-scale saving is speculative while its cost is per-banded-pair.
    t = repr(float(threshold))
    verified = verify_jaccard_sets(sets, cand).filter(f"jaccard >= {t}D")
    if not sorted_pairs:
        # ``sorted_pairs=False`` skips the presentation sort (guide §2.4:
        # an orderBy used only for deterministic output): the range
        # exchange costs a full pair shuffle PLUS a sampling pass that
        # re-executes the verify-join stage to find range boundaries.
        # Order-insensitive consumers (prepare's connected-components
        # collapse canonicalizes + distincts the pairs anyway) get the
        # identical SET of rows without either.
        return verified
    return verified.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
#: Packed sign-sum lane width: 3 counters of 21 bits per BIGINT.  A lane
#: counts bit-OCCURRENCES per doc; the packed majority test needs
#: 2*count + bias to stay inside a lane, so the packing is exact for docs
#: up to 2^20 - 1 = 1,048,575 tokens (~5 MB of text); beyond that a lane
#: would carry into its neighbor.
SIMHASH_LANE_BITS = 21
SIMHASH_MAX_TOKENS = (1 << (SIMHASH_LANE_BITS - 1)) - 1
#: a 1 in the low bit of each of the three lanes
_LANE_ONES = 1 | (1 << SIMHASH_LANE_BITS) | (1 << (2 * SIMHASH_LANE_BITS))


def simhash_fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc 64-bit SimHash as two 32-bit halves (fp_hi, fp_lo).

    ONE md5 per token occurrence supplies all 64 bit-votes: fingerprint
    bit j of the LOW half votes with hex char j+1's high bit (char in
    8..f), bit j of the HIGH half with the same char's second bit (char
    in 4..7, c..f) — 64 independent bits of the 128-bit digest.  Bit j is
    set iff the vote sum over all token occurrences is positive, i.e.
    2 * ones_j > n_tokens (identical to the classic +/-1 sum).

    Two 32-bit longs instead of one 64-bit value keeps every output
    inside non-overflowing BIGINT arithmetic on any engine (bit 63 of a
    single value would need the sign bit).  ONE explode + ONE aggregate:
    summing votes per token OCCURRENCE equals summing count(token) *
    vote per distinct token, so no intermediate (doc, token) count
    aggregate (a second full shuffle round) exists.

    The aggregate packs the 64 ones-counters 3-per-BIGINT into 21-bit
    lanes (22 packed sums + the token count instead of 64 signed sums):
    a third the aggregation-buffer width and a third the expression count,
    shrinking every partial-aggregate spill row at scale.  The majority
    test then runs on all three lanes of a pack at once:
    ``r_m = 2*p_m + (2^20 - n - 1) * LANE_ONES`` puts each lane at
    ``2*ones_j - n - 1 + 2^20``, which stays in [0, 2^21) for
    n <= SIMHASH_MAX_TOKENS, so lane bit 20 IS the indicator
    (2*ones_j > n) with ties correctly 0 — no per-bit CASE WHEN.  Longer
    docs would carry across lanes — pre-chunk such outliers upstream
    (operators/textanalysis.chunk_documents) if the corpus has them.

    Like transform.py's cast tree, every generated expression is SQL TEXT:
    the node-by-node Column form costs one py4j round-trip per operator
    (~0.9 s of pure Python build time for this query's ~1500 nodes — 15x
    the actual Catalyst planning cost); the text form is a handful of
    calls for an identical analyzed plan.
    """
    from hedera_etl_spark.tables import ensure_parallelism

    # Hex char c's high bit is digest bit (31 - 4*(c%8)) of 32-bit chunk
    # c//8; its second bit is one lower.  Chunks parse once via conv —
    # integer shift/and beats per-char substring + string set membership.
    tok = ensure_parallelism(docs).selectExpr(
        f"{id_col} AS doc_id",
        f"explode(split({text_col}, ' ')) AS token",
    )
    tok = tok.selectExpr(
        "doc_id",
        *[
            f"CAST(conv(substring(md5(token), {8 * c + 1}, 8), 16, 10) AS BIGINT) AS __c{c}"
            for c in range(4)
        ],
    )

    def vote_sql(j: int) -> str:
        """0/1 vote for global fingerprint bit j (0..31 = lo, 32..63 = hi)."""
        top, char = (31, j) if j < 32 else (30, j - 32)
        return f"(shiftrightunsigned(__c{char // 8}, {top - 4 * (char % 8)}) & 1)"

    packs = []
    for m in range((64 + 2) // 3):
        terms = []
        for j in range(3 * m, min(3 * m + 3, 64)):
            lane = SIMHASH_LANE_BITS * (j - 3 * m)
            terms.append(vote_sql(j) if lane == 0 else f"shiftleft({vote_sql(j)}, {lane})")
        packs.append(F.expr(f"sum({' + '.join(terms)})").alias(f"p_{m}"))
    sums = tok.groupBy("doc_id").agg(*packs, F.count("*").alias("__n"))

    bias = f"({1 << (SIMHASH_LANE_BITS - 1)} - __n - 1)"
    signs = sums.selectExpr(
        "doc_id",
        *[
            f"p_{m} * 2 + {bias} * {_LANE_ONES} AS r_{m}"
            for m in range((64 + 2) // 3)
        ],
    )

    def half_sql(base: int) -> str:
        terms = []
        for j in range(base, base + 32):
            pos = SIMHASH_LANE_BITS * (j % 3) + SIMHASH_LANE_BITS - 1
            ind = f"(shiftrightunsigned(r_{j // 3}, {pos}) & 1)"
            out = j - base
            terms.append(ind if out == 0 else f"shiftleft({ind}, {out})")
        return " + ".join(terms)

    return signs.selectExpr(
        "doc_id", f"{half_sql(32)} AS fp_hi", f"{half_sql(0)} AS fp_lo"
    )


def simhash_neardups(
    docs: DataFrame,
    n_bands: int = 4,
    max_hamming: int = 3,
    max_bucket: int | None = None,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash hamming distance, banded blocking.

    Pigeonhole: two fingerprints within hamming distance ``max_hamming``
    agree on at least one of ``max_hamming + 1`` disjoint bands — with
    n_bands > max_hamming the (band_id, band_value) blocking is a
    complete (no-miss) scheme.

    With the default 4 bands over 64 bits, band values are 16-bit: 65,536
    buckets per band, so bucket occupancy stays O(corpus / 65k) — the
    32-bit/8-bit-band variant collapsed to <=256 buckets and went quadratic
    at corpus scale.

    r6: candidates come from GROUPED in-bucket pair generation, not a
    bucket self-join — the join's two inputs were distinct plans, so the
    whole fingerprint subtree (explode + 22-lane aggregate) evaluated
    TWICE (the same defect lsh_candidates fixed in r5), and it carried no
    skew guard.  One fingerprint pass, one shuffle on (band, bv), pairs
    generated inside each bucket row; ``max_bucket`` (optional — OFF
    keeps exact parity with the uncapped oracle) drops degenerate buckets
    BEFORE collection via a count-over-window on the same keys, bounding
    both the collect buffer and the C(n,2) fan-out exactly as in
    ``lsh_candidates``.
    """
    if n_bands <= max_hamming:
        raise ValueError(
            f"blocking is lossy unless n_bands > max_hamming (got {n_bands} <= {max_hamming})"
        )
    if n_bands % 2 or 64 % n_bands:
        raise ValueError(f"n_bands must be even and divide 64 (got {n_bands})")
    band_bits = 64 // n_bands
    per_half = n_bands // 2
    fp = simhash_fingerprints(docs)

    def band_value(b: int) -> Column:
        half = F.col("fp_lo") if b < per_half else F.col("fp_hi")
        shift = (b % per_half) * band_bits
        return F.shiftrightunsigned(half, shift).bitwiseAND(F.lit((1 << band_bits) - 1))

    bands_arr = F.array(
        *[
            F.struct(F.lit(b).alias("band"), band_value(b).alias("bv"))
            for b in range(n_bands)
        ]
    )
    buckets = fp.select("doc_id", "fp_hi", "fp_lo", F.explode(bands_arr).alias("bk")).select(
        "doc_id", "fp_hi", "fp_lo", F.col("bk.band").alias("band"), F.col("bk.bv").alias("bv")
    )
    if max_bucket is not None:
        from pyspark.sql import Window as W

        wb = W.partitionBy("band", "bv")
        buckets = (
            buckets.withColumn("__bn", F.count("*").over(wb))
            .filter((F.col("__bn") >= 2) & (F.col("__bn") <= max_bucket))
            .drop("__bn")
        )
    member = F.struct("doc_id", "fp_hi", "fp_lo")
    grouped = buckets.groupBy("band", "bv").agg(
        F.array_sort(F.collect_list(member)).alias("ds")
    )
    # r15 optimization round (guide §2.3, filter/shrink before the
    # exchange): hamming is a per-row function of the candidate pair, so
    # computing it and applying the <= max_hamming cut BEFORE the dedup
    # exchange is result-identical (filter and distinct commute when the
    # filter depends only on the row) while the distinct then shuffles
    # ONLY true near-dup pairs at 3 narrow columns, instead of every
    # banded candidate at 6 (two rows with equal (doc_a, doc_b) carry
    # equal fingerprints, hence equal hamming — dedup keys unchanged).
    pairs = (
        grouped.filter(F.size("ds") >= 2)
        .selectExpr(
            "explode(flatten(transform(ds, (a, i) -> "
            "transform(slice(ds, i + 2, size(ds) - i - 1), b -> "
            "named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id, "
            "'hi_a', a.fp_hi, 'lo_a', a.fp_lo, "
            "'hi_b', b.fp_hi, 'lo_b', b.fp_lo))))) AS p"
        )
        .select(
            "p.doc_a",
            "p.doc_b",
            (
                F.bit_count(F.col("p.hi_a").bitwiseXOR(F.col("p.hi_b")))
                + F.bit_count(F.col("p.lo_a").bitwiseXOR(F.col("p.lo_b")))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs.orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# n-gram Jaccard with rare-shingle blocking
# ---------------------------------------------------------------------------
def containment_neardups(
    docs: DataFrame, n: int = 3, max_df: int = 20, threshold: float = 0.9
) -> DataFrame:
    """Shingle-CONTAINMENT near-dups: pairs with
    ``|A ∩ B| / min(|A|, |B|) >= threshold`` — the quote/wrapper class
    Jaccard misses at any threshold (a short document embedded verbatim
    in a much longer one has containment 1.0 but Jaccard ~|A|/|B|).

    Blocking: the prefix-filter theorem adapted to containment — for
    the SMALLER member S of a qualifying pair, the partner must share a
    shingle among S's first ``|S| - floor(c*|S|) + 1`` shingles in the
    rarest-first global order (missing the whole prefix bounds the
    overlap below c*|S|).  The partner's side carries no such bound (it
    may be arbitrarily larger), so candidates join each doc's PREFIX
    rows against every df-filtered shingle row — one equi-join, recall-
    complete at the threshold up to the same documented ``max_df``
    boilerplate cap as the Jaccard path, and crucially NO length filter
    (asymmetric sizes are the point).  Verify is the exact per-pair set
    intersection; containment rounds through DECIMAL(9,6), the
    cross-engine hash canon.
    """
    from pyspark.sql import Window as W

    from hedera_etl_spark.tables import ensure_parallelism

    sets = shingle_sets(ensure_parallelism(docs), n).localCheckpoint(eager=False)
    sh = sets.select(
        "doc_id",
        F.size("sh_set").cast("long").alias("__sz"),
        F.explode("sh_set").alias("shingle"),
    )
    wdf = W.partitionBy("shingle")
    rare = (
        sh.withColumn("__df", F.count("*").over(wdf))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
    ).localCheckpoint(eager=False)  # feeds the prefix AND the probe join
    wdoc = W.partitionBy("doc_id").orderBy("__df", "shingle")
    prefix = (
        rare.withColumn("__rn", F.row_number().over(wdoc))
        .filter(
            F.col("__rn")
            <= F.col("__sz") - F.floor(F.lit(threshold) * F.col("__sz")) + F.lit(1)
        )
        .select(F.col("doc_id").alias("__pd"), "shingle")
    )
    cand = (
        prefix.join(rare.select("doc_id", "shingle"), "shingle")
        .filter(F.col("__pd") != F.col("doc_id"))
        .select(
            F.least("__pd", "doc_id").alias("doc_a"),
            F.greatest("__pd", "doc_id").alias("doc_b"),
        )
        .distinct()
    )
    verified = verify_jaccard_sets(sets, cand)
    return (
        verified.select(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            (F.col("inter") / F.least("n_a", "n_b"))
            .cast("decimal(9,6)")
            .cast("double")
            .alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


def similarity_histogram(
    docs: DataFrame,
    n: int = 3,
    max_df: int = 20,
    floor: float = 0.5,
    bins: int = 10,
) -> DataFrame:
    """Threshold-sweep report: exact-Jaccard near-dup PAIR COUNTS per
    similarity bin, for every pair at jaccard >= ``floor`` — the
    distribution a curator reads to pick a dedup threshold ("0.8 drops
    12k pairs, 0.7 drops 48k") instead of guessing one.

    Reuses the prefix-filtered pair pipeline at ``floor`` (recall-
    complete above it by the SSJoin prefix theorem), then one
    dimension-sized aggregate: output is ``bins`` rows regardless of
    corpus size.  Binning multiplies the DECIMAL(9,6)-rounded jaccard
    as a DECIMAL — exact, so a pair at exactly 0.7 lands in bin 7 in
    every engine (double multiplication would put 0.7*10 just below 7
    in BOTH engines — consistently, but surprisingly).
    """
    pairs = ngram_jaccard_neardups(docs, n=n, max_df=max_df, threshold=floor)
    bin_col = F.floor(
        F.col("jaccard").cast("decimal(9,6)") * F.lit(bins)
    ).cast("long")
    return (
        pairs.groupBy(bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            "bin",
            (F.col("bin") / F.lit(float(bins))).alias("sim_lo"),
            "n_pairs",
        )
        .orderBy("bin")
    )


def ngram_jaccard_neardups(
    docs: DataFrame, n: int = 3, max_df: int = 20, threshold: float = 0.8
) -> DataFrame:
    """Exact n-gram Jaccard near-dups, blocked with PREFIX FILTERING.

    Blocking on every shingle with document frequency <= max_df is
    recall-equivalent but quadratic in practice: EACH rare shingle emits
    C(df, 2) pairs, and a small-vocabulary corpus makes most shingles
    "rare" (measured 1.25M candidate pairs from 5k docs at sf0.1 — 45 s,
    with the exact verify dwarfing everything).  The standard fix is the
    prefix filter of the set-similarity-join literature (SSJoin/PPJoin):
    for Jaccard >= t, any qualifying pair must share a shingle among each
    document's first ``p = |A| - floor(t * |A|) + 1`` shingles in a GLOBAL
    order (rarest-first: ascending df, shingle) — if A's whole prefix
    missed B, the overlap is at most |A| - p < t|A| <= the required
    intersection.  So only prefix shingles become blocking keys (~20% of
    them at t=0.8), and a length filter (min size >= t * max size, another
    Jaccard necessity) prunes survivors before the exact verify.  floor
    rather than the tight ceil keeps the prefix a token longer — immune
    to IEEE rounding at exact multiples of t, recall-safe by construction.

    Two deliberate deviations from the textbook, both recall-safe:
    - the 2 <= df <= max_df filter applies BEFORE ranking: removing
      tokens from the global order only PROMOTES surviving tokens into
      prefixes, so every pair the filtered-universe theorem guarantees is
      still found (df=1 shingles cannot pair; df > max_df is the same
      documented boilerplate/skew cap as before — a pair whose every
      shared shingle is boilerplate is lost under either scheme);
    - prefix ranks use the FULL set size |A| (from ``sh_set``), as the
      theorem requires, not the filtered size.

    Per-shingle member lists are still gathered in-aggregate with the
    collect_list buffer bounded by max_df (ADVICE r5), and the Jaccard is
    computed over the FULL shingle sets of each candidate pair.
    """
    from pyspark.sql import Window as W

    from hedera_etl_spark.tables import ensure_parallelism

    # checkpoint: sets feed the shingle explode AND the verify join (see
    # minhash_lsh_neardups for the measured rationale)
    sets = shingle_sets(ensure_parallelism(docs), n).localCheckpoint(eager=False)
    sh = sets.select(
        "doc_id",
        F.size("sh_set").cast("long").alias("__sz"),
        F.explode("sh_set").alias("shingle"),
    )
    wdf = W.partitionBy("shingle")
    rare = (
        sh.withColumn("__df", F.count("*").over(wdf))
        .filter((F.col("__df") >= 2) & (F.col("__df") <= max_df))
    )
    # rarest-first global order; (df, shingle) is unique per doc, so the
    # rank is deterministic on both engines
    wdoc = W.partitionBy("doc_id").orderBy("__df", "shingle")
    prefix = (
        rare.withColumn("__rn", F.row_number().over(wdoc))
        .filter(
            F.col("__rn")
            <= F.col("__sz") - F.floor(F.lit(threshold) * F.col("__sz")) + F.lit(1)
        )
        .select("doc_id", "__sz", "shingle")
    )
    grouped = prefix.groupBy("shingle").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("doc_id"), F.col("__sz")))
        ).alias("ds")
    )
    cand = (
        grouped.selectExpr(
            "explode(flatten(transform(ds, (a, i) -> "
            "transform(slice(ds, i + 2, size(ds) - i - 1), b -> "
            "named_struct('doc_a', a.doc_id, 'doc_b', b.doc_id, "
            "'__n_a', a.__sz, '__n_b', b.__sz))))) AS p"
        )
        .select("p.doc_a", "p.doc_b", "p.__n_a", "p.__n_b")
        # length filter: Jaccard >= t forces min/max size ratio >= t
        .filter(
            F.least("__n_a", "__n_b").cast("double")
            >= F.lit(threshold) * F.greatest("__n_a", "__n_b").cast("double")
        )
        .distinct()
    )
    return (
        verify_jaccard_sets(sets, cand)
        .filter(F.col("jaccard") >= threshold)
        .orderBy("doc_a", "doc_b")
    )
