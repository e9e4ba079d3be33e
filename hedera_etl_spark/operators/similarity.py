"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline.  Query set broadcasts;
  candidates never shuffle; ranking is a per-query window (or a
  TakeOrderedAndProject when k is global).
- LSH-bucketed ANN: deterministic random-hyperplane signatures.  The
  hyperplane sign matrix is generated from md5 in *Python at plan time* and
  embedded as literal arrays, so any engine (and the DuckDB oracle)
  reproduces identical buckets.  Candidates are an equi-join on bucket id —
  at corpus scale this is the difference between O(n*q) and O(n*q/2^planes).
- embedding near-dup: cosine >= threshold pairs within LSH buckets.

All vector math accumulates sequentially in double precision — see
hedera_etl_spark.functions: bit-reproducible across engines.  The single
per-pair SCORING cosine is unrolled into flat codegen arithmetic (same
accumulation order and values as the interpreted F.aggregate form, ~10x
per pair); the n_planes/n_centroids-wide bucket and quantizer arrays
deliberately keep the interpreted fold — at that width the unrolled tree
explodes Catalyst plan time (see lsh_bucket_col).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.functions import cosine, dot

#: Query batches below this size score cheaper on an UNSPREAD corpus scan
#: (measured: a handful of queries is a few hundred flops per row, noise
#: next to the exchange ensure_parallelism adds) — shared by every exact
#: scoring path so a retune can't drift between them.
_SPREAD_MIN_QUERIES = 32


def _sim_round(col):
    """The cross-engine similarity canon: ONE DECIMAL(9,6) rounding of
    the scored cosine, then DOUBLE so hash canonicalizers never see a
    trailing-zero decimal string.  Every similarity output and every
    DuckDB oracle twin (queries/simops.py) mirrors exactly this width —
    change it in one place or hash parity breaks."""
    return col.cast("decimal(9,6)").cast("double")


def hyperplane_signs(n_planes: int, dims: int) -> list[list[int]]:
    """Deterministic +/-1 hyperplane matrix: sign(p,d) from md5("p:d")."""
    return [
        [
            1 if hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0] >= "8" else -1
            for d in range(dims)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_col(vec_col, signs: list[list[int]]):
    """Bucket id column: bit p set iff the dot(vec, plane_p) >= 0.

    Deliberately the FOLD form of dot, not the unrolled one: these
    projections compose n_planes-wide (8-16 dots per row, the whole
    matrix re-referenced by bucket + multi-probe branches), and the
    unrolled expression tree at that width blows up Catalyst analysis
    and codegen compile — measured 0.55 -> 4.5-6 s of PLAN time per
    LSH entry (ivf's 16-centroid array: 1.5 -> 21 s).  The unroll pays
    only for the single per-pair scoring cosine (see ``cosine(dims=)``
    call sites); per-row bucket math is a few hundred interpreted ops,
    noise next to the join it feeds."""
    bucket = None
    for p, plane in enumerate(signs):
        lit_plane = F.array(*[F.lit(float(s)) for s in plane])
        proj = dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, lit_plane)
        bit = F.when(proj >= 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bit if bucket is None else bucket + bit
    return bucket


def lsh_projections_col(vec_col, signs: list[list[int]]):
    """Array of the raw hyperplane projections dot(vec, plane_p) — the
    per-plane confidence multi-probe ranks by (|proj| ~ distance to the
    boundary; the smallest are the likeliest sign flips).  Fold-form dot
    on purpose — see lsh_bucket_col's plan-size note."""
    return F.array(
        *[
            dot(
                F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                F.array(*[F.lit(float(s)) for s in plane]),
            )
            for plane in signs
        ]
    )


def _bounded_sort(df: DataFrame, *cols) -> DataFrame:
    """Lazy-import alias of tables.bounded_sort (avoids a module cycle)."""
    from hedera_etl_spark.tables import bounded_sort

    return bounded_sort(df, *cols)


def _cap_buckets(
    bucketed: DataFrame,
    max_bucket: int | None,
    cap_observations: dict | None = None,
    cap_key: str = "bucket_cap",
) -> DataFrame:
    """Drop rows in oversized LSH buckets — the same production skew guard
    as textdedup.lsh_candidates(max_bucket): one boilerplate/degenerate
    bucket otherwise goes quadratic in the bucket join at corpus scale.
    Costs a count-over-window on the SAME bucket key the join shuffles on,
    so no extra exchange round.

    The cap is a RECALL TRADE, so it must never be silent (VERDICT r7):
    pass ``cap_observations`` (any dict) and dropped-member counts ride
    the caller's own action under ``cap_key`` — see
    stats.observe_bucket_cap."""
    if max_bucket is None:
        return bucketed
    from pyspark.sql import Window as W

    from hedera_etl_spark.operators.stats import observe_bucket_cap

    out = bucketed.withColumn(
        "__bn", F.count("*").over(W.partitionBy("bucket"))
    )
    out = observe_bucket_cap(out, "__bn", max_bucket, cap_observations, cap_key)
    return out.filter(F.col("__bn") <= max_bucket).drop("__bn")


def ivf_centroids(n_centroids: int, dims: int) -> list[list[float]]:
    """Deterministic pseudo-random centroids in [-1, 1]^dims from md5.

    A production IVF trains centroids with k-means over a sample; the
    coarse-quantizer *plumbing* (assignment, inverted lists, multi-probe)
    is identical either way, and fixed centroids keep every engine's
    bucket assignment bit-reproducible for the oracle.
    """
    return [
        [
            (int(hashlib.md5(f"ivf:{c}:{d}".encode()).hexdigest()[:8], 16) / 0xFFFFFFFF)
            * 2.0
            - 1.0
            for d in range(dims)
        ]
        for c in range(n_centroids)
    ]


def ivf_train_kmeans(
    emb: DataFrame,
    n_centroids: int = 16,
    dims: int = 64,
    iters: int = 5,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Train IVF centroids with SPHERICAL k-means over the corpus — the
    production swap-in for the fixed md5-derived centroids.

    Spherical (centroids L2-normalized each round) because the coarse
    quantizer assigns by argmax-DOT: with unit centroids that is argmax
    cosine, the similarity the index serves.  A plain mean degenerates
    here — averaging near-isotropic vectors shrinks the centroid norm
    toward zero, collapsing the dot-product objective.

    Spark-native iteration: each round is one scan — assign every vector
    to its argmax-dot centroid (the same coarse quantizer the index
    uses), then recompute the per-cluster mean DIMENSION-WISE: posexplode
    the vector to (bucket, dim, value) scalar rows and aggregate
    sum+count per (bucket, dim).  That is a single shuffle of n*dims
    scalars with full map-side combine, and the driver collect is
    exactly k*dims rows regardless of corpus size — no cluster is ever
    materialized whole anywhere.  Centroid literals live driver-side
    between rounds (k*dims doubles), so no lineage growth or
    checkpointing is needed; each iteration's plan is flat.

    Initialization is the deterministic md5 grid (``ivf_centroids``) so
    runs are repeatable given a fixed iteration count; exact float sums
    depend on partition order, which is why the TRAINED path feeds
    rows-only checks while the fixed-centroid path remains the
    oracle-checked twin (docstring contract in ``ivf_topk``).  An empty
    cluster keeps its previous centroid (standard Lloyd's fallback).
    """
    from hedera_etl_spark.tables import ensure_parallelism

    corpus = ensure_parallelism(emb)
    centroids = ivf_centroids(n_centroids, dims)
    for _ in range(iters):
        dots = _dots_array(vec_col, centroids)
        assigned = corpus.select(
            F.array_position(dots, F.array_max(dots)).alias("bucket"),
            F.posexplode(vec_col).alias("dim", "x"),
        )
        stats = (
            assigned.groupBy("bucket", "dim")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        sums: dict[int, list] = {}
        counts: dict[int, int] = {}
        for r in stats:
            b = int(r["bucket"]) - 1  # array_position is 1-based
            sums.setdefault(b, [0.0] * dims)[int(r["dim"])] = float(r["s"])
            counts[b] = int(r["n"])

        def unit_mean(c: int) -> list[float]:
            mean = [s / counts[c] for s in sums[c]]
            n2 = sum(x * x for x in mean) ** 0.5
            if n2 == 0.0:
                return centroids[c]  # degenerate cluster: keep previous
            return [x / n2 for x in mean]

        centroids = [
            unit_mean(c) if counts.get(c) else centroids[c] for c in range(n_centroids)
        ]
    return centroids


def _dots_array(vec_col, centroids: list[list[float]]):
    # fold-form dot: a 16-centroid unrolled array measured 21 s of plan
    # time (see lsh_bucket_col's note)
    return F.array(
        *[
            dot(
                F.col(vec_col) if isinstance(vec_col, str) else vec_col,
                F.array(*[F.lit(v) for v in plane]),
            )
            for plane in centroids
        ]
    )


def ivf_assign(emb: DataFrame, centroids, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Coarse quantization: bucket = argmax dot(vec, centroid) (1-based,
    first-match tiebreak) — the inverted-list assignment."""
    from hedera_etl_spark.tables import ensure_parallelism

    dots = _dots_array(vec_col, centroids)
    # n_centroids × dims fold multiplications per corpus row — the
    # dominant compute of the whole IVF build; spread it across cores even
    # when the source file scans as a single split
    return ensure_parallelism(emb).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        F.array_position(dots, F.array_max(dots)).alias("bucket"),
    )


def ivf_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in one inverted list
    each; queries probe their ``n_probe`` closest centroids, so the scan
    touches ~n_probe/n_centroids of the corpus instead of all of it.

    The probe fan-out is a per-query explode + rank (queries are few);
    candidate retrieval is a bucket equi-join — both sides scale-safe.
    ``centroids`` defaults to the deterministic md5 grid (the
    oracle-checkable twin); pass ``ivf_train_kmeans(...)`` output for the
    production quantizer (better-balanced lists, higher recall at the
    same n_probe).
    """
    from pyspark.sql import Window as W

    centroids = centroids or ivf_centroids(n_centroids, dims)
    assigned = ivf_assign(emb, centroids, id_col, vec_col)

    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.posexplode(_dots_array(vec_col, centroids)).alias("cidx", "cdot"),
    )
    wprobe = W.partitionBy("query_id").orderBy(F.col("cdot").desc(), "cidx")
    probes = (
        q.withColumn("pr", F.row_number().over(wprobe))
        .filter(F.col("pr") <= n_probe)
        .select("query_id", "qvec", (F.col("cidx") + 1).alias("bucket"))
    )

    scored = (
        F.broadcast(probes)
        .join(assigned, "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("vec"), dims))
    )
    wrank = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wrank).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            _sim_round(F.col("cos")).alias("cos_sim"),
        )
        # q x k rows — bounded output (tables.bounded_sort)
        .transform(lambda d: _bounded_sort(d, "query_id", "rank"))
    )


def brute_force_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Exact cosine top-k for a fixed query set.

    The query side is a small broadcast; scoring is one scan of the corpus;
    per-query ranking is a window over q partitions.  Ties break on
    neighbor id for determinism.  Pass ``dims`` when the embedding width
    is known so the scoring fold unrolls into codegen (functions.dot).
    """
    from pyspark.sql import Window as W

    from hedera_etl_spark.tables import ensure_parallelism

    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    # the corpus scan carries the O(n*q*dims) fold math; spreading a
    # narrow scan pays only when q is large enough that the per-row work
    # dwarfs the exchange (see _SPREAD_MIN_QUERIES)
    corpus = ensure_parallelism(emb) if len(query_ids) >= _SPREAD_MIN_QUERIES else emb
    cands = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(cands)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("nvec"), dims))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            _sim_round(F.col("cos")).alias("cos_sim"),
        )
        # q x k rows — bounded output; the window exchange above keeps the
        # scoring parallel (tables.bounded_sort)
        .transform(lambda d: _bounded_sort(d, "query_id", "rank"))
    )


def lsh_ann_topk(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 5,
    n_planes: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 10_000,
    n_probe: int = 1,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH
    bucket(s).

    Scale guards, both on by default:

    - 16 planes = 65,536 buckets, so mean occupancy stays O(corpus/65k);
      the old 8-plane default collapsed a corpus into <= 256 buckets and
      the bucket join went quadratic.  Small corpora (where 65k buckets
      would isolate every vector) should pass n_planes=8 explicitly.
    - ``max_bucket`` drops degenerate buckets outright (see
      _cap_buckets) — without it ONE hot bucket is O((bucket size)^2).

    ``n_probe`` > 1 is standard multi-probe: each query also probes the
    buckets reached by flipping its (n_probe - 1) most-uncertain
    hyperplane signs (smallest |projection| — the planes the vector sits
    closest to), recovering most of the recall a single table loses
    without growing the index.  Probe fan-out is per-QUERY work; the
    corpus is never re-bucketed.
    """
    from pyspark.sql import Window as W

    from hedera_etl_spark.tables import ensure_parallelism

    signs = hyperplane_signs(n_planes, dims)
    bucketed = ensure_parallelism(emb).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("vec"),
        lsh_bucket_col(vec_col, signs).alias("bucket"),
    )
    # queries keep their own bucket even when it is over the cap — the cap
    # protects the JOIN's corpus side; a query in a dropped bucket simply
    # finds no candidates there (mirrors textdedup semantics)
    queries = bucketed.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("vec").alias("qvec"), "bucket"
    )
    if n_probe > 1:
        qproj = emb.filter(F.col(id_col).isin(query_ids)).select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("qvec"),
            lsh_bucket_col(vec_col, signs).alias("bucket"),
            F.posexplode(lsh_projections_col(vec_col, signs)).alias("plane", "proj"),
        )
        wflip = W.partitionBy("query_id").orderBy(F.abs(F.col("proj")).asc(), "plane")
        flips = (
            qproj.withColumn("fr", F.row_number().over(wflip))
            .filter(F.col("fr") <= n_probe - 1)
            .select(
                "query_id",
                "qvec",
                F.expr("bucket ^ shiftleft(CAST(1 AS BIGINT), plane)").alias("bucket"),
            )
        )
        queries = queries.unionByName(flips)
    scored = (
        F.broadcast(queries)
        .join(_cap_buckets(bucketed, max_bucket), "bucket")
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("cos", cosine(F.col("qvec"), F.col("vec"), dims))
    )
    if n_probe > 1:
        # multi-probe can surface the same neighbor through two buckets
        scored = scored.dropDuplicates(["query_id", "vec_id"])
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            F.col("vec_id").alias("neighbor_id"),
            _sim_round(F.col("cos")).alias("cos_sim"),
        )
        # q x k rows — bounded output (tables.bounded_sort)
        .transform(lambda d: _bounded_sort(d, "query_id", "rank"))
    )


def cosine_neardup_pairs(
    emb: DataFrame,
    threshold: float = 0.99,
    n_planes: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket: int | None = 10_000,
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, LSH-blocked.

    Near-identical vectors land in the same bucket with probability
    (1 - theta/pi)^planes ~ 1 for theta -> 0, so blocking loses only
    borderline pairs — the standard recall/cost trade.  Scale guards on
    by default: 16 planes (65,536 buckets) and a ``max_bucket`` cap —
    the SELF-join here is the most quadratic-prone consumer of a hot
    bucket (see _cap_buckets); small corpora pass n_planes=8."""
    from hedera_etl_spark.tables import ensure_parallelism

    signs = hyperplane_signs(n_planes, dims)
    bucketed = _cap_buckets(
        ensure_parallelism(emb).select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("vec"),
            lsh_bucket_col(vec_col, signs).alias("bucket"),
        ),
        max_bucket,
    )
    left = bucketed.select(
        F.col("vec_id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket"
    )
    right = bucketed.select(
        F.col("vec_id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket"
    )
    return (
        left.join(right, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        # FOLD form on purpose (r14): the threshold filter below gets
        # pushed into the join CONDITION, and join-condition codegen
        # cannot method-split — the unrolled 64-dim cosine blows janino's
        # 64 KB limit there, paying an expensive failed compile and then
        # running interpreted anyway.  The fold is equally interpreted
        # but compiles the rest of the stage cleanly (bit-identical
        # values; see functions.dot).
        .withColumn("cos", cosine(F.col("vec_a"), F.col("vec_b"), None))
        .filter(F.col("cos") >= threshold)
        .select(
            "id_a", "id_b", _sim_round(F.col("cos")).alias("cos_sim")
        )
        .orderBy("id_a", "id_b")
    )


def contrastive_mining(
    emb: DataFrame,
    query_ids: list[int],
    k_pos: int = 2,
    k_neg: int = 3,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
    n_planes: int | None = None,
    max_bucket: int | None = 10_000,
    cap_observations: dict | None = None,
) -> DataFrame:
    """Positive / hard-negative neighbor mining for contrastive training
    data: per query, the ``k_pos`` nearest SAME-label neighbors (the
    positives an InfoNCE/triplet batch pairs it with) and the ``k_neg``
    nearest DIFFERENT-label neighbors (the hard negatives — near in
    embedding space, wrong by label — that make the loss informative;
    random negatives are trivially separable).

    Returns ``(query_id, role, rank, neighbor_id, cos_sim)`` where
    ``role`` is ``'pos'`` / ``'neg'`` and rank is 1-based within
    (query, role), ties broken on neighbor id.  A NULL label never equals
    anything (engine-portable null semantics), so NULL-labeled neighbors
    — and every neighbor of a NULL-labeled query — mine as negatives.

    Two candidate modes, one scoring/ranking tail:

    - ``n_planes=None`` (exact): broadcast query set x one corpus scan —
      the recall=1.0 baseline, right when queries are few.
    - ``n_planes=p`` (scale path): candidates restricted to the query's
      LSH bucket — the join prunes the corpus to ~1/2^p per query, and
      bucketed candidates are BY CONSTRUCTION the near-in-space ones,
      i.e. exactly where hard negatives live.  ``max_bucket`` +
      ``cap_observations`` apply (see _cap_buckets); the far tail a
      bucket loses is soft negatives nobody mines anyway.

    Both modes rank with ONE window over (query, role): the per-role k
    filter is a row-level CASE, not a second exchange.
    """
    from pyspark.sql import Window as W

    from hedera_etl_spark.tables import ensure_parallelism

    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qvec"),
        F.col(label_col).alias("qlabel"),
    )
    if n_planes is None:
        # same spread rule as brute_force_topk (see _SPREAD_MIN_QUERIES):
        # a large query batch puts O(n*q*dims) fold math on the corpus
        # scan, so it must not ride a single-split parquet read
        corpus = (
            ensure_parallelism(emb)
            if len(query_ids) >= _SPREAD_MIN_QUERIES
            else emb
        )
        cands = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("nvec"),
            F.col(label_col).alias("nlabel"),
        )
        scored = F.broadcast(queries).crossJoin(cands)
    else:
        if dims is None:
            raise ValueError("bucketed mode needs dims for the hyperplanes")
        signs = hyperplane_signs(n_planes, dims)
        bucketed = _cap_buckets(
            ensure_parallelism(emb).select(
                F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("nvec"),
                F.col(label_col).alias("nlabel"),
                lsh_bucket_col(vec_col, signs).alias("bucket"),
            ),
            max_bucket,
            cap_observations,
            "contrastive_bucket_cap",
        )
        # queries keep their own bucket even when capped (join-side guard
        # only), mirroring lsh_ann_topk
        scored = F.broadcast(
            queries.withColumn("bucket", lsh_bucket_col("qvec", signs))
        ).join(bucketed, "bucket")
    scored = (
        scored.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "role",
            F.when(F.col("qlabel") == F.col("nlabel"), F.lit("pos")).otherwise(
                F.lit("neg")
            ),
        )
        .withColumn("cos", cosine(F.col("qvec"), F.col("nvec"), dims))
    )
    w = W.partitionBy("query_id", "role").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    k_for_role = F.when(F.col("role") == "pos", F.lit(k_pos)).otherwise(F.lit(k_neg))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k_for_role)
        .select(
            "query_id",
            "role",
            "rank",
            "neighbor_id",
            _sim_round(F.col("cos")).alias("cos_sim"),
        )
        # q x (k_pos + k_neg) rows — bounded output (tables.bounded_sort)
        .transform(lambda d: _bounded_sort(d, "query_id", "role", "rank"))
    )
