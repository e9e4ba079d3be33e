"""Product quantization (PQ) for embedding-scale ANN — Jégou, Douze,
Schmid, "Product quantization for nearest neighbor search", TPAMI 2011.

Why this exists at 100 TB: raw float embeddings do not fit a serving
budget (768 dims x 4 bytes = 3 KB/vector; 100 TB of documents is
~10^11 vectors).  PQ splits each vector into ``m`` subvectors,
quantizes each against its own ``k``-entry codebook, and stores only
the m code ids (m bytes at k=256) — a 100-1000x compression — while
distances remain computable DIRECTLY ON THE CODES via asymmetric
distance computation (ADC): per query, per subspace, a k-entry lookup
table of exact subdistances, then a distance is m table lookups + m
adds instead of ``dims`` multiplies on floats that no longer exist.

Spark shapes:

- codebooks are ``m x k x (dims/m)`` doubles — a few KB, driver-side
  literals embedded in the plan (the ivf_centroids pattern), never a
  join;
- ENCODING is a zero-shuffle per-row projection (m in-row argmins over
  unrolled squared-distance arithmetic — whole-stage codegen);
- TRAINING is per-subspace Lloyd's: each iteration is ONE corpus scan
  ending in a sum/count aggregate of m*k*(dims/m) scalar rows (the
  ivf_train_kmeans shape) — driver state is the codebook matrix only;
- ADC top-k: the per-query lookup tables are computed ONCE on the
  broadcast query side, the code table is scanned (never shuffled),
  and ranking is a per-query window over candidates.

Float canon: every squared distance is a zero-seeded sequential left
fold (bit-identical to DuckDB ``list_reduce`` per functions.dot's
contract), argmin is first-match over exact doubles, and the reported
distance rounds once to DECIMAL(12,6) — so the PQ relation is
hash-checkable cross-engine with codebooks embedded as literals on
both sides.

Reference parity: the reference has no vector surface at all — this
extends the engine's beyond-reference similarity family
(operators/similarity.py, vectorindex.py).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def pq_codebooks(
    m: int, k: int, dims: int, tag: str = "pq", scale: float = 1.0
) -> list[list[list[float]]]:
    """Deterministic md5-derived codebooks in [-scale, scale]^(dims/m):
    ``codebooks[s][c]`` is subspace ``s``'s code ``c``.  Production
    training swaps these for ``pq_train_codebooks`` output; fixed
    codebooks keep encode/ADC bit-reproducible for the oracle (the
    ivf_centroids contract).  ``scale`` should roughly match the data's
    per-dimension range — codes far outside the data shell collapse
    the argmin onto a few cells."""
    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide into m ({m}) subspaces")
    sub = dims // m
    return [
        [
            [
                (
                    int(
                        hashlib.md5(f"{tag}:{s}:{c}:{d}".encode()).hexdigest()[:8],
                        16,
                    )
                    / 0xFFFFFFFF
                    * 2.0
                    - 1.0
                )
                * scale
                for d in range(sub)
            ]
            for c in range(k)
        ]
        for s in range(m)
    ]


def _sqdist_fold(vec_col, offset: int, code_lit, sub: int):
    """Zero-seeded left-fold squared L2 distance between
    ``vec[offset+1 .. offset+sub]`` and ``code_lit`` (an array<double>
    Column, usually one element of a nested array LITERAL).  Fold form,
    not unrolled: a full codebook unrolls to ~dims*k expression nodes,
    and plan/codegen/task-binary cost then dwarfs the arithmetic at
    bench row counts — the exact lesson similarity._dots_array records
    ("a 16-centroid unrolled array measured 21 s of plan time").  The
    zero-seeded left fold over the zipped products is bit-identical to
    the unrolled chain per functions.dot's accumulation contract, and
    to DuckDB's list_reduce twin."""
    return F.aggregate(
        F.zip_with(
            F.slice(vec_col, offset + 1, sub),
            code_lit,
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _lut_dists(vec_col, s: int, book, sub: int):
    """The k-entry subdistance list for subspace ``s`` — one nested
    literal + a transform (1-arg lambda: a 2-param lambda would be
    treated as (element, index) and the index would clobber the
    subspace binding)."""
    book_lit = F.lit([[float(v) for v in code] for code in book])
    return F.transform(
        book_lit, lambda code: _sqdist_fold(vec_col, s * sub, code, sub)
    )


def _code_cols(vec_col, codebooks):
    """Per-subspace 1-based argmin code ids (first-match tiebreak).
    Fold form ONLY, and measured to be the right call both ways: an
    unrolled-codegen twin was benchmarked at 200k x 64 dims and came
    out ~20% SLOWER — at dims*k ~ 1000 expression nodes the generated
    method blows past JIT/codegen limits and quietly degrades, while
    paying full plan/compile/task-binary cost (tools/pq_throughput.py,
    docs/PERF_NOTES.md r12)."""
    sub = len(codebooks[0][0])
    codes = []
    for s, book in enumerate(codebooks):
        dists = _lut_dists(vec_col, s, book, sub)
        codes.append(
            F.array_position(dists, F.array_min(dists)).cast("int")
        )
    return codes


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, codes) — each vector compressed to m 1-based code ids.
    Zero shuffle: m in-row argmins (fold form — see _code_cols for why
    the codegen twin measured slower).  ``codes`` is ``array<int>``;
    at k <= 256 a sink may pack it to m bytes."""
    from hedera_etl_spark.tables import ensure_parallelism

    vc = F.col(vec_col)
    return ensure_parallelism(emb).select(
        F.col(id_col).alias("vec_id"),
        F.array(*_code_cols(vc, codebooks)).alias("codes"),
    )


def pq_reconstruct(codes: list[int], codebooks) -> list[float]:
    """Driver-side decode of one code word (tests / spot checks)."""
    out: list[float] = []
    for s, c in enumerate(codes):
        out.extend(codebooks[s][c - 1])
    return out


def pq_train_codebooks(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    dims: int = 64,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_n: int = 2048,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd's k-means, all m subspaces per scan.

    Each iteration: assign every vector's m subvectors to their argmin
    codes IN-ROW (the encode kernel), posexplode the vector once to
    (subspace, code, in-subspace dim, value) scalar rows, and aggregate
    sum+count — a single shuffle of n*dims scalars with full map-side
    combine ending in m*k*(dims/m) rows; the driver collect is the
    codebook size regardless of corpus size (the ivf_train_kmeans
    shape).  Initialization is deterministic FARTHEST-FIRST (the
    max-min k-means++ variant) per subspace over a bounded md5-ordered
    sample: plain Forgy seeding collides — with k true clusters the
    chance k random rows hit k distinct clusters is k!/k^k (~0.2% at
    k=8), so merged cells dominate the quantization error regardless
    of Lloyd iterations (measured: ~20x the achievable error on
    cluster-structured data).  The sample collect is ``sample_n`` x
    dims doubles and the greedy runs driver-side — codebooks training
    on a bounded sample is the standard PQ practice (Jégou §V.A).
    Runs are repeatable given a fixed iteration count; exact float
    sums depend on partition order, which is why TRAINED codebooks
    feed rows-only / pytest checks while the fixed-grid path is the
    oracle twin (the ivf contract).  Empty cells keep their previous
    code (standard Lloyd's fallback)."""
    from hedera_etl_spark.tables import ensure_parallelism

    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide into m ({m}) subspaces")
    sub = dims // m
    corpus = ensure_parallelism(emb)
    sample = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .limit(max(int(sample_n), k))
        .select(F.col(vec_col).alias("__v"))
        .collect()
    )
    if len(sample) < k:
        raise ValueError(
            f"pq_train_codebooks: need >= k ({k}) vectors, got {len(sample)}"
        )
    n_bad = sum(
        1 for r in sample if r["__v"] is None or len(r["__v"]) < dims
    )
    if n_bad:
        raise ValueError(
            f"pq_train_codebooks: {n_bad} of {len(sample)} sampled vectors "
            f"are null or shorter than dims={dims} — clean or filter them "
            "first (same n_valid guard as covariance_matrix)"
        )
    sm = [[float(x) for x in r["__v"][:dims]] for r in sample]
    books = []
    for s in range(m):
        pts = [v[s * sub : (s + 1) * sub] for v in sm]
        chosen = [0]  # md5-min row starts the traversal
        dmin = [
            sum((a - b) ** 2 for a, b in zip(p, pts[0])) for p in pts
        ]
        while len(chosen) < k:
            nxt = max(range(len(pts)), key=lambda i: (dmin[i], -i))
            chosen.append(nxt)
            for i, p in enumerate(pts):
                d2 = sum((a - b) ** 2 for a, b in zip(p, pts[nxt]))
                if d2 < dmin[i]:
                    dmin[i] = d2
        books.append([list(pts[c]) for c in chosen])
    for _ in range(iters):
        books = _lloyd_step(corpus, books, sub, vec_col)
    return books


def _lloyd_step(corpus: DataFrame, books, sub: int, vec_col: str):
    """One Lloyd iteration over every subspace: in-row assignment, one
    scalar-row aggregate to m*k*sub cells, driver-side mean update
    (empty cells keep their previous code)."""
    m, k = len(books), len(books[0])
    codes = F.array(*_code_cols(F.col(vec_col), books))
    assigned = corpus.select(
        codes.alias("__codes"), F.posexplode(vec_col).alias("gd", "x")
    ).select(
        (F.col("gd") / sub).cast("int").alias("s"),
        F.element_at(
            F.col("__codes"), (F.col("gd") / sub).cast("int") + 1
        ).alias("c"),
        (F.col("gd") % sub).alias("d"),
        "x",
    )
    stats = (
        assigned.groupBy("s", "c", "d")
        .agg(F.sum("x").alias("sum"), F.count("*").alias("n"))
        .collect()
    )
    sums: dict[tuple[int, int], list[float]] = {}
    counts: dict[tuple[int, int], int] = {}
    for r in stats:
        key = (int(r["s"]), int(r["c"]) - 1)
        sums.setdefault(key, [0.0] * sub)[int(r["d"])] = float(r["sum"])
        counts[key] = int(r["n"])
    return [
        [
            [v / counts[(s, c)] for v in sums[(s, c)]]
            if counts.get((s, c))
            else books[s][c]
            for c in range(k)
        ]
        for s in range(m)
    ]


def pq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_neighbors: int = 5,
    m: int = 8,
    n_codes: int = 16,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k by ADC over PQ codes: (query_id, rank,
    neighbor_id, adc_dist) — ``adc_dist`` is the squared-L2 distance
    between the query and the neighbor's RECONSTRUCTION, rounded once
    to DECIMAL(12,6) and cast back to DOUBLE.

    The compressed-scan plan: queries (with their full vectors) are a
    broadcast dimension carrying a per-query m x k lookup table of
    exact subdistances computed ONCE on the build side; the corpus
    contributes only its code table (``codes_df`` if the caller
    pre-encoded — the persisted-index path — else encoded in the same
    scan).  Each candidate distance is m array lookups + m adds; no
    float vector is touched after encode.  Ranking is a per-query
    window (asc distance, neighbor-id tiebreak), query count is small
    by contract.

    Geometry comes from ``codebooks`` when given (``m``/``n_codes``
    are defaults for building a grid, never trusted over an explicit
    codebook — a caller-trained book with a different subspace split
    must not silently shift the lookup offsets); ``dims`` must equal
    the book's m * (dims/m) coverage."""
    if k_neighbors < 1:
        raise ValueError(f"k_neighbors must be >= 1, got {k_neighbors!r}")
    if codebooks is None:
        codebooks = pq_codebooks(m, n_codes, dims)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if m * sub != dims:
        raise ValueError(
            f"codebooks cover {m} x {sub} = {m * sub} dims, expected {dims}"
        )
    if codes_df is None:
        codes_df = pq_encode(emb, codebooks, id_col, vec_col)
    queries = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    lut = F.array(
        *[_lut_dists(F.col("qvec"), s, book, sub) for s, book in enumerate(codebooks)]
    )
    qside = queries.select("query_id", lut.alias("__lut"))
    acc = F.lit(0.0)
    for s in range(len(codebooks)):
        acc = acc + F.element_at(
            F.element_at("__lut", s + 1), F.element_at("codes", s + 1)
        )
    scored = (
        codes_df.join(
            F.broadcast(qside),
            F.col("vec_id") != F.col("query_id"),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            acc.cast("decimal(12,6)").alias("__d"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("__d").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.col("__d").cast("double").alias("adc_dist"),
        )
        .orderBy("query_id", "rank")
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids: list[int],
    k_neighbors: int = 5,
    n_centroids: int = 16,
    n_probe: int = 2,
    dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
    m: int = 8,
    n_codes: int = 16,
) -> DataFrame:
    """IVF-PQ approximate top-k (Jégou et al. §V) — the two compressions
    composed: the coarse quantizer prunes WHICH vectors are scored
    (queries probe ``n_probe`` of ``n_centroids`` inverted lists), PQ
    codes shrink WHAT a score reads (m table lookups per candidate).
    At 10^11 vectors this is the difference between scanning 300 TB of
    floats and ~n_probe/n_centroids of an ~800 GB code table.

    One corpus pass computes bucket AND codes in the same zero-shuffle
    projection; queries broadcast with their probe lists and ADC
    lookup tables; candidates = probed lists only (a broadcast-join
    filter, never all-pairs); ranking is a per-query window.  Output:
    (query_id, rank, neighbor_id, adc_dist) — same contract as
    ``pq_adc_topk``, recall traded along BOTH axes (n_probe for the
    coarse stage, k/m for the code resolution).

    Deterministic md5 centroids/codebooks by default (the oracle
    contract); pass trained ones for production recall."""
    from hedera_etl_spark.operators.similarity import (
        _dots_array,
        ivf_centroids,
    )
    from hedera_etl_spark.tables import ensure_parallelism

    if k_neighbors < 1:
        raise ValueError(f"k_neighbors must be >= 1, got {k_neighbors!r}")
    if centroids is None:
        centroids = ivf_centroids(n_centroids, dims)
    if codebooks is None:
        codebooks = pq_codebooks(m, n_codes, dims)
    m = len(codebooks)
    sub = len(codebooks[0][0])
    if m * sub != dims:
        raise ValueError(
            f"codebooks cover {m} x {sub} = {m * sub} dims, expected {dims}"
        )
    vc = F.col(vec_col)
    dots = _dots_array(vec_col, centroids)
    corpus = ensure_parallelism(emb).select(
        F.col(id_col).alias("vec_id"),
        F.array_position(dots, F.array_max(dots)).alias("bucket"),
        F.array(*_code_cols(vc, codebooks)).alias("codes"),
    )
    qbase = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    qdots = _dots_array("qvec", centroids)
    probe_buckets = F.slice(
        F.array_sort(
            F.transform(
                qdots, lambda d, i: F.struct((-d).alias("nd"), i.alias("i"))
            )
        ),
        1,
        n_probe,
    )
    lut = F.array(
        *[_lut_dists(F.col("qvec"), s, book, sub) for s, book in enumerate(codebooks)]
    )
    qside = qbase.select(
        "query_id",
        lut.alias("__lut"),
        F.explode(
            F.transform(probe_buckets, lambda st: (st["i"] + 1).cast("long"))
        ).alias("bucket"),
    )
    acc = F.lit(0.0)
    for s in range(m):
        acc = acc + F.element_at(
            F.element_at("__lut", s + 1), F.element_at("codes", s + 1)
        )
    scored = (
        corpus.join(F.broadcast(qside), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            acc.cast("decimal(12,6)").alias("__d"),
        )
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("__d").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k_neighbors)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.col("__d").cast("double").alias("adc_dist"),
        )
        .orderBy("query_id", "rank")
    )


def rotate_vectors(
    emb: DataFrame,
    rotation: list[list[float]],
    vec_col: str = "embedding",
    out_col: str | None = None,
) -> DataFrame:
    """x' = x·R as a zero-shuffle per-row projection: the d x d matrix
    enters the plan as ONE nested-array literal (column-major), each
    output coordinate is a zero-seeded fold dot — the same
    literal+fold shape as the PQ kernels.  ``out_col=None`` replaces
    ``vec_col`` in place; otherwise the rotated vector is added and
    the original kept (the OPQ training loop needs both)."""
    d = len(rotation)
    cols_lit = F.lit(
        [[float(rotation[i][j]) for i in range(d)] for j in range(d)]
    )
    vc = F.col(vec_col)
    rotated = F.transform(
        cols_lit,
        lambda col: F.aggregate(
            F.zip_with(vc, col, lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    if out_col is None:
        return emb.withColumn(vec_col, rotated)
    return emb.withColumn(out_col, rotated)


def opq_train(
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    dims: int = 64,
    iters: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "eig",
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Optimized product quantization (Ge, He, Ke, Sun, CVPR 2013,
    non-parametric solution): learn an ORTHOGONAL rotation R alongside
    the codebooks so the subspace split aligns with the data's
    correlation structure — plain PQ quantizes each subspace
    independently and pays dearly when variance straddles subspace
    boundaries; OPQ rotates it back into the blocks.

    Alternation, each outer iteration = two bounded-aggregate scans:
    (1) one Lloyd step on the rotated corpus (the pq_train kernel);
    (2) the Procrustes update R <- U V' from the SVD of C = X'·Y
        (original-by-reconstruction cross matrix).  C never
        materializes row-wise: reconstructions take only m*k distinct
        values per subspace, so C = sum_s A_s'·B_s where A_s[c] is the
        d-vector sum of ORIGINAL x over rows whose subspace-s code is
        c — an m*k*d-cell aggregate (the _lloyd_step shape, x m), and
        the d x d assembly + SVD are driver-side numpy on
        codebook-sized state.

    ``init="eig"`` is the PARAMETRIC solution (Ge et al. §4.2):
    columns of R are PCA eigenvectors with eigenvalue ALLOCATION —
    greedy balancing of log-variance products across the m subspaces —
    the paper's recommended start for real (anisotropic, roughly
    Gaussian) embedding distributions; it costs one covariance
    aggregate (embedpca.covariance_sums) + a driver-side eigh.
    ``init="identity"`` skips that; on cluster-MIXTURE data whose
    covariance is near-isotropic the eigenbasis carries no signal and
    identity measured slightly better, so neither dominates — both are
    deterministic, pick per corpus.  Either way the NP alternation
    improves monotonically but solves a hard non-convex problem: on
    an adversarially rotated cluster mixture it recovers a 2x+
    distortion cut over plain PQ rather than the full oracle rotation
    (consistent with the paper's hard cases).

    Returns ``(rotation, codebooks)`` for ``opq_encode`` /
    ``opq_adc_topk``.  Trained path: rows-only / pytest-pinned (float
    sums are partition-order dependent — the pq_train contract)."""
    import math

    import numpy as np

    from hedera_etl_spark.tables import ensure_parallelism

    if dims % m != 0:
        raise ValueError(f"dims ({dims}) must divide into m ({m}) subspaces")
    sub = dims // m
    corpus = ensure_parallelism(emb).localCheckpoint(eager=False)
    if init == "eig":
        from hedera_etl_spark.operators.embedpca import pca_components

        comps, variances = pca_components(corpus, dims, dims, vec_col)
        order = sorted(range(dims), key=lambda i: -variances[i])
        buckets: list[list[int]] = [[] for _ in range(m)]
        logprod = [0.0] * m
        for idx in order:
            open_b = [b for b in range(m) if len(buckets[b]) < sub]
            b = min(open_b, key=lambda bb: logprod[bb])
            buckets[b].append(idx)
            logprod[b] += math.log(max(variances[idx], 1e-12))
        cols = [comps[idx] for bs in buckets for idx in bs]
        # x' = x R with R's columns the allocated eigenvectors
        rot = np.array(cols).T
    elif init == "identity":
        rot = np.eye(dims)
    else:
        raise ValueError(f"unknown init: {init!r}")
    books = None
    for _ in range(iters):
        frame = rotate_vectors(corpus, rot.tolist(), vec_col, out_col="__rot")
        if books is None:
            books = pq_train_codebooks(
                frame.select(F.col(id_col), F.col("__rot").alias(vec_col)),
                m=m, k=k, dims=dims, iters=1,
                vec_col=vec_col, id_col=id_col,
            )
        else:
            books = _lloyd_step(
                frame.select(F.col("__rot").alias(vec_col)),
                books, sub, vec_col,
            )
        codes = F.array(*_code_cols(F.col("__rot"), books))
        assigned = (
            frame.select(codes.alias("__codes"), F.posexplode(vec_col).alias("i", "xi"))
            .select(
                F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
                F.col("__codes"),
                "i",
                "xi",
            )
            .select(
                "s",
                F.element_at(F.col("__codes"), F.col("s") + 1).alias("c"),
                "i",
                "xi",
            )
        )
        stats = (
            assigned.groupBy("s", "c", "i")
            .agg(F.sum("xi").alias("sx"))
            .collect()
        )
        a_mats = [np.zeros((k, dims)) for _ in range(m)]
        for r in stats:
            a_mats[int(r["s"])][int(r["c"]) - 1][int(r["i"])] = float(r["sx"])
        c_mat = np.zeros((dims, dims))
        for s in range(m):
            b_s = np.array(books[s])  # k x sub
            c_mat[:, s * sub : (s + 1) * sub] = a_mats[s].T @ b_s
        u, _, vt = np.linalg.svd(c_mat)
        rot = u @ vt
    return rot.tolist(), books


def opq_encode(
    emb: DataFrame,
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ-encode in the learned rotated space — still one zero-shuffle
    per-row projection (rotation fold + argmin folds fuse in the same
    stage)."""
    return pq_encode(
        rotate_vectors(emb, rotation, vec_col), codebooks, id_col, vec_col
    )


def opq_adc_topk(
    emb: DataFrame,
    query_ids: list[int],
    rotation: list[list[float]],
    codebooks: list[list[list[float]]],
    k_neighbors: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes_df: DataFrame | None = None,
) -> DataFrame:
    """ADC top-k in the learned rotated space: R is orthogonal, so
    rotated distances ARE original distances up to quantization error —
    which is exactly what OPQ shrinks."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    return pq_adc_topk(
        rotate_vectors(emb, rotation, vec_col),
        query_ids,
        k_neighbors=k_neighbors,
        m=m,
        n_codes=len(codebooks[0]),
        dims=m * sub,
        id_col=id_col,
        vec_col=vec_col,
        codebooks=codebooks,
        codes_df=codes_df,
    )


class PQIndex:
    """Persisted PQ code table — the servable compressed-ANN artifact
    (the PQ analogue of vectorindex.IVFIndex).

    Layout::

        path/_meta.json        {"dims", "m", "k", "rotation": R | null}
        path/codebooks.json    m x k x (dims/m) doubles
        path/codes/batch-<id>/ (vec_id, codes) parquet, rename-committed

    Storage is the CODES ONLY (~m ints/vector vs dims floats — the
    whole point); raw vectors are never written.  Appends are
    write-once per content-derived batch id (order-free bit_xor of
    xxhash64(vec_id, codes)), so job retries are idempotent without
    caller bookkeeping; the publish is one rename
    (fsutil.stage/publish) and a crash between encode and publish
    leaves only an invisible staging dir the next open sweeps.  The
    only driver-side state is the codebook matrix (+ optional OPQ
    rotation) — bounded at any corpus size.
    """

    def __init__(self, spark, path: str):
        import json
        import os

        from hedera_etl_spark.fsutil import heal

        # a rebuild_codebooks() crash between its two renames leaves the
        # live dir missing and the old sibling present — self-repair on
        # open, same rule as every other table-commit path
        heal(path)
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_meta.json")) as fh:
            meta = json.load(fh)
        self.dims = int(meta["dims"])
        self.m = int(meta["m"])
        self.k = int(meta["k"])
        self.rotation = meta.get("rotation")
        #: Spark type of the stored vec_id column (simpleString form).
        #: Recorded at build time (when vectors are given) or on first
        #: append, so the empty-codes schema and every later batch agree
        #: even for string/binary-keyed indexes.
        self.id_type = meta.get("id_type")
        with open(os.path.join(path, "codebooks.json")) as fh:
            self.codebooks = json.load(fh)
        from hedera_etl_spark.fsutil import sweep_staging

        sweep_staging(os.path.join(path, "codes"))

    # -- construction -------------------------------------------------
    @staticmethod
    def build(
        spark,
        path: str,
        emb: DataFrame | None,
        m: int = 8,
        k: int = 16,
        dims: int = 64,
        codebooks: list[list[list[float]]] | None = None,
        rotation: list[list[float]] | None = None,
        train: bool = False,
        train_iters: int = 4,
        opq: bool = False,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        scale: float = 1.0,
    ) -> "PQIndex":
        """Create the index.  Codebooks come from (in precedence
        order): the ``codebooks`` argument, OPQ training
        (``opq=True`` — learns ``rotation`` too), plain PQ training
        (``train=True``), else the deterministic md5 grid at
        ``scale``.  ``emb=None`` creates an EMPTY index for
        append-later flows (requires explicit codebooks or the grid)."""
        import json
        import os

        if codebooks is None:
            if opq:
                if emb is None:
                    raise ValueError("opq=True requires emb to train on")
                rotation, codebooks = opq_train(
                    emb, m=m, k=k, dims=dims, iters=train_iters,
                    vec_col=vec_col, id_col=id_col,
                )
            elif train:
                if emb is None:
                    raise ValueError("train=True requires emb to train on")
                codebooks = pq_train_codebooks(
                    emb, m=m, k=k, dims=dims, iters=train_iters,
                    vec_col=vec_col, id_col=id_col,
                )
            else:
                codebooks = pq_codebooks(m, k, dims, scale=scale)
        m = len(codebooks)
        sub = len(codebooks[0][0])
        if m * sub != dims:
            raise ValueError(
                f"codebooks cover {m} x {sub} = {m * sub} dims, expected {dims}"
            )
        k = len(codebooks[0])
        os.makedirs(os.path.join(path, "codes"), exist_ok=True)
        with open(os.path.join(path, "codebooks.json"), "w") as fh:
            json.dump(codebooks, fh)
        meta = {"dims": dims, "m": m, "k": k, "rotation": rotation}
        if emb is not None:
            meta["id_type"] = emb.schema[id_col].dataType.simpleString()
        with open(os.path.join(path, "_meta.json"), "w") as fh:
            json.dump(meta, fh)
        idx = PQIndex(spark, path)
        if emb is not None:
            idx.add_vectors(emb, id_col=id_col, vec_col=vec_col)
        return idx

    # -- append -------------------------------------------------------
    def _encode(self, emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
        src = (
            rotate_vectors(emb, self.rotation, vec_col)
            if self.rotation is not None
            else emb
        )
        return pq_encode(src, self.codebooks, id_col, vec_col)

    def add_vectors(
        self,
        emb: DataFrame,
        batch_id: str | None = None,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> bool:
        """Encode and append one batch; returns False when the batch id
        (given, or content-derived from the CODES so re-encoding with
        changed codebooks lands instead of being skipped) is already
        committed — the write-once retry contract."""
        import os

        from hedera_etl_spark.fsutil import (
            publish_batch_dir,
            stage_batch_dir,
        )

        codes = self._encode(emb, id_col, vec_col).localCheckpoint(
            eager=False
        )
        # pin the id type: first append records it in _meta.json; later
        # appends must agree, else codes() unions would silently produce
        # a mixed-type column (loud error instead).
        batch_id_type = codes.schema["vec_id"].dataType.simpleString()
        if self.id_type is None:
            self._record_id_type(batch_id_type)
        elif batch_id_type != self.id_type:
            raise ValueError(
                f"PQIndex at {self.path} stores vec_id as {self.id_type}; "
                f"this batch's {id_col} is {batch_id_type} — cast the id "
                "column to match the index"
            )
        if batch_id is None:
            row = codes.agg(
                F.coalesce(
                    F.expr("bit_xor(xxhash64(vec_id, codes))"), F.lit(0)
                ).alias("sig"),
                F.count("*").alias("n"),
            ).collect()[0]
            batch_id = f"{row['n']}-{row['sig'] & ((1 << 63) - 1):x}"
        entry = f"batch-{batch_id}"
        root = os.path.join(self.path, "codes")
        if os.path.exists(os.path.join(root, entry)):
            return False
        staged = stage_batch_dir(root, entry, codes)
        publish_batch_dir(root, entry, staged)
        return True

    def _record_id_type(self, id_type: str) -> None:
        import json
        import os

        meta_path = os.path.join(self.path, "_meta.json")
        with open(meta_path) as fh:
            meta = json.load(fh)
        meta["id_type"] = id_type
        # tmp + atomic rename (the fsutil single-rename discipline): an
        # in-place rewrite crashing mid-write would leave the index
        # permanently unopenable (__init__ json.load fails) — every
        # other commit path here is rename-based and heal-able.
        tmp_path = meta_path + ".tmp"
        with open(tmp_path, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp_path, meta_path)
        self.id_type = id_type

    # -- read / query ---------------------------------------------------
    def codes(self) -> DataFrame:
        import os

        root = os.path.join(self.path, "codes")
        dirs = [
            os.path.join(root, d)
            for d in sorted(os.listdir(root))
            if d.startswith("batch-")
        ]
        if not dirs:
            # empty path mirrors the recorded id type so a string- or
            # binary-keyed index agrees with later-appended batches and
            # with topk's join even before the first append
            return self.spark.createDataFrame(
                [], f"vec_id {self.id_type or 'long'}, codes array<int>"
            )
        return self.spark.read.parquet(*dirs)

    def topk(
        self,
        queries: DataFrame,
        query_ids: list[int],
        k_neighbors: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ADC top-k of ``query_ids`` (rows of ``queries``, which must
        carry full vectors) against the PERSISTED code table — the
        serve path: the corpus is never re-read, only its codes."""
        src = (
            rotate_vectors(queries, self.rotation, vec_col)
            if self.rotation is not None
            else queries
        )
        return pq_adc_topk(
            src,
            query_ids,
            k_neighbors=k_neighbors,
            dims=self.dims,
            id_col=id_col,
            vec_col=vec_col,
            codebooks=self.codebooks,
            codes_df=self.codes(),
        )

    # -- maintenance ----------------------------------------------------
    def recall_probe(
        self,
        emb: DataFrame,
        query_ids: list,
        k_neighbors: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """Sampled exact-vs-ADC overlap@k PER CODE BATCH — the drift
        detector for frozen codebooks: codebooks are trained once at
        build time, so a corpus whose distribution moves (new domains,
        new embedding model epoch) silently degrades ADC recall on the
        batches it lands in.  This report makes the decay measurable
        per batch, so the operator knows WHEN ``rebuild_codebooks`` is
        due and which appends drifted.

        ``emb`` supplies raw vectors for the sampled ids (the index
        stores codes only); ``query_ids`` are the probe sample.  For
        each batch: ADC top-k restricted to that batch's codes vs the
        exact squared-L2 top-k over the same candidate set, overlap =
        |intersection| / k.  Returns (batch_id, query_id, overlap)
        ordered, plus the candidate counts — the per-batch mean is one
        groupBy away.  The loop is driver-side over BATCH DIRECTORIES
        (a maintenance-run dimension, not a data dimension); per batch
        the work is two bounded top-k jobs."""
        import os

        root = os.path.join(self.path, "codes")
        batches = sorted(
            d for d in os.listdir(root) if d.startswith("batch-")
        )
        queries = (
            emb.filter(F.col(id_col).isin(list(query_ids)))
            .select(
                F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
            )
        )
        rows = []
        for b in batches:
            codes_b = self.spark.read.parquet(os.path.join(root, b))
            src = (
                rotate_vectors(emb, self.rotation, vec_col)
                if self.rotation is not None
                else emb
            )
            adc = pq_adc_topk(
                src, list(query_ids), k_neighbors=k_neighbors,
                dims=self.dims, id_col=id_col, vec_col=vec_col,
                codebooks=self.codebooks, codes_df=codes_b,
            )
            adc_ids: dict = {}
            for r in adc.collect():
                adc_ids.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"]
                )
            # exact squared-L2 ranking over the SAME candidate set, in
            # the original space (rotation is orthogonal: L2 invariant)
            cand = emb.join(
                codes_b.select(F.col("vec_id").alias(id_col)).distinct(),
                on=id_col, how="left_semi",
            )
            d2 = F.aggregate(
                F.zip_with(
                    F.col("__q"), F.col(vec_col),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            from pyspark.sql import Window

            scored = (
                cand.crossJoin(F.broadcast(queries))
                .filter(F.col(id_col) != F.col("query_id"))
                .select(
                    "query_id", F.col(id_col).alias("neighbor_id"),
                    d2.alias("__d2"),
                )
            )
            w = Window.partitionBy("query_id").orderBy(
                "__d2", "neighbor_id"
            )
            exact = scored.select(
                "query_id", "neighbor_id", F.row_number().over(w).alias("r")
            ).filter(F.col("r") <= k_neighbors)
            exact_ids: dict = {}
            for r in exact.collect():
                exact_ids.setdefault(r["query_id"], set()).add(
                    r["neighbor_id"]
                )
            for qid in sorted(exact_ids):
                ex = exact_ids[qid]
                got = adc_ids.get(qid, set())
                rows.append(
                    (b.removeprefix("batch-"), str(qid),
                     len(ex), float(len(ex & got)) / max(len(ex), 1))
                )
        # query_id reported as string so string/binary-keyed indexes
        # share the report schema
        return self.spark.createDataFrame(
            rows,
            "batch_id string, query_id string, n_exact int, overlap double",
        ).orderBy("batch_id", "query_id")

    def rebuild_codebooks(
        self,
        emb: DataFrame,
        train_iters: int = 4,
        opq: bool = False,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "PQIndex":
        """Retrain codebooks on the CURRENT corpus and re-encode it, in
        ONE crash-safe move-aside swap (fsutil.atomic_replace — the
        compact_partitions protocol): at every instant a reader opening
        the path sees the complete old index or the complete new one,
        never new codebooks over stale codes (which would silently
        corrupt every ADC distance).  A crash between the two renames
        self-repairs on the next open (``heal`` in ``__init__``).

        ``emb`` is the current raw corpus (the index stores codes only,
        so history cannot re-encode itself) — the same maintenance
        contract as a compaction reading its own table."""
        from hedera_etl_spark.fsutil import atomic_replace

        def write_fn(tmp: str) -> None:
            PQIndex.build(
                self.spark, tmp, emb, m=self.m, k=self.k, dims=self.dims,
                train=not opq, opq=opq, train_iters=train_iters,
                id_col=id_col, vec_col=vec_col,
            )

        atomic_replace(self.path, write_fn)
        return PQIndex(self.spark, self.path)
