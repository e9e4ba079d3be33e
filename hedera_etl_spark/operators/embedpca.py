"""Embedding PCA: covariance + principal components + projection.

Dimension reduction is the standard pre-ANN step for embedding
columns (smaller index, faster dot products, ~same recall).  The
decomposition follows the engine's bounded-driver pattern (kmeans /
quality-LR / BPE).  Scale of d: the exact-decimal aggregate builds
d(d+1)/2 + d expressions — fine through d ~= 128 (8.3k expressions; the
repo's vector math already unrolls at this order), guarded loudly above
that.  Very-high-dim sources (768+) should arrive pre-sliced or use a
two-level blocked covariance (not implemented — raising beats silently
compiling a 300k-expression plan).  Stages:

1. :func:`covariance_matrix` — every pairwise covariance in ONE
   aggregate over the corpus.  Products of two float32 components are
   EXACT in float64 (24-bit mantissas -> 48-bit product < 53), each
   product then rounds once to DECIMAL(38,12) so the per-pair sums are
   exact and order-free — the repo's hashed-aggregate canon, which is
   what lets a DuckDB oracle hash-match a floating-point covariance.
   The d*(d+1)/2 + d aggregate expressions are built as ONE selectExpr
   string (SQL text is the cheapest way to ship thousands of columns
   through py4j).
2. :func:`pca_components` — collect the d x d matrix (one driver-sized
   row set), eigendecompose with numpy on the driver, return the top-k
   eigenvectors.  Driver state: d^2 doubles, never corpus rows.
3. :func:`pca_project` — project every vector onto the components with
   the unrolled dot-product machinery (whole-stage codegen, zero
   shuffle).

Scale: stage 1 is one map-side-combined aggregate (the only exchange
carries one row of d(d+1)/2 decimals); stages 2-3 are dimension-sized
and map-only respectively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


_MAX_DIMS = 128


def _sum_exprs(dims: int, vec_col: str) -> list[str]:
    """n, n_valid, per-dim decimal sums, per-pair decimal product sums
    (i <= j).  ``n_valid`` counts rows whose vector is non-null with at
    least ``dims`` elements — rows SUM would silently skip while
    COUNT(*) includes them, biasing every mean/cov with no error; the
    consumers compare the two and fail LOUDLY on mismatch."""
    if not 1 <= dims <= _MAX_DIMS:
        raise ValueError(
            f"dims must be in [1, {_MAX_DIMS}] (the exact-decimal "
            "aggregate is quadratic in dims; see the module docstring)"
        )
    exprs = [
        "CAST(COUNT(*) AS BIGINT) AS n",
        f"CAST(COUNT(CASE WHEN size({vec_col}) >= {dims} THEN 1 END)"
        " AS BIGINT) AS n_valid",
    ]
    for i in range(1, dims + 1):
        exprs.append(
            f"SUM(CAST(CAST(element_at({vec_col}, {i}) AS DOUBLE)"
            f" AS DECIMAL(38,12))) AS s_{i}"
        )
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            exprs.append(
                f"SUM(CAST(CAST(element_at({vec_col}, {i}) AS DOUBLE)"
                f" * CAST(element_at({vec_col}, {j}) AS DOUBLE)"
                f" AS DECIMAL(38,12))) AS p_{i}_{j}"
            )
    return exprs


def covariance_sums(
    emb: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """The one-row exact-sum aggregate: (n, s_i ..., p_i_j ...)."""
    from hedera_etl_spark.tables import ensure_parallelism

    return ensure_parallelism(emb).selectExpr(vec_col).selectExpr(
        *_sum_exprs(dims, vec_col)
    )


def covariance_matrix(
    emb: DataFrame, dims: int, vec_col: str = "embedding"
) -> DataFrame:
    """(i, j, cov) rows for i <= j — the population covariance
    cov = p_ij/n - (s_i/n)(s_j/n), derived from the exact decimal sums
    with three correctly-rounded double ops per cell (engine-portable:
    the oracle mirrors the same association)."""
    sums = covariance_sums(emb, dims, vec_col)
    cells = ", ".join(
        f"named_struct('i', {i}, 'j', {j}, 'cov',"
        f" CAST(CAST(p_{i}_{j} AS DOUBLE) / CAST(n AS DOUBLE)"
        f" - (CAST(s_{i} AS DOUBLE) / CAST(n AS DOUBLE))"
        f"   * (CAST(s_{j} AS DOUBLE) / CAST(n AS DOUBLE))"
        f" AS DECIMAL(38,12)) )"
        for i in range(1, dims + 1)
        for j in range(i, dims + 1)
    )
    # the guard rides INSIDE the output expression so column pruning can
    # never drop it: null/short vectors -> loud error, not biased stats
    return sums.selectExpr(
        "CASE WHEN n = n_valid THEN 1"
        " ELSE raise_error(concat('covariance_matrix: ', CAST(n - n_valid"
        " AS STRING), ' rows have null/short vectors — clean or filter"
        " them first')) END AS __ok",
        f"explode(array({cells})) AS c",
    ).selectExpr(
        "c.i AS i", "c.j AS j",
        "CAST(IF(__ok = 1, c.cov, NULL) AS DOUBLE) AS cov",
    )


def pca_components(
    emb: DataFrame, dims: int, k: int, vec_col: str = "embedding"
) -> tuple[list[list[float]], list[float]]:
    """Top-k principal components (rows, unit length, deterministic
    sign: largest-|coord| entry made positive) and their explained
    variances.  One corpus aggregate + a driver-side numpy ``eigh`` on
    the d x d matrix — the bounded-driver contract."""
    import numpy as np

    if not 1 <= k <= dims:
        raise ValueError("k must be in [1, dims]")
    row = covariance_sums(emb, dims, vec_col).collect()[0]
    n = row["n"]
    if n == 0:
        raise ValueError("cannot fit PCA on an empty corpus")
    if row["n_valid"] != n:
        raise ValueError(
            f"{n - row['n_valid']} of {n} rows have null/short vectors — "
            "SUM would silently skip them while COUNT(*) includes them, "
            "biasing every covariance; clean or filter them first"
        )
    mean = np.array([float(row[f"s_{i}"]) / n for i in range(1, dims + 1)])
    cov = np.empty((dims, dims))
    for i in range(1, dims + 1):
        for j in range(i, dims + 1):
            c = float(row[f"p_{i}_{j}"]) / n - mean[i - 1] * mean[j - 1]
            cov[i - 1][j - 1] = cov[j - 1][i - 1] = c
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for idx in order:
        v = vecs[:, idx]
        pivot = int(np.argmax(np.abs(v)))
        if v[pivot] < 0:  # deterministic sign convention
            v = -v
        comps.append([float(x) for x in v])
    return comps, [float(vals[i]) for i in order]


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "proj",
) -> DataFrame:
    """(id, proj array<double>): project onto the component rows — an
    unrolled literal-weight dot per component, whole-stage codegen,
    zero shuffle (the similarity-module vector-math discipline)."""
    from hedera_etl_spark.operators.similarity import _dots_array

    return emb.select(
        F.col(id_col),
        _dots_array(vec_col, components).alias(out_col),
    )
