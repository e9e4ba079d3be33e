"""Engine column functions shared across operators.

Everything here is built from JVM-side built-ins (`pyspark.sql.functions`) so
expressions stay inside whole-stage codegen — no Python UDFs in these paths.

Cross-engine determinism: several operators (minhash, simhash, LSH) need a
hash function that the DuckDB oracle can reproduce bit-for-bit.  Spark's
`hash()` is murmur3 with Spark-specific seeding, DuckDB's `hash()` is its own
— so every hashed operator derives its values from `md5()` hex digests,
which are standardized and available in both engines (minhash parses two
32-bit halves for its Kirsch-Mitzenmacher family, simhash reads nibble
high bits — both inline in operators/textdedup.py with their DuckDB twins
in queries/_oracle.py).

Array math (embeddings): folds are explicitly sequential (`F.aggregate` is a
left fold) so floating-point results are reproducible and identical to a
sequential fold in any other engine — a parallel SUM over doubles would not be.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# tokenization / shingling
# ---------------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space split, matching the oracle)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def shingles(tokens_col: Column, n: int = 3) -> Column:
    """Array of n-token shingles joined by spaces.

    Pure expression (transform over an index sequence) — stays in codegen.
    Documents shorter than ``n`` tokens yield an empty array.

    Precondition: the token array must contain NO NULL elements.  The
    indexed-concat form propagates a NULL token into a NULL shingle
    (``concat`` is null-propagating), whereas the pre-r5
    ``array_join(slice(...))`` form silently skipped nulls (ADVICE r5).
    ``split()`` output — every caller in this engine — can never contain
    nulls, so the engine's own paths are unaffected; callers handing in a
    hand-built token array must ``filter(x -> x IS NOT NULL)`` first if
    null-skipping semantics are wanted.

    IMPORTANT: pass a *projected column* (e.g. ``F.col("toks")`` after a
    ``select(split(...).alias("toks"))``), never the split expression
    itself — Catalyst inlines a passed expression into every lambda
    reference, re-tokenizing the document once per shingle (observed 10x
    slowdown).  Each shingle is a concat of n INDEXED elements rather
    than array_join(slice(...)) — identical strings, ~40% faster (no
    intermediate array per shingle; see textdedup.shingle_sets).
    """
    def one_shingle(i):
        parts = []
        for j in range(n):
            if parts:
                parts.append(F.lit(" "))
            parts.append(F.element_at(tokens_col, i + j))
        return F.concat(*parts)

    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
            one_shingle,
        )
    )


# ---------------------------------------------------------------------------
# embedding math (sequential folds — reproducible floating point)
# ---------------------------------------------------------------------------


#: Above this many dimensions the unrolled expression tree stops paying:
#: Catalyst optimization and codegen-compile time grow with node count
#: while the interpreted fold's per-element cost is flat.  256 doubles is
#: ~1k expression nodes per dot — comfortably inside codegen's method-split
#: limits; beyond it, keep the fold.
UNROLL_MAX_DIMS = 256


def dot(a: Column, b: Column, dims: int | None = None) -> Column:
    """Dot product of two float arrays, in double.

    ``dims=None``: sequential left fold (``F.aggregate`` over ``zip_with``
    products) — works for any length, but higher-order functions evaluate
    INTERPRETED, outside whole-stage codegen (~100 ns/element).

    ``dims=N`` (caller guarantees both arrays have exactly N elements —
    the embedding-table contract): the identical sum unrolled into a flat
    ``0.0 + a[1]*b[1] + ... + a[N]*b[N]`` expression chain, which compiles
    into whole-stage codegen as straight-line JVM arithmetic (measured
    ~10x on the 64-dim bench corpus).  Bit-identical to the fold: same
    left-to-right accumulation order, same ``0.0`` seed, and an array
    shorter than N null-poisons the sum exactly as ``zip_with``'s null
    padding does.

    Use unrolling ONLY for expressions that appear ONCE per plan (the
    per-pair scoring cosine).  Composing unrolled dots into wide arrays
    (an LSH sign matrix, a centroid grid) multiplies the expression-tree
    size by the fan-out and Catalyst's plan-time blows up super-linearly:
    the 16-centroid IVF quantizer measured 21 s of driver-side planning
    unrolled vs 1.5 s as folds (similarity.lsh_bucket_col has the
    numbers).  Runtime per row barely differs at that width; plan time
    dominates.
    """
    if dims is None or dims > UNROLL_MAX_DIMS:
        prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
        return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
    acc: Column = F.lit(0.0)
    for i in range(1, dims + 1):
        acc = acc + F.element_at(a, i).cast("double") * F.element_at(b, i).cast("double")
    return acc


def norm(a: Column, dims: int | None = None) -> Column:
    """L2 norm of a float array, in double (fold / unrolled — see dot)."""
    if dims is None or dims > UNROLL_MAX_DIMS:
        return F.sqrt(
            F.aggregate(
                a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
            )
        )
    acc: Column = F.lit(0.0)
    for i in range(1, dims + 1):
        x = F.element_at(a, i).cast("double")
        acc = acc + x * x
    return F.sqrt(acc)


def cosine(a: Column, b: Column, dims: int | None = None) -> Column:
    """Cosine similarity, bit-reproducible (fold / unrolled — see dot)."""
    return dot(a, b, dims) / (norm(a, dims) * norm(b, dims))
