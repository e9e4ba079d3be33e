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


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product of two float arrays, in double."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    """Sequential-fold L2 norm of a float array, in double."""
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity via sequential folds (bit-reproducible)."""
    return dot(a, b) / (norm(a) * norm(b))
