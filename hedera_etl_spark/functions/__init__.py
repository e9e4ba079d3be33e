"""Engine column functions shared across operators.

Everything here is built from JVM-side built-ins (`pyspark.sql.functions`) so
expressions stay inside whole-stage codegen — no Python UDFs in these paths.

Cross-engine determinism: several operators (minhash, simhash, LSH) need a
hash function that the DuckDB oracle can reproduce bit-for-bit.  Spark's
`hash()` is murmur3 with Spark-specific seeding, DuckDB's `hash()` is its own
— so we derive hashes from `md5()` hex digests, which are standardized and
available in both engines:

- ``md5hex(col)``           the 32-char hex digest (lexicographic min over
                            fixed-length hex == numeric min, so minhash can
                            run on the strings directly)
- ``hex32(col)``            first 8 hex chars parsed as an unsigned 32-bit int
- ``md5bit(col, j)``        the j-th "nibble high bit": 1 if hex char j is in
                            [8-9a-f] — 32 cheap pseudo-random bits per value,
                            used by simhash without any hex->int parsing.

Array math (embeddings): folds are explicitly sequential (`F.aggregate` is a
left fold) so floating-point results are reproducible and identical to a
sequential fold in any other engine — a parallel SUM over doubles would not be.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# deterministic cross-engine hashing
# ---------------------------------------------------------------------------


def md5hex(col: Column | str) -> Column:
    """32-char md5 hex digest of a string column."""
    return F.md5(F.col(col) if isinstance(col, str) else col)


def hex32(col: Column | str) -> Column:
    """First 8 md5 hex chars as an unsigned 32-bit value in a LongType.

    DuckDB twin: ``('0x' || substring(md5(x), 1, 8))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def salted_md5(col: Column | str, salt: int | str) -> Column:
    """md5 of ``salt || ':' || value`` — an independent hash family member."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.concat(F.lit(str(salt)), F.lit(":"), c))


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

    IMPORTANT: pass a *projected column* (e.g. ``F.col("toks")`` after a
    ``select(split(...).alias("toks"))``), never the split expression
    itself — Catalyst inlines a passed expression into every lambda
    reference, re-tokenizing the document once per shingle (observed 10x
    slowdown).  One slice+join per shingle keeps the transform linear.
    """
    return F.when(
        F.size(tokens_col) < n, F.array().cast("array<string>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tokens_col) - F.lit(n - 1)),
            lambda i: F.array_join(F.slice(tokens_col, i, n), " "),
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
