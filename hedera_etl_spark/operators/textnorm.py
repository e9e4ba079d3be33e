"""Unicode text normalization: the canonicalization pass that runs
BEFORE any text dedup — two byte-wise-different strings that render
identically ("Café" composed vs decomposed, fullwidth digits, ligature
ﬁ) must hash identically or every downstream exact/near-dup operator
under-merges.

Spark has no built-in Unicode normalizer, so NFC/NFKC runs as an
Arrow-batched pandas UDF (`unicodedata.normalize` vectorized over the
batch — the sanctioned Python path: never row-at-a-time, and the UDF
touches ONLY the text column; everything else in the projection stays
JVM-side).  The cheap cleanups that ARE expressible as built-ins stay
built-ins: whitespace collapse, control-character strip, optional
lowercasing — chained JVM regexp/lower expressions around the UDF, so
the Python surface is exactly one normalize call per batch.

Cross-engine determinism: Unicode normalization forms are fully
specified by the standard, so CPython's `unicodedata` (UCD) and
DuckDB's `nfc_normalize` agree byte-for-byte — the registry entry
hash-checks that claim on composed/decomposed mixes, which also makes
this the engine's oracle-gated SCALAR pandas-UDF exemplar (the
grouped-map and multimodal entries cover the other UDF shapes).

Scale: a pure per-row projection — zero shuffles, Arrow batches sized
by ``spark.sql.execution.arrow.maxRecordsPerBatch``; at 100 TB this is
scan-bound like any map-only stage.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _normalize_udf(form: str):
    import unicodedata

    @F.pandas_udf(T.StringType())
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x) if x is not None else None
        )

    return norm


def normalize_text(
    docs: DataFrame,
    form: str = "NFC",
    lowercase: bool = False,
    collapse_whitespace: bool = True,
    strip_controls: bool = True,
    text_col: str = "text",
) -> DataFrame:
    """Return ``docs`` with ``text_col`` Unicode-normalized in place.

    Order of operations (each optional step a JVM expression, only the
    normalization itself crossing into Python): strip C0/C1 control
    characters (keeping \\t \\n) -> normalize to ``form`` (NFC / NFKC /
    NFD / NFKD) -> optional lowercase -> collapse runs of whitespace to
    single spaces and trim.  Lowercasing happens AFTER normalization so
    compatibility forms fold first (the NFKC+casefold convention).
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(f"unknown normalization form: {form}")
    col = F.col(text_col)
    if strip_controls:
        col = F.regexp_replace(col, r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]", "")
    col = _normalize_udf(form)(col)
    if lowercase:
        col = F.lower(col)
    if collapse_whitespace:
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
    return docs.withColumn(text_col, col)
