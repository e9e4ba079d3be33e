"""Paragraph-level dedup: remove duplicated paragraphs across the
corpus, keeping one canonical occurrence.

Document-level dedup (textdedup) and fixed-width span removal
(spandedup) bracket a third production stage: web corpora repeat whole
PARAGRAPHS — cookie banners, newsletter pitches, license blocks,
navigation — inside otherwise-distinct pages, and the published
web-scale pipelines (RefinedWeb/FineWeb-style curation) cut them at
paragraph granularity: a paragraph appearing in many documents keeps
exactly its first occurrence and disappears everywhere else, so the
boilerplate's one legitimate home survives.

Semantics: paragraphs are the ``sep``-separated blocks of ``text_col``
(default blank-line ``"\\n\\n"``, split LITERALLY — no regex).  A
paragraph's canonical occurrence is the corpus-wide minimum
(doc_id, paragraph_index) among exact content matches; every other
occurrence is deleted.  Paragraphs shorter than ``min_chars``
(default 1, i.e. empty strings from leading/trailing separators) are
EXEMPT — headers like "Introduction" recur legitimately, and deleting
empty blocks would silently reflow documents.  Documents whose every
paragraph is deleted drop entirely when ``drop_empty``.

Scale shape — paragraph TEXT never shuffles:

1. each document hashes its own paragraphs in-row (md5, the
   cross-engine canon) and explodes only (doc_id, idx, hash, length) —
   narrow rows, one map-side fan-out;
2. one hash aggregate per distinct paragraph hash finds the canonical
   (min (doc_id, idx)) occurrence and the occurrence count — the
   duplicated-paragraph dimension is the only shuffled data;
3. non-canonical occurrences reduce to a per-document sorted index
   list (one narrow shuffle keyed by doc_id, list bounded by the doc's
   own paragraph count);
4. the rebuild is a per-row array filter over the document's own
   split — the corpus text stays in its scan from start to finish
   (plan-pinned in tests/test_paradedup.py).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sql_str(s: str) -> str:
    """Single-quoted Spark-SQL string literal for ``s`` (backslash,
    quote, and control characters escaped — literal newlines inside an
    expr string are parser-hostile)."""
    out = (
        s.replace("\\", "\\\\")
        .replace("'", "\\'")
        .replace("\n", "\\n")
        .replace("\r", "\\r")
        .replace("\t", "\\t")
    )
    return f"'{out}'"


def paragraph_occurrences(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
) -> DataFrame:
    """Narrow (doc_id, idx, para_hash) rows for every dedup-eligible
    paragraph occurrence (length >= ``min_chars``), hashed in-row —
    paragraph content never leaves the document's row."""
    # split() takes a REGEX: escape so sep is literal (DuckDB's
    # string_split twin is literal by definition)
    hashed = F.expr(
        f"transform(split({text_col}, {_sql_str(re.escape(sep))}), p -> "
        "named_struct('h', md5(p), 'n', length(p)))"
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.posexplode(hashed))
        .filter(F.col("col.n") >= min_chars)
        .select("doc_id", F.col("pos").alias("idx"), F.col("col.h").alias("para_hash"))
    )


def duplicate_paragraph_drops(occ: DataFrame) -> DataFrame:
    """(doc_id, idx) of every NON-canonical occurrence of a duplicated
    paragraph: one aggregate on the hash finds the corpus-wide min
    (doc_id, idx) keeper, then occurrences that are not it survive as
    the drop set.  Both the aggregate and the join move only narrow
    hash/index rows."""
    keepers = occ.groupBy("para_hash").agg(
        F.min(F.struct("doc_id", "idx")).alias("keep"),
        F.count(F.lit(1)).alias("occurrences"),
    )
    return (
        occ.join(keepers.filter(F.col("occurrences") >= 2), "para_hash")
        .filter(
            (F.col("doc_id") != F.col("keep.doc_id"))
            | (F.col("idx") != F.col("keep.idx"))
        )
        .select("doc_id", "idx")
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
    min_chars: int = 1,
    drop_empty: bool = True,
) -> DataFrame:
    """Corpus with duplicated paragraphs removed (module docstring
    semantics): same schema as ``docs`` with ``text_col`` rebuilt from
    each document's surviving paragraphs in original order.  Documents
    left with no non-empty paragraph drop when ``drop_empty``."""
    if "__drop_idx" in docs.columns:
        raise ValueError("column name '__drop_idx' is reserved")
    # the occurrence frame feeds TWO consumers (the keeper aggregate and
    # the drop probe) and its derivation is real per-row work (split +
    # per-paragraph md5 over the whole corpus): pin it once instead of
    # hashing the corpus twice — the checkpoint-vs-rescan rule
    # (docs/PERF_NOTES.md); the pinned frame is the narrow
    # (doc_id, idx, hash) projection, not the text
    occ = paragraph_occurrences(docs, text_col, id_col, sep, min_chars).localCheckpoint(
        eager=False
    )
    drops = (
        duplicate_paragraph_drops(occ)
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list("idx")).alias("__drop_idx"))
    )
    out = docs.join(
        drops.withColumnRenamed("doc_id", id_col), id_col, "left"
    )
    rebuilt = F.expr(
        f"array_join(filter(split({text_col}, {_sql_str(re.escape(sep))}), "
        "(p, i) -> __drop_idx IS NULL OR NOT array_contains(__drop_idx, i)), "
        f"{_sql_str(sep)})"
    )
    out = out.withColumn(text_col, rebuilt).drop("__drop_idx")
    if drop_empty:
        out = out.filter(F.length(F.trim(F.col(text_col))) > 0)
    return out
