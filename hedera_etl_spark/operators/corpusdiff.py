"""Corpus snapshot diff: what changed between two versions of a corpus
— the audit every recurring ingestion/curation run wants before it
blesses a new snapshot ("this crawl added 2M docs, dropped 40k, and
silently rewrote 300k — is that expected?").

Semantics: per id, compare a content hash across the two snapshots and
label the row ``added`` (only in new), ``removed`` (only in old),
``changed`` (both, different content), or ``unchanged``.

Scale shape: both sides project down to (id, md5) BEFORE the join, so
the one unavoidable exchange — a full-outer equi-join on the id — moves
two narrow columns, not document bodies; Catalyst plans a sort-merge
join both sides of which are already pruned scans.  Snapshots bucketed
by id at write time co-locate the join entirely.  The summary is one
dimension-sized aggregate over the statuses.

md5 (not xxhash64) for the content hash: the same cross-engine
determinism contract as operators/sampling.py — any engine (and the
DuckDB oracle twin) re-derives identical hashes.  Each column is
coalesced to a ``\\x00`` sentinel BEFORE the join, because ``concat_ws``
skips NULL columns outright on both engines — without the sentinel a
NULL shifting between columns collides ((NULL,'x') vs ('x',NULL) hash
identically; ADVICE r8 #2).  Residual collisions: a NULL column vs a
column whose literal value is the one-byte NUL string, and NULL vs
empty string are distinct (sentinel != '').
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def content_hash(content_cols) -> F.Column:
    """md5 over the \\x1f-joined content columns, each NULL-coalesced to
    a \\x00 sentinel so column positions survive NULLs — the engine-
    portable row-content fingerprint (mirrored literally by the oracle
    SQL: ``coalesce(CAST(c AS VARCHAR), chr(0))``)."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            *[
                F.coalesce(
                    (F.col(c) if isinstance(c, str) else c).cast("string"),
                    F.lit("\x00"),
                )
                for c in content_cols
            ],
        )
    )


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    content_cols=("text",),
) -> DataFrame:
    """Per-id diff of two snapshots: ``(doc_id, status, old_hash,
    new_hash)`` with status in added/removed/changed/unchanged.  One
    narrow full-outer join; hashes returned so a consumer can route
    changed ids into a re-processing queue without re-reading either
    snapshot."""
    h = content_hash(content_cols)
    a = old.select(F.col(id_col).alias("doc_id"), h.alias("old_hash"))
    b = new.select(F.col(id_col).alias("doc_id"), h.alias("new_hash"))
    return a.join(b, "doc_id", "full_outer").select(
        "doc_id",
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
        "old_hash",
        "new_hash",
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """status -> row count, one dimension-sized aggregate (at most 4
    rows) — the number a snapshot gate alerts on."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).orderBy("status")
