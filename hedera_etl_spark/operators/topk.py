"""Grouped top-k: the "top-k documents per domain" reporting/export
query every curation run wants (VERDICT r7 #7).

Reference scope: the reference's ranking surface is single-phase window
SQL (the BigQuery console queries SURVEY.md §2-W catalogues; the rn=1
special case backs RemoveDuplicatesTemplateQuery.java:29-43's
first-per-group collapse).  This module keeps those semantics but fixes
the plan shape for Spark at corpus scale.

Why not ONE window: ``row_number() OVER (PARTITION BY domain ...)``
hash-partitions the FULL table by domain.  Domains are low-cardinality
(a handful of sources over 100 TB), so each domain lands on ONE reducer
which must sort a domain-sized partition — the canonical window-skew
scale-killer.  ``grouped_topk`` runs two phases:

1. local top-k per (key, shard): the shard key is a deterministic hash
   of a caller-named unique column, so the first window spreads each
   domain over ``n_shards`` reducers, each sorting ~1/n_shards of the
   domain and keeping k rows;
2. global top-k per key over the survivors — at most k * n_shards rows
   per key, a dimension-sized frame whose second exchange is free.

Any row in the true global top-k is in its shard's local top-k, so the
two-phase result is EXACTLY the single-window result (pinned bit-equal
in tests/test_topk.py); the shard assignment cannot change the answer,
only the parallelism.  The same trick backs percentiles_by_histogram
and pre-aggregated ROLLUP (q12) — shrink before the skewed exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def grouped_topk(
    df: DataFrame,
    keys: list[str],
    order: list[Column],
    k: int,
    shard_on: str | Column,
    n_shards: int = 32,
    rank_col: str = "rank",
) -> DataFrame:
    """Top-``k`` rows per ``keys`` group under ``order``, two-phase.

    ``order`` must be a TOTAL order within each group (append a unique
    tie-break column) — with ties at the k boundary, row_number would
    otherwise pick an engine-dependent subset.  ``shard_on`` is a column
    name or expression whose xxhash64 spreads phase 1 (any column works
    for correctness — determinism of the RESULT comes from the total
    order — but it must be HIGH-cardinality for the even spread: a
    coarse column caps each group at that column's distinct count of
    shards, re-creating the one-reducer sort; composite-keyed callers
    should shard on the full key).  Returns the input columns
    plus ``rank_col`` (1-based dense position under ``order``).

    Set ``n_shards=1`` to degenerate to the single-window form (useful
    only for plan comparison; the default keeps every core busy).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    # casefolded: Spark resolves withColumn/drop case-INsensitively by
    # default, so a column named 'Rank' would be silently overwritten if
    # only exact names were checked
    taken = sorted(
        c for c in df.columns
        if c.casefold() in {"__shard", "__lr", rank_col.casefold()}
    )
    if taken:
        # withColumn would silently OVERWRITE them and the phase-1 drop
        # would then delete the caller's own data from the output
        raise ValueError(
            f"input columns {taken} collide with grouped_topk "
            "internals; rename them or pass a different rank_col"
        )
    shard_col = F.col(shard_on) if isinstance(shard_on, str) else shard_on
    shard = F.pmod(F.xxhash64(shard_col), F.lit(n_shards))
    local = W.partitionBy(*keys, "__shard").orderBy(*order)
    survivors = (
        df.withColumn("__shard", shard)
        .withColumn("__lr", F.row_number().over(local))
        .filter(F.col("__lr") <= k)
        .drop("__shard", "__lr")
    )
    final = W.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn(rank_col, F.row_number().over(final))
        .filter(F.col(rank_col) <= k)
    )
