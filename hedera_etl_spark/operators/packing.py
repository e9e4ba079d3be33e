"""Sequence packing — fill fixed token-budget bins with whole documents.

The training-data step between dedup/filtering and the trainer: examples
are concatenated into fixed-length contexts, and packing documents into
as few max_tokens bins as possible (without splitting documents) is a
bin-packing problem.  Exact global first-fit is inherently sequential, so
the distributed form trades a bounded amount of packing quality for full
parallelism:

1. docs hash into ``n_groups`` deterministic groups (same md5-bucket
   family as :mod:`sampling` — any engine reproduces the grouping);
2. each group packs INDEPENDENTLY with first-fit-decreasing (FFD), the
   classic 11/9·OPT + 6/9 guarantee per group;
3. bin ids compose (group, local bin) into one global BIGINT.

Scale notes (docs/SCALE.md):
- per-task state is one group's (doc_id, n_tokens) pairs — the TEXT
  column is projected away BEFORE the Arrow transfer, so group size
  bounds memory by ids+counts, never corpus bytes;
- groups are independent: 1000 executors pack 1000 groups concurrently,
  and ``n_groups`` scales with corpus size (docs-per-group stays
  constant), keeping the per-task FFD loop O(group · bins_in_group);
- the quality loss vs a global FFD is the per-group rounding (≤ one
  underfull bin per group); with docs-per-group in the thousands the
  aggregate fill rate is within a fraction of a percent of global FFD.

Documents longer than ``max_tokens`` cannot fit any bin: they are
flagged ``oversize`` and emitted one-per-bin so the caller decides the
policy (truncate / split / drop) — silently dropping them would make
"every doc assigned exactly once" unverifiable downstream.
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: local-bin capacity inside the composed global id; groups would need
#: more than a billion bins each to collide, which max_tokens >= 1 and
#: bounded group size make impossible.
_BIN_STRIDE = 1_000_000_000

_OUT_SCHEMA = (
    "doc_id long, n_tokens long, group_id int, bin_id long, oversize boolean"
)


def _pack_group(pdfs: Iterator[pd.DataFrame], max_tokens: int) -> Iterator[pd.DataFrame]:
    """FFD-pack one hash group (runs inside applyInPandas).

    Deterministic: docs sort by (-n_tokens, doc_id); first-fit scans bins
    in creation order.  Linear-scan first-fit is O(docs · bins) per
    group — fine at the documented docs-per-group scale (thousands); a
    capacity-indexed tree drops it to O(docs · log bins) if groups grow.
    """
    for pdf in pdfs:
        if pdf.empty:
            continue
        group = int(pdf["group_id"].iloc[0])
        base = group * _BIN_STRIDE
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True], kind="mergesort"
        )
        fits = pdf["n_tokens"] <= max_tokens
        bins: list[int] = []  # remaining capacity per local bin
        out_bin = []
        for n in pdf.loc[fits, "n_tokens"]:
            for i, cap in enumerate(bins):
                if n <= cap:
                    bins[i] = cap - n
                    out_bin.append(base + i)
                    break
            else:
                bins.append(max_tokens - n)
                out_bin.append(base + len(bins) - 1)
        over = pdf.loc[~fits]
        over_bins = [base + len(bins) + i for i in range(len(over))]
        yield pd.DataFrame(
            {
                "doc_id": pd.concat([pdf.loc[fits, "doc_id"], over["doc_id"]]),
                "n_tokens": pd.concat([pdf.loc[fits, "n_tokens"], over["n_tokens"]]),
                "group_id": group,
                "bin_id": out_bin + over_bins,
                "oversize": [False] * len(out_bin) + [True] * len(over_bins),
            }
        )


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: Optional[str] = None,
) -> DataFrame:
    """Assign every document to a token-budget bin.

    ``count_col`` names a precomputed token-count column; otherwise
    whitespace tokens of ``text_col`` are counted JVM-side.  Returns
    (doc_id, n_tokens, group_id, bin_id, oversize) — one row per input
    document, ``bin_id`` globally unique across groups.

    Single-split caveat (ADVICE r15 #2): the token count runs UPSTREAM
    of the group_id repartition, i.e. on the caller's input
    partitioning — a genuinely single-partition caller computes every
    count on one core before the exchange spreads the rest.  Callers
    with a one-partition frame and large documents should repartition
    before calling (the guard was removed here deliberately: its
    partition probe force-planned the composed caller's plan, a
    measured net regression — see the r15 note below).
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    # r15 optimization round: ONE parallelism guard with no result change
    # (the per-group FFD is deterministic under any partitioning) — an
    # explicit hash repartition on group_id feeding applyInPandas: the
    # grouped-Python stage's cost is per-ROW Python+Arrow work, invisible
    # to AQE's byte-based coalescing, which on a small batch folds the
    # exchange to ONE task and serializes every group through a single
    # Python worker.  The explicit repartition pins one task per group
    # (capped at n_groups — the stage's inherent parallelism bound) and
    # satisfies the groupBy's distribution, so no second exchange is
    # planned.  (A first cut ALSO wrapped ``docs`` in ensure_parallelism
    # to spread the regex token count; that guard's .rdd partition probe
    # forces full physical planning of the CALLER'S plan — ~2.5 s of
    # driver time per call when the caller is the composed
    # prepare_training_corpus — plus an extra full-width exchange, a net
    # regression measured at +2.3-4.9 s per composed prepare run at
    # sf0.1.  The token count is one split+size per row and the exchange
    # below spreads everything downstream of it, so the probe bought
    # nothing the repartition doesn't already provide.)
    counted = _counted_docs(docs, n_groups, id_col, text_col, count_col)
    n_tasks = min(n_groups, docs.sparkSession.sparkContext.defaultParallelism)
    counted = counted.repartition(n_tasks, "group_id")
    return counted.groupBy("group_id").applyInPandas(
        lambda pdf: pd.concat(list(_pack_group(iter([pdf]), max_tokens))),
        schema=_OUT_SCHEMA,
    )


def _counted_docs(
    docs: DataFrame,
    n_groups: int,
    id_col: str,
    text_col: str,
    count_col: Optional[str],
) -> DataFrame:
    """(doc_id, n_tokens, group_id) projection shared by both packers.

    md5-bucket grouping (sampling.hash_bucket family): deterministic,
    engine-independent, uniform.  Projects to (id, count, group) BEFORE
    any grouped stage so neither Arrow nor the shuffle ever ships
    document text.
    """
    if count_col:
        n = f"coalesce(CAST(`{count_col}` AS BIGINT), 0)"
    else:
        # whitespace token count; empty/null text counts 0 (split of ""
        # yields [""] — size 1 — so the empty case needs its own branch)
        n = (
            f"CAST(coalesce(CASE WHEN length(trim(`{text_col}`)) = 0 THEN 0 "
            f"ELSE size(split(trim(`{text_col}`), '\\\\s+')) END, 0) AS BIGINT)"
        )
    # SQL-text construction (r16, guide §7.3): identical analyzed plan to
    # the Column-chain form, ~10x fewer py4j round-trips on prepare's spine
    group = (
        f"CAST(pmod(CAST(conv(substring(md5(CAST(`{id_col}` AS STRING)), "
        f"1, 15), 16, 10) AS BIGINT), {int(n_groups)}) AS INT)"
    )
    return docs.selectExpr(
        f"CAST(`{id_col}` AS BIGINT) AS doc_id",
        f"{n} AS n_tokens",
        f"{group} AS group_id",
    )


def pack_concat(
    docs: DataFrame,
    max_tokens: int,
    n_groups: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    count_col: Optional[str] = None,
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out end-to-end in
    (group, doc_id) order and the token stream is cut every
    ``max_tokens`` — the GPT-style pretraining layout where a document
    may straddle a boundary (``split_across`` marks those).

    This is the zero-loss twin of :func:`pack_sequences`: FFD keeps
    documents whole at the cost of underfull bins; concat-and-chunk
    wastes zero tokens (every bin except each group's last is exactly
    full) at the cost of split documents.  Both are deterministic and
    engine-reproducible; which one a pipeline wants depends on whether
    the trainer masks cross-document attention.

    The whole computation is one window prefix-sum over (group_id,
    doc_id) — no Python, no grouped-map: ``start`` = running token count
    before the doc, ``bin_id`` = group-composed ``start // max_tokens``.
    Scale: the prefix sum is sequential WITHIN a group and parallel
    across groups, the same parallelism contract as the FFD packer (one
    task per group, n_groups scales with the corpus).

    Returns (doc_id, n_tokens, group_id, start_offset, bin_id,
    split_across) — one row per input document.
    """
    if max_tokens < 1:
        raise ValueError("max_tokens must be >= 1")
    from pyspark.sql import Window as W

    counted = _counted_docs(docs, n_groups, id_col, text_col, count_col)
    w = (
        W.partitionBy("group_id")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_offset")
    out = counted.select("doc_id", "n_tokens", "group_id", start)
    # exact integer division: Spark's `/` on longs is IEEE double division,
    # which can round across an integer near 2^53 for non-power-of-two
    # divisors; `div` matches the oracle's `//` for every max_tokens.
    first_bin = F.expr(f"start_offset div {int(max_tokens)}")
    last_bin = F.expr(
        f"(start_offset + greatest(n_tokens - 1, 0)) div {int(max_tokens)}"
    )
    return out.select(
        "doc_id",
        "n_tokens",
        "group_id",
        "start_offset",
        (F.col("group_id").cast("long") * _BIN_STRIDE + first_bin).alias("bin_id"),
        ((F.col("n_tokens") > 0) & (last_bin > first_bin)).alias("split_across"),
    )


def packing_stats(assignments: DataFrame, max_tokens: int) -> DataFrame:
    """One-row fill report over a ``pack_sequences`` result: bin count,
    mean fill rate of regular bins, and the oversize tally — the numbers
    a pipeline gates on before writing shards."""
    per_bin = (
        assignments.filter(~F.col("oversize"))
        .groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("fill"))
    )
    reg = per_bin.agg(
        F.count("*").alias("n_bins"),
        (F.avg("fill") / F.lit(float(max_tokens))).alias("fill_rate"),
        F.max("fill").alias("max_fill"),
    )
    over = assignments.agg(
        F.sum(F.col("oversize").cast("long")).alias("n_oversize"),
        F.count("*").alias("n_docs"),
    )
    return reg.crossJoin(over)  # two one-row aggregates
