"""Budget-constrained corpus selection: the "take the best documents
until the token budget is spent" cut every training run makes when the
cleaned corpus is still bigger than the compute plan.

Semantics (the greedy prefix): order documents by (quality DESC, id ASC
— a total order), keep a document iff the running token total INCLUDING
it stays within the budget.  One selection is therefore nested inside
any larger-budget selection over the same corpus, and the cut is
deterministic and engine-reproducible.

Scale shape — a global running sum WITHOUT a single-reducer global
sort (the naive one-window form serializes the whole corpus through one
task, the canonical scale-killer):

1. ``repartitionByRange`` on the selection order: Spark's range
   partitioner samples split points, so partitions are balanced even
   when quality ties heavily (the id tiebreak splits ties across
   partitions); partition i holds rows strictly ordered before
   partition i+1.  The frame is pinned with a lazy ``localCheckpoint``
   because two consumers re-derive it below and range-partition
   sampling must not re-draw between them (the repo's
   checkpoint-vs-rescan rule).
2. per-partition token totals — an ``n_partitions``-row aggregate —
   get exclusive prefix offsets via one window over that DIMENSION-
   sized frame (single-partition window over ~hundreds of rows, free);
3. the offsets broadcast-join back on partition id, and each
   partition's LOCAL running sum (a window keyed by the partition id
   itself — ordering work stays where the rows already are) plus its
   offset is the exact global running sum.

Two full exchanges total (the range repartition + the pid-keyed window
exchange) and one broadcast join, independent of skew.  The same
two-phase shrink-before-the-skewed-exchange idea as operators/topk.py,
applied to a prefix sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def running_total(
    df: DataFrame,
    order_cols,
    value_col: str,
    out_col: str = "running_total",
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact global running sum of ``value_col`` under ``order_cols``
    (a list of Columns forming a TOTAL order), distributed via the
    range-partition + offset plan in the module docstring.  Returns the
    input columns plus ``out_col`` (the inclusive prefix sum; NULL
    values contribute 0, so the total is never NULL and never depends on
    which partition a NULL lands in).  The
    result's partitioning is the selection order — callers writing it
    out get range-clustered files for free."""
    if out_col.casefold() in {"__pid", "__off"}:
        raise ValueError(
            f"out_col {out_col!r} collides with running_total internals"
        )
    taken = sorted(
        c for c in df.columns if c.casefold() in {"__pid", "__off", out_col.casefold()}
    )
    if taken:
        raise ValueError(
            f"input columns {taken} collide with running_total internals; "
            "rename them or pass a different out_col"
        )
    # exact-arithmetic types only: a double prefix sum is not reproducible
    # across plans (the partition split changes the addition order), so a
    # float value_col would silently break the "same answer for any
    # n_partitions" contract AND the cross-engine oracle hash
    vtype = dict(df.dtypes)[value_col]
    if not (
        vtype in ("tinyint", "smallint", "int", "bigint")
        or vtype.startswith("decimal")
    ):
        raise ValueError(
            f"value_col {value_col!r} has type {vtype}; running_total "
            "requires an exact integral/decimal type — floating sums are "
            "association-order-dependent, so the distributed prefix would "
            "not equal the single-window form"
        )
    n_partitions = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_partitions, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        # pinned: the totals aggregate AND the main pass both consume this
        # frame; range sampling must not re-draw between the two actions
        .localCheckpoint(eager=False)
    )
    # NULL values contribute 0 (coalesced per row, NOT skipped): a bare
    # window sum is NULL while a partition-local prefix is all-NULL, so a
    # NULL landing at a range-partition head would poison that row's cum
    # and make the answer depend on n_partitions
    val = F.coalesce(F.col(value_col), F.lit(0))
    # no narrowing casts anywhere: Spark's sum already widens (long ->
    # long, decimal(p,s) -> decimal(p+10,s)), and truncating per-partition
    # totals would corrupt every later partition's offset
    totals = ranged.groupBy("__pid").agg(F.sum(val).alias("__tot"))
    # exclusive prefix offsets over the n_partitions-row totals frame:
    # the single-partition window is over a dimension-sized input
    woff = W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = totals.select(
        "__pid", F.coalesce(F.sum("__tot").over(woff), F.lit(0)).alias("__off")
    )
    wlocal = W.partitionBy("__pid").orderBy(*order_cols).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return (
        ranged.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__off") + F.sum(val).over(wlocal))
        .drop("__pid", "__off")
    )


def select_to_token_budget(
    docs: DataFrame,
    budget: int,
    quality_col: str = "quality_score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    n_partitions: int | None = None,
    cum_col: str = "cum_tokens",
) -> DataFrame:
    """Keep the highest-quality documents whose running token total stays
    within ``budget`` — greedy prefix under (quality DESC, id ASC).

    Output: the input columns plus ``cum_col``, the document's inclusive
    position in the token budget (monotone along the selection order, so
    ``cum_col <= b`` for a smaller b is that smaller budget's selection
    — nested like grouped_hash_sample's ranks).  Documents with NULL
    quality order last under DESC (the first cut); NULL/zero token
    counts contribute nothing to the running total but the rows
    themselves are kept whenever their prefix fits.
    """
    if budget < 0:
        raise ValueError("budget must be >= 0")
    order = [F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()]
    cum = running_total(
        docs, order, token_col, out_col=cum_col, n_partitions=n_partitions
    )
    return cum.filter(F.col(cum_col) <= budget)
