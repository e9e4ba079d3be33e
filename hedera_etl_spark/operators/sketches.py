"""Mergeable approximate-aggregation sketches: the pre-aggregation layer
a 100 TB warehouse actually runs on.

Exact COUNT(DISTINCT) over a year of events re-shuffles the whole year
for every query.  The scale pattern is: aggregate each ingest partition
ONCE into a fixed-size mergeable sketch (Apache DataSketches HLL via
Spark's built-in ``hll_sketch_agg``), persist the sketch column next to
the partition, and answer any date-range distinct-count by UNIONING the
few hundred relevant sketches — bytes per partition instead of a
corpus-wide exchange, with a published ~2% relative error at the default
lgK=12.

Everything here stays JVM-side (built-in sketch expressions, binary
sketch columns); union of DataSketches HLL sketches is associative and
deterministic for a given lgK, so a rollup answered from merged daily
sketches equals the estimate from one direct pass — pinned by test, the
property that makes the pre-agg layer TRUSTABLE, not just fast.

Quantiles follow the same pattern via ``percentile_approx`` (a
positional-accuracy sketch): per-partition work, bounded memory,
rank error ≤ 1/accuracy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default DataSketches HLL precision (2^12 buckets — ~1.6% RSE).
DEFAULT_LGK = 12


def distinct_sketches(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lgk: int = DEFAULT_LGK,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``key_cols`` group (e.g. per
    ingest day): the persistable pre-aggregation.  One hash-aggregate
    with map-side partial sketches — the same shuffle shape as a SUM."""
    return df.groupBy(*key_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
        F.count("*").alias("n_rows"),
    )


def merge_distinct_estimate(
    sketches: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Merge sketches (optionally re-grouped to a coarser key) and
    estimate the distinct count.  This is the query-time side: input is
    one row per fine-grained partition, so the whole job is
    dimension-sized regardless of original corpus bytes."""
    grouped = (
        sketches.groupBy(*group_cols)
        if group_cols
        else sketches.groupBy(F.lit(1).alias("__all"))
    )
    out = grouped.agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"), F.lit(True))).alias(
            "approx_distinct"
        ),
        F.sum("n_rows").alias("n_rows"),
    )
    return out.drop("__all") if not group_cols else out


def approx_distinct_by(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = DEFAULT_LGK
) -> DataFrame:
    """Direct approximate distinct count per group (no persisted layer):
    one aggregate, fixed memory per group at any scale."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(value_col, F.lit(lgk))).alias(
            "approx_distinct"
        )
    )


def approx_quantiles_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    quantiles: list[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (rank error ≤ 1/accuracy) — the
    bounded-memory replacement for the exact sort-based percentile at
    corpus scale."""
    qs = F.array(*[F.lit(float(q)) for q in quantiles])
    out = df.groupBy(*group_cols).agg(
        F.percentile_approx(value_col, qs, F.lit(accuracy)).alias("qs")
    )
    cols = [
        F.col("qs")[i].alias(f"q{str(q).replace('0.', '')}")
        for i, q in enumerate(quantiles)
    ]
    return out.select(*group_cols, *cols)
