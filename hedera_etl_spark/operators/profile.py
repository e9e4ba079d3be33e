"""One-pass table profiling: per-column statistics as a tidy table.

The audit every warehouse runs before trusting a dataset — null rates,
cardinalities, ranges, numeric moments and quantiles — computed in ONE
aggregate over the table (every statistic is an aggregate expression in
the same pass, so cost is one scan + a one-row shuffle at any width or
scale).  Distinct counts use the HLL sketch estimator by default
(fixed memory; ``exact=True`` swaps in count_distinct when the column
count times cardinality is known-small).

The single aggregate row is unpivoted driver-side into one row per
column — bounded by the table's width, never its length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)
_ORDERED = _NUMERIC + (T.DateType, T.TimestampType, T.TimestampNTZType, T.StringType)


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = False,
    quantiles: tuple = (0.5, 0.95),
) -> DataFrame:
    """Tidy per-column profile: (column, dtype, n_rows, n_nulls,
    null_frac, approx_distinct, min, max, mean, stddev, q50, q95...).

    min/max/mean/quantiles are NULL where the type has no ordering /
    arithmetic; min/max render as strings so every column fits one tidy
    schema.
    """
    spark = df.sparkSession
    fields = [f for f in df.schema.fields if columns is None or f.name in columns]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for f in fields:
        c, name = F.col(f.name), f.name
        aggs.append(
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"nulls__{name}")
        )
        distinct = (
            F.count_distinct(c)
            if exact
            else F.hll_sketch_estimate(F.hll_sketch_agg(c.cast("string")))
        )
        aggs.append(distinct.alias(f"dist__{name}"))
        if isinstance(f.dataType, _ORDERED):
            aggs.append(F.min(c).cast("string").alias(f"min__{name}"))
            aggs.append(F.max(c).cast("string").alias(f"max__{name}"))
        if isinstance(f.dataType, _NUMERIC):
            aggs.append(F.avg(c.cast("double")).alias(f"mean__{name}"))
            aggs.append(F.stddev(c.cast("double")).alias(f"std__{name}"))
            for q in quantiles:
                aggs.append(
                    F.percentile_approx(c.cast("double"), float(q)).alias(
                        f"q{int(q * 100)}__{name}"
                    )
                )
    row = df.agg(*aggs).collect()[0]

    n = row["__n"]
    out_rows = []
    for f in fields:
        name = f.name

        def g(prefix, default=None):
            key = f"{prefix}__{name}"
            return row[key] if key in row.__fields__ else default

        out_rows.append(
            (
                name,
                f.dataType.simpleString(),
                n,
                int(g("nulls") or 0),
                round((g("nulls") or 0) / n, 6) if n else None,
                int(g("dist") or 0),
                g("min"),
                g("max"),
                float(g("mean")) if g("mean") is not None else None,
                float(g("std")) if g("std") is not None else None,
                *[
                    float(v) if (v := g(f"q{int(q * 100)}")) is not None else None
                    for q in quantiles
                ],
            )
        )
    schema = [
        "column", "dtype", "n_rows", "n_nulls", "null_frac",
        "approx_distinct", "min", "max", "mean", "stddev",
        *[f"q{int(q * 100)}" for q in quantiles],
    ]
    return spark.createDataFrame(out_rows, schema)
