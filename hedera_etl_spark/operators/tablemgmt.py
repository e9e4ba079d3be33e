"""Table creation & layout (S6): DAY partitioning + clustering.

The reference creates the transactions table DAY-partitioned on
consensusTimestampTruncated and clustered on transactionType
(scripts/create-tables.sh:11-18).  On parquet:

- partitioning -> directory partitioning on the derived DATE column
  (``part_date``), giving Catalyst partition pruning on time predicates
  (SURVEY §4 O1);
- clustering -> ``sortWithinPartitions(cluster_by)`` at write, so parquet
  row-group min/max stats give data skipping on the cluster column
  (SURVEY §4 O2 — the Delta path would be OPTIMIZE ZORDER).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_day_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str = "consensusTimestampTruncated",
    cluster_by: str | None = "transactionType",
    mode: str = "append",
) -> None:
    """Write DAY-partitioned (+ optionally clustered) parquet.

    Adds ``part_date = to_date(ts_col)`` if absent.  Rows are sorted
    within output partitions on the cluster column so selective scans on
    it skip row groups via parquet statistics.
    """
    if "part_date" not in df.columns:
        df = df.withColumn("part_date", F.to_date(F.col(ts_col)))
    if cluster_by:
        # sort by the partition column FIRST: two dates can hash into one
        # shuffle partition, and the writer's per-date file split must
        # receive contiguous (not interleaved) cluster-column runs
        df = df.repartition(F.col("part_date")).sortWithinPartitions(
            "part_date", cluster_by
        )
    df.write.mode(mode).partitionBy("part_date").parquet(path)
