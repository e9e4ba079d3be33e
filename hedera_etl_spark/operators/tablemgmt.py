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


def compact_partitions(
    spark,
    path: str,
    target_files_per_partition: int = 1,
    cluster_by: str | None = None,
    partitions: list | None = None,
) -> dict:
    """Compact small files inside each DAY partition — the maintenance
    companion to the streaming sink (every micro-batch append adds files;
    at a 30s cadence a partition accretes ~2,880 files/day, and at 100 TB
    file-open overhead dominates scan cost long before data volume does).

    Per partition: read it, coalesce to ``target_files_per_partition``
    (re-sorting on ``cluster_by`` when given, restoring row-group
    skipping that interleaved appends destroyed), and commit through the
    same crash-safe move-aside swap as the dedup rewrite — readers see
    the old or the new layout, never a partial directory.  Only
    partitions whose file count exceeds the target are touched.

    Returns {partition_value: files_before} for the partitions rewritten.
    """
    import os

    from hedera_etl_spark.fsutil import atomic_replace, heal

    compacted: dict = {}
    wanted = {str(p) for p in partitions} if partitions is not None else None
    for entry in sorted(os.listdir(path)):
        if not entry.startswith("part_date="):
            continue
        value = entry.split("=", 1)[1]
        if wanted is not None and value not in wanted:
            continue
        part_path = os.path.join(path, entry)
        heal(part_path)
        n_files = sum(
            1 for f in os.listdir(part_path)
            if f.endswith(".parquet") or f.startswith("part-")
        )
        if n_files <= target_files_per_partition:
            continue
        df = spark.read.parquet(part_path).coalesce(target_files_per_partition)
        if cluster_by:
            df = df.sortWithinPartitions(cluster_by)

        def write(tmp: str, df=df) -> None:
            df.write.mode("overwrite").parquet(tmp)

        atomic_replace(part_path, write)
        # spark leaves a _SUCCESS marker; harmless, but drop for tidiness
        marker = os.path.join(part_path, "_SUCCESS")
        if os.path.exists(marker):
            os.remove(marker)
        compacted[value] = n_files
    return compacted
