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
    cluster_by: str | None = "transactionType",
    partitions: list | None = None,
    skip_latest: bool = True,
    max_parallel: int = 4,
) -> dict:
    """Compact small files inside each DAY partition — the maintenance
    companion to the streaming sink (every micro-batch append adds files;
    at a 30s cadence a partition accretes ~2,880 files/day, and at 100 TB
    file-open overhead dominates scan cost long before data volume does).

    Per partition: read it, coalesce to ``target_files_per_partition``
    (re-sorting on ``cluster_by`` when given — default matches
    ``write_day_partitioned`` so a default-args maintenance run restores
    the same S6 clustering the write path established; silently skipped
    for tables without that column), and commit through the shared
    crash-safe move-aside swap — readers see the old or the new layout,
    never a partial directory.  Crash debris from a previous run
    (hidden ``.__old`` / ``.__new`` swap siblings) is healed/cleared
    before iterating, and those siblings are never themselves treated as
    partitions.

    Writer coordination, two layers — NO partition is assumed immutable
    (the ingest design's arrival-time watermark means arbitrarily late
    events still land, in their event-date i.e. HISTORIC partition):

    - ``skip_latest=True`` (default) leaves the lexicographically
      greatest partition alone — the live stream's main append target,
      where a race is likely rather than merely possible.
    - Every compacted partition re-lists its data files immediately
      before the swap and ABORTS that swap (tmp discarded, partition
      untouched) if the listing changed since the read snapshot — a
      late-event append during the rewrite is detected instead of
      silently dropped.  The partition is then retried once with a fresh
      snapshot (now including the late file); a second abort leaves it
      uncompacted (absent from the returned dict) for the next
      maintenance run.  The residual window is the list-to-rename gap
      (microseconds, vs the whole rewrite); pause writers for a
      guaranteed-lossless compaction.

    Partitions compact concurrently (``max_parallel`` driver threads —
    Spark schedules jobs from separate threads in parallel), so a
    backlogged table is not serialized on per-job submission latency.

    Returns {partition_value: files_before} for the partitions rewritten.
    """
    import os
    from concurrent.futures import ThreadPoolExecutor

    from hedera_etl_spark.fsutil import atomic_replace, heal_partition_dirs, is_swap_sibling

    # heal crash debris FIRST (shared recovery pass with the dedup
    # rewrite): restore partitions stranded mid-rename, clear leftovers
    heal_partition_dirs(path)

    entries = sorted(
        e for e in os.listdir(path)
        if e.startswith("part_date=") and not is_swap_sibling(e)
    )
    wanted = {str(p) for p in partitions} if partitions is not None else None
    # an explicit partition list overrides the live-writer guard: the
    # caller is asserting those partitions are safe to rewrite
    if skip_latest and wanted is None and entries:
        entries = entries[:-1]

    def data_files(part_path: str) -> set[str]:
        return {
            f for f in os.listdir(part_path)
            if f.endswith(".parquet") or f.startswith("part-")
        }

    def compact_one(entry: str):
        value = entry.split("=", 1)[1]
        if wanted is not None and value not in wanted:
            return None
        part_path = os.path.join(path, entry)
        for _attempt in range(2):
            snapshot = data_files(part_path)
            n_files = len(snapshot)
            if n_files <= target_files_per_partition:
                return None
            df = spark.read.parquet(part_path).coalesce(target_files_per_partition)
            if cluster_by and cluster_by in df.columns:
                df = df.sortWithinPartitions(cluster_by)
            swapped = atomic_replace(
                part_path,
                lambda tmp: df.write.mode("overwrite").parquet(tmp),
                # last-moment concurrent-writer guard: abort if any file
                # appeared/vanished since the read snapshot (late events
                # land in historic partitions too — see docstring)
                abort_unless=lambda: data_files(part_path) == snapshot,
            )
            if swapped:
                marker = os.path.join(part_path, "_SUCCESS")
                if os.path.exists(marker):
                    os.remove(marker)
                return value, n_files
        return None  # raced twice: leave for the next maintenance run

    with ThreadPoolExecutor(max_workers=max(1, max_parallel)) as pool:
        results = list(pool.map(compact_one, entries))
    return dict(r for r in results if r is not None)


# ---------------------------------------------------------------------------
# Z-order clustering (multi-column data skipping)
# ---------------------------------------------------------------------------
def zorder_value(cols: list, bits: int = 16):
    """Morton (Z-order) interleave of pre-scaled column values — the sort
    key behind lakehouse OPTIMIZE ZORDER.

    Single-column clustering gives row-group min/max skipping on ONE
    column and destroys it for every other; interleaving the top ``bits``
    bits of each column's scaled value yields files that are small
    hyper-rectangles in the combined space, so predicates on ANY of the
    z-ordered columns skip most files.  Inputs must already be scaled to
    the [0, 2^bits) integer range (``_scale_to_bits``); the interleave is
    a flat chain of shift/mask terms — whole-stage-codegen'd, no UDF.
    """
    terms = []
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out.bitwiseOR(t)
    return out


def _scale_to_bits(col, lo, hi, bits: int):
    """Scale a numeric/timestamp column to [0, 2^bits) by min-max range
    (documented simplification of Delta's range-id approach: rank-based
    scaling resists skew better but costs a global sort; min-max costs
    one tiny aggregate)."""
    span = F.lit(hi) - F.lit(lo)
    scaled = F.when(
        span <= 0, F.lit(0)
    ).otherwise(
        ((col.cast("double") - F.lit(lo)) / span * F.lit((1 << bits) - 1)).cast("long")
    )
    return F.greatest(F.lit(0), F.least(scaled, F.lit((1 << bits) - 1)))


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    n_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet laid out in Z-order over ``zorder_by`` columns:
    one tiny min/max aggregate per column (driver-side scalars), the
    Morton key as a pure projection, then range-repartition + sort on
    the key so each output file covers a compact z-range.  Predicates on
    any z-ordered column then skip most files via parquet row-group
    stats — the multi-column generalization of ``write_day_partitioned``'s
    single-column clustering."""
    stats = df.agg(
        *[
            f
            for c in zorder_by
            for f in (
                F.min(F.col(c).cast("double")).alias(f"lo_{c}"),
                F.max(F.col(c).cast("double")).alias(f"hi_{c}"),
            )
        ]
    ).collect()[0]
    scaled = [
        _scale_to_bits(F.col(c), stats[f"lo_{c}"], stats[f"hi_{c}"], bits)
        for c in zorder_by
    ]
    zv = zorder_value(scaled, bits=bits)
    (
        df.withColumn("__z", zv)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
