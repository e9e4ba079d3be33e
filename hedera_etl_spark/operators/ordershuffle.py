"""Deterministic corpus shuffle for training order: the last step
between this engine's curated corpus and a dataloader.

Trainers need documents in a RANDOM-LOOKING but REPRODUCIBLE global
order, cut into fixed-size shards so every data-parallel rank reads the
same bytes on every restart.  ``rand()`` fails reproducibility the same
way it fails sampling (per-task RNG state, partition-order dependence),
so the order here is the md5 hash order of the row key under a seed
salt — the sampling.py canon: any engine (and the DuckDB oracle twin)
re-derives the identical permutation, and a new salt draws a fresh,
independent permutation (re-shuffle between epochs = new salt).

Scale shape: the global rank is NOT a single-reducer global window —
it rides ``selection.running_total``'s range-partition + per-partition
window + broadcast-offset prefix sum (value = 1, so the prefix sum IS
the 1-based rank), two exchanges at any corpus size.  The hash order
is uniform by construction, so the range partitioning is balanced with
no skew caveat at all.  Shard assignment is then per-row arithmetic on
the rank, and the export writes one file per shard with the manifest
``export.verify_shards`` already checks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hedera_etl_spark.operators.sampling import hash_bucket
from hedera_etl_spark.operators.selection import running_total


def shuffled_order(
    df: DataFrame,
    key_cols: list[str],
    salt: str = "",
    rank_col: str = "shuffle_rank",
    n_partitions: int | None = None,
) -> DataFrame:
    """Input columns plus ``rank_col``: the row's 1-based position in
    the seeded hash order (bucket ASC, then ``key_cols`` ASC — a total
    order; ``key_cols`` must uniquely identify rows, the same contract
    as every deterministic draw in sampling.py).  Computed as a
    distributed prefix sum of 1 — no single-reducer global sort."""
    if not key_cols:
        raise ValueError(
            "key_cols must be non-empty: with no key the hash bucket is "
            "a constant, the order is not total, and ranks would depend "
            "on physical row order — the nondeterminism this operator "
            "exists to prevent"
        )
    one = "__shuffle_one"
    if one in df.columns:
        raise ValueError(f"column name {one!r} is reserved")
    order = [hash_bucket(*key_cols, salt=salt).asc()] + [
        F.col(c).asc() for c in key_cols
    ]
    ranked = running_total(
        df.withColumn(one, F.lit(1)),
        order,
        one,
        out_col=rank_col,
        n_partitions=n_partitions,
    )
    return ranked.drop(one)


def assign_fixed_shards(
    df: DataFrame,
    shard_size: int,
    key_cols: list[str],
    salt: str = "",
    rank_col: str = "shuffle_rank",
    shard_col: str = "shard_id",
    pos_col: str = "pos_in_shard",
    n_partitions: int | None = None,
) -> DataFrame:
    """Fixed-size shard assignment in seeded-shuffle order: adds
    ``rank_col`` (global 1-based training order), ``shard_col``
    (= (rank-1) div shard_size) and ``pos_col`` (= (rank-1) mod
    shard_size).  Every shard except the last holds exactly
    ``shard_size`` rows — the property data-parallel loaders want and
    the hash-mod ``export.shard_id`` (size ~ n/k ± √) cannot give.
    Exact integer div/mod so DuckDB's ``//`` re-derives the identical
    assignment."""
    if shard_size < 1:
        raise ValueError("shard_size must be >= 1")
    taken = sorted(set(df.columns) & {rank_col, shard_col, pos_col})
    if taken:
        raise ValueError(
            f"input columns {taken} collide with the shuffle outputs; "
            "rename them or pass different rank/shard/pos column names"
        )
    ranked = shuffled_order(df, key_cols, salt, rank_col, n_partitions)
    zero_based = f"(`{rank_col}` - 1)"
    return ranked.withColumn(
        shard_col, F.expr(f"{zero_based} div {shard_size}").cast("int")
    ).withColumn(pos_col, F.expr(f"{zero_based} % {shard_size}").cast("int"))


def export_ordered_shards(
    df: DataFrame,
    out_dir: str,
    shard_size: int,
    key_cols: list[str],
    salt: str = "",
    token_count_col: str | None = None,
) -> DataFrame:
    """Shuffle + fixed-size shard + write: one parquet file per shard
    under ``out_dir/shards/shard_id=N`` with rows in training order
    (``pos_in_shard`` persisted so a loader can verify it), plus the
    ``_manifest`` parquet ``export.verify_shards`` checks unchanged.
    Returns the manifest."""
    from hedera_etl_spark.operators.export import write_manifest

    sharded = assign_fixed_shards(df, shard_size, key_cols, salt=salt)
    cols = [c for c in sharded.columns if c != "shard_id"]
    (
        sharded.repartition(F.col("shard_id"))
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode("error")
        .partitionBy("shard_id")
        .parquet(f"{out_dir}/shards")
    )
    return write_manifest(sharded, out_dir, cols, token_count_col)
