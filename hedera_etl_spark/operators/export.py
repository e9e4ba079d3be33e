"""Deterministic shard export — the last stage of a training-data pipeline.

A trainer consumes the corpus as N fixed shards with a manifest (row
counts, token totals, content checksum per shard).  The requirements at
100 TB:

- shard membership must be a pure function of the document key (md5
  bucket, same engine-reproducible family as :mod:`sampling`), so a
  re-export after an upstream fix moves only the documents that changed;
- one output file per shard: rows are hash-repartitioned on the shard
  column and written ``partitionBy("shard_id")`` — every shard's rows
  sit in exactly one task, so each shard directory receives exactly one
  parquet file (a task holding two shards splits by directory);
- the manifest is computed DISTRIBUTED (one aggregation, written as
  parquet through Spark) — never a driver-side loop over shards, so a
  100k-shard export works the same as an 8-shard one.  The checksum is
  ``bit_xor`` of per-row xxhash64 over all exported columns:
  order-insensitive (shard files may be written in any row order) and
  overflow-free under ANSI semantics, unlike a sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shard_id(key_col, n_shards: int):
    """Deterministic shard in [0, n_shards) from the md5 of the key —
    engine-reproducible (same digits any engine computes)."""
    return (
        F.pmod(
            F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10)
            .cast("long"),
            F.lit(n_shards),
        )
        .cast("int")
    )


def export_shards(
    df: DataFrame,
    out_dir: str,
    n_shards: int,
    key_col: str = "doc_id",
    token_count_col: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic parquet shards plus a
    ``_manifest`` parquet; returns the manifest DataFrame.

    Manifest columns: shard_id, n_rows, n_tokens (0 when no
    ``token_count_col``), checksum (bit_xor of per-row xxhash64 across
    every exported column).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    cols = df.columns
    sharded = df.withColumn("shard_id", shard_id(key_col, n_shards))
    # all rows of one shard land in one task; partitionBy splits a task
    # holding several shards into per-shard files -> 1 file per shard
    sharded.repartition(n_shards, "shard_id").write.mode("error").partitionBy(
        "shard_id"
    ).parquet(f"{out_dir}/shards")

    tok = (
        F.sum(F.col(token_count_col).cast("long"))
        if token_count_col
        else F.lit(0).cast("long")
    )
    manifest = (
        sharded.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_rows"),
            tok.alias("n_tokens"),
            F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("checksum"),
        )
        .orderBy("shard_id")
    )
    manifest.write.mode("error").parquet(f"{out_dir}/_manifest")
    return manifest


def verify_shards(spark: SparkSession, out_dir: str) -> DataFrame:
    """Re-read an export and recompute the manifest from the shard files;
    returns per-shard rows with ``ok`` = recomputed == manifest.  One
    scan + one aggregation — the integrity check a pipeline runs before
    handing shards to a trainer."""
    manifest = spark.read.parquet(f"{out_dir}/_manifest")
    data = spark.read.parquet(f"{out_dir}/shards")
    cols = [c for c in data.columns if c != "shard_id"]
    recomputed = data.groupBy("shard_id").agg(
        F.count("*").alias("r_rows"),
        F.expr(f"bit_xor(xxhash64({', '.join(cols)}))").alias("r_checksum"),
    )
    return (
        manifest.join(recomputed, "shard_id", "full_outer")
        .withColumn(
            "ok",
            (F.col("n_rows") == F.col("r_rows"))
            & (F.col("checksum") == F.col("r_checksum")),
        )
        .orderBy("shard_id")
    )
