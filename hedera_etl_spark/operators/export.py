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
    fmt: str = "parquet",
    shuffle_salt: str | None = None,
) -> DataFrame:
    """Write ``df`` as ``n_shards`` deterministic shards plus a
    ``_manifest`` parquet; returns the manifest DataFrame.

    ``fmt``: ``parquet`` (default) or ``jsonl`` — one JSON object per
    line, the wire format most training loaders consume directly; the
    manifest stays parquet and its checksum is computed over the same
    typed columns either way, so ``verify_shards`` needs the format only
    to re-read.

    ``shuffle_salt``: when set, rows inside each shard are ordered by
    md5(salt || key) — the deterministic corpus shuffle trainers want
    (stable across re-exports and engines, re-drawable with a new salt),
    instead of whatever order the upstream stages produced.

    Manifest columns: shard_id, n_rows, n_tokens (0 when no
    ``token_count_col``), checksum (bit_xor of per-row xxhash64 across
    every exported column — order-insensitive, so the shuffle does not
    affect it).
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if fmt not in ("parquet", "jsonl"):
        raise ValueError(f"fmt must be parquet or jsonl, got {fmt!r}")
    cols = df.columns
    sharded = df.withColumn("shard_id", shard_id(key_col, n_shards))
    # all rows of one shard land in one task; partitionBy splits a task
    # holding several shards into per-shard files -> 1 file per shard
    writable = sharded.repartition(n_shards, "shard_id")
    if shuffle_salt is not None:
        writable = writable.sortWithinPartitions(
            "shard_id",
            F.md5(F.concat_ws("\x1f", F.lit(shuffle_salt), F.col(key_col).cast("string"))),
        )
    if fmt == "jsonl":
        (
            writable.select(
                "shard_id", F.to_json(F.struct(*cols)).alias("value")
            )
            .write.mode("error")
            .partitionBy("shard_id")
            .text(f"{out_dir}/shards")
        )
    else:
        writable.write.mode("error").partitionBy("shard_id").parquet(
            f"{out_dir}/shards"
        )

    return write_manifest(sharded, out_dir, cols, token_count_col)


def write_manifest(
    sharded: DataFrame,
    out_dir: str,
    cols: list[str],
    token_count_col: str | None = None,
) -> DataFrame:
    """Compute and write the per-shard ``_manifest`` (shard_id, n_rows,
    n_tokens, checksum) — the SINGLE definition of the checksum
    expression ``verify_shards`` recomputes, shared by every shard
    writer (hash-mod ``export_shards`` and the training-order
    ``ordershuffle.export_ordered_shards``); ``cols`` must be the
    exported columns minus shard_id, in their written order."""
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


def verify_shards(
    spark: SparkSession, out_dir: str, fmt: str = "parquet", schema=None
) -> DataFrame:
    """Re-read an export and recompute the manifest from the shard files;
    returns per-shard rows with ``ok`` = recomputed == manifest.  One
    scan + one aggregation — the integrity check a pipeline runs before
    handing shards to a trainer.

    ``fmt='jsonl'`` requires the exported ``schema`` (without shard_id)
    to re-type the lines; note a JSON round-trip is bit-exact for
    integral/string/bool columns but can perturb the last ulp of DOUBLE
    columns — keep float payloads in parquet exports when the checksum
    must prove byte identity."""
    manifest = spark.read.parquet(f"{out_dir}/_manifest")
    if fmt == "jsonl":
        if schema is None:
            raise ValueError("verify_shards(fmt='jsonl') needs the export schema")
        raw = spark.read.text(f"{out_dir}/shards")
        data = raw.select(
            F.from_json("value", schema).alias("d"),
            F.regexp_extract(F.input_file_name(), r"shard_id=(\d+)", 1)
            .cast("int")
            .alias("shard_id"),
        ).select("d.*", "shard_id")
    else:
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
