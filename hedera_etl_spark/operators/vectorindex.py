"""Persistable IVF vector index: build once, probe many.

``similarity.ivf_topk`` re-quantizes the whole corpus on every call —
correct for one-shot analytics, wasteful for a serving corpus queried
repeatedly.  This module persists the two IVF artifacts as parquet
tables:

- ``centroids/``: (bucket, centroid) — k rows, the coarse quantizer;
- ``lists/``:     (vec_id, vec) PARTITIONED BY bucket — the inverted
  lists, laid out so a probe is a PARTITION-PRUNED read: querying with
  ``n_probe`` of ``k`` centroids lists and reads only the probed
  bucket directories, ~n_probe/k of the index bytes, enforced by the
  scan's PartitionFilters (plan-pinned in tests).

Queries run the exact scoring pipeline of ``ivf_topk`` over the loaded
lists, so a persisted index returns bit-identical results to the
in-memory operator given the same centroids (test-pinned).  New vectors
append into their bucket partitions without touching existing files —
the index grows per-batch like any partitioned fact table (compaction
via operators/tablemgmt.py applies unchanged).

The only driver-side state is the centroid matrix (k x dims doubles) —
the same bounded collect as ``ivf_train_kmeans``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hedera_etl_spark.functions import cosine
from hedera_etl_spark.operators.similarity import (
    _bounded_sort,
    _dots_array,
    ivf_assign,
    ivf_centroids,
    ivf_train_kmeans,
)


class IVFIndex:
    """Handle on a persisted IVF index directory."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        with open(os.path.join(path, "_meta.json")) as fh:
            meta = json.load(fh)
        self.dims = int(meta["dims"])
        self.n_centroids = int(meta["n_centroids"])
        rows = (
            spark.read.parquet(os.path.join(path, "centroids"))
            .orderBy("bucket")
            .collect()
        )
        self.centroids = [list(r["centroid"]) for r in rows]

    # -- construction -------------------------------------------------------
    @staticmethod
    def build(
        spark: SparkSession,
        path: str,
        emb: DataFrame,
        n_centroids: int = 16,
        dims: int = 64,
        train: bool = False,
        train_iters: int = 5,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> "IVFIndex":
        """Quantize ``emb`` and write the index. ``train=True`` runs
        spherical k-means first (better-balanced lists); False uses the
        deterministic md5 centroid grid (engine-reproducible)."""
        centroids = (
            ivf_train_kmeans(emb, n_centroids, dims, train_iters, vec_col)
            if train
            else ivf_centroids(n_centroids, dims)
        )
        os.makedirs(path, exist_ok=True)
        cdf = spark.createDataFrame(
            [(b + 1, c) for b, c in enumerate(centroids)], ["bucket", "centroid"]
        )
        cdf.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(path, "centroids")
        )
        assigned = ivf_assign(emb, centroids, id_col, vec_col)
        (
            assigned.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(os.path.join(path, "lists"))
        )
        with open(os.path.join(path, "_meta.json"), "w") as fh:
            json.dump({"dims": dims, "n_centroids": n_centroids}, fh)
        return IVFIndex(spark, path)

    def add_vectors(
        self, emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
    ) -> None:
        """Append a new batch into its bucket partitions (existing files
        untouched — the standard partitioned-fact append)."""
        assigned = ivf_assign(emb, self.centroids, id_col, vec_col)
        assigned.write.mode("append").partitionBy("bucket").parquet(
            os.path.join(self.path, "lists")
        )

    # -- reads --------------------------------------------------------------
    def lists(self) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self.path, "lists"))

    def bucket_stats(self) -> DataFrame:
        """Inverted-list balance report (reads list lengths only)."""
        return self.lists().groupBy("bucket").agg(F.count("*").alias("n_vectors"))

    def probe_plan(self, queries: DataFrame, n_probe: int, vec_col: str = "qvec"):
        """(query_id, qvec, bucket) probe rows + the distinct probed
        bucket values (collected driver-side: bounded by q x n_probe)."""
        from pyspark.sql import Window as W

        q = queries.select(
            "query_id",
            vec_col,
            F.posexplode(_dots_array(vec_col, self.centroids)).alias("cidx", "cdot"),
        )
        wprobe = W.partitionBy("query_id").orderBy(F.col("cdot").desc(), "cidx")
        probes = (
            q.withColumn("pr", F.row_number().over(wprobe))
            .filter(F.col("pr") <= n_probe)
            .select("query_id", F.col(vec_col).alias("qvec"), (F.col("cidx") + 1).alias("bucket"))
        )
        buckets = sorted(r["bucket"] for r in probes.select("bucket").distinct().collect())
        return probes, buckets

    def query(
        self,
        queries: DataFrame,
        k: int = 5,
        n_probe: int = 2,
        vec_col: str = "qvec",
    ) -> DataFrame:
        """Approximate top-k for (query_id, qvec) rows.

        The probed bucket set collects driver-side (bounded by
        q x n_probe) and becomes a LITERAL partition predicate on the
        lists scan, so partition pruning skips every unprobed bucket
        directory at file-listing time — the scan reads ~n_probe/k of
        the index regardless of corpus size."""
        from pyspark.sql import Window as W

        probes, buckets = self.probe_plan(queries, n_probe, vec_col)
        lists = self.lists().filter(F.col("bucket").isin(buckets))
        scored = (
            F.broadcast(probes)
            .join(lists, "bucket")
            .filter(F.col("query_id") != F.col("vec_id"))
            .withColumn("cos", cosine(F.col("qvec"), F.col("vec"), self.dims))
        )
        wrank = W.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
        return (
            scored.withColumn("rank", F.row_number().over(wrank).cast("long"))
            .filter(F.col("rank") <= k)
            .select(
                "query_id",
                "rank",
                F.col("vec_id").alias("neighbor_id"),
                F.col("cos").cast("decimal(9,6)").cast("double").alias("cos_sim"),
            )
            .transform(lambda d: _bounded_sort(d, "query_id", "rank"))
        )
