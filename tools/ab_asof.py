"""q17_asof_join closure A/B (VERDICT r12 #5): the final experiment
before standing adjudication.

Three questions, one run:
1. Launch floor or data term?  Time spark q17 and its DuckDB native
   ASOF twin at sf0.1 and a synthesized 10x rung; compare slopes.
2. Is the bucketed form (the benched plan) actually the right Spark
   form at scale?  A/B it against the plain key-only-window form
   (as_of_join) at both rungs.
3. Does widening/narrowing the time bucket move the data term?
   (365d vs 90d vs 1460d buckets at the 10x rung.)

The 10x corpus reuses the scale_ladder synthesis for lineitem/orders
(offset order keys; the 25-key asof group structure and date domain
are preserved, so the right side stays dimension-shaped while the left
probe side grows 10x — the realistic asof regime).

Usage: python tools/ab_asof.py
Prints one JSON line per measurement + a closure summary.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hedera_etl_spark.queries import load_registry  # noqa: E402

SF01 = "/root/testdata/sf0.1"
GROWTH = 10
RUNS = 3


def log(**kw):
    print(json.dumps(kw), flush=True)


def synth_10x(spark, out_dir: str) -> None:
    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = spark.read.parquet(os.path.join(SF01, f"{table}.parquet"))
        big = None
        for i in range(GROWTH):
            c = src.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
            big = c if big is None else big.unionByName(c)
        big.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


def materialize(df) -> None:
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)")).collect()


def timed(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def _sides(spark, sf_dir):
    from hedera_etl_spark.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    right = (
        li.select((F.col("l_suppkey") % 25).alias("k"), "l_shipdate",
                  "l_orderkey")
        .groupBy("k", "l_shipdate")
        .agg(F.count("l_orderkey").alias("n_ship"),
             F.max("l_orderkey").alias("last_lok"))
    )
    left = orders.select(
        (F.col("o_custkey") % 25).alias("k"), "o_orderdate", "o_orderkey"
    )
    return left, right


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_asof")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hedera_etl_spark.operators.joins import as_of_join_bucketed

    registry = load_registry()
    spec = registry["q17_asof_join"]
    tmp = tempfile.mkdtemp(prefix="ab_asof_")
    r: dict = {}
    try:
        synth_10x(spark, tmp)
        rungs = (("sf0.1", SF01), ("sf1", tmp))

        # 1. spark benched entry vs duckdb native ASOF, both rungs
        for label, d in rungs:
            fn = lambda: materialize(spec.spark_fn(spark, d))
            fn()
            r[("spark", label)] = timed(fn)
            log(engine="spark", form="bucketed(benched)", sf=label,
                sec=r[("spark", label)])
        for label, d in rungs:
            con = duckdb.connect()
            for t in ("lineitem", "orders"):
                pth = os.path.join(d, f"{t}.parquet")
                glob = pth if os.path.isfile(pth) else pth + "/*.parquet"
                con.execute(f"CREATE TEMP TABLE {t} AS "
                            f"SELECT * FROM read_parquet('{glob}')")
            con.execute(spec.oracle).fetchall()
            r[("duckdb", label)] = timed(
                lambda: con.execute(spec.oracle).fetchall())
            log(engine="duckdb", form="native ASOF", sf=label,
                sec=r[("duckdb", label)])
            con.close()

        # 2. plain key-only-window form at both rungs (the serialization
        #    hazard the bucketed form exists to avoid: 25 keys = 25 tasks)
        from hedera_etl_spark.operators.joins import as_of_join

        for label, d in rungs:
            left, right = _sides(spark, d)
            fn = lambda: materialize(
                as_of_join(
                    left, right, on="k", left_ts="o_orderdate",
                    right_ts="l_shipdate",
                    right_payload=["n_ship", "last_lok"],
                )
            )
            fn()
            r[("plain", label)] = timed(fn)
            log(engine="spark", form="plain(key-only window)", sf=label,
                sec=r[("plain", label)])

        # 3. bucket-width sweep at the 10x rung (ts unit is SECONDS)
        for days in (90, 365, 1460):
            left, right = _sides(spark, tmp)
            fn = lambda: materialize(
                as_of_join_bucketed(
                    left, right, on="k", left_ts="o_orderdate",
                    right_ts="l_shipdate",
                    right_payload=["n_ship", "last_lok"],
                    bucket_width=days * 86400.0,
                )
            )
            fn()
            sec = timed(fn)
            r[("bucket", days)] = sec
            log(engine="spark", form=f"bucketed({days}d)", sf="sf1",
                sec=sec)

        s01, s1 = r[("spark", "sf0.1")], r[("spark", "sf1")]
        d01, d1 = r[("duckdb", "sf0.1")], r[("duckdb", "sf1")]
        log(
            ratio_sf01=round(s01 / d01, 2),
            ratio_sf1=round(s1 / d1, 2),
            spark_slope_per_decade=round((s1 - s01) / (GROWTH - 1), 3),
            duckdb_slope_per_decade=round((d1 - d01) / (GROWTH - 1), 3),
            data_term_gap=round((s1 - s01) / max(d1 - d01, 1e-9), 2),
            crossover=s1 < d1,
        )
        sys.exit(0)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
