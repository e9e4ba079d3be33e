"""DSIR weights A/B + scale rung (VERDICT r12 #2): spark md5 canon vs
spark xxhash64 production twin vs the DuckDB md5 oracle, at sf0.1 and
at a synthesized 10x rung.

The question on the table: llm_dsir_weights benched 1.96 s at sf0.1 vs
its 0.2 s DuckDB twin (~8x).  Is that a plan defect or the launch
floor?  The A/B answers it with the crossover: if the Spark wall is
flat across a 10x data growth while DuckDB's grows linearly, the sf0.1
gap is fixed per-job cost (scheduling + py4j + stage launch), not a
data-term defect — and the ratio must invert at some rung.

The 10x corpus uses the scale_ladder synthesis (10 copies, offset
doc_ids, per-copy token prefix so feature spaces stay disjoint and the
NB model shape is preserved rather than collapsing to 10x-duplicated
buckets).

Usage: python tools/ab_dsir.py
Prints one JSON line per (engine, entry, sf) + a crossover verdict.
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


def synth_10x(spark, out_dir: str) -> str:
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    copies = []
    for i in range(GROWTH):
        copies.append(
            docs.select(
                (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
                F.expr(
                    f"array_join(transform(split(text, ' '), "
                    f"t -> concat('c{i}', t)), ' ')"
                ).alias("text"),
                *[c for c in docs.columns if c not in ("doc_id", "text")],
            )
        )
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    path = os.path.join(out_dir, "documents.parquet")
    big.write.mode("overwrite").parquet(path)
    return path


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


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_dsir")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    registry = load_registry()
    tmp = tempfile.mkdtemp(prefix="ab_dsir_")
    results: dict[tuple[str, str], float] = {}
    try:
        big_path = synth_10x(spark, tmp)
        rungs = {
            "sf0.1": (SF01, os.path.join(SF01, "documents.parquet")),
            "sf1": (tmp, big_path),
        }
        for label, (sf_dir, _) in rungs.items():
            for name in ("llm_dsir_weights", "llm_dsir_weights_fast"):
                spec = registry[name]
                fn = lambda: materialize(spec.spark_fn(spark, sf_dir))
                fn()  # warm: JIT + codegen + file listing
                results[(name, label)] = timed(fn)
                log(engine="spark", entry=name, sf=label,
                    sec=results[(name, label)])
        sql = registry["llm_dsir_weights"].oracle
        for label, (_, doc_path) in rungs.items():
            con = duckdb.connect()
            glob = (
                doc_path
                if os.path.isfile(doc_path)
                else os.path.join(doc_path, "*.parquet")
            )
            con.execute(
                "CREATE TEMP TABLE documents AS "
                f"SELECT * FROM read_parquet('{glob}')"
            )
            con.execute(sql).fetchall()  # warm
            results[("duckdb_md5", label)] = timed(
                lambda: con.execute(sql).fetchall()
            )
            log(engine="duckdb", entry="llm_dsir_weights(md5 oracle)",
                sf=label, sec=results[("duckdb_md5", label)])
            con.close()

        fast01 = results[("llm_dsir_weights_fast", "sf0.1")]
        fast1 = results[("llm_dsir_weights_fast", "sf1")]
        duck01 = results[("duckdb_md5", "sf0.1")]
        duck1 = results[("duckdb_md5", "sf1")]
        log(
            spark_fast_growth=round(fast1 / fast01, 2),
            duckdb_growth=round(duck1 / duck01, 2),
            ratio_sf01=round(fast01 / duck01, 2),
            ratio_sf1=round(fast1 / duck1, 2),
            crossover=fast1 < duck1,
            verdict=(
                "INVERTED: spark fast twin beats duckdb at the 10x rung "
                "— the sf0.1 gap is launch floor, not plan"
                if fast1 < duck1
                else "no crossover at 10x"
            ),
        )
        sys.exit(0 if fast1 < duck1 else 1)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
