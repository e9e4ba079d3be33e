"""sf0.1 -> sf1 (10x) scale-ladder rung (VERDICT r9 #6): run the most
expensive document-family entries plus the composed prepare pipeline at
both scales and record the wall-time ratio per family — a ratio >> 10
exposes superlinear constants the flat sf0.1 bench cannot see (the
cheapest 100x-question evidence available in this container).

The 10x corpus is synthesized from sf0.1 documents: 10 copies with
offset doc_ids and a per-copy TOKEN prefix (``c<i>``) applied to every
token, so each copy's shingle space is disjoint from every other copy —
the dup/near-dup structure WITHIN each copy is preserved and no
artificial 10x-wide duplicate clusters appear (plain text copies would
turn every document into a 10-member exact-dup cluster and measure a
different workload entirely).  lineitem is copied with offset keys for
the scalar-projection rung (values unchanged — projection cost is
row-proportional).

Usage: python tools/scale_ladder.py [--keep]
Prints one JSON line per (entry, sf) + per-entry ratio lines + a final
verdict; exit 1 if any ratio exceeds TOLERANCE x the data growth.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hedera_etl_spark.queries import load_registry  # noqa: E402

SF01 = "/root/testdata/sf0.1"
GROWTH = 10
TOLERANCE = 1.5  # ratio may reach TOLERANCE * GROWTH before flagging
RUNS = 2

ENTRIES = [
    "llm_minhash_neardup",        # md5 canon near-dup
    "llm_minhash_neardup_fast",   # production hashed-shingle mode
    "llm_simhash_neardup",
    "llm_text_stats",
    "llm_paragraph_dedup",
    "q13_scalar_functions",
    "llm_dsir_weights",           # md5 canon importance weights (r13 rung)
    "llm_dsir_weights_fast",      # production xxhash64 bucket hash
    "llm_exact_substr",           # arbitrary-length repeat intervals (r13)
    "llm_quality_classifier",     # hashed-feature classifier scoring (r15)
]


def log(**kw):
    print(json.dumps(kw), flush=True)


def synth_sf1(spark, out_dir: str) -> None:
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    copies = []
    for i in range(GROWTH):
        c = docs.select(
            (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
            F.expr(
                f"array_join(transform(split(text, ' '), t -> concat('c{i}', t)), ' ')"
            ).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        copies.append(c)
    big = copies[0]
    for c in copies[1:]:
        big = big.unionByName(c)
    big.write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    for table, key in (("lineitem", "l_orderkey"), ("orders", "o_orderkey")):
        src = spark.read.parquet(os.path.join(SF01, f"{table}.parquet"))
        big_t = None
        for i in range(GROWTH):
            c = src.withColumn(key, F.col(key) + F.lit(i * 1_000_000_000))
            big_t = c if big_t is None else big_t.unionByName(c)
        big_t.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{table}.parquet")
        )


def materialize(df) -> None:
    cols = ", ".join(f"`{c}`" for c in df.columns)
    df.selectExpr(f"bit_xor(xxhash64({cols})) AS h").collect()


def timed(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def main():
    keep = "--keep" in sys.argv
    # quiet-start disclosure (r15, after the r14 ladder's text_stats
    # sf10 rung over-read 82.6 s in a busy session): same
    # self-identification bench.py grew in r14.
    log(loadavg_1m_at_start=round(os.getloadavg()[0], 2))
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        # r14: provision the driver like the engine's own sessions
        # (session.py uses 16g).  The bare-session default (~1g) OOM'd
        # the minhash rung when AQE's bounded broadcast promotion of
        # the shingle-set dimension (~10 MB compressed -> tens of MB
        # as a HashedRelation) landed in a driver that small — a
        # harness under-provisioning, not an engine plan hazard (the
        # promotion is capped by measured bytes; see
        # textdedup.verify_jaccard_sets adjudication).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .appName("scale_ladder")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf1_dir = tempfile.mkdtemp(prefix="sf1_ladder_")
    failures = []
    try:
        t0 = time.time()
        synth_sf1(spark, sf1_dir)
        log(step="synth_sf1", sec=round(time.time() - t0, 1), dir=sf1_dir)
        registry = load_registry()
        ratios = {}
        for name in ENTRIES:
            spec = registry[name]
            per_sf = {}
            for label, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
                fn = lambda: materialize(spec.spark_fn(spark, d))
                fn()  # warm (JIT + codegen + file listing)
                per_sf[label] = timed(fn)
                log(entry=name, sf=label, sec=per_sf[label])
            ratios[name] = round(per_sf["sf1"] / per_sf["sf0.1"], 2)
            log(entry=name, growth=GROWTH, wall_ratio=ratios[name])
            if ratios[name] > TOLERANCE * GROWTH:
                failures.append(f"{name} scaled {ratios[name]}x on {GROWTH}x data")

        # composed prepare pipeline (dedup -> floors -> sample), both scales
        from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus

        per_sf = {}
        for label, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
                "doc_id", "text"
            )
            fn = lambda: materialize(
                prepare_training_corpus(
                    docs, near_threshold=0.5, min_tokens=5, sample_rate=0.9,
                    salt="ladder",
                )
            )
            fn()
            per_sf[label] = timed(fn, runs=1)  # the heavy rung: single timed run
            log(entry="prepare_training_corpus", sf=label, sec=per_sf[label])
        r = round(per_sf["sf1"] / per_sf["sf0.1"], 2)
        ratios["prepare_training_corpus"] = r
        log(entry="prepare_training_corpus", growth=GROWTH, wall_ratio=r)
        if r > TOLERANCE * GROWTH:
            failures.append(f"prepare scaled {r}x on {GROWTH}x data")

        log(verdict="FAIL" if failures else "PASS", failures=failures,
            ratios=ratios)
        sys.exit(1 if failures else 0)
    finally:
        if not keep:
            shutil.rmtree(sf1_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
