"""Round-4 stage-level profiling of the three data-proportional heavies.

Honest methodology (per docs/PERF_NOTES.md): the DataFrame is REBUILT for
every timed run (re-collecting a built DataFrame reuses completed shuffle
map stages and undermeasures).  Planning time (analysis+optimization via
queryExecution().executedPlan()) is reported separately from execution so
we know whether seconds live driver-side or executor-side.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hedera_etl_spark.session import get_spark
from hedera_etl_spark.tables import ensure_parallelism, load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def mat(df):
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)")).collect()


def timeit(label, build, runs=3):
    """build() returns a fresh DataFrame; we time plan & total separately."""
    best_plan = best_total = None
    for _ in range(runs):
        t0 = time.time()
        df = build()
        h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
        out = df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)"))
        out._jdf.queryExecution().executedPlan()  # force analysis+optimization
        t1 = time.time()
        out.collect()
        t2 = time.time()
        bp, bt = t1 - t0, t2 - t0
        best_plan = bp if best_plan is None else min(best_plan, bp)
        best_total = bt if best_total is None else min(best_total, bt)
    print(f"{label:46s} plan {best_plan:6.3f}s  total {best_total:7.3f}s")
    return best_total


def main():
    spark = get_spark("profile-r4")
    for t in ("events", "documents"):
        mat(load_table(spark, SF_DIR, t).persist())

    from hedera_etl_spark.operators.textdedup import (
        lsh_candidates,
        minhash_lsh_neardups,
        minhash_signatures_from_sets,
        shingle_sets,
        simhash_fingerprints,
        verify_jaccard_sets,
    )
    from hedera_etl_spark.queries.textops import neardup_docs
    from hedera_etl_spark.queries.txops import tx_json_corpus
    from hedera_etl_spark.transform import parse_transactions

    print("== hed_tx_transform ==")
    timeit("corpus to_json only", lambda: tx_json_corpus(spark, SF_DIR))

    def tx_parse_count():
        valid, _ = parse_transactions(tx_json_corpus(spark, SF_DIR))
        return valid.select(F.lit(1).alias("one"))

    timeit("corpus+parse (count proxy)", tx_parse_count)

    def tx_full():
        from hedera_etl_spark.queries import load_registry

        return load_registry()["hed_tx_transform"].spark_fn(spark, SF_DIR)

    timeit("full registry query", tx_full)

    print("== llm_minhash_neardup ==")
    docs = neardup_docs(spark, SF_DIR)
    timeit("shingle_sets (size only)",
           lambda: shingle_sets(ensure_parallelism(docs), 3).select("doc_id", F.size("sh_set")))
    timeit("sets -> signatures",
           lambda: minhash_signatures_from_sets(
               shingle_sets(ensure_parallelism(docs), 3), 9, with_size=True))

    def cand_build():
        sets = shingle_sets(ensure_parallelism(docs), 3)
        sig = minhash_signatures_from_sets(sets, 9, with_size=True)
        return lsh_candidates(sig, 3, 3, max_bucket=500)

    timeit("... + candidates", cand_build)
    timeit("full pipeline",
           lambda: minhash_lsh_neardups(docs, 3, 9, 3, 0.5, 500))

    print("== llm_simhash_fp ==")
    docs2 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    timeit("full fingerprint",
           lambda: simhash_fingerprints(docs2).orderBy("doc_id"))


if __name__ == "__main__":
    main()
