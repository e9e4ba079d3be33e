"""A/B: k-pass array_min KM expansion vs single-pass aggregate fold for
MinHash signatures under hash_fn="xxhash64" (VERDICT r9 #5).

History: the r5 A/B of the same fold was a wash — but it ran under md5,
where the interpreted hex-digest parse dominated and the family
expansion was noise.  r9 shipped the xxhash64 production digest (one
native JVM call), leaving the k=9 interpreted `transform` + `array_min`
passes as the presumptive bottleneck; this tool re-measures the fold
against that baseline.

Variant A (shipped): per member i, `array_min(transform(__hs, p ->
(h1 + i*h2) % 2^32))` — k passes over the hashed array, each pass ~3
interpreted expr evals per element plus one array_min dispatch.
Variant B (fold): ONE `aggregate(__hs, array_repeat(MOD, k), (acc, p) ->
zip_with(acc, transform(sequence(0, k-1), i -> ...), least))` — one
pass, ~2k interpreted evals per element plus per-element array
allocation.

Checks value equality on real data first (the fold must be the same
math), then times (min of R) both the signature projection alone and
the full minhash_lsh_neardups query at $SPARK_GRAFT_SF_DIR.

HISTORICAL NOTE (r10): the A/B concluded "wash" and the production
xxhash64 path moved to hashed_shingle_sets (longs end-to-end, zero
digest calls in the signature stage) — minhash_lsh_neardups no longer
calls minhash_signatures_from_sets under xxhash64, so the full-query
monkeypatch below exercises the PRE-r10 string-shingle shape on both
sides.  The signatures-only comparison remains a valid fold-vs-k-pass
measurement of the KM expansion itself.

Usage: python tools/ab_minhash_fold.py [sf_dir]
Prints one JSON line per measurement + a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hedera_etl_spark.operators import textdedup  # noqa: E402
from hedera_etl_spark.operators.textdedup import (  # noqa: E402
    _KM_MOD,
    _U32,
    minhash_lsh_neardups,
    minhash_signatures_from_sets,
    shingle_sets,
)

RUNS = 3
K = 9


def fold_signatures_from_sets(
    sets: DataFrame, k: int = 9, with_size: bool = False, hash_fn: str = "xxhash64"
) -> DataFrame:
    """Variant B: single-pass running-min fold over the hashed set."""
    assert hash_fn == "xxhash64"
    hs_expr = (
        "transform(transform(sh_set, s -> xxhash64(s)), x -> named_struct("
        f"'h1', shiftright(x, 32) & {_U32}, "
        f"'h2', x & {_U32})) AS __hs"
    )
    hashed = sets.selectExpr(
        "doc_id", "CAST(size(sh_set) AS BIGINT) AS __n", hs_expr
    )
    fold = (
        f"aggregate(__hs, array_repeat(CAST({_KM_MOD} AS BIGINT), {k}), "
        f"(acc, p) -> zip_with(acc, "
        f"transform(sequence(0, {k - 1}), i -> (p.h1 + i * p.h2) % {_KM_MOD}), "
        "(a, b) -> least(a, b))) AS __f"
    )
    folded = hashed.selectExpr("doc_id", "__n", fold)
    cols = [f"__f[{i}] AS mh_{i}" for i in range(k)]
    if with_size:
        cols.append("__n")
    return folded.selectExpr("doc_id", *cols)


def timed(fn, runs=RUNS):
    best = None
    for _ in range(runs):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return round(best, 3)


def materialize(df: DataFrame) -> None:
    cols = ", ".join(f"`{c}`" for c in df.columns)
    df.selectExpr(f"bit_xor(xxhash64({cols})) AS h").collect()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("ab_minhash_fold")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = (
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .persist()
    )
    docs.count()

    # equality first: identical mh values on the full table
    sets = shingle_sets(docs, 3)
    a = minhash_signatures_from_sets(sets, K, hash_fn="xxhash64")
    b = fold_signatures_from_sets(sets, K)
    mism = a.exceptAll(b).count() + b.exceptAll(a).count()
    log = lambda **kw: print(json.dumps(kw), flush=True)
    log(check="fold_equals_kpass", mismatched_rows=mism)
    if mism:
        sys.exit(1)

    # warmup both shapes, then min-of-RUNS
    for df in (a, b):
        materialize(df)
    t_sig_a = timed(lambda: materialize(
        minhash_signatures_from_sets(shingle_sets(docs, 3), K, hash_fn="xxhash64")
    ))
    t_sig_b = timed(lambda: materialize(
        fold_signatures_from_sets(shingle_sets(docs, 3), K)
    ))
    log(stage="signatures_only", kpass_sec=t_sig_a, fold_sec=t_sig_b,
        fold_over_kpass=round(t_sig_b / t_sig_a, 3))

    def full_query():
        materialize(
            minhash_lsh_neardups(docs, n=3, k=K, hash_fn="xxhash64")
        )

    orig = textdedup.minhash_signatures_from_sets
    full_query()  # warm
    t_full_a = timed(full_query)
    textdedup.minhash_signatures_from_sets = (
        lambda sets, k=9, with_size=False, hash_fn="md5": fold_signatures_from_sets(
            sets, k, with_size=with_size, hash_fn="xxhash64"
        )
    )
    try:
        full_query()  # warm the patched shape
        t_full_b = timed(full_query)
    finally:
        textdedup.minhash_signatures_from_sets = orig
    log(stage="full_neardup_query", kpass_sec=t_full_a, fold_sec=t_full_b,
        fold_over_kpass=round(t_full_b / t_full_a, 3))
    log(
        verdict="fold_wins" if t_full_b < 0.95 * t_full_a
        else ("wash" if t_full_b < 1.05 * t_full_a else "kpass_wins"),
        sf_dir=sf_dir,
    )


if __name__ == "__main__":
    main()
