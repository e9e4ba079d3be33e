"""Soak the edit-distance fuzzy join at sf0.1 with realistic key lengths
(VERDICT r8 #3): URL-shaped 60-100 char keys, d=1 and d=2, brute-force
cross-check, candidate-explosion and cap accounting.

The r8 concern: the candidate side explodes O(|key| * d) substrings per
row, so constants measured on 12-char hex keys say nothing about
URL-length keys.  This drives the operator at sf0.1 corpus size with
long keys, times it, counts the exploded candidate rows and the blocked
pre-verify pairs, reads the hot-segment cap, and pins soundness against
the brute-force pair set.

Usage: python tools/soak_fuzzyjoin.py [sf_dir] [d ...]
Prints one JSON line per d.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hedera_etl_spark.operators.fuzzyjoin import (  # noqa: E402
    _substrings_expr,
    fuzzy_neardup_pairs,
)
from hedera_etl_spark.operators.stats import cap_counts  # noqa: E402
from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.tables import load_table  # noqa: E402


def url_corpus(spark, sf_dir: str):
    """URL-shaped keys, 60-100 chars: a boilerplate scheme+host prefix
    (the skew hazard every real URL corpus has), a path from two md5
    digests, and a variable-length suffix.  Mutants: every 13th doc gets
    a 1-substitution twin, every 29th a 2-edit twin (substitution +
    insertion), planted far from the shared prefix so the edit can land
    in any segment."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    h = F.md5(F.col("doc_id").cast("string"))
    h2 = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit("salt")))
    key = F.concat(
        F.lit("https://crawl.example.org/"),
        F.substring(h, 1, 16), F.lit("/"),
        F.substring(h2, 1, 16), F.lit("/page-"),
        # variable tail: 2-42 extra chars so lengths span ~60-100
        F.substring(F.concat(h, h2), 1, (F.col("doc_id") % 41 + 2).cast("int")),
    )
    base = docs.select(F.col("doc_id").alias("id"), key.alias("key"))
    mut1 = base.filter(F.col("id") % 13 == 0).select(
        (F.col("id") + 10_000_000).alias("id"),
        F.concat(
            F.substring("key", 1, 30), F.lit("Z"),
            F.expr("substring(key, 32)"),
        ).alias("key"),
    )
    mut2 = base.filter(F.col("id") % 29 == 0).select(
        (F.col("id") + 20_000_000).alias("id"),
        F.concat(
            F.substring("key", 1, 40), F.lit("Q"),
            F.expr("substring(key, 42)"), F.lit("x"),
        ).alias("key"),
    )
    return base.unionByName(mut1).unionByName(mut2)


def brute_pairs(corpus, d: int):
    # the BNLJ's parallelism is the STREAMED side's partition count — a
    # single-file corpus would run the whole n^2 sweep on one core
    a = corpus.repartition(32).select(
        F.col("id").alias("id_a"), F.col("key").alias("key_a")
    )
    b = corpus.select(F.col("id").alias("id_b"), F.col("key").alias("key_b"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("key_a") - F.length("key_b")) <= d
        )  # same length filter the operator applies — keeps the cross
        # join's levenshtein work bounded without changing the answer
        .withColumn("dist", F.levenshtein("key_a", "key_b"))
        .filter(F.col("dist") <= d)
        .select("id_a", "id_b")
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dists = [int(x) for x in sys.argv[2:]] or [1, 2]
    spark = get_spark("soak-fuzzyjoin")
    corpus = url_corpus(spark, sf_dir).persist()
    n = corpus.count()
    lens = corpus.select(
        F.min(F.length("key")).alias("lo"),
        F.max(F.length("key")).alias("hi"),
        F.avg(F.length("key")).alias("avg"),
    ).first()

    rc = 0
    for d in dists:
        # candidate explosion: exploded substring rows per candidate key
        cand_rows = corpus.select(
            F.explode(F.expr(_substrings_expr("key", d))).alias("s")
        ).count()
        caps: dict = {}
        t0 = time.time()
        got = {
            (r["id_a"], r["id_b"])
            for r in fuzzy_neardup_pairs(
                corpus, max_dist=d, max_segment=10_000, cap_observations=caps
            ).collect()
        }
        dt = time.time() - t0
        want = {(r["id_a"], r["id_b"]) for r in brute_pairs(corpus, d).collect()}
        ok = got == want
        if not ok:
            rc = 1
        print(
            json.dumps(
                {
                    "d": d,
                    "corpus_rows": n,
                    "key_len": [lens["lo"], lens["hi"], round(lens["avg"], 1)],
                    "pairs": len(got),
                    "sound_vs_brute": ok,
                    "missing": sorted(want - got)[:5],
                    "spurious": sorted(got - want)[:5],
                    "candidate_substring_rows": cand_rows,
                    "substring_rows_per_key": round(cand_rows / n, 1),
                    "elapsed_sec": round(dt, 2),
                    "caps": cap_counts(caps),
                }
            )
        )
    return rc


if __name__ == "__main__":
    sys.exit(main())
