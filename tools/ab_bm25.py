"""One-off A/B for llm_bm25_topk (VERDICT r6 task #1): times three
plan strategies for the BM25 scorer at sf0.1 so the winner is measured,
not guessed.  Results land in docs/PERF_NOTES.md.

  a) r6 shipped form: lazy localCheckpoint of the tokenized base shared
     by three consumers (dfmap via postings groupBy, stats, scoring);
  b) persist() of the same base instead of the checkpoint;
  c) r7 form (operators/retrieval.bm25_topk): NO shared base — one
     combined one-row aggregate (n_docs + sum_dl + per-term dfs as
     SUM(array_contains)) plus one scoring scan.

Run: python tools/ab_bm25.py [sf_dir] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from hedera_etl_spark.operators.retrieval import C1, C2, C3, bm25_topk
from hedera_etl_spark.operators.retrieval import _postings_of, _tokenized_base
from hedera_etl_spark.session import get_spark
from hedera_etl_spark.tables import load_table

TERMS = ("vector", "merge", "window", "spark", "filter")
K = 25

CONTRIB_12 = (
    "CAST((((CAST(n_docs - element_at(__dfmap, x.term) AS DOUBLE) + 0.5D)"
    "       / (CAST(element_at(__dfmap, x.term) AS DOUBLE) + 0.5D))"
    f"      * (CAST(x.tf AS DOUBLE) * CAST('{C1!r}' AS DOUBLE)))"
    "     / (CAST(x.tf AS DOUBLE)"
    f"        + (CAST('{C2!r}' AS DOUBLE)"
    f"           + CAST('{C3!r}' AS DOUBLE)"
    "             * (CAST(dl AS DOUBLE)"
    "                / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))))"
    " AS DECIMAL(38,6))"
)


def _score_over(base: DataFrame, dfmap: DataFrame, stats: DataFrame) -> DataFrame:
    return (
        base.filter(F.size("__q") > 0)
        .selectExpr(
            "doc_id",
            "dl",
            "transform(array_distinct(__q), t -> named_struct("
            "'term', t, 'tf', CAST(size(filter(__q, x -> x = t)) AS BIGINT)"
            ")) AS __tfs",
        )
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(dfmap))
        .selectExpr(
            "doc_id",
            "CAST(size(__tfs) AS BIGINT) AS n_terms_hit",
            "CAST(aggregate(__tfs, CAST(0 AS DECIMAL(38,6)),"
            f" (acc, x) -> CAST(acc + {CONTRIB_12} AS DECIMAL(38,6)))"
            " AS DOUBLE) AS score",
        )
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(K)
    )


_LIVE_BASES = []


def shared_base_form(docs: DataFrame, mode: str) -> DataFrame:
    base = _tokenized_base(docs, TERMS)
    if mode == "checkpoint":
        base = base.localCheckpoint(eager=False)
    elif mode == "persist":
        base = base.persist()
        # r7 code-review fix: the harness must unpersist the BASE after
        # each run (is_cached on the top-k result is always False), or
        # every run leaks a cached corpus and skews later timings
        _LIVE_BASES.append(base)
    dfmap = (
        _postings_of(base)
        .groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .agg(
            F.map_from_entries(F.collect_list(F.struct("term", "df"))).alias(
                "__dfmap"
            )
        )
    )
    stats = base.select(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
    )
    return _score_over(base, dfmap, stats)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("ab-bm25")
    docs = load_table(spark, sf_dir, "documents")
    docs.persist().count()  # steady-state input, as in bench.py

    def timed(label, build):
        # warmup (also verifies the result shape)
        rows = build().collect()
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = build()
            out = df.collect()
            ts.append(time.perf_counter() - t0)
            while _LIVE_BASES:
                _LIVE_BASES.pop().unpersist()
        print(f"{label:28s} min={min(ts):.3f}s  runs={sorted(round(t,3) for t in ts)}  rows={len(rows)}")
        return rows

    a = timed("a) localCheckpoint (r6)", lambda: shared_base_form(docs, "checkpoint"))
    b = timed("b) persist", lambda: shared_base_form(docs, "persist"))
    c = timed("c) two-scan (r7)", lambda: bm25_topk(docs, TERMS, k=K))
    ids = lambda rows: [(r["doc_id"], r["n_terms_hit"], round(r["score"], 6)) for r in rows]
    print("results identical:", ids(a) == ids(b) == ids(c))


if __name__ == "__main__":
    main()
