"""One-off A/B for the ExactSubstr span-dedup path (VERDICT r6 task #2):

  hash:  old concat_ws(span)->xxhash64 vs new dual-31-bit Horner
         polynomial over per-token residues (operators/spandedup);
  plan:  double-evaluated _span_rows subtree vs lazy localCheckpoint
         in remove_repeated_spans.

Run: python tools/ab_span.py [sf_dir] [n] [runs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, functions as F

from hedera_etl_spark.operators import spandedup
from hedera_etl_spark.session import get_spark
from hedera_etl_spark.tables import load_table


def _span_rows_concat(docs: DataFrame, n: int) -> DataFrame:
    """The r6 form: per-span string concat + xxhash64."""
    toked = docs.select(
        F.col("doc_id"), F.split("text", " ").alias("__toks")
    )
    tc = F.col("__toks")
    spans = F.when(
        F.size(tc) < n, F.array().cast("array<struct<pos:int,h:bigint>>")
    ).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(n - 1)),
            lambda i: F.struct(
                i.cast("int").alias("pos"),
                F.xxhash64(
                    F.concat_ws(" ", *[F.element_at(tc, i + j) for j in range(n)])
                ).alias("h"),
            ),
        )
    )
    return (
        toked.withColumn("__sp", spans)
        .select("doc_id", F.explode_outer("__sp").alias("s"))
        .filter(F.col("s").isNotNull())
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.h").alias("h"))
    )


def flags_of(rows: DataFrame) -> DataFrame:
    flagged = (
        rows.groupBy("h")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 2)
        .select("h")
    )
    return rows.join(flagged, "h").select("doc_id", "pos")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark("ab-span")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.persist().count()

    def timed(label, build, action):
        action(build())  # warmup
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            action(build())
            ts.append(time.perf_counter() - t0)
        print(f"{label:44s} min={min(ts):.3f}s  runs={sorted(round(t,3) for t in ts)}")

    count = lambda df: df.count()
    # hash A/B: count the flag set either way
    timed(f"hash=concat+xxhash64 flags (n={n})",
          lambda: flags_of(_span_rows_concat(docs, n)), count)
    # label note: this times whatever spandedup._span_rows SHIPS (the
    # slice-of-token-hashes form since r7), not the rejected polynomial
    timed(f"hash=shipped _span_rows flags (n={n})",
          lambda: flags_of(spandedup._span_rows(docs, n, "text", "doc_id")), count)

    # plan A/B on the full cut path: double-eval vs lazy checkpoint
    def cut_ckpt():
        rows = spandedup._span_rows(docs, n, "text", "doc_id").localCheckpoint(
            eager=False
        )
        flagged = rows.join(
            rows.groupBy("h").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= 2).select("h"),
            "h",
        )
        cuts = flagged.groupBy("doc_id").agg(
            F.array_sort(F.collect_list("pos")).alias("__cuts")
        )
        return cuts

    def cut_plain():
        rows = spandedup._span_rows(docs, n, "text", "doc_id")
        flagged = rows.join(
            rows.groupBy("h").agg(F.count("*").alias("cnt"))
            .filter(F.col("cnt") >= 2).select("h"),
            "h",
        )
        return flagged.groupBy("doc_id").agg(
            F.array_sort(F.collect_list("pos")).alias("__cuts")
        )

    timed(f"cuts: double-eval subtree (n={n})", cut_plain, count)
    timed(f"cuts: lazy localCheckpoint (n={n})", cut_ckpt, count)

    a = sorted(flags_of(_span_rows_concat(docs, n)).collect())
    b = sorted(flags_of(spandedup._span_rows(docs, n, "text", "doc_id")).collect())
    print("flag sets identical:", a == b, f"({len(a)} flags)")


if __name__ == "__main__":
    main()
