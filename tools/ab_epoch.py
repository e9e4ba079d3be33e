"""Paired A/B for the bench's streaming-epoch row (VERDICT r15 #5/#8):
replicates bench.py's epoch methodology (staged JSONL input, fresh
store/checkpoint/corpus dirs per run, one untimed warmup + N timed
runs) from ANY tree so frozen-vs-HEAD runs can alternate within one
quiet window:

    python tools/ab_epoch.py <repo_root> <sf_dir> <runs> [--tenx]

Prints one JSON line with the per-run walls and the min.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = sys.argv[1]
SF_DIR = sys.argv[2]
RUNS = int(sys.argv[3])
TENX = "--tenx" in sys.argv[4:]

sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.tables import load_table  # noqa: E402


def main() -> None:
    spark = get_spark("ab-epoch")
    from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline

    tmp_root = tempfile.mkdtemp(prefix="ab-epoch-")
    try:
        in_dir = os.path.join(tmp_root, "in")
        base = load_table(spark, SF_DIR, "documents")
        if TENX:  # the bench's 10x rung synthesis (disjoint shingle spaces)
            big = None
            for i in range(10):
                c = base.select(
                    (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                    F.expr(
                        f"array_join(transform(split(text, ' '), "
                        f"t -> concat('c{i}', t)), ' ')"
                    ).alias("text"),
                    "source", "lang",
                )
                big = c if big is None else big.unionByName(c)
            base_stream = big
            n_files = 8
        else:
            base_stream = base
            n_files = 4
        stream_docs = base_stream.select(
            F.to_json(
                F.struct(
                    F.col("doc_id"),
                    F.concat(
                        F.lit("intro "), F.col("doc_id").cast("string"),
                        F.lit("\n\n"),
                        F.lit("This website uses cookies to improve your experience."),
                        F.lit("\n\n"), F.col("text"),
                    ).alias("text"),
                    F.concat(
                        F.lit("https://"), F.col("source"),
                        F.lit(".example.com/"), F.col("lang"), F.lit("/page-"),
                        F.when(
                            F.col("doc_id") % 10 == 0,
                            (F.col("doc_id") % 50).cast("string"),
                        ).otherwise(F.col("doc_id").cast("string")),
                        F.when(
                            F.col("doc_id") % 2 == 0,
                            F.lit("?utm_source=feed&a=1"),
                        ).otherwise(F.lit("?a=1")),
                    ).alias("url"),
                )
            ).alias("value")
        )
        stream_docs.coalesce(n_files).write.mode("overwrite").text(in_dir)
        stream_eval = base.filter(F.col("doc_id") % 97 == 0).select(
            "doc_id", "text"
        )

        def run_epoch(tag: str) -> float:
            root = os.path.join(tmp_root, tag)
            pipe = CorpusIngestPipeline(
                spark,
                input_dir=in_dir,
                corpus_table=os.path.join(root, "corpus"),
                store_path=os.path.join(root, "store"),
                checkpoint=os.path.join(root, "ckpt"),
                min_tokens=5,
                paragraph_dedup_sep="\n\n",
                eval_docs=stream_eval,
                url_field="url",
            )
            t0 = time.time()
            pipe.run_until_drained()
            return round(time.time() - t0, 3)

        run_epoch("warmup")
        runs = [run_epoch(f"r{i}") for i in range(RUNS)]
        print(json.dumps({
            "repo": REPO, "tenx": TENX, "runs": runs, "min": min(runs),
            "loadavg": round(os.getloadavg()[0], 2),
        }), flush=True)
    finally:
        shutil.rmtree(tmp_root, ignore_errors=True)


if __name__ == "__main__":
    main()
