"""Streaming-epoch scale ladder (r12): the batch ladders
(tools/scale_ladder*.py) prove sublinearity for the batch operators;
this measures the CONTINUOUS-INGEST path — one drained
``CorpusIngestPipeline`` epoch (canonical-URL dedup -> quality floor ->
eval decontamination -> paragraph dedup -> incremental store dedup ->
rename-committed corpus batch) — at three corpus sizes:

    sf0.01 documents (500 docs) -> sf0.1 (5,000) -> 10x-synth (50,000)

The 10x rung synthesizes token-prefixed copies of sf0.1 (disjoint
shingle spaces, the scale_ladder construction) so per-copy dup
structure is preserved without artificial cross-copy clusters; URLs get
a per-copy host prefix for the same reason.

What this isolates that the batch ladder cannot: the streaming
machinery's FIXED cost (query startup, checkpoint, per-stage metric
counts, the ~15 jobs an epoch launches) versus the DATA-proportional
cost.  At small corpora the fixed term dominates — ratios far below
growth are expected; a ratio ABOVE growth would expose a compounding
constant in the store probes or commits that the per-epoch soaks
(flat store-growth wall) claim cannot exist.

Each rung: fresh store/checkpoint/corpus dirs per run (the store is
stateful), warmup run + min-of-2.

Usage: python tools/epoch_ladder.py
Prints one JSON line per rung + ratio lines + a verdict; exit 1 if any
decade ratio exceeds TOLERANCE x growth.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline  # noqa: E402

GROWTH = 10
TOLERANCE = 1.5
RUNS = 2


def log(**kw):
    print(json.dumps(kw), flush=True)


def stage_jsonl(spark, sf_dir: str, out_dir: str, copies: int = 1) -> int:
    """Write the documents table (optionally ``copies`` token-prefixed
    copies with per-copy URL hosts) as JSON-lines under ``out_dir``;
    returns the doc count."""
    base = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    frames = []
    for i in range(copies):
        text = (
            F.expr(
                f"array_join(transform(split(text, ' '), t -> concat('c{i}', t)), ' ')"
            )
            if copies > 1
            else F.col("text")
        )
        frames.append(
            base.select(
                (F.col("doc_id") + i * 1_000_000_000).alias("doc_id"),
                F.concat(
                    F.lit("intro "), F.col("doc_id").cast("string"), F.lit("\n\n"),
                    F.lit("This website uses cookies to improve your experience."),
                    F.lit("\n\n"), text,
                ).alias("text"),
                F.concat(
                    F.lit(f"https://copy{i}-"), F.col("source"),
                    F.lit(".example.com/"), F.col("lang"), F.lit("/page-"),
                    F.when(
                        F.col("doc_id") % 10 == 0,
                        (F.col("doc_id") % 50).cast("string"),
                    ).otherwise(F.col("doc_id").cast("string")),
                    F.when(
                        F.col("doc_id") % 2 == 0, F.lit("?utm_source=feed&a=1")
                    ).otherwise(F.lit("?a=1")),
                ).alias("url"),
            )
        )
    docs = frames[0]
    for f in frames[1:]:
        docs = docs.unionByName(f)
    n = docs.count()
    docs.select(
        F.to_json(F.struct("doc_id", "text", "url")).alias("value")
    ).coalesce(max(4, copies)).write.mode("overwrite").text(out_dir)
    return n


def run_epoch(spark, in_dir: str, root: str, eval_docs) -> float:
    pipe = CorpusIngestPipeline(
        spark,
        input_dir=in_dir,
        corpus_table=os.path.join(root, "corpus"),
        store_path=os.path.join(root, "store"),
        checkpoint=os.path.join(root, "ckpt"),
        min_tokens=5,
        paragraph_dedup_sep="\n\n",
        eval_docs=eval_docs,
        url_field="url",
    )
    t0 = time.time()
    pipe.run_until_drained()
    return round(time.time() - t0, 3)


def main() -> int:
    spark = get_spark("epoch-ladder")
    tmp = tempfile.mkdtemp(prefix="epoch-ladder-")
    try:
        rungs = [
            ("sf0.01", "/root/testdata/sf0.01", 1),
            ("sf0.1", "/root/testdata/sf0.1", 1),
            ("sf0.1x10", "/root/testdata/sf0.1", GROWTH),
        ]
        walls: dict[str, float] = {}
        sizes: dict[str, int] = {}
        for tag, sf_dir, copies in rungs:
            in_dir = os.path.join(tmp, f"in-{tag}")
            n = stage_jsonl(spark, sf_dir, in_dir, copies)
            eval_docs = (
                spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
                .filter(F.col("doc_id") % 97 == 0)
                .select("doc_id", "text")
            )
            runs = []
            for i in range(RUNS + 1):  # first is the warmup
                wall = run_epoch(
                    spark, in_dir, os.path.join(tmp, f"{tag}-r{i}"), eval_docs
                )
                if i > 0:
                    runs.append(wall)
            walls[tag] = min(runs)
            sizes[tag] = n
            log(rung=tag, n_docs=n, epoch_sec=walls[tag], runs=runs)
        r1 = round(walls["sf0.1"] / walls["sf0.01"], 2)
        r2 = round(walls["sf0.1x10"] / walls["sf0.1"], 2)
        log(decade1_sf001_to_sf01=r1, decade2_sf01_to_x10=r2,
            docs_per_sec_at_x10=round(sizes["sf0.1x10"] / walls["sf0.1x10"], 1))
        ok = r1 < TOLERANCE * GROWTH and r2 < TOLERANCE * GROWTH
        log(verdict="PASS" if ok else "FAIL",
            criteria=f"each decade ratio < {TOLERANCE} x {GROWTH}")
        return 0 if ok else 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    sys.exit(main())
