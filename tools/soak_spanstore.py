"""sf0.1-scale soak of the r13 incremental ExactSubstr stage: many
epochs of overlapping boilerplate through CorpusIngestPipeline with
exact_substr_min_len set, then the three durability invariants every
store here must hold (the soak ritual — each store soak so far has
found a real bug):

1. cross-epoch cutting actually happens at scale: boilerplate runs
   planted in epoch 1 are absent from every LATER epoch's shipped
   text (any alignment), while each epoch's novel text ships;
2. full fresh-checkpoint replay of all epochs is byte-deterministic:
   the corpus table re-derives identically and no metric
   double-counts;
3. store compaction folds the per-epoch batch dirs and the SAME
   replay still re-derives the identical corpus (origin-attributed
   exclusion across folded dirs).

Corpus: sf0.1 documents sliced into N_EPOCHS disjoint epochs; every
doc in epochs >= 2 gets the epoch-1 BOILER run spliced mid-text at a
doc-dependent position (alignment varies per doc), so the span stage
has real cutting work in every epoch.

Run: python tools/soak_spanstore.py [sf_dir] [workdir]
Prints one JSON line per check; exits 1 on any violated invariant.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N_EPOCHS = 6
MIN_LEN = 8
BOILER = " ".join(f"bl{i}" for i in range(12))  # 12-token planted run


def log(**kw):
    print(json.dumps(kw), flush=True)


def fail(msg):
    log(check="FAIL", detail=msg)
    sys.exit(1)


def write_epoch(spark, in_dir: str, docs, epoch: int) -> None:
    rows = docs.filter(F.col("doc_id") % N_EPOCHS == epoch).select(
        "doc_id", "text"
    )
    if epoch >= 1:
        # splice the epoch-1-shipped boiler run mid-text at a
        # doc-dependent token offset: every later epoch carries the run
        # at a DIFFERENT alignment
        rows = rows.select(
            "doc_id",
            F.expr(
                "array_join(concat("
                " slice(split(text, ' '), 1, 3 + cast(doc_id % 7 as int)),"
                f" split('{BOILER}', ' '),"
                " slice(split(text, ' '), 4 + cast(doc_id % 7 as int), 100000)"
                "), ' ')"
            ).alias("text"),
        )
    payload = rows.select(
        F.to_json(F.struct("doc_id", "text")).alias("value")
    )
    payload.coalesce(2).write.mode("overwrite").text(
        os.path.join(in_dir, f"stage-e{epoch}")
    )
    for f in os.listdir(os.path.join(in_dir, f"stage-e{epoch}")):
        if f.endswith(".txt"):
            os.rename(
                os.path.join(in_dir, f"stage-e{epoch}", f),
                os.path.join(in_dir, f"e{epoch}-{f}"),
            )
    shutil.rmtree(os.path.join(in_dir, f"stage-e{epoch}"))


def make_pipe(spark, work: str, tag: str, in_dir: str):
    from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline

    return CorpusIngestPipeline(
        spark,
        input_dir=in_dir,
        corpus_table=os.path.join(work, "corpus"),
        store_path=os.path.join(work, "store"),
        checkpoint=os.path.join(work, f"ckpt-{tag}"),
        exact_substr_min_len=MIN_LEN,
        min_tokens=2,
    )


def corpus_fingerprint(pipe):
    df = pipe.read_corpus()
    row = df.agg(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(doc_id, text))").alias("sig"),
    ).collect()[0]
    return int(row["n"]), int(row["sig"])


def main():
    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("soak_spanstore")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from hedera_etl_spark.session import configure_session

    configure_session(spark)
    work = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="soak_span_")
    )
    in_dir = os.path.join(work, "in")
    os.makedirs(in_dir, exist_ok=True)
    try:
        docs = spark.read.parquet(
            os.path.join(SF_DIR, "documents.parquet")
        ).select("doc_id", "text")
        # seed the boiler run ONCE via a dedicated epoch-0 doc so later
        # epochs cut against committed history
        with open(os.path.join(in_dir, "e0-seed.txt"), "w") as fh:
            fh.write(
                json.dumps(
                    {"doc_id": 999_999_999, "text": f"seed intro {BOILER} seed outro"}
                )
                + "\n"
            )
        # ONE checkpoint, one drain per epoch: each epoch is its own
        # streaming batch with a stable stream-<i> bid (the tests'
        # convention) — the seed commits its spans BEFORE any epoch
        pipe = make_pipe(spark, work, "r1", in_dir)
        m0 = pipe.run_until_drained()  # the seed file alone
        total_cut = m0.dropped_exact_substr_docs
        n_batches = m0.batches
        for e in range(N_EPOCHS):
            write_epoch(spark, in_dir, docs, e)
            pipe = make_pipe(spark, work, "r1", in_dir)
            me = pipe.run_until_drained()
            total_cut += me.dropped_exact_substr_docs
            n_batches += me.batches
        shipped = pipe.read_corpus()
        # 1. the boiler run is ABSENT from every shipped doc except the
        # seed (its canonical home)
        leaked = shipped.filter(
            F.col("text").contains(BOILER)
            & (F.col("doc_id") != 999_999_999)
        ).count()
        if leaked:
            fail(f"{leaked} shipped docs still carry the planted run")
        seed = shipped.filter(F.col("doc_id") == 999_999_999).count()
        if seed != 1:
            fail("the canonical seed doc did not ship")
        n1, sig1 = corpus_fingerprint(pipe)
        log(check="cross_epoch_cut", shipped=n1, batches=n_batches,
            cut_docs=total_cut, ok=True)

        # 2. fresh-checkpoint replay: byte-identical corpus, no
        # double counts
        pipe2 = make_pipe(spark, work, "r2", in_dir)
        m2 = pipe2.run_until_drained()
        n2, sig2 = corpus_fingerprint(pipe2)
        if (n1, sig1) != (n2, sig2):
            fail(f"replay drifted: {(n1, sig1)} vs {(n2, sig2)}")
        if m2.accepted != 0 or m2.dropped_exact_substr_docs != 0:
            fail("replay double-counted")
        if m2.replayed_batches != m2.batches:
            fail("replay did not recognize committed batches")
        log(check="replay_deterministic", ok=True)

        # 3. compact the span store, replay again: identical corpus
        from hedera_etl_spark.operators.spandedup import SpanHashStore

        store = SpanHashStore(spark, os.path.join(work, "store", "spans"))
        folded = store.compact()
        pipe3 = make_pipe(spark, work, "r3", in_dir)
        m3 = pipe3.run_until_drained()
        n3, sig3 = corpus_fingerprint(pipe3)
        if (n1, sig1) != (n3, sig3):
            fail("post-compaction replay drifted")
        log(check="compaction_replay_heal", folded=folded, ok=True)
        log(verdict="PASS", epochs=n_batches, shipped=n1)
        sys.exit(0)
    finally:
        if len(sys.argv) <= 2:
            shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
