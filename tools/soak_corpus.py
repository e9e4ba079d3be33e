"""sf0.1-scale soak of the streaming corpus-ingestion path (VERDICT r6
task #7): pushes the documents table through CorpusIngestPipeline for
four epochs and records per-epoch latency + signature-store growth.

Epoch composition (one JSONL file per epoch, maxFilesPerTrigger=1 so
each epoch is exactly one micro-batch):
  1. the full documents table (all novel -> accepted);
  2. the same texts under NEW doc_ids (exact-content dups vs store ->
     all dropped by the content-hash anti-join);
  3. every text with one appended token, new ids (near-dups vs store ->
     dropped by the signature bucket join at the configured threshold);
  4. byte-identical replay of epoch 1's rows under epoch-1 ids but a
     NEW stream file (exact dups again — store must not grow).

Run: python tools/soak_corpus.py [sf_dir] [workdir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hedera_etl_spark.session import get_spark
from hedera_etl_spark.streaming.corpus import CorpusIngestPipeline
from hedera_etl_spark.tables import load_table


def du(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_soak"
    shutil.rmtree(work, ignore_errors=True)
    inp = os.path.join(work, "in")
    os.makedirs(inp)

    spark = get_spark("corpus-soak")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    rows = docs.collect()
    print(f"corpus: {len(rows)} docs, sf_dir={sf_dir}")

    def write_epoch(name: str, recs) -> None:
        tmp = os.path.join(work, f".{name}.tmp")
        with open(tmp, "w") as fh:
            for doc_id, text in recs:
                fh.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
        os.rename(tmp, os.path.join(inp, name))

    epochs = [
        ("epoch1.jsonl", [(r["doc_id"], r["text"]) for r in rows]),
        ("epoch2.jsonl", [(r["doc_id"] + 10_000_000, r["text"]) for r in rows]),
        (
            "epoch3.jsonl",
            [
                (r["doc_id"] + 20_000_000, r["text"] + " zzsoak")
                for r in rows
            ],
        ),
        ("epoch4.jsonl", [(r["doc_id"], r["text"]) for r in rows]),
    ]

    pipe = CorpusIngestPipeline(
        spark,
        inp,
        os.path.join(work, "corpus"),
        os.path.join(work, "store"),
        os.path.join(work, "ckpt"),
        near_threshold=0.5,
        max_files_per_trigger=1,
    )

    report = []
    for name, recs in epochs:
        write_epoch(name, recs)
        t0 = time.perf_counter()
        pipe.run_until_drained()
        dt = time.perf_counter() - t0
        s = pipe.metrics.history[-1]
        store_rows = pipe.store.content().count()
        sig_rows = pipe.store.signatures().count()
        report.append(
            dict(
                epoch=name,
                secs=round(dt, 2),
                rows_in=s.rows_in,
                accepted=s.accepted,
                exact_in_batch=s.exact_in_batch,
                exact_vs_store=s.exact_vs_store,
                near_in_batch=s.near_in_batch,
                near_vs_store=s.near_vs_store,
                store_content_rows=store_rows,
                store_sig_rows=sig_rows,
                store_bytes=du(os.path.join(work, "store")),
                corpus_bytes=du(os.path.join(work, "corpus")),
            )
        )
        print(report[-1])

    print("\nFINAL", json.dumps(report))
    corpus_rows = pipe.read_corpus().count()
    print(f"corpus table rows: {corpus_rows}")
    # invariant: effectively-once — accepted total == corpus rows, and
    # replay epochs grew the store by zero
    assert corpus_rows == sum(e["accepted"] for e in report)


if __name__ == "__main__":
    main()
