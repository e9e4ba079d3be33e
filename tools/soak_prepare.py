"""sf0.1-scale soak of the FULL prepare pipeline with embeddings
(VERDICT r7 #5): PCA-projected vectors, semantic dedup against the
persisted IVF history, across 3 streamed epochs plus two failure
injections (a post-crash job retry and a marker-lost crash window).

Epochs (each = one prepare_training_corpus call sharing one
embedding_index_path, the batch analogue of a streamed corpus):
  1. docs 0..2499 (vec_ids 0..1999 embedded, 500 unembedded) — all
     novel: survivors seed the corpus + IVF index;
  2. SEMANTIC twins of the 2000 embedded epoch-1 docs under new ids:
     lexically novel texts (pass exact/near/span stages) but
     epoch-1 vectors + tiny noise -> every one must drop against the
     IVF HISTORY, none against lexical stages;
  2r. byte-identical RETRY of epoch 2 (post-crash job rerun): decisions
     must be identical and the index must not grow (content-derived
     batch fingerprint skips the committed append);
  2c. CRASH WINDOW: delete epoch-1's batch marker (append landed,
     marker didn't — the documented window), re-run epoch 2: lists may
     hold duplicated rows, but decisions and corpus rows must be
     UNCHANGED (history probes dedup hits by vec_id);
  3. docs 2500..4999 with FRESH random embeddings under new vec_ids —
     novel content: accepted, index grows by the survivors.

PCA realism: vectors are the documents' 64-d embeddings projected onto
the top-16 principal components fit on the full table (embedpca), so
the index exercises the reduced-dimension path a production pipeline
would run.

Run: python tools/soak_prepare.py [sf_dir] [workdir]
"""

from __future__ import annotations

import json
import os
import random
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from hedera_etl_spark.operators.embedpca import pca_components, pca_project
from hedera_etl_spark.operators.llm_pipeline import prepare_training_corpus
from hedera_etl_spark.operators.stats import cap_counts
from hedera_etl_spark.operators.vectorindex import IVFIndex
from hedera_etl_spark.session import get_spark
from hedera_etl_spark.tables import load_table

DIMS_IN = 64
DIMS = 16
THRESHOLD = 0.99
CENTROIDS = 16


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    work = sys.argv[2] if len(sys.argv) > 2 else "/tmp/prepare_soak"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    ivf = os.path.join(work, "ivf")

    spark = get_spark("prepare-soak")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    emb64 = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # PCA: fit on the WHOLE table (one covariance aggregate), project to
    # 16 dims — the vectors every epoch below indexes/probes
    t0 = time.perf_counter()
    comps, variances = pca_components(emb64, dims=DIMS_IN, k=DIMS)
    proj = pca_project(emb64, comps).select(
        "vec_id", F.col("proj").cast("array<float>").alias("embedding")
    )
    proj_rows = {r["vec_id"]: r["embedding"] for r in proj.collect()}
    pca_secs = time.perf_counter() - t0
    print(f"pca: fit+project {len(proj_rows)} vecs in {pca_secs:.1f}s, "
          f"top-var {variances[0]:.4f}")

    doc_rows = {r["doc_id"]: r["text"] for r in docs.collect()}

    def docs_df(pairs):
        return spark.createDataFrame(pairs, "doc_id long, text string")

    def emb_df(pairs):
        return spark.createDataFrame(pairs, "vec_id long, embedding array<float>")

    def run_epoch(name, d, e):
        t0 = time.perf_counter()
        caps: dict = {}
        out = prepare_training_corpus(
            d,
            near_threshold=0.5,
            min_tokens=5,
            embeddings=e,
            embedding_index_path=ivf,
            embedding_threshold=THRESHOLD,
            embedding_n_probe=2,
            embedding_centroids=CENTROIDS,
            embedding_dims=DIMS,
            cap_observations=caps,
        )
        ids = sorted(r["doc_id"] for r in out.collect())
        dt = time.perf_counter() - t0
        idx_rows = IVFIndex(spark, ivf).lists().count()
        rec = dict(
            epoch=name, secs=round(dt, 2), rows_in=d.count(),
            survivors=len(ids), index_rows=idx_rows,
            caps={k: v for k, v in cap_counts(caps).items()},
        )
        print(rec)
        return ids, rec

    report = []
    rng = random.Random(8)

    # epoch 1: first half, novel
    e1_docs = [(i, doc_rows[i]) for i in range(2500)]
    e1_emb = [(i, list(proj_rows[i])) for i in range(2000)]
    s1, rec = run_epoch("e1_seed", docs_df(e1_docs), emb_df(e1_emb))
    report.append(rec)
    s1_embedded = [i for i in s1 if i < 2000]

    # epoch 1c: CRASH WINDOW — delete epoch 1's batch marker (append
    # landed, marker lost: the documented window), re-run epoch 1.  The
    # re-append may DUPLICATE epoch-1 rows in the lists; decisions must
    # be unchanged, and the duplicated history must not flip any later
    # probe (hits dedup by vec_id).
    batches = os.path.join(ivf, "_batches")
    biggest = max(os.listdir(batches), key=lambda m: int(m.split("-")[1]))
    shutil.rmtree(os.path.join(batches, biggest))
    idx_before_crash = IVFIndex(spark, ivf).lists().count()
    s1c, rec = run_epoch("e1_crash_window", docs_df(e1_docs), emb_df(e1_emb))
    report.append(rec)
    assert s1c == s1, "crash-window replay changed decisions"
    assert rec["index_rows"] > idx_before_crash, (
        "lost-marker replay must re-append (duplicates allowed)"
    )

    # epoch 2: semantic twins of the embedded epoch-1 SURVIVORS under
    # new ids — lexically novel, semantically near-identical
    def twin_text(i):
        w = [f"w{rng.randrange(10_000)}" for _ in range(10)]
        return f"semantic twin {i} " + " ".join(w)

    def jitter(v):
        return [x + rng.uniform(-1e-4, 1e-4) for x in v]

    e2_docs = [(10_000_000 + i, twin_text(i)) for i in s1_embedded]
    e2_emb = [(10_000_000 + i, jitter(proj_rows[i])) for i in s1_embedded]
    s2, rec = run_epoch("e2_twins", docs_df(e2_docs), emb_df(e2_emb))
    report.append(rec)
    assert s2 == [], f"{len(s2)} semantic twins escaped the history probe"

    # epoch 2r: identical retry (post-crash rerun) — same decisions,
    # index unchanged
    idx_before = IVFIndex(spark, ivf).lists().count()
    s2r, rec = run_epoch("e2_retry", docs_df(e2_docs), emb_df(e2_emb))
    report.append(rec)
    assert s2r == s2, "retry changed decisions"
    assert rec["index_rows"] == idx_before, "retry grew the index"

    # epoch 3a: 50 docs with an EMPTY embeddings frame — every doc is
    # UNEMBEDDED and must pass the semantic stage unjudged (the
    # partial-coverage rail), and the index append of the empty batch
    # must not poison the next open (the _SUCCESS-only-marker fix)
    e3a_docs = [(i, doc_rows[i]) for i in range(2500, 2550)]
    s3a, rec = run_epoch("e3_unembedded_passthrough", docs_df(e3a_docs),
                         emb_df([]))
    report.append(rec)
    lex_only = sorted(
        r["doc_id"]
        for r in prepare_training_corpus(
            docs_df(e3a_docs), near_threshold=0.5, min_tokens=5
        ).collect()
    )
    assert s3a == lex_only, "semantic stage altered unembedded docs"

    # epoch 3b: the rest of the table with FRESH random vectors — novel
    # content, accepted; the index grows by the embedded survivors
    e3b_docs = [(i, doc_rows[i]) for i in range(2550, 5000)]
    e3b_emb = [(i, [rng.uniform(-1, 1) for _ in range(DIMS)])
               for i in range(2550, 4500)]
    s3b, rec = run_epoch("e3_novel", docs_df(e3b_docs), emb_df(e3b_emb))
    report.append(rec)
    assert len(s3b) > 1500, "novel epoch unexpectedly collapsed"

    print("\nFINAL", json.dumps(report))


if __name__ == "__main__":
    main()
