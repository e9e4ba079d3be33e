"""Composed-prepare decomposition A/B (VERDICT r15 #1/#5): times the
bench's exact prepare_training_corpus + pack_sequences call, split into

  build : Python/py4j DataFrame construction (incl. any mid-build
          driver actions, e.g. decontam auto-mode's reference count)
  plan  : forcing the physical plan of the final materialization
  exec  : executing the materialization (xxhash64 over all columns)

and counts py4j commands issued during the build — the driver-chatter
metric VERDICT r15 #1 targets.  Run it against any tree:

    python tools/ab_prepare_build.py <repo_root> [sf_dir] [runs]

Alternate frozen-tree and HEAD invocations for a paired A/B (the only
perf evidence that survives this VM's degraded windows).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
RUNS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hedera_etl_spark.operators.llm_pipeline import (  # noqa: E402
    prepare_training_corpus,
)
from hedera_etl_spark.operators.packing import pack_sequences  # noqa: E402
from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.tables import load_table  # noqa: E402


def main() -> None:
    spark = get_spark("ab-prepare-build")
    base = load_table(spark, SF_DIR, "documents")
    pdocs = base.select(
        "doc_id",
        "source",
        F.concat(
            F.lit("intro "), F.col("doc_id").cast("string"), F.lit("\n\n"),
            F.lit("This website uses cookies to improve your experience."),
            F.lit("\n\n"), F.col("text"),
        ).alias("text"),
    )
    eval_docs = base.filter(F.col("doc_id") % 97 == 0).select("doc_id", "text")

    # count py4j commands crossing the gateway during each phase
    client = spark.sparkContext._gateway._gateway_client
    orig_send = client.send_command
    counter = {"n": 0}

    def counted(*a, **kw):
        counter["n"] += 1
        return orig_send(*a, **kw)

    client.send_command = counted

    rows = []
    for i in range(RUNS + 1):  # run 0 is the untimed warmup
        c0 = counter["n"]
        t0 = time.time()
        out = prepare_training_corpus(
            pdocs,
            paragraph_dedup_sep="\n\n",
            near_threshold=0.5,
            eval_docs=eval_docs,
            decontam_mode="auto",
            min_tokens=5,
            sample_rate=0.9,
            salt="bench-prepare",
        )
        packed = pack_sequences(out, max_tokens=2048)
        h = F.xxhash64(*[F.col(c) for c in packed.columns]).alias("__h")
        mat = packed.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)"))
        t1 = time.time()
        mat._jdf.queryExecution().executedPlan()
        t2 = time.time()
        mat.collect()
        t3 = time.time()
        row = {
            "run": i,
            "warmup": i == 0,
            "build_sec": round(t1 - t0, 3),
            "plan_sec": round(t2 - t1, 3),
            "exec_sec": round(t3 - t2, 3),
            "total_sec": round(t3 - t0, 3),
            "py4j_cmds_build": counter["n"] - c0,
            "repo": REPO,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    timed = [r for r in rows if not r["warmup"]]
    print(json.dumps({
        "repo": REPO,
        "min_build": min(r["build_sec"] for r in timed),
        "min_plan": min(r["plan_sec"] for r in timed),
        "min_exec": min(r["exec_sec"] for r in timed),
        "min_total": min(r["total_sec"] for r in timed),
        "py4j_cmds_build": min(r["py4j_cmds_build"] for r in timed),
        "loadavg": round(os.getloadavg()[0], 2),
    }), flush=True)


if __name__ == "__main__":
    main()
