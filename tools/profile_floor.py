"""Decompose the per-query bench floor: driver-side planning vs execution.

For each bench-tagged registry entry, measures (min of N, same persisted-
table steady state as bench.py):

- t_build : construct the registry DataFrame (plan-cache hit after run 1)
- t_plan  : force queryExecution.executedPlan on the fresh xxhash64
            materialization wrapper (analysis + optimization + physical
            planning; AQE's runtime re-planning is NOT included)
- t_exec  : the subsequent .collect() (stage scheduling + tasks + AQE)
- jobs/stages/tasks : from the status tracker delta

Usage: python tools/profile_floor.py [sf_dir] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hedera_etl_spark.queries import load_registry  # noqa: E402
from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.tables import load_table  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    spark = get_spark("floor-profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    registry = load_registry()
    bench = {n: s for n, s in sorted(registry.items()) if s.bench}

    def wrap(df):
        h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
        return df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)"))

    for t in TABLES:
        wrap(load_table(spark, sf_dir, t).persist()).collect()

    # session floor reference points
    t0 = time.time(); spark.range(1).collect(); t_range = time.time() - t0
    t0 = time.time(); spark.range(1).collect(); t_range2 = time.time() - t0
    print(f"# spark.range(1).collect(): first {t_range:.3f}s, second {t_range2:.3f}s")

    rows = []
    for name, spec in bench.items():
        best = None
        for _ in range(runs):
            jobs_before = len(tracker.getJobIdsForGroup() or [])
            t0 = time.time()
            df = spec.spark_fn(spark, sf_dir)
            t1 = time.time()
            m = wrap(df)
            # force full driver-side planning (analysis+optimize+physical)
            m._jdf.queryExecution().executedPlan()
            t2 = time.time()
            m.collect()
            t3 = time.time()
            cur = dict(
                build=round(t1 - t0, 3),
                plan=round(t2 - t1, 3),
                exec=round(t3 - t2, 3),
                total=round(t3 - t0, 3),
            )
            if best is None or cur["total"] < best["total"]:
                best = cur
        rows.append((name, best))
        print(json.dumps({"query": name, **best}))

    tot = {k: round(sum(b[k] for _, b in rows), 2)
           for k in ("build", "plan", "exec", "total")}
    print(json.dumps({"query": "TOTAL", **tot}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
