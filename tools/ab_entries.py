"""Per-entry alternating A/B harness (VERDICT r15 #3): times selected
bench entries with bench.py's exact methodology (persisted inputs,
whole-set untimed warmup, min of N xxhash64 materializations) from any
tree, so frozen-vs-HEAD runs can be interleaved within one quiet window:

    python tools/ab_entries.py <repo_root> <sf_dir> <runs> name [name...]

Prints one JSON line per entry plus a summary line.  Include an
UNTOUCHED control entry in every run — a degraded-VM window inflates
the control and the candidates together, a real change moves only the
candidates (the r15 degraded-window protocol).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = sys.argv[1]
SF_DIR = sys.argv[2]
RUNS = int(sys.argv[3])
NAMES = sys.argv[4:]

sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from hedera_etl_spark.queries import load_registry  # noqa: E402
from hedera_etl_spark.session import get_spark  # noqa: E402
from hedera_etl_spark.tables import TABLE_NAMES, load_table  # noqa: E402


def materialize(df) -> None:
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)")).collect()


def main() -> None:
    spark = get_spark("ab-entries")
    for t in TABLE_NAMES:
        materialize(load_table(spark, SF_DIR, t).persist())
    registry = load_registry()
    specs = {n: registry[n] for n in NAMES}
    for name, spec in specs.items():  # untimed warmup pass
        materialize(spec.spark_fn(spark, SF_DIR))
    out = {}
    for name, spec in specs.items():
        runs = []
        for _ in range(RUNS):
            t0 = time.time()
            materialize(spec.spark_fn(spark, SF_DIR))
            runs.append(round(time.time() - t0, 3))
        out[name] = min(runs)
        print(json.dumps({"entry": name, "runs": runs, "min": min(runs),
                          "repo": REPO}), flush=True)
    print(json.dumps({"repo": REPO, "mins": out,
                      "loadavg": round(os.getloadavg()[0], 2)}), flush=True)


if __name__ == "__main__":
    main()
