"""Split every bench query's time into plan (driver: py4j construction +
analysis + optimization) vs execution, same persisted-input methodology as
bench.py.  Guides where round-4 seconds should come from."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from hedera_etl_spark.queries import load_registry
from hedera_etl_spark.session import get_spark
from hedera_etl_spark.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def mat_df(df):
    h = F.xxhash64(*[F.col(c) for c in df.columns]).alias("__h")
    return df.select(h).agg(F.count("__h"), F.expr("bit_xor(__h)"))


def main():
    spark = get_spark("profile-bench-split")
    for t in TABLES:
        mat_df(load_table(spark, SF_DIR, t).persist()).collect()

    registry = load_registry()
    specs = {n: s for n, s in sorted(registry.items()) if s.bench}
    tot_build = tot_plan = tot_exec = 0.0
    print(f"{'query':28s} {'build':>7s} {'plan':>7s} {'exec':>7s} {'total':>7s}")
    for name, spec in specs.items():
        bb = bp = be = None
        for _ in range(3):
            t0 = time.time()
            df = spec.spark_fn(spark, SF_DIR)
            out = mat_df(df)
            t1 = time.time()
            out._jdf.queryExecution().executedPlan()
            t2 = time.time()
            out.collect()
            t3 = time.time()
            b, p, e = t1 - t0, t2 - t1, t3 - t2
            if bb is None or b + p + e < bb + bp + be:
                bb, bp, be = b, p, e
        tot_build += bb; tot_plan += bp; tot_exec += be
        print(f"{name:28s} {bb:7.3f} {bp:7.3f} {be:7.3f} {bb+bp+be:7.3f}")
    print(f"{'TOTAL':28s} {tot_build:7.3f} {tot_plan:7.3f} {tot_exec:7.3f} "
          f"{tot_build+tot_plan+tot_exec:7.3f}")


if __name__ == "__main__":
    main()
