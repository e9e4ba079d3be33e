"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Everything delegates to the engine's query registry
(hedera_etl_spark/queries/__init__.py): each registered QuerySpec
carries the Spark implementation and its DuckDB oracle twin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hedera_etl_spark.queries import load_registry
    from hedera_etl_spark.session import configure_session

    configure_session(spark)
    registry = load_registry()
    return registry["q05_dim_join_agg"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The driver records only the FIRST 50 entries, so this exposes the
    curated driver window (``spec.driver_visible``); entries outside it
    are transitively verified by an in-window entry AND still checked by
    the full local replica (``tools/verify_oracle.py`` iterates the whole
    registry).  A pytest pins the window at ≤50 so a new entry can never
    silently evict an old one again (the r5 failure mode)."""
    from hedera_etl_spark.queries import load_registry

    return {
        name: spec.spark_fn
        for name, spec in load_registry().items()
        if spec.driver_visible
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twin for every hash-checkable driver-window entry
    (entries with ``oracle=None`` are streaming/stateful — rows-only
    checks)."""
    from hedera_etl_spark.queries import load_registry

    return {
        name: spec.oracle
        for name, spec in load_registry().items()
        if spec.oracle is not None and spec.driver_visible
    }
