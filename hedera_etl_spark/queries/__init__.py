"""Canonical query registry — the engine's public correctness surface.

Each entry pairs a Spark implementation (``(spark, sf_dir) -> DataFrame``)
with an ANSI-SQL oracle that DuckDB runs on the same parquet tables.  The
driver hash-compares both at sf=0.01 (CORRECTNESS_r{N}.json); ``bench.py``
times a headline subset at sf=0.1.

Determinism rules applied throughout (SURVEY.md §2.9):
- every result carries a total-order ORDER BY;
- aggregates over doubles go through DECIMAL(18,2) casts on BOTH sides;
- every computed column is aliased identically on both sides;
- no approx_* / nondeterministic functions in hashed queries.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # DuckDB SQL, or None for rows-only checks
    doc: str = ""
    tags: tuple = ()
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: Optional[str], doc: str = "", tags: tuple = (), bench: bool = False):
    """Decorator registering a Spark query implementation."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc or fn.__doc__ or "", tags, bench)
        return fn

    return wrap


def load_registry() -> dict[str, QuerySpec]:
    """Import all query modules (populates REGISTRY) and return it."""
    from hedera_etl_spark.queries import core  # noqa: F401
    from hedera_etl_spark.queries import pipeline  # noqa: F401
    from hedera_etl_spark.queries import textops  # noqa: F401
    from hedera_etl_spark.queries import simops  # noqa: F401
    from hedera_etl_spark.queries import mmops  # noqa: F401
    from hedera_etl_spark.queries import txops  # noqa: F401
    from hedera_etl_spark.queries import extops  # noqa: F401

    return REGISTRY
