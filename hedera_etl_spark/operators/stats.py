"""Per-query execution statistics for the batch path (ST7).

The reference scrapes each BigQuery job's statistics after it finishes —
runtime and DML-affected rows into gauges (TemplateQuery.java:67-77).
The Spark-native mirror: every instrumented action rides an
``Observation`` (the exact mechanism the streaming ingest already uses
per micro-batch) for the row count, and wall-clock wrapping for the
runtime.  A JVM ``QueryExecutionListener`` would capture the same
numbers, but classic PySpark has no Python-side batch listener API (only
streaming has ``StreamingQueryListener``) — a py4j callback listener
would couple the engine to gateway internals, while ``observe`` is
public, codegen-friendly, and adds one scalar aggregate to the plan.

Usage::

    runner = InstrumentedRunner()
    rows = runner.collect("q04_minmax_probe", df)          # read path
    runner.write("ingest_append", typed,
                 lambda d: d.write.mode("append").parquet(path))
    runner.registry.latest("q04_minmax_probe").runtime_ms
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


@dataclass
class QueryStats:
    """One job's statistics — the runtime/affected-rows gauge pair."""

    name: str
    runtime_ms: float
    rows: int


@dataclass
class QueryStatsRegistry:
    """Driver-side gauge registry: history plus last-value per name
    (the AtomicLong gauges of TemplateQuery.Metrics)."""

    history: list = field(default_factory=list)

    def record(self, stats: QueryStats) -> None:
        self.history.append(stats)

    def latest(self, name: str) -> QueryStats | None:
        for s in reversed(self.history):
            if s.name == name:
                return s
        return None


class InstrumentedRunner:
    """Wraps batch actions with runtime + row-count capture."""

    def __init__(self, registry: QueryStatsRegistry | None = None):
        self.registry = registry or QueryStatsRegistry()

    def _observed(self, name: str, df: DataFrame) -> tuple[DataFrame, Observation]:
        obs = Observation(f"stats_{name}_{len(self.registry.history)}")
        return df.observe(obs, F.count(F.lit(1)).alias("rows")), obs

    def collect(self, name: str, df: DataFrame) -> list:
        """Run a read query to collect(), recording stats."""
        observed, obs = self._observed(name, df)
        t0 = time.time()
        out = observed.collect()
        self.registry.record(
            QueryStats(name, (time.time() - t0) * 1000.0, obs.get["rows"])
        )
        return out

    def write(self, name: str, df: DataFrame, writer_fn) -> None:
        """Run a write action (``writer_fn(observed_df)``), recording
        stats — ``rows`` is the written-row count, the analogue of the
        reference's NumDmlAffectedRows gauge."""
        observed, obs = self._observed(name, df)
        t0 = time.time()
        writer_fn(observed)
        self.registry.record(
            QueryStats(name, (time.time() - t0) * 1000.0, obs.get["rows"])
        )
