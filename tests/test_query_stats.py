"""Batch-path query statistics (ST7 gap from r4 VERDICT: the reference
records per-job runtime/affected-rows, TemplateQuery.java:67-77; the
streaming path had this, the batch path didn't)."""

from __future__ import annotations

from hedera_etl_spark.operators.stats import InstrumentedRunner

SF = "/root/testdata/sf0.001"


def test_registry_entry_records_runtime_and_rows(spark):
    from hedera_etl_spark.queries import load_registry

    runner = InstrumentedRunner()
    spec = load_registry()["q04_minmax_probe"]
    rows = runner.collect("q04_minmax_probe", spec.spark_fn(spark, SF))

    stats = runner.registry.latest("q04_minmax_probe")
    assert stats is not None
    assert stats.rows == len(rows) == 1
    assert stats.runtime_ms > 0


def test_write_records_affected_rows(spark, tmp_path):
    runner = InstrumentedRunner()
    df = spark.range(123)
    runner.write(
        "append_job", df, lambda d: d.write.mode("append").parquet(str(tmp_path / "t"))
    )
    stats = runner.registry.latest("append_job")
    assert stats.rows == 123
    assert stats.runtime_ms > 0
    assert spark.read.parquet(str(tmp_path / "t")).count() == 123


def test_latest_tracks_reruns_and_history_accumulates(spark):
    runner = InstrumentedRunner()
    runner.collect("q", spark.range(5))
    runner.collect("q", spark.range(7))
    assert [s.rows for s in runner.registry.history] == [5, 7]
    assert runner.registry.latest("q").rows == 7
    assert runner.registry.latest("missing") is None
