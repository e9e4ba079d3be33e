"""FixedRateScheduler (ST5) + DedupeJob metrics (ST7) tests."""

from __future__ import annotations

from hedera_etl_spark.operators.scheduler import FixedRateScheduler, dedupe_schedule


class FakeClock:
    def __init__(self):
        self.t = 0.0

    def __call__(self):
        return self.t


def test_fixed_rate_and_no_overlap():
    clock = FakeClock()
    sched = FixedRateScheduler(clock)
    calls = []
    sched.every(300, lambda: calls.append(clock.t), "inc")

    sched.run_pending()          # t=0: due immediately
    assert calls == [0.0]
    clock.t = 299
    sched.run_pending()
    assert calls == [0.0]        # not due yet
    clock.t = 301
    sched.run_pending()
    assert calls == [0.0, 301]


def test_missed_slots_skip_not_burst():
    """A long outage yields ONE catch-up run, not a burst per missed slot."""
    clock = FakeClock()
    sched = FixedRateScheduler(clock)
    calls = []
    sched.every(300, lambda: calls.append(clock.t), "inc")
    sched.run_pending()
    clock.t = 3000               # 9 slots missed
    sched.run_pending()
    assert len(calls) == 2
    clock.t = 3001
    sched.run_pending()
    assert len(calls) == 2       # next slot is on the original grid (3300)
    clock.t = 3300
    sched.run_pending()
    assert len(calls) == 3


def test_jobs_run_in_registration_order():
    clock = FakeClock()
    sched = FixedRateScheduler(clock)
    order = []
    sched.every(300, lambda: order.append("inc"), "inc")
    sched.every(300, lambda: order.append("full"), "full")
    sched.run_pending()
    assert order == ["inc", "full"]


def test_dedupe_schedule_cadences_and_metrics(spark, tmp_path):
    """The reference cadence wiring runs the real job and accumulates
    ST7 metrics."""
    import os

    from pyspark.sql import types as T

    from hedera_etl_spark.operators.dedupe import DedupeJob, StateStore
    from tests.test_dedupe_job import ROW_SCHEMA, gen_rows

    path = os.path.join(str(tmp_path), "tx")
    spark.createDataFrame(gen_rows(30), ROW_SCHEMA).write.partitionBy(
        "part_date"
    ).parquet(path)
    job = DedupeJob(
        spark, path, StateStore(spark, os.path.join(str(tmp_path), "state")),
        key="consensus_timestamp", tiebreak="ingest_seq",
    )

    clock = FakeClock()
    sched = dedupe_schedule(job)
    sched.clock = clock
    for j in sched.jobs:
        j.next_due = 0.0
    sched.run_pending()          # runs incremental AND full at t=0

    assert job.metrics.runs == 2
    assert job.metrics.total_duplicates_removed == 6
    assert job.metrics.last_window_end > 0
    assert spark.read.parquet(path).count() == 30
    assert [j.name for j in sched.jobs] == ["incremental_dedupe", "full_dedupe"]
    assert sched.jobs[0].interval_sec == 300.0
    assert sched.jobs[1].interval_sec == 86_400.0


def test_cli_dedupe_loop_runs_scheduled_jobs(spark, tmp_path, capsys):
    """CLI --loop-every-sec drives the fixed-rate scheduler: N scheduled
    incremental runs, then exit (DedupeApplication cadence parity)."""
    import os

    from hedera_etl_spark import cli
    from tests.test_dedupe_job import ROW_SCHEMA, gen_rows

    path = os.path.join(str(tmp_path), "tx")
    spark.createDataFrame(gen_rows(30), ROW_SCHEMA).write.partitionBy(
        "part_date"
    ).parquet(path)

    rc = cli.main(
        [
            "dedupe",
            "--table", path,
            "--state", os.path.join(str(tmp_path), "state"),
            "--key", "consensus_timestamp",
            "--tiebreak", "ingest_seq",
            "--loop-every-sec", "0.2",
            "--loop-count", "2",
        ]
    )
    assert rc == 0
    # first run removed the duplicates; the table is clean afterwards
    final = spark.read.parquet(path)
    assert final.count() == 30
    assert final.select("consensus_timestamp").distinct().count() == 30


def test_failing_job_keeps_cadence_and_later_jobs_run():
    """A raising job must not abort the pass, kill later jobs, or
    hot-loop: its error is recorded and its slot advances."""
    from hedera_etl_spark.operators.scheduler import FixedRateScheduler

    t = {"now": 0.0}
    sched = FixedRateScheduler(clock=lambda: t["now"])
    calls = {"bad": 0, "good": 0}

    def bad():
        calls["bad"] += 1
        raise RuntimeError("transient")

    def good():
        calls["good"] += 1

    jbad = sched.every(10.0, bad, "bad")
    sched.every(10.0, good, "good")

    sched.run_pending()
    assert calls == {"bad": 1, "good": 1}  # good ran despite bad raising
    assert isinstance(jbad.last_error, RuntimeError)
    sched.run_pending()
    assert calls["bad"] == 1  # slot advanced: no hot-loop retry
    t["now"] = 10.5
    sched.run_pending()
    assert calls["bad"] == 2  # retried at its cadence
    assert jbad.failures == 2 and jbad.runs == 2  # attempts vs failures


def test_failure_never_exposes_stale_success():
    """A pollable health contract: after a failure, last_result is None
    (not the previous success's value) and failures counts it; a
    subsequent success restores last_result and clears last_error."""
    from hedera_etl_spark.operators.scheduler import FixedRateScheduler

    t = {"now": 0.0}
    sched = FixedRateScheduler(clock=lambda: t["now"])
    state = {"fail": False}

    def flaky():
        if state["fail"]:
            raise RuntimeError("boom")
        return "ok"

    job = sched.every(10.0, flaky, "flaky")
    sched.run_pending()
    assert job.last_result == "ok" and job.failures == 0

    state["fail"] = True
    t["now"] = 10.5
    sched.run_pending()
    assert job.last_result is None  # stale "ok" not exposed
    assert job.failures == 1 and job.runs == 2
    assert isinstance(job.last_error, RuntimeError)

    state["fail"] = False
    t["now"] = 20.5
    sched.run_pending()
    assert job.last_result == "ok" and job.last_error is None
    assert job.failures == 1 and job.runs == 3
