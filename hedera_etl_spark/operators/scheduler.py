"""Job scheduling (ST5): the Spring @Scheduled fixed-rate analogue.

The reference runs the incremental dedup every 300 s and the full dedup
every 86,400 s on one scheduler thread, with overlapping runs queueing
(IncrementalDeduplication.java:66, FullDeduplication.java:62,
DedupeConfiguration.java:35).  This driver-side loop reproduces those
semantics: single-threaded (so runs never overlap — the single-writer
discipline the rewrite requires), fixed-rate with catch-up skip (a run
that overshoots its slot doesn't burst to make up missed ticks).

Production deployments would hand these cadences to Airflow/cron; the
loop exists so the engine is self-contained and the cadence contract is
testable.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable


@dataclass
class ScheduledJob:
    name: str
    fn: Callable[[], object]
    interval_sec: float
    next_due: float = 0.0
    #: attempts (successes + failures) — the cadence counter
    runs: int = 0
    #: failed attempts; a healthy job has failures == 0
    failures: int = 0
    #: result of the last SUCCESSFUL run (None-ed out when a run fails,
    #: so pollers never mistake a stale success for current health —
    #: check last_error/failures to distinguish)
    last_result: object = None
    last_error: object = None


class FixedRateScheduler:
    """Single-threaded fixed-rate scheduler with queue-not-overlap
    semantics."""

    def __init__(self, clock: Callable[[], float] = time.monotonic):
        self.clock = clock
        self.jobs: list[ScheduledJob] = []

    def every(self, interval_sec: float, fn: Callable[[], object], name: str = "") -> ScheduledJob:
        job = ScheduledJob(name or fn.__name__, fn, interval_sec, next_due=self.clock())
        self.jobs.append(job)
        return job

    def run_pending(self) -> int:
        """Run every job whose slot has arrived; returns how many ran.
        Jobs run sequentially in registration order (one scheduler
        thread), so a slow incremental simply delays the full run — the
        reference's queueing behavior.

        A job that raises is isolated: its exception is recorded on
        ``job.last_error``, LATER jobs still run this pass, and the
        failed job's slot advances so a persistent failure retries at
        its cadence instead of hot-looping — the reference's Spring
        scheduler likewise logs and keeps the cadence rather than dying
        (a transient BigQuery error must not stop the 24h full dedup)."""
        import logging

        ran = 0
        now = self.clock()
        for job in self.jobs:
            if now >= job.next_due:
                try:
                    job.last_result = job.fn()
                    job.last_error = None
                except Exception as exc:  # noqa: BLE001 — cadence survives job failure
                    job.last_error = exc
                    job.last_result = None  # never expose a stale success
                    job.failures += 1
                    logging.getLogger(__name__).exception(
                        "scheduled job %s failed; keeping cadence", job.name
                    )
                job.runs += 1  # attempts, not successes (see field docs)
                ran += 1
                # fixed-rate from the ORIGINAL schedule, but skip slots
                # that already passed (no catch-up bursts)
                missed = int((self.clock() - job.next_due) // job.interval_sec) + 1
                job.next_due += missed * job.interval_sec
        return ran

    def run_for(self, duration_sec: float, tick_sec: float = 0.05) -> None:
        """Drive the loop for a bounded wall-clock duration (tests /
        local runs; a real deployment calls run_pending from its own
        loop or lets cron own the cadence)."""
        deadline = self.clock() + duration_sec
        while self.clock() < deadline:
            self.run_pending()
            time.sleep(tick_sec)


def dedupe_schedule(job, incremental_sec: float = 300.0, full_sec: float = 86_400.0) -> FixedRateScheduler:
    """The reference's default cadence wired to a DedupeJob
    (docs/configurations.md:14-15; code defaults win over the doc typo)."""
    sched = FixedRateScheduler()
    sched.every(incremental_sec, job.run_incremental, "incremental_dedupe")
    sched.every(full_sec, job.run_full, "full_dedupe")
    return sched
