"""Job scheduler: cron + interval triggers for pipelines.

Reference parity (mini_etl/core/scheduler.py): 5-field cron subset — ``*``,
``*/N``, comma lists, ranges (scheduler.py:63-79); interval strings
``30s/5m/2h/1d`` (scheduler.py:121-143); background thread loop
(scheduler.py:295-313); job status / run-now (scheduler.py:329-349).

This is deliberately a thin pure-Python utility (SURVEY §2.5): scheduling is
not a query-engine concern. The Structured Streaming analogue for continuous
jobs is ``trigger(processingTime=...)`` / ``availableNow`` — see
mini_etl_spark.streaming.
"""

from __future__ import annotations

import logging
import threading
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Any

logger = logging.getLogger(__name__)


class CronParser:
    """5-field cron: minute hour day-of-month month day-of-week."""

    def __init__(self, expression: str) -> None:
        parts = expression.split()
        if len(parts) != 5:
            raise ValueError(f"cron needs 5 fields, got {expression!r}")
        bounds = [(0, 59), (0, 23), (1, 31), (1, 12), (0, 6)]
        self.fields = [
            self._parse_field(p, lo, hi) for p, (lo, hi) in zip(parts, bounds)
        ]

    @staticmethod
    def _parse_field(spec: str, lo: int, hi: int) -> set[int]:
        """``*``, ``*/N``, ``a-b``, ``a,b,c`` and combinations by comma
        (⇐ scheduler.py:63-79)."""
        values: set[int] = set()
        for part in spec.split(","):
            if part == "*":
                values.update(range(lo, hi + 1))
            elif part.startswith("*/"):
                step = int(part[2:])
                if step <= 0:
                    raise ValueError(f"invalid cron step {part!r}")
                values.update(range(lo, hi + 1, step))
            elif "-" in part:
                a, b = part.split("-", 1)
                values.update(range(int(a), int(b) + 1))
            else:
                values.add(int(part))
        bad = [v for v in values if v < lo or v > hi]
        if bad:
            raise ValueError(f"cron values out of range {bad} for [{lo},{hi}]")
        return values

    def matches(self, dt: datetime) -> bool:
        minute, hour, dom, month, dow = self.fields
        return (
            dt.minute in minute
            and dt.hour in hour
            and dt.day in dom
            and dt.month in month
            # cron dow: 0=Sunday; python weekday(): 0=Monday
            and ((dt.weekday() + 1) % 7) in dow
        )

    def next_run(self, after: datetime | None = None) -> datetime:
        dt = (after or datetime.now()).replace(second=0, microsecond=0) + timedelta(minutes=1)
        for _ in range(366 * 24 * 60):  # search up to a year
            if self.matches(dt):
                return dt
            dt += timedelta(minutes=1)
        raise ValueError("no matching cron time within a year")


class IntervalParser:
    """``30s`` / ``5m`` / ``2h`` / ``1d`` → seconds (⇐ scheduler.py:121-143)."""

    UNITS = {"s": 1, "m": 60, "h": 3600, "d": 86400}

    @classmethod
    def parse(cls, spec: str | int | float) -> float:
        if isinstance(spec, (int, float)):
            return float(spec)
        spec = spec.strip().lower()
        if spec and spec[-1] in cls.UNITS:
            return float(spec[:-1]) * cls.UNITS[spec[-1]]
        return float(spec)  # bare number of seconds


@dataclass
class Job:
    name: str
    func: Callable[[], Any]
    cron: CronParser | None = None
    interval: float | None = None
    next_run: datetime | None = None
    last_run: datetime | None = None
    last_status: str = "pending"
    last_result: Any = None
    runs: int = 0
    errors: int = 0
    metadata: dict = field(default_factory=dict)

    def schedule_next(self, now: datetime) -> None:
        if self.cron is not None:
            self.next_run = self.cron.next_run(now)
        elif self.interval is not None:
            self.next_run = now + timedelta(seconds=self.interval)


class Scheduler:
    """⇐ Scheduler (scheduler.py:146-349): add jobs by cron or interval,
    run blocking or in a daemon thread, query status, trigger run-now."""

    def __init__(self, poll_seconds: float = 1.0) -> None:
        self.jobs: dict[str, Job] = {}
        self.poll_seconds = poll_seconds
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._lock = threading.Lock()

    def add_job(
        self,
        name: str,
        func: Callable[[], Any],
        cron: str | None = None,
        interval: str | int | float | None = None,
    ) -> Job:
        if (cron is None) == (interval is None):
            raise ValueError("add_job: provide exactly one of cron= or interval=")
        job = Job(
            name=name,
            func=func,
            cron=CronParser(cron) if cron else None,
            interval=IntervalParser.parse(interval) if interval is not None else None,
        )
        job.schedule_next(datetime.now())
        with self._lock:
            self.jobs[name] = job
        return job

    def remove_job(self, name: str) -> None:
        with self._lock:
            self.jobs.pop(name, None)

    def run_now(self, name: str) -> Any:
        """⇐ scheduler.py:340-349."""
        return self._execute(self.jobs[name])

    def _execute(self, job: Job) -> Any:
        job.last_run = datetime.now()
        job.runs += 1
        try:
            job.last_result = job.func()
            job.last_status = "success"
        except Exception as exc:  # noqa: BLE001
            job.errors += 1
            job.last_status = "error"
            job.last_result = repr(exc)
            logger.error("job %s failed: %s", job.name, exc)
        job.schedule_next(datetime.now())
        return job.last_result

    def _loop(self) -> None:
        while not self._stop.is_set():
            now = datetime.now()
            due = [
                j for j in list(self.jobs.values())
                if j.next_run is not None and j.next_run <= now
            ]
            for job in due:
                self._execute(job)
            self._stop.wait(self.poll_seconds)

    def start(self, blocking: bool = False) -> None:
        self._stop.clear()
        if blocking:
            self._loop()
        else:
            self._thread = threading.Thread(target=self._loop, daemon=True)
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=5)
            self._thread = None

    def status(self) -> list[dict[str, Any]]:
        return [
            {
                "name": j.name,
                "next_run": j.next_run.isoformat() if j.next_run else None,
                "last_run": j.last_run.isoformat() if j.last_run else None,
                "last_status": j.last_status,
                "runs": j.runs,
                "errors": j.errors,
            }
            for j in self.jobs.values()
        ]
