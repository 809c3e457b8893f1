"""Scheduler/retry tests (⇐ reference tests for core/scheduler.py and
core/retry.py)."""

from __future__ import annotations

import time
from datetime import datetime

import pytest

from mini_etl_spark.retry import RetryableOperation, RetryConfig, retry_with_backoff, retryable
from mini_etl_spark.scheduler import CronParser, IntervalParser, Scheduler


def test_cron_parse_star_step_list_range():
    c = CronParser("*/15 2,14 1-3 * *")
    assert c.fields[0] == {0, 15, 30, 45}
    assert c.fields[1] == {2, 14}
    assert c.fields[2] == {1, 2, 3}
    assert c.fields[3] == set(range(1, 13))
    assert c.fields[4] == set(range(0, 7))


def test_cron_matches_and_next():
    c = CronParser("30 9 * * *")
    assert c.matches(datetime(2026, 8, 13, 9, 30))
    assert not c.matches(datetime(2026, 8, 13, 9, 31))
    nxt = c.next_run(datetime(2026, 8, 13, 9, 31))
    assert (nxt.hour, nxt.minute, nxt.day) == (9, 30, 14)


def test_cron_dow_sunday_zero():
    c = CronParser("0 0 * * 0")  # sundays
    assert c.matches(datetime(2026, 8, 16, 0, 0))  # 2026-08-16 is a Sunday
    assert not c.matches(datetime(2026, 8, 17, 0, 0))


def test_cron_invalid():
    with pytest.raises(ValueError):
        CronParser("* * *")
    with pytest.raises(ValueError):
        CronParser("99 * * * *")


def test_interval_parse():
    assert IntervalParser.parse("30s") == 30
    assert IntervalParser.parse("5m") == 300
    assert IntervalParser.parse("2h") == 7200
    assert IntervalParser.parse("1d") == 86400
    assert IntervalParser.parse(42) == 42


def test_scheduler_run_now_and_status():
    s = Scheduler()
    hits: list[int] = []
    s.add_job("j", lambda: hits.append(1) or "ok", interval="1h")
    assert s.run_now("j") == "ok"
    st = s.status()[0]
    assert st["runs"] == 1 and st["last_status"] == "success"


def test_scheduler_error_status():
    s = Scheduler()

    def boom():
        raise RuntimeError("nope")

    s.add_job("bad", boom, interval="1h")
    s.run_now("bad")
    st = s.status()[0]
    assert st["errors"] == 1 and st["last_status"] == "error"


def test_scheduler_background_fires_due_job():
    s = Scheduler(poll_seconds=0.05)
    hits: list[int] = []
    s.add_job("fast", lambda: hits.append(1), interval=0.05)
    s.start(blocking=False)
    time.sleep(0.5)
    s.stop()
    assert len(hits) >= 2


def test_scheduler_requires_one_trigger():
    s = Scheduler()
    with pytest.raises(ValueError):
        s.add_job("x", lambda: None)
    with pytest.raises(ValueError):
        s.add_job("x", lambda: None, cron="* * * * *", interval="5m")


def test_retry_succeeds_after_failures():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise ConnectionError("transient")
        return "done"

    cfg = RetryConfig(max_attempts=5, initial_delay=0.01, jitter=False)
    assert retry_with_backoff(flaky, config=cfg) == "done"
    assert calls["n"] == 3


def test_retry_exhausts():
    cfg = RetryConfig(max_attempts=2, initial_delay=0.01)
    with pytest.raises(TimeoutError):
        retry_with_backoff(lambda: (_ for _ in ()).throw(TimeoutError("t")), config=cfg)


def test_retry_non_retryable_raises_immediately():
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise ValueError("logic bug")

    with pytest.raises(ValueError):
        retry_with_backoff(bad, config=RetryConfig(max_attempts=5, initial_delay=0.01))
    assert calls["n"] == 1


def test_retryable_decorator_and_context():
    cfg = RetryConfig(max_attempts=3, initial_delay=0.01, jitter=False)

    @retryable(cfg)
    def fn(x):
        return x * 2

    assert fn(21) == 42
    with RetryableOperation(cfg) as op:
        assert op.run(lambda: "ctx") == "ctx"
