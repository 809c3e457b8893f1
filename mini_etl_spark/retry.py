"""Driver-side retry with exponential backoff.

Reference parity: core/retry.py:22-165 (``retry_with_backoff``,
``RetryConfig``, ``RetryableOperation``). In Spark, *task* retries are
built in (``spark.task.maxFailures``); this utility exists only for
driver-side effects — API fetches, JDBC connection setup — exactly the
scope SURVEY §2.5 recommends keeping.
"""

from __future__ import annotations

import functools
import logging
import random
import time
from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any, TypeVar

logger = logging.getLogger(__name__)

T = TypeVar("T")

_DEFAULT_RETRYABLE: tuple[type[BaseException], ...] = (
    ConnectionError,
    TimeoutError,
    OSError,
)


@dataclass
class RetryConfig:
    """⇐ RetryConfig (core/retry.py:22-40)."""

    max_attempts: int = 3
    initial_delay: float = 1.0
    max_delay: float = 60.0
    backoff_factor: float = 2.0
    jitter: bool = True
    retryable_exceptions: tuple[type[BaseException], ...] = field(
        default_factory=lambda: _DEFAULT_RETRYABLE
    )


def retry_with_backoff(
    func: Callable[..., T],
    *args: Any,
    config: RetryConfig | None = None,
    **kwargs: Any,
) -> T:
    """Call ``func`` with retries (⇐ core/retry.py:43-104). Sleeps
    ``initial_delay * backoff_factor**attempt`` (capped, jittered)."""
    cfg = config or RetryConfig()
    delay = cfg.initial_delay
    last_exc: BaseException | None = None
    for attempt in range(1, cfg.max_attempts + 1):
        try:
            return func(*args, **kwargs)
        except cfg.retryable_exceptions as exc:
            last_exc = exc
            if attempt == cfg.max_attempts:
                break
            sleep_for = min(delay, cfg.max_delay)
            if cfg.jitter:
                sleep_for *= 0.5 + random.random() / 2
            logger.warning(
                "retry %d/%d after %s: sleeping %.2fs",
                attempt, cfg.max_attempts, exc, sleep_for,
            )
            time.sleep(sleep_for)
            delay *= cfg.backoff_factor
    assert last_exc is not None
    raise last_exc


def retryable(config: RetryConfig | None = None) -> Callable:
    """Decorator form (⇐ core/retry.py:107-130)."""

    def _wrap(func: Callable[..., T]) -> Callable[..., T]:
        @functools.wraps(func)
        def _inner(*args: Any, **kwargs: Any) -> T:
            return retry_with_backoff(func, *args, config=config, **kwargs)

        return _inner

    return _wrap


class RetryableOperation:
    """Context-manager form (⇐ core/retry.py:133-165)::

        with RetryableOperation(config) as op:
            result = op.run(fetch, url)
    """

    def __init__(self, config: RetryConfig | None = None) -> None:
        self.config = config or RetryConfig()

    def __enter__(self) -> "RetryableOperation":
        return self

    def __exit__(self, *exc_info: Any) -> bool:
        return False

    def run(self, func: Callable[..., T], *args: Any, **kwargs: Any) -> T:
        return retry_with_backoff(func, *args, config=self.config, **kwargs)
