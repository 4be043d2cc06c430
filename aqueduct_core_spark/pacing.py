"""Read pacing + backpressure: the reference's adaptive retry-after and
fast-path rate limiter, re-expressed for micro-batch trigger control.

  retry_after_ms = ceil(node_count / (db_pool_size / query_time_ms)), capped
  (PostgresqlStorage.java:229-247); empty reads back off to the cap plus
  random jitter (:249-251). The fast path (retry 0) for bootstrapping readers
  is gated by a rate limiter (PipeRateLimiter.java:8-18, 80 permits/s).

In this engine retry-after becomes the processing-time trigger interval for a
tailing IngestEngine: how long to sleep before the next micro-batch given how
loaded the source is and how many consumers share it. The rate limiter is a
plain token bucket (driver-side, like the reference's Guava limiter).
"""

from __future__ import annotations

import math
import random
import time
from dataclasses import dataclass


def calculate_retry_after_ms(
    query_time_ms: float,
    messages_count: int,
    node_count: int = 3000,
    db_pool_size: int = 24,
    max_retry_after_ms: int = 600_000,
    rng: random.Random | None = None,
) -> int:
    """Exact port of the reference pacing formula (defaults from
    application-prod.yml: 3000 nodes, pool 24, cap 600000 ms)."""
    if messages_count == 0:
        r = rng.random() if rng is not None else random.random()
        return int(max_retry_after_ms + max_retry_after_ms * r)
    if query_time_ms == 0:
        return 1
    db_threshold = db_pool_size / float(query_time_ms)
    return int(min(math.ceil(node_count / db_threshold), max_retry_after_ms))


@dataclass
class AdaptivePacer:
    """Converts a finished micro-batch's measurements into the next trigger
    interval — the consumer-side restatement of the reference's read
    controller (PipeReadController.java:113-129 `calculateRetryAfter` +
    PostgresqlStorage.java:229-251):

      * empty batch      -> cap + jitter backoff (storage :249-251);
      * catching up      -> fast path 0 ms while the rate limiter has capacity
        (controller: messages older than pipe.bootstrap.threshold 6h and
        PipeRateLimiter.tryAcquire, :117-129);
      * steady tailing   -> ceil(node_count / (pool / query_ms)), capped.
    """

    node_count: int = 3000  # application-prod.yml defaults
    db_pool_size: int = 24
    max_retry_after_ms: int = 600_000
    bootstrap_threshold_s: float = 6 * 3600.0  # pipe.bootstrap.threshold: 6h
    fast_path_permits_per_s: float = 80.0  # PipeRateLimiter.java:8-18
    rng: random.Random | None = None

    def __post_init__(self) -> None:
        self.bucket = TokenBucket(capacity_per_s=self.fast_path_permits_per_s)

    def next_interval_ms(
        self,
        batch_wall_ms: float,
        batch_rows: int,
        newest_event_age_s: float | None = None,
        now: float | None = None,
    ) -> int:
        if batch_rows == 0:
            return calculate_retry_after_ms(
                batch_wall_ms,
                0,
                self.node_count,
                self.db_pool_size,
                self.max_retry_after_ms,
                rng=self.rng,
            )
        if (
            newest_event_age_s is not None
            and newest_event_age_s > self.bootstrap_threshold_s
            and self.bucket.try_acquire(now)
        ):
            return 0  # bootstrapping reader on the fast path
        return calculate_retry_after_ms(
            batch_wall_ms,
            batch_rows,
            self.node_count,
            self.db_pool_size,
            self.max_retry_after_ms,
            rng=self.rng,
        )


@dataclass
class TokenBucket:
    """Fast-path limiter (reference: 80 permits/s for bootstrapping readers)."""

    capacity_per_s: float = 80.0
    _tokens: float = 0.0
    _last: float | None = None

    def try_acquire(self, now: float | None = None) -> bool:
        t = time.monotonic() if now is None else now
        if self._last is None:
            self._last = t
            self._tokens = 1.0  # burst of one on first use
        self._tokens = min(
            self.capacity_per_s, self._tokens + (t - self._last) * self.capacity_per_s
        )
        self._last = t
        if self._tokens >= 1.0:
            self._tokens -= 1.0
            return True
        return False
