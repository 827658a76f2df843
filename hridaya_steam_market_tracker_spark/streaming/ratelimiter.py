"""J1: global sliding-window rate limiter for the source adapter.

Reference semantics (src/RateLimiter.py:24-49): a log of request
timestamps; a request may proceed when fewer than `budget` requests
happened in the trailing `window_seconds`; otherwise wait until the
oldest timestamp exits the window. Shared across all pollers.

This throttles the driver-side fetcher that feeds micro-batches — the
Spark analog of a source's maxOffsetsPerTrigger, not a data-plane
operator (Catalyst never sees it).
"""

from __future__ import annotations

import time
from collections import deque


class SlidingWindowRateLimiter:
    def __init__(self, budget: int = 15, window_seconds: float = 60.0, clock=time.monotonic):
        if budget <= 0 or window_seconds <= 0:
            raise ValueError("budget and window must be positive")
        self.budget = budget
        self.window_seconds = window_seconds
        self._clock = clock
        self._log: deque[float] = deque()

    def _evict(self, now: float) -> None:
        cutoff = now - self.window_seconds
        while self._log and self._log[0] <= cutoff:
            self._log.popleft()

    def time_until_token(self) -> float:
        """Seconds until a token is available (0.0 = now)."""
        now = self._clock()
        self._evict(now)
        if len(self._log) < self.budget:
            return 0.0
        return self._log[0] + self.window_seconds - now

    def try_acquire(self) -> bool:
        """Non-blocking acquire; True if the request may proceed."""
        now = self._clock()
        self._evict(now)
        if len(self._log) < self.budget:
            self._log.append(now)
            return True
        return False

    def acquire(self, sleep=time.sleep) -> None:
        """Blocking acquire (reference behavior: wait for the oldest
        timestamp to exit the window)."""
        while True:
            wait = self.time_until_token()
            if wait <= 0 and self.try_acquire():
                return
            sleep(max(wait, 0.0))

    @property
    def used(self) -> int:
        self._evict(self._clock())
        return len(self._log)
