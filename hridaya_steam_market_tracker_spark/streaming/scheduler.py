"""J2/J4/J5: urgency-based polling schedule with per-key exponential
backoff — the control-plane state machine that decides WHICH tracked
items the source adapter fetches each tick.

Reference semantics:
* urgency = elapsed / interval; poll everything >= 1.0; never-polled
  items have urgency = infinity (src/snoozerScheduler.py:129-153).
* next wake = min time until any item becomes actionable, idle default
  2.0 s (src/snoozerScheduler.py:155-190).
* on retryable failure (429/5xx/network): skip the item for
  interval * min(2^(n-1), 8); reset on success; items in cooldown
  report urgency 0 (src/snoozerScheduler.py:192-233).
* archival retry schedule: fixed [30, 60, 120, 240] s, max 4 attempts
  (src/clockworkScheduler.py:175-238).

Pure-python state machine (driver-side; the per-key state could move
into applyInPandasWithState if the control set outgrew the driver, but
at the reference's scale — thousands of items — a dict is correct).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

IDLE_SLEEP_SECONDS = 2.0
MAX_BACKOFF_FACTOR = 8
ARCHIVAL_RETRY_SCHEDULE = (30.0, 60.0, 120.0, 240.0)


@dataclass
class ItemState:
    key: tuple[str, str]  # (market_hash_name, stream)
    interval: float
    last_update: float | None = None  # monotonic seconds; None = never polled
    skip_until: float | None = None
    consecutive_backoffs: int = 0


@dataclass
class PollScheduler:
    items: dict[tuple[str, str], ItemState] = field(default_factory=dict)

    def upsert(self, key: tuple[str, str], interval: float) -> None:
        state = self.items.get(key)
        if state is None:
            self.items[key] = ItemState(key=key, interval=interval)
        else:
            state.interval = interval

    def remove(self, key: tuple[str, str]) -> None:
        self.items.pop(key, None)

    def urgency(self, state: ItemState, now: float) -> float:
        if state.skip_until is not None and now < state.skip_until:
            return 0.0  # cooling down
        if state.last_update is None:
            return math.inf  # new items fire immediately
        return (now - state.last_update) / state.interval

    def due(self, now: float) -> list[ItemState]:
        """All items with urgency >= 1.0, most urgent first."""
        ready = [s for s in self.items.values() if self.urgency(s, now) >= 1.0]
        return sorted(ready, key=lambda s: -self.urgency(s, now))

    def next_wake(self, now: float) -> float:
        """Seconds until any item becomes actionable (incl. cooldown
        exits); IDLE_SLEEP_SECONDS when nothing is tracked."""
        waits: list[float] = []
        for s in self.items.values():
            if self.urgency(s, now) >= 1.0:
                return 0.0
            if s.skip_until is not None and now < s.skip_until:
                waits.append(s.skip_until - now)
            elif s.last_update is not None:
                waits.append(s.last_update + s.interval - now)
        if not waits:
            return IDLE_SLEEP_SECONDS
        return max(min(waits), 0.0)

    def record_success(self, key: tuple[str, str], now: float) -> None:
        s = self.items[key]
        s.last_update = now
        s.skip_until = None
        s.consecutive_backoffs = 0

    def record_failure(self, key: tuple[str, str], now: float) -> float:
        """Retryable failure: exponential cooldown, capped factor 8.
        Returns the cooldown seconds applied."""
        s = self.items[key]
        s.consecutive_backoffs += 1
        factor = min(2 ** (s.consecutive_backoffs - 1), MAX_BACKOFF_FACTOR)
        cooldown = s.interval * factor
        s.last_update = now
        s.skip_until = now + cooldown
        return cooldown
