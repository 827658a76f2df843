"""Source-adapter tests (A1/J2/J3/J5): fake transport, real scheduler +
limiter + normalizer wiring — the full §3.1 ingestion lifecycle without
a network.
"""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import Row

from hridaya_steam_market_tracker_spark.sources.fetcher import (
    PollingSource,
    RetryableFetchError,
    fetch_with_retry_schedule,
    next_clockwork_tick,
)
from hridaya_steam_market_tracker_spark.sources.wire import normalize_priceoverview
from hridaya_steam_market_tracker_spark.streaming.ratelimiter import (
    SlidingWindowRateLimiter,
)


def _mk_source(fetch_fn, budget=15):
    t = [0.0]
    src = PollingSource(
        fetch_fn=fetch_fn,
        limiter=SlidingWindowRateLimiter(budget, 60.0, clock=lambda: t[0]),
        clock=lambda: t[0],
    )
    return src, t


def test_polling_lifecycle_to_normalized_rows(spark):
    def fake_fetch(key):
        name, stream = key
        return {
            "success": True, "lowest_price": "0,03€", "median_price": "0,05€",
            "volume": "435", "appid": 730, "market_hash_name": name,
            "item_nameid": 1, "country": "US", "language": "english",
        }

    src, t = _mk_source(fake_fetch)
    src.scheduler.upsert(("AK-47", "priceoverview"), interval=10.0)
    src.scheduler.upsert(("AWP", "priceoverview"), interval=10.0)

    batches = src.tick()  # never-polled -> both fire immediately
    assert len(batches["priceoverview"]) == 2
    # raw rows -> distributed normalize (the §3.1 step-4 seam)
    df = spark.createDataFrame([Row(**r) for r in batches["priceoverview"]])
    out = normalize_priceoverview(df).collect()
    assert {r["market_hash_name"] for r in out} == {"AK-47", "AWP"}
    assert all(r["lowest_price"] == 0.03 and r["currency"] == "EUR" for r in out)

    assert src.tick() == {}  # nothing due yet
    t[0] = 10.0
    assert len(src.tick()["priceoverview"]) == 2  # due again at interval


def test_budget_exhaustion_leaves_items_due():
    calls = []
    src, t = _mk_source(lambda k: calls.append(k) or {"ok": 1}, budget=1)
    src.scheduler.upsert(("a", "priceoverview"), interval=10.0)
    src.scheduler.upsert(("b", "priceoverview"), interval=10.0)
    src.tick()
    assert len(calls) == 1  # only one token in the window
    t[0] = 61.0
    src.tick()
    assert len(calls) == 2  # the starved item fired once budget returned


def test_failure_backoff_cooldown():
    fails = {"n": 0}

    def flaky(key):
        fails["n"] += 1
        raise RetryableFetchError("429")

    src, t = _mk_source(flaky)
    src.scheduler.upsert(("a", "priceoverview"), interval=10.0)
    src.tick()
    assert fails["n"] == 1
    t[0] = 5.0
    src.tick()  # cooling down (skip 10 s x 2^0): no new call
    assert fails["n"] == 1
    t[0] = 10.1
    src.tick()
    assert fails["n"] == 2


def test_clockwork_tick():
    base = datetime(2024, 1, 1, 10, 15, tzinfo=timezone.utc)
    assert next_clockwork_tick(base) == datetime(2024, 1, 1, 10, 30, tzinfo=timezone.utc)
    late = datetime(2024, 1, 1, 10, 45, tzinfo=timezone.utc)
    assert next_clockwork_tick(late) == datetime(2024, 1, 1, 11, 30, tzinfo=timezone.utc)


def test_retry_schedule_ladder():
    sleeps, attempts = [], {"n": 0}

    def failing():
        attempts["n"] += 1
        raise RetryableFetchError("503")

    with pytest.raises(RetryableFetchError):
        fetch_with_retry_schedule(failing, sleep=sleeps.append)
    assert attempts["n"] == 5  # initial + 4 retries
    assert sleeps == [30.0, 60.0, 120.0, 240.0]

    # succeeds on third attempt -> stops early
    attempts["n"] = 0
    def eventually():
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RetryableFetchError("503")
        return {"ok": True}

    sleeps.clear()
    assert fetch_with_retry_schedule(eventually, sleep=sleeps.append) == {"ok": True}
    assert sleeps == [30.0, 60.0]