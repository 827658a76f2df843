"""J12 + A3: the config plane — YAML file ⇄ control table round-trip
with loop guards.

Reference semantics (utility/configTableSync_utility.py:53-70,195-337;
src/configWatcher.py:30-102): config.yaml seeds/updates tracked_items;
table writes regenerate the YAML; a SHA-256 echo guard stops the
in-process loop and no-op upserts (A8) stop the cross-process loop.

Spark-first: the control set is a small DataFrame; file->table sync is
diff_control_sets (streaming/reconcile.py) applied to the parsed YAML;
table->file sync serializes the enabled set back. The guards live here.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime, timezone

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark import schemas

DEFAULT_LIMITS = {"requests": 15, "window_seconds": 60}
VALID_STREAMS = ("priceoverview", "histogram", "activity", "pricehistory")


def content_hash(text: str) -> str:
    """G10 loop-guard hash (configTableSync_utility.py:73-75)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def load_config(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        text = f.read()
    cfg = yaml.safe_load(text) or {}
    cfg.setdefault("rate_limit", dict(DEFAULT_LIMITS))
    cfg.setdefault("items", [])
    cfg["_content_hash"] = content_hash(text)
    return cfg


def validate_item(item: dict) -> list[str]:
    """B8 config validation: required fields, enum membership, bounds
    (reference cerebro.py:120-170, api/responseModels.py:26-33)."""
    errors = []
    if not item.get("market_hash_name"):
        errors.append("market_hash_name required")
    stream = item.get("stream")
    if stream not in VALID_STREAMS:
        errors.append(f"stream must be one of {VALID_STREAMS}, got {stream!r}")
    poll = item.get("poll_interval_sec", 0)
    if not (5 <= int(poll) <= 86400):
        errors.append(f"poll_interval_sec must be in [5, 86400], got {poll}")
    if int(item.get("appid", 0)) <= 0:
        errors.append("appid must be positive")
    return errors


def config_to_control_df(spark: SparkSession, cfg: dict) -> DataFrame:
    """Parsed + validated config -> TRACKED_ITEMS-shaped DataFrame.
    Invalid items are rejected (raise: the reference refuses to boot on
    invalid config, cerebro.py:120-170)."""
    rows = []
    now = datetime.now(timezone.utc).replace(tzinfo=None)
    for item in cfg.get("items", []):
        errs = validate_item(item)
        if errs:
            raise ValueError(f"invalid config item {item.get('market_hash_name')!r}: {errs}")
        rows.append(
            (
                item["market_hash_name"],
                int(item.get("appid", 730)),
                item.get("item_nameid"),
                item["stream"],
                int(item.get("currency", 1)),
                item.get("country", "US"),
                item.get("language", "english"),
                int(item["poll_interval_sec"]),
                bool(item.get("enabled", True)),
                now,
            )
        )
    return spark.createDataFrame(rows, schemas.TRACKED_ITEMS)


def control_df_to_config(df: DataFrame, limits: dict | None = None) -> str:
    """Enabled control rows -> canonical YAML text (the table->file
    writeback half of J12). Deterministic ordering so the SHA-256 echo
    guard is stable."""
    rows = sorted(
        df.filter(F.col("enabled")).collect(),
        key=lambda r: (r["market_hash_name"], r["stream"]),
    )
    doc = {
        "rate_limit": dict(limits or DEFAULT_LIMITS),
        "items": [
            {
                "market_hash_name": r["market_hash_name"],
                "appid": r["appid"],
                **({"item_nameid": r["item_nameid"]} if r["item_nameid"] is not None else {}),
                "stream": r["stream"],
                "currency": r["currency"],
                "country": r["country"],
                "language": r["language"],
                "poll_interval_sec": r["poll_interval_sec"],
            }
            for r in rows
        ],
    }
    return yaml.safe_dump(doc, sort_keys=False)


class EchoGuard:
    """In-process loop breaker: remember the hash of content we
    ourselves wrote; skip processing when the watcher echoes it back."""

    def __init__(self) -> None:
        self._own_hashes: set[str] = set()

    def wrote(self, text: str) -> None:
        self._own_hashes.add(content_hash(text))

    def is_echo(self, text: str) -> bool:
        h = content_hash(text)
        if h in self._own_hashes:
            self._own_hashes.discard(h)
            return True
        return False


def write_config(path: str, text: str, guard: EchoGuard | None = None) -> None:
    if guard is not None:
        guard.wrote(text)
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)


class ConfigWatcher:
    """J12 watch-and-dispatch loop (reference src/configWatcher.py:30-102,
    re-expressed as an mtime poller — watchdog isn't a dependency here and
    a poll is the portable driver-side equivalent; the reference's
    watchdog handler dedupes fire bursts and skips echoes exactly as
    below).

    Per poll: stat the file (missing file = mid atomic-save, skip; the
    next poll catches the replacement) -> if mtime_ns advanced, read the
    text -> EchoGuard skip for our own writeback (the loop breaker) ->
    duplicate-burst skip when the content hash matches the last content
    we acted on -> parse + validate -> `diff_control_sets` against the
    current control set -> hand the diff to ``dispatch``. One emit point,
    one reaction path, mirroring the reference's trigger->NOTIFY flow:
    the watcher never touches the scheduler directly.

    A bad edit (YAML error, invalid item) must not kill the loop — the
    reference logs and keeps watching — so poll_once records it in
    ``last_error`` and returns None.
    """

    def __init__(self, path: str, guard: EchoGuard | None = None) -> None:
        self.path = path
        self.guard = guard or EchoGuard()
        self.last_error: str | None = None
        self._last_mtime_ns: int | None = None
        self._last_seen_hash: str | None = None

    def poll_once(self, spark: SparkSession, current: DataFrame, dispatch=None):
        """One watcher tick. Returns the dispatched diff DataFrame when a
        real change fired, else None (no change / echo / dup / error)."""
        try:
            mtime_ns = os.stat(self.path).st_mtime_ns
        except FileNotFoundError:
            return None  # mid atomic-save; the replacement triggers next tick
        if self._last_mtime_ns is not None and mtime_ns == self._last_mtime_ns:
            return None
        self._last_mtime_ns = mtime_ns
        try:
            with open(self.path, encoding="utf-8") as f:
                text = f.read()
        except FileNotFoundError:
            return None
        if self.guard.is_echo(text):
            return None  # our own writeback echo — loop guard
        h = content_hash(text)
        if h == self._last_seen_hash:
            return None  # editor fire burst for content already acted on
        self._last_seen_hash = h
        try:
            cfg = yaml.safe_load(text) or {}
            cfg.setdefault("rate_limit", dict(DEFAULT_LIMITS))
            cfg.setdefault("items", [])
            desired = config_to_control_df(spark, cfg)
            from hridaya_steam_market_tracker_spark.streaming.reconcile import (
                diff_control_sets,
            )

            diff = diff_control_sets(current, desired)
            if dispatch is not None:
                dispatch(diff)
            self.last_error = None
            return diff
        except (yaml.YAMLError, ValueError) as exc:
            self.last_error = str(exc)
            return None

    def run(self, spark: SparkSession, get_current, dispatch, interval_sec: float = 0.5, max_ticks: int | None = None) -> int:
        """Blocking poll loop (driver-side, like the reference's observer
        thread). ``get_current`` supplies the control table per tick so a
        dispatched change is visible to the next diff. ``max_ticks``
        bounds the loop for tests; None = run until interrupted. Returns
        the number of dispatched changes."""
        import time as _time

        fired = 0
        tick = 0
        while max_ticks is None or tick < max_ticks:
            if self.poll_once(spark, get_current(), dispatch) is not None:
                fired += 1
            tick += 1
            if max_ticks is None or tick < max_ticks:
                _time.sleep(interval_sec)
        return fired
