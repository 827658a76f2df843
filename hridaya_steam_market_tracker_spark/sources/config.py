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
