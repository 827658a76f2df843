"""J7/J8 + A8/A9: debounced desired-state reconciliation.

Reference chain: tracked_items change -> NOTIFY -> 0.25 s debounce ->
re-read enabled set -> resolve missing nameids (drop unresolvable with
reason) -> feasibility gate (reject the WHOLE change, keep current) ->
atomic swap of poller sets (cerebro.py:289-414).

Spark-first: the control table is a small DataFrame; reconciliation is
the C4 diff join + D9 aggregate in one plan. The debouncer is a tiny
driver-side coalescer (micro-batch triggers subsume it in-stream).
No-op change suppression (A8) is a column-compare inside the diff — the
cross-process loop breaker the reference implements with
IS DISTINCT FROM upserts.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTROL_KEY = ("market_hash_name", "stream")
TRACKED_COLS = (
    "market_hash_name", "appid", "item_nameid", "stream",
    "currency", "country", "language", "poll_interval_sec", "enabled",
)


def resolve_nameids(desired: DataFrame, manifest: DataFrame) -> tuple[DataFrame, DataFrame]:
    """C2: left-join the manifest; rows still missing item_nameid are
    dropped with reason (returned separately for logging)."""
    joined = desired.join(
        F.broadcast(manifest.select("market_hash_name", F.col("item_nameid").alias("__mid"))),
        "market_hash_name",
        "left",
    ).withColumn("item_nameid", F.coalesce("item_nameid", "__mid")).drop("__mid")
    resolved = joined.filter(F.col("item_nameid").isNotNull())
    dropped = joined.filter(F.col("item_nameid").isNull()).withColumn(
        "drop_reason", F.lit("unresolvable item_nameid")
    )
    return resolved, dropped


def feasibility(desired: DataFrame, budget: int = 15, window_seconds: int = 60) -> DataFrame:
    """D9: one-row admission verdict for the whole desired set."""
    required = F.sum(
        F.floor(F.lit(float(window_seconds)) / F.col("poll_interval_sec")).cast("long")
    )
    return desired.filter(F.col("enabled")).agg(
        required.alias("required"),
        F.lit(budget).cast("long").alias("budget"),
        (required <= budget).alias("feasible"),
    )


def diff_control_sets(current: DataFrame, desired: DataFrame) -> DataFrame:
    """C4 + A8: full-outer diff on the control key with no-op
    suppression — rows where every tracked column matches emit NO
    change (status 'unchanged' rows are filtered out, so downstream
    listeners see no storm)."""
    cur = current.select(*TRACKED_COLS).alias("cur")
    des = desired.select(*TRACKED_COLS).alias("des")
    on = [F.col(f"cur.{k}") == F.col(f"des.{k}") for k in CONTROL_KEY]
    joined = cur.join(des, on, "full_outer")
    any_diff = F.lit(False)
    for c in TRACKED_COLS:
        if c in CONTROL_KEY:
            continue
        any_diff = any_diff | ~F.col(f"cur.{c}").eqNullSafe(F.col(f"des.{c}"))
    status = (
        F.when(F.col(f"cur.{CONTROL_KEY[0]}").isNull(), "added")
        .when(F.col(f"des.{CONTROL_KEY[0]}").isNull(), "removed")
        .when(any_diff, "changed")
        .otherwise("unchanged")
    )
    key_cols = [
        F.coalesce(F.col(f"cur.{k}"), F.col(f"des.{k}")).alias(k) for k in CONTROL_KEY
    ]
    payload = [
        F.coalesce(F.col(f"des.{c}"), F.col(f"cur.{c}")).alias(c)
        for c in TRACKED_COLS
        if c not in CONTROL_KEY
    ]
    return (
        joined.select(*key_cols, *payload, status.alias("status"))
        .filter(F.col("status") != "unchanged")
    )


def soft_delete(current: DataFrame, desired_keys: DataFrame) -> DataFrame:
    """A9: keys absent from the desired set flip enabled=false instead
    of being deleted (left_anti marks, union preserves the rest)."""
    gone = current.join(desired_keys, list(CONTROL_KEY), "left_anti").withColumn(
        "enabled", F.lit(False)
    )
    kept = current.join(desired_keys, list(CONTROL_KEY), "left_semi")
    return kept.unionByName(gone)


@dataclass
class Debouncer:
    """J7: collapse a burst of change signals into one reconcile after
    a quiet window; counts absorbed signals (cerebro.py:315-332)."""

    quiet_seconds: float = 0.25
    clock: callable = time.monotonic
    _last_signal: float | None = field(default=None, init=False)
    _absorbed: int = field(default=0, init=False)

    def signal(self) -> None:
        if self._last_signal is not None:
            self._absorbed += 1
        self._last_signal = self.clock()

    def ready(self) -> bool:
        return (
            self._last_signal is not None
            and self.clock() - self._last_signal >= self.quiet_seconds
        )

    def consume(self) -> int:
        """Fire the reconcile: returns how many signals were coalesced."""
        absorbed = self._absorbed
        self._last_signal = None
        self._absorbed = 0
        return absorbed + 1
