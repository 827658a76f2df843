"""Control-plane tests: config YAML round-trip with loop guards (J12),
manifest source with refresh-on-miss (A2), currency-flip feedback
(J11), CSV export (A10).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.sources.config import (
    EchoGuard,
    config_to_control_df,
    content_hash,
    control_df_to_config,
    load_config,
    validate_item,
    write_config,
)
from hridaya_steam_market_tracker_spark.sources.manifest import (
    ManifestCache,
    load_manifest_df,
)
from hridaya_steam_market_tracker_spark.storage.layout import export_csv
from hridaya_steam_market_tracker_spark.streaming.feedback import apply_currency_flip
from hridaya_steam_market_tracker_spark.streaming.reconcile import resolve_nameids

CFG_YAML = """
rate_limit:
  requests: 15
  window_seconds: 60
items:
  - market_hash_name: "AK-47 | Redline (Field-Tested)"
    appid: 730
    stream: priceoverview
    currency: 1
    poll_interval_sec: 10
  - market_hash_name: "AWP | Asiimov (Field-Tested)"
    appid: 730
    stream: pricehistory
    poll_interval_sec: 3600
"""


def test_config_round_trip_and_echo_guard(spark, tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(CFG_YAML)
    cfg = load_config(str(p))
    assert cfg["rate_limit"]["requests"] == 15
    control = config_to_control_df(spark, cfg)
    assert control.count() == 2
    row = control.filter(F.col("stream") == "priceoverview").collect()[0]
    assert row["country"] == "US" and row["language"] == "english" and row["enabled"]

    # table -> file writeback; echo guard suppresses our own write
    guard = EchoGuard()
    text = control_df_to_config(control)
    write_config(str(p), text, guard)
    assert guard.is_echo(p.read_text())  # watcher callback sees our write
    assert not guard.is_echo(p.read_text())  # one-shot; real edits pass

    # round trip is stable: config -> df -> yaml -> df is a fixpoint
    cfg2 = load_config(str(p))
    control2 = config_to_control_df(spark, cfg2)
    assert sorted(map(tuple, control.drop("created_at").collect())) == sorted(
        map(tuple, control2.drop("created_at").collect())
    )
    assert content_hash(control_df_to_config(control2)) == content_hash(text)


def test_config_validation_bounds():
    assert validate_item({"market_hash_name": "x", "stream": "histogram", "poll_interval_sec": 10, "appid": 730}) == []
    errs = validate_item({"market_hash_name": "", "stream": "bogus", "poll_interval_sec": 3, "appid": 0})
    assert len(errs) == 4  # all four rules fire


def test_manifest_source_and_resolve(spark, tmp_path):
    mp = tmp_path / "ids.json"
    mp.write_text(json.dumps({"AK-47": 1, "AWP": 2}))
    manifest = load_manifest_df(spark, str(mp))
    desired = spark.createDataFrame(
        [("AK-47", None, 10, True), ("Unknown", None, 10, True)],
        "market_hash_name string, item_nameid long, poll_interval_sec int, enabled boolean",
    )
    resolved, dropped = resolve_nameids(desired, manifest)
    assert [r["item_nameid"] for r in resolved.collect()] == [1]
    d = dropped.collect()[0]
    assert d["market_hash_name"] == "Unknown" and "unresolvable" in d["drop_reason"]

    # refresh-on-miss: cache reloads when the file gains the key
    cache = ManifestCache(str(mp))
    assert cache.lookup("M4A4") is None and cache.reloads == 2
    mp.write_text(json.dumps({"AK-47": 1, "AWP": 2, "M4A4": 3}))
    assert cache.lookup("M4A4") == 3 and cache.reloads == 3
    assert cache.lookup("AK-47") == 1 and cache.reloads == 3  # hit: no reload


def test_currency_flip_feedback(spark):
    control = spark.createDataFrame(
        [("AK-47", "priceoverview", 1, "US"), ("AWP", "priceoverview", 1, "US")],
        "market_hash_name string, stream string, currency int, country string",
    )
    derived = spark.createDataFrame(
        [("AK-47", "priceoverview", "EUR"), ("AWP", "priceoverview", "USD")],
        "market_hash_name string, stream string, derived_currency string",
    )
    flips = apply_currency_flip(control, derived).collect()
    # AWP's response matched its request -> no-op suppressed
    assert len(flips) == 1
    assert flips[0]["market_hash_name"] == "AK-47"
    assert flips[0]["currency"] == 3 and flips[0]["country"] == "DE"


def test_csv_export_flattens_nested(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", [{"price": "0,03€", "quantity": "2"}], 1.5)],
        "name string, book array<struct<price:string,quantity:string>>, value double",
    )
    out = str(tmp_path / "csv")
    export_csv(df, out, single_file=True)
    back = spark.read.option("header", True).csv(out).collect()[0]
    assert back["name"] == "a"
    assert json.loads(back["book"]) == [{"price": "0,03€", "quantity": "2"}]

def test_config_watcher_loop_e2e(spark, tmp_path):
    """J12 watch-and-dispatch e2e (reference src/configWatcher.py:30-102):
    file edit -> control-table diff dispatch; our own writeback is
    suppressed by the echo guard (no reconcile storm); editor fire
    bursts with identical content dedupe; a bad edit logs and keeps the
    loop alive."""
    from hridaya_steam_market_tracker_spark import schemas
    from hridaya_steam_market_tracker_spark.sources.config import ConfigWatcher

    p = tmp_path / "config.yaml"
    p.write_text(CFG_YAML)
    watcher = ConfigWatcher(str(p))
    empty = spark.createDataFrame([], schemas.TRACKED_ITEMS)
    dispatched = []

    # 1) initial content vs empty control set -> two 'added' rows dispatched
    diff = watcher.poll_once(spark, empty, dispatched.append)
    assert diff is not None and len(dispatched) == 1
    rows = {(r["market_hash_name"], r["status"]) for r in diff.collect()}
    assert all(s == "added" for _, s in rows) and len(rows) == 2

    # 2) no edit -> no fire (mtime unchanged)
    assert watcher.poll_once(spark, empty, dispatched.append) is None

    # 3) table -> file writeback through OUR guard -> watcher skips the echo
    control = config_to_control_df(spark, load_config(str(p)))
    write_config(str(p), control_df_to_config(control), watcher.guard)
    assert watcher.poll_once(spark, control, dispatched.append) is None
    assert len(dispatched) == 1  # no reconcile storm

    # 4) a real edit fires exactly the changed row
    edited = p.read_text().replace("poll_interval_sec: 10", "poll_interval_sec: 20")
    p.write_text(edited)
    diff = watcher.poll_once(spark, control, dispatched.append)
    changed = [(r["market_hash_name"], r["status"], r["poll_interval_sec"]) for r in diff.collect()]
    assert changed == [("AK-47 | Redline (Field-Tested)", "changed", 20)]

    # 5) editor fire burst: same content rewritten (new mtime) -> deduped
    p.write_text(edited)
    assert watcher.poll_once(spark, control, dispatched.append) is None

    # 6) bad YAML edit: loop survives, error recorded; next good edit fires
    p.write_text("items: [{market_hash_name: '', stream: bogus}]")
    assert watcher.poll_once(spark, control, dispatched.append) is None
    assert watcher.last_error is not None
    p.write_text(edited.replace("poll_interval_sec: 20", "poll_interval_sec: 30"))
    assert watcher.poll_once(spark, control, dispatched.append) is not None
    assert watcher.last_error is None

    # 7) run(): bounded poll loop counts dispatches
    p.write_text(edited)  # one pending change vs `control`
    fired = ConfigWatcher(str(p)).run(
        spark, lambda: control, dispatched.append, interval_sec=0.01, max_ticks=3
    )
    assert fired == 1  # first tick fires, later ticks see no change
