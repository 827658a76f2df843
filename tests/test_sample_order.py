"""Gate: the driver-sample head must be DERIVED, not hand-trusted.

Round 5's one process miss — the cost-adaptive APSS rewrite shipping
without a fresh sf0.01 driver CORRECTNESS row — happened because
`_SAMPLE_FIRST` was hand-curated. tools/sample_order.py now computes
which queries are stale-verified (never driver-sampled, or their
function-level implementation fingerprint changed in git since the
round of their last driver row); this test fails the suite whenever
such a query is missing from the head, or the head overflows the
driver's 50-slot sample (the r05 list silently overflowed by two).
"""

from __future__ import annotations

import os
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git_available() -> bool:
    try:
        return (
            subprocess.run(
                ["git", "rev-parse", "HEAD"],
                capture_output=True, cwd=REPO,
            ).returncode
            == 0
        )
    except OSError:
        return False


HEAD_CAP = 50  # the driver samples the first 50 registry entries


def test_sample_head_is_capped_and_registered():
    from hridaya_steam_market_tracker_spark.queries import _SAMPLE_FIRST, load_all

    registry = load_all()
    assert len(_SAMPLE_FIRST) <= HEAD_CAP, (
        f"_SAMPLE_FIRST has {len(_SAMPLE_FIRST)} entries; the driver only "
        f"samples {HEAD_CAP}, so the overflow would silently never run"
    )
    assert len(set(_SAMPLE_FIRST)) == len(_SAMPLE_FIRST), "duplicate entries"
    unknown = [n for n in _SAMPLE_FIRST if n not in registry]
    assert not unknown, f"unregistered names in _SAMPLE_FIRST: {unknown}"
    # the head must actually lead the registry order load_all() returns
    assert tuple(registry)[: len(_SAMPLE_FIRST)] == _SAMPLE_FIRST


def test_sample_head_equals_derived_priority_order():
    """The head must BE the derived priority order (never-sampled
    first, then stalest green round) — since the round-7
    transitive-closure fingerprint a deep shared-helper change can
    legitimately flag more queries than 50 slots hold, so the gate is
    no longer 'all flagged in head' but 'head = first 50 of the
    derived rotation': hand-dropping a flagged query in favor of a
    fresher one still fails the suite."""
    if not _git_available():
        pytest.skip("no git history available")
    from hridaya_steam_market_tracker_spark.queries import _SAMPLE_FIRST

    from tools.sample_order import suggested_head

    assert list(_SAMPLE_FIRST[:HEAD_CAP]) == suggested_head(HEAD_CAP), (
        "_SAMPLE_FIRST head drifted from tools/sample_order.py's derived "
        "order; regenerate with `python tools/sample_order.py`"
    )


def test_untracked_correctness_record_cannot_flip_the_gate():
    """Round-8 structural fix: the driver drops each round's
    CORRECTNESS_rNN.json as an UNTRACKED file, and the old working-tree
    glob let that flip the committed head red with zero builder action.
    The order must derive from committed records only, so a fresh
    untracked record leaves `latest_green_round` (hence the derived
    head) unchanged until the builder commits it alongside a regen."""
    if not _git_available():
        pytest.skip("no git history available")
    from tools.sample_order import latest_green_round

    before = latest_green_round()
    probe = os.path.join(REPO, "CORRECTNESS_r97.json")
    assert not os.path.exists(probe)
    try:
        with open(probe, "w") as f:
            f.write('{"__sample_order_probe__": {"rows_match": true}}')
        after = latest_green_round()
    finally:
        os.remove(probe)
    assert after == before, (
        "an untracked CORRECTNESS record changed the derived order; "
        "tools/sample_order.py must read committed records only"
    )


def test_fingerprint_walks_transitive_deps():
    """Regression for the round-7 blind spot: the HEVC SPS query reaches
    its synthetic fixture writer only via checked-table builder ->
    fixture builder -> RBSP writer (2+ package-internal hops); the
    fingerprint must include the writer so a change to it re-fronts the
    query."""
    from tools.sample_order import query_fingerprint_parts

    parts = query_fingerprint_parts("multimodal_hevc_sps_params_checked")
    mm = "hridaya_steam_market_tracker_spark/operators/multimodal.py"
    assert (mm, "synth_hevc_sps_rbsp") in parts
    assert (mm, "_SpsBits") in parts  # three hops deep
