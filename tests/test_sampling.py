"""Guarantees for the sampling/heavy-hitter ops (queries/sampling.py).

freqItems' contract is a SUPERSET of every key with frequency >= support
(false positives allowed, false negatives not) — asserted against the
exact oracle-checked heavy hitters. sampleBy's contract is per-stratum
Bernoulli: listed strata within binomial tolerance of their fraction,
unlisted strata absent, identical output for an identical seed.
"""

from __future__ import annotations

import math

import pytest

from hridaya_steam_market_tracker_spark.queries import load_all
from hridaya_steam_market_tracker_spark.queries.sampling import (
    SAMPLE_FRACTIONS,
)
from hridaya_steam_market_tracker_spark.tables import table

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def test_freq_items_superset_of_exact_heavy_hitters(spark, registry):
    exact = {
        r["user_id"]
        for r in registry["heavy_hitter_users"].fn(spark, SF_DIR).collect()
    }
    assert exact, "fixture should contain heavy hitters at the configured share"
    approx = {
        r["user_id"] for r in registry["freq_items_users"].fn(spark, SF_DIR).collect()
    }
    assert exact <= approx


def test_stratified_sample_proportions_and_determinism(spark, registry):
    sample = registry["stratified_sample_events"].fn(spark, SF_DIR)
    got = {
        r["event_type"]: r["n"]
        for r in sample.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    base = {
        r["event_type"]: r["n"]
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # Unlisted strata (fraction 0) must be absent.
    assert set(got) <= set(SAMPLE_FRACTIONS)
    for stratum, frac in SAMPLE_FRACTIONS.items():
        n, p = base[stratum], frac
        expected = n * p
        tol = 5 * math.sqrt(n * p * (1 - p)) if 0 < p < 1 else 0
        assert abs(got.get(stratum, 0) - expected) <= max(tol, 1), (
            stratum,
            got.get(stratum, 0),
            expected,
            tol,
        )
    # purchase is kept whole: exact row preservation, not just proportion.
    assert got["purchase"] == base["purchase"]

    again = registry["stratified_sample_events"].fn(spark, SF_DIR)
    assert sample.exceptAll(again).isEmpty() and again.exceptAll(sample).isEmpty()
