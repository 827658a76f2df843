"""Property-style round-trip tests for the G1 locale price parser
(SURVEY.md §5 strategy (d)): format a known amount in each locale
style, parse it back, expect exact minor-unit equality. 600 seeded
random cases batched through ONE Spark job.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.functions.prices import (
    parse_steam_price,
    parse_volume,
    to_major_units,
)


def _format_us(units: int, cents: int) -> str:
    return f"{units:,}.{cents:02d}"


def _format_eu(units: int, cents: int) -> str:
    whole = f"{units:,}".replace(",", ".")
    return f"{whole},{cents:02d}"


def test_price_parse_round_trip(spark):
    rng = random.Random(42)
    cases = []
    for i in range(300):
        units = rng.randint(0, 2_000_000)
        cents = rng.randint(0, 99)
        expected = units + cents / 100.0
        us = _format_us(units, cents)
        eu = _format_eu(units, cents)
        sym = rng.choice(["$", "€", "£", "₹", "฿"])
        # symbol placement: prefix for US-style, suffix for EU-style
        cases.append((2 * i, f"{sym}{us}" if sym == "$" else us, expected))
        cases.append((2 * i + 1, f"{eu}{sym}" if sym != "$" else eu, expected))
    df = spark.createDataFrame(cases, "id long, raw string, expected double")
    out = df.select("id", "expected", parse_steam_price(F.col("raw")).alias("got"))
    bad = out.filter(
        F.col("got").isNull() | (F.abs(F.col("got") - F.col("expected")) > 1e-9)
    ).collect()
    assert bad == [], f"{len(bad)} round-trip failures, first: {bad[:3]}"


def test_minor_units_round_trip(spark):
    rng = random.Random(7)
    cases = [(i, str(v := rng.randint(0, 10_000_000)), v / 100.0) for i in range(300)]
    df = spark.createDataFrame(cases, "id long, raw string, expected double")
    bad = (
        df.select("expected", to_major_units(F.col("raw")).alias("got"))
        .filter(F.abs(F.col("got") - F.col("expected")) > 1e-9)
        .collect()
    )
    assert bad == []


def test_volume_round_trip(spark):
    rng = random.Random(3)
    cases = [(i, f"{(v := rng.randint(0, 5_000_000)):,}", v) for i in range(300)]
    df = spark.createDataFrame(cases, "id long, raw string, expected int")
    bad = (
        df.select("expected", parse_volume(F.col("raw")).alias("got"))
        .filter(F.col("got") != F.col("expected"))
        .collect()
    )
    assert bad == []

def test_morton_code_round_trip_batched(spark):
    """Property: morton_code bit-interleave is invertible — decode the
    Spark-computed z back to (a, b) in Python and require exact
    equality. 400 seeded random pairs through one Spark job."""
    from hridaya_steam_market_tracker_spark.storage.zorder import morton_code

    rng = random.Random(7)
    cases = [
        (i, rng.randint(0, (1 << 16) - 1), rng.randint(0, (1 << 16) - 1))
        for i in range(400)
    ]
    df = spark.createDataFrame(cases, "id long, a long, b long")
    rows = df.select(
        "a", "b", morton_code(F.col("a"), F.col("b"), bits=16).alias("z")
    ).collect()

    def decode(z: int) -> tuple[int, int]:
        a = b = 0
        for i in range(16):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    for r in rows:
        assert decode(r["z"]) == (r["a"], r["b"])


def test_clean_text_matches_python_reference_batched(spark):
    """Property: clean_text equals a straightforward Python reference
    (control-strip then whitespace collapse then trim) on random ASCII
    soup including control characters. One Spark job."""
    import re

    from hridaya_steam_market_tracker_spark.operators.text import clean_text

    rng = random.Random(11)
    alphabet = (
        [chr(c) for c in range(0x20, 0x7F)]
        + ["\t", "\n", "\r", "\x00", "\x01", "\x0b", "\x0c", "\x1f", "\x7f"]
    )
    cases = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 80))))
        for i in range(400)
    ]

    def ref(s: str) -> str:
        s = re.sub("[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", "", s)
        s = re.sub(r"\s+", " ", s)
        return s.strip()

    df = spark.createDataFrame(cases, "id long, raw string")
    rows = df.select("id", "raw", clean_text(F.col("raw")).alias("c")).collect()
    for r in rows:
        assert r["c"] == ref(r["raw"]), (repr(r["raw"]), repr(r["c"]))
