"""Golden tests for the normalization library (SURVEY.md §G/§H).

Expectations are literal pairs derived from the reference's documented
behavior and the wire samples in /root/reference/data/dataExamples.txt
— including the order-sensitivity quirks ('$' stripped before 'CDN$',
first-match currency mapping).
"""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.functions import (
    activity_price_and_currency,
    extract_activity_action,
    extract_activity_price_string,
    extract_currency,
    parse_steam_datetime,
    parse_steam_price,
    parse_volume,
    steam_currency_id_to_iso,
    to_major_units,
)
from hridaya_steam_market_tracker_spark.functions.activity import parse_activity_lines

PRICE_GOLDENS = [
    ("0,03€", 0.03),
    ("$5.00", 5.0),
    ("1.234,56€", 1234.56),
    ("1,234.56", 1234.56),
    ("£5.99", 5.99),
    ("1,000", 1000.0),
    ("1,00", 1.0),
    ("5", 5.0),
    ("1.234", 1.234),  # dot-only stays a decimal (reference float() behavior)
    ("kr 149,50", 149.5),
    ("R$ 25,00", 25.0),
    ("zł 10,99", 10.99),
    ("CDN$12.34", None),  # '$' stripped first leaves 'CDN12.34' -> unparseable
    ("1,234,56", None),  # all commas -> dots -> float error
    ("", None),
    (None, None),
    ("abc", None),
]

MINOR_UNIT_GOLDENS = [
    ("6711", 67.11),
    ("3", 0.03),
    ("177", 1.77),
    ("1,234", 12.34),
    ("67.11", None),  # python int() is strict — no silent truncation
    ("", None),
    (None, None),
]

VOLUME_GOLDENS = [
    ("435", 435),
    ("1,234", 1234),
    ("1.234", 1234),  # '.' also stripped (reference quirk)
    ("12", 12),
    ("2,200,000,000", 2200000000),  # > 2^31: reference int() is unbounded
    ("", None),
    (None, None),
    ("abc", None),
]

CURRENCY_GOLDENS = [
    ("$5.00", "USD"),
    ("0,03€", "EUR"),
    ("£5.99", "GBP"),
    ("CDN$5.00", "USD"),  # first-match: '$' precedes 'CDN$' in map order
    ("pуб. 100", "RUB"),
    ("100 ₽", "RUB"),
    ("kr 10", "SEK"),
    ("CHF 5", "CHF"),
    ("R 100", "ZAR"),
    ("฿99", "THB"),
    ("5.00", None),
    ("", None),
    (None, None),
]

STEAM_DT_GOLDENS = [
    ("Jul 02 2014 01: +0", datetime.datetime(2014, 7, 2, 1, 0)),
    ("Dec 25 2023 14: +0", datetime.datetime(2023, 12, 25, 14, 0)),
    ("May 19 2020 01: +0", datetime.datetime(2020, 5, 19, 1, 0)),
    ("garbage", None),
    ("", None),
    (None, None),
    ("Jul 02 2014", None),  # too few parts
]

ACTIVITY_PRICE_GOLDENS = [
    ("0,85€", 0.85, "EUR"),
    ("$12.50", 12.5, "USD"),
    ("£5.99", 5.99, "GBP"),
    ("1.234,56€", None, None),  # all-commas-to-dots rule can't do thousands
    ("", None, None),
    (None, None, None),
]

# Two golden HTML lines matching the reference's span classes
# (parseActivityHTML_utility.py:137-169 embeds EUR-purchase and
# USD-listing samples of this shape).
HTML_EUR_PURCHASE = (
    '<div class="market_activity_line_item ellipsis">\n'
    '\t<span class="market_activity_placeholder"></span>\n'
    '\t<span class="market_activity_cell market_activity_price ">\n\t\t\t</span>\n'
    '\t<span class="market_activity_cell market_activity_price ">\n\t\t0,85€\t</span>\n'
    '\t<span class="market_activity_cell market_activity_price ">\n\t\t\t</span>\n'
    '\t<span class="market_activity_action">Purchased</span>\n</div>\n'
)
HTML_USD_LISTED = (
    '<div class="market_activity_line_item ellipsis">\n'
    '\t<span class="market_activity_cell market_activity_price ">\n\t\t$1.17\t</span>\n'
    '\t<span class="market_activity_action">Listed</span>\n</div>\n'
)
HTML_NO_SPANS = '<div class="market_activity_line_item">malformed</div>'


def _run_scalar(spark, fn, pairs, in_type="string"):
    df = spark.createDataFrame(
        [(i, p[0]) for i, p in enumerate(pairs)], f"id long, s {in_type}"
    )
    out = {r["id"]: r["out"] for r in df.select("id", fn(F.col("s")).alias("out")).collect()}
    for i, pair in enumerate(pairs):
        expected = pair[1]
        got = out[i]
        if isinstance(expected, float):
            assert got == pytest.approx(expected), f"{pair[0]!r}: {got} != {expected}"
        else:
            assert got == expected, f"{pair[0]!r}: {got} != {expected}"


def test_parse_steam_price(spark):
    _run_scalar(spark, parse_steam_price, PRICE_GOLDENS)


def test_to_major_units(spark):
    _run_scalar(spark, to_major_units, MINOR_UNIT_GOLDENS)


def test_parse_volume(spark):
    _run_scalar(spark, parse_volume, VOLUME_GOLDENS)


def test_extract_currency(spark):
    _run_scalar(spark, extract_currency, CURRENCY_GOLDENS)


def test_parse_steam_datetime(spark):
    _run_scalar(spark, parse_steam_datetime, STEAM_DT_GOLDENS)


def test_steam_currency_id(spark):
    df = spark.createDataFrame([(1,), (2,), (3,), (24,), (99,)], "cid int")
    got = [r[0] for r in df.select(steam_currency_id_to_iso(F.col("cid"))).collect()]
    assert got == ["USD", "GBP", "EUR", "INR", None]


def test_activity_price_and_currency(spark):
    df = spark.createDataFrame(
        [(i, s) for i, (s, _, _) in enumerate(ACTIVITY_PRICE_GOLDENS)], "id long, s string"
    )
    price, cur = activity_price_and_currency(F.col("s"))
    rows = {r["id"]: (r["p"], r["c"]) for r in df.select("id", price.alias("p"), cur.alias("c")).collect()}
    for i, (s, ep, ec) in enumerate(ACTIVITY_PRICE_GOLDENS):
        p, c = rows[i]
        assert (p is None and ep is None) or p == pytest.approx(ep), f"{s!r} price {p}"
        assert c == ec, f"{s!r} currency {c}"


def test_activity_html_extraction(spark):
    df = spark.createDataFrame(
        [(1, HTML_EUR_PURCHASE), (2, HTML_USD_LISTED), (3, HTML_NO_SPANS)],
        "id long, raw string",
    )
    out = {
        r["id"]: (r["ps"], r["act"])
        for r in df.select(
            "id",
            extract_activity_price_string(F.col("raw")).alias("ps"),
            extract_activity_action(F.col("raw")).alias("act"),
        ).collect()
    }
    assert out[1] == ("0,85€", "Purchased")  # empty price span skipped
    assert out[2] == ("$1.17", "Listed")
    assert out[3] == (None, None)


def test_parse_activity_lines_explode(spark):
    df = spark.createDataFrame(
        [([HTML_EUR_PURCHASE, HTML_USD_LISTED, HTML_NO_SPANS], 1681576662)],
        "activity array<string>, steam_timestamp long",
    )
    rows = (
        parse_activity_lines(df)
        .select("price", "currency", "action", "timestamp")
        .collect()
    )
    assert len(rows) == 3
    assert (rows[0]["price"], rows[0]["currency"], rows[0]["action"]) == (0.85, "EUR", "Purchased")
    assert (rows[1]["price"], rows[1]["currency"], rows[1]["action"]) == (1.17, "USD", "Listed")
    assert rows[2]["price"] is None and rows[2]["action"] is None
    assert rows[0]["timestamp"] == datetime.datetime(2023, 4, 15, 16, 37, 42)