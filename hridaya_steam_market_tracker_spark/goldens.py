"""Golden (input, expected) pairs for the normalization library.

Derived from the reference's wire samples (data/dataExamples.txt) and
documented parser behavior (src/SQLinserts.py:593-753,
utility/parseActivityHTML_utility.py:13-61) — including the
order-sensitivity quirks. Shared by the golden unit tests and the
VALUES-oracle queries so both gates pin identical semantics.
"""

from __future__ import annotations

PRICE_GOLDENS: list[tuple[str | None, float | None]] = [
    ("0,03€", 0.03),
    ("$5.00", 5.0),
    ("1.234,56€", 1234.56),
    ("1,234.56", 1234.56),
    ("£5.99", 5.99),
    ("1,000", 1000.0),
    ("1,00", 1.0),
    ("5", 5.0),
    ("1.234", 1.234),  # dot-only stays decimal (reference float() behavior)
    ("kr 149,50", 149.5),
    ("R$ 25,00", 25.0),
    ("zł 10,99", 10.99),
    ("CDN$12.34", None),  # '$' stripped first leaves 'CDN12.34' -> NULL
    ("1,234,56", None),  # all commas -> dots -> float error
    ("", None),
    (None, None),
    ("abc", None),
]

MINOR_UNIT_GOLDENS: list[tuple[str | None, float | None]] = [
    ("6711", 67.11),
    ("3", 0.03),
    ("177", 1.77),
    ("1,234", 12.34),
    ("67.11", None),  # python int() is strict — no silent truncation
    ("", None),
    (None, None),
]

VOLUME_GOLDENS: list[tuple[str | None, int | None]] = [
    ("435", 435),
    ("1,234", 1234),
    ("1.234", 1234),  # '.' also stripped (reference quirk)
    ("12", 12),
    ("2,200,000,000", 2200000000),  # > 2^31: reference int() is unbounded
    ("", None),
    (None, None),
    ("abc", None),
]

CURRENCY_GOLDENS: list[tuple[str | None, str | None]] = [
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

STEAM_DT_GOLDENS: list[tuple[str | None, str | None]] = [
    # expected as 'YYYY-MM-DD HH:MM:SS' literals (timestamp in both engines)
    ("Jul 02 2014 01: +0", "2014-07-02 01:00:00"),
    ("Dec 25 2023 14: +0", "2023-12-25 14:00:00"),
    ("May 19 2020 01: +0", "2020-05-19 01:00:00"),
    ("Mar 16 2023 01: +0", "2023-03-16 01:00:00"),
    ("garbage", None),
    ("", None),
    (None, None),
    ("Jul 02 2014", None),  # too few parts
]

ACTIVITY_PRICE_GOLDENS: list[tuple[str | None, float | None, str | None]] = [
    ("0,85€", 0.85, "EUR"),
    ("$12.50", 12.5, "USD"),
    ("£5.99", 5.99, "GBP"),
    ("1.234,56€", None, None),  # all-commas-to-dots rule can't do thousands
    ("", None, None),
    (None, None, None),
]
