"""Parser queries (SURVEY.md §G/§H) with literal VALUES oracles.

The Spark side RUNS the parser over golden wire strings; the oracle is
the expected output as a VALUES table — a golden test the driver can
hash. These are the reference's "Financial Grade Integrity" semantics
(README.md:13), so they are first-class catalog entries, not just unit
tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark import goldens
from hridaya_steam_market_tracker_spark.functions import (
    activity_price_and_currency,
    extract_currency,
    parse_steam_datetime,
    parse_steam_price,
    parse_volume,
    to_major_units,
)
from hridaya_steam_market_tracker_spark.queries import register


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _values_oracle(rows: list[tuple], columns: list[tuple[str, str]]) -> str:
    """Build `SELECT CAST(...) ... FROM (VALUES ...)` DuckDB SQL."""
    body = ",\n      ".join("(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows)
    names = ", ".join(name for name, _ in columns)
    casts = ", ".join(f"CAST({name} AS {typ}) AS {name}" for name, typ in columns)
    return f"SELECT {casts} FROM (VALUES\n      {body}\n    ) AS t({names})"


def _input_df(spark: SparkSession, inputs: list[str | None]) -> DataFrame:
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(inputs)], "id long, raw string"
    )


def _make_scalar_parser_query(name: str, pairs, fn, out_type: str, doc: str):
    inputs = [p[0] for p in pairs]
    expected = [(i, p[1]) for i, p in enumerate(pairs)]
    oracle = _values_oracle(expected, [("id", "BIGINT"), ("parsed", out_type)])

    @register(name, oracle, doc=doc)
    def _q(spark: SparkSession, sf_dir: str, _inputs=inputs, _fn=fn) -> DataFrame:
        df = _input_df(spark, _inputs)
        return df.select("id", _fn(F.col("raw")).alias("parsed"))

    return _q


_make_scalar_parser_query(
    "g1_parse_steam_price",
    goldens.PRICE_GOLDENS,
    parse_steam_price,
    "DOUBLE",
    "G1 locale-aware price parse — reference src/SQLinserts.py:593-636.",
)
_make_scalar_parser_query(
    "g2_minor_units_conversion",
    goldens.MINOR_UNIT_GOLDENS,
    to_major_units,
    "DOUBLE",
    "G2 minor-units scalar conversion — reference src/SQLinserts.py:640-655.",
)
_make_scalar_parser_query(
    "g3_parse_volume",
    goldens.VOLUME_GOLDENS,
    parse_volume,
    "BIGINT",
    "G3 volume parse — reference src/SQLinserts.py:658-675.",
)
_make_scalar_parser_query(
    "g4_extract_currency",
    goldens.CURRENCY_GOLDENS,
    extract_currency,
    "VARCHAR",
    "G4 currency-symbol -> ISO 4217 (first-match order) — reference src/SQLinserts.py:677-714.",
)
_make_scalar_parser_query(
    "h1_parse_steam_datetime",
    goldens.STEAM_DT_GOLDENS,
    parse_steam_datetime,
    "TIMESTAMP",
    "H1 Steam datetime parse ('Jul 02 2014 01: +0') — reference src/SQLinserts.py:716-753.",
)


@register(
    "g5_activity_price_currency",
    _values_oracle(
        [(i, p, c) for i, (_, p, c) in enumerate(goldens.ACTIVITY_PRICE_GOLDENS)],
        [("id", "BIGINT"), ("price", "DOUBLE"), ("currency", "VARCHAR")],
    ),
    doc="G5 activity price+currency parse (narrow 8-symbol rules) — reference utility/parseActivityHTML_utility.py:13-61.",
)
def g5_activity_price_currency(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _input_df(spark, [p[0] for p in goldens.ACTIVITY_PRICE_GOLDENS])
    price, currency = activity_price_and_currency(F.col("raw"))
    return df.select("id", price.alias("price"), currency.alias("currency"))
