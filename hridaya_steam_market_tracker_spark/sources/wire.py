"""Wire -> storage normalization per stream (SURVEY.md §3.1 step 4).

Input contract: a DataFrame of raw responses, one row per poll, with
the wire payload columns (schemas.WIRE_*) plus the per-item request
config (market_hash_name, appid, item_nameid, requested country /
language / currency-id) — the C1 broadcast enrichment having already
attached the config (the reference merges item_config the same way,
src/SQLinserts.py:386-402).

Each normalizer is a pure select over §G/§H column functions — no
Python in the data path; currency derivation follows the reference's
fallback chains (suffix -> price-string -> 'USD',
src/SQLinserts.py:384, 427, 474-479, 531).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.functions.activity import (
    extract_activity_action,
    extract_activity_price_string,
)
from hridaya_steam_market_tracker_spark.functions.datetimes import (
    parse_steam_datetime,
    unix_to_timestamp,
)
from hridaya_steam_market_tracker_spark.functions.prices import (
    activity_price_and_currency,
    extract_currency,
    parse_steam_price,
    parse_volume,
    to_major_units,
)

_IDENTITY = ["appid", "market_hash_name", "item_nameid", "country", "language"]


def _ingest_ts() -> F.Column:
    # server-side NOW() analog (A5); normalizers stamp at transform time
    return F.current_timestamp().alias("timestamp")


def normalize_priceoverview(raw: DataFrame) -> DataFrame:
    """priceoverview wire -> price_overview rows (src/SQLinserts.py:363-402).

    Currency: first symbol found in lowest_price, else median_price,
    else 'USD'.
    """
    currency = F.coalesce(
        extract_currency(F.col("lowest_price")),
        extract_currency(F.col("median_price")),
        F.lit("USD"),
    )
    return raw.filter(F.col("success")).select(
        _ingest_ts(),
        *_IDENTITY,
        currency.alias("currency"),
        parse_steam_price(F.col("lowest_price")).alias("lowest_price"),
        parse_steam_price(F.col("median_price")).alias("median_price"),
        parse_volume(F.col("volume")).alias("volume"),
    )


def normalize_histogram(raw: DataFrame) -> DataFrame:
    """itemordershistogram wire -> orders_histogram rows
    (src/SQLinserts.py:404-453).

    THE split-brain rule (SURVEY §7 hard-part #2): scalar best bid/ask
    arrive as separator-less MINOR-unit ints -> to_major_units; the
    nested order-table price strings stay locale-formatted (G1 applies
    only when reading them). Graph triples cast to typed points.
    Currency: price_suffix symbol -> first order-table price -> 'USD'.
    """
    first_table_price = F.try_element_at(F.col("buy_order_table"), F.lit(1))["price"]
    currency = F.coalesce(
        extract_currency(F.col("price_suffix")),
        extract_currency(first_table_price),
        F.lit("USD"),
    )
    graph_point = lambda g: F.transform(  # noqa: E731
        g,
        lambda p: F.struct(
            F.try_element_at(p, F.lit(1)).cast("double").alias("price"),
            F.try_element_at(p, F.lit(2)).cast("long").alias("cum_qty"),
            F.try_element_at(p, F.lit(3)).alias("label"),
        ),
    )
    return raw.filter(F.col("success") == 1).select(
        _ingest_ts(),
        *_IDENTITY,
        currency.alias("currency"),
        F.col("buy_order_table"),
        F.col("sell_order_table"),
        graph_point(F.col("buy_order_graph")).alias("buy_order_graph"),
        graph_point(F.col("sell_order_graph")).alias("sell_order_graph"),
        parse_volume(F.col("buy_order_count")).alias("buy_order_count"),
        parse_volume(F.col("sell_order_count")).alias("sell_order_count"),
        to_major_units(F.col("highest_buy_order")).alias("highest_buy_order"),
        to_major_units(F.col("lowest_sell_order")).alias("lowest_sell_order"),
    )


def normalize_activity(raw: DataFrame) -> DataFrame:
    """itemordersactivity wire -> orders_activity rows
    (src/SQLinserts.py:455-499 + parseActivityHTML_utility.py:101-133).

    The HTML array is parsed IN PLACE via higher-order functions — one
    typed ActivityEntry struct per line, count = array length (D10);
    currency fallback: first parsed entry's currency -> 'USD'.
    """
    # rename first: the storage column is also called "timestamp" and
    # Spark 4's lateral alias resolution would shadow the wire column
    raw = raw.withColumnRenamed("timestamp", "wire_ts")
    parse_line = lambda h: F.struct(  # noqa: E731
        activity_price_and_currency(extract_activity_price_string(h))[0]
        .cast("string")
        .alias("price"),
        activity_price_and_currency(extract_activity_price_string(h))[1].alias(
            "currency"
        ),
        extract_activity_action(h).alias("action"),
        unix_to_timestamp(F.col("wire_ts")).alias("timestamp"),
        h.alias("raw_html"),
    )
    parsed = F.transform(F.col("activity"), parse_line)
    first_currency = F.try_element_at(
        F.filter(parsed, lambda e: e["currency"].isNotNull()), F.lit(1)
    )["currency"]
    return raw.filter(F.col("success") == 1).select(
        _ingest_ts(),
        *_IDENTITY,
        F.coalesce(first_currency, F.lit("USD")).alias("currency"),
        F.col("activity").alias("activity_raw"),
        parsed.alias("parsed_activities"),
        F.size(F.col("activity")).cast("int").alias("activity_count"),
        F.col("wire_ts").alias("steam_timestamp"),
    )


def normalize_pricehistory(raw: DataFrame) -> DataFrame:
    """pricehistory wire -> price_history rows (src/SQLinserts.py:501-584).

    Explodes the positional [date_str, price, volume_str] triples into
    typed rows; malformed dates -> NULL time (dropped: they can never
    satisfy the (name, time) key). Currency from price_suffix -> 'USD'.
    The per-key HWM delta filter + idempotent append live in
    streaming/ingest.py (C7 + A7).
    """
    currency = F.coalesce(extract_currency(F.col("price_suffix")), F.lit("USD"))
    exploded = raw.filter(F.col("success")).select(
        *_IDENTITY,
        currency.alias("currency"),
        F.explode(F.col("prices")).alias("point"),
    )
    return (
        exploded.select(
            parse_steam_datetime(F.try_element_at(F.col("point"), F.lit(1))).alias(
                "time"
            ),
            *_IDENTITY,
            "currency",
            F.try_element_at(F.col("point"), F.lit(2)).cast("double").alias("price"),
            parse_volume(F.try_element_at(F.col("point"), F.lit(3))).alias("volume"),
            F.current_timestamp().alias("fetched_at"),
        )
        .filter(F.col("time").isNotNull())
    )
