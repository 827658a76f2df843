"""StructType schemas for the engine's five storage tables and four
wire formats (SURVEY.md §1.3/§1.4).

Storage schemas mirror the reference DDL (src/SQLinserts.py:175-244,
299-317; utility/configTableSync_utility.py:121-136): JSONB payloads
become native nested ArrayType(StructType) columns — no JSON-string
detour — and the wire's string-typed numerics are preserved INSIDE
nested payloads (the reference only normalizes scalars; SURVEY §1.3).

Wire schemas match data/dataExamples.txt.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# shared identity/locale columns (every data table carries them)
_IDENTITY = [
    T.StructField("appid", T.IntegerType(), True),
    T.StructField("market_hash_name", T.StringType(), False),
    T.StructField("item_nameid", T.LongType(), True),
    T.StructField("currency", T.StringType(), True),  # ISO 4217 after ingest
    T.StructField("country", T.StringType(), True),
    T.StructField("language", T.StringType(), True),
]

ORDER_TABLE_ENTRY = T.StructType(
    [
        T.StructField("price", T.StringType(), True),  # wire keeps locale strings
        T.StructField("quantity", T.StringType(), True),
    ]
)

ORDER_GRAPH_POINT = T.StructType(
    [
        T.StructField("price", T.DoubleType(), True),
        T.StructField("cum_qty", T.LongType(), True),
        T.StructField("label", T.StringType(), True),
    ]
)

ACTIVITY_ENTRY = T.StructType(
    [
        T.StructField("price", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("action", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
        T.StructField("raw_html", T.StringType(), True),
    ]
)

PRICE_OVERVIEW = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        *_IDENTITY,
        T.StructField("lowest_price", T.DoubleType(), True),
        T.StructField("median_price", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
    ]
)

ORDERS_HISTOGRAM = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        *_IDENTITY,
        T.StructField("buy_order_table", T.ArrayType(ORDER_TABLE_ENTRY), True),
        T.StructField("sell_order_table", T.ArrayType(ORDER_TABLE_ENTRY), True),
        T.StructField("buy_order_graph", T.ArrayType(ORDER_GRAPH_POINT), True),
        T.StructField("sell_order_graph", T.ArrayType(ORDER_GRAPH_POINT), True),
        T.StructField("buy_order_count", T.LongType(), True),
        T.StructField("sell_order_count", T.LongType(), True),
        T.StructField("highest_buy_order", T.DoubleType(), True),  # MAJOR units
        T.StructField("lowest_sell_order", T.DoubleType(), True),
    ]
)

ORDERS_ACTIVITY = T.StructType(
    [
        T.StructField("timestamp", T.TimestampType(), False),
        *_IDENTITY,
        T.StructField("activity_raw", T.ArrayType(T.StringType()), True),
        T.StructField("parsed_activities", T.ArrayType(ACTIVITY_ENTRY), True),
        T.StructField("activity_count", T.IntegerType(), True),
        T.StructField("steam_timestamp", T.LongType(), True),
    ]
)

PRICE_HISTORY = T.StructType(
    [
        T.StructField("time", T.TimestampType(), False),  # natural key with name
        *_IDENTITY,
        T.StructField("price", T.DoubleType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("fetched_at", T.TimestampType(), True),
    ]
)

TRACKED_ITEMS = T.StructType(
    [
        T.StructField("market_hash_name", T.StringType(), False),
        T.StructField("appid", T.IntegerType(), True),
        T.StructField("item_nameid", T.LongType(), True),
        T.StructField("stream", T.StringType(), False),
        T.StructField("currency", T.IntegerType(), True),  # Steam wallet id
        T.StructField("country", T.StringType(), True),
        T.StructField("language", T.StringType(), True),
        T.StructField("poll_interval_sec", T.IntegerType(), True),
        T.StructField("enabled", T.BooleanType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# ---------------------------------------------------------------------------
# wire formats (data/dataExamples.txt)

WIRE_PRICEOVERVIEW = T.StructType(
    [
        T.StructField("success", T.BooleanType(), True),
        T.StructField("lowest_price", T.StringType(), True),  # "0,03€"
        T.StructField("median_price", T.StringType(), True),
        T.StructField("volume", T.StringType(), True),  # "1,234"
    ]
)

WIRE_HISTOGRAM = T.StructType(
    [
        T.StructField("success", T.IntegerType(), True),
        T.StructField("buy_order_count", T.StringType(), True),  # int-or-string on wire
        T.StructField("sell_order_count", T.StringType(), True),
        T.StructField("buy_order_table", T.ArrayType(ORDER_TABLE_ENTRY), True),
        T.StructField("sell_order_table", T.ArrayType(ORDER_TABLE_ENTRY), True),
        T.StructField(
            "buy_order_graph", T.ArrayType(T.ArrayType(T.StringType())), True
        ),  # heterogeneous triples arrive stringly
        T.StructField(
            "sell_order_graph", T.ArrayType(T.ArrayType(T.StringType())), True
        ),
        T.StructField("highest_buy_order", T.StringType(), True),  # minor units!
        T.StructField("lowest_sell_order", T.StringType(), True),
        T.StructField("price_suffix", T.StringType(), True),
    ]
)

WIRE_ACTIVITY = T.StructType(
    [
        T.StructField("success", T.IntegerType(), True),
        T.StructField("activity", T.ArrayType(T.StringType()), True),
        T.StructField("timestamp", T.LongType(), True),
    ]
)

WIRE_PRICEHISTORY = T.StructType(
    [
        T.StructField("success", T.BooleanType(), True),
        T.StructField("price_prefix", T.StringType(), True),
        T.StructField("price_suffix", T.StringType(), True),
        T.StructField(
            "prices", T.ArrayType(T.ArrayType(T.StringType())), True
        ),  # [date_str, price_float, volume_str] positional triples
    ]
)
