"""Post-ingest sanity invariants (reference utility/check_live_tables.sql:1-27)
as DataFrame assertions — the reference's manual health checks become
engine operators that return violation rows (empty = healthy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def overview_price_sanity(price_overview: DataFrame) -> DataFrame:
    """check_live_tables.sql:10-12 — NULL / non-positive / lowest>median."""
    return price_overview.filter(
        F.col("lowest_price").isNull()
        | (F.col("lowest_price") <= 0)
        | (F.col("lowest_price") > F.col("median_price"))
    ).select("timestamp", "market_hash_name", "lowest_price", "median_price")


def histogram_book_sanity(orders_histogram: DataFrame) -> DataFrame:
    """check_live_tables.sql:14-19 — crossed book or count/array mismatch."""
    crossed = F.col("lowest_sell_order") <= F.col("highest_buy_order")
    buy_mismatch = F.col("buy_order_count") < F.size(F.col("buy_order_table"))
    sell_mismatch = F.col("sell_order_count") < F.size(F.col("sell_order_table"))
    return orders_histogram.filter(
        (crossed & F.col("lowest_sell_order").isNotNull() & F.col("highest_buy_order").isNotNull())
        | buy_mismatch
        | sell_mismatch
    ).select(
        "timestamp", "market_hash_name",
        "highest_buy_order", "lowest_sell_order",
        "buy_order_count", "sell_order_count",
    )


def activity_count_sanity(orders_activity: DataFrame) -> DataFrame:
    """check_live_tables.sql:21-27 — activity_count must equal BOTH
    array lengths."""
    return orders_activity.filter(
        (F.col("activity_count") != F.size(F.col("activity_raw")))
        | (F.col("activity_count") != F.size(F.col("parsed_activities")))
    ).select("timestamp", "market_hash_name", "activity_count")


def table_meta(df: DataFrame, ts_col: str = "timestamp") -> DataFrame:
    """check_live_tables.sql:5-7 — count / distinct currencies / recency."""
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.array_sort(F.collect_set("currency")).alias("currencies"),
        F.max(ts_col).alias("latest"),
    )
