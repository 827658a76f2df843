"""Analytical extensions beyond the reference's surface (SURVEY.md §2
D-note records the reference has no grouping sets / cube / rollup /
pivot — standard warehouse idioms its dashboards would reach for
next). All Catalyst-native multi-dimensional aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table


@register(
    "x1_rollup_region_nation",
    oracle="""
    SELECT COALESCE(r.r_name, 'ALL') AS region,
           CASE WHEN GROUPING(n.n_name) = 1 THEN 'ALL' ELSE n.n_name END AS nation,
           CAST(count(*) AS BIGINT) AS n_customers,
           round(sum(c.c_acctbal), 2) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP(r.r_name, n.n_name)
    """,
    doc="ROLLUP hierarchy totals (region -> nation -> grand total).",
)
def x1_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_acctbal"),
            F.grouping("n_name").alias("__g_nation"),  # grouping() lives in the agg
        )
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region"),
            F.when(F.col("__g_nation") == 1, "ALL").otherwise(F.col("n_name")).alias("nation"),
            "n_customers",
            "total_acctbal",
        )
    )


@register(
    "x2_cube_flag_status",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE over (returnflag, linestatus): all 2^2 grouping sets in one pass.",
)
def x2_cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n",
        )
    )


@register(
    "x3_pivot_status_by_segment",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_filled,
           CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_pending
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    doc="PIVOT order status across market segments (explicit value list -> no extra pass).",
)
def x3_pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    pivoted = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .pivot("o_orderstatus", ["O", "F", "P"])
        .count()
    )
    return pivoted.select(
        "segment",
        F.coalesce("O", F.lit(0)).alias("n_open"),
        F.coalesce("F", F.lit(0)).alias("n_filled"),
        F.coalesce("P", F.lit(0)).alias("n_pending"),
    )


@register(
    "x4_above_customer_avg_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS totalprice
    FROM (
      SELECT *, avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
      FROM orders
    )
    WHERE o_totalprice > 1.5 * cust_avg
    """,
    doc=(
        "Correlated-subquery family (TPC-H Q2/Q17 style: compare each row to its "
        "group's aggregate) — decorrelated to a window, one shuffle."
    ),
)
def x4_above_customer_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        o.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .filter(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("totalprice"))
    )


@register(
    "x5_grouping_sets_events",
    oracle="""
    SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END AS stream,
           CASE WHEN GROUPING(hh) = 1 THEN 'ALL' ELSE hh END AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total_value
    FROM (SELECT event_type, strftime(ts, '%H') AS hh, value FROM events)
    GROUP BY GROUPING SETS ((event_type), (hh), (event_type, hh))
    """,
    doc=(
        "Explicit GROUPING SETS (per-stream, per-hour, and per-stream-hour "
        "aggregates in ONE pass): the arbitrary-set sibling of x1 ROLLUP and "
        "x2 CUBE. One scan + one expand + one hash aggregate, vs three "
        "scans if issued as separate queries."
    ),
)
def x5_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    base = events.select(
        "event_type", F.date_format("ts", "HH").alias("hh"), "value"
    )
    gs = base.groupingSets(
        [["event_type"], ["hh"], ["event_type", "hh"]], "event_type", "hh"
    ).agg(
        # grouping() is only resolvable inside the agg, not a later select
        F.grouping("event_type").alias("g_stream"),
        F.grouping("hh").alias("g_hh"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )
    return gs.select(
        F.when(F.col("g_stream") == 1, "ALL")
        .otherwise(F.col("event_type"))
        .alias("stream"),
        F.when(F.col("g_hh") == 1, "ALL").otherwise(F.col("hh")).alias(
            "hour_of_day"
        ),
        "n",
        "total_value",
    )


def _morton_terms_sql(u: str, d: str, bits: int = 16) -> str:
    """DuckDB bit-interleave mirroring storage/zorder.py:morton_code."""
    terms = []
    for i in range(bits):
        terms.append(f"((({u} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({d} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@register(
    "zorder_code_assignment",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, epoch_us(ts) // 86400000000 AS day_idx
      FROM events
    )
    SELECT event_id, user_id, CAST(day_idx AS BIGINT) AS day_idx,
           CAST({_morton_terms_sql('user_id', 'day_idx')} AS BIGINT) AS z_code
    FROM base
    """,
    doc=(
        "Z-order (Morton) clustering key over (user_id, epoch-day) — the "
        "multi-dimensional data-skipping layout primitive "
        "(storage/zorder.py; Delta OPTIMIZE ZORDER analog, Morton 1966). "
        "Pure scan-stage bit expressions; the clustered-write path and its "
        "row-group pruning win are exercised in tests/test_bucketing.py."
    ),
)
def zorder_code_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.storage.zorder import morton_code

    events = table(spark, sf_dir, "events")
    base = events.select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
    )
    return base.select(
        "event_id",
        "user_id",
        "day_idx",
        morton_code(F.col("user_id"), F.col("day_idx")).alias("z_code"),
    )
