"""Bucketed co-located joins: the orders ⋈ lineitem shuffle must
disappear when both facts are bucketed on the join key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.storage.bucketing import (
    cobucket_facts,
    has_exchange,
)
from hridaya_steam_market_tracker_spark.tables import table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    # disable auto-broadcast so the test exercises the big-big path the
    # bucketing exists for
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield cobucket_facts(spark, li, o, "l_orderkey", "b_lineitem", "b_orders", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    bli, bo = bucketed
    joined = bli.join(bo, "l_orderkey").groupBy("o_orderstatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("rev")
    )
    # the join itself must be exchange-free; only the tiny post-join
    # aggregate may shuffle
    join_only = bli.join(bo, "l_orderkey")
    assert not has_exchange(join_only), join_only._jdf.queryExecution().executedPlan().toString()

    # and results equal the unbucketed plan
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    expected = {
        r["o_orderstatus"]: r["rev"]
        for r in li.join(o, "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum("l_extendedprice"), 2).alias("rev"))
        .collect()
    }
    got = {r["o_orderstatus"]: r["rev"] for r in joined.collect()}
    assert got == expected


def test_unbucketed_join_does_shuffle(spark):
    li = table(spark, SF, "lineitem")
    o = table(spark, SF, "orders").withColumnRenamed("o_orderkey", "l_orderkey")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert has_exchange(li.join(o, "l_orderkey"))  # the baseline cost
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

def test_zorder_layout_skips_more_row_groups_than_time_sort(spark, tmp_path):
    """Write events (a) time-sorted (the 1-D baseline layout) and
    (b) Z-ordered on (user_id, epoch-day). For a 2-D box predicate the
    Z layout must leave fewer files whose row-group min/max stats
    overlap the box — multi-dimensional skipping is the whole point of
    Morton clustering."""
    import pyarrow.parquet as pq
    import os

    from hridaya_steam_market_tracker_spark.storage.zorder import write_zordered
    from hridaya_steam_market_tracker_spark.tables import table as t

    events = t(spark, "/root/testdata/sf0.01", "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
    )
    base = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    (
        events.repartitionByRange(32, "day_idx")
        .sortWithinPartitions("day_idx")
        .write.mode("overwrite")
        .parquet(base)
    )
    write_zordered(events, zpath, "user_id", "day_idx", n_files=32)

    # 2-D box derived from the data's own bounds (the driver regenerates
    # the fixture between rounds): ~1/8 of the user domain x 8 days.
    b = events.agg(
        F.min("user_id"), F.max("user_id"), F.min("day_idx"), F.max("day_idx")
    ).first()
    u_min, u_max, d_min = b[0], b[1], b[2]
    u_lo = u_min + (u_max - u_min) // 8
    u_hi = u_lo + max(3, (u_max - u_min) // 16)
    d_lo, d_hi = d_min + 3, d_min + 10

    def overlapping_files(path: str) -> int:
        n = 0
        for f in os.listdir(path):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            hit = False
            for rg in range(md.num_row_groups):
                row = md.row_group(rg)
                stats = {
                    row.column(i).path_in_schema: row.column(i).statistics
                    for i in range(row.num_columns)
                }
                u, d = stats["user_id"], stats["day_idx"]
                if u.min <= u_hi and u.max >= u_lo and d.min <= d_hi and d.max >= d_lo:
                    hit = True
            n += 1 if hit else 0
        return n

    lin, zo = overlapping_files(base), overlapping_files(zpath)
    # sanity: the box actually selects rows
    n_rows = events.filter(
        (F.col("user_id").between(u_lo, u_hi))
        & (F.col("day_idx").between(d_lo, d_hi))
    ).count()
    assert n_rows > 0
    assert zo < lin, f"z-order files hit {zo} not < linear {lin}"
