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