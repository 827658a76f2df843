"""Join shapes (SURVEY.md §2 C1-C8) over the fixture tables.

The reference's joins are Python dict/set operations plus one
documented scalar-subquery cross join; here each becomes one Catalyst
plan. Fixture mapping: `customer` plays the manifest / control table
(user_id -> c_custkey), `events` the market stream.

Scale posture: dimension sides are broadcast (customer at real scale is
a dimension; Catalyst's threshold + explicit hint keeps the fact side
shuffle-free); diff/verify joins are hash joins on the pair key; the
HWM delta-ingest is an agg + left join that AQE turns into a broadcast
join when the per-key HWM set is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table


@register(
    "c1_broadcast_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_name, c.c_mktsegment,
           round(e.value, 6) AS value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    doc=(
        "C1 broadcast enrichment join — reference src/SQLinserts.py:386-402 merges the "
        "item-config dict into every fetched record; here the control dimension is "
        "broadcast so the fact stream never shuffles."
    ),
)
def c1_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    return events.join(
        F.broadcast(customer), events.user_id == customer.c_custkey, "inner"
    ).select("event_id", "user_id", "c_name", "c_mktsegment", F.round("value", 6).alias("value"))


@register(
    "c2_manifest_resolve_join",
    oracle="""
    SELECT e.event_id, e.user_id, c.c_nationkey, c.c_name
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    WHERE c.c_name IS NOT NULL
    """,
    doc=(
        "C2 manifest lookup join with miss-handling — reference "
        "utility/loadConfig_utility.py:76-115: resolve name->id, DROP unresolvable rows "
        "(the dropped side is c5_anti_unresolved)."
    ),
)
def c2_manifest_resolve_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey, "left")
        .filter(F.col("c_name").isNotNull())
        .select("event_id", "user_id", "c_nationkey", "c_name")
    )


@register(
    "c5_anti_unresolved",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    doc=(
        "C5 anti-join (set-replace delete / unresolved side) — reference "
        "api/main.py:1097-1107 disables pairs NOT IN the desired set."
    ),
)
def c5_anti_unresolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    return customer.join(
        events, customer.c_custkey == events.user_id, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "c6_exists_semi",
    oracle="""
    SELECT DISTINCT e.user_id
    FROM events e WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = e.user_id)
    """,
    doc="C6 existence semi-join (the 200-empty vs 404 seam) — reference api/main.py:431-443.",
)
def c6_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    customer = table(spark, sf_dir, "customer")
    return (
        events.join(customer, events.user_id == customer.c_custkey, "left_semi")
        .select("user_id")
        .distinct()
    )


@register(
    "c3_spike_above_global_avg",
    oracle="""
    WITH avg_value AS (SELECT avg(value) AS mean FROM events)
    SELECT event_id, user_id, round(value, 6) AS value
    FROM events, avg_value
    WHERE value > mean * 1.2
    """,
    doc=(
        "C3/B6 scalar-subquery cross join + spike filter — reference "
        "DOCUMENTATION.md:232-243 (price > mean * 1.2)."
    ),
)
def c3_spike_above_global_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    mean = events.agg(F.avg("value").alias("mean"))
    return (
        events.crossJoin(F.broadcast(mean))
        .filter(F.col("value") > F.col("mean") * 1.2)
        .select("event_id", "user_id", F.round("value", 6).alias("value"))
    )


@register(
    "c4_reconcile_diff",
    oracle="""
    WITH mid AS (SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS m FROM events),
    old_set AS (SELECT DISTINCT user_id FROM events, mid WHERE ts <  m),
    new_set AS (SELECT DISTINCT user_id FROM events, mid WHERE ts >= m)
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'added'
                WHEN n.user_id IS NULL THEN 'removed'
                ELSE 'kept' END AS status
    FROM old_set o FULL OUTER JOIN new_set n ON o.user_id = n.user_id
    """,
    doc=(
        "C4 keyed reconcile diff — reference src/snoozerScheduler.py:106-127: new desired "
        "set vs running set -> added / removed / kept (survivors carry state)."
    ),
)
def c4_reconcile_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    mid = events.agg(
        F.expr("timestamp_micros((unix_micros(min(ts)) + unix_micros(max(ts))) div 2)").alias("m")
    )
    with_mid = events.crossJoin(F.broadcast(mid))
    old_set = with_mid.filter(F.col("ts") < F.col("m")).select("user_id").distinct()
    new_set = with_mid.filter(F.col("ts") >= F.col("m")).select("user_id").distinct()
    o = old_set.withColumnRenamed("user_id", "o_user")
    n = new_set.withColumnRenamed("user_id", "n_user")
    return (
        o.join(n, o.o_user == n.n_user, "full_outer")
        .select(
            F.coalesce("o_user", "n_user").alias("user_id"),
            F.when(F.col("o_user").isNull(), "added")
            .when(F.col("n_user").isNull(), "removed")
            .otherwise("kept")
            .alias("status"),
        )
    )


@register(
    "c7_hwm_delta_ingest",
    oracle="""
    WITH stored AS (SELECT * FROM events WHERE event_id % 3 <> 0),
    incoming AS (SELECT * FROM events WHERE event_id % 3 = 0),
    hwm AS (SELECT user_id, max(ts) AS hwm FROM stored GROUP BY user_id)
    SELECT i.event_id, i.user_id, i.ts
    FROM incoming i LEFT JOIN hwm h ON i.user_id = h.user_id
    WHERE h.hwm IS NULL OR i.ts > h.hwm
    """,
    doc=(
        "C7 per-key high-water-mark delta ingest — reference src/SQLinserts.py:515-571: "
        "keep only incoming points past the stored per-key MAX(time); the reverse-iterate "
        "early-exit micro-opt is subsumed by the columnar filter."
    ),
)
def c7_hwm_delta_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    stored = events.filter(F.col("event_id") % 3 != 0)
    incoming = events.filter(F.col("event_id") % 3 == 0)
    hwm = stored.groupBy("user_id").agg(F.max("ts").alias("hwm"))
    return (
        incoming.join(hwm, "user_id", "left")
        .filter(F.col("hwm").isNull() | (F.col("ts") > F.col("hwm")))
        .select("event_id", "user_id", "ts")
    )


@register(
    "c8_set_equality_verify",
    oracle="""
    WITH mid AS (SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts))) // 2) AS m FROM events),
    cfg AS (SELECT DISTINCT user_id, event_type, strftime(ts, '%H') AS hh FROM events, mid WHERE ts <  m),
    db  AS (SELECT DISTINCT user_id, event_type, strftime(ts, '%H') AS hh FROM events, mid WHERE ts >= m)
    SELECT user_id, event_type, hh, 'missing' AS side
    FROM (SELECT * FROM cfg EXCEPT SELECT * FROM db)
    UNION ALL
    SELECT user_id, event_type, hh, 'extra' AS side
    FROM (SELECT * FROM db EXCEPT SELECT * FROM cfg)
    """,
    doc=(
        "C8/F2 set-equality verify — reference seed_tracked_items.py:107-133: report "
        "missing = cfg - db and extra = db - cfg."
    ),
)
def c8_set_equality_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    mid = events.agg(
        F.expr("timestamp_micros((unix_micros(min(ts)) + unix_micros(max(ts))) div 2)").alias("m")
    )
    with_mid = events.crossJoin(F.broadcast(mid)).withColumn(
        "hh", F.date_format("ts", "HH")
    )
    cfg = with_mid.filter(F.col("ts") < F.col("m")).select("user_id", "event_type", "hh").distinct()
    db = with_mid.filter(F.col("ts") >= F.col("m")).select("user_id", "event_type", "hh").distinct()
    missing = cfg.exceptAll(db).withColumn("side", F.lit("missing"))
    extra = db.exceptAll(cfg).withColumn("side", F.lit("extra"))
    return missing.unionByName(extra)


@register(
    "range_join_views_before_purchase",
    oracle="""
    SELECT p.event_id AS purchase_id, v.event_id AS view_id, p.user_id,
           round(epoch(p.ts - v.ts), 3) AS lead_sec
    FROM events p JOIN events v
      ON p.user_id = v.user_id
     AND v.ts >= p.ts - INTERVAL 1 HOUR AND v.ts < p.ts
    WHERE p.event_type = 'purchase' AND v.event_type = 'view'
    """,
    doc=(
        "Interval join (every view in the trailing hour before each same-user "
        "purchase) via operators/rangejoin.py bucketization: the range predicate "
        "becomes an equi-join on (user_id, hour-bucket) with a 2-candidate "
        "explode + residual filter — no BroadcastNestedLoopJoin. SURVEY §2 C "
        "lists range joins as the natural extension the reference lacks; the "
        "as-of join (w6) is its latest-only cousin."
    ),
)
def range_join_views_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.operators.rangejoin import (
        interval_join_trailing,
    )

    events = table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id"
    )
    views = events.filter(F.col("event_type") == "view").select(
        "event_id", "ts", "user_id"
    )
    out = interval_join_trailing(purchases, views, key="user_id", window_sec=3600)
    return out.select(
        F.col("event_id").alias("purchase_id"),
        F.col("r_event_id").alias("view_id"),
        "user_id",
        F.round(F.col("ts").cast("double") - F.col("r_ts").cast("double"), 3).alias(
            "lead_sec"
        ),
    )
