"""Meta-aggregations, set ops, feasibility, JSON/arithmetic scalars
(SURVEY.md §2 B3-B5, D2-D4, D9, D11, E6, F1, F3, G10, H3, I1, I3, I5/I6, J13).

These reproduce the reference's /meta read path (api/main.py:454-542),
the feasibility admission rule (utility/feasibility_utility.py:15-28),
the sanity invariants (utility/check_live_tables.sql) and the scheduler
urgency computation (src/snoozerScheduler.py:129-153) as declarative
plans over the `events` fixture.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

# The three "live tables" analog: three event_type slices of `events`
# (the reference unions price_overview / orders_histogram /
# orders_activity — api/main.py:508-527).
_STREAMS = ("click", "view", "purchase")


def _now(events: DataFrame) -> DataFrame:
    return events.agg(F.max("ts").alias("now_ts"))


@register(
    "d2_count_enabled",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_enabled
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) < 50
    """,
    doc="D2/B3 boolean-flag count — reference api/main.py:505-507 (count of enabled tracked items).",
)
def d2_count_enabled(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.filter(
        F.get_json_object("props", "$.k").cast("int") < 50
    ).agg(F.count(F.lit(1)).alias("n_enabled"))


@register(
    "d3_windowed_union_count",
    oracle="""
    WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
    SELECT CAST(count(*) AS BIGINT) AS used
    FROM events, now_t
    WHERE ts >= now_ts - INTERVAL 7 DAY
      AND event_type IN ('click', 'view', 'purchase')
    """,
    doc=(
        "D3/J13 windowed usage reconstruction — reference api/main.py:519-527 counts rows "
        "across the three live tables in the trailing window (1 request = 1 row)."
    ),
)
def d3_windowed_union_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    slices = [
        events.filter(F.col("event_type") == s).select("ts") for s in _STREAMS
    ]
    unioned = slices[0]
    for s in slices[1:]:
        unioned = unioned.unionByName(s)
    return (
        unioned.crossJoin(F.broadcast(_now(events)))
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 7 DAYS"))
        .agg(F.count(F.lit(1)).alias("used"))
    )


@register(
    "d4_last_ingest_union_max",
    oracle="""
    SELECT max(m) AS last_ingest FROM (
      SELECT max(ts) AS m FROM events WHERE event_type = 'click'
      UNION ALL SELECT max(ts) FROM events WHERE event_type = 'view'
      UNION ALL SELECT max(ts) FROM events WHERE event_type = 'purchase'
    )
    """,
    doc="D4/F1 global max over UNION ALL of per-table maxes — reference api/main.py:508-518.",
)
def d4_last_ingest_union_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    maxes = [
        events.filter(F.col("event_type") == s).agg(F.max("ts").alias("m"))
        for s in _STREAMS
    ]
    unioned = maxes[0]
    for m in maxes[1:]:
        unioned = unioned.unionByName(m)
    return unioned.agg(F.max("m").alias("last_ingest"))


@register(
    "f1_union_all_per_stream_meta",
    oracle="""
    WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_type AS stream, CAST(count(*) AS BIGINT) AS n, max(ts) AS last_ts
    FROM events, now_t
    WHERE ts >= now_ts - INTERVAL 14 DAY
      AND event_type IN ('click', 'view', 'purchase')
    GROUP BY event_type
    """,
    doc="F1 union-all meta counts per live table — reference utility/check_live_tables.sql:5-7.",
)
def f1_union_all_per_stream_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    per_stream = [
        events.filter(F.col("event_type") == s)
        .crossJoin(F.broadcast(_now(events)))
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 14 DAYS"))
        .groupBy(F.col("event_type").alias("stream"))
        .agg(F.count(F.lit(1)).alias("n"), F.max("ts").alias("last_ts"))
        for s in _STREAMS
    ]
    unioned = per_stream[0]
    for p in per_stream[1:]:
        unioned = unioned.unionByName(p)
    return unioned


@register(
    "f3_payload_dup_check",
    oracle="""
    SELECT user_id, event_type, date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2, 3
    HAVING count(*) > 1
    """,
    doc="F3 body-level dedup check (duplicate key pairs in one payload) — reference api/main.py:1025-1028.",
)
def f3_payload_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", "event_type", F.date_trunc("day", "ts").alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


@register(
    "d9_feasibility_gate",
    oracle="""
    WITH items AS (
      SELECT DISTINCT user_id, 5 + (user_id % 120) AS poll_interval_sec
      FROM events
    )
    SELECT CAST(sum(CAST(floor(60.0 / poll_interval_sec) AS BIGINT)) AS BIGINT) AS required,
           CAST(15 AS BIGINT) AS budget,
           round(sum(CAST(floor(60.0 / poll_interval_sec) AS BIGINT)) / 15.0 * 100, 6) AS utilization_pct,
           sum(CAST(floor(60.0 / poll_interval_sec) AS BIGINT)) <= 15 AS feasible
    FROM items
    """,
    doc=(
        "D9 feasibility admission rule — reference utility/feasibility_utility.py:15-28: "
        "sum(floor(window / interval)) <= budget, plus utilization%."
    ),
)
def d9_feasibility_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    items = events.select(
        "user_id", (F.lit(5) + F.col("user_id") % 120).alias("poll_interval_sec")
    ).distinct()
    required = F.sum(F.floor(F.lit(60.0) / F.col("poll_interval_sec")).cast("long"))
    return items.agg(
        required.cast("long").alias("required"),
        F.lit(15).cast("long").alias("budget"),
        F.round(required / 15.0 * 100, 6).alias("utilization_pct"),
        (required <= 15).alias("feasible"),
    )


@register(
    "d11_distinct_collect_per_stream",
    oracle="""
    SELECT event_type,
           array_to_string(list_sort(list(DISTINCT user_id % 10)), ',') AS currency_set
    FROM events GROUP BY event_type
    """,
    doc=(
        "D11 distinct-value collection (array_agg(DISTINCT currency) sanity) — reference "
        "utility/check_live_tables.sql:5-7; emitted as a sorted joined string for "
        "cross-engine hashing."
    ),
)
def d11_distinct_collect_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.array_join(
            F.array_sort(F.collect_set(F.col("user_id") % 10)), ","
        ).alias("currency_set")
    )


@register(
    "b5_sanity_invariants",
    oracle="""
    WITH stats AS (SELECT avg(value) AS mean FROM events)
    SELECT event_type,
           CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
           CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonpositive,
           CAST(sum(CASE WHEN value > 3 * mean THEN 1 ELSE 0 END) AS BIGINT) AS n_outlier
    FROM events, stats
    GROUP BY event_type
    """,
    doc=(
        "B5 null/threshold sanity predicates — reference utility/check_live_tables.sql:10-12 "
        "(lowest_price IS NULL OR <= 0 OR > median), grouped per live table."
    ),
)
def b5_sanity_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    stats = events.agg(F.avg("value").alias("mean"))
    return (
        events.crossJoin(F.broadcast(stats))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).cast("long").alias("n_null"),
            F.sum(F.when(F.col("value") <= 0, 1).otherwise(0)).cast("long").alias("n_nonpositive"),
            F.sum(F.when(F.col("value") > 3 * F.col("mean"), 1).otherwise(0)).cast("long").alias("n_outlier"),
        )
    )


@register(
    "i1_json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) >= 90
    """,
    doc="I1 JSON path extraction from the nested payload — reference DOCUMENTATION.md:304-310.",
)
def i1_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return events.select("event_id", k.alias("k")).filter(F.col("k") >= 90)


@register(
    "i3_json_payload_build",
    oracle="""
    SELECT user_id,
           '{"name":"u' || CAST(user_id AS VARCHAR) || '","stream":"' || event_type || '"}' AS payload
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc=(
        "I3 NOTIFY payload build (thin {name, stream} frame for the latest row per key) — "
        "reference utility/marketDataNotify_utility.py:68-72."
    ),
)
def i3_json_payload_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.concat(
                F.lit('{"name":"u'),
                F.col("user_id").cast("string"),
                F.lit('","stream":"'),
                F.col("event_type"),
                F.lit('"}'),
            ).alias("payload"),
        )
    )


@register(
    "i5_spread_per_key_day",
    oracle="""
    SELECT user_id, date_trunc('day', ts) AS day,
           round(max(value) - min(value), 6) AS spread,
           max(value) > min(value) AS spread_ok
    FROM events
    GROUP BY 1, 2
    """,
    doc=(
        "I5/I6 arithmetic derivations + crossed-book predicate — reference "
        "DOCUMENTATION.md:201-202 (spread = lowest_sell - highest_buy) and "
        "utility/check_live_tables.sql:15-19 (spread_ok boolean)."
    ),
)
def i5_spread_per_key_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.max("value") - F.min("value"), 6).alias("spread"),
            (F.max("value") > F.min("value")).alias("spread_ok"),
        )
    )


@register(
    "e6_urgency_overdue",
    oracle="""
    WITH now_t AS (SELECT max(ts) AS now_ts FROM events),
    hwm AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
    SELECT user_id,
           round(epoch(now_ts - last_ts) / (5 + (user_id % 120)), 4) AS urgency
    FROM hwm, now_t
    WHERE epoch(now_ts - last_ts) / (5 + (user_id % 120)) >= 1.0
    """,
    doc=(
        "E6 urgency-based overdue selection — reference src/snoozerScheduler.py:129-153: "
        "urgency = elapsed / interval, poll everything >= 1.0."
    ),
)
def e6_urgency_overdue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    hwm = events.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    now = _now(events)
    elapsed = (
        F.col("now_ts").cast("double") - F.col("last_ts").cast("double")
    )
    interval = F.lit(5) + F.col("user_id") % 120
    urgency = elapsed / interval
    return (
        hwm.crossJoin(F.broadcast(now))
        .filter(urgency >= 1.0)
        .select("user_id", F.round(urgency, 4).alias("urgency"))
    )


@register(
    "g10_sha256_fingerprint",
    oracle="""
    SELECT event_id, sha256(event_type || ':' || props) AS fingerprint
    FROM events WHERE event_id % 100 = 0
    """,
    doc="G10 SHA-256 content hash (config loop guard) — reference utility/configTableSync_utility.py:73-75.",
)
def g10_sha256_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.filter(F.col("event_id") % 100 == 0).select(
        "event_id",
        F.sha2(F.concat(F.col("event_type"), F.lit(":"), F.col("props")), 256).alias(
            "fingerprint"
        ),
    )


@register(
    "h3_hour_label_histogram",
    oracle="""
    SELECT strftime(ts, '%H:00') AS hour_label, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1
    """,
    doc="H3 hour-label bucketing (strftime('%H:00')) — reference DOCUMENTATION.md:225.",
)
def h3_hour_label_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy(
        F.date_format("ts", "HH:00").alias("hour_label")
    ).agg(F.count(F.lit(1)).alias("n"))
