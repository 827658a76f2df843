"""Time-series read shapes (SURVEY.md §2 B2, D1, D5, D6, D8, E1, E2, E4, H7).

The reference serves per-item market time-series via a fixed catalog of
SQL shapes (api/main.py:248-345, 560-611; DOCUMENTATION.md:182-310).
Fixture mapping (FIXTURES.md §B): `events` plays the market tables —
user_id → market_hash_name, ts → timestamp, value → price.

Scale posture: every query is a single Catalyst plan — window functions
partitioned by the series key (hash-shuffled once, no driver loops),
"now" is a one-row aggregate broadcast-joined (no collect), filters sit
directly on the parquet scan so pushdown + partition pruning apply at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.tables import table
from hridaya_steam_market_tracker_spark.queries import register

# Deterministic "now": the newest event timestamp. One-row aggregate,
# broadcast nested-loop joined — stays fully distributed.


def _with_now(events: DataFrame) -> DataFrame:
    now = events.agg(F.max("ts").alias("now_ts"))
    return events.crossJoin(F.broadcast(now))


def _key_desc():
    return [F.col("ts").desc(), F.col("event_id").desc()]


@register(
    "e1_latest_per_key",
    oracle="""
    SELECT user_id, ts AS last_ts, event_type AS last_event_type,
           round(value, 6) AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="E1 latest-1 per key — reference api/main.py:268-291 (ORDER BY timestamp DESC LIMIT 1 per item).",
)
def e1_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_key_desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_event_type"),
            F.round("value", 6).alias("last_value"),
        )
    )


@register(
    "e2_recent_n_per_key",
    oracle="""
    SELECT user_id, event_id, ts, round(value, 6) AS value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 200
    """,
    doc="E2 recent-200 per key — reference api/main.py:79,248-265 (overview cold-start series).",
)
def e2_recent_n_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_key_desc())
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 200)
        .select("user_id", "event_id", "ts", F.round("value", 6).alias("value"))
    )


@register(
    "e3_series_tail_k",
    oracle="""
    SELECT user_id, ts, round(value, 6) AS value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 50
    """,
    doc=(
        "E3 array tail-k — reference api/main.py:80,310 keeps the last 50 events of the "
        "latest activity snapshot (parsed[-50:]). Implemented genuinely as an array slice "
        "over a per-key collected series, then re-exploded to rows for oracle comparison."
    ),
)
def e3_series_tail_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # Build the per-key time-ordered series as an array (ascending), slice
    # the last 50 — the same shape the reference applies to
    # parsed_activities — then explode back to rows.
    series = events.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
        ).alias("series")
    )
    tail = series.withColumn(
        "tail",
        F.expr("slice(series, greatest(1, size(series) - 49), least(50, size(series)))"),
    )
    return tail.select(
        "user_id", F.explode("tail").alias("e")
    ).select(
        "user_id",
        F.col("e.ts").alias("ts"),
        F.round(F.col("e.value"), 6).alias("value"),
    )


@register(
    "b2_range_filter_month",
    oracle="""
    WITH now AS (SELECT max(ts) AS now_ts FROM events)
    SELECT event_id, user_id, ts, round(value, 6) AS value
    FROM events, now
    WHERE ts >= now_ts - INTERVAL 30 DAY
    """,
    doc="B2 time-range predicate — reference api/main.py:87-93,560-611 (range=month).",
)
def b2_range_filter_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        _with_now(events)
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 30 DAYS"))
        .select("event_id", "user_id", "ts", F.round("value", 6).alias("value"))
    )


@register(
    "e4_ordered_series_for_key",
    oracle="""
    SELECT event_id, ts, round(value, 6) AS value
    FROM events
    WHERE user_id = (SELECT min(user_id) FROM events)
    """,
    doc="E4 full-series scan for one key (ORDER BY time ASC) — reference api/main.py:333-345.",
)
def e4_ordered_series_for_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    first_key = events.agg(F.min("user_id").alias("sel_user"))
    return (
        events.join(F.broadcast(first_key), F.col("user_id") == F.col("sel_user"))
        .orderBy(F.col("ts").asc())
        .select("event_id", "ts", F.round("value", 6).alias("value"))
    )


@register(
    "d1_hwm_per_key",
    oracle="""
    SELECT user_id, max(ts) AS hwm, CAST(count(*) AS BIGINT) AS n_points
    FROM events GROUP BY user_id
    """,
    doc="D1 grouped high-water marks — reference src/SQLinserts.py:102-120 (resume/skip map).",
)
def d1_hwm_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.max("ts").alias("hwm"), F.count(F.lit(1)).alias("n_points")
    )


@register(
    "d5_daily_rollup",
    oracle="""
    WITH now AS (SELECT max(ts) AS now_ts FROM events)
    SELECT date_trunc('day', ts) AS day,
           round(avg(value), 6) AS avg_value,
           round(sum(value), 4) AS sum_value,
           CAST(count(*) AS BIGINT) AS n
    FROM events, now
    WHERE ts >= now_ts - INTERVAL 30 DAY
    GROUP BY date_trunc('day', ts)
    """,
    doc="D5 daily rollup (AVG price, SUM volume, last 30 d) — reference DOCUMENTATION.md:211-221.",
)
def d5_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        _with_now(events)
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 30 DAYS"))
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "d6_volatility_per_key",
    oracle="""
    WITH now AS (SELECT max(ts) AS now_ts FROM events)
    SELECT user_id,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value,
           round(avg(value), 6) AS avg_value,
           round((max(value) - min(value)) / avg(value) * 100, 6) AS volatility_pct
    FROM events, now
    WHERE ts >= now_ts - INTERVAL 7 DAY
    GROUP BY user_id
    HAVING avg(value) <> 0
    """,
    doc="D6 per-key volatility (MAX-MIN)/AVG*100 over a trailing window — reference DOCUMENTATION.md:289-300.",
)
def d6_volatility_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        _with_now(events)
        .filter(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 7 DAYS"))
        .groupBy("user_id")
        .agg(
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round((F.max("value") - F.min("value")) / F.avg("value") * 100, 6).alias(
                "volatility_pct"
            ),
        )
        .filter(F.col("avg_value") != 0)
    )


@register(
    "d8_latest_summary_per_key",
    oracle="""
    WITH ranked AS (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           max(ts) AS last_ts,
           round(max(CASE WHEN rn = 1 THEN value END), 6) AS last_value
    FROM ranked GROUP BY user_id
    """,
    doc=(
        "D8 latest-per-group summary (value at MAX(timestamp), cross-item comparison) — "
        "reference DOCUMENTATION.md:278-287. Spark side uses max_by on the (ts, event_id) "
        "composite, mirroring the SQLite bare-column-at-max semantics."
    ),
)
def d8_latest_summary_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max("ts").alias("last_ts"),
        F.round(F.expr("max_by(value, struct(ts, event_id))"), 6).alias("last_value"),
    )


@register(
    "h7_staleness_cutoff",
    oracle="""
    WITH now AS (SELECT max(ts) AS now_ts FROM events),
    hwm AS (SELECT user_id, max(ts) AS last_ts FROM events GROUP BY user_id)
    SELECT user_id, last_ts FROM hwm, now
    WHERE last_ts < now_ts - INTERVAL 1 DAY
    """,
    doc="H7 staleness skip gate (freshness resume) — reference collect_price_history.py:86-106.",
)
def h7_staleness_cutoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    hwm = events.groupBy("user_id").agg(F.max("ts").alias("last_ts"))
    now = events.agg(F.max("ts").alias("now_ts"))
    return (
        hwm.crossJoin(F.broadcast(now))
        .filter(F.col("last_ts") < F.col("now_ts") - F.expr("INTERVAL 1 DAYS"))
        .select("user_id", "last_ts")
    )
