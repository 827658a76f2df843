"""Behavioral/statistical extensions: gap-based sessionization,
exact percentiles, value histograms.

Session windows are called out in SURVEY.md §J as a Structured
Streaming feature the reference only implies; the batch formulation
here (lag + cumulative gap count — one keyed window pass) is the
canonical decomposition and doubles as the oracle for the streaming
`session_window` variant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

SESSION_GAP_MIN = 30


@register(
    "sessionize_events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MIN} MINUTE
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts, event_id,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
      FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events,
           round(epoch(max(ts) - min(ts)), 3) AS duration_sec
    FROM sessions GROUP BY user_id, session_seq
    """,
    doc=(
        "Gap-based sessionization (30-minute inactivity splits): lag + running "
        "new-session count, one keyed window pass — the batch oracle of Spark's "
        "streaming session_window."
    ),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.col("ts").cast("double") - prev_ts.cast("double") > SESSION_GAP_MIN * 60),
        1,
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    sessions = events.withColumn("is_new", is_new).withColumn(
        "session_seq", F.sum("is_new").over(run)
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.max("ts").cast("double") - F.min("ts").cast("double"), 3
        ).alias("duration_sec"),
    )


@register(
    "value_percentiles_per_stream",
    oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.9), 6) AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    doc=(
        "Exact percentiles per stream (linear interpolation — Spark percentile() and "
        "DuckDB quantile_cont share the definition). The approximate scale path is "
        "approx_percentile/t-digest; exact is the oracle-checkable baseline."
    ),
)
def value_percentiles_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )


@register(
    "value_histogram",
    oracle="""
    SELECT CAST(least(floor(value / 50.0), 9) AS INTEGER) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(min(value), 6) AS lo,
           round(max(value), 6) AS hi
    FROM events GROUP BY 1
    """,
    doc="Fixed-width value histogram (width-50 buckets, top-capped) — D-family binning.",
)
def value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 50.0), F.lit(9)).cast("int")
    return events.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("value"), 6).alias("lo"),
        F.round(F.max("value"), 6).alias("hi"),
    )
