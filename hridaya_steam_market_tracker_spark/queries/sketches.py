"""Sketch / approximate aggregates + native session windows.

The 100 TB posture for distinct-counting and percentiles is NOT exact
shuffled aggregation — it is mergeable sketches: each partition builds a
small fixed-size summary (HLL register array, percentile digest), and the
combine phase unions summaries instead of rows. That turns an
all-to-all shuffle of every distinct key into a shuffle of one ~KB blob
per partition per group. The reference never needs this (its tables fit
one Postgres node — SURVEY.md §6), but a user scaling its workload does,
so both the exact oracle-checked baselines and the sketch scale paths are
registered here; pytest bounds the sketch error against the exact answers
(tests/test_sketches.py).

Also: Spark's native `session_window` (the streaming-capable operator),
oracle-checked against the ANSI gap-and-islands decomposition. The
hand-rolled lag+cumsum formulation lives in queries/behavior.py; this one
proves the built-in operator computes the same sessions. Note the boundary
semantics: Spark merges two events iff gap < 30 min (window `[ts, ts+gap)`
overlap), so the oracle's new-session predicate is `>=`, while a strictly
`>` split belongs to the lag formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

GAP_MIN = 30


@register(
    "distinct_users_per_stream",
    oracle="""
    SELECT event_type,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type
    """,
    doc=(
        "Exact distinct users per stream — the oracle-checked baseline the HLL "
        "sketch variants are error-bounded against."
    ),
)
def distinct_users_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "approx_distinct_users_per_stream",
    oracle=None,  # estimator internals differ per engine; error bound is pytest-checked
    doc=(
        "HyperLogLog++ distinct users per stream (approx_count_distinct, rsd=2%). "
        "Scale path for distinct-counting: constant-size per-partition state, "
        "no row shuffle. Error vs the exact baseline bounded in tests."
    ),
)
def approx_distinct_users_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
    )


@register(
    "hll_sketch_rollup",
    oracle=None,  # sketch blobs are engine-specific; estimate error is pytest-checked
    doc=(
        "Mergeable-sketch rollup (Apache DataSketches HLL): build one sketch per "
        "(event_type, day) partial, then union-merge partials to a per-stream "
        "estimate. This two-level shape is how a 1000-executor cluster "
        "pre-aggregates distincts incrementally — daily partials persist, and "
        "any rollup (weekly/monthly/all-time) is a cheap sketch union instead "
        "of a rescan of raw rows."
    ),
)
def hll_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id").alias("sketch"))
    return (
        daily.groupBy("event_type")
        .agg(F.hll_union_agg("sketch").alias("merged"))
        .select(
            "event_type",
            F.hll_sketch_estimate("merged").alias("n_users_est"),
        )
    )


@register(
    "approx_percentiles_per_stream",
    oracle=None,  # interpolation-free rank estimates differ per engine; pytest-bounded
    doc=(
        "approx_percentile (Greenwald-Khanna, accuracy 10000) p50/p90/p99 of "
        "value per stream — the mergeable scale path for queries/behavior.py's "
        "exact percentiles; rank error bounded in tests."
    ),
)
def approx_percentiles_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    pct = F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)")
    return events.groupBy("event_type").agg(
        pct.getItem(0).alias("p50_approx"),
        pct.getItem(1).alias("p90_approx"),
        pct.getItem(2).alias("p99_approx"),
    )


@register(
    "session_window_native",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL {GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL {GAP_MIN} MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered GROUP BY user_id, grp
    """,
    doc=(
        "Spark's built-in session_window (30-min gap) in batch mode, "
        "oracle-checked against the ANSI gap-and-islands decomposition. "
        "window.end is last-event + gap by definition; merge rule is "
        "overlap of [ts, ts+gap), hence the >= new-session predicate."
    ),
)
def session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", f"{GAP_MIN} minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
