"""Event-analytics extensions: conversion funnel and gap-filled series.

* ``funnel_view_click_purchase`` — the classic ordered conversion
  funnel: a user advances a stage only if the next event type occurs
  AFTER their earliest previous-stage event. One shuffle on user_id
  (chained window expressions share the exchange), then a tiny stage
  rollup.
* ``gapfill_hourly_locf`` — the TimescaleDB ``time_bucket_gapfill`` +
  ``locf`` analog (the reference runs on Timescale; its continuous
  hypertable reads assume dense buckets, cf. DOCUMENTATION.md history
  ranges): generate the dense hour grid per key, left-join the sparse
  hourly aggregate, carry the last observation forward. The grid is
  |keys| x |hours| — the same magnitude as the aggregate it fills, so
  materializing it is free relative to the data; LOCF is one
  last(ignorenulls) window per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (SELECT user_id, min(ts) AS t_view
               FROM events WHERE event_type = 'view' GROUP BY 1),
    c AS (SELECT e.user_id, min(e.ts) AS t_click
          FROM events e JOIN v ON v.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > v.t_view
            AND e.ts <= v.t_view + INTERVAL 1 DAY GROUP BY 1),
    p AS (SELECT e.user_id, min(e.ts) AS t_purchase
          FROM events e JOIN c ON c.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            AND e.ts <= c.t_click + INTERVAL 1 DAY GROUP BY 1),
    staged AS (
      SELECT u.user_id,
             CASE WHEN p.user_id IS NOT NULL THEN 'purchase'
                  WHEN c.user_id IS NOT NULL THEN 'click'
                  WHEN v.user_id IS NOT NULL THEN 'view'
                  ELSE 'none' END AS funnel_stage
      FROM (SELECT DISTINCT user_id FROM events) u
      LEFT JOIN v ON v.user_id = u.user_id
      LEFT JOIN c ON c.user_id = u.user_id
      LEFT JOIN p ON p.user_id = u.user_id
    )
    SELECT funnel_stage, count(*) AS n_users
    FROM staged GROUP BY funnel_stage
    """,
    doc=(
        "Ordered conversion funnel view -> click -> purchase with a "
        "1-day conversion window per step: a stage counts only if its "
        "earliest qualifying event lands strictly after the previous "
        "stage's anchor and within the window. Spark computes the stage "
        "chain as three chained min-windows over ONE user_id exchange; "
        "the oracle decomposes it into correlated min-joins."
    ),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    staged = ev.withColumn("t_view", t_view)
    day = F.expr("INTERVAL 1 DAY")
    t_click = F.min(
        F.when(
            (F.col("event_type") == "click")
            & (F.col("ts") > F.col("t_view"))
            & (F.col("ts") <= F.col("t_view") + day),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_click", t_click)
    t_purchase = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ts") > F.col("t_click"))
            & (F.col("ts") <= F.col("t_click") + day),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("t_purchase", t_purchase)
    stage = (
        F.when(F.col("t_purchase").isNotNull(), "purchase")
        .when(F.col("t_click").isNotNull(), "click")
        .when(F.col("t_view").isNotNull(), "view")
        .otherwise("none")
    )
    per_user = staged.groupBy("user_id").agg(F.first(stage).alias("funnel_stage"))
    return per_user.groupBy("funnel_stage").agg(
        F.count(F.lit(1)).alias("n_users")
    )


@register(
    "gapfill_hourly_locf",
    oracle="""
    WITH bounds AS (
      SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
      FROM events
    ),
    grid AS (
      SELECT k.event_type, g.hour
      FROM (SELECT DISTINCT event_type FROM events) k
      CROSS JOIN (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
                  FROM bounds) g
    ),
    hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             round(avg(value), 6) AS avg_value
      FROM events GROUP BY 1, 2
    )
    SELECT g.event_type, g.hour,
           last_value(h.avg_value IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.hour
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf,
           h.avg_value IS NULL AS was_gap
    FROM grid g
    LEFT JOIN hourly h ON h.event_type = g.event_type AND h.hour = g.hour
    """,
    doc=(
        "TimescaleDB time_bucket_gapfill + locf analog: dense hourly "
        "grid per event_type (generated from the data's own bounds — "
        "no driver collect), left-joined with the sparse hourly "
        "average, last observation carried forward per key. was_gap "
        "marks synthesized rows."
    ),
)
def gapfill_hourly_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    keys = ev.select("event_type").distinct()
    grid = (
        keys.join(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("lo"), F.col("hi"), F.expr("INTERVAL 1 HOUR"))
            ).alias("hour"),
        )
    )
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.round(F.avg("value"), 6).alias("avg_value"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
            F.col("avg_value").isNull().alias("was_gap"),
        )
    )


@register(
    "mad_outliers_per_stream",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY 1
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY 1
    )
    SELECT d.event_type,
           round(any_value(d.med), 6) AS med,
           round(any_value(m.mad), 6) AS mad,
           CAST(sum(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers,
           round(avg(CASE WHEN d.adev > 3 * 1.4826 * m.mad THEN 1.0 ELSE 0.0 END),
                 6) AS outlier_frac
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type
    """,
    doc=(
        "Robust outlier detection per stream: median absolute deviation "
        "with the 1.4826 normal-consistency constant, counting values "
        "beyond 3 normalized MADs. Exact interpolated medians (Spark "
        "percentile == DuckDB quantile_cont); the per-key medians are "
        "5-row broadcast joins, so the fact table streams through "
        "map-side twice with one final rollup."
    ),
)
def mad_outliers_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type").withColumn(
        "is_out",
        (F.col("adev") > 3 * 1.4826 * F.col("mad")).cast("double"),
    )
    return flagged.groupBy("event_type").agg(
        F.round(F.first("med"), 6).alias("med"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(F.col("is_out").cast("long")).alias("n_outliers"),
        F.round(F.avg("is_out"), 6).alias("outlier_frac"),
    )


@register(
    "stream_corr_matrix",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour, avg(value) AS av
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           round(corr(a.av, b.av), 6) AS hourly_corr,
           count(*) AS n_hours
    FROM hourly a
    JOIN hourly b ON a.hour = b.hour AND a.event_type < b.event_type
    GROUP BY 1, 2
    """,
    doc=(
        "Pairwise correlation matrix of the streams' hourly averages "
        "(upper triangle): hourly rollup once, self-join on the hour "
        "bucket, sample correlation per type pair. The rollup bounds "
        "the join input at |keys| x |hours| regardless of event volume."
    ),
)
def stream_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.avg("value").alias("av"))
    a = hourly.select(
        F.col("event_type").alias("type_a"), "hour", F.col("av").alias("av_a")
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), "hour", F.col("av").alias("av_b")
    )
    return (
        a.join(b, "hour")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.round(F.corr("av_a", "av_b"), 6).alias("hourly_corr"),
            F.count(F.lit(1)).alias("n_hours"),
        )
    )


@register(
    "incremental_daily_rollup",
    oracle="""
    SELECT date_trunc('day', ts) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS BIGINT)
             AS sum_micro,
           round(CAST(sum(CAST(round(value * 1000000.0, 0) AS BIGINT)) AS DOUBLE)
                 / (count(*) * 1000000.0), 6) AS avg_value
    FROM events
    GROUP BY date_trunc('day', ts)
    """,
    doc=(
        "Incremental materialized-view maintenance for the daily rollup: "
        "the Spark side aggregates the pre-cutoff history and the post-"
        "cutoff delta as SEPARATE partial states and merges them "
        "(union + re-aggregate), proving partial-merge == one-shot "
        "recompute. Partials carry counts and BIGINT micro-unit sums — "
        "exact integers, so the merge is truly associative (float sums "
        "would drift with summation order and break both the oracle "
        "hash and, at scale, cross-batch reproducibility); avg derives "
        "from the exact state. Cutoff = data-derived max(ts) - 7 days, "
        "broadcast. This is the A7/HWM ingest pattern applied to "
        "aggregates: at 100 TB you re-aggregate only the delta and "
        "merge into the stored state instead of rescanning history."
    ),
)
def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    now = events.agg(F.max("ts").alias("now_ts"))
    e = events.crossJoin(F.broadcast(now)).withColumn(
        "v_micro", F.round(F.col("value") * 1000000.0, 0).cast("long")
    )
    cutoff = F.col("now_ts") - F.expr("INTERVAL 7 DAYS")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("v_micro").cast("long").alias("sum_micro"),
        )

    state = partial(e.filter(F.col("ts") < cutoff))  # stored history
    delta = partial(e.filter(F.col("ts") >= cutoff))  # new batch
    merged = (
        state.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_micro").cast("long").alias("sum_micro"),
        )
    )
    return merged.select(
        "day",
        "n",
        "sum_micro",
        F.round(
            F.col("sum_micro").cast("double") / (F.col("n") * F.lit(1000000.0)), 6
        ).alias("avg_value"),
    )


@register(
    "winsorize_stream_values",
    oracle="""
    WITH q AS (
      SELECT event_type AS stream,
             quantile_cont(value, 0.05) AS p05,
             quantile_cont(value, 0.95) AS p95
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type AS stream,
           round(e.value, 6) AS value,
           round(q.p05, 6) AS p05, round(q.p95, 6) AS p95,
           round(CASE WHEN e.value < q.p05 THEN q.p05
                      WHEN e.value > q.p95 THEN q.p95
                      ELSE e.value END, 6) AS clamped,
           (e.value < q.p05 OR e.value > q.p95) AS was_clamped
    FROM events e JOIN q ON q.stream = e.event_type
    """,
    doc=(
        "Per-stream winsorization — the robust-scaling feature "
        "preprocessing step (clamp to [p05, p95] before normalization "
        "so tail outliers cannot dominate a scaler): exact linear-"
        "interpolated percentiles per stream (one agg over ~streams "
        "rows, broadcast back), then a scan-stage clamp. Both engines "
        "compute the same (n-1)*p interpolation on the same sorted "
        "doubles, so the bounds and clamped values hash-match; the "
        "approximate tier at corpus scale is approx_percentile (see "
        "queries/sketches.py), same plan shape."
    ),
)
def winsorize_stream_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    q = events.groupBy(F.col("event_type").alias("stream")).agg(
        F.expr("percentile(value, 0.05)").alias("p05"),
        F.expr("percentile(value, 0.95)").alias("p95"),
    )
    clamped = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return (
        events.join(
            F.broadcast(q), events["event_type"] == q["stream"]
        )
        .select(
            "event_id",
            "stream",
            F.round("value", 6).alias("value"),
            F.round("p05", 6).alias("p05"),
            F.round("p95", 6).alias("p95"),
            F.round(clamped, 6).alias("clamped"),
            ((F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))).alias(
                "was_clamped"
            ),
        )
    )
