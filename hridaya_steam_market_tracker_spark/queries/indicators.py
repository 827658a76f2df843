"""Price-chart indicators over the per-key market series.

The reference serves raw per-item price history and leaves charting to
the frontend (DOCUMENTATION.md:182-310 history endpoints; static/js
chart rendering). At warehouse scale the indicator math belongs in the
engine — these queries compute the standard chart overlays the tracker's
UI draws, as catalog queries over ``events`` (fixture mapping: user_id →
market_hash_name, value → price, FIXTURES.md §B).

Scale posture: every indicator is window algebra partitioned by the
series key — ONE hash exchange on user_id per query, all frames computed
within the partition, no driver loops, no UDFs. The EWMA is a sequential
fold over each key's ordered series (collect_list + aggregate), which is
the correct distribution shape for a recursive indicator: series fit in
a task (a price series is bounded per item), keys scale out.

* ``bollinger_bands_20`` — 20-row trailing SMA ± 2σ with breakout flag.
* ``rsi_14`` — relative-strength index over the trailing 14 deltas
  (simple-average variant, window-expressible; Wilder smoothing is the
  EWMA fold below with α=1/14 if needed).
* ``ewma_price_per_key`` — exponentially-weighted last price per key,
  α=0.2, exact sequential fold (not a truncated-weight approximation).
* ``max_drawdown_per_key`` — worst peak-to-trough decline per key off
  the running maximum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

# Deterministic series order: ts then event_id (ties exist in the data).
_ORDER = lambda: [F.col("ts").asc(), F.col("event_id").asc()]  # noqa: E731


@register(
    "bollinger_bands_20",
    oracle="""
    SELECT event_id, user_id, ts, round(value, 6) AS value,
           round(sma20, 6) AS sma20,
           round(sma20 + 2 * sd20, 6) AS band_upper,
           round(sma20 - 2 * sd20, 6) AS band_lower,
           CASE WHEN value > sma20 + 2 * sd20 THEN 'above'
                WHEN value < sma20 - 2 * sd20 THEN 'below'
                ELSE 'inside' END AS breakout
    FROM (
      SELECT event_id, user_id, ts, value,
             avg(value)         OVER w AS sma20,
             stddev_samp(value) OVER w AS sd20,
             count(*)           OVER w AS n20
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ) WHERE n20 = 20
    """,
    doc=(
        "Bollinger bands: 20-row trailing mean ± 2 sample-stddev per series "
        "key, emitted only where the window is full (partial-window bands "
        "are chart noise). One exchange on user_id; both frames share it."
    ),
)
def bollinger_bands_20(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(*_ORDER()).rowsBetween(-19, 0)
    sma, sd = F.avg("value").over(w), F.stddev_samp("value").over(w)
    upper, lower = sma + 2 * sd, sma - 2 * sd
    return (
        events.select(
            "event_id",
            "user_id",
            "ts",
            "value",
            sma.alias("__sma"),
            upper.alias("__up"),
            lower.alias("__lo"),
            F.count(F.lit(1)).over(w).alias("__n"),
        )
        .filter(F.col("__n") == 20)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 6).alias("value"),
            F.round("__sma", 6).alias("sma20"),
            F.round("__up", 6).alias("band_upper"),
            F.round("__lo", 6).alias("band_lower"),
            F.when(F.col("value") > F.col("__up"), "above")
            .when(F.col("value") < F.col("__lo"), "below")
            .otherwise("inside")
            .alias("breakout"),
        )
    )


@register(
    "rsi_14",
    oracle="""
    SELECT event_id, user_id, ts,
           round(CASE WHEN avg_loss = 0 THEN 100.0
                      ELSE 100.0 - 100.0 / (1.0 + avg_gain / avg_loss)
                 END, 6) AS rsi
    FROM (
      SELECT event_id, user_id, ts,
             avg(greatest(delta, 0))  OVER w AS avg_gain,
             avg(greatest(-delta, 0)) OVER w AS avg_loss,
             count(delta)             OVER w AS n_delta
      FROM (
        SELECT event_id, user_id, ts,
               value - lag(value) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS delta
        FROM events
      )
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ) WHERE n_delta = 14
    """,
    doc=(
        "RSI-14 (simple-average variant): per-row delta via lag, trailing "
        "14-delta gain/loss averages, RSI = 100 - 100/(1+RS) with the "
        "all-gain division guard. lag and the trailing frame share the one "
        "user_id exchange. Emitted only where 14 deltas exist."
    ),
)
def rsi_14(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w_ord = Window.partitionBy("user_id").orderBy(*_ORDER())
    w14 = w_ord.rowsBetween(-13, 0)
    delta = F.col("value") - F.lag("value").over(w_ord)
    with_delta = events.select(
        "event_id", "user_id", "ts", delta.alias("delta")
    )
    gain = F.avg(F.greatest(F.col("delta"), F.lit(0))).over(w14)
    loss = F.avg(F.greatest(-F.col("delta"), F.lit(0))).over(w14)
    rsi = F.when(F.col("__loss") == 0, F.lit(100.0)).otherwise(
        100.0 - 100.0 / (1.0 + F.col("__gain") / F.col("__loss"))
    )
    return (
        with_delta.select(
            "event_id",
            "user_id",
            "ts",
            gain.alias("__gain"),
            loss.alias("__loss"),
            F.count("delta").over(w14).alias("__n"),
        )
        .filter(F.col("__n") == 14)
        .select("event_id", "user_id", "ts", F.round(rsi, 6).alias("rsi"))
    )


@register(
    "ewma_price_per_key",
    oracle="""
    SELECT user_id,
           round(list_reduce(vals, (acc, x) -> 0.2 * x + 0.8 * acc), 6) AS ewma,
           n_points
    FROM (
      SELECT user_id,
             list(CAST(value AS DOUBLE) ORDER BY ts, event_id) AS vals,
             count(*) AS n_points
      FROM events GROUP BY user_id
    )
    """,
    doc=(
        "EWMA(α=0.2) of each key's full price series — the exact recursive "
        "fold, not a truncated-weight window approximation. Distribution "
        "shape: collect the ordered series per key (bounded: one item's "
        "price history fits a task even at 100 TB corpus scale — the big "
        "dimension is #keys, which scales out across the one hash "
        "exchange), then a JVM `aggregate` fold. Identical sequential "
        "order on both engines, so the float result matches bit-for-bit "
        "before the defensive round."
    ),
)
def ewma_price_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    # sort_array on struct(ts, event_id, value) orders lexicographically ==
    # the oracle's ORDER BY ts, event_id; then fold α·x + (1-α)·acc.
    series = events.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "event_id", F.col("value").cast("double").alias("v")))
        ).alias("__s"),
        F.count(F.lit(1)).alias("n_points"),
    )
    vals = F.transform(F.col("__s"), lambda s: s.getField("v"))
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: 0.2 * x + 0.8 * acc,
    )
    return series.select(
        "user_id", F.round(ewma, 6).alias("ewma"), "n_points"
    )


@register(
    "max_drawdown_per_key",
    oracle="""
    SELECT user_id,
           round(min(value / nullif(run_max, 0) - 1.0), 6) AS max_drawdown,
           round(min(value), 6) AS series_min,
           round(max(run_max), 6) AS series_max
    FROM (
      SELECT user_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS run_max
      FROM events
    ) GROUP BY user_id
    """,
    doc=(
        "Max drawdown: running peak per series, worst value/peak - 1. The "
        "running max and the final per-key rollup share one user_id "
        "exchange (window then groupBy on the same key — Catalyst reuses "
        "the partitioning). nullif guards the zero-peak division (ANSI)."
    ),
)
def max_drawdown_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(*_ORDER())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run_max = F.max("value").over(w)
    dd = F.col("value") / F.nullif(F.col("__peak"), F.lit(0)) - 1.0
    return (
        events.select("user_id", "value", run_max.alias("__peak"))
        .groupBy("user_id")
        .agg(
            F.round(F.min(dd), 6).alias("max_drawdown"),
            F.round(F.min("value"), 6).alias("series_min"),
            F.round(F.max("__peak"), 6).alias("series_max"),
        )
    )
