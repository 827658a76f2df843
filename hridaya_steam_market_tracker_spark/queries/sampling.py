"""Heavy hitters + stratified sampling — training-data curation ops.

A 100 TB corpus pipeline needs (a) skew diagnosis — which keys dominate
the distribution (heavy hitters are exactly the keys that break shuffle
partitioning; cf. operators/skew.py), and (b) class-balanced
downsampling — take an exact per-stratum fraction of rows without
collecting anything.

Exact heavy hitters are a two-pass aggregate (count per key, filter by
share of total) and oracle-checkable. The one-pass approximate path is
`DataFrame.stat.freqItems` (Karp-Papadimitriou-Shenker): it guarantees a
SUPERSET of all items with frequency >= support — pytest asserts that
containment against the exact answer. Stratified sampling is
`sampleBy` — per-row Bernoulli with a per-stratum fraction: embarrassingly
parallel, no shuffle at all; the engine-specific RNG means rows-only
driver checks, with proportions and seed-determinism pytest-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

HH_SHARE = 0.008  # heavy-hitter threshold: >= 0.8% of all events
SAMPLE_FRACTIONS = {"click": 0.1, "view": 0.05, "purchase": 1.0}
SAMPLE_SEED = 42


@register(
    "heavy_hitter_users",
    oracle=f"""
    WITH totals AS (SELECT CAST(count(*) AS BIGINT) AS total FROM events),
    per_user AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           round(n_events / CAST(total AS DOUBLE), 6) AS share
    FROM per_user, totals
    WHERE n_events >= {HH_SHARE} * total
    """,
    doc=(
        "Exact heavy-hitter users (>= 0.8% of all events): per-key count vs a "
        "broadcast one-row total (C3 scalar-subquery shape). These keys are the "
        "shuffle-skew risks that operators/skew.py salts."
    ),
)
def heavy_hitter_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    total = events.agg(F.count(F.lit(1)).alias("total"))
    per_user = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        per_user.crossJoin(F.broadcast(total))
        .filter(F.col("n_events") >= HH_SHARE * F.col("total"))
        .select(
            "user_id",
            "n_events",
            F.round(F.col("n_events") / F.col("total").cast("double"), 6).alias(
                "share"
            ),
        )
    )


@register(
    "freq_items_users",
    oracle=None,  # KPS sketch output is engine-specific; superset guarantee pytest-checked
    doc=(
        "One-pass approximate heavy hitters (freqItems / Karp-Papadimitriou-"
        "Shenker, support=0.8%): guaranteed superset of every key with "
        "frequency >= support, constant memory per partition. The scale path "
        "when a second exact pass over 100 TB is too expensive; exploded to "
        "one row per candidate for a stable driver schema."
    ),
)
def freq_items_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    freq = events.stat.freqItems(["user_id"], support=HH_SHARE)
    return freq.select(
        F.explode("user_id_freqItems").alias("user_id")
    ).orderBy("user_id")


@register(
    "stratified_sample_events",
    oracle=None,  # Bernoulli RNG is engine-specific; proportions + determinism pytest-checked
    doc=(
        "Class-balanced downsampling: sampleBy(event_type, {click:0.1, view:0.05, "
        "purchase:1.0}, seed=42). Per-row Bernoulli draw keyed by stratum — no "
        "shuffle, no collect; the canonical rebalance step before training-data "
        "export. Unlisted strata default to fraction 0."
    ),
)
def stratified_sample_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return events.sampleBy("event_type", SAMPLE_FRACTIONS, seed=SAMPLE_SEED).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "stratified_sample_hash",
    oracle=f"""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE ('0x' || substr(md5('strat:' || CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
          / 1152921504606846976.0
          < CASE event_type
              WHEN 'click' THEN {SAMPLE_FRACTIONS['click']}
              WHEN 'view' THEN {SAMPLE_FRACTIONS['view']}
              WHEN 'purchase' THEN {SAMPLE_FRACTIONS['purchase']}
              ELSE 0.0 END
    """,
    doc=(
        "DETERMINISTIC stratified sampling: keep a row iff the md5 of its id, "
        "read as a 60-bit uniform in [0,1), falls under its stratum's fraction "
        "— same fractions as stratified_sample_events but reproducible across "
        "engines, reruns, and retries (the property a training-data export "
        "actually needs: a re-executed task must emit the same sample). Scan-"
        "stage predicate, no shuffle, no RNG state; value-checked by the "
        "oracle. The 60-bit md5 slice is the same portable-uniform trick as "
        "hash_split_assignment."
    ),
)
def stratified_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("strat:"), F.col("event_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long") / F.lit(float(1 << 60))
    frac = (
        F.when(F.col("event_type") == "click", SAMPLE_FRACTIONS["click"])
        .when(F.col("event_type") == "view", SAMPLE_FRACTIONS["view"])
        .when(F.col("event_type") == "purchase", SAMPLE_FRACTIONS["purchase"])
        .otherwise(0.0)
    )
    return events.filter(u < frac).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "reservoir_sample_per_stream",
    oracle="""
    SELECT stream, event_id, CAST(rk AS INTEGER) AS rank
    FROM (
      SELECT event_type AS stream, event_id,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY md5('rsv:' || CAST(event_id AS VARCHAR)), event_id
             ) AS rk
      FROM events
    ) WHERE rk <= 50
    """,
    doc=(
        "Deterministic fixed-k uniform sample per stream (k=50): rank rows by "
        "the md5 of their id and keep the k smallest — equivalent in "
        "distribution to reservoir sampling (each subset equally likely under "
        "the random-oracle hash) but a pure function of the data: retries, "
        "reruns, and engines agree row-for-row, and the driver value-checks "
        "it. Distributed as a bounded per-key top-k (TakeOrdered shape), "
        "never a global sort."
    ),
)
def reservoir_sample_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.concat(F.lit("rsv:"), F.col("event_id").cast("string"))), "event_id"
    )
    return (
        events.select(
            F.col("event_type").alias("stream"),
            "event_id",
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= 50)
    )
