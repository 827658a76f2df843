"""Batch-shaped twins of the J-family streaming/control operators.

The J-family (rate limiting, per-key backoff, debounce) runs as
driver-side control loops or applyInPandasWithState — shapes a batch
oracle cannot replay. But each one's DECISION FUNCTION is a pure
function of an ordered event log, so the same semantics re-expressed
over the `events` fixture give the driver a value-checkable surface for
logic that was previously pytest-only:

  * J1 sliding-window limiter (streaming/ratelimiter.py:24, reference
    src/RateLimiter.py:24-49): admit when fewer than `budget` requests
    in the trailing window — a RANGE window count per stream.
  * J4 per-key backoff (streaming/stateful.py:31-71, reference
    cerebro.py backoff loop): consecutive-failure run length ->
    cooldown factor min(2^(n-1), MAX_BACKOFF_FACTOR) — the classic
    rn-minus-last-success window identity.
  * J7 debounce (streaming/reconcile.py:103, reference
    cerebro.py:315-332): a burst collapses into one reconcile after a
    quiet gap; fires = rows whose successor is > quiet_gap away, each
    reporting how many signals it coalesced.

All three are single-shuffle window plans (partition by the key, no
joins, no Python), so the twins double as the 100 TB statement of the
control semantics: the same decision applied to a day's event log is
one pass over a key-partitioned sort.

Partition-key cardinality note: the fixture keys j1/j7 by its 5 event
streams, which at real scale would put each stream's whole history in
one task. That is a fixture artifact, not the operator posture — the
reference's limiter/debouncer key by (endpoint, item) at production
granularity (millions of keys), and these window plans are generic
over the key expression: swap in the high-cardinality key and the same
single-shuffle plan balances. j4 already demonstrates the
high-cardinality shape (keys by user_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

# J1 twin parameters: trailing 6 h, budget 15 — scaled to the fixture's
# event density (~3/h per stream) so both outcomes occur.
_LIMIT_WINDOW_US = 6 * 3600 * 1_000_000
_LIMIT_BUDGET = 15

# J4: mirror streaming/stateful.py:31 (MAX_BACKOFF_FACTOR = 8).
_MAX_BACKOFF_FACTOR = 8

# J7: quiet gap 1 h.
_QUIET_GAP_US = 3600 * 1_000_000


@register(
    "j1_rate_limit_admission",
    oracle=f"""
    SELECT event_id, event_type AS stream,
           CAST(count(*) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN {_LIMIT_WINDOW_US} PRECEDING AND 1 PRECEDING
           ) AS BIGINT) AS recent_count,
           count(*) OVER (
             PARTITION BY event_type ORDER BY epoch_us(ts)
             RANGE BETWEEN {_LIMIT_WINDOW_US} PRECEDING AND 1 PRECEDING
           ) < {_LIMIT_BUDGET} AS admitted
    FROM events
    """,
    doc=(
        "J1 twin: sliding-window rate-limiter admission over the event log — "
        "each request is admitted iff fewer than budget=15 requests landed in "
        "the trailing 6 h of its stream (RANGE window, exclusive of the "
        "request's own instant). One key-partitioned sort, no joins."
    ),
)
def j1_rate_limit_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-_LIMIT_WINDOW_US, -1)
    )
    recent = F.count(F.lit(1)).over(w)
    return events.select(
        "event_id",
        F.col("event_type").alias("stream"),
        recent.alias("recent_count"),
        (recent < _LIMIT_BUDGET).alias("admitted"),
    )


@register(
    "j4_backoff_transition_table",
    oracle=f"""
    WITH ordered AS (
      SELECT event_id, user_id, event_type = 'error' AS is_fail,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY epoch_us(ts), event_id) AS rn
      FROM events
    ),
    runs AS (
      SELECT event_id, user_id, is_fail, rn,
             max(CASE WHEN NOT is_fail THEN rn END) OVER (
               PARTITION BY user_id ORDER BY rn
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_success_rn
      FROM ordered
    )
    SELECT event_id, user_id,
           CAST(CASE WHEN is_fail THEN rn - coalesce(last_success_rn, 0)
                     ELSE 0 END AS INTEGER) AS consecutive_backoffs,
           CAST(CASE
             WHEN NOT is_fail THEN 0
             WHEN rn - coalesce(last_success_rn, 0) >= 4 THEN {_MAX_BACKOFF_FACTOR}
             ELSE (CAST(1 AS BIGINT) << (rn - coalesce(last_success_rn, 0) - 1))
           END AS BIGINT) AS cooldown_factor,
           NOT is_fail AS healthy
    FROM runs
    """,
    doc=(
        "J4 twin: the per-key backoff state machine replayed over the event "
        "log — consecutive trailing 'error' events per user (rn minus last-"
        "success-rn window identity) drive cooldown_factor = min(2^(n-1), 8), "
        "exactly streaming/stateful.py's applyInPandasWithState transition. "
        "One key-partitioned sort, no joins, no Python."
    ),
)
def j4_backoff_transition_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    ordered = events.select(
        "event_id",
        "user_id",
        (F.col("event_type") == "error").alias("is_fail"),
        F.row_number().over(wo).alias("rn"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("rn")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = ordered.withColumn(
        "last_success_rn",
        F.max(F.when(~F.col("is_fail"), F.col("rn"))).over(wrun),
    )
    n = F.when(
        F.col("is_fail"), F.col("rn") - F.coalesce("last_success_rn", F.lit(0))
    ).otherwise(F.lit(0))
    # min(2^(n-1), 8) enumerated: n>=4 hits the cap, so only 1/2/4 remain.
    factor = (
        F.when(~F.col("is_fail"), F.lit(0))
        .when(n >= 4, F.lit(_MAX_BACKOFF_FACTOR))
        .when(n == 3, F.lit(4))
        .when(n == 2, F.lit(2))
        .otherwise(F.lit(1))
        .cast("long")
    )
    return runs.select(
        "event_id",
        "user_id",
        n.cast("int").alias("consecutive_backoffs"),
        factor.alias("cooldown_factor"),
        (~F.col("is_fail")).alias("healthy"),
    )


@register(
    "j7_debounce_coalesce",
    oracle=f"""
    WITH marked AS (
      SELECT event_type AS stream, epoch_us(ts) AS e, event_id,
             CASE WHEN lead(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id
                  ) IS NULL
                  OR lead(epoch_us(ts)) OVER (
                    PARTITION BY event_type ORDER BY epoch_us(ts), event_id
                  ) - epoch_us(ts) >= {_QUIET_GAP_US}
             THEN 1 ELSE 0 END AS fire
      FROM events
    ),
    grouped AS (
      SELECT stream, e, fire,
             coalesce(sum(fire) OVER (
               PARTITION BY stream ORDER BY e, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS grp
      FROM marked
    )
    SELECT stream, CAST(grp AS BIGINT) AS reconcile_seq,
           CAST(max(e) AS BIGINT) AS fire_at_us,
           CAST(count(*) AS BIGINT) AS coalesced
    FROM grouped GROUP BY stream, grp
    """,
    doc=(
        "J7 twin: debounce over the event log — a signal fires a reconcile "
        "when no successor arrives within the 1 h quiet gap on its stream; "
        "each fire reports how many burst signals it coalesced (the "
        "Debouncer.consume() contract, streaming/reconcile.py:103). Fire "
        "markers via lead(), burst groups via the running fire count."
    ),
)
def j7_debounce_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    e = F.unix_micros("ts")
    wl = Window.partitionBy("event_type").orderBy(e, "event_id")
    nxt = F.lead(e).over(wl)
    marked = events.select(
        F.col("event_type").alias("stream"),
        e.alias("e"),
        "event_id",
        F.when(nxt.isNull() | (nxt - e >= _QUIET_GAP_US), 1).otherwise(0).alias("fire"),
    )
    # Tie-break the running fire-count by event_id too (same discipline as
    # the fire-marker window above and j1/j4): two same-microsecond events
    # in one stream must land in the same burst group on both engines.
    wg = (
        Window.partitionBy("stream")
        .orderBy("e", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    grouped = marked.withColumn(
        "grp", F.coalesce(F.sum("fire").over(wg), F.lit(0))
    )
    return grouped.groupBy("stream", F.col("grp").cast("long").alias("reconcile_seq")).agg(
        F.max("e").cast("long").alias("fire_at_us"),
        F.count(F.lit(1)).alias("coalesced"),
    )
