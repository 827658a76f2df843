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


# Deterministic HLL: both engines build the SAME sketch from the same
# md5-derived 60-bit hashes, so unlike approx_count_distinct (whose
# xxhash64-based HLL++ registers are engine-internal) the estimate is a
# pure function of the data and value-checkable. Register sums are
# integerized (term = 2^(51-rho), a BIGINT) so the harmonic mean is an
# exact integer before the single final float division — no summation-
# order sensitivity. alpha_1024 = 0.7213/(1+1.079/1024) (Flajolet 2007).
_HLL_ALPHA = "0.7205407583220416"
_HLL_W_MASK = (1 << 50) - 1  # low 50 bits after the 10-bit bucket
_HLL_EMPTY_TERM = 1 << 51  # rho = 0 convention for untouched registers


@register(
    "hll_deterministic_distinct",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type AS stream,
             ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events
    ),
    regs AS (
      SELECT stream, hv >> 50 AS bucket,
             max(CASE WHEN (hv & {_HLL_W_MASK}) = 0 THEN 51
                      ELSE 51 - length(format('{{:b}}', hv & {_HLL_W_MASK})) END) AS rho
      FROM hashed GROUP BY stream, bucket
    ),
    sums AS (
      SELECT stream,
             CAST(sum(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS s_obs,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM regs GROUP BY stream
    ),
    est AS (
      SELECT stream,
             CAST(s_obs + (1024 - n_obs) * {_HLL_EMPTY_TERM} AS DOUBLE)
               / {_HLL_EMPTY_TERM}.0 AS harm,
             1024 - n_obs AS v
      FROM sums
    ),
    raw AS (
      SELECT stream, v,
             CAST({_HLL_ALPHA} AS DOUBLE) * 1048576.0 / harm AS e_raw
      FROM est
    )
    SELECT stream,
           round(CASE WHEN e_raw <= 2560.0 AND v > 0
                      THEN 1024.0 * ln(1024.0 / v)
                      ELSE e_raw END, 4) AS est_users
    FROM raw
    """,
    doc=(
        "DETERMINISTIC HyperLogLog distinct users per stream (m=1024 "
        "registers, 60-bit md5 hashes, Flajolet 2007 with linear-counting "
        "small-range correction): the registers are a pure function of the "
        "data, integerized so the harmonic sum is an exact BIGINT — the "
        "estimate is value-checked by the oracle, not just error-bounded. "
        "Mergeable exactly like any HLL (register-wise max); the engine-"
        "native approx_count_distinct stays as the HLL++ production path."
    ),
)
def hll_deterministic_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    return deterministic_hll(
        events.select(F.col("event_type").alias("stream"), "user_id"),
        group_col="stream",
        key_col="user_id",
    ).select("stream", F.col("estimate").alias("est_users"))


def hll_registers(df: DataFrame, group_cols: list[str], key_col: str) -> DataFrame:
    """(group_cols..., bucket, rho) — the deterministic HLL register
    table. Partials at any grouping granularity merge to coarser groups
    by register-wise MAX (the HLL union), losslessly."""
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = hv.bitwiseAND(F.lit(_HLL_W_MASK))
    rho = F.when(w == 0, F.lit(51)).otherwise(
        F.lit(51) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        df.select(
            *group_cols, F.shiftright(hv, 50).alias("bucket"), rho.alias("rho")
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(regs: DataFrame, group_cols: list[str]) -> DataFrame:
    """(group_cols..., estimate) from a register table — integerized
    harmonic sum + linear-counting correction (see
    hll_deterministic_distinct's docstring)."""
    sums = regs.withColumn(
        "term", F.expr("shiftleft(CAST(1 AS BIGINT), CAST(51 - rho AS INT))")
    ).groupBy(*group_cols).agg(
        F.sum("term").alias("s_obs"), F.count(F.lit(1)).alias("n_obs")
    )
    v = F.lit(1024) - F.col("n_obs")
    harm = (
        F.col("s_obs") + v * F.lit(_HLL_EMPTY_TERM)
    ).cast("double") / F.lit(float(_HLL_EMPTY_TERM))
    e_raw = F.lit(float(_HLL_ALPHA)) * F.lit(1048576.0) / harm
    est = F.when(
        (e_raw <= F.lit(2560.0)) & (v > 0),
        F.lit(1024.0) * F.log(F.lit(1024.0) / v.cast("double")),
    ).otherwise(e_raw)
    return sums.select(*group_cols, F.round(est, 4).alias("estimate"))


def deterministic_hll(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, estimate) — the deterministic m=1024 HLL described in
    hll_deterministic_distinct's docstring; shared by the registered
    queries and the error-bound tests."""
    return hll_estimate(hll_registers(df, [group_col], key_col), [group_col])


@register(
    "hll_deterministic_merge_rollup",
    oracle=f"""
    WITH hashed AS (
      SELECT event_type AS stream, CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day_idx,
             ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS hv
      FROM events
    ),
    daily_regs AS (
      SELECT stream, day_idx, hv >> 50 AS bucket,
             max(CASE WHEN (hv & {_HLL_W_MASK}) = 0 THEN 51
                      ELSE 51 - length(format('{{:b}}', hv & {_HLL_W_MASK})) END) AS rho
      FROM hashed GROUP BY stream, day_idx, bucket
    ),
    merged AS (
      SELECT stream, bucket, max(rho) AS rho FROM daily_regs GROUP BY stream, bucket
    ),
    sums AS (
      SELECT stream,
             CAST(sum(CAST(1 AS BIGINT) << (51 - rho)) AS BIGINT) AS s_obs,
             CAST(count(*) AS BIGINT) AS n_obs
      FROM merged GROUP BY stream
    ),
    est AS (
      SELECT stream,
             CAST(s_obs + (1024 - n_obs) * {_HLL_EMPTY_TERM} AS DOUBLE)
               / {_HLL_EMPTY_TERM}.0 AS harm,
             1024 - n_obs AS v
      FROM sums
    ),
    raw AS (
      SELECT stream, v,
             CAST({_HLL_ALPHA} AS DOUBLE) * 1048576.0 / harm AS e_raw
      FROM est
    )
    SELECT stream,
           round(CASE WHEN e_raw <= 2560.0 AND v > 0
                      THEN 1024.0 * ln(1024.0 / v)
                      ELSE e_raw END, 4) AS est_users
    FROM raw
    """,
    doc=(
        "HLL MERGEABILITY, value-checked: build per-(stream, day) register "
        "partials, union them by register-wise max, estimate per stream — the "
        "incremental two-level shape a 1000-executor cluster uses (daily "
        "partials persist; any rollup is a cheap register merge, never a "
        "rescan). Because the HLL union is lossless, this equals "
        "hll_deterministic_distinct EXACTLY — asserted in tests, and the "
        "oracle recomputes the same two-level pipeline."
    ),
)
def hll_deterministic_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    base = events.select(
        F.col("event_type").alias("stream"),
        F.expr("unix_micros(ts) div 86400000000").alias("day_idx"),
        "user_id",
    )
    daily = hll_registers(base, ["stream", "day_idx"], "user_id")
    merged = daily.groupBy("stream", "bucket").agg(F.max("rho").alias("rho"))
    return hll_estimate(merged, ["stream"]).select(
        "stream", F.col("estimate").alias("est_users")
    )


# Count-min sketch (Cormode & Muthukrishnan 2005): d=4 rows x w=1024
# counters, positions from the same md5 hash family as the HLL above —
# deterministic, so the frequency estimates themselves value-check.
_CMS_D, _CMS_W = 4, 1024


def count_min_estimates(df: DataFrame, key_col: str, keys: DataFrame) -> DataFrame:
    """Count-min frequency estimates for ``keys`` over ``df[key_col]``:
    build the d x w counter table (one explode + one (row, pos) shuffle
    into d*w groups — constant-size, mergeable by addition), then each
    probe key takes the MIN over its d counters. Always an over-
    estimate; error <= e*N/w with prob 1-e^-d (public bound).

    The counter table is sparse (only nonzero cells exist), so probe
    positions landing on empty counters are left-joined and coalesced
    to 0 before the min — a key absent from ``df`` correctly estimates
    0 instead of inheriting the min of its nonzero collisions (or
    vanishing when all d cells are empty)."""
    pos = lambda r, col: F.conv(
        F.substring(F.md5(F.concat(F.lit(f"cms{r}:"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("long") % _CMS_W
    rows_arr = F.array(
        *[
            F.struct(F.lit(r).alias("r"), pos(r, F.col(key_col)).alias("p"))
            for r in range(_CMS_D)
        ]
    )
    counters = (
        df.select(F.explode(rows_arr).alias("rp"))
        .groupBy("rp.r", "rp.p")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = keys.select(
        F.col(key_col), F.explode(rows_arr).alias("rp")
    ).select(key_col, "rp.r", "rp.p")
    return (
        probes.join(F.broadcast(counters), ["r", "p"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )


@register(
    "cms_heavy_hitter_freq",
    oracle=f"""
    WITH positions AS (
      SELECT user_id, r,
             ('0x' || substr(md5('cms' || CAST(r AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % {_CMS_W} AS p
      FROM events, generate_series(0, {_CMS_D - 1}) AS g(r)
    ),
    counters AS (
      SELECT r, p, CAST(count(*) AS BIGINT) AS c FROM positions GROUP BY r, p
    ),
    hh AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
      HAVING count(*) >= 0.008 * (SELECT count(*) FROM events)
    ),
    probe AS (
      SELECT h.user_id, h.n_events, g.r,
             ('0x' || substr(md5('cms' || CAST(g.r AS VARCHAR) || ':' || CAST(h.user_id AS VARCHAR)), 1, 15))::BIGINT % {_CMS_W} AS p
      FROM hh h, generate_series(0, {_CMS_D - 1}) AS g(r)
    )
    SELECT pr.user_id, any_value(pr.n_events) AS n_events,
           CAST(min(c.c) AS BIGINT) AS est_count
    FROM probe pr JOIN counters c ON c.r = pr.r AND c.p = pr.p
    GROUP BY pr.user_id
    """,
    doc=(
        "Count-min sketch frequency estimates for the exact heavy-hitter "
        "set (d=4 x w=1024 md5 counters, Cormode 2005): the one-pass "
        "constant-memory path for per-key counts at 100 TB — counters "
        "merge by addition across partitions/days. Deterministic hashing "
        "makes the estimates value-checkable (alongside the always-true "
        "over-estimate guarantee, pinned in tests with the exact counts)."
    ),
)
def cms_heavy_hitter_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = table(spark, sf_dir, "events")
    total = events.agg(F.count(F.lit(1)).alias("t"))
    hh = (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_events") >= 0.008 * F.col("t"))
        .select("user_id", "n_events")
    )
    est = count_min_estimates(events.select("user_id"), "user_id", hh)
    return hh.join(est, "user_id").select("user_id", "n_events", "est_count")


@register(
    "hist_quantiles_per_stream",
    oracle="""
    WITH bounds AS (
      SELECT event_type AS stream, min(value) AS lo, max(value) AS hi,
             CAST(count(*) AS BIGINT) AS t
      FROM events GROUP BY event_type
    ),
    binned AS (
      SELECT b.stream, b.lo, b.hi, b.t,
             CASE WHEN b.hi = b.lo THEN 0
                  ELSE least(255, CAST(floor((e.value - b.lo) / (b.hi - b.lo) * 256.0) AS INTEGER))
             END AS bin
      FROM events e JOIN bounds b ON e.event_type = b.stream
    ),
    counts AS (
      SELECT stream, lo, hi, t, bin, CAST(count(*) AS BIGINT) AS c
      FROM binned GROUP BY stream, lo, hi, t, bin
    ),
    cum AS (
      SELECT stream, lo, hi, t, bin,
             sum(c) OVER (PARTITION BY stream ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
      FROM counts
    )
    SELECT stream,
           round(any_value(lo) + (min(CASE WHEN cc >= 0.5 * t THEN bin END) + 0.5) / 256.0 * (any_value(hi) - any_value(lo)), 6) AS p50_est,
           round(any_value(lo) + (min(CASE WHEN cc >= 0.9 * t THEN bin END) + 0.5) / 256.0 * (any_value(hi) - any_value(lo)), 6) AS p90_est,
           round(any_value(lo) + (min(CASE WHEN cc >= 0.99 * t THEN bin END) + 0.5) / 256.0 * (any_value(hi) - any_value(lo)), 6) AS p99_est
    FROM cum GROUP BY stream
    """,
    doc=(
        "DETERMINISTIC approximate quantiles: fixed 256-bin equi-width "
        "histogram between each stream's own min/max, estimate = bin "
        "midpoint at the target cumulative rank. One groupBy + a 256-row "
        "window per stream — mergeable (histograms add), reproducible, and "
        "value-checked by the oracle, complementing the engine-native "
        "approx_percentile (Greenwald-Khanna, rows-only). The crossing bin "
        "contains the nearest-rank percentile, so the estimate is within "
        "half a bin width (range/512) of it — pinned in tests."
    ),
)
def hist_quantiles_per_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = table(spark, sf_dir, "events")
    bounds = events.groupBy(F.col("event_type").alias("stream")).agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.count(F.lit(1)).alias("t"),
    )
    binned = events.join(
        F.broadcast(bounds), events["event_type"] == bounds["stream"]
    ).select(
        "stream",
        "lo",
        "hi",
        "t",
        F.when(F.col("hi") == F.col("lo"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(255),
                F.floor(
                    (F.col("value") - F.col("lo"))
                    / (F.col("hi") - F.col("lo"))
                    * F.lit(256.0)
                ).cast("int"),
            )
        )
        .alias("bin"),
    )
    counts = binned.groupBy("stream", "lo", "hi", "t", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    wc = (
        Window.partitionBy("stream")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = counts.withColumn("cc", F.sum("c").over(wc))

    def q_est(q: float):
        b = F.min(F.when(F.col("cc") >= F.lit(q) * F.col("t"), F.col("bin")))
        return F.round(
            F.any_value("lo")
            + (b + F.lit(0.5)) / F.lit(256.0) * (F.any_value("hi") - F.any_value("lo")),
            6,
        )

    return cum.groupBy("stream").agg(
        q_est(0.5).alias("p50_est"),
        q_est(0.9).alias("p90_est"),
        q_est(0.99).alias("p99_est"),
    )


_BLOOM_M, _BLOOM_K = 16384, 3
_BLOOM_PROBES = 3000  # keys 1..3000; customers occupy a subset


@register(
    "bloom_filter_probe",
    oracle=f"""
    WITH pos AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5('bloom' || i.i || ':' ||
                                      CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT
                  % {_BLOOM_M} AS BIGINT) AS p
      FROM customer, (SELECT unnest(range(0, {_BLOOM_K})) AS i) i
    ),
    probes AS (SELECT unnest(range(1, {_BLOOM_PROBES} + 1)) AS key),
    ppos AS (
      SELECT key,
             CAST(('0x' || substr(md5('bloom' || i.i || ':' ||
                                      CAST(key AS VARCHAR)), 1, 15))::BIGINT
                  % {_BLOOM_M} AS BIGINT) AS p
      FROM probes, (SELECT unnest(range(0, {_BLOOM_K})) AS i) i
    ),
    verdict AS (
      SELECT key,
             count(DISTINCT p) = count(DISTINCT CASE WHEN p IN (SELECT p FROM pos)
                                                     THEN p END) AS bloom_positive
      FROM ppos GROUP BY key
    )
    SELECT v.key, v.bloom_positive,
           c.c_custkey IS NOT NULL AS present,
           v.bloom_positive AND c.c_custkey IS NULL AS false_positive
    FROM verdict v LEFT JOIN customer c ON c.c_custkey = v.key
    """,
    doc=(
        "Bloom-filter membership — the semi-join pushdown primitive: "
        "build a 2048-bit, 3-hash filter over customer keys as ONE "
        "broadcast row (sorted distinct bit positions), then verify "
        "probe keys map-side with zero shuffle on the probe stream. "
        "Portable 60-bit md5 position hashes make the filter bit-exact "
        "cross-engine, so both the positives AND the false-positive set "
        "are value-checked (no soundness slack: a Bloom filter never "
        "false-negatives, and the oracle proves this build doesn't). At "
        "100 TB this is the runtime-filter shape: ship the small side's "
        "filter to the fact scan and drop rows before the join shuffle."
    ),
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = table(spark, sf_dir, "customer")

    def positions(key_str):
        return F.array_distinct(
            F.array(
                *[
                    F.conv(
                        F.substring(
                            F.md5(F.concat(F.lit(f"bloom{i}:"), key_str)), 1, 15
                        ),
                        16,
                        10,
                    ).cast("long")
                    % _BLOOM_M
                    for i in range(_BLOOM_K)
                ]
            )
        )

    filt = (
        customer.select(
            F.explode(positions(F.col("c_custkey").cast("string"))).alias("p")
        )
        .distinct()
        .agg(F.sort_array(F.collect_set("p")).alias("bits"))
    )
    probes = spark.range(1, _BLOOM_PROBES + 1).select(F.col("id").alias("key"))
    verdict = probes.crossJoin(F.broadcast(filt)).select(
        "key",
        (
            F.size(
                F.array_except(positions(F.col("key").cast("string")), F.col("bits"))
            )
            == 0
        ).alias("bloom_positive"),
    )
    keys = customer.select(F.col("c_custkey").cast("long").alias("key")).distinct()
    return (
        verdict.join(keys.withColumn("__hit", F.lit(1)), "key", "left")
        .select(
            "key",
            "bloom_positive",
            F.col("__hit").isNotNull().alias("present"),
            (F.col("bloom_positive") & F.col("__hit").isNull()).alias("false_positive"),
        )
    )
