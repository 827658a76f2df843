"""Error bounds for the sketch/approximate scale paths (queries/sketches.py).

The approximate operators carry no DuckDB oracle (estimator internals are
engine-specific); their contract is instead a bound against the exact
oracle-checked baselines on the same fixture data:

  * HLL distinct estimates within 5% relative error of exact distincts
    (rsd=2% configured; 5% leaves slack for small groups).
  * approx_percentile within the value span of a +-1% rank neighborhood
    of the exact percentile.
  * session_window_native produces exactly the sessions of the
    gap-and-islands decomposition (same split boundaries).
"""

from __future__ import annotations

import pytest

from hridaya_steam_market_tracker_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _by_key(rows, key="event_type"):
    return {r[key]: r for r in rows}


def test_hll_variants_within_5pct_of_exact(spark, registry):
    exact = _by_key(registry["distinct_users_per_stream"].fn(spark, SF_DIR).collect())
    approx = _by_key(
        registry["approx_distinct_users_per_stream"].fn(spark, SF_DIR).collect()
    )
    sketch = _by_key(registry["hll_sketch_rollup"].fn(spark, SF_DIR).collect())
    assert set(exact) == set(approx) == set(sketch)
    for k, row in exact.items():
        n = row["n_users"]
        assert abs(approx[k]["n_users_approx"] - n) / n <= 0.05
        assert abs(sketch[k]["n_users_est"] - n) / n <= 0.05


def test_approx_percentiles_within_rank_tolerance(spark, registry):
    from hridaya_steam_market_tracker_spark.tables import table

    approx = _by_key(
        registry["approx_percentiles_per_stream"].fn(spark, SF_DIR).collect()
    )
    values = {
        r["event_type"]: sorted(r["vals"])
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg({"value": "collect_list"})
        .withColumnRenamed("collect_list(value)", "vals")
        .collect()
    }
    for k, vals in values.items():
        n = len(vals)
        for q, col in [(0.5, "p50_approx"), (0.9, "p90_approx"), (0.99, "p99_approx")]:
            lo = vals[max(0, int((q - 0.01) * n) - 1)]
            hi = vals[min(n - 1, int((q + 0.01) * n) + 1)]
            assert lo <= approx[k][col] <= hi, (k, q, lo, approx[k][col], hi)


def test_session_window_native_matches_islands(spark, registry):
    native = registry["session_window_native"].fn(spark, SF_DIR)
    # Reuse the query's own oracle shape: recompute islands in Spark SQL with
    # the same >= boundary rule and compare session sets exactly.
    from hridaya_steam_market_tracker_spark.tables import table

    table(spark, SF_DIR, "events").createOrReplaceTempView("ev")
    islands = spark.sql(
        """
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS is_new
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        numbered AS (
          SELECT user_id, ts,
                 sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
          FROM flagged
        )
        SELECT user_id, min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               CAST(count(*) AS BIGINT) AS n_events
        FROM numbered GROUP BY user_id, grp
        """
    )
    assert native.exceptAll(islands).isEmpty()
    assert islands.exceptAll(native).isEmpty()


def test_deterministic_hll_error_bounds(spark):
    """The md5-register HLL must estimate within ~2sigma in BOTH of its
    regimes: linear counting (fixture cardinality << m) and the raw
    harmonic branch (50k distinct >> 2.5m). Deterministic hashing makes
    these fixed numbers, not flaky draws; exactness vs the SQL oracle is
    test_oracle_parity's job."""
    from pyspark.sql import functions as F

    from hridaya_steam_market_tracker_spark.queries.sketches import (
        deterministic_hll,
    )
    from hridaya_steam_market_tracker_spark.tables import table

    events = table(spark, "/root/testdata/sf0.001", "events")
    exact = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    est = {
        r["stream"]: r["estimate"]
        for r in deterministic_hll(
            events.select(F.col("event_type").alias("stream"), "user_id"),
            "stream",
            "user_id",
        ).collect()
    }
    for stream, n in exact.items():
        assert abs(est[stream] - n) / n <= 0.07, (stream, est[stream], n)

    big = spark.range(50000).select(
        F.lit("s").alias("g"), F.col("id").alias("user_id")
    )
    r = deterministic_hll(big, "g", "user_id").first()
    assert r["estimate"] > 2560.0  # raw-HLL branch, not linear counting
    assert abs(r["estimate"] - 50000) / 50000 <= 0.07, r["estimate"]


def test_count_min_overestimate_guarantee(spark):
    """CMS estimates are NEVER under the true count, and stay within the
    e*N/w public bound (deterministic hashing -> fixed numbers). Probed
    on every user, not just heavy hitters, to exercise collisions."""
    from pyspark.sql import functions as F

    from hridaya_steam_market_tracker_spark.queries.sketches import (
        count_min_estimates,
    )
    from hridaya_steam_market_tracker_spark.tables import table

    events = table(spark, "/root/testdata/sf0.001", "events")
    exact = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    est = count_min_estimates(events.select("user_id"), "user_id", exact)
    joined = exact.join(est, "user_id").collect()
    n_total = sum(r["n"] for r in joined)
    bound = 2.718281828 * n_total / 1024
    assert len(joined) > 0
    for r in joined:
        assert r["est_count"] >= r["n"], (r["user_id"], r["est_count"], r["n"])
        assert r["est_count"] - r["n"] <= bound, (r["user_id"], r["est_count"], r["n"])


def test_hll_merge_of_partials_equals_direct(spark, registry):
    """The register-wise-max union is lossless: merging per-(stream,
    day) partials must give EXACTLY the direct per-stream sketch."""
    sf = "/root/testdata/sf0.001"
    direct = {
        r["stream"]: r["est_users"]
        for r in registry["hll_deterministic_distinct"].fn(spark, sf).collect()
    }
    merged = {
        r["stream"]: r["est_users"]
        for r in registry["hll_deterministic_merge_rollup"].fn(spark, sf).collect()
    }
    assert merged == direct and len(direct) > 0


def test_hist_quantiles_within_half_bin_of_nearest_rank(spark, registry):
    """The crossing bin contains the nearest-rank percentile (the value
    at rank ceil(q*t)), so the midpoint estimate is within half a bin
    width of it. (The INTERPOLATED percentile carries no such bound —
    consecutive order statistics can straddle many empty bins in a
    sparse tail.) Deterministic fixed numbers."""
    import math

    from hridaya_steam_market_tracker_spark.tables import table

    sf = "/root/testdata/sf0.001"
    events = table(spark, sf, "events")
    by_stream: dict[str, list[float]] = {}
    for r in events.select("event_type", "value").collect():
        by_stream.setdefault(r["event_type"], []).append(r["value"])
    est = {
        r["stream"]: r
        for r in registry["hist_quantiles_per_stream"].fn(spark, sf).collect()
    }
    for stream, vals in by_stream.items():
        vals.sort()
        binw = (vals[-1] - vals[0]) / 256.0
        for q, col in ((0.5, "p50_est"), (0.9, "p90_est"), (0.99, "p99_est")):
            nearest_rank = vals[max(0, math.ceil(q * len(vals)) - 1)]
            got = est[stream][col]
            assert abs(got - nearest_rank) <= binw / 2 + 1e-9, (
                stream, q, got, nearest_rank, binw,
            )
