"""The oracle-checked query catalog.

Every operator in SURVEY.md §2 that is batch-expressible registers here
as a named query over the driver fixture tables, paired with the ANSI
SQL a DuckDB oracle runs on the same parquet. The registry is what
``__spark_entry__.py`` exposes to the driver.

Registration contract (driver compares after sorting columns by name):
  * alias every computed column identically in Spark and SQL;
  * explicitly cast aggregate outputs (DuckDB SUM(int)->HUGEINT vs
    Spark -> LONG, DuckDB FLOOR -> DOUBLE vs Spark -> LONG, ...);
  * round floating aggregates on BOTH sides so cross-engine summation
    order can't flip the value hash;
  * derive any "now" from max(ts) in the data (deterministic), via a
    broadcast one-row join — never a driver-side collect.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


# The driver's correctness gate samples the registry front-to-back (50
# queries per round). Names listed here are moved to the head of the registry
# in this exact order, regardless of module import order, so the sample spends
# every slot on the rows where a fresh check buys the most information.
# The head is capped at 50 = the driver's sample size; listing more would
# silently starve the tail (the round-5 list overflowed by two).
#
# Round-6 refresh — NO LONGER HAND-CURATED: tools/sample_order.py derives
# the priority order from (a) queries whose implementing modules changed in
# git since the round of their last driver-green CORRECTNESS row (or that
# were never driver-sampled at all) and (b) staleness of the last green row;
# tests/test_sample_order.py fails the suite if any flagged query is missing
# from this head, so a rewrite can never ship un-resampled again.
# Composition: (1) the round-6 APSS forced-strategy twins + the round-5
# cost-adaptive rewrite of tfidf_cosine_pairs (its green row predates the
# rewrite), (2) the round-6 SPS/PPS parameter queries, (3) the two r01
# leftovers the r05 overflow deferred, (4) 43 of the 44 queries whose latest
# green row is r02 (tpch_q22_dormant_customers deferred to r07).
_SAMPLE_FIRST: tuple[str, ...] = (
    # round-6 additions / round-5 rewrite needing fresh driver rows
    "tfidf_cosine_pairs",
    "tfidf_cosine_pairs_posting",
    "tfidf_cosine_pairs_tiled",
    "multimodal_avc1_sps_params_checked",
    "multimodal_hevc_sps_params_checked",
    "multimodal_avcc_config_sps_checked",
    "multimodal_hvcc_config_sps_checked",
    "multimodal_image_dhash_checked",
    "multimodal_dhash_near_pairs_checked",
    "duplicate_span_stats",
    "duplicate_span_pairs",
    "containment_pairs",
    "multimodal_audio_zcr_checked",
    "doc_token_entropy",
    "source_prefix_boilerplate",
    # flagged by tools/sample_order.py: similarity.py's round-5 rewrite
    # touched its deps but its last driver row is r03 — the exact class
    # of miss the derived gate exists to catch
    "ann_pq_sign_topk",
    # last driver-sampled in round 1 (deferred from the r05 head)
    "g10_sha256_fingerprint",
    "h3_hour_label_histogram",
    # last driver-sampled in round 2 (stalest remaining greens)
    "brand_revenue_ranking",
    "nation_customer_rollup",
    "tpch_q4_order_priority",
    "tpch_q13_customer_distribution",
    "tpch_q18_large_volume_customers",
    "tpch_q10_returned_items",
    "e1_latest_per_key",
    "e2_recent_n_per_key",
    "e3_series_tail_k",
    "b2_range_filter_month",
    "e4_ordered_series_for_key",
    "d1_hwm_per_key",
    "d5_daily_rollup",
    "d6_volatility_per_key",
    "d8_latest_summary_per_key",
    "h7_staleness_cutoff",
    "w1_rolling_avg",
    "w2_lag_delta",
    "w3_rank_by_activity",
    "w4_tumbling_window_1d",
    "w5_sliding_window_6h_1h",
    "w6_asof_join_purchase_click",
    "emb_cosine_near_dup",
    "h5_iso8601_serialization",
    "w7_trailing_1h_range_avg",
    "w8_rank_distributions",
    "ann_cosine_topk",
    "embedding_label_centroids",
    "ann_pq_topk",
    "heavy_hitter_users",
    "freq_items_users",
    "stratified_sample_events",
    # "distinct_users_per_stream" deferred to r07 (head capped at 50)
    # "approx_distinct_users_per_stream" deferred to r07 (head capped at 50)
    # "hll_sketch_rollup" deferred to r07 (head capped at 50)
    # "approx_percentiles_per_stream" deferred to r07 (head capped at 50)
    # "session_window_native" deferred to r07 (head capped at 50)
    # "tpch_q7_volume_shipping" deferred to r07 (head capped at 50)
    # "tpch_q8_market_share" deferred to r07 (head capped at 50)
    # "tpch_q14_promo_effect" deferred to r07 (head capped at 50)
    # "tpch_q15_top_supplier" deferred to r07 (head capped at 50)
    # "tpch_q17_small_quantity_revenue" deferred to r07 (head capped at 50)
    # "tpch_q19_discounted_revenue" deferred to r07 (head capped at 50)
    # "tpch_q22_dormant_customers" deferred to r07 (head capped at 50)
)


def load_all() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return the registry.

    Registry order IS the driver's sample order; ``_SAMPLE_FIRST`` pins the
    driver-unverified queries to the head so one round's sample covers them.
    Everything else follows in module import order (all already green in
    CORRECTNESS_r01/r02).
    """
    from hridaya_steam_market_tracker_spark.queries import (  # noqa: F401
        bpe_q,
        tpch,
        timeseries,
        windows,
        vectors,
        sampling,
        sketches,
        tpch_deep,
        tpch_rest,
        curation_ext,
        events_ext,
        analytics_ext,
        behavior,
        indicators,
        docs,
        joins,
        media,
        parsers,
        rollups,
        selection,
        streaming_twins,
    )

    ordered: dict[str, Query] = {}
    for name in _SAMPLE_FIRST:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, query in REGISTRY.items():
        ordered.setdefault(name, query)
    return ordered
