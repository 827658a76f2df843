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
# NO LONGER HAND-CURATED: tools/sample_order.py derives the priority order
# from (a) queries whose implementation fingerprint (round 7: the TRANSITIVE
# in-package dependency closure at function granularity) changed in git since
# the round of their last driver-green CORRECTNESS row, or that were never
# driver-sampled at all, and (b) staleness of the last green row;
# tests/test_sample_order.py asserts this head EQUALS the derived order, so
# neither a rewrite nor a hand-reorder can ship un-resampled. Regenerate with
# `python tools/sample_order.py`.
# Round-7 composition: the 4 never-sampled round-7 queries (boilerplate
# strip/clip family + EXIF gate) lead, then the 12 r02-era rows deferred
# from r06 (approx-sketch family, session_window_native,
# tpch_q7/q8/q14/q15/q17/q19/q22), then the oldest r03 cohort; the
# transitive fingerprint marks ~100 queries stale (shared tables.py
# helpers changed in r04), so the remainder rotates into r08 in the same
# derived order.
_SAMPLE_FIRST: tuple[str, ...] = (
    'clip_duplicate_spans_stats',
    'multimodal_image_exif_checked',
    'strip_source_prefix_stats',
    'strip_then_span_stats',
    'approx_distinct_users_per_stream',
    'approx_percentiles_per_stream',
    'distinct_users_per_stream',
    'hll_sketch_rollup',
    'session_window_native',
    'tpch_q14_promo_effect',
    'tpch_q15_top_supplier',
    'tpch_q17_small_quantity_revenue',
    'tpch_q19_discounted_revenue',
    'tpch_q22_dormant_customers',
    'tpch_q7_volume_shipping',
    'tpch_q8_market_share',
    'ann_ivf_sign_topk',
    'bm25_search_scores',
    'bollinger_bands_20',
    'clean_text_stats',
    'decontaminate_train_test',
    'dedup_clusters_star',
    'dedup_ngram_jaccard',
    'doc_repetition_stats',
    'emb_near_dup_clusters',
    'ewma_price_per_key',
    'funnel_view_click_purchase',
    'gapfill_hourly_locf',
    'hash_split_assignment',
    'hist_quantiles_per_stream',
    'hll_deterministic_distinct',
    'hll_deterministic_merge_rollup',
    'j1_rate_limit_admission',
    'j4_backoff_transition_table',
    'mad_outliers_per_stream',
    'max_drawdown_per_key',
    'ngram_novelty_scores',
    'pii_redaction_stats',
    'reservoir_sample_per_stream',
    'rsi_14',
    'stratified_sample_hash',
    'stream_corr_matrix',
    'tfidf_top_terms',
    'tpch_q11_important_stock',
    'tpch_q12_priority_by_linestatus',
    'tpch_q16_supplier_relationship',
    'tpch_q1_pricing_summary',
    'tpch_q20_dominant_supplier',
    'tpch_q21_suppliers_who_kept_waiting',
    'tpch_q2_min_cost_supplier',
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
