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
# Round-8 composition: the 8 queries whose latest driver row is r03
# (tpch_q3/q5/q6/q9, url_domain_stats, winnow_*, zorder_code_assignment)
# lead — after this sample no query's row is older than r04 — then the
# r04 cohort in derived order; the transitive fingerprint's overflow
# (shared-helper stale set larger than the 50-slot head) keeps rotating
# in subsequent rounds.
_SAMPLE_FIRST: tuple[str, ...] = (
    'multimodal_audio_goertzel_checked',
    'multimodal_dhash_oriented_checked',
    'multimodal_dhash_oriented_near_pairs_checked',
    'multimodal_image_dedup_keep_list',
    'tpch_q3_shipping_priority',
    'tpch_q5_local_supplier_volume',
    'tpch_q6_forecast_revenue',
    'tpch_q9_product_type_profit',
    'url_domain_stats',
    'winnow_fingerprints',
    'winnow_near_pairs',
    'zorder_code_assignment',
    'ann_ivf_recall_vs_brute',
    'ann_ivf_topk',
    'ann_pq_recall_vs_brute',
    'bigram_lm_doc_scores',
    'bloom_filter_probe',
    'bpe_doc_token_stats',
    'bpe_train_merges',
    'cc_luhn_detection_stats',
    'ccnet_perplexity_buckets',
    'chunk_dedup_reassemble',
    'cluster_weighted_sample',
    'cms_heavy_hitter_freq',
    'dedup_keep_best_quality',
    'dedup_recall_audit',
    'doc_embeddings_hashed',
    'domain_mix_weights',
    'dsir_importance_weights',
    'hard_negative_mining',
    'html_text_extract_checked',
    'incremental_daily_rollup',
    'j7_debounce_coalesce',
    'knn_label_accuracy',
    'minhash_estimate_error',
    'mmr_diverse_topk',
    'multimodal_mjpeg_decode_checked',
    'multimodal_mp4_frame_index_checked',
    'multimodal_mp4_frame_sample_checked',
    'perceptron_per_source_models',
    'perceptron_quality_scores',
    'pretrain_pipeline_e2e',
    'semantic_dedup_keep_list',
    'semantic_dedup_text_e2e',
    'sequence_pack_assignment',
    'source_kl_divergence',
    'source_overlap_matrix',
    'stupid_backoff_eval_scores',
    'textrank_keywords',
    'url_blocklist_filter',
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
