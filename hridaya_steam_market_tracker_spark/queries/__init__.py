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


# The driver's correctness gate samples the registry front-to-back (~50
# queries per round). Names listed here are moved to the head of the registry
# in this exact order, regardless of module import order, so queries that need
# a (fresh) driver CORRECTNESS row get sampled first. Pruned against
# CORRECTNESS_r03: rounds 1-3 greened 130/143 registered queries; the list
# below is exactly the rows that still need one — the two round-3 hash-FAILs
# (oracle HUGEINT typing, fixed in round 4), the round-4 additions, the
# implementation-changed queries, and the 11 rows-only-by-design entries so
# their rows stay current. Names not (yet) registered are skipped harmlessly.
_SAMPLE_FIRST: tuple[str, ...] = (
    # round-3 hash-FAILs, oracle BIGINT casts fixed in round 4 — re-green
    "sequence_pack_assignment",
    "chunk_dedup_reassemble",
    # round-4 additions: value-checkable multimodal + ANN recall rows
    "multimodal_feature_extract_checked",
    "multimodal_resize_checked",
    "multimodal_frame_sample_checked",
    "multimodal_audio_features_checked",
    "multimodal_mp4_frame_index_checked",
    "multimodal_mp4_frame_sample_checked",
    "multimodal_mjpeg_decode_checked",
    "blob_decompress_stats_checked",
    "warc_record_index_checked",
    "bpe_train_merges",
    "bpe_doc_token_stats",
    "bigram_lm_doc_scores",
    "domain_mix_weights",
    "html_text_extract_checked",
    "ann_ivf_recall_vs_brute",
    "ann_pq_recall_vs_brute",
    "semantic_dedup_keep_list",
    "dsir_importance_weights",
    "url_blocklist_filter",
    "perceptron_quality_scores",
    "dedup_keep_best_quality",
    "ccnet_perplexity_buckets",
    "knn_label_accuracy",
    "hard_negative_mining",
    "incremental_daily_rollup",
    "pretrain_pipeline_e2e",
    "bloom_filter_probe",
    "dedup_recall_audit",
    "mmr_diverse_topk",
    "doc_embeddings_hashed",
    "semantic_dedup_text_e2e",
    "source_kl_divergence",
    "perceptron_per_source_models",
    "textrank_keywords",
    "minhash_estimate_error",
    "tfidf_cosine_pairs",
    "vocab_growth_curve",
    "winsorize_stream_values",
    "stupid_backoff_eval_scores",
    "source_overlap_matrix",
    "cc_luhn_detection_stats",
    "cluster_weighted_sample",
    # implementation touched in round 4 (ADVICE fixes) — re-sample under the
    # new code path: j7 tie-break, count-min left-join, multiprobe NaN guard
    "j7_debounce_coalesce",
    "cms_heavy_hitter_freq",
    "ann_lsh_multiprobe_topk",
    # rows-only by design (no_oracle) — keep their rows-only checks current
    "multimodal_feature_extract",
    "multimodal_audio_features",
    "ann_ivf_topk",
    # (multimodal_resize, multimodal_frame_sample, ann_pq_topk, freq_items_users, stratified_sample_events,
    # approx_distinct_users_per_stream, hll_sketch_rollup,
    # approx_percentiles_per_stream dropped from the head
    # in round 4: their rows-only records are current through r3 and the
    # slots are better spent on new green-capable rows)
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
