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
# Round-13 composition (cost-aware — the r12 empty-record lesson): the
# twelve never-driver-sampled queries lead (the six r12 CDT/fuzzy
# queries whose r12 record came back empty, plus the five new hybrid/
# density queries and the avc1 I_PCM decode), then the cohort whose
# transitive fingerprints changed in the round-13 OPTIMIZATION work
# (bind1 rewrites touch the n-gram/shingle/chunk/embedding families;
# the precomputed-norm rewrite touches the similarity family; the DSIR
# single-pass restructure flags dsir_importance_weights directly; the
# second round-13 batch flags the apss probe, the widened brute tiers,
# the components consumers and the media twins; the fourth sitting's
# array-signature/plane-bank, LSH table-lambda, bound-jaccard and
# textrank degree-join rewrites re-flag the minhash/LSH/textrank
# families and rotate minhash_estimate_error + textrank_keywords in),
# then the staleness
# rotation. WITHIN each tier the order is measured
# per-query cost, CHEAP FIRST (tools/query_costs.json) — so a
# time-budgeted driver run records as many rows as possible before any
# cutoff.
_SAMPLE_FIRST: tuple[str, ...] = (
    "multimodal_audio_cdt_anchors_checked",
    "multimodal_avc1_ipcm_decode_checked",
    "multimodal_image_cdt_anchors_checked",
    "multimodal_audio_cdt_density_checked",
    "multimodal_image_cdt_density_checked",
    "multimodal_audio_cdt_excerpt_pairs",
    "multimodal_image_cdt_crop_pairs",
    "multimodal_audio_hybrid_excerpt_pairs",
    "multimodal_image_hybrid_crop_pairs",
    "fuzzy_decontaminate_pairs",
    "media_cdt_excerpt_admission_twin",
    "media_hybrid_admission_twin",
    "tfidf_cosine_pairs_tiled",
    "tfidf_cosine_pairs_posting",
    "tfidf_cosine_pairs",
    "strip_source_prefix_stats",
    "doc_repetition_stats",
    "chunk_dedup_reassemble",
    "stupid_backoff_eval_scores",
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    "doc_embeddings_hashed",
    "domain_mix_weights",
    "bigram_lm_doc_scores",
    "textrank_keywords",
    "ann_pq_recall_vs_brute",
    "minhash_estimate_error",
    "mmr_diverse_topk",
    "source_prefix_boilerplate",
    "vocab_growth_curve",
    "containment_pairs",
    "duplicate_span_stats",
    "multimodal_video_subclip_pairs",
    "strip_then_span_stats",
    "hybrid_rrf_search",
    "multimodal_dhash_oriented_checked",
    "multimodal_audio_fingerprint_checked",
    "multimodal_image_exif_checked",
    "multimodal_image_tile_fingerprints",
    "multimodal_image_whash_checked",
    "multimodal_audio_clip_fingerprints",
    "multimodal_audio_offset_clip_fingerprints",
    "multimodal_audio_segments",
    "multimodal_image_offset_tile_fingerprints",
    "multimodal_dhash_oriented_near_pairs_checked",
    "multimodal_whash_near_pairs",
    "multimodal_audio_excerpt_pairs",
    "multimodal_image_crop_pairs",
    "multimodal_image_offset_crop_pairs",
    "multimodal_audio_offset_excerpt_pairs",
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
