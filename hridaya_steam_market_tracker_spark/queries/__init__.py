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
# in this exact order, regardless of module import order, so queries that have
# never had a driver CORRECTNESS row get sampled first. Rounds 1+2 verified 99
# of 126 queries; this list is the 27 round-2 additions that registered behind
# the sample window, followed by round-3 additions. Names not (yet) registered
# are skipped harmlessly.
_SAMPLE_FIRST: tuple[str, ...] = (
    # tpch_rest (round 2, never driver-sampled)
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_type_profit",
    "tpch_q11_important_stock",
    "tpch_q12_priority_by_linestatus",
    "tpch_q16_supplier_relationship",
    "tpch_q20_dominant_supplier",
    "tpch_q21_suppliers_who_kept_waiting",
    # curation_ext
    "doc_repetition_stats",
    "decontaminate_train_test",
    "winnow_fingerprints",
    "winnow_near_pairs",
    "hash_split_assignment",
    "bm25_search_scores",
    "sequence_pack_assignment",
    "tfidf_top_terms",
    "chunk_dedup_reassemble",
    # events_ext
    "funnel_view_click_purchase",
    "gapfill_hourly_locf",
    "mad_outliers_per_stream",
    "stream_corr_matrix",
    # indicators
    "bollinger_bands_20",
    "rsi_14",
    "ewma_price_per_key",
    "max_drawdown_per_key",
    # stragglers registered mid-module
    "emb_near_dup_clusters",
    "dedup_clusters_star",
    "multimodal_audio_features",
    # round-3 upgrades/additions (no driver row under the new contract yet):
    # ann_lsh_topk's r2 row was rows-only; it now has a full value oracle
    # (bit-exact LCG hyperplane replication) and needs a fresh driver row.
    "ann_lsh_topk",
    "ann_lsh_multiprobe_topk",
    "ann_ivf_sign_topk",
    "ann_pq_sign_topk",
    "j1_rate_limit_admission",
    "j4_backoff_transition_table",
    "j7_debounce_coalesce",
    "zorder_code_assignment",
    "pii_redaction_stats",
    "stratified_sample_hash",
    "hll_deterministic_distinct",
    "cms_heavy_hitter_freq",
    "hll_deterministic_merge_rollup",
    "reservoir_sample_per_stream",
    "hist_quantiles_per_stream",
    "clean_text_stats",
    "url_domain_stats",
    "ngram_novelty_scores",
    # implementation changed in round 3 (hot-shingle guard) — the r1 row
    # predates the guard, so sample it again under the new code path
    "dedup_ngram_jaccard",
)


def load_all() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return the registry.

    Registry order IS the driver's sample order; ``_SAMPLE_FIRST`` pins the
    driver-unverified queries to the head so one round's sample covers them.
    Everything else follows in module import order (all already green in
    CORRECTNESS_r01/r02).
    """
    from hridaya_steam_market_tracker_spark.queries import (  # noqa: F401
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
        streaming_twins,
    )

    ordered: dict[str, Query] = {}
    for name in _SAMPLE_FIRST:
        if name in REGISTRY:
            ordered[name] = REGISTRY[name]
    for name, query in REGISTRY.items():
        ordered.setdefault(name, query)
    return ordered
