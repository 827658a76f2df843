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
# in this exact order, regardless of module import order, so the sample spends
# every slot on the rows where a fresh check buys the most information.
# Round-5 refresh (pruned the 47 r04 greens): (1) round-5 additions, (2) the
# two LSH queries whose implementation changed this round (score-before-dedup
# + adaptive scan widen), (3) the 47 queries whose most recent driver
# CORRECTNESS row dates from round 1 — all green, but three code rounds stale,
# so re-greening them under the current code is what a slot is worth now.
# (Derived from CORRECTNESS_r01-r04 key sets; names not (yet) registered are
# skipped harmlessly.)
_SAMPLE_FIRST: tuple[str, ...] = (
    # round-5 additions
    "multimodal_avc1_nal_index_checked",
    "multimodal_hevc_nal_index_checked",
    "dedup_incremental_delta",
    # implementation changed in round 5 — re-sample under the new code path
    "ann_lsh_multiprobe_topk",
    "ann_lsh_topk",
    # last driver-sampled in round 1 (stalest greens; includes the
    # multimodal_resize / multimodal_frame_sample rows-only pair)
    "text_quality_stats",
    "dedup_exact",
    "dedup_minhash_lsh",
    "simhash_signatures",
    "simhash_near_pairs",
    "dedup_clusters",
    "corpus_curation_rollup",
    "curation_pipeline_kept_docs",
    "x1_rollup_region_nation",
    "x2_cube_flag_status",
    "x3_pivot_status_by_segment",
    "x4_above_customer_avg_orders",
    "x5_grouping_sets_events",
    "sessionize_events",
    "value_percentiles_per_stream",
    "value_histogram",
    "c1_broadcast_enrich",
    "c2_manifest_resolve_join",
    "c5_anti_unresolved",
    "c6_exists_semi",
    "c3_spike_above_global_avg",
    "c4_reconcile_diff",
    "c7_hwm_delta_ingest",
    "c8_set_equality_verify",
    "range_join_views_before_purchase",
    "multimodal_frame_sample",
    "multimodal_resize",
    "g1_parse_steam_price",
    "g2_minor_units_conversion",
    "g3_parse_volume",
    "g4_extract_currency",
    "h1_parse_steam_datetime",
    "g5_activity_price_currency",
    "d2_count_enabled",
    "d3_windowed_union_count",
    "d4_last_ingest_union_max",
    "f1_union_all_per_stream_meta",
    "f3_payload_dup_check",
    "d9_feasibility_gate",
    "d11_distinct_collect_per_stream",
    "b5_sanity_invariants",
    "i1_json_extract",
    "i3_json_payload_build",
    "i5_spread_per_key_day",
    "e6_urgency_overdue",
    # "g10_sha256_fingerprint" deferred to r06 (head capped at 50)
    # "h3_hour_label_histogram" deferred to r06 (head capped at 50)
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
