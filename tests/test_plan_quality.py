"""Physical-plan regression gates for the scale posture.

Correctness is the oracle suite's job; this file pins the PLAN
properties that make the same queries viable at 100 TB, so a refactor
that silently de-optimizes (drops a pushdown, un-broadcasts a
dimension, sneaks a Python UDF into the hot path, adds a shuffle)
fails CI even though results stay right.
"""

from __future__ import annotations

import pytest

from hridaya_steam_market_tracker_spark.queries import load_all

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def registry():
    return load_all()


def _plan(registry, spark, name: str) -> str:
    # Deterministic baseline: a subtree another test left cached swaps
    # in InMemoryTableScan and changes exchange-reuse counts, so the
    # same query can show different shuffle counts depending on suite
    # order (observed: containment_pairs 9 alone vs 10+ after the
    # parity tests warmed its sets cache). Measure the cold plan.
    spark.catalog.clearCache()
    return (
        registry[name]
        .fn(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_q6_pushdown_pruning_single_agg_shuffle(spark, registry):
    plan = _plan(registry, spark, "tpch_q6_forecast_revenue")
    # Range predicates reach the parquet scan...
    assert "l_discount" in plan.split("DataFilters")[1].split("]")[0]
    # ...and unused money columns are pruned from the fact scan.
    fact_scan = next(
        l for l in plan.splitlines() if "FileScan" in l and "l_discount" in l
    )
    assert "l_tax" not in fact_scan and "l_returnflag" not in fact_scan
    # Scalar-max + global agg: at most 2 exchanges, no join shuffle.
    assert plan.count("Exchange") <= 2


def test_e1_latest_per_key_is_one_shuffle(spark, registry):
    plan = _plan(registry, spark, "e1_latest_per_key")
    assert plan.count("Exchange") == 1


def test_q18_broadcasts_customer_dimension(spark, registry):
    plan = _plan(registry, spark, "tpch_q18_large_volume_customers")
    assert "BroadcastHashJoin" in plan


def test_q4_semi_join_not_inner_plus_distinct(spark, registry):
    plan = _plan(registry, spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan


@pytest.mark.parametrize(
    "name",
    [
        "text_quality_stats",
        "dedup_minhash_lsh",
        "fuzzy_decontaminate_pairs",
        "simhash_near_pairs",
        "ann_cosine_topk",
        "sessionize_events",
        "session_window_native",
        "dedup_clusters",
        "range_join_views_before_purchase",
        "ann_lsh_multiprobe_topk",
        "zorder_code_assignment",
        "pii_redaction_stats",
        "stratified_sample_hash",
        "hll_deterministic_distinct",
        "hll_deterministic_merge_rollup",
        "cms_heavy_hitter_freq",
        "reservoir_sample_per_stream",
        "hist_quantiles_per_stream",
        "clean_text_stats",
        "url_domain_stats",
        "ngram_novelty_scores",
        "html_text_extract_checked",
        "bigram_lm_doc_scores",
        "domain_mix_weights",
        "semantic_dedup_keep_list",
        "dsir_importance_weights",
        "url_blocklist_filter",
        "perceptron_quality_scores",
        "dedup_keep_best_quality",
        "ccnet_perplexity_buckets",
        "pretrain_pipeline_e2e",
        "bloom_filter_probe",
        "doc_embeddings_hashed",
        "semantic_dedup_text_e2e",
        "source_kl_divergence",
        "incremental_daily_rollup",
        "knn_label_accuracy",
        "hard_negative_mining",
        "mmr_diverse_topk",
        "perceptron_per_source_models",
        "minhash_estimate_error",
        "tfidf_cosine_pairs",
        "vocab_growth_curve",
        "winsorize_stream_values",
        "stupid_backoff_eval_scores",
        "source_overlap_matrix",
        "cc_luhn_detection_stats",
        "textrank_keywords",
        "dedup_incremental_delta",
        "multimodal_avc1_nal_index_checked",
        "multimodal_hevc_nal_index_checked",
        "duplicate_span_stats",
        "duplicate_span_pairs",
        "chargram_lang_id",
        "tfidf_cosine_pairs_posting",
        "strip_source_prefix_stats",
        "clip_duplicate_spans_stats",
    ],
)
def test_no_python_eval_in_data_path(spark, registry, name):
    plan = _plan(registry, spark, name)
    assert "EvalPython" not in plan  # Batch/ArrowEvalPython = row-level Python


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        ("j1_rate_limit_admission", 1),
        ("j4_backoff_transition_table", 1),  # both windows share one exchange
        ("j7_debounce_coalesce", 2),  # window keys != final rollup keys
    ],
)
def test_streaming_twins_are_window_plans(spark, registry, name, max_shuffles):
    """The J-family batch twins must stay single-pass window plans: a
    key-partitioned sort, no joins, no Python — that's what makes the
    control-loop semantics statable over a 100 TB event log."""
    plan = _plan(registry, spark, name)
    assert plan.count("Exchange") <= max_shuffles
    assert "Join" not in plan
    assert "EvalPython" not in plan


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    # r13 ADVICE: count only NON-broadcast exchanges (the round-13
    # one-row plane-bank broadcasts are not shuffles, and counting them
    # inside a loosened budget left headroom for two real shuffles to
    # slip past the gate) — so the SHUFFLE bound stays at 10.
    [("ann_ivf_sign_topk", 6), ("ann_pq_sign_topk", 10)],
)
def test_sign_quantizer_ann_no_cartesian_no_python(spark, registry, name, max_shuffles):
    """Offline-quantizer ANN: the corpus may only meet queries through a
    cell/code equi-join or a broadcast of the tiny quantizer — never a
    CartesianProduct over the pair space, never row-level Python. The
    exchange budget covers quantizer training (posexplode aggregates),
    which at scale runs once offline, not per query."""
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert shuffles <= max_shuffles


def test_semantic_dedup_is_cell_equijoin(spark, registry):
    """SemDeDup tier: the corpus may only meet itself through the cell
    equi-join (plus the components label joins) — never a
    CartesianProduct, never the tiled full self-join. That is the whole
    point of the cluster-then-compare shape at 100 TB."""
    plan = _plan(registry, spark, "semantic_dedup_keep_list")
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 4


def test_registered_ngram_jaccard_uses_hot_shingle_guard(spark, registry, monkeypatch):
    """The catalog entry must pass max_shingle_df (r2 verdict: the
    unguarded postings self-join fans out k^2 rows per hot shingle)."""
    from hridaya_steam_market_tracker_spark.operators import dedup as D

    seen = {}
    real = D.jaccard_pairs
    monkeypatch.setattr(
        D,
        "jaccard_pairs",
        lambda *a, **k: seen.update(k) or real(*a, **k),
    )
    registry["dedup_ngram_jaccard"].fn(spark, SF_DIR)
    assert seen.get("max_shingle_df") is not None


def test_kmeans_lite_plan_depth_constant_across_iterations(spark):
    """Each Lloyd round localCheckpoints the k-row centroids, so the
    returned plan is a materialized scan whose depth does not grow with
    iterations (r2 verdict: pq_train stacked 16 nested lineages)."""
    from hridaya_steam_market_tracker_spark.operators.similarity import kmeans_lite
    from hridaya_steam_market_tracker_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    plans = {
        it: kmeans_lite(emb, k=8, iters=it)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
        for it in (1, 3)
    }
    assert len(plans[1].splitlines()) == len(plans[3].splitlines())
    assert "ExistingRDD" in plans[3]


def test_bpe_train_plan_depth_constant_across_rounds(spark):
    """Each BPE round localCheckpoints the vocabulary, so the merge
    table's plan depth must not grow with n_merges (same discipline as
    kmeans_lite; a regression here re-nests every round's argmax
    subtree into the next round's plan)."""
    from hridaya_steam_market_tracker_spark.operators.bpe import bpe_train
    from hridaya_steam_market_tracker_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents").limit(50)
    depths = {}
    for n in (1, 3):
        plan = (
            bpe_train(docs, n_merges=n)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # the union adds one branch per round, so normalize per round:
        # per-branch depth must stay constant as n_merges grows
        depths[n] = len(plan.splitlines()) / n
    assert abs(depths[1] - depths[3]) <= 2


def test_emb_cosine_near_dup_is_not_cartesian(spark, registry):
    """The exact cosine self-join must run as the tiled block equi-join:
    no CartesianProduct / BroadcastNestedLoopJoin over the pair space."""
    plan = _plan(registry, spark, "emb_cosine_near_dup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["dedup_clusters", "curation_pipeline_kept_docs"])
def test_curation_mines_pairs_via_minhash_not_postings_join(
    spark, registry, name, monkeypatch
):
    """Pair mining inside the curation pipeline must be the banded-LSH
    candidate path (bucket equi-join + exact verify), never the quadratic
    shingle-postings self-join that fans out k^2 rows per hot shingle.
    (connected_components checkpoints its edge input, so the mining
    subtree is not visible in the final physical plan — assert on the
    call path instead.)"""
    from hridaya_steam_market_tracker_spark.operators import dedup as D

    used_minhash = []
    real = D.minhash_near_duplicates
    monkeypatch.setattr(
        D,
        "minhash_near_duplicates",
        lambda *a, **k: used_minhash.append(1) or real(*a, **k),
    )
    monkeypatch.setattr(
        D,
        "jaccard_pairs",
        lambda *a, **k: (_ for _ in ()).throw(
            AssertionError("quadratic jaccard_pairs used in curation pipeline")
        ),
    )
    assert registry[name].fn(spark, SF_DIR).count() > 0
    assert used_minhash


@pytest.mark.parametrize(
    "name",
    [
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q14_promo_effect",
        "tpch_q19_discounted_revenue",
    ],
)
def test_deep_tpch_broadcasts_dims_single_fact_shuffle(spark, registry, name):
    """Q7/Q8/Q14/Q19: every dimension must broadcast; the only shuffle
    is the aggregate (orders broadcasts at fixture size; at real scale
    it degrades to a keyed SortMergeJoin, never a cartesian)."""
    plan = _plan(registry, spark, name)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert shuffles <= 1


def test_q22_dormancy_is_anti_join(spark, registry):
    plan = _plan(registry, spark, "tpch_q22_dormant_customers")
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        # groupBy(part,supp) partial-agg + partkey window on pair grain
        ("tpch_q2_min_cost_supplier", 2),
        # single fact⋈fact shuffle, all dimensions broadcast
        ("tpch_q9_product_type_profit", 1),
        ("tpch_q12_priority_by_linestatus", 1),
        # two-phase distinct aggregation
        ("tpch_q16_supplier_relationship", 2),
        # pair-grain agg + partkey window; NO totals self-join
        ("tpch_q20_dominant_supplier", 2),
        # ONE orderkey shuffle (collect_set windows, no join-back) + agg
        ("tpch_q21_suppliers_who_kept_waiting", 2),
    ],
)
def test_tpch_rest_shuffle_budget(spark, registry, name, max_shuffles):
    """Q2/Q9/Q12/Q16/Q20/Q21: decorrelated shapes stay within their
    shuffle budget and never fall back to a cartesian. (Q11's plan has
    a legitimate one-row BroadcastNestedLoopJoin for the global-total
    scalar, so it is asserted separately.)"""
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )
    assert shuffles <= max_shuffles


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        # zero-shuffle scan-stage projections
        ("doc_repetition_stats", 0),
        ("winnow_fingerprints", 0),
        # one user_id exchange (chained windows + same-key rollup) + stage agg
        ("funnel_view_click_purchase", 2),
        # keys-distinct + hourly agg + per-key LOCF window
        ("gapfill_hourly_locf", 3),
        # bucketed cumsum: the one shuffle
        ("sequence_pack_assignment", 1),
        # one doc-keyed count shuffle + the eval-set distinct (an
        # exchange over the tiny eval side only, inside the broadcast
        # build); the corpus side itself never shuffles for membership
        ("decontaminate_train_test", 2),
        # cross-relation LSH decontamination: train side's one spread
        # exchange + candidate distinct + verify rollup; the eval
        # bands/sets ride broadcasts (train never shuffles to find
        # candidates, train x train pair space never touched)
        ("fuzzy_decontaminate_pairs", 3),
        # spread + gram-df groupBy + join-back/doc rollup
        ("duplicate_span_stats", 3),
        # round 13: the document side is scan-stage array algebra (no
        # (doc,gram) count shuffle, no doc rank window, no argmin
        # window) — the only exchanges are the adaptive scan widen and
        # the two tiny model-map aggregations over the checkpointed
        # profile; scoring rides a one-row model broadcast
        ("chargram_lang_id", 3),
        # + keep-join, pair join, (i,j,d) window, span groupBy
        ("duplicate_span_pairs", 6),
        # jaccard_pairs' guarded shape: df-capped candidates + two
        # full-set join-backs for the exact verify
        ("containment_pairs", 9),
        # detection's own shuffles (prefix counts + source totals +
        # top-1 window); the strip itself is a broadcast join + scan
        ("strip_source_prefix_stats", 4),
        # detection + the span stat's gram-df/doc rollup shuffles
        ("strip_then_span_stats", 7),
        # span_pairs' 6 + interval merge window/groupBy + doc join-back
        ("clip_duplicate_spans_stats", 9),
    ],
)
def test_pipeline_ext_shuffle_budget(spark, registry, name, max_shuffles):
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )
    assert shuffles <= max_shuffles


def test_chargram_scoring_has_no_rank_windows(spark, registry):
    """Round-13 rewrite gate: chargram_lang_id's per-doc ranks and the
    argmin are per-row array algebra riding the scan, and the trained
    profile is materialized before the scoring plan — so the executed
    plan must contain NO window operator at all (the old shape had a
    doc-rank window, a per-lang rank window, and an argmin window)."""
    plan = _plan(registry, spark, "chargram_lang_id")
    assert "row_number" not in plan
    assert "Window" not in plan


def test_q11_threshold_is_broadcast_scalar_not_collect(spark, registry):
    plan = _plan(registry, spark, "tpch_q11_important_stock")
    assert "CartesianProduct" not in plan
    # The one-row global total joins as a broadcast, never a driver collect.
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_partitioned_layout_prunes_on_date(spark, tmp_path):
    """The storage layout's date partitioning must turn a time-range
    predicate into partition pruning (the Spark analog of Timescale
    chunk exclusion): the scan's PartitionFilters must carry the
    predicate, and non-matching date directories must not be read."""
    import datetime

    from pyspark.sql import functions as F

    from hridaya_steam_market_tracker_spark.storage.layout import (
        PARTITION_COL,
        write_partitioned,
    )
    from hridaya_steam_market_tracker_spark.tables import table

    events = (
        table(spark, SF_DIR, "events")
        .select(
            F.col("user_id").cast("string").alias("market_hash_name"),
            F.col("ts").alias("time"),
            "value",
        )
    )
    sink = str(tmp_path / "sink")
    write_partitioned(events, sink, key_col="market_hash_name", time_col="time")

    cutoff = datetime.date(2024, 1, 20)
    read = spark.read.parquet(sink).filter(F.col(PARTITION_COL) >= F.lit(cutoff))
    plan = read._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [")[1].split("]")[0]
    assert PARTITION_COL in pf  # predicate reached the partition layer
    # Only the 11 matching date dirs (Jan 20-30) are actually read
    # (input_file_name at execution time, after pruning).
    scanned = {
        r[0].split(f"{PARTITION_COL}=")[1].split("/")[0]
        for r in read.select(F.input_file_name()).distinct().collect()
    }
    assert scanned == {f"2024-01-{d:02d}" for d in range(20, 31)}


@pytest.mark.parametrize("name", ["ann_ivf_recall_vs_brute", "ann_pq_recall_vs_brute"])
def test_recall_rows_no_python_no_cartesian(spark, registry, name):
    """The recall@k metric queries compose an approximate pipeline with
    the exact brute tier: the brute side is allowed its broadcast
    cross join (query side is 10 rows), but nothing may fall into a
    CartesianProduct or row-level Python."""
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


@pytest.mark.parametrize("name", ["ann_lsh_topk", "ann_lsh_multiprobe_topk"])
def test_lsh_planes_are_broadcast_data_not_literals(spark, registry, name):
    """The hyperplane bank must enter the plan as a broadcast one-row
    join input, not as tables x planes x dim inlined scalar Literals —
    the literal form made the multiprobe plan ~1 MB of expression nodes
    and cost seconds of analysis/codegen per run. Gate on plan size so
    a refactor back to literals fails loudly."""
    plan = _plan(registry, spark, name)
    assert "BroadcastNestedLoopJoin" in plan  # the one-row planes join
    assert len(plan) < 200_000


def test_session_pins_aqe_skew_join(spark):
    """pin_session must leave AQE skew-join splitting on: the banded /
    tiled self-joins (LSH buckets, SimHash chunks, winnowing grams)
    inherit corpus key skew at 100 TB, and runtime partition splitting
    is the engine-level backstop beneath the DF-cutoff guards."""
    from hridaya_steam_market_tracker_spark.tables import pin_session

    pin_session(spark)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"


def test_sample_first_names_all_registered(registry):
    """_SAMPLE_FIRST drives the driver's correctness-sample order; a
    stale name silently wastes a sample slot. Every entry must resolve,
    and the pinned head must stay within the driver's ~50-query window."""
    from hridaya_steam_market_tracker_spark.queries import _SAMPLE_FIRST

    missing = [n for n in _SAMPLE_FIRST if n not in registry]
    assert missing == [], f"stale _SAMPLE_FIRST entries: {missing}"
    assert len(_SAMPLE_FIRST) <= 50
    assert list(registry)[: len(_SAMPLE_FIRST)] == list(_SAMPLE_FIRST)


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        # decode (MapInPandas) -> media_id window + groupBy + the
        # id-only honest-failure join
        ("multimodal_video_temporal_hash_checked", 2),
        # the whole fingerprint happens inside one Arrow pass
        ("multimodal_audio_fingerprint_checked", 0),
        # one plane: batch bands self-join + store join + the
        # admit-list anti/left joins
        ("media_ingest_admission_twin", 6),
        # three planes (the plane tag rides the band explode — no
        # join-back per plane; regression from 22 shuffles if someone
        # reintroduces the media_id rejoin in _any_bands)
        ("any_media_ingest_admission_twin", 14),
        # decode -> lag/cumsum window + shot windows + groupBy, ALL
        # media_id-clustered (subset rule): exactly one exchange
        ("multimodal_video_shot_segments", 1),
        # drift windows share the media_id key (subset rule): the
        # gradual-transition rule adds NO exchange
        ("multimodal_video_dissolve_segments", 1),
        # + the timestamp join against the shared frames relation
        ("multimodal_video_scene_keyframes", 3),
        # decode -> islands window + run groupBy + dense renumber,
        # ALL media_id-clustered: exactly one exchange
        ("multimodal_audio_segments", 1),
        # the whole WHT hash happens inside one Arrow pass
        ("multimodal_image_whash_checked", 0),
        # band explode self-join + the exact-verify join-backs
        ("multimodal_whash_near_pairs", 3),
        # COLD plan: the decision fans both fps relations out
        # (population, evidence, denominator) — lazy localCheckpoints
        # at the fps boundary collapse the recomputation at runtime,
        # invisible to the cold plan string (the subclip-tier pattern)
        ("corpus_excerpt_admission_twin", 15),
        # BM25 arm's postings/df/stats shuffles + each arm's rank
        # window + the O(arms x 50)-row fusion join and final window,
        # +1 (round 13): the vector arm's cosine_topk carries the
        # conditional _widen_small_scan round-robin exchange on the
        # one-file fixture scan (a no-op at real scale)
        ("hybrid_rrf_search", 9),
        # round-11 phase-shifted planes: fingerprints are one distinct
        # over the Arrow pass (the k^2/k phase grids ride the same
        # decode — no extra exchange)
        ("multimodal_image_offset_tile_fingerprints", 1),
        ("multimodal_audio_offset_clip_fingerprints", 1),
        # containment joins: same df-capped shape as the aligned tier
        ("multimodal_image_offset_crop_pairs", 9),
        ("multimodal_audio_offset_excerpt_pairs", 9),
        # the phase-aware decision twin: lazy fps-stage checkpoints
        # truncate the decision's 4-way fan-out to the post-decode
        # relations
        ("media_phase_excerpt_admission_twin", 12),
        # the round-12 content-defined decision twin: same shape
        ("media_cdt_excerpt_admission_twin", 12),
        # round-12 content-defined planes: anchors are pure Arrow
        # scan-stage output (zero exchanges — the fingerprint distinct
        # belongs to the pairs queries), containment joins the same
        # df-capped shape as every other plane
        ("multimodal_image_cdt_anchors_checked", 0),
        ("multimodal_audio_cdt_anchors_checked", 0),
        ("multimodal_image_cdt_crop_pairs", 9),
        ("multimodal_audio_cdt_excerpt_pairs", 9),
        # round-13 hybrid planes: density is one count aggregate over
        # the anchor scan + the dims join (image: 3 — count, dims
        # join, audio: 2); the hybrid pairs keep the cdt pairs' df-
        # capped containment shape plus the low-entropy semi-join
        # riding the same exchanges; the decision twin matches the
        # cdt twin's 12 (lazy fps-stage checkpoints truncate the
        # fan-out at runtime, invisible to the cold plan)
        ("multimodal_image_cdt_density_checked", 3),
        ("multimodal_audio_cdt_density_checked", 2),
        # the round-13 I_PCM tier is a pure Arrow scan-stage decode:
        # container walk + bitstream parse + PCM tokens, zero exchanges
        ("multimodal_avc1_ipcm_decode_checked", 0),
        ("multimodal_image_hybrid_crop_pairs", 9),
        ("multimodal_audio_hybrid_excerpt_pairs", 9),
        ("media_hybrid_admission_twin", 12),
        # CDC boundary detection is scan-stage array algebra: the
        # chunk relation leaves the scan with ZERO exchanges
        ("cdc_chunks_checked", 0),
        # df-capped containment join over the chunk-hash relation
        ("cdc_offset_dup_pairs", 5),
        # hash-keyed document frequency + join-back + per-doc rollup
        ("cdc_dup_chunk_mass", 3),
    ],
)
def test_media_neardup_tier_shuffle_budget(spark, registry, name, max_shuffles):
    """The round-9 media near-dup tier must stay banded-join shaped:
    Arrow mapInPandas for codecs is the design, but row-level Python
    (EvalPython) and cartesian pair spaces never appear, and the
    shuffle counts are pinned so the 100 TB shape can't silently
    regress."""
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )
    assert shuffles <= max_shuffles


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        # decode (MapInPandas) -> one media_id groupBy; winnowing
        # selection is scan-stage array algebra (zero extra shuffles)
        ("multimodal_video_clip_fingerprints", 1),
        # COLD plan: the containment join fans the fingerprint relation
        # out four ways (both join sides + both count sides), so the
        # pre-execution lineage shows each branch's groupBy. A LAZY
        # localCheckpoint at the fps boundary collapses them to ONE
        # decode at first execution (measured 3.7x: 1.28 -> 0.35 s) but
        # is invisible to the cold plan string this gate reads — the
        # budget pins the cold shape; the checkpoint is the runtime fix.
        ("multimodal_video_subclip_pairs", 13),
    ],
)
def test_video_subclip_tier_shuffle_budget(spark, registry, name, max_shuffles):
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )
    assert shuffles <= max_shuffles


@pytest.mark.parametrize(
    ("name", "max_shuffles"),
    [
        # tokens come straight out of the Arrow pass; one groupBy-free
        # winnowing selection (scan-stage array algebra)
        ("multimodal_audio_clip_fingerprints", 0),
        # cold-plan fan-out like the video twin (lazy checkpoint
        # collapses it at execution)
        ("multimodal_audio_excerpt_pairs", 13),
    ],
)
def test_audio_excerpt_tier_shuffle_budget(spark, registry, name, max_shuffles):
    plan = _plan(registry, spark, name)
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )
    assert shuffles <= max_shuffles


def test_ccnet_buckets_no_whole_source_sort(spark, registry):
    """Round-12 de-skew gate (the round-11 verdict's one perf flag):
    `ccnet_perplexity_buckets` must NOT bucket via ntile over a
    whole-source window — a source's every doc sorted in ONE task.
    The de-skewed plan's only source-partitioned Window is the
    cumulative count over the (source, avg_logprob) HISTOGRAM (its
    subtree aggregates before the window), and the doc-level window
    is partitioned by (source, avg_logprob) — tie groups, never a
    whole source."""
    plan = _plan(registry, spark, "ccnet_perplexity_buckets")
    assert "ntile" not in plan
    lines = plan.splitlines()
    import re

    def part_cols(line: str) -> list[str]:
        # Window [funcs], [partition spec][, order spec] — the order
        # spec is absent for unordered full-frame windows, so pick the
        # partition spec by position: last unless the last looks like
        # an ordering (ASC/DESC). Spec elements may wrap the column
        # (knownfloatingpointnormalized(...)), so pull the attribute
        # name out of each element by its #exprId.
        specs = re.findall(r"\[([^\[\]]*)\]", line)
        if len(specs) < 2:
            return []
        part = (
            specs[-2]
            if re.search(r"\b(ASC|DESC)\b", specs[-1])
            else specs[-1]
        )
        out = []
        for el in part.split(","):
            m = re.search(r"(\w+)#\d+", el)
            if m:
                out.append(m.group(1))
        return out

    win_lines = [
        (i, ln) for i, ln in enumerate(lines) if re.search(r"\bWindow\b", ln)
    ]
    assert win_lines, "expected Window nodes in the ccnet plan"
    saw_source_only = saw_tie_group = False
    for i, ln in enumerate(lines):
        if not re.search(r"\bWindow\b", ln):
            continue
        cols = part_cols(ln)
        if cols == ["source"]:
            saw_source_only = True
            # subtree (serialized after the parent) must aggregate to
            # the (source, avg_logprob) histogram before this window
            subtree = "\n".join(lines[i + 1:])
            assert re.search(
                r"HashAggregate\(keys=\[source#\d+L?, avg_logprob#\d+",
                subtree,
            ), "source-only Window must sit above the score histogram"
        elif cols[:2] == ["source", "avg_logprob"]:
            saw_tie_group = True
        else:
            raise AssertionError(f"unexpected Window partitioning: {ln}")
    assert saw_source_only and saw_tie_group


def test_ccnet_buckets_approx_no_sort_one_shuffle(spark, registry):
    """The corpus tier (`ccnet_buckets_approx`, registered round 13)
    must keep its advertised shape: NO per-source sort of ANY width —
    no Window, no Sort, no ntile — just the mergeable
    percentile_approx aggregate and the broadcast cutoff join; the
    only non-broadcast exchange is the sketch aggregate's partial ->
    final shuffle (the scoring subtree sits under a lazy
    localCheckpoint, so the cold plan shows its one exchange too)."""
    import re

    plan = _plan(registry, spark, "ccnet_buckets_approx")
    # NB: "ntile" alone would false-positive on perce-NTILE_approx —
    # match the window function call shape only
    assert not re.search(r"(?<![a-z_])ntile\(", plan)
    assert not re.search(r"\bWindow\b", plan)
    assert not re.search(r"\bSort\b", plan)
    assert "BroadcastHashJoin" in plan
    shuffles = sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "Reused" not in line
    )
    assert shuffles <= 1
