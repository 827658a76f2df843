"""Reproduce the PLANS.md SCALE section: generate an N-times-scaled
copy of the documents/embeddings fixtures (replica-disjoint
vocabularies — see below), time the heavy-tier queries on it, and
print one JSON line per query plus a summary line.

Usage:
    python tools/scale_rehearsal.py [--rep 10] [--sf-dir /root/testdata/sf0.1] \
        [--out /tmp/scale_sf1] [--queries name1,name2,...]

Scaling design: replica r > 0 suffixes EVERY token with ``_r<r>`` and
shifts ids by r * 10_000_000, so replicas share no vocabulary and no
ids. Similarity structure (dup pairs, clusters, candidate volume) is
therefore the base corpus's replicated N times — output and work scale
linearly, with none of the pathological N-clone clusters naive
duplication would create. Embeddings get a small per-replica component
shift for the same reason. Other tables are symlinked unscaled.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hridaya_steam_market_tracker_spark.queries import load_all  # noqa: E402
from hridaya_steam_market_tracker_spark.session import get_spark  # noqa: E402

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "ann_lsh_multiprobe_topk",
    "tfidf_cosine_pairs",
    "ccnet_perplexity_buckets",
    "dsir_importance_weights",
    "dedup_incremental_delta",
]


def generate(spark, src: str, dst: str, rep: int) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events"):
        link = os.path.join(dst, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(src, f"{t}.parquet"), link)

    reps = spark.range(rep).withColumnRenamed("id", "rep")
    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    toks = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    suffixed = F.array_join(
        F.transform(toks, lambda w: F.concat(w, F.lit("_r"), F.col("rep").cast("string"))),
        " ",
    )
    text = F.when(F.col("rep") == 0, F.col("text")).otherwise(suffixed)
    (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * F.lit(10_000_000)).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("long").alias("n_chars"),
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "documents.parquet"))
    )
    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("rep") * F.lit(10_000_000)).alias("vec_id"),
            F.when(F.col("rep") == 0, F.col("embedding"))
            .otherwise(
                F.transform(
                    "embedding", lambda x: x + F.col("rep").cast("float") * F.lit(0.003)
                )
            )
            .alias("embedding"),
            "label",
        )
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(dst, "embeddings.parquet"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rep", type=int, default=10)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/scale_sf1")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--passes", type=int, default=2)
    args = ap.parse_args()

    spark = get_spark("scale-rehearsal")
    generate(spark, args.sf_dir, args.out, args.rep)
    registry = load_all()
    results = {}
    for name in args.queries.split(","):
        name = name.strip()
        if name not in registry:
            print(json.dumps({"query": name, "error": "not registered"}))
            continue
        best = None
        for _ in range(args.passes):
            spark.catalog.clearCache()
            df = registry[name].fn(spark, args.out)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = round(time.perf_counter() - t0, 2)
            best = dt if best is None else min(best, dt)
        results[name] = best
        print(json.dumps({"query": name, "best_sec": best, "rep": args.rep}))
    print(json.dumps({"metric": "scale_rehearsal_total", "rep": args.rep,
                      "value": round(sum(results.values()), 2), "unit": "sec",
                      "queries": results}))


if __name__ == "__main__":
    main()
