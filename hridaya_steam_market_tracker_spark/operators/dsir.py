"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169) as native Spark aggregations.

The published recipe: fit bag-of-hashed-n-gram unigram models on a
small curated TARGET corpus and on the RAW corpus, weight every raw
document by its log importance ratio

    log w(doc) = sum over hashed n-gram features g of
                 count_g(doc) * (log p_target[g] - log p_raw[g])

and resample the raw corpus proportionally to w. Here the features are
hashed BIGRAMS (the paper's strongest single feature set), the hash is
the portable 60-bit md5 prefix the engine already uses for split
assignment, and both models are add-one smoothed over B buckets.

Spark shape (all built-in expressions, no Python in the data path):
one explode to bigram rows, two bucket-count aggregations (target and
raw sides of the same groupBy), the B-bucket log-ratio table joined
back BROADCAST (B is tiny vs the corpus), one doc-keyed sum. At 100 TB
the corpus is touched twice (model fit + scoring) with no self-join —
the same scan budget as the CCNet perplexity filter.

Cross-engine determinism: the log-ratio per bucket is integerized to
micro-nats (round(ln * 1e6) -> BIGINT) BEFORE the per-doc sum, exactly
like operators/lm.py — BIGINT sums are immune to float summation
order, and the pre-round doubles are ln() of ratios of exact integer
counts, bit-identical in both engines.

Selection: the paper Gumbel-top-k samples; the deterministic
equivalent exposed here is the sign gate (weight > 0 iff the document
looks more like the target than the raw background), which needs no
global sort and no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1000000.0


def _bigram_rows(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, source, gram) rows: adjacent lowercase-token pairs."""
    toks = F.filter(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != "")
    pairs = F.expr(
        "transform(sequence(1, size(toks) - 1), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"
    )
    return (
        docs.select(id_col, "source", toks.alias("toks"))
        .filter(F.size("toks") >= 2)
        .select(id_col, "source", F.explode(pairs).alias("gram"))
    )


def _bucket(gram) -> F.Column:
    """Portable 60-bit md5 bucket (same family as hash_split/packing)."""
    return F.conv(F.substring(F.md5(F.concat(F.lit("dsir:"), gram)), 1, 15), 16, 10).cast(
        "long"
    )


def dsir_importance_weights(
    docs: DataFrame,
    target_sources: tuple[str, ...],
    buckets: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every NON-target document by its DSIR importance weight.

    Output: (doc_id, n_bigrams, weight_micro_nats, avg_log_ratio,
    selected) — weight is the exact BIGINT micro-nat sum; selected is
    the deterministic sign gate.
    """
    from hridaya_steam_market_tracker_spark.operators.similarity import (
        _widen_small_scan,
    )

    # _widen_small_scan: the md5-heavy explode now runs exactly once
    # (see below), so on a single-file fixture scan it would serialize
    # onto one task; the conditional ROUND-ROBIN widen parallelizes the
    # map stage ahead of the shared exchange and is a no-op at real
    # scale (round-robin, not doc-keyed, deliberately: a doc_id-keyed
    # spread would satisfy the (doc, bucket) clustering and move the
    # shared-subtree boundary BELOW the explode, making every consumer
    # re-run it).
    # The explicit isNotNull is a no-op on the data (md5 of a non-null
    # gram) but makes every consumer branch's subtree canonically
    # IDENTICAL: the two join branches get `isnotnull(bucket)` inferred
    # from their equi-join key while the totals branch would not,
    # which is enough of a difference to defeat exchange reuse and
    # re-run the whole explode for totals.
    bi = _bigram_rows(_widen_small_scan(docs), text_col, id_col).withColumn(
        "bucket", _bucket(F.col("gram")) % buckets
    ).filter(F.col("bucket").isNotNull())
    is_target = F.col("source").isin(*target_sources)
    # ONE pass over the bigram explode (round-13 optimization): both the
    # bucket model and the per-doc scoring counts derive from the same
    # (doc, bucket) aggregation, so the two consumers share an identical
    # first exchange and Spark's exchange reuse computes the md5-heavy
    # bigram explode ONCE instead of three times (model, totals and
    # scoring each re-ran the full scan in the old shape). The target
    # flag is deliberately an AGGREGATE RESULT (max over the per-doc
    # constant), not a grouping key: a plain `source` column filter
    # would be pushed below the aggregation into the scoring branch's
    # scan, making the two subtrees differ and defeating exchange
    # reuse. Bucket counts are exact sums of the per-doc c's.
    docb_all = bi.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("c"),
        F.max(is_target.cast("int")).alias("__t"),
    )
    tflag = F.col("__t") == 1
    counts = docb_all.groupBy("bucket").agg(
        F.sum(F.when(tflag, F.col("c")).otherwise(0)).cast("long").alias("ct"),
        F.sum(F.when(tflag, 0).otherwise(F.col("c"))).cast("long").alias("cr"),
    )
    # totals over docb_all, NOT over counts: a totals branch re-deriving
    # counts' lineage planned as its own (non-reused) subtree and re-ran
    # the explode a second time; as a direct third consumer of the same
    # (doc, bucket) aggregation it rides the one reused exchange.
    totals = docb_all.agg(
        F.sum(F.when(tflag, F.col("c")).otherwise(0)).cast("long").alias("nt"),
        F.sum(F.when(tflag, 0).otherwise(F.col("c"))).cast("long").alias("nr"),
    )
    lr_micro = F.round(
        (
            F.log((F.col("ct") + 1).cast("double") / (F.col("nt") + buckets).cast("double"))
            - F.log((F.col("cr") + 1).cast("double") / (F.col("nr") + buckets).cast("double"))
        )
        * F.lit(MICRO),
        0,
    ).cast("long")
    model = (
        counts.filter(F.col("cr") > 0)  # raw-side buckets are the scoring domain
        .crossJoin(F.broadcast(totals))
        .select("bucket", lr_micro.alias("lr_micro"))
    )
    docb = docb_all.filter(~tflag).select(id_col, "bucket", "c")
    scored = (
        docb.join(F.broadcast(model), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("lr_micro")).cast("long").alias("weight_micro_nats"),
        )
    )
    avg = F.col("weight_micro_nats").cast("double") / (
        F.col("n_bigrams").cast("double") * F.lit(MICRO)
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "weight_micro_nats",
        F.round(avg, 9).alias("avg_log_ratio"),
        (F.col("weight_micro_nats") > 0).alias("selected"),
    )
