"""Corpus-trained n-gram language-model scoring — the CCNet-style
perplexity quality filter (Wenzek et al. 2020 train an LM and keep the
low-perplexity tail; the public recipe's Spark-native shape).

Add-one-smoothed bigram model trained on the corpus itself in two
aggregations (unigram counts, bigram counts), then each document is
scored by the sum of its bigram log-probabilities. The model tables
join back broadcast (vocabulary-sized, tiny vs the corpus), so scoring
is one map-side join pass — no per-doc Python, no iteration.

Cross-engine determinism: every log-probability is integerized to
micro-nats (CAST(round(ln(p) * 1e6) AS BIGINT)) BEFORE the per-doc
sum, the same trick the PQ-ADC scorer uses — BIGINT sums are immune to
float summation order, so the score is value-checkable by a SQL
oracle. ln(p) itself is computed from exact integer counts in both
engines, so the pre-round doubles are bit-identical.

BOS padding: each document contributes bigrams over ('<s>', w1, ...,
wn) — n bigrams for n tokens, so every token is conditioned once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _doc_tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != ""
    )
    return docs.select(F.col(id_col), toks.alias("toks")).filter(
        F.size("toks") > 0
    )


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc_id, w1, w2) rows: BOS-padded adjacent pairs.

    The padded array is bind1-bound (round 13): as a ``withColumn``
    helper it was substituted by CollapseProject into the pair lambda,
    re-running the BOS concat (an O(len) array copy) twice per
    position — O(len²) per document. Bound, it is built once per row."""
    from hridaya_steam_market_tracker_spark.operators.text import bind1

    return (
        _doc_tokens(docs, text_col, id_col)
        .select(
            F.col(id_col),
            F.explode(
                bind1(
                    F.concat(F.array(F.lit(BOS)), F.col("toks")),
                    lambda padded: F.transform(
                        F.sequence(F.lit(0), F.size(padded) - 2),
                        lambda i: F.struct(
                            F.element_at(padded, i + 1).alias("w1"),
                            F.element_at(padded, i + 2).alias("w2"),
                        ),
                    ),
                )
            ).alias("p"),
        )
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    )


def bigram_lm_doc_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document LM score under the corpus-trained add-one bigram
    model: p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V), V = distinct
    unigram types including BOS.

    Output: (doc_id, n_bigrams, score_micro_nats, avg_logprob,
    perplexity) — score is the exact BIGINT micro-nat sum; the float
    columns derive from it (identical IEEE ops both engines)."""
    bi = _doc_bigrams(docs, text_col, id_col)
    # Round 13: the unigram table and the vocabulary size derive from
    # the ALREADY-REDUCED bigram counts — c1(w1) == sum of c12 over w2,
    # and the vocabulary is exactly bc's distinct key values — instead
    # of re-aggregating the corpus-sized bigram explode two more times
    # (three scans of it for the vocab union). The explicit isnotnull
    # filter is a semantic no-op (w1/w2 come from concat/element_at
    # over non-null arrays) that keeps every consumer's subtree
    # canonically identical after the scoring join's inferred-notnull
    # pushdown, so the one (w1, w2) exchange is reused (the DSIR
    # exchange-reuse lesson from this round).
    big_counts = (
        bi.filter(F.col("w1").isNotNull() & F.col("w2").isNotNull())
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c12"))
    )
    uni_counts = big_counts.groupBy("w1").agg(
        F.sum("c12").cast("long").alias("c1")
    )
    vocab = (
        big_counts.select(F.col("w1").alias("w"))
        .union(big_counts.select(F.col("w2").alias("w")))
        .distinct()
        .agg(F.count(F.lit(1)).cast("long").alias("v"))
    )

    logp_micro = F.round(
        F.log(
            (F.col("c12") + 1).cast("double")
            / (F.col("c1") + F.col("v")).cast("double")
        )
        * F.lit(1000000.0),
        0,
    ).cast("long")

    scored = (
        bi.join(big_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(logp_micro).cast("long").alias("score_micro_nats"),
        )
    )
    avg = F.col("score_micro_nats").cast("double") / (
        F.col("n_bigrams").cast("double") * 1000000.0
    )
    return scored.select(
        id_col,
        "n_bigrams",
        "score_micro_nats",
        F.round(avg, 9).alias("avg_logprob"),
        F.round(F.exp(-avg), 6).alias("perplexity"),
    )
