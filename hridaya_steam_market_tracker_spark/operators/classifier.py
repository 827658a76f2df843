"""Corpus-trained quality classifier — the CCNet/GPT-3 "train a cheap
linear classifier to approximate an expensive curation signal" step
(Brown et al. 2020 §A train logistic regression on curated-vs-raw;
fastText quality filters in the open reproductions), as a BATCH
PERCEPTRON trained entirely in Spark aggregations.

Why a perceptron and not logistic regression: the training loop must
be value-checkable by a SQL oracle, and the batch perceptron is pure
INTEGER arithmetic end to end — integer features, integer weights,
margin = BIGINT dot product, update = integer sum over misclassified
rows — so every round's weight vector is bit-exact in any engine.
Logistic regression's sigmoid/float-gradient feedback loop is the same
cross-engine impossibility as Lloyd k-means (see COVERAGE on IVF).

Batch (not online) updates keep it order-free and distributed:

    w_{r+1} = w_r + sum over {i : y_i * (w_r . x_i) <= 0} of y_i * x_i

Each round is ONE aggregation over the feature table with the current
weights joined in as a broadcast one-row frame (the repo's scalar
pattern — no driver-side collect of data). Features materialize once
(stage_checkpoint — the session checkpoint policy, checkpoints.py),
so the corpus is scanned once, not once per round.

Labels here are the engine's own composite quality gate (>= 0.7, the
pipeline's established threshold); features are integerized per-mille
ratios, so the exercise is the real one: distill the multi-rule gate
into a single linear scorer you can evaluate in the scan stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.checkpoints import stage_checkpoint

from hridaya_steam_market_tracker_spark.operators.text import (
    EN_STOPWORDS,
    quality_score,
    tokens,
)

FEATURES = ("x1", "x2", "x3", "x4")
WEIGHTS = ("a", "b", "c", "d")


def doc_features(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, y, x1..x4): label = sign of the composite quality gate,
    integer features = [bias, stopword per-mille, punct per-mille,
    capped token count]. All-integer so training is exactly
    reproducible; per-mille integer division matches SQL `//`."""
    t = F.col(text_col)
    toksl = tokens(F.lower(t))
    n_tok = F.size(toksl).cast("long")
    n_stop = F.size(F.filter(toksl, lambda x: x.isin(EN_STOPWORDS))).cast("long")
    n_punct = F.length(F.regexp_replace(t, "[A-Za-z0-9\\s]", "")).cast("long")
    n_chars = F.length(t).cast("long")
    return (
        docs.select(
            id_col,
            F.when(quality_score(t) >= 0.7, 1).otherwise(-1).cast("long").alias("y"),
            F.lit(1).cast("long").alias("x1"),
            (n_stop * 1000).alias("__s"),
            (n_punct * 1000).alias("__p"),
            n_tok.alias("__n"),
            n_chars.alias("__c"),
        )
        .filter((F.col("__n") > 0) & (F.col("__c") > 0))
        .select(
            id_col,
            "y",
            "x1",
            F.expr("__s div __n").alias("x2"),
            F.expr("__p div __c").alias("x3"),
            F.least(F.col("__n"), F.lit(1000).cast("long")).alias("x4"),
        )
    )


def _margin(w_prefix: str = "") -> F.Column:
    m = F.lit(0).cast("long")
    for wc, xc in zip(WEIGHTS, FEATURES):
        m = m + F.col(w_prefix + wc) * F.col(xc)
    return m


def batch_perceptron(feat: DataFrame, rounds: int = 8) -> DataFrame:
    """Train; returns the final one-row weight frame (a, b, c, d)."""
    spark = feat.sparkSession
    feat = feat.transform(stage_checkpoint)
    w = spark.createDataFrame(
        [(0, 0, 0, 0)], ", ".join(f"{c} bigint" for c in WEIGHTS)
    )
    for _ in range(rounds):
        miss = (F.col("y") * _margin()) <= 0
        delta = feat.crossJoin(F.broadcast(w)).agg(
            *[
                F.coalesce(
                    F.sum(F.when(miss, F.col("y") * F.col(xc))), F.lit(0)
                )
                .cast("long")
                .alias("d" + wc)
                for wc, xc in zip(WEIGHTS, FEATURES)
            ]
        )
        w = (
            w.crossJoin(delta)
            .select(
                *[
                    (F.col(wc) + F.col("d" + wc)).cast("long").alias(wc)
                    for wc in WEIGHTS
                ]
            )
            .transform(stage_checkpoint)
        )
    return w


def perceptron_scores(feat: DataFrame, weights: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Score the corpus under trained weights: (doc_id, y, margin,
    predicted, correct). Evaluation is scan-stage map work — the point
    of distilling the gate into a linear scorer."""
    m = _margin()
    return feat.crossJoin(F.broadcast(weights)).select(
        id_col,
        "y",
        m.cast("long").alias("margin"),
        (m > 0).alias("predicted"),
        ((m > 0) == (F.col("y") == 1)).alias("correct"),
    )
