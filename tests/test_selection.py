"""Unit tests for the data-selection tier: SemDeDup cells, DSIR
importance weights, domain blocklist suffix semantics, and the batch
perceptron. Oracle parity for the registered queries lives in
test_oracle_parity.py; these pin the operator-level semantics on
crafted inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators import similarity as S
from hridaya_steam_market_tracker_spark.operators.classifier import batch_perceptron
from hridaya_steam_market_tracker_spark.operators.dsir import dsir_importance_weights


def test_semantic_dedup_pairs_subset_of_exact(spark):
    """Cell-partitioned pairs must be a subset of the exact tier (same
    threshold): the quantizer only PRUNES candidates, never adds."""
    from hridaya_steam_market_tracker_spark.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.i, r.j)
        for r in S.cosine_self_join(emb, threshold=0.4).select("i", "j").collect()
    }
    cellwise = {
        (r.i, r.j)
        for r in S.semantic_dedup_pairs(emb, threshold=0.4).select("i", "j").collect()
    }
    assert cellwise <= exact
    # Identical vectors always share every sign -> same cell, so true
    # duplicates are never pruned; the fixture has near-identical pairs.
    assert cellwise, "quantizer pruned every near-dup pair — cells too fine"


def test_semantic_dedup_identical_vectors_same_cell(spark):
    rows = [(1, [0.5] * 64), (2, [0.5] * 64), (3, [-0.5] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cells = {r.vec_id: r.cell for r in S.sign_cells(df).collect()}
    assert cells[1] == cells[2]
    pairs = S.semantic_dedup_pairs(df, threshold=0.99).collect()
    assert [(p.i, p.j) for p in pairs] == [(1, 2)]


def test_dsir_weights_favor_target_like_docs(spark):
    """A raw doc sharing its bigrams with the target slice must outweigh
    a raw doc with bigrams only the raw background contains."""
    target = [(i, "quantum flux capacitor alignment", "tgt") for i in range(20)]
    raw_like = [(100, "quantum flux capacitor alignment", "raw")]
    raw_unlike = [(101 + i, "mundane filler boilerplate text", "raw") for i in range(20)]
    df = spark.createDataFrame(
        target + raw_like + raw_unlike, "doc_id long, text string, source string"
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(df, target_sources=("tgt",)).collect()
    }
    assert 100 in out and 101 in out
    assert out[100].weight_micro_nats > out[101].weight_micro_nats
    assert out[100].selected and not out[101].selected


def test_blocklist_suffix_semantics(spark):
    """Registrable-suffix matching: example.org blocks cdn.example.org
    but NOT notexample.org (no partial-label match)."""
    from hridaya_steam_market_tracker_spark.queries import load_all

    # Drive through the operator shape directly on crafted domains.
    doms = spark.createDataFrame(
        [
            (1, 0, "cdn.example.org"),
            (2, 0, "notexample.org"),
            (3, 0, "example.org"),
            (4, 0, "deep.sub.ex1.example.com"),
        ],
        "doc_id long, pos int, domain string",
    )
    parts = F.split(F.col("domain"), r"\.")
    suffixes = F.expr(
        "transform(sequence(1, size(parts)), "
        "i -> array_join(slice(parts, i, size(parts) - i + 1), '.'))"
    )
    blk = spark.createDataFrame(
        [("example.org",), ("ex1.example.com",)], "suffix string"
    )
    hits = sorted(
        r.doc_id
        for r in doms.withColumn("parts", parts)
        .select("doc_id", F.explode(suffixes).alias("suffix"))
        .join(F.broadcast(blk), "suffix")
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert hits == [1, 3, 4]


def test_batch_perceptron_separates_toy_gate(spark):
    """On a linearly separable toy set the batch perceptron must reach
    zero training error within the round budget."""
    rows = [(i, 1 if i % 2 == 0 else -1, 1, 100 * (1 if i % 2 == 0 else 0), 0, 50) for i in range(40)]
    feat = spark.createDataFrame(
        rows, "doc_id long, y long, x1 long, x2 long, x3 long, x4 long"
    )
    w = batch_perceptron(feat, rounds=8)
    from hridaya_steam_market_tracker_spark.operators.classifier import (
        perceptron_scores,
    )

    scored = perceptron_scores(feat, w)
    assert scored.filter(~F.col("correct")).count() == 0
