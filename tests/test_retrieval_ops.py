"""Semantic tests for the round-4 retrieval/selection additions beyond
oracle parity: MMR actually diversifies, hashed embeddings behave like
embeddings, the Bloom filter is sound on crafted keys.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_mmr_prefers_diverse_over_redundant(spark):
    """Two near-identical top candidates + one distinct: plain top-2
    takes the twins; MMR's second pick must be the distinct vector."""
    # c1/c2 are exact twins at sim 0.9 to the query; c3 sits at sim
    # 0.85 but shares only the query direction with the twins
    # (cos(c1,c3) = 0.9*0.85 = 0.765). MMR round 2: twin scores
    # 0.7*0.9 - 0.3*1.0 = 0.33 < 0.7*0.85 - 0.3*0.765 = 0.3655.
    q = [1.0] + [0.0] * 63
    c1 = [0.9, (1 - 0.81) ** 0.5] + [0.0] * 62
    c3 = [0.85, 0.0, (1 - 0.7225) ** 0.5] + [0.0] * 61
    rows = [(0, q), (1, c1), (2, c1), (3, c3)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    # Reuse the registered query's machinery on a crafted frame: top-3
    # pool, pick 2, lambda 0.7.
    from hridaya_steam_market_tracker_spark.operators import similarity as S
    from pyspark.sql import Window

    queries = emb.filter(F.col("vec_id") == 0)
    cands = S.cosine_topk(emb, queries, k=3).select(
        "query_id", F.col("vec_id").alias("cand_id"), F.col("cos_sim").alias("simq")
    )
    vecs = emb.select(F.col("vec_id").alias("cand_id"), "embedding")
    cv = cands.join(vecs, "cand_id")
    a = cv.select("query_id", F.col("cand_id").alias("a"), F.col("embedding").alias("va"))
    b = cv.select("query_id", F.col("cand_id").alias("b"), F.col("embedding").alias("vb"))
    psim = (
        a.join(b, "query_id")
        .filter(F.col("a") != F.col("b"))
        .select("query_id", "a", "b", F.round(S.cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
    )
    w = Window.partitionBy("query_id")
    first = (
        cands.withColumn(
            "rn", F.row_number().over(w.orderBy(F.col("simq").desc(), F.col("cand_id")))
        )
        .filter("rn = 1")
        .select("query_id", "cand_id")
    )
    assert first.collect()[0].cand_id == 1
    maxs = (
        psim.join(first.select("query_id", F.col("cand_id").alias("b")), ["query_id", "b"])
        .groupBy("query_id", F.col("a").alias("cand_id"))
        .agg(F.max("sim").alias("maxs"))
    )
    score = F.lit(0.7) * F.col("simq") - F.lit(0.3) * F.coalesce("maxs", F.lit(0.0))
    second = (
        cands.join(first.withColumnRenamed("cand_id", "picked"), "query_id")
        .filter(F.col("cand_id") != F.col("picked"))
        .join(maxs, ["query_id", "cand_id"], "left")
        .withColumn("rn", F.row_number().over(w.orderBy(score.desc(), F.col("cand_id"))))
        .filter("rn = 1")
        .collect()[0]
    )
    # Greedy relevance-only would take the twin (2); MMR must take 3.
    assert second.cand_id == 3


def test_hashed_embeddings_invariants(spark):
    """Identical texts embed identically (cosine 1); token order does
    not matter (bag model); unit norm."""
    from hridaya_steam_market_tracker_spark.queries.docs import (
        _hashed_doc_embeddings,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta gamma"),
            (3, "gamma beta alpha"),
            (4, "totally different words here"),
        ],
        "doc_id long, text string",
    )
    emb = {r.doc_id: r.embedding for r in _hashed_doc_embeddings(docs).collect()}
    assert emb[1] == emb[2] == emb[3]
    assert emb[1] != emb[4]
    norm = sum(v * v for v in emb[4]) ** 0.5
    assert abs(norm - 1.0) < 1e-4  # rounded components, near-unit norm


def test_bloom_filter_no_false_negatives(spark, sf_dir):
    """Every key that went into the filter must probe positive."""
    from hridaya_steam_market_tracker_spark.queries import load_all

    reg = load_all()
    df = reg["bloom_filter_probe"].fn(spark, sf_dir)
    assert df.filter(F.col("present") & ~F.col("bloom_positive")).count() == 0


def test_textrank_hub_word_wins(spark, monkeypatch):
    """A word that co-occurs with every other word must out-rank the
    periphery after the PageRank rounds."""
    from hridaya_steam_market_tracker_spark.queries import load_all
    import hridaya_steam_market_tracker_spark.queries.curation_ext as C
    from hridaya_steam_market_tracker_spark import tables as T

    text = "central alpha central beta central gamma central delta central epsilon"
    crafted = spark.createDataFrame(
        [(1, text, "en", "src0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    monkeypatch.setattr(
        C, "table", lambda _spark, _sf, name: crafted
    )
    out = C.textrank_keywords(spark, "unused").collect()
    top = next(r for r in out if r["rank"] == 1)
    assert top["token"] == "central"


def test_per_source_perceptron_models_independent(spark):
    """Sources with opposite label geometry must learn different
    weights, and each source's model must separate its own docs."""
    from hridaya_steam_market_tracker_spark.queries import load_all

    reg = load_all()
    df = reg["perceptron_per_source_models"].fn(spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert len(rows) == 20
    for r in rows:
        assert r["n_correct"] == r["n_docs"], f"{r['source']} not separated"
    # weights are per-source, not one global vector
    assert len({(r["w_bias"], r["w_stop_permille"], r["w_punct_permille"], r["w_len"]) for r in rows}) > 1


def test_apss_strategies_produce_identical_output(spark):
    """The cost-adaptive APSS claim is that the posting prefix-filter
    path and the tiled exact block join return the SAME pair set with
    the same similarities — the probe only picks the cheaper physical
    shape. Force both strategies on the same corpus and require exact
    equality (and that auto matches too)."""
    from hridaya_steam_market_tracker_spark.operators.retrieval import (
        apss_cosine_pairs,
    )
    from hridaya_steam_market_tracker_spark.tables import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")

    def rows(strategy):
        return sorted(
            (r["i"], r["j"], r["cos_sim"])
            for r in apss_cosine_pairs(docs, threshold=0.9, strategy=strategy).collect()
        )

    posting, tiled, auto = rows("posting"), rows("tiled"), rows("auto")
    assert posting == tiled == auto
    assert len(posting) > 0


def test_rrf_fuse_semantics(spark):
    """RRF's contract at the edges: an arm that missed a doc
    contributes exactly 0 (not a NULL-poisoned score); two docs ranked
    identically by different single arms tie exactly and break by
    doc_id; a doc ranked by both arms outranks equal single-arm docs;
    topn truncates after the tie-break."""
    from hridaya_steam_market_tracker_spark.operators.retrieval import rrf_fuse

    lex = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "doc_id long, rank int"
    )
    vec = spark.createDataFrame(
        [(1, 2), (4, 1), (5, 3)], "doc_id long, rank int"
    )
    out = {r["doc_id"]: r for r in rrf_fuse({"lex": lex, "vec": vec}).collect()}
    # doc 1: both arms -> 1/61 + 1/62; doc 4: vec rank 1 only -> 1/61
    assert out[1]["rrf_score"] == round(1 / 61 + 1 / 62, 9)
    assert out[4]["rrf_score"] == round(1 / 61, 9)
    assert out[1]["rank_hybrid"] == 1
    # doc 2 (lex rank 2) and nothing else share 1/62; docs 3 and 5
    # share 1/63 exactly (single-arm rank-3 each) -> doc_id tie-break
    assert out[3]["rrf_score"] == out[5]["rrf_score"] == round(1 / 63, 9)
    assert out[3]["rank_hybrid"] < out[5]["rank_hybrid"]
    # arm-miss is NULL in the carried rank, zero in the score
    assert out[4]["rank_lex"] is None and out[4]["rank_vec"] == 1
    # topn truncation
    assert len(rrf_fuse({"lex": lex, "vec": vec}, topn=2).collect()) == 2
    # an empty arm dict is a caller bug -> loud ValueError, not an
    # opaque AttributeError on a None plan
    with pytest.raises(ValueError, match="at least one ranked arm"):
        rrf_fuse({})
