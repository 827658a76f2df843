"""Similarity-search queries over the `embeddings` fixture.

Brute-force cosine top-k is the exact baseline (oracle-checked); the
LSH-bucketed variant is the approximate scale path (rows-only check +
recall test in tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators import similarity as S
from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

# cosine on DOUBLE[] in DuckDB — same formula/accumulation as the Spark
# fold in operators/similarity.py.
_COS = (
    "list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[]))"
    " / sqrt(list_inner_product(CAST(a.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[]))"
    " * list_inner_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))"
)


@register(
    "ann_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, a.vec_id AS vec_id,
             round({_COS}, 6) AS cos_sim
      FROM embeddings a
      JOIN embeddings q ON q.vec_id < 10 AND a.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """,
    doc=(
        "Brute-force cosine top-5 per query vector (queries = vec_id < 10, broadcast) — "
        "the exact ANN baseline; ranking on the rounded score so both engines order "
        "identically."
    ),
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.cosine_topk(emb, queries, k=5)
    return out.select("query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank"))


# The LSH hyperplanes come from a seeded LCG (operators/similarity.py:
# hyperplanes) — pure integer arithmetic plus one int->double division,
# both exactly reproducible in DuckDB (HUGEINT for the 126-bit product,
# CAST AS DOUBLE for the same round-to-nearest). The prototype check in
# round 3 confirmed all 8x4x64 plane components bit-identical, so the
# WHOLE approximate pipeline (buckets -> candidate join -> rerank) has a
# value oracle, not just a recall bound.
_LSH_ORACLE = f"""
    WITH RECURSIVE lcg AS (
      SELECT t, 0 AS step, CAST(7 + 97 * t AS HUGEINT) AS state
      FROM generate_series(0, 7) AS g(t)
      UNION ALL
      SELECT t, step + 1,
             (state * 6364136223846793005 + 1442695040888963407) % 9223372036854775808
      FROM lcg WHERE step < 256
    ),
    plane_vals AS (
      SELECT t, (step-1) // 64 AS p, (step-1) % 64 AS d,
             CAST(state AS DOUBLE) / 9223372036854775808.0 * 2.0 - 1.0 AS v
      FROM lcg WHERE step >= 1
    ),
    planes AS (
      SELECT t, p, list(v ORDER BY d) AS plane FROM plane_vals GROUP BY t, p
    ),
    emb_buckets AS (
      SELECT e.vec_id, pl.t,
             CAST(sum(CASE WHEN list_inner_product(CAST(e.embedding AS DOUBLE[]), pl.plane) > 0
                           THEN (CAST(1 AS BIGINT) << pl.p) ELSE CAST(0 AS BIGINT) END)
                  AS BIGINT) AS bucket
      FROM embeddings e CROSS JOIN planes pl
      GROUP BY e.vec_id, pl.t
    ),
    cands AS (
      SELECT DISTINCT qb.vec_id AS query_id, eb.vec_id AS vec_id
      FROM emb_buckets eb
      JOIN (SELECT * FROM emb_buckets WHERE vec_id < 10) qb
        ON eb.t = qb.t AND eb.bucket = qb.bucket
      WHERE eb.vec_id <> qb.vec_id
    ),
    scored AS (
      SELECT c.query_id, c.vec_id, round({_COS}, 6) AS cos_sim
      FROM cands c
      JOIN embeddings a ON a.vec_id = c.vec_id
      JOIN embeddings q ON q.vec_id = c.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, vec_id ASC) AS rank
      FROM scored
    )
    SELECT query_id, vec_id, cos_sim, CAST(rank AS INTEGER) AS rank
    FROM ranked WHERE rank <= 5
    """


@register(
    "ann_lsh_topk",
    oracle=_LSH_ORACLE,
    doc=(
        "Multi-table LSH approximate top-5 (8 tables x 4 hyperplanes; bucket equi-join "
        "replaces the cross join). Deterministic end-to-end: the seeded-LCG hyperplanes "
        "are replicated bit-exactly in the DuckDB oracle (HUGEINT LCG + same double "
        "rounding), so the driver value-checks the full approximate pipeline. Recall "
        ">= 0.6 vs the exact baseline is additionally asserted in tests."
    ),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = S.lsh_topk(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", "cos_sim", F.col("rank").cast("int").alias("rank")
    )


@register(
    "ann_ivf_topk",
    oracle=None,  # approximate: recall vs brute force pinned in tests
    doc=(
        "IVF approximate top-5: kmeans-lite coarse quantizer (16 cells, 3 Lloyd "
        "rounds, deterministic seeding), n_probe=4 — candidates come from a cell "
        "equi-join, reading n_probe/n_cells of the corpus at scale. Rows-only driver "
        "check; recall asserted in tests/test_scale_operators.py."
    ),
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.ivf_topk(emb, queries, k=5, n_cells=16, n_probe=4)


@register(
    "embedding_label_centroids",
    oracle="""
    WITH expl AS (
      SELECT label, i AS pos, embedding[i]::DOUBLE AS x
      FROM embeddings, generate_series(1, 64) AS g(i)
    ),
    means AS (
      SELECT label, pos, avg(x) AS mean_x FROM expl GROUP BY label, pos
    )
    SELECT label,
           round(sqrt(sum(mean_x * mean_x)), 6) AS centroid_norm,
           CAST((SELECT count(*) FROM embeddings e WHERE e.label = means.label) AS BIGINT) AS n_members
    FROM means GROUP BY label
    """,
    doc=(
        "Per-label centroid (IVF coarse-quantizer building block): element-wise mean via "
        "posexplode + two-level groupBy; emitted as the centroid L2 norm for "
        "cross-engine hashing."
    ),
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    centroids = S.label_centroids(emb)
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_members"))
    norm = F.sqrt(
        F.aggregate(
            F.col("centroid"), F.lit(0.0), lambda acc, x: acc + x * x
        )
    )
    return (
        centroids.join(counts, "label")
        .select("label", F.round(norm, 6).alias("centroid_norm"), "n_members")
    )


@register(
    "ann_pq_topk",
    oracle=None,
    doc=(
        "Product-quantization ADC top-5 (Jégou et al. 2011): 16 subspaces "
        "x 64 codes, per-query distance tables broadcast, corpus scanned "
        "as codes only and scored by table-lookup sums — the compressed "
        "ANN path (no per-pair FLOPs). Approximate: recall-bounded in "
        "tests against the exact L2 brute force, no value oracle."
    ),
)
def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return S.pq_topk(emb, queries, k=5, m=16, ksub=64, dim=64)
