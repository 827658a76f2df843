"""Data-selection queries: DSIR importance weighting and domain
blocklist filtering — the corpus-level "which documents make the
training set" tier, alongside the quality/dedup gates in docs.py and
curation_ext.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.dsir import dsir_importance_weights
from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')"

_TARGETS = ("src18", "src19")


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_LOWER} AS w FROM documents),
    bi AS (
      SELECT doc_id, source, g
      FROM (SELECT doc_id, source,
                   [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS gs
            FROM d WHERE len(w) >= 2) t,
      unnest(gs) AS u(g)
    ),
    b AS (
      SELECT doc_id, source,
             CAST(('0x' || substr(md5('dsir:' || g), 1, 15))::BIGINT % 256
                  AS BIGINT) AS bucket
      FROM bi
    ),
    counts AS (
      SELECT bucket,
             CAST(sum(CASE WHEN source IN ('src18', 'src19') THEN 1 ELSE 0 END)
                  AS BIGINT) AS ct,
             CAST(sum(CASE WHEN source IN ('src18', 'src19') THEN 0 ELSE 1 END)
                  AS BIGINT) AS cr
      FROM b GROUP BY bucket
    ),
    tot AS (SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
            FROM counts),
    model AS (
      SELECT bucket,
             CAST(round((ln((ct + 1) / CAST(nt + 256 AS DOUBLE))
                       - ln((cr + 1) / CAST(nr + 256 AS DOUBLE))) * 1000000.0)
                  AS BIGINT) AS lr_micro
      FROM counts CROSS JOIN tot WHERE cr > 0
    ),
    docb AS (
      SELECT doc_id, bucket, count(*) AS c FROM b
      WHERE source NOT IN ('src18', 'src19') GROUP BY 1, 2
    ),
    scored AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
             CAST(sum(c * lr_micro) AS BIGINT) AS weight_micro_nats
      FROM docb JOIN model USING (bucket) GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, weight_micro_nats,
           round(weight_micro_nats / (n_bigrams * 1000000.0), 9) AS avg_log_ratio,
           weight_micro_nats > 0 AS selected
    FROM scored
    """,
    doc=(
        "DSIR importance weighting (Xie et al. 2023): hashed-bigram "
        "bag models fit on the curated target slice (src18/19) and the "
        "raw rest, every raw document weighted by its exact micro-nat "
        "log importance ratio, selected = sign gate. Two scans + "
        "broadcast 256-bucket model join; BIGINT sums make the weight "
        "value-checkable cross-engine (operators/dsir.py)."
    ),
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dsir_importance_weights(docs, target_sources=_TARGETS, buckets=256)


_BLOCKLIST = ("example.org", "ex1.example.com", "ex3.example.com")

_BLK_SQL = ", ".join(f"('{b}')" for b in _BLOCKLIST)


@register(
    "url_blocklist_filter",
    oracle=f"""
    WITH seeded AS (
      SELECT doc_id,
             text || CASE WHEN doc_id % 3 = 0
                          THEN ' see https://ex' || CAST(doc_id % 7 AS VARCHAR)
                               || '.example.com/p/' || CAST(doc_id AS VARCHAR)
                               || ' and http://cdn.example.org/x '
                          ELSE '' END AS text
      FROM documents
    ),
    urls AS (
      SELECT doc_id, arr[g.i] AS url, g.i AS pos
      FROM (SELECT doc_id,
                   regexp_extract_all(text, 'https?://[A-Za-z0-9.-]+[^ ]*') AS arr
            FROM seeded) t,
      LATERAL (SELECT unnest(range(1, len(arr) + 1)) AS i) g
    ),
    dom AS (
      SELECT doc_id, pos,
             regexp_extract(url, 'https?://([A-Za-z0-9.-]+)', 1) AS domain
      FROM urls
    ),
    blk(b) AS (VALUES {_BLK_SQL}),
    marked AS (
      SELECT doc_id, pos,
             EXISTS (SELECT 1 FROM blk
                     WHERE dom.domain = blk.b
                        OR dom.domain LIKE '%.' || blk.b) AS hit
      FROM dom
    ),
    agg AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_urls,
             CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
      FROM marked GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_urls, 0) AS n_urls,
           coalesce(a.n_blocked, 0) AS n_blocked,
           coalesce(a.n_blocked, 0) > 0 AS blocked
    FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    doc=(
        "C4/RefinedWeb-style domain blocklist filtering with registrable-"
        "suffix semantics (blocking example.org blocks cdn.example.org): "
        "per-document URL extraction, suffix match against the broadcast "
        "blocklist, per-doc verdict. The Spark side EXPLODES each domain "
        "into its dot-suffix chain and equi-joins the blocklist — the "
        "scale-safe shape (no LIKE theta-join / nested loop); the oracle "
        "restates the same semantics with EXISTS + LIKE. Same seeded URL "
        "injection as url_domain_stats."
    ),
)
def url_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" see https://ex"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/p/"),
                    F.col("doc_id").cast("string"),
                    F.lit(" and http://cdn.example.org/x "),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    urls = seeded.select(
        "doc_id",
        F.posexplode(
            F.regexp_extract_all(F.col("text"), F.lit("https?://[A-Za-z0-9.-]+[^ ]*"), 0)
        ).alias("pos", "url"),
    )
    dom = urls.select(
        "doc_id",
        "pos",
        F.regexp_extract("url", "https?://([A-Za-z0-9.-]+)", 1).alias("domain"),
    )
    # Dot-suffix chain: a.b.c -> [a.b.c, b.c, c]; equi-join on suffix ==
    # blocked entry, then EXISTS per URL occurrence (a URL matching two
    # blocklist rows still counts once).
    parts = F.split(F.col("domain"), r"\.")
    suffixes = F.expr(
        "transform(sequence(1, size(parts)), "
        "i -> array_join(slice(parts, i, size(parts) - i + 1), '.'))"
    )
    blk = docs.sparkSession.createDataFrame([(b,) for b in _BLOCKLIST], "suffix string")
    hits = (
        dom.withColumn("parts", parts)
        .select("doc_id", "pos", F.explode(suffixes).alias("suffix"))
        .join(F.broadcast(blk), "suffix")
        .select("doc_id", "pos")
        .distinct()
    )
    agg = (
        dom.join(hits.withColumn("hit", F.lit(1)), ["doc_id", "pos"], "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).cast("long").alias("n_blocked"),
        )
    )
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_urls", F.lit(0).cast("long")).alias("n_urls"),
            F.coalesce("n_blocked", F.lit(0).cast("long")).alias("n_blocked"),
            (F.coalesce("n_blocked", F.lit(0).cast("long")) > 0).alias("blocked"),
        )
    )


_STOPLIST_SQL = (
    "['the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it', "
    "'for', 'on', 'with', 'as', 'at', 'by', 'from', 'this', 'that', 'be']"
)

_N_STOP = f"len(list_filter(w, x -> list_contains({_STOPLIST_SQL}, x)))"
_N_PUNCT = "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"

_PERCEPTRON_ROUNDS = 8


def _perceptron_oracle(rounds: int = _PERCEPTRON_ROUNDS) -> str:
    """Chained round CTEs: w0 = 0; w_{r+1} = w_r + sum of y*x over rows
    misclassified under w_r. All-integer, so bit-exact vs the Spark
    training loop (operators/classifier.py)."""
    margin = "(p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4)"
    rounds_sql = []
    for r in range(1, rounds + 1):
        terms = ", ".join(
            f"p.{wc} + CAST(coalesce(sum(CASE WHEN f.y * {margin} <= 0 "
            f"THEN f.y * f.{xc} END), 0) AS BIGINT) AS {wc}"
            for wc, xc in zip("abcd", ("x1", "x2", "x3", "x4"))
        )
        rounds_sql.append(
            f"w{r} AS (SELECT {terms} FROM feat f CROSS JOIN w{r-1} p "
            f"GROUP BY p.a, p.b, p.c, p.d)"
        )
    chain = ",\n    ".join(rounds_sql)
    return f"""
    WITH d AS (
      SELECT doc_id, text, {_TOKS_LOWER} AS w FROM documents
      WHERE length(text) > 0
    ),
    feat AS (
      SELECT doc_id,
             CAST(CASE WHEN round(
                 CASE WHEN len(w) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END * 0.4
               + CASE WHEN CAST({_N_STOP} AS DOUBLE) / len(w) >= 0.05
                      THEN 1.0 ELSE 0.5 END * 0.4
               + CASE WHEN CAST({_N_PUNCT} AS DOUBLE) / length(text) <= 0.2
                      THEN 1.0 ELSE 0.4 END * 0.2, 6) >= 0.7
                  THEN 1 ELSE -1 END AS BIGINT) AS y,
             CAST(1 AS BIGINT) AS x1,
             CAST(({_N_STOP} * 1000) // len(w) AS BIGINT) AS x2,
             CAST(({_N_PUNCT} * 1000) // length(text) AS BIGINT) AS x3,
             CAST(least(len(w), 1000) AS BIGINT) AS x4
      FROM d WHERE len(w) > 0
    ),
    w0 AS (SELECT CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
                  CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS d),
    {chain}
    SELECT f.doc_id, f.y,
           CAST(p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4 AS BIGINT)
             AS margin,
           (p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4) > 0 AS predicted,
           ((p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4) > 0) = (f.y = 1)
             AS correct
    FROM feat f CROSS JOIN w{rounds} p
    """


@register(
    "perceptron_quality_scores",
    oracle=_perceptron_oracle(),
    doc=(
        "Corpus-trained linear quality classifier (CCNet/GPT-3 distill-"
        "the-gate recipe) as an 8-round BATCH PERCEPTRON: integer "
        "per-mille features, labels from the engine's composite quality "
        "gate, weight updates as one aggregation per round with the "
        "weights broadcast back as a one-row frame. All-integer training "
        "makes the full trajectory bit-exact vs the chained round-CTE "
        "oracle (operators/classifier.py)."
    ),
)
def perceptron_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.operators.classifier import (
        batch_perceptron,
        doc_features,
        perceptron_scores,
    )

    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    feat = doc_features(docs)
    weights = batch_perceptron(feat, rounds=_PERCEPTRON_ROUNDS)
    return perceptron_scores(feat, weights)


def _per_source_perceptron_oracle(rounds: int = _PERCEPTRON_ROUNDS) -> str:
    """GROUPED round CTEs: one independent weight vector per source,
    all trained in the same chained aggregation — the model-parallel
    variant of _perceptron_oracle."""
    margin = "(p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4)"
    rounds_sql = []
    for r in range(1, rounds + 1):
        terms = ", ".join(
            f"p.{wc} + CAST(coalesce(sum(CASE WHEN f.y * {margin} <= 0 "
            f"THEN f.y * f.{xc} END), 0) AS BIGINT) AS {wc}"
            for wc, xc in zip("abcd", ("x1", "x2", "x3", "x4"))
        )
        rounds_sql.append(
            f"w{r} AS (SELECT p.source, {terms} "
            f"FROM w{r-1} p LEFT JOIN feat f USING (source) "
            f"GROUP BY p.source, p.a, p.b, p.c, p.d)"
        )
    chain = ",\n    ".join(rounds_sql)
    return f"""
    WITH d AS (
      SELECT doc_id, source, text, {_TOKS_LOWER} AS w FROM documents
      WHERE length(text) > 0
    ),
    feat AS (
      SELECT doc_id, source,
             CAST(CASE WHEN round(
                 CASE WHEN len(w) BETWEEN 10 AND 1000 THEN 1.0 ELSE 0.3 END * 0.4
               + CASE WHEN CAST({_N_STOP} AS DOUBLE) / len(w) >= 0.05
                      THEN 1.0 ELSE 0.5 END * 0.4
               + CASE WHEN CAST({_N_PUNCT} AS DOUBLE) / length(text) <= 0.2
                      THEN 1.0 ELSE 0.4 END * 0.2, 6) >= 0.7
                  THEN 1 ELSE -1 END AS BIGINT) AS y,
             CAST(1 AS BIGINT) AS x1,
             CAST(({_N_STOP} * 1000) // len(w) AS BIGINT) AS x2,
             CAST(({_N_PUNCT} * 1000) // length(text) AS BIGINT) AS x3,
             CAST(least(len(w), 1000) AS BIGINT) AS x4
      FROM d WHERE len(w) > 0
    ),
    w0 AS (SELECT DISTINCT source, CAST(0 AS BIGINT) AS a, CAST(0 AS BIGINT) AS b,
                  CAST(0 AS BIGINT) AS c, CAST(0 AS BIGINT) AS d FROM feat),
    {chain}
    SELECT p.source, p.a AS w_bias, p.b AS w_stop_permille,
           p.c AS w_punct_permille, p.d AS w_len,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN ((p.a * f.x1 + p.b * f.x2 + p.c * f.x3 + p.d * f.x4) > 0)
                              = (f.y = 1) THEN 1 ELSE 0 END) AS BIGINT) AS n_correct
    FROM w{rounds} p JOIN feat f USING (source)
    GROUP BY 1, 2, 3, 4, 5
    """


@register(
    "perceptron_per_source_models",
    oracle=_per_source_perceptron_oracle(),
    doc=(
        "MODEL-PARALLEL training: one independent batch perceptron PER "
        "SOURCE (20 models), all trained simultaneously — each round is "
        "a single source-keyed aggregation with the per-source weight "
        "rows joined back, so training 20 models costs the same plan "
        "shape as training one. The Spark-native answer to per-domain "
        "quality classifiers (thousands of models = same two exchanges "
        "per round); all-integer, bit-exact vs grouped round CTEs. "
        "Output: final weights + training accuracy per source."
    ),
)
def perceptron_per_source_models(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hridaya_steam_market_tracker_spark.operators.classifier import (
        FEATURES,
        WEIGHTS,
        _margin,
        doc_features,
    )

    docs = table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    feat = (
        doc_features(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .localCheckpoint(eager=True)
    )
    w = (
        feat.select("source")
        .distinct()
        .select("source", *[F.lit(0).cast("long").alias(c) for c in WEIGHTS])
        .localCheckpoint(eager=True)
    )
    for _ in range(_PERCEPTRON_ROUNDS):
        miss = (F.col("y") * _margin()) <= 0
        delta = (
            feat.join(F.broadcast(w), "source")
            .groupBy("source")
            .agg(
                *[
                    F.coalesce(F.sum(F.when(miss, F.col("y") * F.col(xc))), F.lit(0))
                    .cast("long")
                    .alias("d" + wc)
                    for wc, xc in zip(WEIGHTS, FEATURES)
                ]
            )
        )
        w = (
            w.join(delta, "source", "left")
            .select(
                "source",
                *[
                    (F.col(wc) + F.coalesce(F.col("d" + wc), F.lit(0)))
                    .cast("long")
                    .alias(wc)
                    for wc in WEIGHTS
                ],
            )
            .localCheckpoint(eager=True)
        )
    scored = feat.join(F.broadcast(w), "source").select(
        "source",
        *WEIGHTS,
        ((_margin() > 0) == (F.col("y") == 1)).cast("int").alias("ok"),
    )
    return scored.groupBy("source", *WEIGHTS).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("ok").cast("long").alias("n_correct"),
    ).select(
        "source",
        F.col("a").alias("w_bias"),
        F.col("b").alias("w_stop_permille"),
        F.col("c").alias("w_punct_permille"),
        F.col("d").alias("w_len"),
        "n_docs",
        "n_correct",
    )
