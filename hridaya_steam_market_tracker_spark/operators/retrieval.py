"""Text retrieval scoring: BM25 over the document corpus.

The Okapi BM25 ranking function (public Robertson/Spärck Jones family,
Lucene's variant: idf = ln(1 + (N - df + 0.5)/(df + 0.5))), expressed
as a declarative plan a cluster can run over any corpus size:

* The exploded term stream filters to the QUERY terms first — the
  inverted-index pushdown: the (doc, term) aggregate only ever sees
  postings for the handful of query terms, not the whole vocabulary.
* Corpus statistics (N, avgdl) and per-term document frequencies are
  one-row / |query|-row aggregates that broadcast; nothing about the
  corpus is collected to the driver.
* The one data-sized shuffle is the (doc_id, term) tf groupBy over the
  filtered postings.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.text import tokens


def bm25_scores(
    df: DataFrame,
    query_terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Score every document containing >= 1 query term.

    Output: (id, score) with score rounded to 6dp — the standard
    BM25(k1, b) sum over query terms. Deterministic: ties are real
    score ties, ordering is left to the caller.
    """
    terms = [t.lower() for t in query_terms]
    lens = df.select(
        F.col(id_col), F.size(tokens(F.lower(F.col(text_col)))).alias("dl")
    )
    stats = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    # Carry the doc length WITH the postings so per-doc normalization
    # never needs a corpus-sized join-back; the posting stream is
    # already filtered to query terms, so the extra column rides on a
    # tiny relation.
    postings = (
        df.withColumn("__toks", tokens(F.lower(F.col(text_col))))
        .select(
            F.col(id_col),
            F.size("__toks").alias("dl"),
            F.explode("__toks").alias("term"),
        )
        .filter(F.col("term").isin(terms))
    )
    tf = postings.groupBy(id_col, "dl", "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf")
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(F.broadcast(stats))
        .select(
            F.col(id_col),
            (
                idf
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("term_score"),
        )
    )
    return per_term.groupBy(id_col).agg(
        F.round(F.sum("term_score"), 6).alias("score")
    )


def apss_cosine_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.9,
    strategy: str = "auto",
    n_blocks: int = 32,
) -> DataFrame:
    """EXACT all-pairs TF-IDF cosine similarity join (APSS, Bayardo
    WWW'07) with a COST-ADAPTIVE physical strategy.

    ``strategy``: "auto" (default) probes the term statistics and picks
    the cheaper path; "posting" forces the prefix-filter posting join
    (the Zipf-corpus scale path); "tiled" forces the exact tiled block
    join (the degenerate/small-vocabulary path). All three produce
    IDENTICAL output (tested); auto's probe compares est = sum_t
    prefix_df(t)*df(t) — an upper bound on posting candidates — against
    the n^2/2 pairs the tiled path scores, because the per-pair
    verification dot dominates a join row ~40x.

    Output: (i, j, cos_sim) with i < j, cos_sim rounded to 6, integer
    milli-nat idf weights so values hash-match cross-engine.

    Cache lifecycle (same contract as minhash_near_duplicates): the
    weight/map subtrees are persisted MEMORY_AND_DISK because multiple
    consumers (cost probe, prefix window, both pair sides) read them;
    the returned DataFrame is lazy, so unpersist can't happen inside
    this function — callers holding a long-lived session should
    spark.catalog.clearCache() between corpus-scale runs.
    """
    spark = docs.sparkSession
    docs = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    toks = F.filter(F.split(F.lower(F.trim(F.col("text"))), r"\s+"), lambda t: t != "")
    tok = docs.select("doc_id", F.explode(toks).alias("t"))
    tf = tok.groupBy("doc_id", "t").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    df = tf.groupBy("t").agg(F.count(F.lit(1)).cast("long").alias("df"))
    nd = tf.agg(F.countDistinct("doc_id").cast("long").alias("n"))
    from pyspark import StorageLevel

    # Persisted: feeds n2, the prefix window, the full postings side,
    # the weight maps AND the cost probe — five consumers of an
    # md5-free but join-heavy subtree.
    wgt = (
        tf.join(df, "t")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "t",
            "df",
            (
                F.col("tf")
                * F.round(F.log(F.col("n") / F.col("df").cast("double")) * 1000.0, 0).cast("long")
            ).alias("w"),
        )
        .filter(F.col("w") > 0)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n2 = wgt.groupBy("doc_id").agg(F.sum(F.col("w") * F.col("w")).cast("long").alias("n2"))
    # Persisted: both candidate paths attach the weight map to BOTH pair
    # sides, so without it the collect_list shuffle runs twice. The
    # squared norm rides ALONG with the map (one aggregation computes
    # both), so the final cosine filter is scan-stage arithmetic on the
    # pair row — joining a separate n2 frame back onto 12.5M pair rows
    # was two full-width shuffles (~20 s of the round-4 runtime).
    maps = (
        wgt.groupBy("doc_id")
        .agg(
            F.map_from_entries(F.collect_list(F.struct("t", "w"))).alias("m"),
            F.sum(F.col("w") * F.col("w")).cast("long").alias("n2"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # Prefix filtering: canonical order = (df ASC, term) puts the rarest
    # terms first; a term stays in the index iff the normalized mass
    # from it to the end of the vector could still reach the threshold
    # alone. Any cos >= t pair must then share an indexed term of at
    # least one side, so (prefix x full) postings cover all candidates.
    from pyspark.sql import Window

    bound = (threshold - 1e-6) ** 2
    w_ord = (
        Window.partitionBy("doc_id")
        .orderBy(F.col("df").asc(), F.col("t").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    suffix2 = F.sum((F.col("w") * F.col("w")).cast("double")).over(w_ord)
    flagged = wgt.join(n2, "doc_id").withColumn(
        "in_prefix", suffix2 / F.col("n2").cast("double") >= F.lit(bound)
    )
    # Persisted (round 13): the cost probe AND the posting branch's
    # candidate join both read the prefix rows — without the persist the
    # corpus-keyed prefix window ran twice whenever posting won. Carries
    # df so the probe is a plain SUM over these rows (below). Same
    # lifecycle contract as wgt/maps.
    prefix = (
        flagged.filter(F.col("in_prefix"))
        .select(F.col("doc_id").alias("p"), "t", "df")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    full = wgt.select(F.col("doc_id").alias("q"), "t")

    # COST PROBE (two tiny aggregates over the persisted wgt): the
    # posting candidate join generates est = sum_t prefix_df(t) * df(t)
    # rows before dedup, and — since every candidate needs at least one
    # generating row — est also UPPER-BOUNDS the number of candidate
    # pairs the posting path must score. The tiled path scores exactly
    # n^2/2 pairs. The verification dot dominates a join row ~40x
    # (measured: 21M join rows/s vs 0.52M map-merge dots/s), so the
    # decision compares dot counts directly: posting when est < n^2/2,
    # tiled otherwise. Validated at both measured regimes: the 31-term
    # fixture (est 90M > 12.5M pairs -> tiled, 2x faster) and the 10x
    # replica corpus (est 996M < 1.25G pairs -> posting, ~8x faster).
    # This is a physical-strategy choice from measured statistics, the
    # same class of decision AQE makes from runtime stats; output is
    # identical either way, so the oracle doesn't care which path ran.

    # EXACT dot via map_zip_with: hash-merge of the two weight maps,
    # products summed as longs — O(k) per pair instead of the O(k^2)
    # per-entry element_at scan (Spark maps are arrays; element_at is a
    # linear probe). Integer products => deterministic in any order.
    dot_expr = F.aggregate(
        F.map_values(
            F.map_zip_with(
                "m_i",
                "m_j",
                lambda _k, a, b: F.coalesce(a, F.lit(0).cast("long"))
                * F.coalesce(b, F.lit(0).cast("long")),
            )
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

    if strategy == "auto":
        # est = sum_t prefix_df(t) * df(t) = sum over prefix ROWS of df
        # (each prefix row (doc, t) contributes df(t) exactly once), so
        # the old groupBy("t") + join back onto df re-derived a number
        # the prefix rows already carry. One action computes est and
        # n_docs together (round 13; was three driver round-trips).
        est_row = (
            prefix.agg(F.sum("df").alias("est"))
            .crossJoin(n2.agg(F.count(F.lit(1)).alias("n_docs")))
            .first()
        )
        est = est_row["est"] or 0
        n_docs = est_row["n_docs"]
        use_posting = est < n_docs * n_docs // 2
    else:
        use_posting = strategy == "posting"
    if use_posting:
        cands = (
            prefix.join(full, "t")
            .filter(F.col("p") != F.col("q"))
            .select(F.least("p", "q").alias("i"), F.greatest("p", "q").alias("j"))
            .distinct()
        )
        mi = maps.select(
            F.col("doc_id").alias("i"), F.col("m").alias("m_i"), F.col("n2").alias("n2_i")
        )
        mj = maps.select(
            F.col("doc_id").alias("j"), F.col("m").alias("m_j"), F.col("n2").alias("n2_j")
        )
        paired = cands.join(mi, "i").join(mj, "j")
    else:
        # Tiled exact block join (cosine_self_join's shape): upper-
        # triangular B x B grid, each side replicated to its tile
        # row/column via a broadcast of the tiny grid, ONE equi-join on
        # (bl, br), no CartesianProduct, AQE can split straggler tiles.
        #
        # Vector representation: the tiled branch is chosen precisely
        # when the corpus is term-dense (every pair collides), which in
        # practice means a SMALL vocabulary — so when |vocab| <= 512 the
        # weight maps densify into fixed-width long arrays via a
        # broadcast term index, and the per-pair dot becomes a numeric
        # zip_with fold: no string-keyed map merge, ~2.2x faster
        # measured (24 s -> 10.4 s on the 31-term fixture at sf0.1).
        # Above the cap (a Zipf corpus that still tripped the probe)
        # rows would widen to |vocab|*8 bytes through the tile shuffle,
        # so the map kernel stays.
        B = n_blocks
        grid = spark.createDataFrame(
            [(x, y) for x in range(B) for y in range(x, B)], "bl int, br int"
        )
        vocab_n = df.count()
        if 0 < vocab_n <= 512:
            from pyspark.sql import Window as _W

            tidx = (
                df.select("t")
                .coalesce(1)
                .withColumn("tid", F.row_number().over(_W.orderBy("t")))
            )
            side = (
                wgt.join(F.broadcast(tidx), "t")
                .groupBy("doc_id")
                .agg(
                    F.map_from_entries(F.collect_list(F.struct("tid", "w"))).alias("mm"),
                    F.sum(F.col("w") * F.col("w")).cast("long").alias("n2"),
                )
                .select(
                    "doc_id",
                    "n2",
                    F.transform(
                        F.sequence(F.lit(1), F.lit(vocab_n)),
                        lambda i: F.coalesce(
                            F.element_at(F.col("mm"), i), F.lit(0).cast("long")
                        ),
                    ).alias("m"),
                )
            )
            dot_expr = F.aggregate(
                F.zip_with("m_i", "m_j", lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            )
        else:
            side = maps
        a = side.select(
            F.col("doc_id").alias("ia"),
            F.col("m").alias("m_i"),
            F.col("n2").alias("n2_i"),
            F.pmod(F.hash("doc_id"), F.lit(B)).alias("ba"),
        )
        b = side.select(
            F.col("doc_id").alias("ib"),
            F.col("m").alias("m_j"),
            F.col("n2").alias("n2_j"),
            F.pmod(F.hash("doc_id"), F.lit(B)).alias("bb"),
        )
        a_tiles = a.join(F.broadcast(grid), a["ba"] == grid["bl"]).select(
            "ia", "m_i", "n2_i", "bl", "br"
        )
        b_tiles = b.join(F.broadcast(grid), b["bb"] == grid["br"]).select(
            "ib", "m_j", "n2_j", "bl", "br"
        )
        tiles = a_tiles.join(b_tiles, ["bl", "br"])
        # Off-diagonal tiles see each unordered pair once; diagonal
        # tiles see both orientations -> keep ia < ib there.
        paired = tiles.filter(
            ((F.col("bl") != F.col("br")) & (F.col("ia") != F.col("ib")))
            | ((F.col("bl") == F.col("br")) & (F.col("ia") < F.col("ib")))
        ).select(
            F.least("ia", "ib").alias("i"),
            F.greatest("ia", "ib").alias("j"),
            "m_i",
            "m_j",
            "n2_i",
            "n2_j",
        )

    cos = F.col("dot").cast("double") / F.sqrt(
        F.col("n2_i").cast("double") * F.col("n2_j").cast("double")
    )
    return (
        paired.withColumn("dot", dot_expr)
        .filter(cos >= threshold)
        .select("i", "j", F.round(cos, 6).alias("cos_sim"))
    )


def rrf_fuse(
    ranked: dict[str, DataFrame],
    id_col: str = "doc_id",
    k: int = 60,
    topn: int = 20,
) -> DataFrame:
    """Reciprocal Rank Fusion (public Cormack/Clarke/Buettcher
    SIGIR'09) — THE standard hybrid-retrieval combiner: each arm
    contributes 1/(k + rank) for the documents it ranked, arms that
    missed a document contribute 0, and the fused order is the score
    sum. Rank-based (not score-based), so arms with incomparable score
    scales — BM25 vs cosine — fuse without calibration; k=60 is the
    paper's constant.

    ``ranked`` maps arm name -> a DataFrame with (id_col, rank); the
    output carries each arm's rank as ``rank_<name>`` (NULL where the
    arm missed), ``rrf_score`` rounded to 9dp (reciprocals of integer
    ranks — both engines compute identical doubles, summed in sorted
    arm-name order so the accumulation order is pinned too), and
    ``rank_hybrid`` — a gapless row_number order (strict total order
    via the doc-id tie-break, NOT dense_rank tie semantics).

    Scale shape: each arm is already capped to its own top-N by the
    caller, so the full-outer fusion join and the global final window
    run on O(arms x N) rows — never corpus-sized. The arms themselves
    are where the data-sized work happens (inverted-index pushdown for
    BM25, brute/ANN for vectors)."""
    from pyspark.sql import Window

    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked arm")
    out: DataFrame | None = None
    for name in sorted(ranked):
        side = ranked[name].select(
            F.col(id_col), F.col("rank").alias(f"rank_{name}")
        )
        out = side if out is None else out.join(side, id_col, "full_outer")
    score = None
    for name in sorted(ranked):
        term = F.when(
            F.col(f"rank_{name}").isNotNull(),
            F.lit(1.0) / (F.lit(k) + F.col(f"rank_{name}")),
        ).otherwise(F.lit(0.0))
        score = term if score is None else score + term
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col))
    return (
        out.withColumn("rrf_score", F.round(score, 9))
        .withColumn("rank_hybrid", F.row_number().over(w).cast("int"))
        .filter(F.col("rank_hybrid") <= topn)
    )
