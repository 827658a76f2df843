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
