"""Curation extensions: repetition filtering and decontamination.

Two more first-class LLM-training-data operators over ``documents``:

* ``doc_repetition_stats`` — the Gopher repetition rules (public Rae et
  al. 2021 §A1.1 family): duplicate-token fraction, most-frequent-bigram
  character coverage, duplicate-trigram fraction, and the combined
  ``repetitive`` gate. Pure per-row array algebra — ZERO shuffles; at
  100 TB this is scan-stage map work like ``text_quality_stats``.
* ``decontaminate_train_test`` — the public GPT-3/PaLM decontamination
  recipe: flag training docs whose long-n-gram overlap with a held-out
  evaluation set clears a threshold. The eval n-gram set broadcasts
  (eval suites are tiny vs the corpus), so the corpus side is one
  map-side membership test + one doc-keyed count shuffle.

The oracles restate both relationally (explode + GROUP BY + window),
which doubles as the cross-engine proof that the per-row array forms
compute the same values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators import dedup as D
from hridaya_steam_market_tracker_spark.operators.text import with_repetition_stats
from hridaya_steam_market_tracker_spark.queries import register
from hridaya_steam_market_tracker_spark.tables import table

_TOKS_LOWER = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), x -> x <> '')"

_EVAL_SOURCES = ("src18", "src19")


@register(
    "doc_repetition_stats",
    oracle=f"""
    WITH d AS (SELECT doc_id, {_TOKS_LOWER} AS w FROM documents),
    g AS (
      SELECT doc_id, w,
             [array_to_string(w[i:i+1], ' ') for i in range(1, len(w))] AS bg,
             [array_to_string(w[i:i+2], ' ') for i in range(1, len(w) - 1)] AS tg
      FROM d WHERE len(w) >= 3
    ),
    bgx AS (
      SELECT doc_id, b AS gram, count(*) AS c
      FROM g, unnest(bg) AS t(b) GROUP BY 1, 2
    ),
    top AS (
      SELECT doc_id, gram, c,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY c DESC, gram DESC) AS rn
      FROM bgx
    )
    SELECT g.doc_id,
           CAST(len(g.w) AS BIGINT) AS n_tokens,
           round((len(g.w) - len(list_distinct(g.w)))
                 / CAST(len(g.w) AS DOUBLE), 6) AS dup_token_frac,
           round(t.c * length(t.gram)
                 / CAST(length(array_to_string(g.w, ' ')) AS DOUBLE), 6)
             AS top_bigram_char_frac,
           round((len(g.tg) - len(list_distinct(g.tg)))
                 / CAST(len(g.tg) AS DOUBLE), 6) AS dup_trigram_frac,
           (round(t.c * length(t.gram)
                  / CAST(length(array_to_string(g.w, ' ')) AS DOUBLE), 6) > 0.15
            OR round((len(g.tg) - len(list_distinct(g.tg)))
                     / CAST(len(g.tg) AS DOUBLE), 6) > 0.02) AS repetitive
    FROM g JOIN top t ON t.doc_id = g.doc_id AND t.rn = 1
    """,
    doc=(
        "Gopher-style repetition signals per document (duplicate-token "
        "fraction, top-bigram character coverage, duplicate-trigram "
        "fraction) and the combined repetitive gate — zero-shuffle "
        "per-row array algebra; the oracle recomputes the bigram mode "
        "relationally with the same c-DESC, gram-DESC tie-break."
    ),
)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (
        with_repetition_stats(docs)
        .filter(F.col("n_tokens") >= 3)
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            "top_bigram_char_frac",
            "dup_trigram_frac",
            "repetitive",
        )
    )


@register(
    "decontaminate_train_test",
    oracle=f"""
    WITH d AS (SELECT doc_id, source, {_TOKS_LOWER} AS w FROM documents),
    sh AS (SELECT doc_id, source,
                  list_distinct([array_to_string(w[i:i+4], ' ')
                                 for i in range(1, len(w) - 3)]) AS s
           FROM d WHERE len(w) >= 5),
    ev AS (SELECT DISTINCT gr FROM sh, unnest(s) AS t(gr)
           WHERE source IN ('src18', 'src19')),
    tr AS (SELECT doc_id, len(s) AS n_grams, gr
           FROM sh, unnest(s) AS t(gr)
           WHERE source NOT IN ('src18', 'src19')),
    hits AS (SELECT doc_id, any_value(n_grams) AS n_grams,
                    count(CASE WHEN gr IN (SELECT gr FROM ev) THEN 1 END) AS n_hit
             FROM tr GROUP BY doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hit AS BIGINT) AS n_hit,
           round(n_hit / CAST(n_grams AS DOUBLE), 6) AS overlap_frac,
           round(n_hit / CAST(n_grams AS DOUBLE), 6) >= 0.5 AS contaminated
    FROM hits
    """,
    doc=(
        "GPT-3/PaLM-style decontamination: training docs (src0-17) whose "
        "distinct 5-gram overlap with the held-out sources (src18/19) "
        "clears 50%. Eval gram set broadcasts; corpus side is one "
        "map-side membership probe + one doc-keyed count shuffle."
    ),
)
def decontaminate_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return D.ngram_decontaminate(
        docs,
        eval_pred=F.col("source").isin(*_EVAL_SOURCES),
        n=5,
        threshold=0.5,
    )
