"""Byte-pair-encoding training as Spark aggregations (Sennrich et al.
2016, the public subword-NMT algorithm): iteratively find the most
frequent adjacent token pair over the corpus vocabulary and merge it.

Spark-first shape: the CORPUS is touched exactly once (one aggregation
into the distinct-word vocabulary with counts); every training round
then runs on the vocabulary table only — pair explode + weighted count
+ argmax, with the winning pair flowing back in as a BROADCAST ONE-ROW
cross join (the repo's scalar pattern — no driver-side collect
anywhere). The vocabulary is stage-checkpointed per round (the
session checkpoint policy, checkpoints.py), so plan
depth stays constant across rounds (same discipline as
similarity.kmeans_lite, gated there by tests/test_plan_quality.py).

At 100 TB: vocabulary ~ millions of rows regardless of corpus size,
so each round is a small shuffle; the corpus-sized work never repeats.

Determinism: the argmax tie-breaks on (count DESC, left ASC, right
ASC), and merges apply as plain left-to-right non-overlapping string
replaces on a \\x1f-separated representation — semantics shared
bit-for-bit by DuckDB's replace(), which is what makes the whole
training trajectory value-checkable by a SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.checkpoints import stage_checkpoint

SEP = "\x1f"
END_WORD = "</w>"


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One corpus pass: whitespace-tokenized lowercase words with
    counts, as the separator-joined character representation BPE
    trains on ('hello' -> 'h␟e␟l␟l␟o␟</w>'). Words containing the
    separator byte are dropped (defensive; it cannot occur in sane
    text and would make the representation ambiguous)."""
    words = (
        docs.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("word")
        )
        .filter((F.col("word") != "") & ~F.col("word").contains(SEP))
    )
    repr_col = F.concat(
        F.regexp_replace(F.col("word"), "(.)", "$1" + SEP), F.lit(END_WORD)
    )
    return words.groupBy(F.col("word")).agg(
        F.count(F.lit(1)).alias("cnt")
    ).select(repr_col.alias("repr"), "cnt")


def _adjacent_pairs(words: DataFrame) -> DataFrame:
    """Explode each vocabulary word into its adjacent token pairs,
    weighted by word count (overlapping positions count — standard
    BPE pair statistics).

    The token split is bind1-bound (round 13): inlined it re-split the
    whole repr twice per pair position — O(len²) per word, paid once
    per merge round."""
    from hridaya_steam_market_tracker_spark.operators.text import bind1

    pairs = bind1(
        F.split(F.col("repr"), SEP),
        lambda toks: F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.struct(
                F.get(toks, i).alias("l"), F.get(toks, i + 1).alias("r")
            ),
        ),
    )
    return (
        words.select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("cnt").cast("long").alias("freq"))
    )


def bpe_train(docs: DataFrame, n_merges: int = 8, text_col: str = "text") -> DataFrame:
    """Train n_merges BPE merges over the corpus.

    Returns one row per round: (round, left, right, freq,
    corpus_tokens_after) — the chosen pair, its weighted frequency at
    selection time, and the total corpus token count after applying
    the merge (recounted from the vocabulary, so overlapping-pair
    effects are truthful, not freq-subtracted)."""
    words = word_vocab(docs, text_col).transform(stage_checkpoint)
    out: DataFrame | None = None
    for rnd in range(1, n_merges + 1):
        # Checkpoint the round's winning pair (round 13): `top` feeds
        # BOTH the merge application below and the output row, and as a
        # lazy plan the full _adjacent_pairs aggregation over the
        # vocabulary re-ran for each consumer — twice per merge round.
        # The one-row checkpoint (lazy: the merge broadcast is the
        # action that materializes it) runs the aggregation once; the
        # chosen pair and every downstream value are unchanged.
        top = (
            _adjacent_pairs(words)
            .orderBy(F.col("freq").desc(), F.col("left").asc(), F.col("right").asc())
            .limit(1)
            .transform(lambda d: stage_checkpoint(d, eager=False))
        )
        words = (
            words.crossJoin(F.broadcast(top.select("left", "right")))
            .withColumn(
                "repr",
                F.replace(
                    F.col("repr"),
                    F.concat(F.col("left"), F.lit(SEP), F.col("right")),
                    F.concat(F.col("left"), F.col("right")),
                ),
            )
            .select("repr", "cnt")
            .transform(stage_checkpoint)
        )
        tokens_after = words.agg(
            F.sum(F.size(F.split(F.col("repr"), SEP)) * F.col("cnt"))
            .cast("long")
            .alias("corpus_tokens_after")
        )
        row = (
            top.withColumn("round", F.lit(rnd).cast("int"))
            .crossJoin(F.broadcast(tokens_after))
            .select("round", "left", "right", "freq", "corpus_tokens_after")
            .transform(stage_checkpoint)
        )
        out = row if out is None else out.unionByName(row)
    assert out is not None
    return out


def bpe_segment(
    df: DataFrame, merges: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Apply a trained merge table to documents: per doc, the total BPE
    token count and distinct-token count after all merges (applied in
    training order via chained replaces). merges must be small (it is:
    n_merges rows) — it broadcasts as a sorted struct array and the
    replace chain runs in the scan stage via aggregate()."""
    merge_arr = merges.agg(
        F.array_sort(
            F.collect_list(F.struct("round", "left", "right"))
        ).alias("ms")
    )
    sp = F.split(F.lower(F.col(text_col)), r"\s+")
    word_repr = (
        "concat(regexp_replace(w, '(.)', '$1\x1f'), '</w>')"
    )
    applied = (
        f"aggregate(ms, {word_repr}, "
        "(acc, m) -> replace(acc, concat(m.left, '\x1f', m.right), "
        "concat(m.left, m.right)))"
    )
    return (
        df.select(F.col(id_col), F.explode(sp).alias("w"))
        .filter((F.col("w") != "") & ~F.col("w").contains(SEP))
        .crossJoin(F.broadcast(merge_arr))
        .select(
            id_col,
            F.expr(f"split({applied}, '\x1f')").alias("toks"),
        )
        .select(id_col, F.explode("toks").alias("tok"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bpe_tokens"),
            F.countDistinct("tok").cast("long").alias("n_distinct_tokens"),
        )
    )
