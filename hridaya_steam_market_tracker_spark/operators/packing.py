"""Sequence packing for LLM pretraining batches: concat-and-chunk.

The standard pretraining data layout (public GPT-2/3 recipe): documents
are concatenated in a deterministic order and the token stream is cut
into fixed-size context windows. This operator computes, per document,
WHERE its tokens land — which chunk its first token falls in, at what
offset, and whether it straddles a chunk boundary — without ever
materializing the token stream.

Scale design: a single global concatenation order would serialize into
one cumulative-sum partition. Instead documents are salted into
``n_buckets`` independent streams by a deterministic 60-bit hash of the
id (reproducible across runs/engines — same recipe as the dedup
hashes), and each bucket concatenates independently: the cumsum window
partitions by bucket, so the shuffle spreads over ``n_buckets`` keys
and each task sorts only its bucket. At 100 TB, n_buckets scales with
the cluster, and per-bucket order (by id) keeps the layout stable
under any input partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.text import tokens


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_buckets: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document a (bucket, chunk, offset) in the packed
    token stream of its bucket.

    Output columns: id, bucket, n_tokens, chunk (0-based index of the
    context window holding the doc's first token), chunk_offset
    (position of the first token within that chunk), spans_boundary
    (true when the doc crosses into the next chunk).
    """
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("pack:"), F.col(id_col).cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    sized = df.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_buckets)).cast("int").alias("bucket"),
        F.size(tokens(F.lower(F.col(text_col)))).cast("long").alias("n_tokens"),
    ).filter(F.col("n_tokens") > 0)
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    # Integer `div`, not double `/`: beyond 2^53 cumulative tokens (the
    # operator's own 100 TB posture) a double quotient rounds and chunk
    # would disagree with the exact pmod-derived offset.
    return (
        sized.withColumn("cum_before", cum_before)
        .select(
            id_col,
            "bucket",
            "n_tokens",
            F.expr(f"cum_before div {budget}").alias("chunk"),
            F.pmod(F.col("cum_before"), F.lit(budget))
            .cast("long")
            .alias("chunk_offset"),
            F.expr(f"(cum_before + n_tokens - 1) div {budget}").alias(
                "__last_chunk"
            ),
        )
        .withColumn("spans_boundary", F.col("__last_chunk") > F.col("chunk"))
        .drop("__last_chunk")
    )
