"""Streaming trending top-k: sliding-window counts + sink-edge rank.

The push plane (J9/J10) serves "what changed"; this serves "what's
hot": per-key counts over a sliding event-time window, watermarked so
state is bounded, ranked at the sink edge.

Scale design: the windowed count is the only stateful stage — Spark
keeps one (window, key) counter per live window, evicted at watermark;
no raw events are retained. Ranking is deliberately NOT in the
streaming plan (rank-over-window is unsupported/unbounded there):
each micro-batch output is tiny (live windows x keys), so the top-k
cut runs per sink flush over that bounded frame — same split as the
reference's serving edge, where the DB aggregates and the API layer
orders the page.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sliding_counts(
    stream_df: DataFrame,
    key_col: str = "market_hash_name",
    ts_col: str = "time",
    window_len: str = "5 minutes",
    slide: str = "1 minute",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts per key (bounded state)."""
    return (
        stream_df.withWatermark(ts_col, watermark_delay)
        .groupBy(
            F.window(F.col(ts_col), window_len, slide).alias("win"),
            F.col(key_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def rank_topk(counts_df: DataFrame, k: int = 3, key_col: str = "market_hash_name") -> DataFrame:
    """Top-k keys per window over a (bounded) counts frame — the
    sink-edge companion to sliding_counts. Deterministic tie-break on
    the key."""
    w = Window.partitionBy("window_start", "window_end").orderBy(
        F.col("n_events").desc(), F.col(key_col)
    )
    return (
        counts_df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
