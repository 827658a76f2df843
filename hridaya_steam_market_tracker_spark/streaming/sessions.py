"""Streaming sessionization — session_window + watermark.

The reference's push plane groups per-item activity implicitly (bursts
of polls followed by idle gaps); Structured Streaming makes the gap
notion first-class: `session_window(ts, gap)` maintains per-key open
sessions in the state store, merges on overlap, and — with a
watermark — finalizes and evicts a session once event time passes
session_end + delay. State per key is one (start, end, agg) tuple, not
the member rows, so state size is bounded by ACTIVE sessions only:
the property that lets this run indefinitely on an unbounded stream.

The batch formulation of the same operator (queries/sketches.py
`session_window_native`, oracle-checked against the ANSI gap-and-islands
decomposition) doubles as this module's correctness oracle:
tests/test_streaming_sessions.py drives identical rows through both
paths and asserts identical session sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_stream(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based sessions per key; works on both streaming and batch DFs.

    On a stream, the watermark bounds how late an event may arrive and
    still extend a session; sessions older than watermark are finalized
    (append mode) and their state evicted.
    """
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return (
        df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
