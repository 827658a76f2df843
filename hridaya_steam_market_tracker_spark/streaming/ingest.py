"""J6 + A5/A7: streaming ingest with exactly-once per (key, time).

Reference semantics: history points are delta-ingested past a per-key
high-water mark and upserted with ON CONFLICT (name, time) DO NOTHING
(src/SQLinserts.py:515-584) — replay-safe, duplicate-free.

Spark-first realization:
* in-stream: withWatermark + dropDuplicates([key, time]) removes
  within-stream dupes with bounded state;
* at the sink: an anti-join against the already-stored keyset inside
  foreachBatch makes micro-batch REPLAY idempotent on vanilla parquet
  (Delta MERGE would subsume this; parquet is what this environment
  has — single-writer discipline is assumed, as the reference assumes
  one ingest process).

Sink layout is storage.layout: date-partitioned, key-sorted within
partitions (the Timescale chunk + segmentby analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEY_COLS = ("market_hash_name", "time")


def dedup_in_stream(stream_df: DataFrame, watermark_delay: str = "1 hour") -> DataFrame:
    """Watermarked within-stream dedup on the natural key (J6)."""
    return stream_df.withWatermark("time", watermark_delay).dropDuplicates(
        list(KEY_COLS)
    )


def idempotent_append(batch_df: DataFrame, sink_path: str) -> None:
    """Append only rows whose (key, time) is not already stored —
    the ON CONFLICT DO NOTHING analog for a parquet sink. Used inside
    foreachBatch, so retries of the same micro-batch are no-ops.
    """
    spark = batch_df.sparkSession
    try:
        stored = spark.read.parquet(sink_path).select(*KEY_COLS)
    except Exception:  # first batch: nothing stored yet
        stored = None
    fresh = batch_df.dropDuplicates(list(KEY_COLS))
    if stored is not None:
        fresh = fresh.join(stored, list(KEY_COLS), "left_anti")
    (
        fresh.withColumn("date", F.to_date("time"))
        .repartition("date")
        .sortWithinPartitions("market_hash_name", "time")
        .write.mode("append")
        .partitionBy("date")
        .parquet(sink_path)
    )


def start_history_ingest(
    stream_df: DataFrame,
    sink_path: str,
    checkpoint_path: str,
    watermark_delay: str = "1 hour",
    trigger_seconds: float | None = None,
):
    """Wire the J6 pipeline: watermark-dedup -> idempotent append sink."""
    deduped = dedup_in_stream(stream_df, watermark_delay)
    writer = (
        deduped.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(lambda df, _id: idempotent_append(df, sink_path))
    )
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
