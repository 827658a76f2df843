"""Streaming session_window end-to-end: identical rows through the
streaming path (file source -> session_window + watermark -> memory
sink) and the batch path must yield identical session sets; the batch
path itself is oracle-checked in test_oracle_parity (session_window_native).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.streaming.sessions import sessionize_stream
from hridaya_steam_market_tracker_spark.tables import table

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_sessions_match_batch(spark, tmp_path):
    rows = (
        table(spark, SF_DIR, "events")
        .filter(F.col("user_id") <= 20)
        .select("user_id", "ts")
    )
    src_dir = str(tmp_path / "src")
    rows.write.parquet(src_dir)

    batch = sessionize_stream(rows)

    stream = spark.readStream.schema(rows.schema).parquet(src_dir)
    q = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT * FROM sessions_sink")
        assert got.count() == batch.count() > 0
        assert got.exceptAll(batch).isEmpty()
        assert batch.exceptAll(got).isEmpty()
    finally:
        q.stop()
