"""SparkSession factory.

Pinned to UTC (the reference pins every pool connection to UTC —
`api/databasePool.py:60` — and stores naive-UTC timestamps; hash parity
with the DuckDB oracle requires the same discipline), AQE enabled for
runtime re-planning (skew joins, partition coalescing), Arrow enabled
for the pandas-UDF slow path.

Scale posture: shuffle partitions default to the local core count for
tests; on a real cluster this is overridden by AQE's coalescing +
`spark.sql.adaptive.advisoryPartitionSizeInBytes`, so plans written
here carry to a 1000-executor deployment unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "hridaya-spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the singleton SparkSession with engine defaults."""
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
