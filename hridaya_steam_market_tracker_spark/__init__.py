"""PySpark-native analytics engine with the query and data-processing
capabilities of AjaXsb/Hridaya_Steam_Market_Tracker (see SURVEY.md).

Brand-new, Spark-first design: DataFrame/SQL logical plans optimized by
Catalyst, Structured Streaming for the ingestion/push plane, and
partitioned columnar storage. Not a port of the reference's asyncio
machinery — the reference defines WHAT is computed; this package
expresses it idiomatically on Spark.

Layout:
    session      — SparkSession factory (UTC, AQE, sane local defaults)
    tables       — fixture-table loaders (driver testdata parquet)
    schemas      — StructType schemas for the reference's 5 storage tables
    functions/   — column-function library (price/volume/currency/date
                   parsers, activity-HTML extraction, text analysis)
    operators/   — composable DataFrame->DataFrame operators (latest-per-key,
                   HWM delta-ingest, reconcile diffs, dedup, similarity, ...)
    queries/     — the oracle-checked query catalog (SURVEY.md §2 inventory)
    streaming/   — Structured Streaming plane (rate-limited source adapter,
                   watermark dedup ingest, subscription push, reconciliation)
    storage/     — physical layout, partitioning, retention
"""

__version__ = "0.1.0"
