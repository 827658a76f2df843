"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``hridaya_steam_market_tracker_spark`` — this
module just exposes the registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hridaya_steam_market_tracker_spark.queries import load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's headline read: latest-per-key market summary with
    trailing-window volatility (SURVEY.md §2 E1 + D6) — the shape behind
    GET /overview and the cross-item dashboards.
    """
    registry = load_all()
    return registry["d6_volatility_per_key"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted for rows-only checks)."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
