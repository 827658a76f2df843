"""Bucketed tables: shuffle-free fact-fact joins (SURVEY.md §4 / the
100 TB posture for orders ⋈ lineitem).

At sf0.1 Catalyst broadcasts the smaller fact side; at 100 TB neither
side broadcasts and the join shuffles BOTH tables on every query. The
fix is storage-level: persist both facts bucketed (and sorted) by the
join key — Spark's bucketing metadata then satisfies the join's
distribution requirement at read time and the Exchange disappears from
every downstream plan that joins on that key.

This module owns the write/read discipline; tests assert the physical
plan contains no Exchange on the bucketed join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed+sorted managed table (parquet)."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*(sort_cols or bucket_cols))
    )
    writer.saveAsTable(table_name)


def cobucket_facts(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_name: str,
    right_name: str,
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Bucket two fact tables on the same key with the same bucket
    count — the precondition for exchange-free joins between them."""
    write_bucketed(left, left_name, [key], n_buckets)
    write_bucketed(right, right_name, [key], n_buckets)
    return spark.table(left_name), spark.table(right_name)


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle Exchange (excluding
    broadcast exchanges) — the thing bucketing exists to remove."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    # Substring match, not line-prefix: Exchange nodes under the non-last
    # child of a binary operator render with a ':' gutter prefix
    # (':  +- Exchange hashpartitioning...'), which a startswith check
    # would miss — letting a one-sided shuffle regression false-pass.
    return any(
        "Exchange" in line and "BroadcastExchange" not in line
        for line in plan.splitlines()
    )
