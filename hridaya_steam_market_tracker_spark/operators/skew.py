"""Skew mitigation helpers: salting for hot keys.

AQE's skew-join handling (enabled in session.py) covers sort-merge
joins at runtime; these helpers cover the cases AQE can't re-plan:

* salted_group_agg — a groupBy whose key distribution is pathological
  (one market_hash_name = half the table). Two-level aggregation:
  partial agg on (key, salt), final agg on key. Works for any
  algebraic aggregate (sum/count/min/max; avg via sum+count).
* salted_left_join — replicate the small side R times, salt the big
  side uniformly: the hot key's rows spread over R reducers.

Both are pure plan rewrites — no data characteristics assumed at
compile time beyond "this key may be hot"; at 100 TB you apply them to
the handful of operators whose keys are known heavy-tailed (e.g.
per-item aggregation when one item dominates trading volume).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, col_name: str = "__salt") -> DataFrame:
    """Uniform deterministic salt derived from a stable row hash (no
    rand(): deterministic under task retry, which nondeterministic
    salting is not)."""
    all_cols = [F.col(c) for c in df.columns]
    return df.withColumn(col_name, F.pmod(F.hash(*all_cols), F.lit(buckets)))


def salted_group_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    buckets: int = 16,
) -> DataFrame:
    """Two-level skew-safe aggregation.

    aggs: {out_name: (partial_agg_expr, final_agg_expr_over_partial)}
    e.g. {"n": (F.count(F.lit(1)), F.sum("n")),
          "total": (F.sum("value"), F.sum("total"))}
    The partial exprs run on (key, salt) — the hot key fans out over
    `buckets` reducers — and the final exprs combine the tiny
    (key x salt) intermediate.
    """
    salted = with_salt(df, buckets)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final.alias(name) for name, (_, final) in aggs.items()]
    )


def salted_left_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    buckets: int = 16,
) -> DataFrame:
    """Skew-safe big⋈small when the small side can't broadcast: salt
    the big side, replicate the small side across every salt value, and
    join on (key, salt) — hot keys spread over `buckets` tasks."""
    big_salted = with_salt(big, buckets)
    salts = F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))).alias("__salt")
    small_replicated = small.select("*", salts)
    return big_salted.join(small_replicated, [*key_cols, "__salt"], "left").drop("__salt")
