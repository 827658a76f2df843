"""Bucketed interval join — range predicates without nested loops.

Spark executes a join whose ONLY condition is an inequality as a
BroadcastNestedLoopJoin (or cartesian product): O(|L|x|R|) comparisons,
which is unrunnable at 100 TB. The standard fix is bucketization: when
the probe predicate is `r.ts in [l.ts - W, l.ts)`, discretize time into
width-W buckets. A right row's bucket is fixed; the left row's matches
can only live in bucket(l) or bucket(l)-1 (an interval of length W
spans at most 2 grid cells). Exploding the left side to those two
candidate buckets turns the range join into an EQUI-join on
(key, bucket) — hash-partitionable, AQE-skew-splittable — followed by an
exact residual filter on the full-precision timestamps.

Cost: 2x the left row count into the shuffle (candidate duplication)
instead of |L|x|R| comparisons; each (l, r) pair meets in exactly one
bucket, so no post-join dedup is needed. The same trick generalizes to
any interval length by exploding ceil(len/W)+1 candidates.

The as-of join (operators/asof.py) is the `nearest predecessor` cousin;
this one returns ALL rows in the trailing window, not just the latest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_trailing(
    left: DataFrame,
    right: DataFrame,
    key: str | None,
    left_ts: str = "ts",
    right_ts: str = "ts",
    window_sec: int = 3600,
) -> DataFrame:
    """All (l, r) with equal key and r.ts in [l.ts - window, l.ts).

    Output: every `left` column plus every `right` column prefixed
    `r_`. Bucket width equals the window, so candidate buckets per left
    row are exactly {b, b-1}; pass key=None for a pure time-range join.
    """
    lb = F.floor(F.unix_timestamp(F.col(left_ts)) / window_sec).cast("long")
    rb = F.floor(F.unix_timestamp(F.col(right_ts)) / window_sec).cast("long")
    lexp = left.withColumn("_bucket", F.explode(F.array(lb, lb - F.lit(1))))
    rexp = right.select(
        *[F.col(c).alias(f"r_{c}") for c in right.columns],
        rb.alias("_rbucket"),
    )
    cond = lexp["_bucket"] == rexp["_rbucket"]
    if key is not None:
        cond = cond & (lexp[key] == rexp[f"r_{key}"])
    window_expr = F.expr(f"INTERVAL {window_sec} SECOND")
    return (
        lexp.join(rexp, cond)
        .filter(
            (F.col(f"r_{right_ts}") >= F.col(left_ts) - window_expr)
            & (F.col(f"r_{right_ts}") < F.col(left_ts))
        )
        .drop("_bucket", "_rbucket")
    )
