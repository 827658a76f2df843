"""As-of join: for each left row, the latest right row with
right.ts <= left.ts per key — "price at time of trade" analytics.

Not present in the reference (SURVEY.md §C note: a natural extension),
standard in market data systems. Implemented as a UNION + keyed window
scan: ONE shuffle on the key, then a linear last-carry pass — no range
join explosion, no per-key driver loops; at 100 TB this is the same
cost as any latest-per-key window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Enrich `left` with the most recent `right` row at-or-before its
    timestamp (inclusive), per key.

    right_value_cols: right columns carried over (prefixed 'right_').
    tolerance: optional max staleness (e.g. "7 days") — matches older
    than that are nulled, like pandas.merge_asof(tolerance=...).
    """
    right_value_cols = right_value_cols or [
        c for c in right.columns if c not in key_cols and c != ts_col
    ]
    carried = F.struct(F.col(ts_col).alias("__rts"), *[F.col(c) for c in right_value_cols])

    l_tag = left.withColumn("__side", F.lit(1))
    r_tag = right.withColumn("__side", F.lit(0)).withColumn("__carry", carried)

    unioned = r_tag.unionByName(l_tag, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(ts_col).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lastr = F.last(F.col("__carry"), ignorenulls=True).over(w)
    # Right-only columns arrive via the union as all-NULL on left rows;
    # drop the originals so the output carries them solely under their
    # 'right_'-prefixed names.
    stray = [c for c in right.columns if c not in left.columns]
    out = (
        unioned.withColumn("__last", lastr)
        .filter(F.col("__side") == 1)
        .drop("__side", "__carry", *stray)
    )
    if tolerance is not None:
        fresh = F.col("__last.__rts") >= F.col(ts_col) - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumn("__last", F.when(fresh, F.col("__last")))
    for c in right_value_cols:
        out = out.withColumn(f"right_{c}", F.col(f"__last.{c}"))
    return out.withColumn(f"right_{ts_col}", F.col("__last.__rts")).drop("__last")
