"""J11: currency-flip feedback — the data plane correcting the control
plane.

Reference (src/snoozerScheduler.py:21-26, 270-283): when a poll's
derived wallet currency differs from the item's requested currency id,
flip the item's request defaults (currency id + country) so subsequent
polls ask for the right locale.

Spark-first: a join between the control DataFrame and the per-key
derived currencies from the last micro-batch; only genuinely-changed
rows are emitted (A8 no-op suppression, or the flip would storm the
reconcile loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.functions.prices import (
    ISO_TO_COUNTRY,
    STEAM_CURRENCY_ID_TO_ISO,
)

_ISO_TO_ID = {v: k for k, v in STEAM_CURRENCY_ID_TO_ISO.items()}


def _iso_to_id_col(iso):
    expr = None
    for code, cid in _ISO_TO_ID.items():
        cond = iso == code
        expr = F.when(cond, cid) if expr is None else expr.when(cond, cid)
    return expr.otherwise(F.lit(None).cast("int"))


def _iso_to_country_col(iso):
    expr = None
    for code, country in ISO_TO_COUNTRY.items():
        cond = iso == code
        expr = F.when(cond, country) if expr is None else expr.when(cond, country)
    return expr.otherwise(F.lit(None).cast("string"))


def apply_currency_flip(control: DataFrame, derived: DataFrame) -> DataFrame:
    """Return the control rows whose request defaults must flip.

    control: TRACKED_ITEMS-shaped; derived: (market_hash_name, stream,
    derived_currency ISO) from the latest normalized batch. Output:
    updated rows ONLY (no-op suppressed) with new currency id+country.
    """
    new_id = _iso_to_id_col(F.col("derived_currency"))
    joined = control.join(
        F.broadcast(derived), ["market_hash_name", "stream"], "inner"
    )
    flipped = joined.filter(
        new_id.isNotNull() & (new_id != F.col("currency"))
    )
    return (
        flipped.withColumn("currency", new_id)
        .withColumn(
            "country",
            F.coalesce(_iso_to_country_col(F.col("derived_currency")), F.col("country")),
        )
        .drop("derived_currency")
    )
