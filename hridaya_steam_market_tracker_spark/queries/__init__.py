"""The oracle-checked query catalog.

Every operator in SURVEY.md §2 that is batch-expressible registers here
as a named query over the driver fixture tables, paired with the ANSI
SQL a DuckDB oracle runs on the same parquet. The registry is what
``__spark_entry__.py`` exposes to the driver.

Registration contract (driver compares after sorting columns by name):
  * alias every computed column identically in Spark and SQL;
  * explicitly cast aggregate outputs (DuckDB SUM(int)->HUGEINT vs
    Spark -> LONG, DuckDB FLOOR -> DOUBLE vs Spark -> LONG, ...);
  * round floating aggregates on BOTH sides so cross-engine summation
    order can't flip the value hash;
  * derive any "now" from max(ts) in the data (deterministic), via a
    broadcast one-row join — never a driver-side collect.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return the registry.

    Import order IS registry order (dict insertion), and the driver's
    correctness gate samples the registry front-to-back. Round 1 verified the
    first ~50 entries under alphabetical order; this round front-loads the
    modules whose queries have no driver CORRECTNESS row yet (tpch, timeseries,
    windows, vectors, sampling, sketches) so they are sampled first, while the
    round-1-green modules trail. Keep this ordering deliberate when adding
    modules.
    """
    from hridaya_steam_market_tracker_spark.queries import (  # noqa: F401
        tpch,
        timeseries,
        windows,
        vectors,
        sampling,
        sketches,
        tpch_deep,
        tpch_rest,
        curation_ext,
        events_ext,
        analytics_ext,
        behavior,
        indicators,
        docs,
        joins,
        media,
        parsers,
        rollups,
    )

    return REGISTRY
