"""A2: the name -> item_nameid manifest source.

Reference (utility/loadConfig_utility.py:8-73): a 26,587-entry JSON map
loaded once, cached, refreshed on miss; unresolvable names are dropped
with a reason (C2).

Spark-first: the manifest is a dimension DataFrame, broadcast into the
resolve join (streaming/reconcile.resolve_nameids). The refresh-on-miss
cache below is the driver-side control-plane convenience the reference
exposes; the DATA path never touches it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("market_hash_name", T.StringType(), False),
        T.StructField("item_nameid", T.LongType(), True),
    ]
)


def load_manifest_df(spark: SparkSession, path: str) -> DataFrame:
    """JSON object {name: nameid, ...} -> (market_hash_name, item_nameid)."""
    with open(path, encoding="utf-8") as f:
        mapping = json.load(f)
    rows = [(k, int(v)) for k, v in mapping.items()]
    return spark.createDataFrame(rows, MANIFEST_SCHEMA)


class ManifestCache:
    """Driver-side cached map with refresh-on-miss
    (loadConfig_utility.py:53-73)."""

    def __init__(self, path: str):
        self._path = path
        self._map: dict[str, int] = {}
        self.reloads = 0
        self._load()

    def _load(self) -> None:
        with open(self._path, encoding="utf-8") as f:
            self._map = {k: int(v) for k, v in json.load(f).items()}
        self.reloads += 1

    def lookup(self, name: str) -> int | None:
        if name not in self._map:
            self._load()  # refresh-on-miss: the file may have grown
        return self._map.get(name)
