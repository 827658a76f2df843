"""large-star/small-star connected components: O(log n) convergence on
chains where label propagation's rounds == diameter, and label
equivalence with the propagation implementation on arbitrary graphs."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.components import (
    alternating_components,
    connected_components,
)


def _labels(df) -> dict[int, int]:
    return {r["node"]: r["component"] for r in df.collect()}


def test_path_graph_converges_logarithmically(spark):
    # 64-node chain: diameter 63. Propagation would need 63 rounds; the
    # alternating algorithm must finish inside its default 12 (~2*log2 n).
    n = 64
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(k, k + 1) for k in range(n - 1)], "i long, j long"
    )
    got = _labels(alternating_components(nodes, edges))
    assert got == {k: 0 for k in range(n)}


def test_matches_propagation_on_random_graphs(spark):
    rng = random.Random(7)
    n = 80
    edges = [
        (rng.randrange(n), rng.randrange(n))
        for _ in range(60)
    ]
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edf = spark.createDataFrame(edges, "i long, j long")
    star = _labels(alternating_components(nodes, edf))
    prop = _labels(connected_components(nodes, edf, max_iter=40))
    assert star == prop


def test_singletons_and_self_loops(spark):
    nodes = spark.range(6).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame([(2, 2), (3, 4)], "i long, j long")
    got = _labels(alternating_components(nodes, edges))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 3, 5: 5}
