"""Connected components over near-duplicate pair graphs.

Pair mining (operators/dedup.py) emits edges; a curation pipeline needs
CLUSTERS — transitive closure of the near-dup relation — so it can keep
one canonical document per cluster and drop the rest. Components are the
min-reachable-id labeling computed by iterative label propagation:

    label(v) <- min(label(v), min over neighbors(label(u)))

repeated to fixpoint. Each round is one shuffle (edge-label join +
min-aggregate); rounds needed = graph diameter, and near-dup graphs are
almost all tiny cliques (diameter 1-2), so 2-3 rounds converge. For
adversarially long chains the large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) converges
in O(log n) rounds with the same per-round shape — propagation is kept
here because real dedup graphs never get deep and the per-round cost is
lower.

Scale notes (100 TB posture):
  * The edge list is repartitioned by source and cached once — every
    round reuses the same co-partitioned edges, so only the (small)
    label side moves.
  * Each round `localCheckpoint`s the labels: iterative joins otherwise
    stack lineage, and round N replans rounds 1..N-1 (exponential plan
    growth). On a real cluster use reliable `checkpoint()` to HDFS/S3
    instead; local mode has no reliable checkpoint dir.
  * Convergence is detected by counting changed labels — one cheap
    count action per round, no collect of data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    src: str = "i",
    dst: str = "j",
    max_iter: int = 15,
) -> DataFrame:
    """Label every node with min reachable node id (undirected edges).

    Returns (node, component); component == min id in the node's
    connected component, so `node == component` marks one canonical
    survivor per cluster. Nodes absent from `edges` come out as
    singletons labeled by themselves.
    """
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .unionByName(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .repartition("s")
        .cache()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym["d"] == labels["node"])
            .groupBy(F.col("s").alias("node"))
            .agg(F.min("component").alias("nmin"))
        )
        proposed = (
            labels.join(neighbor_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("nmin", "component")
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            proposed.withColumnRenamed("component", "new_component")
            .join(labels, "node")
            .filter(F.col("new_component") != F.col("component"))
            .count()
        )
        labels = proposed
        if changed == 0:
            break
    sym.unpersist()
    return labels
