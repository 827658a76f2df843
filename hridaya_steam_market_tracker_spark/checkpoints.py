"""Stage-boundary checkpoint policy (round 11).

Several long-running operator tiers cut lineage at stage boundaries —
iterative rounds (connected components' star steps, BPE merge rounds,
Lloyd/k-means rounds, perceptron epochs), eager materializations that
stop Catalyst re-deriving an expensive subtree per consumer (the
span-dedup keep postings, `operators/dedup.py`), and the lazy fps-stage
boundaries of the excerpt twins. All of them default to
``DataFrame.localCheckpoint``, which stores the cut lineage's blocks on
EXECUTOR storage: fast (no DFS round-trip), but NOT recoverable — if an
executor holding blocks dies, the job FAILS rather than recomputing,
because the truncated lineage is gone.

The accepted trade, stated once (the PLANS.md round-11 policy note):

* at test/driver scale (local[32], single JVM) executor loss is
  process death — nothing to recover either way;
* on a real cluster, SHORT jobs (one batch, one query) restart cheaply,
  so local checkpoints' speed wins;
* LONG-RUNNING tiers on a 1000-executor cluster see executor churn as
  a matter of course, and there a failed 6-hour components run costs
  more than every DFS write reliable checkpoints would have added.

``stage_checkpoint`` is the one knob that flips the policy WITHOUT
touching call sites: every operator-tier boundary routes through it,
and a session that sets

    spark.sparkContext.setCheckpointDir(<dfs path>)
    spark.conf.set("spark.hridaya.reliableCheckpoints", "true")

gets RELIABLE checkpoints (``DataFrame.checkpoint`` — blocks written
to the checkpoint dir, lineage recoverable across executor loss) at
every such boundary. The default (conf unset/false) is byte-identical
to the historical ``localCheckpoint`` behavior.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

RELIABLE_CONF = "spark.hridaya.reliableCheckpoints"


def stage_checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Cut lineage at a stage boundary under the session's checkpoint
    policy: ``localCheckpoint(eager)`` by default; with
    ``spark.hridaya.reliableCheckpoints=true`` (and a checkpoint dir
    set via ``spark.sparkContext.setCheckpointDir``), a RELIABLE
    ``checkpoint(eager)`` whose blocks survive executor loss.

    ``eager=False`` keeps the lazy-materialization semantics several
    cold-plan-gated queries rely on (the checkpoint happens at first
    execution, collapsing plan fan-out without running a job at
    declaration time) — supported by both underlying mechanisms."""
    spark = df.sparkSession
    if (spark.conf.get(RELIABLE_CONF, "false") or "false").lower() == "true":
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
