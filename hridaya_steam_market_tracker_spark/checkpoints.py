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

import os

from pyspark.sql import DataFrame, SparkSession

RELIABLE_CONF = "spark.hridaya.reliableCheckpoints"


def stage_checkpoint(
    df: DataFrame, eager: bool = True, stage_key: str | None = None
) -> DataFrame:
    """Cut lineage at a stage boundary under the session's checkpoint
    policy: ``localCheckpoint(eager)`` by default; with
    ``spark.hridaya.reliableCheckpoints=true`` (and a checkpoint dir
    set via ``spark.sparkContext.setCheckpointDir``), a RELIABLE
    ``checkpoint(eager)`` whose blocks survive executor loss.

    ``eager=False`` keeps the lazy-materialization semantics several
    cold-plan-gated queries rely on (the checkpoint happens at first
    execution, collapsing plan fan-out without running a job at
    declaration time) — supported by both underlying mechanisms.

    ``stage_key`` (round 12) upgrades a reliable boundary from
    executor-loss-recoverable to DRIVER-loss-resumable: Spark's
    ``DataFrame.checkpoint`` files are unreadable without the driver
    that wrote them (the RDD lineage metadata dies with the
    SparkContext), so a named stage is instead snapshotted as parquet
    under ``<checkpointDir>/stages/<stage_key>`` and read back — a
    NEW session resumes the tier from the files alone via
    `resume_stage_checkpoint`. Honest costs, stated: one full DFS
    write + scan per named boundary (vs block-level checkpoint
    writes), and ``eager`` is effectively true (the snapshot is the
    materialization). Under the default local policy ``stage_key``
    is ignored — no hidden DFS traffic on the fast path."""
    spark = df.sparkSession
    if (spark.conf.get(RELIABLE_CONF, "false") or "false").lower() == "true":
        if stage_key is not None:
            path = _stage_path(spark, stage_key)
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def resume_stage_checkpoint(
    spark: SparkSession, stage_key: str
) -> DataFrame | None:
    """Load the named stage a PRIOR session's reliable
    `stage_checkpoint` wrote, or None if it never completed: the
    driver-restart resume hook for long iterative tiers (components /
    BPE / k-means rounds on a 1000-executor cluster). A partial write
    is invisible — parquet commit is rename-based and the read
    requires the _SUCCESS marker — so resume-or-recompute is a safe
    branch."""
    path = _stage_path(spark, stage_key)
    # Hadoop-FS existence probe (works for file: and DFS schemes alike)
    jvm = spark._jvm
    marker = jvm.org.apache.hadoop.fs.Path(path + "/_SUCCESS")
    fs = marker.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    if not fs.exists(marker):
        return None
    return spark.read.parquet(path)


def _stage_path(spark: SparkSession, stage_key: str) -> str:
    """Named stages live under ``<user-set checkpoint dir>/stages/`` —
    the PARENT of ``getCheckpointDir()``, because setCheckpointDir
    appends a per-SparkContext UUID subdirectory and a stage written
    under one context's UUID would be invisible to the next driver
    (the whole point of a named stage is surviving that driver)."""
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    if not ckpt_dir:
        raise ValueError(
            "stage_key requires a checkpoint dir: call "
            "spark.sparkContext.setCheckpointDir(...) first"
        )
    base = os.path.dirname(ckpt_dir.rstrip("/"))
    return f"{base}/stages/{stage_key}"
