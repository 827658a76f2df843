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

import logging
import os

from pyspark.sql import DataFrame, SparkSession

RELIABLE_CONF = "spark.hridaya.reliableCheckpoints"

_LOG = logging.getLogger(__name__)


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
    is ignored — no hidden DFS traffic on the fast path.

    Key discipline for iterative tiers (round-12 ADVICE): the snapshot
    is written to ``<path>.__inprogress__`` and RENAMED over the final
    path, so round N+1 MAY derive from a snapshot read of the SAME key
    — the write never targets the path being scanned, avoiding Spark's
    "Cannot overwrite a path that is also being read from" failure.
    The rename atomically retires the old snapshot; any OTHER still-lazy
    DataFrame over the old files becomes invalid at that instant, which
    is exactly the per-round-overwrite semantics the name promises.
    Per-round UNIQUE keys (``f"components_round_{i}"``, as the resume
    test does) remain the recommended shape for resumable tiers — a
    reused key keeps only the latest round, so a driver restart resumes
    from that round's snapshot, not from scratch. Completed tiers
    should `prune_stage_checkpoints` their keys — snapshots are plain
    parquet dirs and nothing deletes them implicitly."""
    spark = df.sparkSession
    if (spark.conf.get(RELIABLE_CONF, "false") or "false").lower() == "true":
        if stage_key is not None:
            path = _stage_path(spark, stage_key)
            tmp = path + ".__inprogress__"
            df.write.mode("overwrite").parquet(tmp)
            fs, jpath = _hadoop_fs(spark, path)
            if fs.exists(jpath):
                fs.delete(jpath, True)
            _, jtmp = _hadoop_fs(spark, tmp)
            if not fs.rename(jtmp, jpath):
                raise IOError(
                    f"stage_checkpoint: rename {tmp} -> {path} failed"
                )
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
    branch.

    Committer requirement (round-12 ADVICE): the gate assumes the
    output committer writes _SUCCESS
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=true``, the
    Hadoop default). Some object-store committer setups disable the
    marker; there every resume would silently recompute, so the probe
    logs a loud warning when parquet data files exist without the
    marker instead of quietly returning None."""
    path = _stage_path(spark, stage_key)
    fs, jdir = _hadoop_fs(spark, path)
    _, marker = _hadoop_fs(spark, path + "/_SUCCESS")
    if not fs.exists(marker):
        if fs.exists(jdir) and any(
            f.getPath().getName().endswith(".parquet")
            for f in fs.listStatus(jdir)
        ):
            _LOG.warning(
                "resume_stage_checkpoint(%r): parquet files exist at %s "
                "but no _SUCCESS marker — either the write died mid-job "
                "(recompute is correct) or the committer runs with "
                "mapreduce.fileoutputcommitter.marksuccessfuljobs=false, "
                "in which case resume will NEVER fire; set it true for "
                "named-stage resume.",
                stage_key,
                path,
            )
        return None
    return spark.read.parquet(path)


def prune_stage_checkpoints(
    spark: SparkSession, stage_keys: list[str] | None = None
) -> list[str]:
    """Delete named-stage snapshots a completed tier no longer needs
    (round-12 ADVICE: per-round keys accumulate parquet dirs with no
    implicit cleanup). ``stage_keys=None`` prunes EVERY stage under
    ``<checkpoint parent>/stages`` — the end-of-pipeline sweep; a list
    prunes just those keys (missing keys are no-ops). In-progress tmp
    dirs (``*.__inprogress__``) of listed keys are swept too. Returns
    the paths actually deleted."""
    removed: list[str] = []
    if stage_keys is None:
        ckpt_dir = spark.sparkContext.getCheckpointDir()
        if not ckpt_dir:
            return removed
        base = os.path.dirname(ckpt_dir.rstrip("/")) + "/stages"
        fs, jbase = _hadoop_fs(spark, base)
        if not fs.exists(jbase):
            return removed
        for st in fs.listStatus(jbase):
            if fs.delete(st.getPath(), True):
                removed.append(st.getPath().toString())
        return removed
    for key in stage_keys:
        for path in (
            _stage_path(spark, key),
            _stage_path(spark, key) + ".__inprogress__",
        ):
            fs, jpath = _hadoop_fs(spark, path)
            if fs.exists(jpath) and fs.delete(jpath, True):
                removed.append(path)
    return removed


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path) for a string path — works for file: and DFS
    schemes alike; the FS is resolved from the path's own scheme."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    )
    return fs, jpath


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
