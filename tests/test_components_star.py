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


def test_reliable_checkpoint_policy(spark, tmp_path):
    """The round-11 fault-tolerance knob (checkpoints.py): with
    spark.hridaya.reliableCheckpoints=true and a checkpoint dir set,
    every stage boundary routes through a RELIABLE checkpoint —
    verified by (a) real block files landing under the checkpoint dir
    while an iterative operator runs, and (b) the operator's labels
    being identical under both policies. Default (conf unset) stays
    the historical localCheckpoint path, which writes nothing there."""
    import os

    from hridaya_steam_market_tracker_spark.checkpoints import (
        RELIABLE_CONF,
        stage_checkpoint,
    )

    def ckpt_files(root):
        return [
            os.path.join(r, f)
            for r, _d, fs in os.walk(root)
            for f in fs
            if not f.startswith(".")
        ]

    n = 32
    nodes = spark.range(n).select(F.col("id").alias("doc_id"))
    edges = spark.createDataFrame(
        [(k, k + 1) for k in range(n - 1)], "i long, j long"
    )
    default_labels = _labels(alternating_components(nodes, edges))

    ckpt_dir = str(tmp_path / "reliable")
    spark.sparkContext.setCheckpointDir(ckpt_dir)
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        # direct: the boundary is a reliable checkpoint (files on disk)
        boundary = stage_checkpoint(
            spark.range(10).select(F.col("id").alias("v"))
        )
        assert boundary.count() == 10
        assert len(ckpt_files(ckpt_dir)) > 0
        # the iterative tier computes identical labels under the policy
        assert _labels(alternating_components(nodes, edges)) == default_labels
    finally:
        spark.conf.set(RELIABLE_CONF, "false")


def test_reliable_stage_resumes_across_sessions(spark, tmp_path):
    """The round-12 driver-loss story (the round-11 knob only covered
    executor loss): a NAMED reliable stage written by one session —
    here a genuinely separate driver process — is resumed by a NEW
    session from the checkpoint-dir files alone, with identical rows.
    Spark's own DataFrame.checkpoint files cannot do this (their RDD
    metadata dies with the writing driver), which is exactly why
    stage_checkpoint(stage_key=...) snapshots named stages as
    rename-committed parquet. A never-written key resumes as None
    (recompute branch), and a stage_key without a checkpoint dir
    raises."""
    import os
    import subprocess
    import sys

    from hridaya_steam_market_tracker_spark.checkpoints import (
        resume_stage_checkpoint,
        stage_checkpoint,
    )

    REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = str(tmp_path / "ckpt")
    writer = f"""
from pyspark.sql import SparkSession, functions as F
from hridaya_steam_market_tracker_spark.checkpoints import (
    RELIABLE_CONF, stage_checkpoint)
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.shuffle.partitions", "2")
         .config(RELIABLE_CONF, "true").getOrCreate())
spark.sparkContext.setCheckpointDir({ckpt!r})
labels = spark.range(32).select(
    F.col("id").alias("doc_id"), (F.col("id") % 5).alias("label"))
out = stage_checkpoint(labels, stage_key="components_round_3")
assert out.count() == 32
spark.stop()
"""
    env = dict(os.environ, PYTHONPATH=REPO)
    subprocess.run(
        [sys.executable, "-c", writer], check=True, env=env,
        capture_output=True,
    )
    # the writing driver is DEAD; resume from the files alone
    spark.sparkContext.setCheckpointDir(ckpt)
    resumed = resume_stage_checkpoint(spark, "components_round_3")
    assert resumed is not None
    got = sorted((r["doc_id"], r["label"]) for r in resumed.collect())
    assert got == [(i, i % 5) for i in range(32)]
    # unknown key -> None (the recompute branch)
    assert resume_stage_checkpoint(spark, "never_written") is None
    # a local-policy stage_checkpoint(stage_key=...) ignores the key
    # (no DFS traffic on the fast path): no new stages/ entry appears
    before = set(os.listdir(os.path.join(ckpt, "stages")))
    stage_checkpoint(
        spark.range(3).select(F.col("id").alias("v")),
        stage_key="local_mode_ignored",
    ).count()
    assert set(os.listdir(os.path.join(ckpt, "stages"))) == before


def test_stage_checkpoint_same_key_chain_and_prune(spark, tmp_path, caplog):
    """Round-12 ADVICE trio on the named-stage tier: (a) round N+1 may
    derive from a snapshot READ of the SAME stage_key — the snapshot is
    written to <path>.__inprogress__ and renamed over the final path,
    so the write never targets the path being scanned (previously
    Spark's 'Cannot overwrite a path that is also being read from');
    (b) a dir holding parquet data files but no _SUCCESS marker resumes
    as None WITH a loud marksuccessfuljobs warning, never silently;
    (c) prune_stage_checkpoints deletes completed stages (named keys
    and the sweep-all form) and reports what it removed."""
    import logging
    import os

    from hridaya_steam_market_tracker_spark.checkpoints import (
        RELIABLE_CONF,
        prune_stage_checkpoints,
        resume_stage_checkpoint,
        stage_checkpoint,
    )

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    spark.conf.set(RELIABLE_CONF, "true")
    try:
        # (a) three rounds through ONE reused key, each derived from a
        # fresh snapshot read of the previous round's files
        df = spark.range(8).select(
            F.col("id").alias("doc_id"), F.lit(0).alias("round")
        )
        out = stage_checkpoint(df, stage_key="chain")
        for _ in range(2):
            prev = resume_stage_checkpoint(spark, "chain")
            assert prev is not None
            out = stage_checkpoint(
                prev.withColumn("round", F.col("round") + 1),
                stage_key="chain",
            )
        assert [r["round"] for r in out.select("round").distinct().collect()] == [2]
        stages_dir = os.path.join(ckpt, "stages")
        assert os.path.isdir(os.path.join(stages_dir, "chain"))
        assert not os.path.isdir(
            os.path.join(stages_dir, "chain.__inprogress__")
        )

        # (b) strip _SUCCESS: resume -> None plus the committer warning
        os.remove(os.path.join(stages_dir, "chain", "_SUCCESS"))
        with caplog.at_level(
            logging.WARNING, logger="hridaya_steam_market_tracker_spark.checkpoints"
        ):
            assert resume_stage_checkpoint(spark, "chain") is None
        assert any(
            "marksuccessfuljobs" in rec.message for rec in caplog.records
        )

        # (c) prune: named key, then the sweep-all form
        stage_checkpoint(df, stage_key="done_tier")
        removed = prune_stage_checkpoints(spark, ["done_tier", "absent"])
        assert any(p.endswith("/stages/done_tier") for p in removed)
        assert not os.path.exists(os.path.join(stages_dir, "done_tier"))
        stage_checkpoint(df, stage_key="sweep_me")
        assert prune_stage_checkpoints(spark)  # sweeps 'chain' + 'sweep_me'
        assert os.listdir(stages_dir) == []
    finally:
        spark.conf.set(RELIABLE_CONF, "false")
