"""Streaming near-dup-gated corpus ingest — the CONTINUOUS twin of the
batch `dedup_incremental_delta` query (operators/dedup.py
`minhash_delta_near_duplicates`).

Reference analog: the ingest plane's replay-safe delta insert
(src/SQLinserts.py:515-584 upsert discipline, re-expressed for a
document corpus); the dedup tier itself is brief-added scale surface
with no reference analog.

State layout under ``store_path`` (plain parquet, single-writer — the
same assumption streaming/ingest.py documents):

* ``docs/``  — accepted documents.
* ``bands/`` — their banded MinHash signature index
  (doc_id, band, bucket): the WRITE-ONCE state the incremental dedup
  design documents. Each micro-batch equi-joins its own bands against
  this store, so per-batch cost is O(batch bands + matching buckets) —
  the corpus TEXT is only re-read for the (small) candidate set that
  actually collides, via a semi-join pushdown on doc_id.

Admission policy per micro-batch: a document is REJECTED when it has
an exact-Jaccard-verified near-dup among stored docs, or among
lower-id docs of the same batch (leader-keeps: the smallest id of a
within-batch dup group is admitted; its satellites are not). Replay of
a micro-batch is a no-op: already-stored doc_ids are anti-joined away
before any work, mirroring idempotent_append.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.dedup import (
    _spread,
    banded_buckets,
    shingles,
    signatures_from_sets,
)


def ingest_batch(
    batch_df: DataFrame,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
) -> None:
    """Process ONE micro-batch: dedup against the store and within the
    batch, then append accepted docs + their bands. Designed for
    foreachBatch; calling it twice with the same batch is a no-op."""
    from pyspark import StorageLevel

    spark = batch_df.sparkSession
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")

    batch = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
    try:
        stored_docs = spark.read.parquet(docs_path)
    except Exception:  # first batch: empty store
        stored_docs = None
    if stored_docs is not None:
        batch = batch.join(stored_docs.select("doc_id"), "doc_id", "left_anti")
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        if batch.rdd.isEmpty():
            return

        sets = (
            _spread(batch, "doc_id")
            .select(F.col("doc_id"), shingles(F.col("text"), n).alias("sh"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        b_bands = banded_buckets(signatures_from_sets(sets, num_hashes), num_hashes, bands)

        # Within-batch candidates (satellite j vs leader i, i < j) ...
        within = (
            b_bands.select(F.col("doc_id").alias("i"), "band", "bucket")
            .join(b_bands.select(F.col("doc_id").alias("j"), "band", "bucket"), ["band", "bucket"])
            .filter(F.col("i") < F.col("j"))
            .select("i", "j")
        )
        # ... plus store-vs-batch candidates from the persisted index.
        try:
            s_bands = spark.read.parquet(bands_path)
        except Exception:
            s_bands = None
        if s_bands is not None:
            cross = (
                s_bands.select(F.col("doc_id").alias("i"), "band", "bucket")
                .join(b_bands.select(F.col("doc_id").alias("j"), "band", "bucket"), ["band", "bucket"])
                .select("i", "j")
            )
            cands = cross.unionByName(within).distinct()
        else:
            cands = within.distinct()

        # Verify with exact Jaccard. The left side may be a stored doc:
        # re-shingle ONLY the colliding corpus docs (semi-join pushdown
        # on doc_id), never the whole store.
        left_sets = sets.select(F.col("doc_id").alias("i"), F.col("sh").alias("sh_i"))
        if stored_docs is not None:
            matched_store = stored_docs.join(
                cands.select(F.col("i").alias("doc_id")).distinct(), "doc_id", "left_semi"
            )
            store_sets = _spread(matched_store, "doc_id").select(
                F.col("doc_id").alias("i"), shingles(F.col("text"), n).alias("sh_i")
            )
            left_sets = left_sets.unionByName(store_sets)
        right_sets = sets.select(F.col("doc_id").alias("j"), F.col("sh").alias("sh_j"))
        paired = cands.join(left_sets, "i").join(right_sets, "j")
        inter = F.size(F.array_intersect(F.col("sh_i"), F.col("sh_j")))
        union = F.size("sh_i") + F.size("sh_j") - inter
        rejected = (
            paired.filter((inter.cast("double") / union) >= threshold)
            .select(F.col("j").alias("doc_id"))
            .distinct()
        )

        # localCheckpoint, not persist: appending to docs_path below runs
        # refreshByPath on it, which invalidates any CACHED plan whose
        # lineage reads that path (accepted's does, via the stored-ids
        # anti-join). A cache-invalidated `accepted` would silently
        # re-evaluate against the just-extended store — and admit
        # nothing into the bands index. The checkpoint materializes the
        # rows and CUTS the lineage, so both writes see the same set.
        accepted = batch.join(rejected, "doc_id", "left_anti").localCheckpoint(
            eager=True
        )
        accepted.write.mode("append").parquet(docs_path)
        banded_buckets(
            signatures_from_sets(
                _spread(accepted, "doc_id").select(
                    "doc_id", shingles(F.col("text"), n).alias("sh")
                ),
                num_hashes,
            ),
            num_hashes,
            bands,
        ).write.mode("append").parquet(bands_path)
        sets.unpersist()
    finally:
        batch.unpersist()


def start_dedup_ingest(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    **dedup_kwargs,
):
    """Wire a streaming document source into the near-dup-gated store
    via foreachBatch(ingest_batch). Returns the StreamingQuery."""
    writer = stream_docs.writeStream.foreachBatch(
        lambda df, _epoch: ingest_batch(df, store_path, **dedup_kwargs)
    ).option("checkpointLocation", checkpoint_path)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
