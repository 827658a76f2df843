"""Streaming near-dup-gated MEDIA ingest — the image twin of
`streaming/corpus_ingest.py`, with the orientation-normalized dHash as
the signature: a camera-rotated or mirrored re-upload of a stored
image is rejected at the gate, not discovered later by a batch sweep.

Same store discipline as the text plane (and deliberately the same
code where the discipline lives): single-writer parquet, ``isdir``
existence checks so a real read failure fails the batch loudly instead
of aliasing to "empty store", `_check_store_integrity`'s loud refusal
of a half-compacted store, rename-aside compaction via the shared
`compact_store` (this plane passes its own band columns), and replay
as a no-op (already-stored media_ids are anti-joined away first).
Reference analog: the replay-safe delta-insert discipline of
/root/reference/src/SQLinserts.py:515-584, re-expressed for media.

Two places the image plane is deliberately DIFFERENT:

* **The signature is sufficient for exact verify.** Text near-dup must
  re-read colliding store documents to compute exact Jaccard; a dHash
  match is decided by two bit_count(XOR)s over 64 bits, so band rows
  carry (hash_hi, hash_lo) and the verify path NEVER re-reads a stored
  payload — at 100 TB of blobs, the store's bytes are written once and
  only ever re-read by a human or a re-featurization job, not by the
  admission gate.
* **Undecodable blobs are ADMITTED to docs/ and excluded from
  bands/.** Dedup cannot gate on evidence it cannot read; silently
  dropping corrupt rows here would make ingest lossy in a way replay
  could never repair. The quality tier owns rejecting corrupt media —
  the honest-failure split every codec operator in this package
  already makes (decode_ok=false rows keep their identity).

State under ``store_path``:

* ``docs/``  — accepted media rows (media_id, media_type, format,
  payload).
* ``bands/`` — (media_id, bucket, hash_hi, hash_lo), HIVE-PARTITIONED
  BY ``band`` (4 static values — the 16-bit quarters of the 64-bit
  hash). Each micro-batch equi-joins its own 4 rows/image against this
  store on (band, bucket); by pigeonhole the blocking is lossless for
  Hamming <= 3.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.multimodal import (
    dhash_bands,
    image_dhash_oriented,
)
from hridaya_steam_market_tracker_spark.streaming.corpus_ingest import (
    _check_store_integrity,
    compact_store,
)

_MEDIA_BAND_COLS = ("media_id", "band", "bucket", "hash_hi", "hash_lo")
_DOC_COLS = ("media_id", "media_type", "format", "payload")


def _hamming(hi_a, lo_a, hi_b, lo_b):
    return (
        F.bit_count(hi_a.bitwiseXOR(hi_b)) + F.bit_count(lo_a.bitwiseXOR(lo_b))
    ).cast("int")


def ingest_media_batch(
    batch_df: DataFrame,
    store_path: str,
    max_hamming: int = 3,
) -> None:
    """Process ONE media micro-batch: orientation-normalized dHash,
    band-join against the store index and the batch itself, admit
    leaders and genuinely-new images, append accepted blobs + their
    band rows. Designed for foreachBatch; replaying a batch is a
    no-op. Rejection: an image with a verified Hamming <= max_hamming
    match among stored images, or among lower-id images of the same
    batch (leader-keeps)."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 16-bit banding is lossless only "
            "for max_hamming <= 3 (pigeonhole over 4 bands)"
        )
    from pyspark import StorageLevel

    spark = batch_df.sparkSession
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")

    batch = batch_df.select(*_DOC_COLS).dropDuplicates(["media_id"])
    _check_store_integrity(store_path)
    stored = spark.read.parquet(docs_path) if os.path.isdir(docs_path) else None
    if stored is not None:
        batch = batch.join(stored.select("media_id"), "media_id", "left_anti")
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    hashes = None
    try:
        if batch.isEmpty():
            return

        # ONE decode pass per batch: the mapInPandas hash is the
        # expensive step, so its output is pinned and every downstream
        # consumer (banding, verify, accepted-index write) reuses it.
        hashes = image_dhash_oriented(batch).persist(StorageLevel.MEMORY_AND_DISK)
        b_bands = dhash_bands(hashes)

        # Within-batch candidates (satellite j vs leader i, i < j),
        # verified inline — the hashes ride the band rows.
        a = b_bands.select(
            F.col("media_id").alias("i"), F.col("hash_hi").alias("hi_i"),
            F.col("hash_lo").alias("lo_i"), "band", "bucket",
        )
        b = b_bands.select(
            F.col("media_id").alias("j"), F.col("hash_hi").alias("hi_j"),
            F.col("hash_lo").alias("lo_j"), "band", "bucket",
        )
        ham = _hamming(F.col("hi_i"), F.col("lo_i"), F.col("hi_j"), F.col("lo_j"))
        within = (
            a.join(b, ["band", "bucket"])
            .filter((F.col("i") < F.col("j")) & (ham <= max_hamming))
            .select("j")
        )
        # Store-vs-batch candidates: equi-join on (band, bucket), exact
        # Hamming verify from the CARRIED hashes — no stored payload is
        # ever re-read on this path.
        if os.path.isdir(bands_path):
            s = (
                spark.read.parquet(bands_path)
                .select(*_MEDIA_BAND_COLS)
                .select(
                    F.col("media_id").alias("i"),
                    F.col("hash_hi").alias("hi_i"),
                    F.col("hash_lo").alias("lo_i"), "band", "bucket",
                )
            )
            cross = (
                s.join(b, ["band", "bucket"])
                .filter(ham <= max_hamming)
                .select("j")
            )
            rejected = cross.unionByName(within).distinct()
        else:
            rejected = within.distinct()
        rejected = rejected.withColumnRenamed("j", "media_id")

        # Both outputs are localCheckpoint-ed BEFORE the first append:
        # the docs append refreshes the path cache, which would force
        # any still-lazy plan reading docs/ (the anti-join in `batch`'s
        # lineage) to re-evaluate against the just-extended store and
        # write an empty band index — the corpus_ingest lesson, kept.
        accepted = batch.join(rejected, "media_id", "left_anti").localCheckpoint(
            eager=True
        )
        accepted_bands = (
            dhash_bands(hashes)
            .join(accepted.select("media_id"), "media_id", "left_semi")
            .localCheckpoint(eager=True)
        )
        accepted.write.mode("append").parquet(docs_path)
        (
            accepted_bands.write.mode("append")
            .partitionBy("band")
            .parquet(bands_path)
        )
    finally:
        if hashes is not None:
            hashes.unpersist()
        batch.unpersist()


def compact_media_store(
    spark: SparkSession, store_path: str, target_files: int = 1
) -> dict[str, int]:
    """`compact_store` with this plane's band columns — identical
    rename-aside swap, half-compacted refusal, and admission
    invariance (decisions are a pure function of store content)."""
    return compact_store(
        spark, store_path, target_files, band_cols=_MEDIA_BAND_COLS
    )


def start_dedup_media_ingest(
    stream_media: DataFrame,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_target_files: int = 8,
    **dedup_kwargs,
):
    """Wire a streaming media source into the near-dup-gated store via
    foreachBatch(ingest_media_batch). Returns the StreamingQuery.
    ``compact_every=N`` runs `compact_media_store` after every Nth
    epoch — safe because foreachBatch callbacks execute serially on
    the one writer (same cadence contract as start_dedup_ingest)."""

    def process(df: DataFrame, epoch: int) -> None:
        ingest_media_batch(df, store_path, **dedup_kwargs)
        if compact_every and (epoch + 1) % compact_every == 0:
            compact_media_store(df.sparkSession, store_path, compact_target_files)

    writer = stream_media.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
