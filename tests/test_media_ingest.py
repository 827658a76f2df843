"""Streaming near-dup-gated MEDIA ingest (streaming/media_ingest.py):
the image twin of the corpus-ingest e2e suite. The fixture is
checked_oriented_dhash_df — real PNGs with real eXIf orientation, so
"duplicate" here means a camera-rotated/mirrored re-upload of a stored
image, the case plain content hashing can never catch."""

from __future__ import annotations

import os

import pytest

from hridaya_steam_market_tracker_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    checked_oriented_dhash_df,
    _pixel_codec,
)
from hridaya_steam_market_tracker_spark.streaming.media_ingest import (
    compact_media_store,
    ingest_media_batch,
    repair_media_band_index,
    start_dedup_media_ingest,
)


def _white_png_row(media_id: int):
    """A genuinely new image: constant white hashes to (0, 0), which sits
    >= 4 Hamming bits from every fixture base (1-4)."""
    _, encode = _pixel_codec()
    payload = bytearray(encode(36, 32, b"\xff" * (36 * 32 * 3), "png"))
    return (media_id, "image", "png", payload, None, None, None)


def _rows(spark, ids, extra=()):
    base = checked_oriented_dhash_df(spark, n=34)
    picked = base.filter(base["media_id"].isin(list(ids)))
    if extra:
        picked = picked.unionByName(
            spark.createDataFrame(list(extra), MEDIA_SCHEMA)
        )
    return picked


def _stored_ids(spark, store):
    return {
        r["media_id"]
        for r in spark.read.parquet(store + "/docs").collect()
    }


def test_media_ingest_two_waves_rotated_rejected(spark, tmp_path):
    """Wave 1 admits four upright bases plus the undecodable blob
    (admitted to docs/, excluded from bands/). Wave 2's rotated/
    mirrored re-uploads of stored bases are all rejected via the
    band-join + carried-hash verify; a genuinely new image is
    admitted."""
    store = str(tmp_path / "store")

    ingest_media_batch(_rows(spark, [0, 8, 16, 24, 33]), store)
    assert _stored_ids(spark, store) == {0, 8, 16, 24, 33}
    band_ids = {
        r["media_id"]
        for r in spark.read.parquet(store + "/bands").collect()
    }
    assert band_ids == {0, 8, 16, 24}  # undecodable row indexes nothing

    # ids 5 (base1, EXIF 6), 13 (base2, EXIF 6), 26 (base4, EXIF 3) are
    # stored-content re-uploads under rotation; 100 is new.
    ingest_media_batch(
        _rows(spark, [5, 13, 26], extra=[_white_png_row(100)]), store
    )
    assert _stored_ids(spark, store) == {0, 8, 16, 24, 33, 100}


def test_media_ingest_replay_and_leader_keeps(spark, tmp_path):
    """(a) Replaying a micro-batch is a no-op (already-stored ids are
    anti-joined before any decode). (b) Within one batch, the smallest
    id of a rotation group is the admitted leader; its satellites are
    rejected even with an empty store."""
    store = str(tmp_path / "store")

    # leader-keeps: ids 2 and 3 are orientations 3 and 4 of base 1
    batch = _rows(spark, [2, 3])
    ingest_media_batch(batch, store)
    assert _stored_ids(spark, store) == {2}

    ingest_media_batch(batch, store)  # replay: no-op
    assert _stored_ids(spark, store) == {2}
    assert spark.read.parquet(store + "/docs").count() == 1


def test_media_ingest_refuses_oversize_radius(spark, tmp_path):
    with pytest.raises(ValueError, match="max_hamming"):
        ingest_media_batch(_rows(spark, [0]), str(tmp_path / "s"), max_hamming=4)


def test_media_ingest_streaming_e2e_with_compaction(spark, tmp_path):
    """start_dedup_media_ingest wires the gate into foreachBatch with
    inline compaction: after the stream drains, each band partition
    holds <= compact_target_files files, and a second wave against the
    compacted store still rejects a rotated re-upload while admitting
    a new image — compaction changed no admission decision."""
    src_dir = str(tmp_path / "incoming")
    store = str(tmp_path / "store")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    _rows(spark, [0, 8, 16, 24]).write.parquet(src_dir, mode="append")
    stream = spark.readStream.schema(MEDIA_SCHEMA).parquet(src_dir)
    q = start_dedup_media_ingest(stream, store, ckpt, compact_every=1,
                                 compact_target_files=1)
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    for bd in os.listdir(store + "/bands"):
        if bd.startswith("band="):
            fs = [f for f in os.listdir(os.path.join(store, "bands", bd))
                  if f.endswith(".parquet")]
            assert len(fs) <= 1, (bd, fs)

    # wave 2: id 7 is base 1 under EXIF 8 (stored as id 0's rotation),
    # 101 is new
    _rows(spark, [7], extra=[_white_png_row(101)]).write.parquet(
        src_dir, mode="append"
    )
    stream2 = spark.readStream.schema(MEDIA_SCHEMA).parquet(src_dir)
    q2 = start_dedup_media_ingest(stream2, store, ckpt, compact_every=1,
                                  compact_target_files=1)
    try:
        q2.awaitTermination(120)
    finally:
        q2.stop()
    assert _stored_ids(spark, store) == {0, 8, 16, 24, 101}


def test_media_ingest_repairs_crash_orphaned_band_index(spark, tmp_path):
    """A crash between the docs/ append and the bands/ append used to
    leave admitted images permanently unindexed: replay anti-joined
    their ids away (already stored), their band rows were never
    written, and rotated re-uploads were silently admitted forever.
    Every batch now starts by re-indexing decodable docs rows missing
    from bands/, so the next ingest — even a replay — heals the store
    and the re-upload is rejected. The undecodable blob (decode_ok
    false) must NOT count as an orphan."""
    import shutil

    store = str(tmp_path / "store")
    ingest_media_batch(_rows(spark, [0, 33]), store)  # base 1 + undecodable
    shutil.rmtree(store + "/bands")  # crash state: docs written, bands not

    # id 5 is base 1 under EXIF orientation 6 — a rotated re-upload of
    # stored id 0. Without repair it would be admitted.
    ingest_media_batch(_rows(spark, [5]), store)
    assert _stored_ids(spark, store) == {0, 33}
    band_ids = {
        r["media_id"] for r in spark.read.parquet(store + "/bands").collect()
    }
    assert band_ids == {0}  # repaired; decode_ok=false row stayed unindexed

    # a healthy store repairs nothing (the cheap-path no-op)
    assert repair_media_band_index(spark, store) == 0


def test_media_ingest_non_image_policy(spark, tmp_path):
    """The dHash gate is image-only; a batch carrying audio/video rows
    must refuse by default (the silent no-dedup bypass), and
    non_image='admit' stores them docs-only with decode_ok null."""
    store = str(tmp_path / "store")
    audio_row = (500, "audio", "wav", bytearray(b"RIFF...."), None, None, None)

    with pytest.raises(ValueError, match="non-image"):
        ingest_media_batch(_rows(spark, [0], extra=[audio_row]), store)
    assert not os.path.isdir(store + "/docs")  # refused before any write

    ingest_media_batch(
        _rows(spark, [0], extra=[audio_row]), store, non_image="admit"
    )
    docs = {r["media_id"]: r["decode_ok"]
            for r in spark.read.parquet(store + "/docs").collect()}
    assert docs == {0: True, 500: None}
    band_ids = {
        r["media_id"] for r in spark.read.parquet(store + "/bands").collect()
    }
    assert band_ids == {0}
    # the admitted audio row is NOT an orphan candidate for repair
    assert repair_media_band_index(spark, store) == 0


def test_media_store_halfcompacted_refusal_and_recovery(spark, tmp_path):
    """The shared integrity guard covers this plane too: a mid-swap
    crash state refuses both ingest and compaction, and the one-rename
    recovery restores every admission."""
    store = str(tmp_path / "store")
    ingest_media_batch(_rows(spark, [0, 8]), store)
    docs = os.path.join(store, "docs")

    os.rename(docs, docs + ".compact.tmp")
    with pytest.raises(RuntimeError, match="half-compacted"):
        ingest_media_batch(_rows(spark, [16]), store)
    with pytest.raises(RuntimeError, match="half-compacted"):
        compact_media_store(spark, store)
    os.rename(docs + ".compact.tmp", docs)
    ingest_media_batch(_rows(spark, [16]), store)
    assert _stored_ids(spark, store) == {0, 8, 16}
    rewritten = compact_media_store(spark, store)
    assert rewritten == {"docs": 3, "bands": 12}
