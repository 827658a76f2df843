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
  payload, decode_ok). ``decode_ok`` records whether the row is
  band-indexed: true rows have band rows, false rows are the admitted
  undecodable blobs that legitimately have none. That bit is what
  makes the one crash state this plane could previously not see —
  a crash between the docs/ append and the bands/ append — DETECTABLE:
  a decode_ok=true docs row absent from bands/ is always an orphan,
  and every ingest batch starts by repairing those (re-hash just the
  orphans, append their band rows) before admitting anything, so
  replay heals the index instead of anti-joining the evidence away.
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


def media_admission_rejects(
    stored_bands: DataFrame | None,
    batch_bands: DataFrame,
    max_hamming: int = 3,
    keys: tuple[str, ...] = ("band", "bucket"),
) -> DataFrame:
    """The admission DECISION function, factored out so the streaming
    gate and its registered batch twin (`media_ingest_admission_twin`
    in queries/media.py) run literally the same plan: given the store's
    band index (None for an empty store) and the batch's band rows
    (both shaped like `dhash_bands` output), return the one-column
    (media_id) relation of batch rows to REJECT — a verified
    Hamming <= max_hamming match among stored rows, or among lower-id
    rows of the same batch (leader-keeps). Equi-join on ``keys`` —
    (band, bucket) for the single-plane image gate, (plane, band,
    bucket) for the unified gate, where the plane key makes
    cross-modality collisions structurally impossible — with the
    carried hashes verified inline: 4 two-int rows per item cross the
    shuffle, never payloads, never the all-pairs square."""
    keys = list(keys)
    a = batch_bands.select(
        F.col("media_id").alias("i"), F.col("hash_hi").alias("hi_i"),
        F.col("hash_lo").alias("lo_i"), *keys,
    )
    b = batch_bands.select(
        F.col("media_id").alias("j"), F.col("hash_hi").alias("hi_j"),
        F.col("hash_lo").alias("lo_j"), *keys,
    )
    ham = _hamming(F.col("hi_i"), F.col("lo_i"), F.col("hi_j"), F.col("lo_j"))
    within = (
        a.join(b, keys)
        .filter((F.col("i") < F.col("j")) & (ham <= max_hamming))
        .select("j")
    )
    if stored_bands is not None:
        s = stored_bands.select(
            F.col("media_id").alias("i"),
            F.col("hash_hi").alias("hi_i"),
            F.col("hash_lo").alias("lo_i"), *keys,
        )
        cross = s.join(b, keys).filter(ham <= max_hamming).select("j")
        rejected = cross.unionByName(within).distinct()
    else:
        rejected = within.distinct()
    return rejected.withColumnRenamed("j", "media_id")


def repair_media_band_index(spark: SparkSession, store_path: str) -> int:
    """Re-index any decodable docs/ rows missing from bands/ — the one
    crash state the admission path used to be blind to (a crash between
    the two appends of `ingest_media_batch` left admitted images
    permanently unindexed, so their rotated re-uploads were silently
    admitted forever; replay could not heal it because the orphans were
    anti-joined away as already-stored). Runs at the head of every
    ingest batch; the normal-path cost is one id/flag-column anti-join
    between the two stores (no payload touched). Only when orphans
    exist are their payload rows re-read and re-hashed — the
    "stored payloads are never re-read on admission" property holds
    for every non-crash batch. Returns the number of rows repaired.

    Stores written before decode_ok landed lack the flag; docs/ is
    read with ``mergeSchema`` so a mixed store (legacy footers plus
    new-format appends) deterministically exposes the column with NULL
    for legacy rows — never an arbitrary-footer schema where legacy
    rows silently vanish from repair. A NULL flag means "unknown": the
    row is a repair candidate and the re-hash decides (undecodable
    legacy rows then re-decode on each batch until the store is
    rewritten — compact after upgrading to re-establish the cheap
    path). Only IMAGE rows are candidates: non-image rows admitted via
    ``non_image='admit'`` carry a NULL flag by design and never belong
    in bands/, so they must not become perpetual re-decode orphans."""
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")
    if not os.path.isdir(docs_path):
        return 0
    docs = spark.read.option("mergeSchema", "true").parquet(docs_path)
    imgs = docs.filter(F.col("media_type") == "image")
    cand = (
        imgs.filter(F.col("decode_ok") | F.col("decode_ok").isNull())
        if "decode_ok" in docs.columns
        else imgs
    ).select("media_id")
    if os.path.isdir(bands_path):
        band_ids = spark.read.parquet(bands_path).select("media_id").distinct()
        orphans = cand.join(band_ids, "media_id", "left_anti")
    else:
        orphans = cand
    # Cut lineage BEFORE the bands append below refreshes bands_path —
    # the orphan set reads it (the corpus_ingest localCheckpoint lesson).
    orphans = orphans.localCheckpoint(eager=True)
    if orphans.isEmpty():
        return 0
    orphan_docs = docs.join(orphans, "media_id", "left_semi")
    repaired = dhash_bands(image_dhash_oriented(orphan_docs)).localCheckpoint(
        eager=True
    )
    n = repaired.count()
    repaired.write.mode("append").partitionBy("band").parquet(bands_path)
    return n


def ingest_media_batch(
    batch_df: DataFrame,
    store_path: str,
    max_hamming: int = 3,
    non_image: str = "error",
) -> None:
    """Process ONE media micro-batch: orientation-normalized dHash,
    band-join against the store index and the batch itself, admit
    leaders and genuinely-new images, append accepted blobs + their
    band rows. Designed for foreachBatch; replaying a batch is a
    no-op (and heals a crash-orphaned band index first — see
    `repair_media_band_index`). Rejection: an image with a verified
    Hamming <= max_hamming match among stored images, or among
    lower-id images of the same batch (leader-keeps).

    The dHash gate is IMAGE-only. ``non_image`` makes that explicit
    instead of silent: ``"error"`` (default) refuses a batch carrying
    audio/video rows; ``"admit"`` stores them in docs/ WITHOUT any
    dedup (no band rows — a re-upload of the same audio twice is
    admitted twice) for callers that knowingly use this store as a
    mixed blob sink."""
    if max_hamming > 3:
        raise ValueError(
            f"max_hamming={max_hamming}: 16-bit banding is lossless only "
            "for max_hamming <= 3 (pigeonhole over 4 bands)"
        )
    if non_image not in ("error", "admit"):
        raise ValueError(f"non_image={non_image!r}: expected 'error' or 'admit'")
    from pyspark import StorageLevel

    spark = batch_df.sparkSession
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")

    batch = batch_df.select(*_DOC_COLS).dropDuplicates(["media_id"])
    if non_image == "error" and not batch.filter(
        F.col("media_type") != "image"
    ).isEmpty():
        raise ValueError(
            "ingest_media_batch: batch contains non-image rows, which the "
            "dHash gate cannot dedup (they would be admitted unconditionally). "
            "Filter to media_type == 'image', or pass non_image='admit' to "
            "knowingly store them without dedup."
        )
    _check_store_integrity(store_path)
    repair_media_band_index(spark, store_path)
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

        # The shared decision function: within-batch leader-keeps plus
        # store-vs-batch candidates, both verified from the CARRIED
        # hashes — no stored payload is ever re-read on this path.
        stored_bands = (
            spark.read.parquet(bands_path).select(*_MEDIA_BAND_COLS)
            if os.path.isdir(bands_path)
            else None
        )
        rejected = media_admission_rejects(stored_bands, b_bands, max_hamming)

        # Both outputs are localCheckpoint-ed BEFORE the first append:
        # the docs append refreshes the path cache, which would force
        # any still-lazy plan reading docs/ (the anti-join in `batch`'s
        # lineage) to re-evaluate against the just-extended store and
        # write an empty band index — the corpus_ingest lesson, kept.
        # decode_ok rides the docs row (null for non_image='admit'
        # rows, which image_dhash_oriented never saw) so the repair
        # pass can tell "legitimately unindexed" from "orphaned".
        accepted = (
            batch.join(rejected, "media_id", "left_anti")
            .join(hashes.select("media_id", "decode_ok"), "media_id", "left")
            .localCheckpoint(eager=True)
        )
        accepted_bands = (
            dhash_bands(hashes)
            .join(accepted.select("media_id"), "media_id", "left_semi")
            .localCheckpoint(eager=True)
        )
        accepted.write.mode("append").parquet(docs_path)
        # Never append an EMPTY frame: it creates a directory holding
        # only _SUCCESS, which a later batch's read fails on with
        # UNABLE_TO_INFER_SCHEMA (e.g. a first batch of solely
        # undecodable blobs has docs rows but zero band rows).
        if not accepted_bands.isEmpty():
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


# ---------------------------------------------------------------------------
# Unified multi-plane media gate (round 9): one store deduping images,
# videos AND audio, each through its own signature, sharing the banded
# admission machinery. The plane rides the band rows and the join key,
# so an image and an audio clip that happen to land on the same 64 bits
# can never reject each other — cross-modality isolation is structural,
# not probabilistic.
# ---------------------------------------------------------------------------

_ANY_BAND_COLS = ("media_id", "plane", "band", "bucket", "hash_hi", "hash_lo")
_ANY_KEYS = ("plane", "band", "bucket")

_GATE_MODE_MARKER = "_GATE_MODE"


def _mode_string(
    excerpt: bool, phases: int = 1, image_plane: str = "grid",
    audio_plane: str = "window",
) -> str:
    if image_plane not in ("grid", "cdt", "hybrid"):
        raise ValueError(
            f"image_plane={image_plane!r}: expected 'grid' (phase-"
            "shifted tile grids), 'cdt' (content-defined tiling), or "
            "'hybrid' (cdt with per-item low-entropy grid fallback)"
        )
    if audio_plane not in ("window", "cdt", "hybrid"):
        raise ValueError(
            f"audio_plane={audio_plane!r}: expected 'window' (phased "
            "window tokens), 'cdt' (content-defined anchors), or "
            "'hybrid' (cdt with per-clip low-entropy window fallback)"
        )
    if not excerpt:
        return "plain"
    mode = "excerpt" if phases == 1 else f"excerpt:phases={phases}"
    if image_plane != "grid":
        mode += f":image={image_plane}"
    if audio_plane != "window":
        mode += f":audio={audio_plane}"
    return mode


def set_any_media_gate_mode(
    store_path: str, excerpt: bool, phases: int = 1,
    image_plane: str = "grid", audio_plane: str = "window",
) -> None:
    """Deliberately (re)declare a unified store's admission mode —
    the explicit act `_check_gate_mode`'s refusal demands before a
    store may switch between plain and excerpt-aware ingest. After
    switching a store TO excerpt mode, the next excerpt-aware batch's
    repair pass re-fingerprints every stored item into wfps/ (one
    payload re-read per stored row — the documented upgrade cost).

    ``phases`` (round 11) is part of the lifetime contract too — a
    store's wfps/ index is only as phase-aware as the batches that
    built it, so switching phases on a store that already has a
    wfps/ index DROPS the index (that is what re-keying means): the
    next excerpt-aware batch's repair pass rebuilds it at the new
    phase count. Without the drop, stored items would keep their
    old-phase fingerprints and an offset crop/excerpt of an OLD item
    would still sail through — the exact silent weakening this
    marker exists to refuse."""
    import shutil

    os.makedirs(store_path, exist_ok=True)
    marker = os.path.join(store_path, _GATE_MODE_MARKER)
    new_mode = _mode_string(excerpt, phases, image_plane, audio_plane)
    old_mode = None
    if os.path.isfile(marker):
        with open(marker) as f:
            old_mode = f.read().strip()
    wfps_path = os.path.join(store_path, "wfps")
    if (
        old_mode is not None
        and old_mode != new_mode
        and excerpt
        and os.path.isdir(wfps_path)
    ):
        shutil.rmtree(wfps_path)
    with open(marker, "w") as f:
        f.write(new_mode)


def _check_gate_mode(
    store_path: str, excerpt: bool, phases: int = 1,
    image_plane: str = "grid", audio_plane: str = "window",
) -> None:
    """Enforce the excerpt-tier lifetime contract the round-9
    docstring could only request: a store is EITHER plain (wfps/
    never maintained) OR excerpt-aware, for its whole life, unless
    the operator switches it deliberately. Mixed-mode ingest is the
    silent half-state this module refuses everywhere else — plain
    batches into an excerpt store leave the index stale AND stop
    rejecting excerpts; excerpt batches into a plain store quietly
    pay a full-store re-fingerprint in repair. Marker-less stores
    (pre-round-10) are grandfathered by INFERENCE from the one
    durable fact on disk — wfps/ exists iff the store ever ingested
    excerpt-aware — then the marker is written so the inference
    happens once (phases is unknowable from disk; grandfathered
    stores are phases=1, the only value that existed before the
    marker carried it)."""
    mode = _mode_string(excerpt, phases, image_plane, audio_plane)
    marker = os.path.join(store_path, _GATE_MODE_MARKER)
    if os.path.isfile(marker):
        with open(marker) as f:
            stored_mode = f.read().strip()
    elif os.path.isdir(os.path.join(store_path, "docs")):
        stored_mode = (
            "excerpt"
            if os.path.isdir(os.path.join(store_path, "wfps"))
            else "plain"
        )
    else:
        set_any_media_gate_mode(
            store_path, excerpt, phases, image_plane, audio_plane
        )
        return
    if stored_mode != mode:
        raise ValueError(
            f"store {store_path!r} was ingested in {stored_mode!r} mode "
            f"but this batch requests {mode!r}: mixed-mode ingest "
            "silently weakens the gate (stale wfps/, unrejected "
            "excerpts). Keep excerpt_tau consistent for the store's "
            "lifetime (excerpt_phases included), or switch "
            "deliberately with "
            f"set_any_media_gate_mode({store_path!r}, "
            f"excerpt={excerpt}, phases={phases}, "
            f"image_plane={image_plane!r}, audio_plane={audio_plane!r})."
        )
    if not os.path.isfile(marker):
        set_any_media_gate_mode(
            store_path, excerpt, phases, image_plane, audio_plane
        )


def media_signatures(
    batch: DataFrame,
    video_frames: DataFrame | None = None,
    audio_windows: DataFrame | None = None,
    image_decoded: DataFrame | None = None,
) -> DataFrame:
    """Per-plane near-dup signatures for a mixed media batch, unified
    into the shared (media_id, plane, hash_hi, hash_lo, decode_ok)
    relation: orientation-normalized dHash for images
    (`image_dhash_oriented`), temporal dHash for MP4 videos
    (`video_temporal_dhash`), multi-bin Goertzel fingerprint for audio
    (`audio_goertzel_fingerprint`). Each operator already pushes its
    own media_type filter down before its Python stage, so a row's
    payload crosses the Arrow boundary exactly once, in its own
    plane's pass. Rows matching no plane (e.g. a webm video) are
    simply absent — the caller treats them like undecodable evidence
    (admitted docs-only, never indexed).

    Plane disjointness is STRUCTURAL, not an implicit contract on the
    operators' internal filters: each operator receives only the rows
    whose media_type IS its plane (one value per row, so the slices
    cannot overlap), and a future operator whose internal filter
    overlapped an existing plane still could not double-sign a row
    into two planes. Catalyst collapses the redundant double filter,
    so the guard costs nothing.

    ``video_frames`` / ``audio_windows`` / ``image_decoded``
    (optional): precomputed decode relations (`decode_mp4_frames`,
    `decode_audio_windows`, `decode_image_signature_tiles`) — the
    excerpt-aware gate needs every plane TWICE (whole-item signature
    plus content fingerprints), so it decodes each plane once and
    shares the persisted relation with `media_winnow_fps`."""
    from hridaya_steam_market_tracker_spark.operators import multimodal as mm

    cols = ["media_id", "hash_hi", "hash_lo", "decode_ok"]
    planes = (
        ("image", mm.image_dhash_oriented,
         {"decoded": image_decoded} if image_decoded is not None else {}),
        ("video", mm.video_temporal_dhash,
         {"frames": video_frames} if video_frames is not None else {}),
        ("audio", mm.audio_goertzel_fingerprint,
         {"windows": audio_windows} if audio_windows is not None else {}),
    )
    parts = [
        op(batch.filter(F.col("media_type") == plane), **kw)
        .select(*cols)
        .withColumn("plane", F.lit(plane))
        for plane, op, kw in planes
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _any_bands(signatures: DataFrame) -> DataFrame:
    """`dhash_bands` with the plane tag riding the explode (a
    scan-stage projection — no join back, no extra shuffle)."""
    return dhash_bands(signatures, carry=("plane",)).select(*_ANY_BAND_COLS)


def repair_any_media_band_index(spark: SparkSession, store_path: str) -> int:
    """`repair_media_band_index` for the unified store: decodable docs
    rows missing from bands/ are re-signatured through ALL planes and
    re-indexed. Same cheap-path/crash-heal contract (and the same
    ``mergeSchema`` read: schema inference from an arbitrary footer of
    a mixed-schema docs/ must never silently drop the flag column)."""
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")
    if not os.path.isdir(docs_path):
        return 0
    docs = spark.read.option("mergeSchema", "true").parquet(docs_path)
    cand = docs.filter(F.col("decode_ok")).select("media_id")
    if os.path.isdir(bands_path):
        band_ids = spark.read.parquet(bands_path).select("media_id").distinct()
        orphans = cand.join(band_ids, "media_id", "left_anti")
    else:
        orphans = cand
    orphans = orphans.localCheckpoint(eager=True)
    if orphans.isEmpty():
        return 0
    orphan_docs = docs.join(orphans, "media_id", "left_semi")
    repaired = _any_bands(media_signatures(orphan_docs)).localCheckpoint(
        eager=True
    )
    n = repaired.count()
    repaired.write.mode("append").partitionBy("plane", "band").parquet(
        bands_path
    )
    return n


def ingest_any_media_batch(
    batch_df: DataFrame,
    store_path: str,
    max_hamming: int = 3,
    excerpt_tau: float | None = None,
    excerpt_max_df: int = 50,
    excerpt_phases: int = 1,
    excerpt_image_plane: str = "grid",
    excerpt_audio_plane: str = "window",
    auto_compact_files: int | None = 1024,
    auto_compact_target_files: int = 8,
) -> None:
    """Process ONE mixed media micro-batch through the unified gate:
    per-plane signatures (image dHash / video temporal dHash / audio
    Goertzel fingerprint), ONE plane-keyed band join against the store
    index and the batch itself, admit leaders and genuinely-new items,
    append accepted blobs + their plane-tagged band rows. Designed for
    foreachBatch; replay is a no-op and heals a crash-orphaned index
    first. Rows with no verifiable signature — undecodable payloads,
    too-short clips, formats outside the codec set — are admitted
    docs-only with decode_ok false/null (dedup cannot gate on evidence
    it cannot read; the quality tier owns rejecting them), exactly the
    image gate's undecodable policy generalized.

    Store layout: docs/ as the image gate plus the same decode_ok
    discipline; bands/ hive-partitioned by (plane, band) so each
    plane's postings stay physically clustered and a batch of one
    modality scans only its own plane's directories.

    ``excerpt_tau`` (optional) additionally rejects a batch item whose
    content fingerprints are >= tau already stored — a window-aligned
    audio excerpt, a video subclip, or a tile-aligned image CROP of a
    stored item, the classes the whole-item hashes are structurally
    blind to — maintaining a third store component wfps/
    (hive-partitioned by plane; fp=NULL presence rows for
    unfingerprintable items). Directional: a new host
    containing a stored clip is admitted. The setting is a
    store-LIFETIME contract, ENFORCED: a ``_GATE_MODE`` marker records
    the store's mode at first ingest and a mixed-mode batch refuses
    loudly (`_check_gate_mode`) instead of silently weakening the gate;
    switch deliberately with `set_any_media_gate_mode`, after which
    the repair pass re-fingerprints stored items once.

    ``excerpt_phases`` (round 11, part of the same lifetime contract):
    phase-shifted content grids for the image/audio planes so
    NON-aligned crops and excerpts are rejected too (see
    `media_winnow_fps`); the wfps/ index grows <= phases^2x for
    images, <= phases x for audio, and the gate's join shapes are
    unchanged.

    ``excerpt_image_plane`` (round 12, same lifetime contract):
    ``"cdt"`` switches the image content plane to CONTENT-DEFINED
    anchors (`image_cdt_fingerprints`) — crops at ANY pixel offset
    are rejected, not just tile/phases lattice points, at ~constant
    index mass instead of phases^2. Recorded in the ``_GATE_MODE``
    marker; switching planes on a live store drops and rebuilds
    wfps/ exactly like a phases switch. ``excerpt_audio_plane``
    (round 12) is the 1-D twin: ``"cdt"`` rejects audio excerpts cut
    at ANY sample offset via content-defined sample anchors.

    ``"hybrid"`` (round 13, both planes): cdt anchors with a
    PER-ITEM fallback to the phased grid/window plane for LOW-ENTROPY
    content — flat/gradient rasters and silent/tonal clips collapse
    the anchor set to ~0-3 distinct tokens (the round-12 honest
    finding), leaving their crops/excerpts under-evidenced in pure
    cdt mode; the hybrid gate detects the collapse per item
    (`image_cdt_anchor_density` / `audio_cdt_anchor_density`,
    integer-exact) and indexes such items by the phased grid TOO, so
    lattice-aligned crops/excerpts of low-entropy items are rejected
    at r11 strength while content-ful items keep the exact
    any-offset guarantee. ``excerpt_phases`` then sizes the fallback
    grids.

    ``auto_compact_files`` (round 11): after the batch's appends, if
    the store's parquet part-file count exceeds this threshold,
    `compact_any_media_store` runs inside the batch — the same
    self-enforcing bounded-growth trigger as the text gate
    (streaming/corpus_ingest.ingest_batch); None disables."""
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
    _check_store_integrity(
        store_path,
        ("docs", "bands", "wfps") if excerpt_tau is not None
        else ("docs", "bands"),
    )
    _check_gate_mode(
        store_path, excerpt_tau is not None, excerpt_phases,
        excerpt_image_plane, excerpt_audio_plane,
    )
    repair_any_media_band_index(spark, store_path)
    if excerpt_tau is not None:
        repair_media_wfps_index(
            spark, store_path, phases=excerpt_phases,
            image_plane=excerpt_image_plane,
            audio_plane=excerpt_audio_plane,
        )
    stored = spark.read.parquet(docs_path) if os.path.isdir(docs_path) else None
    if stored is not None:
        batch = batch.join(stored.select("media_id"), "media_id", "left_anti")
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    sigs = None
    batch_wfps = None
    shared = []  # persisted per-plane decode relations (excerpt mode)
    decode_kw = {}
    try:
        if batch.isEmpty():
            return

        if excerpt_tau is not None:
            # Excerpt mode needs EVERY plane twice — whole-item
            # signature AND content fingerprints. Decode each plane
            # once into a persisted relation shared by both passes;
            # without this every payload crossed the Arrow decode
            # boundary twice per batch (the dominant batch cost).
            from hridaya_steam_market_tracker_spark.operators.multimodal import (
                decode_audio_windows,
                decode_image_signature_tiles,
                decode_mp4_frames,
            )

            decode_kw = {
                "video_frames": decode_mp4_frames(batch),
                "audio_windows": decode_audio_windows(
                    batch, phases=excerpt_phases
                ),
                "image_decoded": decode_image_signature_tiles(
                    batch, phases=excerpt_phases,
                    include_cdt=(
                        excerpt_image_plane in ("cdt", "hybrid")
                    ),
                ),
            }
            for df in decode_kw.values():
                shared.append(df.persist(StorageLevel.MEMORY_AND_DISK))
        sigs = media_signatures(batch, **decode_kw).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        b_bands = _any_bands(sigs)
        stored_bands = (
            spark.read.parquet(bands_path).select(*_ANY_BAND_COLS)
            if os.path.isdir(bands_path)
            else None
        )
        rejected = media_admission_rejects(
            stored_bands, b_bands, max_hamming, keys=_ANY_KEYS
        )
        if excerpt_tau is not None:
            wfps_path = os.path.join(store_path, "wfps")
            batch_wfps = media_winnow_fps(
                batch, phases=excerpt_phases,
                image_plane=excerpt_image_plane,
                audio_plane=excerpt_audio_plane, **decode_kw
            ).persist(StorageLevel.MEMORY_AND_DISK)
            stored_wfps = (
                spark.read.parquet(wfps_path).select(*_WFP_COLS)
                if os.path.isdir(wfps_path)
                else None
            )
            rejected = rejected.unionByName(
                media_excerpt_rejects(
                    stored_wfps, batch_wfps, excerpt_tau, excerpt_max_df
                )
            ).distinct()

        accepted = (
            batch.join(rejected, "media_id", "left_anti")
            .join(sigs.select("media_id", "decode_ok"), "media_id", "left")
            .localCheckpoint(eager=True)
        )
        accepted_bands = (
            _any_bands(sigs)
            .join(accepted.select("media_id"), "media_id", "left_semi")
            .localCheckpoint(eager=True)
        )
        if excerpt_tau is not None:
            accepted_wfps = batch_wfps.join(
                accepted.select("media_id"), "media_id", "left_semi"
            ).localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(docs_path)
        # Empty-append guard (see ingest_media_batch): a batch of only
        # unbandable items (e.g. one too-short clip) must not create an
        # unreadable schema-less bands/ or wfps/ directory.
        if not accepted_bands.isEmpty():
            (
                accepted_bands.write.mode("append")
                .partitionBy("plane", "band")
                .parquet(bands_path)
            )
        if excerpt_tau is not None and not accepted_wfps.isEmpty():
            (
                accepted_wfps.write.mode("append")
                .partitionBy("plane")
                .parquet(wfps_path)
            )
        from hridaya_steam_market_tracker_spark.streaming.corpus_ingest import (
            _store_part_files,
        )

        if (
            auto_compact_files is not None
            and _store_part_files(store_path) > auto_compact_files
        ):
            compact_any_media_store(
                spark, store_path, auto_compact_target_files
            )
    finally:
        if sigs is not None:
            sigs.unpersist()
        if excerpt_tau is not None and batch_wfps is not None:
            batch_wfps.unpersist()
        for df in shared:
            df.unpersist()
        batch.unpersist()


def compact_any_media_store(
    spark: SparkSession, store_path: str, target_files: int = 1
) -> dict[str, int]:
    """`compact_store` with the unified plane-tagged band shape and
    (plane, band) hive layout; an excerpt-aware store's wfps/ component
    is rewritten with the same rename-aside swap."""
    from hridaya_steam_market_tracker_spark.streaming.corpus_ingest import (
        _swap_dir,
    )

    _check_store_integrity(store_path, ("docs", "bands", "wfps"))
    out = compact_store(
        spark, store_path, target_files,
        band_cols=_ANY_BAND_COLS, partition_cols=("plane", "band"),
    )
    wfps_path = os.path.join(store_path, "wfps")
    if os.path.isdir(wfps_path):
        wf = spark.read.parquet(wfps_path).select(*_WFP_COLS)
        n = wf.count()
        tmp = wfps_path + ".compact.tmp"
        (
            wf.repartition(
                F.col("plane"),
                F.pmod(
                    F.hash(F.coalesce("fp", "media_id")), F.lit(target_files)
                ),
            )
            .write.mode("overwrite")
            .partitionBy("plane")
            .parquet(tmp)
        )
        _swap_dir(tmp, wfps_path)
        spark.catalog.refreshByPath(wfps_path)
        out["wfps"] = n
    return out


def start_dedup_any_media_ingest(
    stream_media: DataFrame,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_target_files: int = 8,
    **dedup_kwargs,
):
    """Wire a mixed media stream into the unified near-dup-gated store
    via foreachBatch(ingest_any_media_batch). Same serial-callback
    compaction contract as the single-plane gates."""

    def process(df: DataFrame, epoch: int) -> None:
        ingest_any_media_batch(df, store_path, **dedup_kwargs)
        if compact_every and (epoch + 1) % compact_every == 0:
            compact_any_media_store(
                df.sparkSession, store_path, compact_target_files
            )

    writer = stream_media.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Excerpt-aware admission (round 9; image crops round 10): the banded
# hash gate rejects whole-item near-dups; with ``excerpt_tau`` set, the
# unified gate ALSO rejects a new item most of whose CONTENT is already
# stored — a window-aligned audio excerpt, a video subclip, or a
# tile-aligned image crop of a stored item — via a content-fingerprint
# index (the same machinery the batch subclip/excerpt/crop queries
# value-check). Directional by design: a new HOST containing a stored
# clip is admitted (most of its fingerprints are new); a new clip
# contained in a stored host is redundant.
# ---------------------------------------------------------------------------

_WFP_COLS = ("media_id", "plane", "fp")


def media_winnow_fps(
    batch: DataFrame,
    video_frames: DataFrame | None = None,
    audio_windows: DataFrame | None = None,
    image_decoded: DataFrame | None = None,
    phases: int = 1,
    image_plane: str = "grid",
    audio_plane: str = "window",
) -> DataFrame:
    """(media_id, plane, fp) content fingerprints for the containment
    planes: winnowing fingerprints over the sequence planes (video
    frame tokens, audio window tokens) plus TILE fingerprints for
    images (`image_tile_fingerprints` — images have no sequence, so
    their content plane is the set of 8x8-tile tokens of the
    EXIF-upright raster; a tile-aligned CROP of a stored image is then
    rejected exactly like a video subclip). EVERY image/video/audio
    row in the batch gets at least one output row: items whose content
    yields no fingerprint (undecodable, shorter than one k-gram,
    smaller than one tile) carry a single fp=NULL presence row, so the
    index distinguishes 'indexed, nothing to match' from 'orphaned' —
    NULL never equi-joins, so presence rows can never evidence a
    rejection.

    ``phases`` (round 11): phase-shifted grids for the image tile and
    audio window planes (see `_tile_token_kernel` /
    `audio_window_token_text`) so NON-aligned crops and excerpts
    surface too; the video plane needs none (its token unit is a
    whole frame — every subclip is frame-aligned by construction).
    The audio plane then emits one token document per (clip, phase),
    so the winnowed (id, fp) pairs are deduped before the containment
    consumers count them (phases=1 keeps the historical single-doc
    plan untouched). When the shared ``audio_windows`` /
    ``image_decoded`` relations are supplied they must have been
    decoded with the SAME phases.

    ``image_plane`` (round 12): ``"grid"`` keeps the (phase-shifted)
    tile-grid fingerprints; ``"cdt"`` fingerprints images by
    CONTENT-DEFINED anchors instead (`image_cdt_fingerprints`) — the
    offset-INDEPENDENT plane, so a crop at ANY pixel offset is
    rejected, not just tile/phases lattice points, at ~the single
    grid's index mass. ``phases`` then applies to the audio plane
    only (CDT needs no phases — that is the point), and the shared
    ``image_decoded`` relation is ignored for the fp plane (its tile
    structs are grid tokens) UNLESS it was built with
    ``include_cdt=True`` — then its carried anchor structs are the
    one-decode path; a cdt-less shared relation falls back to the fp
    plane's own Arrow pass over image payloads.

    ``audio_plane`` (round 12): the 1-D twin — ``"cdt"`` fingerprints
    audio by content-defined SAMPLE anchors
    (`audio_cdt_fingerprints`) instead of the phased window
    tokenization, so an excerpt cut at ANY sample offset is rejected;
    ``phases`` and the shared ``audio_windows`` relation are then
    ignored for the fp plane (same documented extra decode as the
    image CDT mode)."""
    from hridaya_steam_market_tracker_spark.operators.dedup import (
        winnow_fingerprints,
    )
    from hridaya_steam_market_tracker_spark.operators.multimodal import (
        audio_cdt_fingerprints,
        audio_hybrid_fingerprints,
        audio_window_token_text,
        image_cdt_fingerprints,
        image_hybrid_fingerprints,
        image_tile_fingerprints,
        video_frame_token_text,
    )

    if image_plane not in ("grid", "cdt", "hybrid"):
        raise ValueError(
            f"image_plane={image_plane!r}: expected 'grid', 'cdt', or "
            "'hybrid'"
        )
    if audio_plane not in ("window", "cdt", "hybrid"):
        raise ValueError(
            f"audio_plane={audio_plane!r}: expected 'window', 'cdt', "
            "or 'hybrid'"
        )
    toks = video_frame_token_text(batch, frames=video_frames)
    if audio_plane == "window":
        toks = toks.unionByName(
            audio_window_token_text(
                batch, windows=audio_windows, phases=phases
            )
        )
    wfps = winnow_fingerprints(toks, id_col="media_id", k=3, w=4)
    if audio_plane == "window" and (
        phases > 1
        or (audio_windows is not None and "phase" in audio_windows.columns)
    ):
        wfps = wfps.dropDuplicates(["media_id", "fp"])
    if audio_plane == "cdt":
        wfps = wfps.unionByName(audio_cdt_fingerprints(batch))
    elif audio_plane == "hybrid":
        # anchors + per-clip low-entropy window fallback; the window
        # tokens ride the gate's shared phased decode, the anchors and
        # the density decision share one Arrow pass
        wfps = wfps.unionByName(
            audio_hybrid_fingerprints(
                batch, phases=phases, windows=audio_windows
            )
        )
    # one-decode path (cdt/hybrid): the shared relation carries the
    # anchors when built with include_cdt=True; otherwise the fps
    # plane pays its own Arrow pass (documented mode cost)
    cdt_decoded = (
        image_decoded
        if image_decoded is not None and "cdt" in image_decoded.columns
        else None
    )
    if image_plane == "cdt":
        ifps = image_cdt_fingerprints(batch, decoded=cdt_decoded)
    elif image_plane == "hybrid":
        ifps = image_hybrid_fingerprints(
            batch, phases=phases, decoded=cdt_decoded
        )
    else:
        ifps = image_tile_fingerprints(
            batch, decoded=image_decoded, phases=phases
        )
    fps = wfps.unionByName(ifps)
    ids = batch.filter(
        F.col("media_type").isin("image", "video", "audio")
    ).select("media_id", F.col("media_type").alias("plane"))
    return ids.join(fps, "media_id", "left").select(*_WFP_COLS)


def media_excerpt_rejects(
    stored_wfps: DataFrame | None,
    batch_wfps: DataFrame,
    tau: float,
    max_df: int = 50,
) -> DataFrame:
    """Batch items to REJECT as stored-content excerpts: the fraction
    of a batch item's fingerprints already present — in the store, or
    in lower-id items of the same batch (leader-keeps) — reaches
    ``tau``. Plane rides the join key; a shared fingerprint counts
    once however many stored items carry it (distinct before the
    count), so containment is a pure batch-side fraction.

    Same document-frequency cutoff as the oracled batch twin
    `winnow_containment_pairs` (operators/dedup.py): a fingerprint
    carried by > ``max_df`` items across store+batch is boilerplate —
    runs of silent audio windows, black frames — and cannot EVIDENCE
    a match (it stays in the ``n_fp`` denominator, exactly as the
    batch op keeps boilerplate in the min-side count), so
    common-content items are not falsely rejected and the gate's
    semantics track the oracle-checked batch path. The df prune also
    bounds join fan-out per fingerprint at 100 TB store sizes."""
    bf = batch_wfps.filter(F.col("fp").isNotNull())
    n = bf.groupBy("media_id").agg(F.count(F.lit(1)).alias("n_fp"))
    pop = bf.select("plane", "fp")
    if stored_wfps is not None:
        pop = pop.unionByName(
            stored_wfps.filter(F.col("fp").isNotNull()).select("plane", "fp")
        )
    rare = (
        pop.groupBy("plane", "fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= max_df)
        .select("plane", "fp")
    )
    bf = bf.join(rare, ["plane", "fp"], "left_semi")
    b = bf.select(F.col("media_id").alias("j"), "plane", "fp")
    a = bf.select(F.col("media_id").alias("i"), "plane", "fp")
    matched = (
        a.join(b, ["plane", "fp"])
        .filter(F.col("i") < F.col("j"))
        .select("j", "fp")
    )
    if stored_wfps is not None:
        s = (
            stored_wfps.filter(F.col("fp").isNotNull())
            .join(rare, ["plane", "fp"], "left_semi")
            .select(F.col("media_id").alias("i"), "plane", "fp")
        )
        matched = matched.unionByName(
            s.join(b, ["plane", "fp"]).select("j", "fp")
        )
    shared = matched.distinct().groupBy("j").agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    return (
        shared.join(n.withColumnRenamed("media_id", "j"), "j")
        .filter(F.col("n_shared") / F.col("n_fp") >= tau)
        .select(F.col("j").alias("media_id"))
    )


def repair_media_wfps_index(
    spark: SparkSession, store_path: str, phases: int = 1,
    image_plane: str = "grid", audio_plane: str = "window",
) -> int:
    """Re-index image/video/audio docs rows missing from wfps/ — the
    excerpt index's analog of `repair_any_media_band_index`, with the
    fp=NULL presence rows making 'nothing to fingerprint' a recorded
    state instead of a perpetual orphan. Also how a pre-crop-plane
    store upgrades: its image rows have no wfps rows, so the first
    excerpt-aware batch re-fingerprints them here, once — and how a
    phases switch rebuilds: `set_any_media_gate_mode` drops wfps/
    when the phase count changes, so every stored item re-enters
    here as an orphan and is re-fingerprinted at the gate's
    ``phases``."""
    docs_path = os.path.join(store_path, "docs")
    wfps_path = os.path.join(store_path, "wfps")
    if not os.path.isdir(docs_path):
        return 0
    docs = spark.read.option("mergeSchema", "true").parquet(docs_path)
    cand = docs.filter(
        F.col("media_type").isin("image", "video", "audio")
    ).select("media_id")
    if os.path.isdir(wfps_path):
        have = spark.read.parquet(wfps_path).select("media_id").distinct()
        orphans = cand.join(have, "media_id", "left_anti")
    else:
        orphans = cand
    orphans = orphans.localCheckpoint(eager=True)
    if orphans.isEmpty():
        return 0
    orphan_docs = docs.join(orphans, "media_id", "left_semi")
    repaired = media_winnow_fps(
        orphan_docs, phases=phases, image_plane=image_plane,
        audio_plane=audio_plane,
    ).localCheckpoint(eager=True)
    cnt = repaired.count()
    repaired.write.mode("append").partitionBy("plane").parquet(wfps_path)
    return cnt
