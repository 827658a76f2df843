"""Streaming near-dup-gated corpus ingest — the CONTINUOUS twin of the
batch `dedup_incremental_delta` query (operators/dedup.py
`minhash_delta_near_duplicates`).

Reference analog: the ingest plane's replay-safe delta insert
(src/SQLinserts.py:515-584 upsert discipline, re-expressed for a
document corpus); the dedup tier itself is brief-added scale surface
with no reference analog. The store-maintenance pass below mirrors the
reference's retention/compression policies (src/SQLinserts.py:270-297)
that keep the hot set small.

State layout under ``store_path`` (plain parquet, single-writer — the
same assumption streaming/ingest.py documents):

* ``docs/``  — accepted documents.
* ``bands/`` — their banded MinHash signature index
  (doc_id, band, bucket), HIVE-PARTITIONED BY ``band`` (16 static
  values): the WRITE-ONCE state the incremental dedup design
  documents. Each micro-batch equi-joins its own bands against this
  store on (band, bucket); partitioning by band keeps each band's
  postings physically clustered, so the join's scan never interleaves
  bands and a compaction pass can rewrite one band directory at a
  time. The corpus TEXT is only re-read for the (small) candidate set
  that actually collides, via a semi-join pushdown on doc_id.
* ``wfps/``  — (excerpt-aware stores only) winnowing content
  fingerprints (doc_id, fp; fp=NULL presence rows), the text twin of
  the unified media gate's excerpt tier: rejects batch docs whose
  fingerprint content is already stored (quotes, chunk re-uploads —
  the class whole-document MinHash is blind to). Governed by the
  ``_GATE_MODE`` store-lifetime marker.

Store existence is checked with ``os.path.isdir`` — NOT a broad
except around the read — so a corrupted footer / permission error /
transient FS failure fails the micro-batch loudly instead of being
misread as "first batch: empty store" and silently admitting
duplicates into the persistent state.

Admission policy per micro-batch: a document is REJECTED when it has
an exact-Jaccard-verified near-dup among stored docs, or among
lower-id docs of the same batch (leader-keeps: the smallest id of a
within-batch dup group is admitted; its satellites are not). Replay of
a micro-batch is a no-op: already-stored doc_ids are anti-joined away
before any work, mirroring idempotent_append.

Maintenance: every micro-batch appends part files; after thousands of
batches the equi-join pays an ever-growing file-listing + tiny-file
scan cost. ``compact_store`` rewrites both stores down to a bounded
file count (tmp-dir-swap, the storage/layout.py compact_partition
pattern) without changing a single admission decision — call it every
N micro-batches or from a maintenance cron.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hridaya_steam_market_tracker_spark.operators.dedup import (
    _spread,
    banded_buckets,
    shingles,
    signatures_from_sets,
)

_BAND_COLS = ("doc_id", "band", "bucket")


def _swap_dir(tmp: str, live: str) -> None:
    """Replace ``live`` with ``tmp`` via rename-aside: the live directory
    is absent only between two atomic renames, not for the duration of an
    ``rmtree`` over the whole store. A crash in that narrow window leaves
    ``<live>.compact.tmp`` on disk without ``live`` — a state
    ``ingest_batch`` refuses loudly (see ``_check_store_integrity``)
    instead of silently treating the store as empty and re-admitting
    duplicates."""
    old = live + ".compact.old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.rename(live, old)
    os.rename(tmp, live)
    shutil.rmtree(old)


def _check_store_integrity(
    store_path: str, subdirs: tuple[str, ...] = ("docs", "bands")
) -> None:
    """Fail loudly on the one half-compacted state rename-aside can
    leave: a ``.compact.tmp`` (the fully-written compacted store) present
    without its live counterpart. Recovery is a single rename, which must
    be a deliberate operator action — never an implicit 'store is empty'.
    ``subdirs`` lists the store components (the excerpt-aware media gate
    adds ``wfps``)."""
    for sub in subdirs:
        live = os.path.join(store_path, sub)
        tmp = live + ".compact.tmp"
        if os.path.isdir(tmp) and not os.path.isdir(live):
            raise RuntimeError(
                f"half-compacted store: {tmp!r} exists without {live!r}; "
                f"a compaction crashed mid-swap. Recover with "
                f"os.rename({tmp!r}, {live!r}) before ingesting."
            )


def repair_band_index(
    spark: SparkSession,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
) -> int:
    """Re-index any docs/ rows missing from bands/ — the crash state a
    failure between `ingest_batch`'s two appends leaves behind
    (admitted docs permanently unindexed; replay anti-joins them away
    as already-stored, so their near-dups are admitted forever). Every
    text doc should have band rows, so orphan detection is one
    id-column anti-join per batch; only actual orphans are re-shingled.
    The media plane's `repair_media_band_index` is the same contract
    with a decode_ok restriction. Signature params MUST match the
    ingest's, or the repaired rows land in a different bucket space.
    Returns band rows written."""
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")
    if not os.path.isdir(docs_path):
        return 0
    docs = spark.read.parquet(docs_path)
    cand = docs.select("doc_id")
    if os.path.isdir(bands_path):
        band_ids = spark.read.parquet(bands_path).select("doc_id").distinct()
        orphans = cand.join(band_ids, "doc_id", "left_anti")
    else:
        orphans = cand
    # Cut lineage BEFORE the bands append refreshes bands_path (the
    # module's localCheckpoint lesson — the orphan set reads it).
    orphans = orphans.localCheckpoint(eager=True)
    if orphans.isEmpty():
        return 0
    orphan_docs = docs.join(orphans, "doc_id", "left_semi")
    repaired = banded_buckets(
        signatures_from_sets(
            _spread(orphan_docs, "doc_id").select(
                "doc_id", shingles(F.col("text"), n).alias("sh")
            ),
            num_hashes,
        ),
        num_hashes,
        bands,
    ).localCheckpoint(eager=True)
    cnt = repaired.count()
    repaired.write.mode("append").partitionBy("band").parquet(bands_path)
    return cnt


_TEXT_WFP_COLS = ("doc_id", "fp")

_GATE_MODE_MARKER = "_GATE_MODE"


def set_corpus_gate_mode(store_path: str, excerpt: bool) -> None:
    """Deliberately (re)declare a corpus store's admission mode — the
    explicit act `_check_corpus_gate_mode`'s refusal demands before a
    store may switch between plain and excerpt-aware ingest. After
    switching TO excerpt mode, the next excerpt-aware batch's repair
    pass fingerprints every stored doc into wfps/ once (a text re-read
    of docs/ — the documented upgrade cost, far cheaper than the media
    plane's payload re-decode)."""
    os.makedirs(store_path, exist_ok=True)
    with open(os.path.join(store_path, _GATE_MODE_MARKER), "w") as f:
        f.write("excerpt" if excerpt else "plain")


def _check_corpus_gate_mode(store_path: str, excerpt: bool) -> None:
    """The media gate's store-lifetime contract (`media_ingest.py:
    _check_gate_mode`), applied to the text plane: a store is EITHER
    plain OR excerpt-aware for its whole life. Mixed-mode ingest is
    refused loudly — plain batches into an excerpt store leave wfps/
    stale AND stop rejecting quotes; excerpt batches into a plain
    store silently pay a full-store re-fingerprint in repair.
    Marker-less stores are grandfathered by inference from wfps/
    existence, then the marker is written once."""
    mode = "excerpt" if excerpt else "plain"
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
        set_corpus_gate_mode(store_path, excerpt)
        return
    if stored_mode != mode:
        raise ValueError(
            f"store {store_path!r} was ingested in {stored_mode!r} mode "
            f"but this batch requests {mode!r}: mixed-mode ingest "
            "silently weakens the gate (stale wfps/, unrejected "
            "excerpts). Keep excerpt_tau consistent for the store's "
            "lifetime, or switch deliberately with "
            f"set_corpus_gate_mode({store_path!r}, excerpt={excerpt})."
        )
    if not os.path.isfile(marker):
        set_corpus_gate_mode(store_path, excerpt)


def corpus_winnow_fps(docs: DataFrame, k: int = 3, w: int = 4) -> DataFrame:
    """(doc_id, fp) content fingerprints for the text containment
    plane: the SAME winnowing selection the oracled batch queries ride
    (`operators/dedup.py:winnow_fingerprints` — any shared run of
    >= k+w-1 words shares a selected fingerprint). EVERY batch doc
    gets at least one output row: docs whose text yields no
    fingerprint (empty/untokenizable) carry a single fp=NULL presence
    row, so the index distinguishes 'indexed, nothing to match' from
    'orphaned' — NULL never equi-joins, so presence rows can never
    evidence a rejection (the media plane's exact discipline)."""
    from hridaya_steam_market_tracker_spark.operators.dedup import (
        winnow_fingerprints,
    )

    fps = winnow_fingerprints(docs, id_col="doc_id", k=k, w=w)
    return (
        docs.select("doc_id")
        .join(fps, "doc_id", "left")
        .select(*_TEXT_WFP_COLS)
    )


def corpus_excerpt_rejects(
    stored_wfps: DataFrame | None,
    batch_wfps: DataFrame,
    tau: float,
    max_df: int = 50,
) -> DataFrame:
    """Batch docs to REJECT as stored-content excerpts (quotes,
    mirrored passages, chunk re-uploads): the literal media decision
    function (`media_ingest.py:media_excerpt_rejects` — df-capped
    evidence, unpruned denominator, distinct shared fps, stored +
    lower-id leader-keeps, >= tau) run on the text plane, so the two
    gates cannot drift apart. Directional: a new doc CONTAINING a
    stored doc is admitted (most of its fingerprints are new)."""
    from hridaya_steam_market_tracker_spark.streaming.media_ingest import (
        media_excerpt_rejects,
    )

    def as_media(df: DataFrame) -> DataFrame:
        return df.select(
            F.col("doc_id").alias("media_id"),
            F.lit("text").alias("plane"),
            "fp",
        )

    out = media_excerpt_rejects(
        as_media(stored_wfps) if stored_wfps is not None else None,
        as_media(batch_wfps),
        tau,
        max_df,
    )
    return out.select(F.col("media_id").alias("doc_id"))


def repair_corpus_wfps_index(spark: SparkSession, store_path: str) -> int:
    """Fingerprint any docs/ rows missing from wfps/ — the crash state
    a failure between ingest_batch's appends leaves, and the one-time
    upgrade path after `set_corpus_gate_mode(store, excerpt=True)`.
    Presence rows make orphan detection one id anti-join; only actual
    orphans re-fingerprint. Returns wfps rows written."""
    docs_path = os.path.join(store_path, "docs")
    wfps_path = os.path.join(store_path, "wfps")
    if not os.path.isdir(docs_path):
        return 0
    docs = spark.read.parquet(docs_path)
    cand = docs.select("doc_id")
    if os.path.isdir(wfps_path):
        known = spark.read.parquet(wfps_path).select("doc_id").distinct()
        orphans = cand.join(known, "doc_id", "left_anti")
    else:
        orphans = cand
    orphans = orphans.localCheckpoint(eager=True)
    if orphans.isEmpty():
        return 0
    repaired = corpus_winnow_fps(
        docs.join(orphans, "doc_id", "left_semi")
    ).localCheckpoint(eager=True)
    cnt = repaired.count()
    repaired.write.mode("append").parquet(wfps_path)
    return cnt


def _store_part_files(store_path: str) -> int:
    """Count parquet part files across the store's components — the
    quantity whose unbounded growth (one file set per micro-batch
    append) is what elevates late-batch cost, NOT store content (the
    round-6 and round-10 rehearsals both measured flat content cost
    with file-count-driven elevation). Pure os.walk: no Spark job, no
    listing RPC amplification beyond what every batch's read already
    pays."""
    total = 0
    for comp in ("docs", "bands", "wfps"):
        root = os.path.join(store_path, comp)
        for _, _, files in os.walk(root):
            total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def ingest_batch(
    batch_df: DataFrame,
    store_path: str,
    num_hashes: int = 32,
    bands: int = 16,
    n: int = 3,
    threshold: float = 0.5,
    excerpt_tau: float | None = None,
    excerpt_max_df: int = 50,
    auto_compact_files: int | None = 1024,
    auto_compact_target_files: int = 8,
) -> None:
    """Process ONE micro-batch: dedup against the store and within the
    batch, then append accepted docs + their bands. Designed for
    foreachBatch; calling it twice with the same batch is a no-op (and
    heals a crash-orphaned band index first — see repair_band_index).

    ``excerpt_tau`` (optional) additionally rejects a batch doc whose
    winnowing fingerprints are >= tau already stored — a quote,
    mirrored passage, or chunk re-upload of stored content, the class
    whole-document MinHash is structurally blind to (a short excerpt's
    Jaccard vs its long host is small) — maintaining a third store
    component wfps/, the text twin of the unified media gate's
    excerpt tier. Directional (a new host containing a stored doc is
    admitted); same df<=max_df boilerplate cap as the oracled batch
    containment query; the setting is a store-LIFETIME contract
    enforced by a ``_GATE_MODE`` marker with loud mixed-mode refusal
    (`_check_corpus_gate_mode`); switch deliberately with
    `set_corpus_gate_mode`, after which the repair pass fingerprints
    stored docs once.

    ``auto_compact_files`` (round 11): after the batch's appends, if
    the store's parquet part-file count exceeds this threshold,
    `compact_store` runs INSIDE the batch (safe — foreachBatch
    callbacks are serial on the one writer), rewriting each component
    down to ``auto_compact_target_files``. This makes the documented
    bounded-growth claim SELF-ENFORCING: the round-10 text rehearsal
    showed late-batch cost elevation from append-file growth that
    only a manual compact_store reset; with the trigger, per-batch
    cost stays within the early-batch band with zero operator action
    (rep=10 rehearsal, tools/scale_rehearsal.py). None disables (the
    epoch-cadence ``compact_every`` of `start_dedup_ingest` remains
    available for callers that prefer a schedule)."""
    from pyspark import StorageLevel

    spark = batch_df.sparkSession
    docs_path = os.path.join(store_path, "docs")
    bands_path = os.path.join(store_path, "bands")

    batch = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
    _check_store_integrity(
        store_path,
        ("docs", "bands", "wfps") if excerpt_tau is not None
        else ("docs", "bands"),
    )
    _check_corpus_gate_mode(store_path, excerpt_tau is not None)
    repair_band_index(spark, store_path, num_hashes, bands, n)
    if excerpt_tau is not None:
        repair_corpus_wfps_index(spark, store_path)
    # isdir, not try/except around the read: a real read failure on an
    # existing store must fail the batch, never alias to "empty store".
    stored_docs = spark.read.parquet(docs_path) if os.path.isdir(docs_path) else None
    if stored_docs is not None:
        batch = batch.join(stored_docs.select("doc_id"), "doc_id", "left_anti")
    batch = batch.persist(StorageLevel.MEMORY_AND_DISK)
    sets = None
    batch_wfps = None
    try:
        if batch.isEmpty():
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
        # ... plus store-vs-batch candidates from the persisted index
        # (band is the hive partition column of the store; selecting by
        # name restores the logical (doc_id, band, bucket) shape).
        if os.path.isdir(bands_path):
            s_bands = spark.read.parquet(bands_path).select(*_BAND_COLS)
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
        if excerpt_tau is not None:
            wfps_path = os.path.join(store_path, "wfps")
            batch_wfps = corpus_winnow_fps(batch).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            stored_wfps = (
                spark.read.parquet(wfps_path).select(*_TEXT_WFP_COLS)
                if os.path.isdir(wfps_path)
                else None
            )
            rejected = rejected.unionByName(
                corpus_excerpt_rejects(
                    stored_wfps, batch_wfps, excerpt_tau, excerpt_max_df
                )
            ).distinct()

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
        if excerpt_tau is not None:
            accepted_wfps = batch_wfps.join(
                accepted.select("doc_id"), "doc_id", "left_semi"
            ).localCheckpoint(eager=True)
        accepted.write.mode("append").parquet(docs_path)
        (
            banded_buckets(
                signatures_from_sets(
                    _spread(accepted, "doc_id").select(
                        "doc_id", shingles(F.col("text"), n).alias("sh")
                    ),
                    num_hashes,
                ),
                num_hashes,
                bands,
            )
            .write.mode("append")
            .partitionBy("band")
            .parquet(bands_path)
        )
        if excerpt_tau is not None and not accepted_wfps.isEmpty():
            accepted_wfps.write.mode("append").parquet(
                os.path.join(store_path, "wfps")
            )
        if (
            auto_compact_files is not None
            and _store_part_files(store_path) > auto_compact_files
        ):
            compact_store(spark, store_path, auto_compact_target_files)
    finally:
        # In finally (not the try body): a failed parquet append must
        # not leak the persisted shingle frame into the long-lived
        # streaming session. `sets` is None on the early empty-return.
        if sets is not None:
            sets.unpersist()
        if batch_wfps is not None:
            batch_wfps.unpersist()
        batch.unpersist()


def compact_store(
    spark: SparkSession,
    store_path: str,
    target_files: int = 1,
    band_cols: tuple[str, ...] = _BAND_COLS,
    partition_cols: tuple[str, ...] = ("band",),
) -> dict[str, int]:
    """Rewrite the append-only ``docs/`` and ``bands/`` stores down to a
    bounded part-file count. Admission decisions are a pure function of
    store CONTENT, so compaction is semantically invisible — it only
    removes the O(#micro-batches) file-listing and tiny-file scan cost
    from every subsequent batch's equi-join.

    * ``docs/``: at most ``target_files`` files.
    * ``bands/``: at most ``target_files`` files per band partition —
      rows shuffle on (band, pmod(hash(bucket), target_files)), so each
      band's rows land in at most ``target_files`` tasks and the
      partitionBy writer emits at most that many files per band dir.

    The rewrite goes to ``<store>.compact.tmp`` first and swaps in via
    rename-aside (``_swap_dir``): live → ``.compact.old``, tmp → live,
    then remove old — so the live directory is missing only between two
    atomic renames, never for the duration of an ``rmtree``. A crash
    before the swap leaves the original store intact; a crash mid-swap
    leaves the tmp dir without a live one, which ``ingest_batch``
    refuses loudly rather than re-admitting duplicates. Single-writer
    discipline applies: do not run concurrently with an active ingest
    query.

    ``band_cols`` is the band store's logical column set — the text
    plane's (doc_id, band, bucket) by default; the media plane passes
    its hash-carrying shape (streaming/media_ingest.py). Both planes
    share (band, bucket), which is all the rewrite shuffles on.
    ``partition_cols`` is the hive layout of bands/ — ("band",) for the
    text/image planes, ("plane", "band") for the unified media gate.

    Returns rows rewritten per store.
    """
    # Same loud refusal as ingest_batch: compacting a half-compacted
    # store would silently skip the missing live dir via the isdir()
    # guards below and could clobber the only surviving copy in
    # ``.compact.tmp`` on the next write. Recovery must stay a
    # deliberate single rename.
    _check_store_integrity(store_path, ("docs", "bands", "wfps"))
    rewritten: dict[str, int] = {}

    docs_path = os.path.join(store_path, "docs")
    if os.path.isdir(docs_path):
        docs = spark.read.parquet(docs_path)
        n = docs.count()
        tmp = docs_path + ".compact.tmp"
        docs.repartition(target_files).write.mode("overwrite").parquet(tmp)
        _swap_dir(tmp, docs_path)
        spark.catalog.refreshByPath(docs_path)
        rewritten["docs"] = n

    bands_path = os.path.join(store_path, "bands")
    if os.path.isdir(bands_path):
        b = spark.read.parquet(bands_path).select(*band_cols)
        n = b.count()
        tmp = bands_path + ".compact.tmp"
        (
            b.repartition(
                *[F.col(c) for c in partition_cols],
                F.pmod(F.hash("bucket"), F.lit(target_files)),
            )
            .write.mode("overwrite")
            .partitionBy(*partition_cols)
            .parquet(tmp)
        )
        _swap_dir(tmp, bands_path)
        spark.catalog.refreshByPath(bands_path)
        rewritten["bands"] = n

    # An excerpt-aware TEXT store's wfps/ component (flat (doc_id, fp)
    # — no hive partitioning; the unified media gate compacts its own
    # plane-partitioned wfps/ in compact_any_media_store instead, and
    # its store never grows this directory with these columns).
    wfps_path = os.path.join(store_path, "wfps")
    if os.path.isdir(wfps_path) and band_cols == _BAND_COLS:
        wf = spark.read.parquet(wfps_path).select(*_TEXT_WFP_COLS)
        n = wf.count()
        tmp = wfps_path + ".compact.tmp"
        (
            wf.repartition(
                F.pmod(
                    F.hash(F.coalesce("fp", "doc_id")), F.lit(target_files)
                )
            )
            .write.mode("overwrite")
            .parquet(tmp)
        )
        _swap_dir(tmp, wfps_path)
        spark.catalog.refreshByPath(wfps_path)
        rewritten["wfps"] = n
    return rewritten


def start_dedup_ingest(
    stream_docs: DataFrame,
    store_path: str,
    checkpoint_path: str,
    available_now: bool = True,
    compact_every: int | None = None,
    compact_target_files: int = 8,
    **dedup_kwargs,
):
    """Wire a streaming document source into the near-dup-gated store
    via foreachBatch(ingest_batch). Returns the StreamingQuery.

    ``compact_every=N`` runs `compact_store` after every Nth epoch —
    safe because foreachBatch callbacks execute serially on the one
    writer, so maintenance can never race an ingest append. The round-6
    rehearsal measured the policy's economics: 16 new band part files
    per micro-batch grow per-batch cost ~50% over 20 batches, and one
    compaction (~half a batch of wall time) resets the curve
    (PLANS.md, SCALE round 6). Epoch numbers restart from the stream
    checkpoint, so the cadence survives query restarts."""

    def process(df: DataFrame, epoch: int) -> None:
        ingest_batch(df, store_path, **dedup_kwargs)
        if compact_every and (epoch + 1) % compact_every == 0:
            compact_store(df.sparkSession, store_path, compact_target_files)

    writer = stream_docs.writeStream.foreachBatch(process).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
