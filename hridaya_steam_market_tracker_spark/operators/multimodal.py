"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

The container has no image/audio libraries, so the codec step is a
clearly-marked stub (deterministic fake decode / NotImplementedError
for real formats) — but the Spark-side contract is real and tested:
schemas, batch iteration, partition behavior, and UDF signatures are
exactly what a production decode would use; swapping `_fake_decode`
for PIL/ffmpeg is a one-function change.

Scale posture: mapInPandas streams Arrow batches — memory is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
sizes; decode parallelism == partition count; no driver involvement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata accompanying every media blob.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("format", T.StringType(), True),  # png|jpg|wav|mp4|fake
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, media_type string, n_bytes int, sha256 string, "
    "feat array<double>, decode_ok boolean"
)

_FEAT_DIM = 8


def _fake_decode(payload: bytes, fmt: str | None) -> list[float]:
    """STUB: deterministic fake feature extraction.

    Real formats raise until a codec library is installed; the 'fake'
    format hashes the payload into a small feature vector so the
    distributed plumbing is testable end-to-end.
    """
    if fmt != "fake":
        raise NotImplementedError(
            f"no codec for format {fmt!r} in this environment — "
            "plug PIL/torchaudio/ffmpeg here"
        )
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:_FEAT_DIM]]


def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every blob via Arrow-batched mapInPandas.

    `op` is a self-contained closure (decode nested inside) so
    cloudpickle ships it by value — executors need neither this package
    on PYTHONPATH nor addPyFile.
    """
    feat_dim = _FEAT_DIM

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def decode(payload: bytes, fmt: str | None) -> list[float]:
            if fmt != "fake":
                raise NotImplementedError(f"no codec for format {fmt!r}")
            digest = hashlib.sha256(payload or b"").digest()
            return [b / 255.0 for b in digest[:feat_dim]]

        for pdf in batches:
            feats, oks = [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                try:
                    feats.append(decode(payload, fmt))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "sha256": [
                        hashlib.sha256(p or b"").hexdigest() for p in pdf["payload"]
                    ],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per
    sampled timestamp (the decode itself is the stub above). Native
    explode of a generated timestamp grid — no Python for the fan-out."""
    grid = F.sequence(
        F.lit(0).cast("long"),
        F.greatest(F.col("duration_ms") - 1, F.lit(0)).cast("long"),
        F.lit(every_ms).cast("long"),
    )
    return (
        media.filter(F.col("media_type") == "video")
        .withColumn("frame_ts_ms", F.explode(grid))
        .select("media_id", "format", "frame_ts_ms", "payload")
    )


RESIZED_SCHEMA = (
    "media_id long, format string, width int, height int, "
    "payload binary, resize_ok boolean"
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """Resize plumbing for image rows via Arrow-batched mapInPandas.

    The pixel work is the stub (`fake` format produces a deterministic
    payload of exactly width*height bytes; real formats mark
    resize_ok=false until a codec is plugged in), but the distributed
    contract is production-shaped: image-only pushdown BEFORE the
    Python stage so no video/audio bytes cross the Arrow boundary,
    self-contained closure, typed output schema with the new
    dimensions.
    """
    w, h = width, height

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def resize(payload: bytes, fmt: str | None) -> bytes:
            if fmt != "fake":
                raise NotImplementedError(f"no codec for format {fmt!r}")
            digest = hashlib.sha256(payload or b"").digest()
            reps = (w * h) // len(digest) + 1
            return (digest * reps)[: w * h]

        for pdf in batches:
            payloads, oks = [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                try:
                    payloads.append(resize(payload, fmt))
                    oks.append(True)
                except NotImplementedError:
                    payloads.append(None)
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "format": pdf["format"],
                    "width": w,
                    "height": h,
                    "payload": payloads,
                    "resize_ok": oks,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        op, schema=RESIZED_SCHEMA
    )


def fake_media_df(spark, n: int = 64) -> DataFrame:
    """Deterministic synthetic media table for tests (format='fake')."""
    rows = []
    for i in range(n):
        payload = hashlib.md5(f"blob{i}".encode()).digest() * 4
        mtype = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                i,
                mtype,
                "fake" if i % 4 != 0 else "png",  # some undecodable rows
                bytearray(payload),
                64 if mtype == "image" else None,
                64 if mtype == "image" else None,
                5000 if mtype == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
