"""Blob decompression for ingestion pipelines (WARC / CommonCrawl /
log-archive shapes): compressed documents arrive as binary columns and
must be inflated before any text operator runs.

Pure-stdlib codecs via Arrow-batched mapInPandas — zlib, gzip, bz2,
xz/lzma, and 'none' passthrough. Same distributed contract as the
media codecs (operators/multimodal.py): self-contained closures,
bounded Arrow batches, per-row honest failure marking instead of task
aborts (one poisoned member of a 100 TB archive must not kill the
stage). Reference has no binary ingestion; this extends the
LLM-pipeline surface per SURVEY §7 phase 5.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECOMPRESS_SCHEMA = (
    "doc_id long, codec string, n_bytes int, sha256 string, "
    "text string, decompress_ok boolean"
)


def decompress_blobs(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    codec_col: str = "codec",
) -> DataFrame:
    """Inflate every blob by its per-row codec name.

    Output: (doc_id, codec, n_bytes, sha256, text, decompress_ok) —
    n_bytes/sha256 describe the DECOMPRESSED bytes (the value-checkable
    facts), text is the utf-8 decode (replacement on invalid bytes).
    Unknown codecs and corrupt streams mark decompress_ok=false with
    NULL facts.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import bz2
        import gzip
        import hashlib
        import lzma
        import zlib

        codecs = {
            "zlib": zlib.decompress,
            "gzip": gzip.decompress,
            "bz2": bz2.decompress,
            "xz": lzma.decompress,
            "lzma": lzma.decompress,
            "none": lambda b: b,
        }

        for pdf in batches:
            recs = []
            for did, payload, codec in zip(
                pdf[id_col], pdf[payload_col], pdf[codec_col]
            ):
                fn = codecs.get(codec)
                try:
                    if fn is None:
                        raise ValueError(f"unknown codec {codec!r}")
                    raw = fn(bytes(payload or b""))
                    recs.append(
                        (
                            did,
                            codec,
                            len(raw),
                            hashlib.sha256(raw).hexdigest(),
                            raw.decode("utf-8", errors="replace"),
                            True,
                        )
                    )
                except (ValueError, OSError, EOFError, zlib.error, lzma.LZMAError):
                    recs.append((did, codec, None, None, None, False))
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "doc_id", "codec", "n_bytes", "sha256", "text", "decompress_ok",
                ],
            )

    return df.select(id_col, payload_col, codec_col).mapInPandas(
        op, schema=DECOMPRESS_SCHEMA
    )


WARC_SCHEMA = (
    "blob_id long, record_idx int, warc_type string, target_uri string, "
    "content_length int, payload_sha256 string, parse_ok boolean"
)


def parse_warc_records(
    df: DataFrame, id_col: str = "blob_id", payload_col: str = "payload"
) -> DataFrame:
    """Split WARC/1.0 blobs into records via Arrow-batched mapInPandas:
    per record, the WARC-Type, WARC-Target-URI, declared
    Content-Length, and the SHA-256 of the exact payload bytes — the
    CommonCrawl ingestion primitive. Operates on INFLATED bytes;
    compose with decompress_blobs for .warc.gz. One row per record;
    malformed blobs emit a single parse_ok=false row (per-row honest
    failure, no task aborts)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def records(blob: bytes):
            pos = 0
            idx = 0
            while pos < len(blob):
                if blob[pos : pos + 5] != b"WARC/":
                    raise ValueError("bad WARC record header")
                hdr_end = blob.find(b"\r\n\r\n", pos)
                if hdr_end < 0:
                    raise ValueError("unterminated WARC header")
                headers = {}
                for line in blob[pos:hdr_end].split(b"\r\n")[1:]:
                    k, _, v = line.partition(b":")
                    headers[k.strip().lower()] = v.strip()
                try:
                    length = int(headers[b"content-length"])
                except (KeyError, ValueError):
                    raise ValueError("WARC record missing Content-Length") from None
                body = blob[hdr_end + 4 : hdr_end + 4 + length]
                if len(body) != length:
                    raise ValueError("truncated WARC payload")
                if blob[hdr_end + 4 + length : hdr_end + 4 + length + 4] != b"\r\n\r\n":
                    raise ValueError("WARC record missing trailing CRLFCRLF")
                yield (
                    idx,
                    headers.get(b"warc-type", b"").decode("ascii", "replace"),
                    headers.get(b"warc-target-uri", b"").decode("ascii", "replace")
                    or None,
                    length,
                    hashlib.sha256(body).hexdigest(),
                )
                pos = hdr_end + 4 + length + 4
                idx += 1

        for pdf in batches:
            recs = []
            for bid, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    for idx, wtype, uri, length, sha in records(bytes(payload or b"")):
                        recs.append((bid, idx, wtype, uri, length, sha, True))
                except ValueError:
                    recs.append((bid, None, None, None, None, None, False))
            yield pd.DataFrame.from_records(
                recs,
                columns=[
                    "blob_id", "record_idx", "warc_type", "target_uri",
                    "content_length", "payload_sha256", "parse_ok",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(op, schema=WARC_SCHEMA)


def synth_warc(seed: int, n_records: int) -> bytes:
    """Deterministic WARC/1.0 blob: record j carries the closed-form
    URI http://example.com/<seed>/<j> and payload
    'payload <seed> <j> ' + 'x' * (10 + (seed + j) % 20), types
    rotating response/request/metadata — every parsed fact is
    arithmetic in (seed, j) for the SQL oracle."""
    out = bytearray()
    for j in range(n_records):
        wtype = ("response", "request", "metadata")[j % 3]
        body = (f"payload {seed} {j} " + "x" * (10 + (seed + j) % 20)).encode()
        out += (
            f"WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Record-ID: <urn:uuid:{seed}-{j}>\r\n"
            f"WARC-Target-URI: http://example.com/{seed}/{j}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body + b"\r\n\r\n"
    return bytes(out)


def synth_compressed_docs(spark, n: int = 54) -> DataFrame:
    """Oracle-checkable compressed-document table: the PLAINTEXT is
    closed-form in doc_id ('doc <i> ' + repeated lorem phrase), so a
    SQL oracle can recompute length and SHA-256 of the decompressed
    bytes without ever seeing the compressed payload — the codecs
    rotate by id (zlib/gzip/bz2/xz/none) and are free to be
    nondeterministic on the compressed side. Every 9th row (i % 9 == 7)
    is a corrupt digest blob to value-check failure marking."""
    import bz2
    import gzip
    import hashlib
    import lzma
    import zlib

    encoders = [
        ("zlib", zlib.compress),
        ("gzip", lambda b: gzip.compress(b, mtime=0)),
        ("bz2", bz2.compress),
        ("xz", lzma.compress),
        ("none", lambda b: b),
    ]
    rows = []
    for i in range(n):
        codec, enc = encoders[i % 5]
        if i % 9 == 7:
            payload = hashlib.md5(f"corrupt{i}".encode()).digest() * 4
            if codec == "none":  # passthrough can't fail on bytes; force one
                codec = "zlib"
        else:
            text = f"doc {i} " + "lorem ipsum dolor sit amet " * (3 + i % 5)
            payload = enc(text.encode())
        rows.append((i, codec, bytearray(payload)))
    return spark.createDataFrame(rows, "doc_id long, codec string, payload binary")
