"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed via Arrow-batched mapInPandas.

REAL codecs (pure stdlib, no image libraries needed): uncompressed
24-bit BI_RGB **BMP**, binary **PPM (P6)**, **PNG** (zlib inflate +
filters 0-4, 8-bit gray/RGB/palette/alpha, non-interlaced), and **GIF**
(87a/89a first frame, full LZW with dictionary growth, global/local
palettes, 4-pass interlace) decode to RGB pixel arrays and re-encode
(PNG as 8-bit RGB; GIF as an exact-palette clear-refreshed LZW stream).
Formats needing a DCT or container parser (jpg/mp4) remain
clearly-marked NotImplementedError stubs until a codec library is
plugged in; the 'fake' format keeps its digest-based deterministic
pseudo-decode for plumbing tests.

Scale posture: mapInPandas streams Arrow batches — memory is bounded
by spark.sql.execution.arrow.maxRecordsPerBatch regardless of blob
sizes; decode parallelism == partition count; no driver involvement.
All decode closures are self-contained (built by `_pixel_codec()` and
captured by value via cloudpickle), so executors need neither this
package on PYTHONPATH nor addPyFile.
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
        T.StructField("format", T.StringType(), True),  # bmp|ppm|png|jpg|wav|mp4|fake
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


def _pixel_codec():
    """Build self-contained (decode, encode) closures for the real
    pure-stdlib raster codecs.

    decode(payload, fmt) -> (width, height, rgb) where rgb is row-major
    RGB bytes (3 per pixel). Supported: 'bmp' (uncompressed 24-bit
    BI_RGB, bottom-up or top-down), 'ppm' (binary P6, maxval 255,
    header comments allowed), 'png' (8-bit gray/RGB/palette/alpha,
    filters 0-4, non-interlaced), 'gif' (GIF87a/89a first frame, full
    LZW, global/local palettes, Adam-style 4-pass interlace).
    encode(w, h, rgb, fmt) is the inverse (PNG encodes as 8-bit RGB
    filter 0; GIF as a clear-code-refreshed 9-bit LZW stream over an
    exact <=256-color palette). Anything else raises
    NotImplementedError — the honest stub seam for DCT/container
    formats.

    Returned closures capture no module globals, so cloudpickle ships
    them by value into mapInPandas workers.
    """
    import struct
    import zlib

    def gif_lzw_decode(data: bytes, min_code: int, limit: int) -> list[int]:
        clear, end = 1 << min_code, (1 << min_code) + 1
        code_size = min_code + 1
        table: list[list[int] | None] = [[i] for i in range(clear)] + [None, None]
        out: list[int] = []
        prev: list[int] | None = None
        acc = nbits = 0
        for byte in data:
            acc |= byte << nbits
            nbits += 8
            while nbits >= code_size:
                code = acc & ((1 << code_size) - 1)
                acc >>= code_size
                nbits -= code_size
                if code == clear:
                    table = [[i] for i in range(clear)] + [None, None]
                    code_size = min_code + 1
                    prev = None
                    continue
                if code == end:
                    return out
                if prev is None:
                    if code >= len(table) or table[code] is None:
                        raise ValueError("bad initial LZW code")
                    entry = table[code]
                else:
                    if code < len(table) and table[code] is not None:
                        entry = table[code]
                        table.append(prev + [entry[0]])
                    elif code == len(table):
                        entry = prev + [prev[0]]
                        table.append(entry)
                    else:
                        raise ValueError("bad LZW code")
                    if len(table) >= (1 << code_size) and code_size < 12:
                        code_size += 1
                out.extend(entry)
                prev = list(entry)
                if len(out) >= limit:
                    return out
        return out

    def decode(payload: bytes, fmt: str | None) -> tuple[int, int, bytes]:
        if not payload:
            raise ValueError("empty payload")
        payload = bytes(payload)
        if fmt == "ppm":
            def token(pos: int) -> tuple[bytes, int]:
                while pos < len(payload):
                    if payload[pos : pos + 1].isspace():
                        pos += 1
                    elif payload[pos : pos + 1] == b"#":
                        while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                            pos += 1
                    else:
                        break
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                return payload[start:pos], pos

            magic, pos = token(0)
            if magic != b"P6":
                raise ValueError("not a binary PPM (P6)")
            wtok, pos = token(pos)
            htok, pos = token(pos)
            mtok, pos = token(pos)
            w, h, maxval = int(wtok), int(htok), int(mtok)
            if maxval != 255:
                raise ValueError(f"unsupported PPM maxval {maxval}")
            if w <= 0 or h <= 0:
                # Downstream featurize/resize divide by w*h and w+h; a
                # zero-dimension raster must fail DECODE (-> decode_ok
                # false), not crash the task later.
                raise ValueError(f"degenerate PPM dimensions {w}x{h}")
            pos += 1  # exactly one whitespace byte separates header and raster
            rgb = payload[pos : pos + 3 * w * h]
            if len(rgb) != 3 * w * h:
                raise ValueError("truncated PPM raster")
            return w, h, rgb
        if fmt == "bmp":
            if payload[:2] != b"BM" or len(payload) < 54:
                raise ValueError("not a BMP")
            data_off = struct.unpack_from("<I", payload, 10)[0]
            w, h_signed = struct.unpack_from("<ii", payload, 18)
            bpp = struct.unpack_from("<H", payload, 28)[0]
            compression = struct.unpack_from("<I", payload, 30)[0]
            if bpp != 24 or compression != 0:
                raise NotImplementedError(
                    f"only uncompressed 24-bit BMP supported (bpp={bpp})"
                )
            top_down, h = h_signed < 0, abs(h_signed)
            if w <= 0 or h == 0:
                raise ValueError(f"degenerate BMP dimensions {w}x{h_signed}")
            stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
            if len(payload) < data_off + stride * h:
                raise ValueError("truncated BMP raster")
            out = bytearray(3 * w * h)
            for row in range(h):
                src = data_off + (row if top_down else h - 1 - row) * stride
                for x in range(w):
                    b, g, r = payload[src + 3 * x : src + 3 * x + 3]
                    o = 3 * (row * w + x)
                    out[o], out[o + 1], out[o + 2] = r, g, b
            return w, h, bytes(out)
        if fmt == "png":
            # Pure-stdlib PNG decoder (RFC 2083): zlib IDAT inflate +
            # scanline un-filtering. Supports bit depth 8, color types
            # 0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA;
            # alpha dropped), filters 0-4, non-interlaced only.
            if payload[:8] != b"\x89PNG\r\n\x1a\n":
                raise ValueError("not a PNG")
            pos, ihdr, plte, idat = 8, None, None, bytearray()
            while pos + 8 <= len(payload):
                ln, ctype = struct.unpack_from(">I4s", payload, pos)
                data = payload[pos + 8 : pos + 8 + ln]
                if len(data) != ln:
                    raise ValueError("truncated PNG chunk")
                if ctype == b"IHDR":
                    ihdr = struct.unpack(">IIBBBBB", data)
                elif ctype == b"PLTE":
                    plte = data
                elif ctype == b"IDAT":
                    idat += data
                elif ctype == b"IEND":
                    break
                pos += 12 + ln  # length + type + payload + crc
            if ihdr is None:
                raise ValueError("PNG missing IHDR")
            w, h, depth, color, comp, filt, interlace = ihdr
            if comp or filt:
                raise ValueError(f"bad PNG compression/filter method {comp}/{filt}")
            if interlace:
                raise NotImplementedError("Adam7-interlaced PNG not supported")
            if depth != 8:
                raise NotImplementedError(f"only 8-bit PNG supported (depth={depth})")
            channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
            if channels is None:
                raise ValueError(f"bad PNG color type {color}")
            if w <= 0 or h <= 0:
                raise ValueError(f"degenerate PNG dimensions {w}x{h}")
            try:
                raw = zlib.decompress(bytes(idat))
            except zlib.error as exc:
                raise ValueError(f"corrupt PNG IDAT: {exc}") from None
            stride = w * channels
            if len(raw) != h * (stride + 1):
                raise ValueError("truncated PNG raster")
            prev = bytearray(stride)
            flat = bytearray()
            p = 0
            for _row in range(h):
                ftype = raw[p]
                line = bytearray(raw[p + 1 : p + 1 + stride])
                p += 1 + stride
                if ftype == 1:  # Sub
                    for i in range(channels, stride):
                        line[i] = (line[i] + line[i - channels]) & 0xFF
                elif ftype == 2:  # Up
                    for i in range(stride):
                        line[i] = (line[i] + prev[i]) & 0xFF
                elif ftype == 3:  # Average
                    for i in range(stride):
                        a = line[i - channels] if i >= channels else 0
                        line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    for i in range(stride):
                        a = line[i - channels] if i >= channels else 0
                        b = prev[i]
                        c = prev[i - channels] if i >= channels else 0
                        pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                        pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                        line[i] = (line[i] + pred) & 0xFF
                elif ftype != 0:
                    raise ValueError(f"bad PNG filter type {ftype}")
                flat += line
                prev = line
            if color == 2:
                return w, h, bytes(flat)
            rgb = bytearray(3 * w * h)
            if color == 6:
                for i in range(w * h):
                    rgb[3 * i : 3 * i + 3] = flat[4 * i : 4 * i + 3]
            elif color == 0:
                for i in range(w * h):
                    rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = flat[i]
            elif color == 4:
                for i in range(w * h):
                    rgb[3 * i] = rgb[3 * i + 1] = rgb[3 * i + 2] = flat[2 * i]
            else:  # color == 3, palette
                if plte is None:
                    raise ValueError("palette PNG missing PLTE")
                for i in range(w * h):
                    off = flat[i] * 3
                    if off + 3 > len(plte):
                        raise ValueError("PNG palette index out of range")
                    rgb[3 * i : 3 * i + 3] = plte[off : off + 3]
            return w, h, bytes(rgb)
        if fmt == "gif":
            if payload[:6] not in (b"GIF87a", b"GIF89a"):
                raise ValueError("not a GIF")
            packed = payload[10]
            pos = 13
            gct = None
            if packed & 0x80:
                n = 2 << (packed & 7)
                gct = payload[pos : pos + 3 * n]
                pos += 3 * n
            while pos < len(payload):
                b0 = payload[pos]
                if b0 == 0x21:  # extension: label byte + data sub-blocks
                    pos += 2
                    while pos < len(payload) and payload[pos] != 0:
                        pos += 1 + payload[pos]
                    pos += 1
                elif b0 == 0x2C:  # image descriptor — first frame only
                    _l, _t, w, h = struct.unpack_from("<HHHH", payload, pos + 1)
                    ipacked = payload[pos + 9]
                    pos += 10
                    ct = gct
                    if ipacked & 0x80:
                        n = 2 << (ipacked & 7)
                        ct = payload[pos : pos + 3 * n]
                        pos += 3 * n
                    if ct is None:
                        raise ValueError("GIF image without a color table")
                    if w <= 0 or h <= 0:
                        raise ValueError(f"degenerate GIF dimensions {w}x{h}")
                    min_code = payload[pos]
                    pos += 1
                    data = bytearray()
                    while pos < len(payload) and payload[pos] != 0:
                        ln = payload[pos]
                        data += payload[pos + 1 : pos + 1 + ln]
                        pos += 1 + ln
                    idxs = gif_lzw_decode(bytes(data), min_code, w * h)
                    if len(idxs) < w * h:
                        raise ValueError("truncated GIF raster")
                    if ipacked & 0x40:  # 4-pass interlace -> logical order
                        order = (
                            list(range(0, h, 8))
                            + list(range(4, h, 8))
                            + list(range(2, h, 4))
                            + list(range(1, h, 2))
                        )
                        rows: list[list[int] | None] = [None] * h
                        for src_i, dest_r in enumerate(order):
                            rows[dest_r] = idxs[src_i * w : (src_i + 1) * w]
                        idxs = [x for row in rows for x in row]  # type: ignore[union-attr]
                    rgb = bytearray(3 * w * h)
                    for i, idx in enumerate(idxs[: w * h]):
                        off = idx * 3
                        if off + 3 > len(ct):
                            raise ValueError("GIF palette index out of range")
                        rgb[3 * i : 3 * i + 3] = ct[off : off + 3]
                    return w, h, bytes(rgb)
                elif b0 == 0x3B:
                    break
                else:
                    raise ValueError(f"bad GIF block 0x{b0:02x}")
            raise ValueError("GIF contains no image data")
        raise NotImplementedError(
            f"no codec for format {fmt!r} in this environment — "
            "plug PIL/torchaudio/ffmpeg here"
        )

    def encode(w: int, h: int, rgb: bytes, fmt: str | None) -> bytes:
        if fmt == "ppm":
            return b"P6\n%d %d\n255\n" % (w, h) + bytes(rgb)
        if fmt == "bmp":
            stride = (w * 3 + 3) & ~3
            raster = bytearray()
            for row in range(h - 1, -1, -1):  # bottom-up
                line = bytearray()
                for x in range(w):
                    o = 3 * (row * w + x)
                    line += bytes((rgb[o + 2], rgb[o + 1], rgb[o]))  # BGR
                raster += line.ljust(stride, b"\x00")
            size = 54 + len(raster)
            header = (
                b"BM"
                + struct.pack("<IHHI", size, 0, 0, 54)
                + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raster), 2835, 2835, 0, 0)
            )
            return bytes(header + raster)
        if fmt == "png":
            def chunk(ctype: bytes, data: bytes) -> bytes:
                return (
                    struct.pack(">I", len(data))
                    + ctype
                    + data
                    + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
                )

            raw = b"".join(
                b"\x00" + bytes(rgb[3 * w * r : 3 * w * (r + 1)]) for r in range(h)
            )
            return (
                b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b"")
            )
        if fmt == "gif":
            # Exact-palette GIF: unique colors become the (padded) global
            # color table; pixels stream as 9-bit LZW literal codes with a
            # clear-code refresh before the table would force a width
            # change — valid LZW any decoder accepts, no compression.
            colors: dict[bytes, int] = {}
            for i in range(w * h):
                c = bytes(rgb[3 * i : 3 * i + 3])
                if c not in colors:
                    colors[c] = len(colors)
            if len(colors) > 256:
                raise NotImplementedError(
                    f"GIF re-encode needs <=256 unique colors, got {len(colors)}"
                )
            palette = bytearray()
            for c in colors:
                palette += c
            palette = palette.ljust(3 * 256, b"\x00")
            codes = [256]  # leading clear
            for i in range(w * h):
                codes.append(colors[bytes(rgb[3 * i : 3 * i + 3])])
                # table grows by one per literal after the first; refresh
                # before it reaches 512 (the 9->10-bit boundary)
                if len(codes) % 250 == 0:
                    codes.append(256)
            codes.append(257)  # end of information
            acc = nbits = 0
            stream = bytearray()
            for code in codes:
                acc |= code << nbits
                nbits += 9
                while nbits >= 8:
                    stream.append(acc & 0xFF)
                    acc >>= 8
                    nbits -= 8
            if nbits:
                stream.append(acc & 0xFF)
            blocks = bytearray()
            for i in range(0, len(stream), 255):
                chunk = stream[i : i + 255]
                blocks += bytes((len(chunk),)) + chunk
            return (
                b"GIF89a"
                + struct.pack("<HH", w, h)
                + bytes((0x80 | 0x07, 0, 0))  # GCT present, 256 entries
                + bytes(palette)
                + b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
                + b"\x08"  # LZW min code size
                + bytes(blocks)
                + b"\x00\x3b"
            )
        raise NotImplementedError(f"no encoder for format {fmt!r}")

    return decode, encode




def extract_features(media: DataFrame) -> DataFrame:
    """Decode + featurize every blob via Arrow-batched mapInPandas.

    'bmp'/'ppm' rows decode to REAL pixels (pure-stdlib codecs) and
    featurize as per-channel mean/std + aspect; 'fake' keeps the
    digest pseudo-decode; compressed formats mark decode_ok=false.
    `op` is a self-contained closure (codec closures captured by
    value) — executors need neither this package on PYTHONPATH nor
    addPyFile.
    """
    feat_dim = _FEAT_DIM
    pixel_decode, _ = _pixel_codec()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def featurize(payload: bytes, fmt: str | None) -> list[float]:
            if fmt == "fake":
                digest = hashlib.sha256(payload or b"").digest()
                return [b / 255.0 for b in digest[:feat_dim]]
            w, h, rgb = pixel_decode(payload, fmt)
            n = w * h
            feats = []
            for ch in range(3):
                s = sum(rgb[3 * i + ch] for i in range(n))
                s2 = sum(rgb[3 * i + ch] ** 2 for i in range(n))
                mean = s / n
                var = s2 / n - mean * mean
                feats.append(mean / 255.0)
                feats.append((var if var > 0 else 0.0) ** 0.5 / 255.0)
            feats.append(w / (w + h))
            feats.append(h / (w + h))
            return feats

        for pdf in batches:
            feats, oks = [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                try:
                    feats.append(featurize(payload, fmt))
                    oks.append(True)
                except (NotImplementedError, ValueError):
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
    """Resize image rows via Arrow-batched mapInPandas.

    'bmp'/'ppm' rows are REALLY resized: decode to pixels,
    nearest-neighbor sample to (width, height), re-encode in the same
    format. 'fake' keeps its digest payload of width*height bytes;
    compressed formats mark resize_ok=false until a codec library is
    plugged in. Distributed contract: image-only pushdown BEFORE the
    Python stage so no video/audio bytes cross the Arrow boundary,
    self-contained closures, typed output schema with the new
    dimensions.
    """
    w, h = width, height
    pixel_decode, pixel_encode = _pixel_codec()

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def resize(payload: bytes, fmt: str | None) -> bytes:
            if fmt == "fake":
                digest = hashlib.sha256(payload or b"").digest()
                reps = (w * h) // len(digest) + 1
                return (digest * reps)[: w * h]
            sw, sh, rgb = pixel_decode(payload, fmt)
            out = bytearray(3 * w * h)
            for y in range(h):
                sy = min(y * sh // h, sh - 1)
                for x in range(w):
                    sx = min(x * sw // w, sw - 1)
                    src, dst = 3 * (sy * sw + sx), 3 * (y * w + x)
                    out[dst : dst + 3] = rgb[src : src + 3]
            return pixel_encode(w, h, bytes(out), fmt)

        for pdf in batches:
            payloads, oks = [], []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                try:
                    payloads.append(resize(payload, fmt))
                    oks.append(True)
                except (NotImplementedError, ValueError):
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
    """Deterministic synthetic media table for tests.

    Image rows rotate REAL encoded rasters ('bmp'/'ppm'/'png'/'gif',
    6x4 pixels derived from md5) so all four codecs run end-to-end;
    every 4th row stays 'jpg' (undecodable — exercises the failure
    marking) and the rest are 'fake' digest blobs."""
    _, encode = _pixel_codec()
    rows = []
    for i in range(n):
        mtype = ["image", "audio", "video"][i % 3]
        if i % 4 == 0:
            fmt = "jpg"  # undecodable without a codec library
        elif mtype == "image":
            fmt = ("bmp", "ppm", "png", "gif")[(i // 3) % 4]
        else:
            fmt = "fake"
        if fmt in ("bmp", "ppm", "png", "gif"):
            w, h = 6, 4
            rgb = (hashlib.md5(f"img{i}".encode()).digest() * 5)[: 3 * w * h]
            payload = encode(w, h, rgb, fmt)
        else:
            w = h = 64 if mtype == "image" else None
            payload = hashlib.md5(f"blob{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                mtype,
                fmt,
                bytearray(payload),
                w if mtype == "image" else None,
                h if mtype == "image" else None,
                5000 if mtype == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def synth_wav(seed: int, rate: int = 8000, n: int = 400) -> bytes:
    """Deterministic 16-bit mono PCM WAV (stdlib wave module): a sine
    whose frequency derives from the seed. Real, spec-conformant WAV
    bytes — the audio analog of the BMP/PPM rasters."""
    import io
    import math
    import struct
    import wave

    freq = 200.0 + 50.0 * (seed % 8)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        frames = b"".join(
            struct.pack(
                "<h", int(20000 * math.sin(2 * math.pi * freq * t / rate))
            )
            for t in range(n)
        )
        wf.writeframes(frames)
    return buf.getvalue()


def fake_audio_df(spark, n: int = 32) -> DataFrame:
    """Deterministic audio blob table: REAL WAV rows (stdlib-encoded
    PCM sines) with every 4th row an undecodable 'mp3' digest blob to
    exercise failure marking."""
    rows = []
    for i in range(n):
        if i % 4 == 0:
            fmt, payload = "mp3", hashlib.md5(f"audio{i}".encode()).digest() * 4
        else:
            fmt, payload = "wav", synth_wav(i)
        rows.append((i, "audio", fmt, bytearray(payload), None, None, None))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Decode + featurize audio blobs via Arrow-batched mapInPandas.

    'wav' rows parse with the stdlib wave module (REAL decode: header +
    PCM frames) into sample_rate / channels / duration_ms / rms / peak;
    compressed formats mark decode_ok=false — the same honest-stub seam
    as the image codecs. Audio-only pushdown happens BEFORE the Python
    stage so image/video rows never cross the Arrow boundary.
    """
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("n_channels", T.IntegerType()),
            T.StructField("duration_ms", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
            T.StructField("peak", T.DoubleType()),
            T.StructField("decode_ok", T.BooleanType()),
        ]
    )

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        def decode(payload: bytes, fmt: str | None):
            if fmt != "wav":
                raise NotImplementedError(f"no audio codec for {fmt!r}")
            with wave.open(io.BytesIO(payload), "rb") as wf:
                if wf.getsampwidth() != 2:
                    raise NotImplementedError("only 16-bit PCM supported")
                rate = wf.getframerate()
                ch = wf.getnchannels()
                nf = wf.getnframes()
                raw = wf.readframes(nf)
            samples = struct.unpack(f"<{nf * ch}h", raw)
            peak = max(abs(s) for s in samples) / 32768.0 if samples else 0.0
            rms = (
                (sum(s * s for s in samples) / len(samples)) ** 0.5 / 32768.0
                if samples
                else 0.0
            )
            return rate, ch, 1000.0 * nf / rate, rms, peak

        for pdf in batches:
            recs = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                try:
                    rate, ch, dur, rms, peak = decode(payload, fmt)
                    recs.append((mid, rate, ch, round(dur, 6), round(rms, 6), round(peak, 6), True))
                except (
                    NotImplementedError,
                    ValueError,
                    EOFError,
                    struct.error,
                    wave.Error,
                ):
                    recs.append((mid, None, None, None, None, None, False))
            yield pd.DataFrame.from_records(
                recs, columns=[f.name for f in out_schema.fields]
            )

    audio_only = media.filter(F.col("media_type") == "audio")
    return audio_only.mapInPandas(op, out_schema)
