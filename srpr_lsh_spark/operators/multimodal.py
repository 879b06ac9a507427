"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Audio is this engine's first-class modality (decode → fingerprint → SRP in
``operators/signatures.py``). Image/video share the same Spark-side shape —
binary column in, fixed-width feature vector out, via Arrow-batched
``mapInPandas``.

Codec surface (mirrors the audio kernel's discipline, ``kernels/audio.py``):

- **real decoders** needing no external library:
  * binary netpbm images (``ppm`` P6 / ``pgm`` P5 — header parse +
    ``np.frombuffer``, zero per-pixel Python),
  * **``png``** — full real decode via stdlib ``zlib`` inflate + numpy
    unfiltering: 8-bit depth, color types 0/2/3/4/6 (gray, RGB, palette,
    gray+alpha, RGBA), all five filter types (None/Sub/Up/Average/Paeth);
    Adam7 interlacing is refused explicitly (rare in training corpora),
  * **``bmp``** — uncompressed 24/32-bit BI_RGB, bottom-up or top-down,
    row padding handled,
  * **``jpeg``** — REAL baseline-sequential decode in pure numpy
    (``operators/jpeg.py``: Huffman entropy decode, dequant + dezigzag,
    exact 8×8 IDCT, any chroma sampling factors, restart markers);
    progressive (SOF2) refused explicitly,
  * a raw-frame video container (``rawv``: magic + (w, h, n) header + n
    packed RGB frames);
- ``fake_deterministic`` — a seeded, content-addressed fake for plumbing
  tests that don't care about pixels;
- codecs with no stdlib/numpy path (h264/webp/...) raise
  ``NotImplementedError`` at the decode boundary — this container ships no
  video libraries; plug ffmpeg here on a real cluster. Everything
  downstream of decode (features, schema, batching, partition behavior) is
  identical for real and stubbed codecs.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

SUPPORTED_FAKE = "fake_deterministic"
_RAWV_MAGIC = b"RAWV"


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6). Pure numpy, like encode_pcm16_wav."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM is RGB")
    return f"P6\n{w} {h}\n255\n".encode() + np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def _parse_netpbm_header(blob: bytes) -> "tuple[bytes, int, int, int]":
    """→ (magic, width, height, data_offset); tolerates comment lines."""
    tokens, pos = [], 0
    while len(tokens) < 4 and pos < len(blob):
        # skip whitespace
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(blob) and blob[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(blob) and not blob[pos : pos + 1].isspace():
            pos += 1
        tokens.append(blob[start:pos])
    if len(tokens) < 4:
        raise ValueError("truncated netpbm header")
    pos += 1  # single whitespace after maxval
    return tokens[0], int(tokens[1]), int(tokens[2]), pos


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """(H, W[, C]) uint8 → PNG (8-bit, truecolor/gray, non-interlaced).
    ``filter_type`` applies ONE filter to every row (0/1/2 supported here —
    enough to exercise the decoder's unfilter paths in tests)."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    raw = np.ascontiguousarray(img, dtype=np.uint8)
    rows = []
    prev = np.zeros((w, c), dtype=np.uint8)
    for y in range(h):
        row = raw[y]
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            left = np.vstack([np.zeros((1, c), np.uint8), row[:-1]])
            filt = (row.astype(np.int16) - left).astype(np.uint8)
        elif filter_type == 2:  # Up
            filt = (row.astype(np.int16) - prev).astype(np.uint8)
        else:
            raise ValueError("encoder supports filter 0/1/2")
        rows.append(bytes([filter_type]) + filt.tobytes())
        prev = row
    idat = zlib.compress(b"".join(rows))

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )


def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> np.ndarray:
    """Filtered scanline stream → (h, w*bpp) uint8 (PNG spec §6)."""
    stride = w * bpp
    data = np.frombuffer(raw, dtype=np.uint8, count=h * (stride + 1)).reshape(
        h, stride + 1
    )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(data[y, 0])
        cur = data[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ft == 0:
            rec = cur
        elif ft == 1:  # Sub: left dependency → per-byte-lane cumsum mod 256
            rec = cur.reshape(w, bpp).cumsum(axis=0).reshape(stride) & 0xFF
        elif ft == 2:  # Up
            rec = (cur + prev) & 0xFF
        elif ft == 3:  # Average — sequential left dependency
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth — sequential left dependency
            rec = np.zeros(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                c_ = prev[x - bpp] if x >= bpp else 0
                p = a + b - c_
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c_)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c_)
                rec[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = rec.astype(np.uint8)
    return out


def decode_png(blob: bytes) -> np.ndarray:
    """PNG → (H, W, 3) uint8. 8-bit depth, color types 0/2/3/4/6, all five
    row filters; non-interlaced only (Adam7 refused explicitly)."""
    import zlib

    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    ctype = depth = interlace = None
    palette = None
    idat = []
    while pos + 8 <= len(blob):
        (length,) = struct.unpack(">I", blob[pos : pos + 4])
        tag = blob[pos + 4 : pos + 8]
        body = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if depth != 8:
        raise ValueError(f"PNG bit depth {depth} unsupported (8 only)")
    if interlace:
        raise ValueError("Adam7-interlaced PNG unsupported")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"PNG color type {ctype} unsupported")
    raw = zlib.decompress(b"".join(idat))
    px = _png_unfilter(raw, w, h, channels).reshape(h, w, channels)
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 2:
        return px.copy()
    if ctype == 3:
        if palette is None:
            raise ValueError("paletted PNG missing PLTE")
        return palette[px[:, :, 0]]
    if ctype == 4:  # gray+alpha: drop alpha
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3].copy()  # RGBA: drop alpha


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → 24-bit bottom-up BI_RGB BMP."""
    h, w, _ = img.shape
    pad = (4 - (w * 3) % 4) % 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        rows.append(img[y, :, ::-1].tobytes() + b"\x00" * pad)  # BGR order
    pixel_data = b"".join(rows)
    off = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", off + len(pixel_data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixel_data), 2835, 2835, 0, 0)
    return header + dib + pixel_data


def decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24/32-bit BI_RGB BMP → (H, W, 3) uint8; bottom-up or
    top-down (negative height); row padding handled."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    (off,) = struct.unpack("<I", blob[10:14])
    (dib_size,) = struct.unpack("<I", blob[14:18])
    if dib_size < 40:
        # a 12-byte BITMAPCOREHEADER lays out w/h/bpp at DIFFERENT offsets —
        # parsing it with the INFOHEADER layout below would read garbage, so
        # refuse explicitly (the module's convention for unsupported variants)
        raise ValueError(f"BMP DIB header size {dib_size} unsupported (need BITMAPINFOHEADER)")
    _, w, h_signed = struct.unpack("<Iii", blob[14:26])
    _planes, bpp = struct.unpack("<HH", blob[26:30])
    (compression,) = struct.unpack("<I", blob[30:34])
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"BMP bpp={bpp} compression={compression} unsupported")
    h = abs(h_signed)
    nb = bpp // 8
    stride = (w * nb + 3) & ~3
    rows = np.frombuffer(blob, dtype=np.uint8, count=h * stride, offset=off).reshape(
        h, stride
    )
    px = rows[:, : w * nb].reshape(h, w, nb)
    if h_signed > 0:
        px = px[::-1]  # bottom-up → top-down
    return px[:, :, 2::-1].copy()  # BGR(A) → RGB


def decode_image(blob: bytes, codec: str) -> np.ndarray:
    """→ (H, W, 3) uint8.

    ``ppm``/``pgm`` are decoded for real (header parse + ``np.frombuffer``);
    ``fake_deterministic`` hashes the payload into a small stable image;
    compressed codecs raise — plug pillow/opencv here on a real cluster."""
    if codec == "ppm":
        magic, w, h, off = _parse_netpbm_header(blob)
        if magic != b"P6":
            raise ValueError(f"not binary PPM: {magic!r}")
        return np.frombuffer(blob, dtype=np.uint8, count=w * h * 3, offset=off).reshape(h, w, 3)
    if codec == "pgm":
        magic, w, h, off = _parse_netpbm_header(blob)
        if magic != b"P5":
            raise ValueError(f"not binary PGM: {magic!r}")
        gray = np.frombuffer(blob, dtype=np.uint8, count=w * h, offset=off).reshape(h, w)
        return np.repeat(gray[:, :, None], 3, axis=2)
    if codec == "png":
        return decode_png(blob)
    if codec == "bmp":
        return decode_bmp(blob)
    if codec in ("jpeg", "jpg"):
        from srpr_lsh_spark.operators.jpeg import decode_jpeg

        return decode_jpeg(blob)
    if codec == SUPPORTED_FAKE:
        h = hashlib.blake2b(blob, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    raise NotImplementedError(
        f"image codec {codec!r}: no image library in this container; "
        "plug pillow/opencv here"
    )


def encode_rawv(frames: "list[np.ndarray]") -> bytes:
    """n (H, W, 3) uint8 frames → the rawv container:
    ``RAWV`` + ``<III`` (w, h, n) + n packed RGB frames."""
    h, w, _ = frames[0].shape
    out = [_RAWV_MAGIC, struct.pack("<III", w, h, len(frames))]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all frames must share one shape")
        out.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
    return b"".join(out)


def frame_sample(blob: bytes, codec: str, n_frames: int = 4) -> "list[np.ndarray]":
    """Video → up to ``n_frames`` evenly-sampled frames.

    ``rawv`` is decoded for real (evenly-strided frame pick, each frame one
    ``np.frombuffer``); the fake synthesizes deterministic frames; compressed
    codecs raise — plug ffmpeg here on a real cluster."""
    if codec == "rawv":
        if blob[:4] != _RAWV_MAGIC:
            raise ValueError("not a rawv payload")
        w, h, n = struct.unpack("<III", blob[4:16])
        frame_bytes = w * h * 3
        pick = np.unique(np.linspace(0, n - 1, min(n_frames, n)).astype(np.int64))
        return [
            np.frombuffer(
                blob, dtype=np.uint8, count=frame_bytes, offset=16 + int(i) * frame_bytes
            ).reshape(h, w, 3)
            for i in pick
        ]
    if codec == SUPPORTED_FAKE:
        return [decode_image(blob + bytes([i]), SUPPORTED_FAKE) for i in range(n_frames)]
    raise NotImplementedError(
        f"video codec {codec!r}: no video library in this container"
    )


def image_features(img: np.ndarray, dim: int = 16) -> np.ndarray:
    """Channel-histogram feature vector — numpy-only, real math (works on a
    real decoded image exactly as on the fake)."""
    hist = [
        np.histogram(img[..., c], bins=dim // 2, range=(0, 256))[0]
        for c in range(min(3, img.shape[-1]))
    ]
    v = np.concatenate(hist).astype(np.float64)[:dim]
    if v.size < dim:
        v = np.pad(v, (0, dim - v.size))
    n = np.linalg.norm(v)
    return (v / n).astype(np.float32) if n > 1e-12 else np.zeros(dim, np.float32)


def media_feature_schema() -> StructType:
    return StructType(
        [
            StructField("media_id", StringType(), False),
            StructField("n_frames", IntegerType(), False),
            StructField("features", ArrayType(FloatType(), False), False),
        ]
    )


def extract_media_features(
    media: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    codec_col: str = "codec",
    kind: str = "image",
    dim: int = 16,
) -> DataFrame:
    """binary media column → (media_id, n_frames, features) via mapInPandas.

    Same plumbing contract as the audio fingerprint stage: decode happens in
    the scan partition, only fixed-width features leave it.
    """

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ids, nfr, feats = [], [], []
            for mid, blob, codec in zip(pdf[id_col], pdf[bytes_col], pdf[codec_col]):
                blob = bytes(blob) if blob is not None else b""
                if kind == "video":
                    frames = frame_sample(blob, codec)
                else:
                    frames = [decode_image(blob, codec)]
                fv = np.mean([image_features(f, dim) for f in frames], axis=0)
                ids.append(mid)
                nfr.append(len(frames))
                feats.append(fv.astype(np.float32))
            yield pd.DataFrame(
                {"media_id": ids, "n_frames": np.array(nfr, dtype=np.int32), "features": feats}
            )

    cols = media.select(
        F.col(id_col).alias(id_col), F.col(bytes_col).alias(bytes_col),
        F.col(codec_col).alias(codec_col),
    )
    return cols.mapInPandas(gen, schema=media_feature_schema())
