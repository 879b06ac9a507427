"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Audio is this engine's first-class modality (decode → fingerprint → SRP in
``operators/signatures.py``). Image/video share the same Spark-side shape —
binary column in, fixed-width feature vector out, via Arrow-batched
``mapInPandas``.

Codec surface (mirrors the audio kernel's discipline, ``kernels/audio.py``):

- **real decoders** for the uncompressed formats that need no external
  library: binary netpbm images (``ppm`` P6 / ``pgm`` P5 — header parse +
  ``np.frombuffer``, zero per-pixel Python) and a raw-frame video container
  (``rawv``: magic + (w, h, n) header + n packed RGB frames);
- ``fake_deterministic`` — a seeded, content-addressed fake for plumbing
  tests that don't care about pixels;
- anything compressed (jpeg/png/h264/...) raises ``NotImplementedError`` at
  the decode boundary — this container ships no image/video libraries; plug
  pillow/opencv/ffmpeg here on a real cluster. Everything downstream of
  decode (features, schema, batching, partition behavior) is identical for
  real and stubbed codecs.
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
