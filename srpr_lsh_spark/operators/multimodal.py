"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Audio is this engine's first-class modality (decode → fingerprint → SRP in
``operators/signatures.py``). Image/video share the same Spark-side shape —
binary column in, fixed-width feature vector out, via Arrow-batched
``mapInPandas`` — so the plumbing (schema, batching, UDF signature, partition
behavior) is implemented and tested here, while the actual codecs are stubbed:
this container ships no image/video libraries, so ``decode`` raises
``NotImplementedError`` unless the deterministic test fake is requested
(FIXTURES discipline: fakes are seeded and content-addressed, so the plumbing
tests are real even though the pixels are not).
"""

from __future__ import annotations

import hashlib

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


def decode_image(blob: bytes, codec: str) -> np.ndarray:
    """→ (H, W, 3) uint8. Real decoders plug in here on a cluster with
    image libs (pillow/opencv); the deterministic fake hashes the payload
    into a small stable image so plumbing tests exercise real arrays."""
    if codec == SUPPORTED_FAKE:
        h = hashlib.blake2b(blob, digest_size=8).digest()
        rng = np.random.default_rng(int.from_bytes(h, "little"))
        return rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    raise NotImplementedError(
        f"image codec {codec!r}: no image library in this container; "
        "plug pillow/opencv here"
    )


def frame_sample(blob: bytes, codec: str, n_frames: int = 4) -> "list[np.ndarray]":
    """Video → n deterministic frames (stub; same contract as a real
    keyframe sampler)."""
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
