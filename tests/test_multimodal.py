"""Multimodal tests — real decoders for uncompressed formats (ppm/pgm/rawv,
pure numpy like the WAV kernel), deterministic fake for plumbing, and a
NotImplementedError boundary for codecs needing external libraries."""

import numpy as np
import pytest

from srpr_lsh_spark.operators.multimodal import (
    SUPPORTED_FAKE,
    decode_image,
    encode_ppm,
    encode_rawv,
    extract_media_features,
    frame_sample,
    image_features,
)


def test_ppm_roundtrip():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, size=(9, 7, 3), dtype=np.uint8)
    blob = encode_ppm(img)
    got = decode_image(blob, "ppm")
    assert np.array_equal(got, img)


def test_ppm_with_comment_header():
    img = np.zeros((2, 3, 3), dtype=np.uint8)
    blob = b"P6\n# a comment line\n3 2\n255\n" + img.tobytes()
    assert np.array_equal(decode_image(blob, "ppm"), img)


def test_pgm_decodes_to_rgb():
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    blob = b"P5\n4 3\n255\n" + gray.tobytes()
    got = decode_image(blob, "pgm")
    assert got.shape == (3, 4, 3)
    assert np.array_equal(got[..., 0], gray) and np.array_equal(got[..., 2], gray)


def test_rawv_roundtrip_and_even_sampling():
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, size=(4, 5, 3), dtype=np.uint8) for _ in range(10)]
    blob = encode_rawv(frames)
    got = frame_sample(blob, "rawv", n_frames=4)
    assert len(got) == 4
    # evenly strided: first and last frames always included
    assert np.array_equal(got[0], frames[0])
    assert np.array_equal(got[-1], frames[9])
    # fewer frames than requested → all of them
    short = frame_sample(encode_rawv(frames[:2]), "rawv", n_frames=4)
    assert len(short) == 2


def test_decode_fake_deterministic():
    a = decode_image(b"payload-1", SUPPORTED_FAKE)
    b = decode_image(b"payload-1", SUPPORTED_FAKE)
    c = decode_image(b"payload-2", SUPPORTED_FAKE)
    assert a.shape == (16, 16, 3) and a.dtype == np.uint8
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)


def test_real_codecs_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\xff\xd8\xff", "jpeg")
    with pytest.raises(NotImplementedError):
        frame_sample(b"\x00", "h264")


def test_features_normalized():
    img = decode_image(b"x", SUPPORTED_FAKE)
    v = image_features(img, dim=16)
    assert v.shape == (16,)
    assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-5)


def test_spark_extraction_image_and_video(spark):
    rows = [(f"m{i}", bytes([i]) * 20, SUPPORTED_FAKE) for i in range(10)]
    media = spark.createDataFrame(rows, ["media_id", "bytes", "codec"])
    img = extract_media_features(media, kind="image").collect()
    assert len(img) == 10 and all(r["n_frames"] == 1 for r in img)
    vid = extract_media_features(media, kind="video").collect()
    assert len(vid) == 10 and all(r["n_frames"] == 4 for r in vid)
    # deterministic across partitionings
    img2 = extract_media_features(media.repartition(5), kind="image").collect()
    got = {r["media_id"]: tuple(r["features"]) for r in img}
    got2 = {r["media_id"]: tuple(r["features"]) for r in img2}
    assert got == got2
