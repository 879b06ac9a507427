"""Multimodal plumbing tests — real Spark path, stubbed codecs (FIXTURES
discipline: deterministic fakes; NotImplementedError boundary for real ones)."""

import numpy as np
import pytest

from srpr_lsh_spark.operators.multimodal import (
    SUPPORTED_FAKE,
    decode_image,
    extract_media_features,
    frame_sample,
    image_features,
)


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
