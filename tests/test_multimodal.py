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


def test_no_library_codecs_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00", "webp")
    with pytest.raises(NotImplementedError):
        frame_sample(b"\x00", "h264")


class TestJpeg:
    @staticmethod
    def _psnr(a, b):
        mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255**2 / mse) if mse > 0 else float("inf")

    @staticmethod
    def _smooth(shape, seed):
        rng = np.random.default_rng(seed)
        small = rng.integers(
            0, 256, (max(shape[0] // 8, 2), max(shape[1] // 8, 2), 3)
        ).astype(float)
        img = np.kron(small, np.ones((8, 8, 1)))
        return np.clip(np.round(img), 0, 255).astype(np.uint8)[: shape[0], : shape[1]]

    def test_roundtrip_444(self):
        """8×8-blocky content is exactly representable at q=90 → lossless."""
        from srpr_lsh_spark.operators.jpeg import decode_jpeg, encode_jpeg

        img = self._smooth((48, 64), 0)
        got = decode_image(encode_jpeg(img, quality=90), "jpeg")
        assert got.shape == img.shape and np.array_equal(got, img)
        # natural (non-blocky) content at q=85: high-fidelity, not exact
        rng = np.random.default_rng(1)
        nat = np.clip(
            np.cumsum(np.cumsum(rng.integers(-3, 4, (40, 56, 3)), 0), 1) + 128,
            0, 255,
        ).astype(np.uint8)
        got = decode_jpeg(encode_jpeg(nat, quality=95))
        assert self._psnr(nat, got) > 35

    def test_roundtrip_420_and_odd_dims(self):
        from srpr_lsh_spark.operators.jpeg import decode_jpeg, encode_jpeg

        for shape in ((9, 13), (17, 31), (40, 24)):
            img = self._smooth(shape, 2)
            got = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
            assert got.shape == img.shape
            assert self._psnr(img, got) > 30

    def test_grayscale(self):
        from srpr_lsh_spark.operators.jpeg import decode_jpeg, encode_jpeg

        g = self._smooth((24, 40), 3)[:, :, 0]
        got = decode_jpeg(encode_jpeg(g, quality=95))
        assert got.shape == (24, 40, 3)
        assert self._psnr(np.repeat(g[:, :, None], 3, 2), got) > 40

    def test_restart_markers(self):
        from srpr_lsh_spark.operators.jpeg import decode_jpeg, encode_jpeg

        img = self._smooth((48, 64), 4)
        plain = decode_jpeg(encode_jpeg(img, quality=90))
        rst = decode_jpeg(encode_jpeg(img, quality=90, restart_interval=2))
        assert np.array_equal(plain, rst)

    def test_progressive_refused(self):
        from srpr_lsh_spark.operators.jpeg import decode_jpeg, encode_jpeg

        img = self._smooth((16, 16), 5)
        blob = bytearray(encode_jpeg(img))
        i = blob.find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError, match="baseline"):
            decode_jpeg(bytes(blob))


def _spec_filter_png(img: np.ndarray, filter_types: list) -> bytes:
    """Spec-literal (per-pixel, slow) PNG scanline filtering + zlib — an
    INDEPENDENT implementation to pin decode_png's unfilter paths, including
    Average(3) and Paeth(4) which our fast encoder never emits."""
    import struct as st
    import zlib

    h, w, c = img.shape
    prev = np.zeros((w * c,), np.int32)
    out = []
    for y in range(h):
        row = img[y].reshape(-1).astype(np.int32)
        ft = filter_types[y % len(filter_types)]
        filt = np.zeros_like(row)
        for x in range(row.size):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (row[x] - pred) & 0xFF
        out.append(bytes([ft]) + filt.astype(np.uint8).tobytes())
        prev = row
    idat = zlib.compress(b"".join(out))

    def chunk(tag, body):
        return (st.pack(">I", len(body)) + tag + body
                + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

    ihdr = st.pack(">IIBBBBB", w, h, 8, {1: 0, 3: 2, 4: 6}[c], 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", idat) + chunk(b"IEND", b""))


class TestPngBmp:
    def test_png_roundtrip_plain_and_sub_up(self):
        from srpr_lsh_spark.operators.multimodal import encode_png

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
        for ft in (0, 1, 2):
            got = decode_image(encode_png(img, filter_type=ft), "png")
            assert np.array_equal(got, img), ft

    def test_png_all_filters_vs_spec_literal(self):
        """Every filter type incl. Average/Paeth, mixed per row, RGB and
        RGBA, against the independent spec-literal filterer."""
        rng = np.random.default_rng(6)
        for c in (3, 4):
            img = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
            blob = _spec_filter_png(img, [0, 1, 2, 3, 4])
            got = decode_image(blob, "png")
            assert np.array_equal(got, img[:, :, :3])

    def test_png_gray_and_palette(self):
        from srpr_lsh_spark.operators.multimodal import encode_png

        rng = np.random.default_rng(7)
        gray = rng.integers(0, 256, (8, 6), dtype=np.uint8)
        got = decode_image(encode_png(gray), "png")
        assert np.array_equal(got, np.repeat(gray[:, :, None], 3, axis=2))
        # paletted: build by hand
        import struct as st
        import zlib

        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        idx = rng.integers(0, 16, (5, 4), dtype=np.uint8)
        raw = b"".join(bytes([0]) + idx[y].tobytes() for y in range(5))

        def chunk(tag, body):
            return (st.pack(">I", len(body)) + tag + body
                    + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        blob = (b"\x89PNG\r\n\x1a\n"
                + chunk(b"IHDR", st.pack(">IIBBBBB", 4, 5, 8, 3, 0, 0, 0))
                + chunk(b"PLTE", pal.tobytes())
                + chunk(b"IDAT", zlib.compress(raw))
                + chunk(b"IEND", b""))
        assert np.array_equal(decode_image(blob, "png"), pal[idx])

    def test_png_refuses_interlace_and_16bit(self):
        import struct as st
        import zlib

        def chunk(tag, body):
            return (st.pack(">I", len(body)) + tag + body
                    + st.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))

        for depth, inter in ((8, 1), (16, 0)):
            blob = (b"\x89PNG\r\n\x1a\n"
                    + chunk(b"IHDR", st.pack(">IIBBBBB", 2, 2, depth, 2, 0, 0, inter))
                    + chunk(b"IDAT", zlib.compress(b"\x00" * 26))
                    + chunk(b"IEND", b""))
            with pytest.raises(ValueError):
                decode_image(blob, "png")

    def test_bmp_roundtrip_with_padding(self):
        from srpr_lsh_spark.operators.multimodal import encode_bmp

        rng = np.random.default_rng(8)
        # width 5 → 15-byte rows → 1 byte padding exercised
        img = rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
        assert np.array_equal(decode_image(encode_bmp(img), "bmp"), img)

    def test_bmp_coreheader_rejected_cleanly(self):
        """A 12-byte BITMAPCOREHEADER lays out w/h/bpp at different offsets;
        parsing it with the INFOHEADER layout would read garbage — the codec
        must refuse explicitly instead (ADVICE r3)."""
        import struct

        # BITMAPCOREHEADER: size=12, w=4, h=4 (uint16!), planes=1, bpp=24
        dib = struct.pack("<IHHHH", 12, 4, 4, 1, 24)
        body = b"\x00" * (4 * 3 + 0) * 4
        off = 14 + len(dib)
        hdr = struct.pack("<2sIHHI", b"BM", off + len(body), 0, 0, off)
        with pytest.raises(ValueError, match="DIB header"):
            decode_image(hdr + dib + body, "bmp")


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
