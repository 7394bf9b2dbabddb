"""PNG codec (functions/png.py): lossless round trips, every scanline
filter type, non-grey color types, robustness, and the Spark kernel."""

import struct
import zlib

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
    _chunk,
    _paeth,
    decode_png,
    encode_png_gray,
    encode_png_rgb,
)


def _gradient(w, h):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x * 7 + y * 13) % 256).astype(np.uint8)


def _filter_rows(img: np.ndarray, ftype: int) -> bytes:
    """Apply scanline filter `ftype` (the encoder side of unfiltering) to
    an 8-bit grey image — lets tests exercise every decode filter path
    with spec-correct streams."""
    h, w = img.shape
    out = bytearray()
    prev = bytes(w)
    for y in range(h):
        line = img[y].tobytes()
        out.append(ftype)
        for i in range(w):
            left = line[i - 1] if i else 0
            ul = prev[i - 1] if i else 0
            if ftype == 0:
                v = line[i]
            elif ftype == 1:
                v = (line[i] - left) & 0xFF
            elif ftype == 2:
                v = (line[i] - prev[i]) & 0xFF
            elif ftype == 3:
                v = (line[i] - ((left + prev[i]) >> 1)) & 0xFF
            else:
                v = (line[i] - _paeth(left, prev[i], ul)) & 0xFF
            out.append(v)
        prev = line
    return bytes(out)


def _png_gray_with_filter(img: np.ndarray, ftype: int) -> bytes:
    h, w = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(_filter_rows(img, ftype)))
        + _chunk(b"IEND", b"")
    )


class TestRoundTrip:
    def test_gray_lossless(self):
        img = _gradient(23, 11)
        w, h, luma = decode_png(encode_png_gray(img.reshape(-1), 23, 11))
        assert (w, h) == (23, 11)
        assert np.array_equal(np.array(luma).reshape(h, w), img)

    def test_rgb_luma_exact_formula(self):
        rng = np.random.RandomState(9)
        rgb = rng.randint(0, 256, (9, 14, 3)).astype(np.uint8)
        w, h, luma = decode_png(encode_png_rgb(rgb.reshape(-1), 14, 9))
        r, g, b = (rgb[..., i].astype(np.int64) for i in range(3))
        expect = (299 * r + 587 * g + 114 * b) // 1000
        assert np.array_equal(np.array(luma).reshape(h, w), expect)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_every_filter_type(self, ftype):
        img = _gradient(17, 9)
        w, h, luma = decode_png(_png_gray_with_filter(img, ftype))
        assert np.array_equal(np.array(luma).reshape(h, w), img)

    def test_indexed_and_alpha_types(self):
        # indexed (ctype 3) with a 4-entry palette
        idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
        plte = bytes([0, 0, 0, 255, 0, 0, 0, 255, 0, 255, 255, 255])
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
        raw = b"\x00" + idx[0].tobytes() + b"\x00" + idx[1].tobytes()
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", plte)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        w, h, luma = decode_png(payload)
        assert (w, h) == (2, 2)
        assert luma == [0, 299 * 255 // 1000, 587 * 255 // 1000, 255]
        # grey+alpha (ctype 4): alpha ignored, luma = grey channel
        ga = bytes([10, 200, 20, 100])  # two pixels (g,a)(g,a)
        ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 4, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"\x00" + ga))
            + _chunk(b"IEND", b"")
        )
        assert decode_png(payload) == (2, 1, [10, 20])


class TestRobustness:
    def test_not_png(self):
        with pytest.raises(ValueError, match="signature"):
            decode_png(b"\xff\xd8jpeg")

    def test_mislabeled_interlace_flag_is_corrupt(self):
        img = _gradient(8, 8)
        payload = bytearray(encode_png_gray(img.reshape(-1), 8, 8))
        # interlace byte: sig(8) + len(4) + 'IHDR'(4) + body offset 12.
        # A plain raster labeled Adam7 is SHORTER than the 7-pass raster
        # (72 vs 79 bytes at 8x8) — must fail as corrupt, not misdecode
        payload[8 + 4 + 4 + 12] = 1
        with pytest.raises(ValueError):
            decode_png(bytes(payload))

    def test_unknown_interlace_method_rejected(self):
        img = _gradient(8, 8)
        payload = bytearray(encode_png_gray(img.reshape(-1), 8, 8))
        payload[8 + 4 + 4 + 12] = 2
        with pytest.raises(ValueError, match="interlace"):
            decode_png(bytes(payload))

    def test_corrupt_inflate(self):
        img = _gradient(8, 8)
        payload = bytearray(encode_png_gray(img.reshape(-1), 8, 8))
        payload[40] ^= 0xFF  # stomp IDAT data
        with pytest.raises(ValueError):
            decode_png(bytes(payload))


def test_decode_image_kernel_on_png(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
        decode_image,
    )

    img = _gradient(12, 10)
    rows = [
        (1, bytearray(encode_png_gray(img.reshape(-1), 12, 10))),
        (2, bytearray(b"\x89PNG\r\n\x1a\n corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert got[1]["format"] == "png"
    assert (got[1]["width"], got[1]["height"]) == (12, 10)
    assert abs(got[1]["mean_luma"] - img.mean()) < 0.01  # lossless
    assert got[2]["decode_error"] is not None


class TestAdam7:
    def test_gray_roundtrip_odd_sizes(self):
        rng = np.random.default_rng(11)
        for w, h in [(1, 1), (2, 1), (7, 3), (8, 8), (13, 11), (33, 17), (4, 16)]:
            img = rng.integers(0, 256, (h, w), dtype=np.uint8)
            gw, gh, luma = decode_png(
                encode_png_gray(img.reshape(-1), w, h, interlace=True)
            )
            assert (gw, gh) == (w, h)
            assert np.array_equal(np.array(luma).reshape(h, w), img)

    def test_interlaced_equals_plain(self):
        img = _gradient(19, 13)
        plain = decode_png(encode_png_gray(img.reshape(-1), 19, 13))
        adam7 = decode_png(encode_png_gray(img.reshape(-1), 19, 13, interlace=True))
        assert plain == adam7

    def test_rgb_interlaced_luma(self):
        rng = np.random.default_rng(5)
        rgb = rng.integers(0, 256, (9, 14, 3), dtype=np.uint8)
        _, _, luma = decode_png(encode_png_rgb(rgb.reshape(-1), 14, 9, interlace=True))
        c = rgb.astype(np.int64)
        want = (299 * c[..., 0] + 587 * c[..., 1] + 114 * c[..., 2]) // 1000
        assert np.array_equal(np.array(luma).reshape(9, 14), want)

    def test_small_image_empty_passes(self):
        # 3x2: passes 2,3,4 are empty on x or y — spec says they emit
        # NOTHING, not even filter bytes; round-trip proves both sides
        img = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.uint8)
        _, _, luma = decode_png(encode_png_gray(img.reshape(-1), 3, 2, interlace=True))
        assert luma == [1, 2, 3, 4, 5, 6]

    def test_truncated_interlaced_raster(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
            _encode_raw,
        )

        img = _gradient(8, 8)
        raw = _encode_raw(img, interlace=True)
        ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw[:-5]))  # last pass runs short
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_png(payload)


class TestDepth16:
    def test_gray16_roundtrip_high_byte(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
            encode_png_gray16,
        )

        rng = np.random.default_rng(21)
        for w, h in [(1, 1), (7, 3), (13, 11)]:
            v = rng.integers(0, 65536, (h, w), dtype=np.uint16)
            for il in (False, True):
                gw, gh, luma = decode_png(
                    encode_png_gray16(v.ravel().tolist(), w, h, interlace=il)
                )
                assert (gw, gh) == (w, h)
                assert np.array_equal(np.array(luma).reshape(h, w), v >> 8)

    def test_indexed_16bit_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 3, 0, 0, 0)
        payload = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"PLTE", bytes(6))
            + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00"))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="indexed"):
            decode_png(payload)

    def test_other_depths_rejected(self):
        img = _gradient(8, 8)
        payload = bytearray(encode_png_gray(img.reshape(-1), 8, 8))
        payload[8 + 4 + 4 + 8] = 4  # depth byte -> 4-bit
        with pytest.raises(ValueError, match="8/16-bit"):
            decode_png(bytes(payload))


class TestRealFiles:
    """Streams from REAL encoders (libpng's own test image, tool-produced
    16-bit icons) — structural validation that the decoder handles
    real-world chunk layouts, not just our own encoder's output."""

    def test_libpng_pngtest_adam7_rgba(self):
        import os

        f = "/usr/share/doc/libpng-dev/examples/pngtest.png"
        if not os.path.exists(f):
            pytest.skip("libpng example image not on this host")
        with open(f, "rb") as fh:
            payload = fh.read()
        assert payload[28] == 1  # interlaced, color type 6 (RGBA)
        w, h, luma = decode_png(payload)
        assert (w, h) == (91, 69) and len(luma) == 91 * 69
        assert all(0 <= v <= 255 for v in luma)
        arr = np.array(luma)
        assert arr.std() > 10  # a picture, not a constant field

    def test_real_16bit_rgba_icons(self):
        import glob as _glob

        candidates = sorted(
            _glob.glob("/root/.pyenv/versions/*/lib/python*/idlelib/Icons/idle_*.png")
        )
        files = []
        for f in candidates:
            with open(f, "rb") as fh:
                payload = fh.read()
            if payload[24] == 16:  # keep only genuine 16-bit streams
                files.append(payload)
        if not files:
            pytest.skip("no 16-bit PNG fixtures on this host")
        for payload in files:
            w, h, luma = decode_png(payload)
            assert len(luma) == w * h and max(luma) <= 255
