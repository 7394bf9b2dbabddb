"""Baseline JPEG codec (functions/jpeg.py): round-trip accuracy across
layouts, decoder robustness, and integration with the multimodal Arrow
kernels (decode_image / image_resize) on real compressed streams."""

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_rgb420,
    encode_jpeg_rgb444,
)


def _gradient(w, h):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return ((x * 3 + y * 5) % 256).astype(np.int64)


class TestRoundTrip:
    def test_flat_images_exact(self):
        for val in (0, 3, 128, 252, 255):
            img = np.full((24, 17), val, dtype=np.int64)
            w, h, luma = decode_jpeg(encode_jpeg_gray(img.reshape(-1), 17, 24))
            assert (w, h) == (17, 24)
            assert np.abs(np.array(luma).reshape(h, w) - img).max() <= 1

    def test_gradient_within_quant_error(self):
        img = _gradient(40, 30)
        w, h, luma = decode_jpeg(encode_jpeg_gray(img.reshape(-1), 40, 30, quality=90))
        err = np.abs(np.array(luma).reshape(h, w) - img)
        assert err.max() <= 16 and err.mean() < 2

    def test_non_multiple_of_8_dims(self):
        img = _gradient(13, 9)
        w, h, luma = decode_jpeg(encode_jpeg_gray(img.reshape(-1), 13, 9, quality=95))
        assert (w, h) == (13, 9)
        assert len(luma) == 13 * 9

    def test_rgb444_luma(self):
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, (20, 20, 3)).astype(np.float64)
        w, h, luma = decode_jpeg(encode_jpeg_rgb444(rgb.reshape(-1), 20, 20, quality=90))
        yref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        assert np.abs(np.array(luma).reshape(h, w) - yref).mean() < 4

    def test_rgb420_subsampled_mcu_path(self):
        rng = np.random.RandomState(5)
        rgb = rng.randint(0, 256, (35, 29, 3)).astype(np.float64)
        w, h, luma = decode_jpeg(encode_jpeg_rgb420(rgb.reshape(-1), 29, 35, quality=90))
        assert (w, h) == (29, 35)
        yref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        assert np.abs(np.array(luma).reshape(h, w) - yref).mean() < 4

    def test_restart_markers(self):
        img = _gradient(48, 24)
        payload = encode_jpeg_gray(img.reshape(-1), 48, 24, quality=90, restart_interval=3)
        assert b"\xff\xdd" in payload[:256]  # DRI present
        w, h, luma = decode_jpeg(payload)
        assert np.abs(np.array(luma).reshape(h, w) - img).max() <= 16

    def test_quality_monotone_size(self):
        img = _gradient(32, 32).reshape(-1)
        sizes = [len(encode_jpeg_gray(img, 32, 32, quality=q)) for q in (30, 60, 90)]
        assert sizes[0] < sizes[1] < sizes[2]

    def test_determinism(self):
        img = _gradient(16, 16).reshape(-1)
        p1 = encode_jpeg_gray(img, 16, 16)
        p2 = encode_jpeg_gray(img, 16, 16)
        assert p1 == p2
        assert decode_jpeg(p1) == decode_jpeg(p2)


class TestRobustness:
    def test_not_a_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG....")

    def test_mislabeled_sof2_is_corrupt(self):
        # a BASELINE scan relabeled SOF2 hits the progressive path with
        # Ss=0/Se=63 — an illegal DC-scan shape that must fail as corrupt
        img = _gradient(16, 16)
        payload = bytearray(encode_jpeg_gray(img.reshape(-1), 16, 16))
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC2
        with pytest.raises(ValueError):
            decode_jpeg(bytes(payload))

    def test_arithmetic_coded_rejected(self):
        img = _gradient(16, 16)
        payload = bytearray(encode_jpeg_gray(img.reshape(-1), 16, 16))
        i = payload.find(b"\xff\xc0")
        payload[i + 1] = 0xC9  # SOF9: arithmetic sequential
        with pytest.raises(ValueError, match="SOF0"):
            decode_jpeg(bytes(payload))

    def test_truncated_stream(self):
        img = _gradient(32, 32)
        payload = encode_jpeg_gray(img.reshape(-1), 32, 32, quality=95)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 3])


class TestSparkIntegration:
    def test_decode_image_kernel_on_jpeg(self, spark):
        """The existing decode_image Arrow kernel gains JPEG support
        through parse_image with zero changes; corrupt payloads still
        null-route instead of killing the stage."""
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            decode_image,
            image_resize,
        )

        img = _gradient(16, 16)
        good = encode_jpeg_gray(img.reshape(-1), 16, 16, quality=90)
        rows = [(1, bytearray(good)), (2, bytearray(b"\xff\xd8\x00garbage"))]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        got = {r["doc_id"]: r for r in decode_image(df).collect()}
        assert got[1]["format"] == "jpeg"
        assert (got[1]["width"], got[1]["height"]) == (16, 16)
        assert got[1]["decode_error"] is None
        assert abs(got[1]["mean_luma"] - img.mean()) < 2
        assert got[2]["decode_error"] is not None and got[2]["format"] is None
        # identity-size resize returns the full decoded raster
        rz = image_resize(df, 16, 16).collect()
        assert len(rz) == 1  # corrupt row dropped
        pix = np.frombuffer(bytes(rz[0]["pixels"]), dtype=np.uint8).reshape(16, 16)
        assert np.abs(pix.astype(int) - img).max() <= 16


def test_rgb422_horizontal_subsampled_mcu_path(spark=None):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
        encode_jpeg_rgb422,
    )

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (21, 27, 3)).astype(np.float64)
    w, h, luma = decode_jpeg(encode_jpeg_rgb422(rgb.reshape(-1), 27, 21, quality=90))
    assert (w, h) == (27, 21)
    yref = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    assert np.abs(np.array(luma).reshape(h, w) - yref).mean() < 4


class TestProgressive:
    """SOF2: the progressive transmission of the SAME quantized
    coefficients baseline sends — so decoded pixels must be
    bit-identical to the baseline round trip."""

    @pytest.mark.parametrize("mode", ["spectral", "successive"])
    @pytest.mark.parametrize("w,h", [(8, 8), (17, 13), (64, 48)])
    def test_identical_to_baseline(self, mode, w, h):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray_progressive,
        )

        rng = np.random.default_rng(4)
        x, y = np.meshgrid(np.arange(w), np.arange(h))
        img = ((x * 5 + y * 3) % 200 + rng.integers(0, 20, (h, w))).clip(0, 255)
        flat = img.reshape(-1).tolist()
        base = decode_jpeg(encode_jpeg_gray(flat, w, h, quality=85))
        prog = decode_jpeg(
            encode_jpeg_gray_progressive(flat, w, h, quality=85, mode=mode)
        )
        assert prog == base

    def test_flat_image_eob_only_scans(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray_progressive,
        )

        flat = [128] * 256  # all-zero AC everywhere: EOB-only AC scans
        base = decode_jpeg(encode_jpeg_gray(flat, 16, 16))
        for mode in ("spectral", "successive"):
            assert decode_jpeg(
                encode_jpeg_gray_progressive(flat, 16, 16, mode=mode)
            ) == base

    def test_truncated_progressive_stream(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray_progressive,
        )

        img = _gradient(32, 32)
        payload = encode_jpeg_gray_progressive(img.reshape(-1), 32, 32)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) * 2 // 3])

    def test_real_progressive_photo(self):
        import os

        f = (
            "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/doc/"
            "rust/html/embedded-book/assets/f3.jpg"
        )
        if not os.path.exists(f):
            pytest.skip("no real progressive fixture on this host")
        # produced by a real encoder: multi-component interleaved DC,
        # cross-block EOB runs, successive approximation, chroma AC skip
        with open(f, "rb") as fh:
            w, h, luma = decode_jpeg(fh.read())
        assert (w, h) == (720, 477) and len(luma) == w * h
        arr = np.array(luma)
        assert 100 < arr.mean() < 140 and arr.std() > 30  # a photo, not noise

    def test_parse_image_dispatches_progressive(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
            encode_jpeg_gray_progressive,
        )
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            parse_image,
        )

        img = _gradient(16, 16)
        fmt, w, h, gray = parse_image(
            encode_jpeg_gray_progressive(img.reshape(-1), 16, 16, mode="successive")
        )
        assert (fmt, w, h) == ("jpeg", 16, 16)
        base = decode_jpeg(encode_jpeg_gray(img.reshape(-1), 16, 16))
        assert gray == base[2]
