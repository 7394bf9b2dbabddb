"""GIF codec (functions/gif.py): lossless LZW round trips across every
code-width boundary, row interlace, animation compositing, robustness,
real tool-produced files, and the Spark kernel."""

import glob
import os

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif_gray,
    gif_frame_lumas,
)


def _rand(w, h, seed=3):
    return np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("w,h", [(1, 1), (3, 2), (16, 16), (13, 11), (64, 37)])
    def test_lossless(self, w, h):
        img = _rand(w, h)
        gw, gh, luma = decode_gif(encode_gif_gray(img, w, h))
        assert (gw, gh) == (w, h)
        assert np.array_equal(np.array(luma).reshape(h, w), img)

    @pytest.mark.parametrize("w,h", [(3, 2), (13, 11), (64, 37)])
    def test_interlaced(self, w, h):
        img = _rand(w, h, seed=9)
        _, _, luma = decode_gif(encode_gif_gray(img, w, h, interlace=True))
        assert np.array_equal(np.array(luma).reshape(h, w), img)

    def test_width_boundaries_random(self):
        # 300x200 random indices force 9->10->11->12-bit codes AND the
        # dictionary-full clear/reset path — the LZW off-by-one honeypot
        img = _rand(300, 200, seed=1)
        _, _, luma = decode_gif(encode_gif_gray(img, 300, 200))
        assert np.array_equal(np.array(luma).reshape(200, 300), img)

    def test_width_boundaries_runs(self):
        # gradient: long repeated strings, deep dictionary entries
        img = np.add.outer(np.arange(200) % 256, np.arange(300) % 256).astype(np.uint8)
        _, _, luma = decode_gif(encode_gif_gray(img, 300, 200))
        assert np.array_equal(np.array(luma).reshape(200, 300), img)

    def test_kwkwk_case(self):
        # aaa... stream exercises the code==len(table) branch immediately
        out = _lzw_decode(8, _lzw_encode(8, [7] * 50), 50)
        assert out == [7] * 50


class TestAnimation:
    def test_transparency_composites_over_previous(self):
        f0 = np.full((4, 4), 50, dtype=np.uint8)
        f1 = np.zeros((4, 4), dtype=np.uint8)
        f1[1, 1] = 200
        w, h, frames = gif_frame_lumas(encode_gif_gray([f0, f1], 4, 4, transparent_idx=0))
        assert (w, h) == (4, 4) and len(frames) == 2
        assert frames[0] == [50] * 16
        want = [50] * 16
        want[5] = 200
        assert frames[1] == want

    def test_disposal_restore_background(self):
        f0 = np.full((2, 2), 9, dtype=np.uint8)
        f1 = np.full((2, 2), 30, dtype=np.uint8)
        _, _, frames = gif_frame_lumas(
            encode_gif_gray([f0, f1], 2, 2, transparent_idx=255, disposals=[2, 1])
        )
        # frame 0 shows f0; its disposal=2 restores bg (index 0) before f1,
        # but f1 fully covers the canvas so frame 1 is all 30
        assert frames[0] == [9] * 4 and frames[1] == [30] * 4

    def test_decode_gif_returns_first_frame(self):
        f0 = np.full((2, 2), 5, dtype=np.uint8)
        f1 = np.full((2, 2), 6, dtype=np.uint8)
        assert decode_gif(encode_gif_gray([f0, f1], 2, 2))[2] == [5] * 4


class TestRobustness:
    def test_not_gif(self):
        with pytest.raises(ValueError, match="GIF"):
            decode_gif(b"\x89PNG\r\n\x1a\n")

    def test_truncated(self):
        img = _rand(13, 11)
        with pytest.raises(ValueError):
            decode_gif(encode_gif_gray(img, 13, 11)[:-20])

    def test_no_image_data(self):
        import struct

        payload = b"GIF87a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0) + b"\x3b"
        with pytest.raises(ValueError, match="no image data"):
            decode_gif(payload)

    def test_frame_rect_outside_screen(self):
        img = _rand(4, 4)
        payload = bytearray(encode_gif_gray(img, 4, 4))
        i = 13 + 768  # header+LSD, then the 256-entry global color table
        assert payload[i] == 0x2C
        payload[i + 5] = 9  # frame width 9 > screen 4 (little-endian low byte)
        with pytest.raises(ValueError):
            decode_gif(bytes(payload))


def _idlelib_icons():
    try:
        import idlelib

        return sorted(glob.glob(os.path.join(os.path.dirname(idlelib.__file__), "Icons", "*.gif")))
    except ImportError:
        return []


@pytest.mark.skipif(not _idlelib_icons(), reason="no stdlib GIF fixtures on this host")
def test_real_tool_produced_gifs():
    # CPython's idlelib icons: produced by real GIF encoders, crossing the
    # 512/1024 LZW boundaries (idle_48), using transparency and small
    # palettes — decode must succeed and return a plausible raster
    for f in _idlelib_icons():
        with open(f, "rb") as fh:
            w, h, luma = decode_gif(fh.read())
        assert w > 0 and h > 0 and len(luma) == w * h
        assert all(0 <= v <= 255 for v in luma)


def test_parse_image_and_kernel_on_gif(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
        decode_image,
        parse_image,
    )

    img = _rand(12, 10)
    fmt, w, h, gray = parse_image(encode_gif_gray(img, 12, 10))
    assert (fmt, w, h) == ("gif", 12, 10) and gray == [int(v) for v in img.reshape(-1)]
    rows = [
        (1, bytearray(encode_gif_gray(img, 12, 10))),
        (2, bytearray(b"GIF89a corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image(df).collect()}
    assert got[1]["format"] == "gif" and (got[1]["width"], got[1]["height"]) == (12, 10)
    assert abs(got[1]["mean_luma"] - img.mean()) < 0.01  # lossless
    assert got[2]["decode_error"] is not None


def test_transparent_index_outside_palette_is_legal():
    import struct

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
        _lzw_encode,
        _sub_blocks,
    )

    # real encoders legally pick a transparent index past the color table
    # end (those pixels are never looked up) — build an 8-color GIF whose
    # frame uses index 255 as transparency
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 2, 2, 0xF2, 0, 0)  # GCT size 2<<2 = 8
    for i in range(8):
        out += bytes((i * 30, i * 30, i * 30))
    out += bytes((0x21, 0xF9, 4, 0x01, 0, 0, 255, 0))  # GCE: transparent 255
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
    out.append(8)
    out += _sub_blocks(_lzw_encode(8, [3, 255, 255, 5]))
    out += b"\x3b"
    w, h, luma = decode_gif(bytes(out))
    # transparent pixels keep the background (index 0 -> luma 0)
    assert (w, h) == (2, 2) and luma == [90, 0, 0, 150]
