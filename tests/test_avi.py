"""MJPEG-in-AVI container (functions/avi.py): mux/demux round trips,
real-frame decode fidelity, corrupt-input routing, and the Spark
fan-out operator + config-registry step."""

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
    demux_avi,
    mux_mjpeg_avi,
    sample_video_frames,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
    encode_jpeg_gray,
)


def _raster(f, w=16, h=16):
    # wrap-free gradient per frame (the jpeg_decode fixture family)
    return [((f * 9) % 96) + (p % w) * 5 + (p // w) * 5 for p in range(w * h)]


def _mjpeg(n_frames=4, w=16, h=16, rate=24):
    frames = [encode_jpeg_gray(_raster(f, w, h), w, h, quality=85) for f in range(n_frames)]
    return mux_mjpeg_avi(frames, w, h, rate=rate), frames


class TestContainer:
    def test_roundtrip_frames_bytes_exact(self):
        avi, frames = _mjpeg(5)
        w, h, rate, scale, got = demux_avi(avi)
        assert (w, h, rate, scale) == (16, 16, 24, 1)
        assert got == frames  # container is lossless around the payloads

    def test_odd_sized_frames_pad_correctly(self):
        # RIFF chunks are word-aligned; odd-length frame bodies get a pad
        # byte that must NOT leak into the next frame
        frames = [b"\xff\xd8" + bytes([f]) * (101 + f) for f in range(3)]
        _, _, _, _, got = demux_avi(mux_mjpeg_avi(frames, 8, 8))
        assert got == frames

    def test_frames_inside_rec_lists(self):
        import struct

        avi, frames = _mjpeg(2)
        # rebuild movi with both frames wrapped in a 'rec ' sub-LIST
        inner = b"".join(
            b"00dc" + struct.pack("<I", len(f)) + f + (b"\x00" if len(f) & 1 else b"")
            for f in frames
        )
        rec = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
        head = avi[: avi.index(b"movi") - 8]  # everything before the movi LIST
        movi = b"LIST" + struct.pack("<I", 4 + len(rec)) + b"movi" + rec
        payload = head + movi
        payload = payload[:4] + struct.pack("<I", len(payload) - 8) + payload[8:]
        _, _, _, _, got = demux_avi(payload)
        assert got == frames

    def test_decode_fidelity_through_parse_image(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
            parse_image,
        )

        avi, _ = _mjpeg(3)
        _, _, _, _, got = demux_avi(avi)
        for f, fb in enumerate(got):
            fmt, w, h, gray = parse_image(fb)
            errs = [abs(a - b) for a, b in zip(gray, _raster(f))]
            assert fmt == "jpeg" and max(errs) <= 8

    def test_corrupt_inputs(self):
        avi, _ = _mjpeg(2)
        with pytest.raises(ValueError, match="RIFF"):
            demux_avi(b"not a video")
        with pytest.raises(ValueError):
            demux_avi(avi[:-400])  # cut mid-movi
        with pytest.raises(ValueError, match="at least one frame"):
            mux_mjpeg_avi([], 16, 16)


def test_sample_video_frames_operator(spark):
    avi, frames = _mjpeg(4)
    rows = [
        (1, bytearray(avi)),
        (2, bytearray(b"RIFF garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = sample_video_frames(df, every=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    ok = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in ok] == [0, 2]  # every-2 sampling
    assert all(r["n_frames"] == 4 and r["frame_ok"] and r["width"] == 16 for r in ok)
    # expected luma sum within quantization error of the original raster
    for r in ok:
        orig = sum(_raster(r["frame_idx"]))
        assert abs(r["sum_luma"] - orig) <= 8 * 256
    bad = by_doc[2]
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1 and not bad[0]["frame_ok"]


def test_sample_video_frames_registry_step(spark, tmp_path):
    import json

    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import Orchestrator

    avi, _ = _mjpeg(4)
    spark.createDataFrame([(7, bytearray(avi))], "doc_id long, payload binary").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "vids"))
    cfg = {
        "configs": {
            "name": "avi_step_drive",
            "phase_1": {
                "input_data": {
                    "dataSource": "local",
                    "dataFrameName": "vids",
                    "path": str(tmp_path / "vids"),
                    "fileProperties": {"fileFormat": "parquet"},
                }
            },
        },
        "phase_2": {
            "data_transformations": [
                {
                    "operatorName": "sampleVideoFrames",
                    "inputDFName": "vids",
                    "operatorParams": {"every": "3"},
                    "outputDFName": "frames",
                }
            ],
            "transformed_data_count_validation": "false",
        },
        "phase_3": {
            "target_record_insert": [
                {
                    "dataTarget": "local",
                    "dataFrameName": "frames",
                    "loadType": "truncateInsert",
                    "path": str(tmp_path / "frames"),
                    "outputDataProperties": {"fileFormat": "parquet"},
                }
            ]
        },
    }
    cfg_path = tmp_path / "avi.json"
    cfg_path.write_text(json.dumps(cfg))
    Orchestrator(spark).run(str(cfg_path))
    back = spark.read.parquet(str(tmp_path / "frames")).collect()
    assert sorted(r["frame_idx"] for r in back) == [0, 3]
    assert all(r["frame_ok"] for r in back)


def test_sample_video_frames_on_animated_gif(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
        encode_gif_gray,
    )

    f0 = np.full((4, 4), 10, dtype=np.uint8)
    f1 = np.full((4, 4), 20, dtype=np.uint8)
    f2 = np.full((4, 4), 30, dtype=np.uint8)
    gif = encode_gif_gray([f0, f1, f2], 4, 4)
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(b"GIF89a junk"))],
        "doc_id long, payload binary",
    )
    got = sample_video_frames(df, every=2).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    ok = sorted(by_doc[1], key=lambda r: r["frame_idx"])
    assert [(r["frame_idx"], r["sum_luma"]) for r in ok] == [(0, 160), (2, 480)]
    assert all(r["n_frames"] == 3 and r["frame_ok"] for r in ok)
    assert by_doc[2][0]["frame_idx"] == -1 and not by_doc[2][0]["frame_ok"]


class TestMRLE:
    """MS-RLE8 (BI_RLE8): the delta-frame Video-for-Windows codec."""

    @staticmethod
    def _mk(frames_rows):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            encode_mrle_frame,
            mux_mrle_avi,
        )

        rle, prev = [], None
        for rows in frames_rows:
            rle.append(encode_mrle_frame(rows, prev))
            prev = rows
        h, w = len(frames_rows[0]), len(frames_rows[0][0])
        return mux_mrle_avi(rle, w, h)

    def test_roundtrip_composites(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            decode_mrle_frames,
            demux_avi_info,
        )

        f0 = [[7] * 8 for _ in range(4)]
        f1 = [list(r) for r in f0]
        f1[2][3:6] = [200, 201, 202]
        avi = self._mk([f0, f1])
        w, h, _r, _s, frames, codec, pal = demux_avi_info(avi)
        assert codec == b"MRLE" and (w, h) == (8, 4)
        lumas = decode_mrle_frames(w, h, frames, pal)
        assert lumas[0] == [7] * 32
        assert lumas[1] == [v for row in f1 for v in row]

    def test_delta_rows_are_skipped_not_rewritten(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            encode_mrle_frame,
        )

        f0 = [[1] * 8 for _ in range(4)]
        f1 = [list(r) for r in f0]
        f1[3][0] = 99
        rle = encode_mrle_frame(f1, f0)
        # three unchanged rows = three bare EOLs (2 bytes each)
        assert rle.startswith(b"\x00\x00\x00\x00\x00\x00")

    def test_absolute_and_delta_escapes(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            decode_mrle_frames,
        )

        data = bytes(
            [0, 3, 5, 6, 7, 0,  # absolute run of 3 + pad at (0,0)
             0, 2, 2, 1,        # delta: x+=2, y+=1 (skipped pixels persist)
             3, 9,              # encoded run at (5,1)
             0, 0,              # EOL
             0, 1]              # EOF
        )
        lum = decode_mrle_frames(8, 3, [data], None)[0]
        exp = [0] * 24
        exp[0:3] = [5, 6, 7]
        exp[8 + 5 : 8 + 8] = [9, 9, 9]
        assert lum == exp

    def test_palette_luma(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            decode_mrle_frames,
        )

        # palette index 1 = pure red (BGR0 quads) -> 601 luma 299*255//1000
        pal = bytes([0, 0, 0, 0, 0, 0, 255, 0])
        data = bytes([2, 1, 0, 0, 0, 1])
        lum = decode_mrle_frames(2, 1, [data], pal)[0]
        assert lum == [76, 76]

    def test_corrupt_frames_are_valueerror(self):
        import pytest

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            decode_mrle_frames,
        )

        cases = [
            bytes([5, 1]),            # run then no EOF
            bytes([0, 2, 1]),         # truncated delta
            bytes([0, 5, 1, 2]),      # truncated absolute run
            bytes([9, 1, 0, 1]),      # run overflows the 4-wide row
        ]
        for data in cases:
            with pytest.raises(ValueError):
                decode_mrle_frames(4, 2, [data], None)

    def test_sample_video_frames_dispatch(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
            sample_video_frames,
        )

        f0 = [[10] * 8 for _ in range(4)]
        f1 = [list(r) for r in f0]
        f1[0][0] = 200
        avi = self._mk([f0, f1])
        df = spark.createDataFrame(
            [(1, bytearray(avi)), (2, bytearray(avi[:20]))], ["doc_id", "payload"]
        )
        rows = sorted(
            (r.doc_id, r.frame_idx, r.sum_luma, bool(r.frame_ok))
            for r in sample_video_frames(df, every=1).collect()
        )
        assert rows == [
            (1, 0, 320, True),
            (1, 1, 320 + 190, True),
            (2, -1, None, False),
        ]
