"""Multimodal ingestion on the config dialect (round 8): three parallel
jobs over a mixed-media corpus, one per modality, each a registry step
the round-8 codec tier made REAL:

  - images — `decodeImage`: JPEG (baseline + progressive), PNG (plain +
    Adam7 + 16-bit), GIF (interlaced LZW), BMP/PPM — plus deliberately
    corrupt rows proving the per-row null-route;
  - audio  — `audioFeatures`: PCM 8/16/24-bit, G.711 µ-law, FLAC
    (mono + mid/side stereo), and IMA ADPCM (predictive 4:1, 5th
    session) clips → all-integer per-clip features;
  - video  — `sampleVideoFrames`: MJPEG-in-AVI demux + per-frame JPEG
    decode, an animated GIF, and an MS-RLE8 delta-frame AVI (genuine
    inter-frame prediction), every-2nd-frame sampling.

    cd /root/repo && python examples/media_pipeline/run.py

Every kernel is a narrow Arrow map stage — the same configs run
unchanged on a petabyte corpus; only the input paths change.
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..")))

import numpy as np

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark import get_session
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.plans.pipeline import (
    from_manifest,
)

DEMO = "/tmp/media_pipeline_demo"


def _raster(seed, w=16, h=16):
    return [((seed * 7) % 96) + (p % w) * 5 + (p // w) * 5 for p in range(w * h)]


def _build_corpus(spark):
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
        encode_wav_adpcm_ima,
        encode_wav_g711,
        encode_wav_pcm8,
        encode_wav_pcm16,
        encode_wav_pcm24,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
        encode_mrle_frame,
        mux_mjpeg_avi,
        mux_mrle_avi,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.flac import (
        encode_flac,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
        encode_gif_gray,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
        encode_jpeg_gray,
        encode_jpeg_gray_progressive,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.exif import (
        build_exif_app1,
        inject_app1,
    )
    from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
        encode_png_gray,
        encode_png_gray16,
    )

    images = [
        (1, bytearray(encode_jpeg_gray(_raster(1), 16, 16))),
        (2, bytearray(encode_jpeg_gray_progressive(_raster(2), 16, 16, mode="successive"))),
        (3, bytearray(encode_png_gray(_raster(3), 16, 16))),
        (4, bytearray(encode_png_gray(_raster(4), 16, 16, interlace=True))),
        (5, bytearray(encode_png_gray16([v * 257 for v in _raster(5)], 16, 16))),
        (6, bytearray(encode_gif_gray(np.array(_raster(6), dtype=np.uint8).reshape(16, 16), 16, 16, interlace=True))),
        (7, bytearray(b"\xff\xd8 corrupt jpeg")),
        (8, bytearray(b"not an image at all")),
        # round 9: a geotagged capture — the EXIF report must surface the
        # GPS coordinates and stripExif must scrub them without touching
        # a pixel (the decoded stats still count it as a plain jpeg)
        (9, bytearray(inject_app1(
            encode_jpeg_gray(_raster(9), 16, 16),
            build_exif_app1(orientation=6, make="DemoCam",
                            datetime_str="2024:05:06 07:08:09",
                            gps_lat_micro=48_858_370,
                            gps_lon_micro=2_294_481, byte_order="MM")))),
    ]
    tone = [int(3000 * (1 if (i // 8) % 2 == 0 else -1)) for i in range(480)]
    audio = [
        (1, bytearray(encode_wav_pcm16(tone, 8000))),
        (2, bytearray(encode_wav_pcm8([v // 256 for v in tone], 8000))),
        (3, bytearray(encode_wav_pcm24([v * 64 for v in tone], 16000))),
        (4, bytearray(encode_wav_g711(tone, 8000, law="mulaw"))),
        (5, bytearray(encode_wav_g711(tone, 8000, law="alaw"))),
        (6, bytearray(b"RIFFxxxxWAVEgarbage")),
        (7, bytearray(encode_flac([tone], 8000, block_size=256))),
        (8, bytearray(encode_flac([tone, tone[::-1]], 16000, stereo="mid/side"))),
        (9, bytearray(encode_wav_adpcm_ima(tone, 8000, block_samples=481))),
    ]
    frames = [encode_jpeg_gray(_raster(f), 16, 16) for f in range(4)]
    anim = np.stack(
        [np.array(_raster(f), dtype=np.uint8).reshape(16, 16) for f in range(3)]
    )
    # MS-RLE8 delta stream: frame 0 paints the canvas, frame 1 rewrites
    # only the rows a 4x4 square moved through (bare-EOL skips persist)
    mrle_rows0 = [[40] * 16 for _ in range(16)]
    mrle_rows1 = [list(r) for r in mrle_rows0]
    for y in range(4):
        mrle_rows1[y][4:8] = [200] * 4
    video = [
        (1, bytearray(mux_mjpeg_avi(frames, 16, 16, rate=24))),
        (2, bytearray(encode_gif_gray(list(anim), 16, 16))),
        (3, bytearray(b"RIFF not a real avi")),
        (4, bytearray(mux_mrle_avi(
            [encode_mrle_frame(mrle_rows0),
             encode_mrle_frame(mrle_rows1, mrle_rows0)], 16, 16))),
    ]
    for name, rows in (("images", images), ("audio", audio), ("video", video)):
        spark.createDataFrame(rows, "doc_id long, payload binary").write.mode(
            "overwrite"
        ).parquet(f"{DEMO}/raw/{name}")


def main():
    shutil.rmtree(DEMO, ignore_errors=True)
    spark = get_session(app_name="media-pipeline-demo")
    _build_corpus(spark)

    with open(os.path.join(os.path.dirname(__file__), "manifest.json")) as f:
        manifest = json.load(f)
    outcomes = from_manifest(spark, manifest).run()
    for name, o in outcomes.items():
        print(f"  task {name}: {o.state} (attempts={o.attempts})")
    assert all(o.state == "success" for o in outcomes.values())

    import duckdb

    img = dict(
        duckdb.sql(
            f"SELECT format, n FROM '{DEMO}/image_stats/*.parquet'"
        ).fetchall()
    )
    print(f"image formats decoded: {img}")
    assert img == {"jpeg": 3, "png": 3, "gif": 1}  # 2 corrupt rows routed out

    exif = duckdb.sql(
        f"SELECT doc_id, orientation, make, gps_lat_micro, gps_lon_micro "
        f"FROM '{DEMO}/exif_report/*.parquet' WHERE has_exif ORDER BY doc_id"
    ).fetchall()
    print(f"exif rows: {exif}")
    assert exif == [(9, 6, "DemoCam", 48_858_370, 2_294_481)]
    gps_after = duckdb.sql(
        f"SELECT COUNT(*) FROM '{DEMO}/scrubbed_exif/*.parquet' WHERE has_exif"
    ).fetchone()[0]
    removed = duckdb.sql(
        f"SELECT bytes_removed FROM '{DEMO}/scrub_report/*.parquet' WHERE doc_id = 9"
    ).fetchone()[0]
    print(f"after scrub: {gps_after} images still carry EXIF; doc 9 shed {removed} bytes")
    assert gps_after == 0 and removed > 0

    n_audio, max_ms = duckdb.sql(
        f"SELECT COUNT(*), MAX(duration_ms) FROM '{DEMO}/audio_features/*.parquet'"
    ).fetchone()
    print(f"audio clips decoded: {n_audio}, max duration {max_ms} ms")
    assert n_audio == 8 and max_ms == 60  # 480 samples @ 8 kHz (FLAC @16k = 30ms)
    adpcm_peak = duckdb.sql(
        f"SELECT peak_abs FROM '{DEMO}/audio_features/*.parquet' WHERE doc_id = 9"
    ).fetchone()[0]
    # the predictor tracks the ±3000 square tone with authentic ADPCM
    # overshoot ringing on the edges (measured peak 3710)
    assert 2500 <= adpcm_peak <= 4500

    stats = {
        r[0]: (r[1], r[2], r[3])
        for r in duckdb.sql(
            f"SELECT doc_id, sampled, n_frames, bad_frames FROM '{DEMO}/frame_stats/*.parquet'"
        ).fetchall()
    }
    print(f"video frame stats: {stats}")
    assert stats[1] == (2, 4, 0)  # AVI: frames 0 and 2 of 4
    assert stats[2] == (2, 3, 0)  # animated GIF: frames 0 and 2 of 3
    assert stats[3][2] == 1 and stats[3][0] == 1  # corrupt container: one bad row
    assert stats[4] == (1, 2, 0)  # MS-RLE8 delta stream: frame 0 of 2
    print("media_pipeline example OK")


if __name__ == "__main__":
    main()
