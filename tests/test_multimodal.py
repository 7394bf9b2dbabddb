"""Multimodal plumbing (pkg/functions/multimodal.py): Arrow-batched decode,
frame-sampling row fan-out, JVM-side vector resize, and the honest codec
gates."""

import pytest
from pyspark.sql import functions as F

import struct

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
    attach_binary_payload,
    decode_compressed_gate,
    decode_image,
    decode_media,
    downsample_gray,
    image_resize,
    parse_image,
    resize_vector,
    sample_frames,
)


def make_ppm(width, height, rgb_rows):
    """Valid binary P6 bytes (with a header comment, exercising the parser)."""
    raster = b"".join(bytes(px) for row in rgb_rows for px in row)
    return b"P6\n# test image\n%d %d\n255\n" % (width, height) + raster


def make_pgm(width, height, gray_rows):
    return b"P5 %d %d 255\n" % (width, height) + bytes(
        v for row in gray_rows for v in row
    )


def make_bmp(width, height, rgb_rows):
    """Valid uncompressed 24bpp bottom-up BMP bytes (BITMAPINFOHEADER)."""
    stride = (width * 3 + 3) & ~3
    raster = b""
    for row in reversed(rgb_rows):  # bottom-up
        line = b"".join(bytes([b, g, r]) for (r, g, b) in row)
        raster += line + b"\x00" * (stride - len(line))
    header = b"BM" + struct.pack("<IHHI", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


@pytest.fixture(scope="module")
def payloads(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return attach_binary_payload(docs, "text", "doc_id")


def test_decode_media_byte_stats(spark, payloads):
    out = decode_media(payloads)
    row = out.orderBy("doc_id").first()
    src = payloads.orderBy("doc_id").first()
    assert row["n_bytes"] == len(src["payload"])
    assert row["first_byte"] == src["payload"][0]
    assert len(row["features"]) == 4


def test_sample_frames_fan_out_counts(spark, payloads):
    frame_size, every = 100, 3
    frames = sample_frames(payloads, frame_size=frame_size, every=every)
    got = {
        (r["doc_id"], r["frame_idx"]): r
        for r in frames.collect()
    }
    for src in payloads.collect():
        n = len(src["payload"])
        n_chunks = (n + frame_size - 1) // frame_size
        expected_frames = (n_chunks + every - 1) // every
        mine = [k for k in got if k[0] == src["doc_id"]]
        assert len(mine) == expected_frames
        # frame content is the exact chunk
        first = got[(src["doc_id"], 0)]
        assert bytes(first["frame_bytes"]) == bytes(src["payload"][:frame_size])
        assert first["frame_len"] == min(frame_size, n)


def test_sample_frames_rejects_bad_params(payloads):
    with pytest.raises(ValueError):
        sample_frames(payloads, frame_size=0)
    with pytest.raises(ValueError):
        sample_frames(payloads, every=0)


def test_resize_vector_bucket_means(spark):
    df = spark.createDataFrame([(1, [float(i) for i in range(8)])], "id int, v array<float>")
    out = df.select(resize_vector(F.col("v"), 4).alias("r")).collect()[0]["r"]
    assert out == [0.5, 2.5, 4.5, 6.5]  # pairwise means
    whole = df.select(resize_vector(F.col("v"), 1).alias("r")).collect()[0]["r"]
    assert whole == [3.5]
    with pytest.raises(ValueError):
        resize_vector(F.col("v"), 0)


def test_resize_vector_is_jvm_side(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    plan = (
        emb.select(resize_vector(F.col("embedding"), 16).alias("r"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "mapInPandas" not in plan.lower()
    assert "BatchEvalPython" not in plan


def test_codec_gate_is_honest():
    with pytest.raises(NotImplementedError, match="codec library"):
        decode_compressed_gate()


# -- real bytes→pixels decode (round 5) -------------------------------------


def test_parse_ppm_luma_and_dims():
    # 2x2: red, green / blue, white
    img = make_ppm(2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])
    fmt, w, h, gray = parse_image(img)
    assert (fmt, w, h) == ("ppm", 2, 2)
    assert gray == [76, 149, 29, 255]  # ITU-R 601 luma, integer floor


def test_parse_bmp_matches_ppm_pixels():
    rows = [[(10, 20, 30), (200, 100, 50)], [(0, 0, 0), (255, 255, 255)]]
    _, _, _, from_ppm = parse_image(make_ppm(2, 2, rows))
    fmt, w, h, from_bmp = parse_image(make_bmp(2, 2, rows))
    assert (fmt, w, h) == ("bmp", 2, 2)
    assert from_bmp == from_ppm  # same pixels through two container formats


def test_parse_pgm_and_unsupported():
    fmt, w, h, gray = parse_image(make_pgm(3, 1, [[7, 8, 9]]))
    assert (fmt, w, h, gray) == ("pgm", 3, 1, [7, 8, 9])
    # JPEG magic now routes to the real decoder (round 7) — a corrupt
    # jpeg-ish stream raises from there, not from the magic dispatch
    with pytest.raises(ValueError, match="corrupt JPEG"):
        parse_image(b"\xff\xd8\xff\xe0 jpeg-ish")
    with pytest.raises(ValueError, match="unsupported image format"):
        parse_image(b"\x89PNG not supported")
    with pytest.raises(ValueError, match="truncated"):
        parse_image(make_ppm(2, 2, [[(1, 2, 3)]])[:-4])


def test_downsample_gray_box_filter():
    # 4x2 ramp -> 2x1: means of the two 2x2 boxes
    gray = [0, 10, 20, 30, 40, 50, 60, 70]
    assert downsample_gray(gray, 4, 2, 2, 1) == [25, 45]
    # upscale-ish ragged boxes still cover every output pixel
    assert downsample_gray([5], 1, 1, 2, 2) == [5, 5, 5, 5]


def test_decode_image_real_bytes_and_null_route(spark):
    rows = [
        (1, make_ppm(4, 4, [[(i * 16, i * 16, i * 16) for i in range(4)]] * 4)),
        (2, make_bmp(2, 2, [[(255, 255, 255), (0, 0, 0)]] * 2)),
        (3, b"\x89PNG not decodable here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in decode_image(df, thumb=2).collect()}
    assert got[1]["format"] == "ppm" and (got[1]["width"], got[1]["height"]) == (4, 4)
    assert len(got[1]["thumb"]) == 4
    assert got[2]["format"] == "bmp" and got[2]["mean_luma"] == pytest.approx(127.5)
    # corrupt/compressed rows null-route with the reason, never kill the stage
    assert got[3]["format"] is None and "unsupported" in got[3]["decode_error"]


def test_image_resize_pixels(spark):
    # 4x2 horizontal ramp; resize to 2x1 = box means [25, 45] (per-channel gray)
    rows = [[(v, v, v) for v in (0, 10, 20, 30)], [(v, v, v) for v in (40, 50, 60, 70)]]
    df = spark.createDataFrame(
        [(1, make_ppm(4, 2, rows)), (2, b"not an image")], "doc_id long, payload binary"
    )
    out = image_resize(df, 2, 1).collect()
    assert len(out) == 1  # undecodable row dropped
    assert bytes(out[0]["pixels"]) == bytes([25, 45])
    with pytest.raises(ValueError):
        image_resize(df, 0, 1)
