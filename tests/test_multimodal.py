"""Multimodal plumbing (pkg/functions/multimodal.py): Arrow-batched decode,
frame-sampling row fan-out, JVM-side vector resize, and the honest codec
gates."""

import pytest
from pyspark.sql import functions as F

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.multimodal import (
    attach_binary_payload,
    decode_media,
    image_resize_stub,
    resize_vector,
    sample_frames,
)


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
    with pytest.raises(NotImplementedError, match="imaging library"):
        image_resize_stub()
