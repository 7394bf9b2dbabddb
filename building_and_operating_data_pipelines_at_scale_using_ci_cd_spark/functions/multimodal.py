"""Multimodal column plumbing (north-star, SURVEY.md §2.10).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
structs. Real decode needs codec libraries not present in this container,
so the decode kernel is stubbed (deterministic fake) behind the same
Arrow-batched ``mapInPandas`` plumbing a real decoder would use — schema,
partitioning, UDF signature, and batch shape are production-real.

Scale notes:
  - ``mapInPandas`` streams Arrow batches; peak memory is one batch, not
    one partition — set spark.sql.execution.arrow.maxRecordsPerBatch down
    when payloads are large (images), since batch bytes = rows × payload.
  - Feature extraction emits fixed-width arrays, so downstream similarity
    search runs on the same engine path as text embeddings.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

#: schema of a decoded media record
DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
        StructField("byte_sum_mod", LongType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Test harness: treat utf-8 text bytes as the opaque media payload,
    with the metadata struct a real ingest would carry."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload").cast(BinaryType()),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(F.col(text_col)).alias("content_length"),
        ).alias("media_meta"),
    )


def decode_media_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """The mapInPandas kernel. A real implementation would call the codec
    (PIL/ffmpeg/etc.) per row here; this deterministic fake extracts byte
    statistics + a tiny fixed-width "feature vector" so the plumbing is
    fully testable. Replace the body, keep the signature."""
    for pdf in batches:
        payloads = pdf["payload"]
        n_bytes = payloads.map(len)
        first = payloads.map(lambda b: b[0] if len(b) else -1)
        last = payloads.map(lambda b: b[-1] if len(b) else -1)
        byte_sum = payloads.map(lambda b: sum(b) % (1 << 31))
        feats = payloads.map(
            lambda b: [
                float(len(b)),
                float(b[0] if len(b) else 0),
                float(b[-1] if len(b) else 0),
                float(sum(b) % 256),
            ]
        )
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": n_bytes.astype("int32"),
                "first_byte": first.astype("int32"),
                "last_byte": last.astype("int32"),
                "byte_sum_mod": byte_sum.astype("int64"),
                "features": feats,
            }
        )


def decode_media(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched decode over the payload column."""
    return df_with_payload.mapInPandas(decode_media_batch, DECODED_SCHEMA)


#: schema of a sampled frame record — NOTE: one input row fans out to N
#: frame rows, the shape a video pipeline actually produces
FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", BinaryType()),
        StructField("frame_len", IntegerType()),
    ]
)


def sample_frames(
    df_with_payload: DataFrame, frame_size: int = 256, every: int = 4
) -> DataFrame:
    """Frame sampling plumbing: explode each payload into every
    ``every``-th fixed-size chunk ("frame"). The kernel is a deterministic
    fake — a real video pipeline replaces the chunker with ffmpeg frame
    extraction — but the Spark shape is the real one: a mapInPandas that
    yields MORE rows than it consumes, Arrow-batch bounded, so a 2-hour
    video row becomes N frame rows without ever materializing them all in
    one python list per partition."""
    if frame_size <= 0 or every <= 0:
        raise ValueError("frame_size and every must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames, lens = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_chunks = (len(payload) + frame_size - 1) // frame_size
                for rank, c in enumerate(range(0, n_chunks, every)):
                    chunk = payload[c * frame_size : (c + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(rank)
                    frames.append(bytes(chunk))
                    lens.append(len(chunk))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_bytes": frames,
                    "frame_len": pd.Series(lens, dtype="int32"),
                }
            )

    return df_with_payload.mapInPandas(kernel, FRAME_SCHEMA)


def resize_vector(vec, out_dim: int):
    """Feature "resize": bucket-average an array<float> down to a fixed
    ``out_dim`` — the 1-D analogue of image downsampling, and the real
    operation used to align heterogeneous feature widths before
    similarity search. Pure built-in higher-order functions (transform /
    slice / aggregate) — JVM-side, no Python crossing, unlike the decode
    kernels above which genuinely need a codec."""
    if out_dim <= 0:
        raise ValueError("out_dim must be positive")
    n = F.size(vec)
    # bucket b ∈ [0, out_dim): mean of elements [floor(b·n/out), floor((b+1)·n/out))
    def bucket_mean(b):
        start = F.floor(b * n / out_dim).cast("int")
        end = F.floor((b + F.lit(1)) * n / out_dim).cast("int")
        width = F.greatest(end - start, F.lit(1))
        sl = F.slice(vec, start + 1, width)
        return F.aggregate(
            sl, F.lit(0.0), lambda acc, x: acc + x.cast("double")
        ) / width.cast("double")

    return F.transform(F.sequence(F.lit(0), F.lit(out_dim - 1)), bucket_mean)


def image_resize_stub(*_args, **_kwargs):
    """Placeholder for the pixel-level image-resize kernel: requires
    PIL/opencv, neither present in this container. The vector-space
    analogue (:func:`resize_vector`) and the batch plumbing
    (:func:`decode_media`) are real."""
    raise NotImplementedError(
        "image decode/resize requires an imaging library (PIL/opencv); "
        "wire it into decode_media_batch's body — the Spark plumbing is ready"
    )
