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


def image_resize_stub(*_args, **_kwargs):
    """Placeholder for the image-resize kernel: requires PIL/opencv,
    neither present in this container."""
    raise NotImplementedError(
        "image decode/resize requires an imaging library (PIL/opencv); "
        "wire it into decode_media_batch's body — the Spark plumbing is ready"
    )


def frame_sample_stub(*_args, **_kwargs):
    """Placeholder for video frame sampling (needs ffmpeg bindings)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg bindings; "
        "wire it into decode_media_batch's body — the Spark plumbing is ready"
    )
