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
    StringType,
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


# ---------------------------------------------------------------------------
# Real bytes→pixels kernels (round 5). PPM/PGM/BMP need zero codec deps —
# the headers are pure struct parsing — so these formats decode for real;
# compressed formats (JPEG/PNG/video) stay behind the honest gate below.
# ---------------------------------------------------------------------------


def parse_image(payload: bytes):
    """Decode PPM (P6), PGM (P5), uncompressed 24-bit BMP, baseline
    JPEG, 8-bit PNG (plain or Adam7), or GIF (LZW, first composited
    frame) bytes into ``(fmt, width, height, gray)`` where ``gray`` is a
    row-major list of grayscale ints (0-255, ITU-R 601 luma for color
    inputs; for JPEG the Y channel IS that luma). Raises ``ValueError``
    on unsupported/corrupt payloads — callers choose whether to gate or
    null-route.

    JPEG decodes via the pure-numpy codec in ``jpeg.py`` — baseline
    SOF0 (round 7) AND progressive SOF2 (round 8: spectral selection,
    successive approximation, EOB runs), 8-bit, grayscale/4:4:4/4:2:2/
    4:2:0, restart markers; arithmetic-coded streams still raise."""
    if payload[:2] in (b"P6", b"P5"):
        return _parse_pnm(payload)
    if payload[:2] == b"BM":
        return _parse_bmp(payload)
    if payload[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg

        w, h, luma = decode_jpeg(payload)
        return ("jpeg", w, h, luma)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        from .png import decode_png

        w, h, luma = decode_png(payload)
        return ("png", w, h, luma)
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif

        w, h, luma = decode_gif(payload)
        return ("gif", w, h, luma)
    raise ValueError(
        "unsupported image format (magic %r): PPM/PGM/BMP/baseline-JPEG/PNG/"
        "GIF decode natively — see decode_compressed_gate for the rest"
        % payload[:2]
    )


def _parse_pnm(payload: bytes):
    """P6 (RGB) / P5 (gray) binary netpbm: ASCII header (magic, width,
    height, maxval, with #-comments), then raw samples."""
    pos = 2
    fields = []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError("only maxval=255 netpbm supported")
    if payload[:2] == b"P5":
        n = width * height
        raster = payload[pos : pos + n]
        if len(raster) != n:
            raise ValueError("truncated PGM raster")
        return ("pgm", width, height, list(raster))
    n = width * height * 3
    raster = payload[pos : pos + n]
    if len(raster) != n:
        raise ValueError("truncated PPM raster")
    gray = [
        (299 * raster[i] + 587 * raster[i + 1] + 114 * raster[i + 2]) // 1000
        for i in range(0, n, 3)
    ]
    return ("ppm", width, height, gray)


def _parse_bmp(payload: bytes):
    """Uncompressed 24bpp BMP (BITMAPINFOHEADER): little-endian header,
    BGR pixel order, 4-byte-aligned rows, bottom-up raster."""
    import struct

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size, width, height = struct.unpack_from("<Iii", payload, 14)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if hdr_size < 40 or planes != 1 or bpp != 24 or compression != 0:
        raise ValueError("only uncompressed 24bpp BITMAPINFOHEADER BMP supported")
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3
    gray = [0] * (width * height)
    for row in range(height):
        src_row = (height - 1 - row) if bottom_up else row
        base = data_off + src_row * row_stride
        if base + width * 3 > len(payload):
            raise ValueError("truncated BMP raster")
        for x in range(width):
            b, g, r = payload[base + 3 * x : base + 3 * x + 3]
            gray[row * width + x] = (299 * r + 587 * g + 114 * b) // 1000
    return ("bmp", width, height, gray)


def downsample_gray(gray, width: int, height: int, out_w: int, out_h: int):
    """Box-filter downsample a row-major grayscale raster to out_w×out_h —
    each output pixel is the mean of its (possibly ragged) source box.
    Pure python on one image; parallelism comes from Spark rows."""
    out = [0] * (out_w * out_h)
    for oy in range(out_h):
        y0 = oy * height // out_h
        y1 = max((oy + 1) * height // out_h, y0 + 1)
        for ox in range(out_w):
            x0 = ox * width // out_w
            x1 = max((ox + 1) * width // out_w, x0 + 1)
            acc = 0
            for y in range(y0, y1):
                row = y * width
                for x in range(x0, x1):
                    acc += gray[row + x]
            out[oy * out_w + ox] = acc // ((y1 - y0) * (x1 - x0))
    return out


IMAGE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", ArrayType(IntegerType())),
        StructField("mean_luma", FloatType()),
        StructField("decode_error", StringType()),
    ]
)


def decode_image(df_with_payload: DataFrame, thumb: int = 8) -> DataFrame:
    """REAL bytes→pixels decode over the payload column: PPM/PGM/BMP parse,
    luma conversion, box-downsample to a ``thumb×thumb`` grayscale
    thumbnail (the dHash/pHash input shape). Undecodable rows are
    null-routed with the error message in ``decode_error`` — at 100 TB a
    corrupt JPEG must not kill the stage. Same Arrow ``mapInPandas``
    plumbing as :func:`decode_media`; peak memory one batch."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fmts, ws, hs, thumbs, lumas, errs = [], [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                ids.append(doc_id)
                try:
                    fmt, w, h, gray = parse_image(bytes(payload))
                    fmts.append(fmt)
                    ws.append(w)
                    hs.append(h)
                    thumbs.append(downsample_gray(gray, w, h, thumb, thumb))
                    lumas.append(float(sum(gray)) / len(gray) if gray else 0.0)
                    errs.append(None)
                except ValueError as exc:
                    fmts.append(None)
                    ws.append(None)
                    hs.append(None)
                    thumbs.append(None)
                    lumas.append(None)
                    errs.append(str(exc))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "format": fmts,
                    "width": pd.Series(ws, dtype="Int32"),
                    "height": pd.Series(hs, dtype="Int32"),
                    "thumb": thumbs,
                    "mean_luma": pd.Series(lumas, dtype="float32"),
                    "decode_error": errs,
                }
            )

    return df_with_payload.mapInPandas(kernel, IMAGE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("pixels", BinaryType()),
    ]
)


def image_resize(df_with_payload: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Pixel-level image resize (box filter) for decodable formats: emits
    the resized grayscale raster as packed bytes (P5-raster layout), the
    shape a vision-preprocessing stage feeds to a model. Undecodable rows
    are dropped here (use :func:`decode_image` first to audit them)."""
    if out_w <= 0 or out_h <= 0:
        raise ValueError("out_w and out_h must be positive")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, pixels = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                try:
                    _fmt, w, h, gray = parse_image(bytes(payload))
                except ValueError:
                    continue
                ids.append(doc_id)
                pixels.append(bytes(downsample_gray(gray, w, h, out_w, out_h)))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "width": pd.Series([out_w] * len(ids), dtype="int32"),
                    "height": pd.Series([out_h] * len(ids), dtype="int32"),
                    "pixels": pixels,
                }
            )

    return df_with_payload.mapInPandas(kernel, RESIZED_SCHEMA)


def decode_compressed_gate(*_args, **_kwargs):
    """Honest gate for the formats still without a native decode path.
    Round 7 closed BOTH still-image gaps: baseline JPEG decodes through
    the pure-numpy T.81 codec (``jpeg.py``) and 8-bit PNG through the
    stdlib-zlib codec (``png.py``), wired into :func:`parse_image`;
    PPM/PGM/BMP have decoded natively since round 5; round 8 added
    progressive JPEG, Adam7-interlaced and 16-bit PNG, GIF (LZW),
    G.711 + IMA ADPCM audio, MJPEG-in-AVI and MS-RLE8 delta-frame
    video (``avi.py`` — the latter is genuine temporal prediction:
    skipped pixels persist from the previous frame), and FLAC
    (``flac.py`` — Rice/fixed/LPC subframes, mid/side stereo,
    CRC-verified). What remains gated: arithmetic-coded/hierarchical
    JPEG, perceptual audio (MP3/AAC — psychoacoustic transform codecs),
    and motion-compensated DCT video (MPEG/H.26x — genuinely need
    ffmpeg-class libraries). Extend :func:`parse_image` when a codec
    library lands — the Spark plumbing (Arrow batches, corrupt-row
    null-routing) is proven on real compressed bytes."""
    raise NotImplementedError(
        "arithmetic-coded JPEG / MP3-AAC audio / motion-compensated video "
        "decode requires a codec library (PIL/opencv/ffmpeg); PPM/PGM/BMP, "
        "JPEG (baseline+progressive), PNG (8/16-bit, plain+Adam7), GIF, "
        "G.711, IMA ADPCM, FLAC, MJPEG-AVI and MS-RLE8 delta frames "
        "decode natively — extend parse_image for the rest"
    )


#: backwards-compat alias (pre-round-5 name)
image_resize_stub = decode_compressed_gate
