"""Perceptual image hashing (pHash) + Hamming near-dup pairs — the IMAGE
counterpart of the text near-dup family (SimHash/MinHash) and the last
multimodal-dedup gap: re-encoded / slightly-retouched images share no
bytes and no text, but their low-frequency DCT signature survives.

Classic pHash (as in the public pHash/imagehash implementations): resize
to 32×32 gray, 2-D DCT-II, keep the 8×8 low-frequency block, threshold
each coefficient against the block median → 64 bits.

Cross-engine determinism (the whole point of this formulation): the DCT
uses an INTEGER cosine matrix ``C[j][x] = floor(cos(pi·(2x+1)·j/64)·1e6
+ 0.5)`` — libm's cos runs ONCE, in Python, when this module loads, and
the SAME integer matrix is baked into the DuckDB oracle's SQL, so both
engines do pure int64 arithmetic end-to-end (max |M| ≤ 255·32²·1e12 <
2^63). The median is the LOWER median (sorted[31]) — no averaging, no
float — and bits use strict ``>``. Identical rasters ⇒ identical hashes
on every engine, always.

Near-dup pairs reuse the pigeonhole band equi-join the text SimHash
uses (``operators/dedup.py simhash_near_pairs``): any two 64-bit hashes
within Hamming ``radius`` agree exactly on one of ``radius+1`` bands —
candidates are band-bucket joins, never all-pairs; verification is one
``bit_count(xor)``.

Scale shape: hashing is a per-image Arrow map stage (same as the codec
tier); pairing shuffles (band, value) buckets only. A billion-image
corpus hashes partition-parallel and pairs by bucket.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = ["PHASH_N", "int_dct_matrix", "phash64", "phash_fingerprints", "phash_near_pairs"]

PHASH_N = 32  # raster side
_LOW = 8  # low-frequency block side
_SCALE = 10**6


def int_dct_matrix() -> list:
    """The 8×32 integer DCT-II rows used by :func:`phash64` AND baked
    verbatim into the oracle SQL — computed once, here, so no engine
    ever evaluates cos()."""
    return [
        [
            math.floor(math.cos(math.pi * (2 * x + 1) * j / (2 * PHASH_N)) * _SCALE + 0.5)
            for x in range(PHASH_N)
        ]
        for j in range(_LOW)
    ]


_C = np.array(int_dct_matrix(), dtype=np.int64)  # (8, 32)


def _to_raster32(gray: np.ndarray) -> np.ndarray:
    """Deterministic 32×32 reduction: exact block floor-mean when both
    dims are multiples of 32, else nearest-neighbor at floor(i·d/32) —
    integer index math only, no float resampling."""
    h, w = gray.shape
    if (h, w) == (PHASH_N, PHASH_N):
        return gray.astype(np.int64)
    if h % PHASH_N == 0 and w % PHASH_N == 0:
        bh, bw = h // PHASH_N, w // PHASH_N
        return (
            gray.astype(np.int64)
            .reshape(PHASH_N, bh, PHASH_N, bw)
            .sum(axis=(1, 3))
            // (bh * bw)
        )
    ys = (np.arange(PHASH_N, dtype=np.int64) * h) // PHASH_N
    xs = (np.arange(PHASH_N, dtype=np.int64) * w) // PHASH_N
    return gray.astype(np.int64)[np.ix_(ys, xs)]


def phash64(gray: np.ndarray) -> tuple:
    """64-bit perceptual hash of a gray raster → ``(hi32, lo32, bits)``
    where ``bits`` is the 64-char '0'/'1' string (row-major over the 8×8
    block) and hi/lo are its two 32-bit halves as ints."""
    r = _to_raster32(np.asarray(gray))
    t = _C @ r  # (8, 32) x (32, 32) -> (8, 32), int64 exact
    m = t @ _C.T  # (8, 8)
    flat = m.reshape(-1)
    med = int(np.sort(flat)[(_LOW * _LOW) // 2 - 1])  # lower median
    bits = "".join("1" if int(v) > med else "0" for v in flat)
    return int(bits[:32], 2), int(bits[32:], 2), bits


_POW32 = 1 << np.arange(31, -1, -1, dtype=np.int64)


def _phash64_batch(rasters: np.ndarray) -> tuple:
    """Vectorized :func:`phash64` over an (n, 32, 32) int64 raster stack
    → ``(hi, lo, n_ones)`` int64 arrays. One batched einsum replaces n
    per-row matmul calls and the per-row Python bit-string build (round
    13, guide §4.2 — hand whole batches to vectorized native code).
    Same integer arithmetic, bit-identical to the per-row form (pinned
    by test_phash batch-vs-scalar equality)."""
    t = np.einsum("jx,nxy,ky->njk", _C, rasters, _C)  # (n, 8, 8), int64 exact
    flat = t.reshape(len(rasters), _LOW * _LOW)
    med = np.sort(flat, axis=1)[:, (_LOW * _LOW) // 2 - 1]  # lower median
    bits = flat > med[:, None]
    hi = (bits[:, :32] * _POW32).sum(axis=1)
    lo = (bits[:, 32:] * _POW32).sum(axis=1)
    return hi, lo, bits.sum(axis=1)


PHASH_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("phash_hi", LongType()),
        StructField("phash_lo", LongType()),
        StructField("n_ones", IntegerType()),
        StructField("decode_error", StringType()),
    ]
)


def phash_fingerprints(df_with_payload: DataFrame) -> DataFrame:
    """Per-image pHash over (doc_id, payload) rows: payloads decode
    through the REAL image codecs (``multimodal.parse_image`` —
    PPM/PGM/BMP/JPEG/PNG/GIF), reduce to 32×32, hash. Corrupt rows
    null-route with the reason, the standard media contract."""
    import pandas as pd

    from .multimodal import parse_image

    def kernel(batches):
        for pdf in batches:
            n = len(pdf)
            # phase 1 (per row, codec-bound): decode + reduce to 32x32
            rasters, valid, errors = [], [], [None] * n
            for i, payload in enumerate(pdf["payload"]):
                try:
                    _fmt, w, h, luma = parse_image(bytes(payload))
                    rasters.append(
                        _to_raster32(
                            np.asarray(luma, dtype=np.int64).reshape(h, w)
                        )
                    )
                    valid.append(i)
                except ValueError as exc:
                    errors[i] = str(exc)
            # phase 2 (whole batch, vectorized): one batched integer DCT
            hi = np.zeros(n, dtype=np.int64)
            lo = np.zeros(n, dtype=np.int64)
            ones = np.zeros(n, dtype=np.int64)
            if valid:
                vh, vl, vo = _phash64_batch(np.stack(rasters))
                idx = np.asarray(valid)
                hi[idx], lo[idx], ones[idx] = vh, vl, vo
            ok = np.array([e is None for e in errors])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(
                        np.asarray(pdf["doc_id"]), dtype="int64"
                    ),
                    "phash_hi": pd.Series(hi, dtype="Int64").where(ok),
                    "phash_lo": pd.Series(lo, dtype="Int64").where(ok),
                    "n_ones": pd.Series(ones, dtype="Int32").where(ok),
                    "decode_error": errors,
                }
            )

    return df_with_payload.mapInPandas(kernel, PHASH_SCHEMA)


def _probe_masks(width: int, errors: int) -> list:
    """All XOR masks of ``width`` bits with ≤ ``errors`` bits set."""
    from itertools import combinations

    out = [0]
    for e in range(1, errors + 1):
        for pos in combinations(range(width), e):
            m = 0
            for p in pos:
                m |= 1 << p
            out.append(m)
    return out


def phash_near_pairs(fps: DataFrame, radius: int = 8, n_bands: int = 4) -> DataFrame:
    """Pairs of images within Hamming ``radius``, from a (doc_id,
    phash_hi, phash_lo) fingerprint frame. Returns
    (id_a, id_b, hamming_dist), id_a < id_b.

    Multi-probe pigeonhole (the HmSearch shape, and the same lesson the
    text-LSH multi-probe fix learned in round 6): naive banding needs
    radius+1 bands, and at radius 10 that means 5-bit bands — 32
    buckets, so a big corpus self-join degenerates quadratically
    (measured: 94s for 50k images). Instead keep FEW, WIDE bands
    (default 4 × 16 bits → 65,536 bucket values) and PROBE each band
    value within Hamming ``e = radius // n_bands`` of itself: if two
    hashes differ in ≤ radius bits, some band carries ≤ e of them
    (generalized pigeonhole), so the probed equi-join is COMPLETE —
    pinned by the brute-force test. Only the probe side fans out
    (Σ C(width, ≤e) patterns, 137 at 16/2); the corpus side stays one
    row per (doc, band). Candidates verify with one bit_count(xor)."""
    if not 0 <= radius < 64:
        raise ValueError("radius must be in [0, 64)")
    if not 1 <= n_bands <= 64 or 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    errors = radius // n_bands
    # two's-complement packing: hi*2^32 overflows int64 when bit 63 is
    # set, so fold hi into signed range FIRST (max result = 2^63-1)
    signed_hi = F.col("phash_hi").cast("bigint") - F.when(
        F.col("phash_hi") >= F.lit(1 << 31), F.lit(1 << 32)
    ).otherwise(F.lit(0))
    full = (
        fps.select(
            "doc_id",
            (signed_hi * F.lit(1 << 32) + F.col("phash_lo").cast("bigint")).alias(
                "__h64"
            ),
        )
        .filter(F.col("__h64").isNotNull())
        .localCheckpoint(eager=False)
    )
    bands = full.select(
        "doc_id",
        "__h64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("__h64"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("__b"),
    ).select(
        "doc_id", "__h64", F.col("__b.band").alias("band"), F.col("__b.val").alias("val")
    )
    masks = _probe_masks(width, errors)
    probes = bands.select(
        "doc_id",
        "__h64",
        "band",
        F.explode(
            F.transform(F.lit(masks), lambda m: F.col("val").bitwiseXOR(m))
        ).alias("val"),
    )
    a, b = probes.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.__h64").alias("__ha"),
            F.col("b.__h64").alias("__hb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dist = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming_dist", dist.cast("int"))
        .filter(F.col("hamming_dist") <= radius)
        .select("id_a", "id_b", "hamming_dist")
    )
