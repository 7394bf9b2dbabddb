"""Perceptual image hashing (functions/phash.py): integer-DCT pHash +
Hamming band pairing."""

import hashlib

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.phash import (
    PHASH_N,
    int_dct_matrix,
    phash64,
    phash_fingerprints,
    phash_near_pairs,
)


def _rand(seed, shape=(32, 32)):
    return np.random.default_rng(seed).integers(0, 256, shape)


def test_integer_matrix_shape_and_symmetries():
    m = int_dct_matrix()
    assert len(m) == 8 and all(len(r) == 32 for r in m)
    assert all(v == 10**6 for v in m[0])  # DC row: cos(0) = 1
    # row 1 is antisymmetric around the center (cosine half-wave)
    assert m[1][0] == -m[1][31] and m[1][15] == -m[1][16]


def test_hash_is_deterministic_and_64_bits():
    r = _rand(1)
    hi, lo, bits = phash64(r)
    assert (hi, lo, bits) == phash64(r)
    assert len(bits) == 64 and set(bits) <= {"0", "1"}
    assert int(bits[:32], 2) == hi and int(bits[32:], 2) == lo
    # lower-median threshold: strictly more than half the bits are 0
    assert bits.count("1") <= 32


def test_perceptual_property():
    r = _rand(2)
    _, _, base = phash64(r)
    light = r.copy()
    light[31, :] = (light[31, :] + 40) % 256  # retouch one row
    _, _, near = phash64(light)
    _, _, far = phash64(_rand(3))
    d_near = sum(a != b for a, b in zip(base, near))
    d_far = sum(a != b for a, b in zip(base, far))
    assert d_near < 16 < d_far  # random pairs live near 32


def test_resize_paths():
    r = _rand(4)
    base = phash64(r)[2]
    # exact block replication hashes identically (block mean recovers it)
    assert phash64(np.kron(r, np.ones((3, 3), dtype=int)))[2] == base
    # non-multiple sizes go through deterministic NN sampling
    assert len(phash64(_rand(5, (45, 37)))[2]) == 64


def test_no_int64_overflow_at_extremes():
    hi, lo, bits = phash64(np.full((PHASH_N, PHASH_N), 255))
    assert bits.count("1") <= 32  # flat image: only DC positive


def _pgm(doc_id: int) -> bytes:
    base = doc_id - (doc_id % 2)
    rows = [
        hashlib.md5(
            (f"{doc_id}#x" if r == 31 and doc_id % 2 else f"{base}#{r}").encode()
        ).hexdigest()
        for r in range(32)
    ]
    return b"P5 32 32 255\n" + "".join(rows).encode()


def test_fingerprints_and_corrupt_routing(spark):
    rows = [(d, _pgm(d)) for d in range(8)] + [(99, b"P5 8 8 255\nshort")]
    fps = phash_fingerprints(
        spark.createDataFrame(rows, "doc_id long, payload binary")
    )
    got = {r.doc_id: r for r in fps.collect()}
    assert got[99].decode_error is not None and got[99].phash_hi is None
    for d in range(8):
        assert got[d].decode_error is None
        assert 0 <= got[d].phash_hi < 2**32 and 0 <= got[d].phash_lo < 2**32


def test_band_pairing_matches_brute_force(spark):
    """Banding completeness: the band join finds EXACTLY the pairs a
    brute-force Hamming scan finds, at every radius band width."""
    rows = [(d, _pgm(d)) for d in range(24)]
    fps = phash_fingerprints(
        spark.createDataFrame(rows, "doc_id long, payload binary")
    ).persist()
    hashes = {
        r.doc_id: (r.phash_hi << 32) | r.phash_lo for r in fps.collect()
    }
    for radius in (4, 10, 15):
        got = {
            (r.id_a, r.id_b, r.hamming_dist)
            for r in phash_near_pairs(fps, radius=radius).collect()
        }
        want = set()
        ids = sorted(hashes)
        for i, a in enumerate(ids):
            for b in ids[i + 1 :]:
                d = bin(hashes[a] ^ hashes[b]).count("1")
                if d <= radius:
                    want.add((a, b, d))
        assert got == want, f"radius {radius}"


def test_pairing_validation(spark):
    fps = phash_fingerprints(
        spark.createDataFrame([(1, _pgm(1))], "doc_id long, payload binary")
    )
    with pytest.raises(ValueError, match="radius"):
        phash_near_pairs(fps, radius=64)
