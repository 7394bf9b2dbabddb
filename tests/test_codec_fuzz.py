"""Deterministic corrupt-input fuzz over every media decoder: ValueError
is the ONLY exception class allowed out (the decode_image /
audio_features / sample_video_frames per-row null-route contract — any
other class kills a whole Arrow stage on one bad row).

A 45k-case interactive run of this harness found two real escapes in
round 8 (both fixed and pinned below): an OverflowError from a corrupt
DC Huffman category (receive(255) builds a 255-bit int that can't enter
the int64 coefficient store) and a ZeroDivisionError from a zero
sampling factor in a corrupt SOF. The committed version keeps a fixed
seed and a bounded case count so it stays fast and reproducible."""

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
    decode_wav,
    encode_wav_g711,
    encode_wav_pcm16,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.avi import (
    demux_avi,
    mux_mjpeg_avi,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.gif import (
    decode_gif,
    encode_gif_gray,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    encode_jpeg_gray_progressive,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.flac import (
    decode_flac,
    encode_flac,
)
from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.png import (
    decode_png,
    encode_png_gray,
    encode_png_gray16,
)

_rng = np.random.default_rng(20260814)
_IMG = _rng.integers(0, 256, (16, 16), dtype=np.uint8)
_TONE = [int(v) for v in _rng.integers(-3000, 3000, 200)]

_SEEDS = {
    "gif": (lambda: encode_gif_gray(_IMG, 16, 16, interlace=True), decode_gif),
    "gif_anim": (lambda: encode_gif_gray([_IMG, _IMG], 16, 16, transparent_idx=0), decode_gif),
    "png": (lambda: encode_png_gray(_IMG.reshape(-1), 16, 16, interlace=True), decode_png),
    "png16": (lambda: encode_png_gray16([v * 257 for v in _IMG.reshape(-1)], 16, 16), decode_png),
    "jpeg": (lambda: encode_jpeg_gray(_IMG.reshape(-1), 16, 16), decode_jpeg),
    "jpeg_prog": (
        lambda: encode_jpeg_gray_progressive(_IMG.reshape(-1), 16, 16, mode="successive"),
        decode_jpeg,
    ),
    "wav": (lambda: encode_wav_pcm16(_TONE, 8000), decode_wav),
    "g711": (lambda: encode_wav_g711(_TONE, 8000), decode_wav),
    "flac": (lambda: encode_flac([_TONE], 8000, block_size=64), decode_flac),
    "flac_ms": (
        lambda: encode_flac([_TONE, _TONE[::-1]], 8000, stereo="mid/side"),
        decode_flac,
    ),
    "avi": (
        lambda: mux_mjpeg_avi([encode_jpeg_gray(_IMG.reshape(-1), 16, 16)] * 3, 16, 16),
        demux_avi,
    ),
}


@pytest.mark.parametrize("name", sorted(_SEEDS))
def test_mutated_payloads_only_raise_valueerror(name):
    make, dec = _SEEDS[name]
    payload = bytes(make())
    rng = np.random.default_rng(hash(name) & 0xFFFF)
    for _ in range(400):
        b = bytearray(payload)
        op = rng.integers(0, 3)
        if op == 0:  # flip a few bytes
            for _ in range(int(rng.integers(1, 5))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
        elif op == 1:  # truncate anywhere
            b = b[: int(rng.integers(0, len(b)))]
        else:  # splice garbage
            pos = int(rng.integers(0, len(b)))
            b[pos:pos] = bytes(rng.integers(0, 256, int(rng.integers(1, 40)), dtype=np.uint8))
        try:
            dec(bytes(b))
        except ValueError:
            pass  # the one allowed class


class TestFuzzFoundRegressions:
    def test_dc_category_overflow_is_valueerror(self):
        # DHT vals patched so DC category decodes as 255 -> receive(255)
        # used to build a 255-bit int and OverflowError the int64 store
        payload = bytearray(encode_jpeg_gray(_IMG.reshape(-1), 16, 16))
        i = payload.index(b"\xff\xc4")
        # DC value bytes live after marker(2)+len(2)+tc/th(1)+bits(16);
        # force EVERY DC symbol to category 255 so the first block trips it
        for k in range(12):
            payload[i + 21 + k] = 0xFF
        with pytest.raises(ValueError, match="DC category"):
            decode_jpeg(bytes(payload))

    def test_zero_sampling_factor_is_valueerror(self):
        payload = bytearray(encode_jpeg_gray(_IMG.reshape(-1), 16, 16))
        i = payload.index(b"\xff\xc0")
        # SOF0 component hv byte: marker(2)+len(2)+prec(1)+dims(4)+ncomp(1)+cid(1)
        payload[i + 11] = 0x00
        with pytest.raises(ValueError, match="sampling"):
            decode_jpeg(bytes(payload))
