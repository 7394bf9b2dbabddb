"""WAV/RIFF PCM codec (functions/audio.py): lossless round trips, chunk
walking, robustness, and the Arrow feature kernel."""

import struct

import numpy as np
import pytest

from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
    audio_features,
    decode_wav,
    encode_wav_pcm16,
)


def _tone(n=480, amp=1000, period=16):
    return [int(amp * (1 if (i // (period // 2)) % 2 == 0 else -1)) for i in range(n)]


class TestRoundTrip:
    def test_mono_lossless(self):
        samples = _tone()
        rate, ch, got = decode_wav(encode_wav_pcm16(samples, 8000))
        assert (rate, ch) == (8000, 1)
        assert got == samples

    def test_stereo_channel0(self):
        left = _tone(100, amp=500)
        right = _tone(100, amp=900)
        inter = [v for pair in zip(left, right) for v in pair]
        rate, ch, got = decode_wav(encode_wav_pcm16(inter, 44100, channels=2))
        assert (rate, ch) == (44100, 2)
        assert got == left

    def test_negative_and_extremes(self):
        samples = [-32768, 32767, 0, -1, 1]
        _, _, got = decode_wav(encode_wav_pcm16(samples, 16000))
        assert got == samples

    def test_unknown_chunks_skipped(self):
        payload = bytearray(encode_wav_pcm16(_tone(10), 8000))
        # splice a LIST chunk (odd size -> pad byte) between fmt and data
        insert_at = payload.index(b"data")
        extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
        payload[insert_at:insert_at] = extra
        rate, ch, got = decode_wav(bytes(payload))
        assert got == _tone(10)


class TestRobustness:
    def test_not_riff(self):
        with pytest.raises(ValueError, match="RIFF"):
            decode_wav(b"\xff\xd8not audio")

    def test_compressed_rejected(self):
        payload = bytearray(encode_wav_pcm16(_tone(10), 8000))
        i = payload.index(b"fmt ") + 8
        payload[i] = 0x55  # format code -> MP3-ish
        with pytest.raises(ValueError, match="format code"):
            decode_wav(bytes(payload))

    def test_truncated_data(self):
        payload = encode_wav_pcm16(_tone(100), 8000)
        with pytest.raises(ValueError):
            decode_wav(payload[: len(payload) - 50])


def test_audio_features_kernel(spark):
    samples = _tone(480, amp=1000, period=16)
    rows = [
        (1, bytearray(encode_wav_pcm16(samples, 8000))),
        (2, bytearray(b"RIFFjunk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}
    s = np.asarray(samples, dtype=np.int64)
    r1 = got[1]
    assert r1["decode_error"] is None
    assert (r1["sample_rate"], r1["n_channels"], r1["n_samples"]) == (8000, 1, 480)
    assert r1["duration_ms"] == 480 * 1000 // 8000 == 60
    assert r1["peak_abs"] == 1000
    assert r1["sum_abs"] == int(np.abs(s).sum())
    assert r1["energy"] == int((s * s).sum())
    assert r1["zero_crossings"] == int(((s[:-1] * s[1:]) < 0).sum())
    assert got[2]["decode_error"] is not None and got[2]["sample_rate"] is None


class TestDepthsAndG711:
    def test_pcm8_roundtrip(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            encode_wav_pcm8,
        )

        s = list(range(-128, 128))
        rate, ch, got = decode_wav(encode_wav_pcm8(s, 8000))
        assert (rate, ch) == (8000, 1) and got == s

    def test_pcm24_roundtrip_extremes(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            encode_wav_pcm24,
        )

        s = [-(1 << 23), (1 << 23) - 1, 0, -1, 1, 123456, -654321]
        _, _, got = decode_wav(encode_wav_pcm24(s, 44100))
        assert got == s

    def test_g711_table_ranges(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            _ALAW_TABLE,
            _MULAW_TABLE,
        )

        # canonical ITU G.711 extremes and symmetry
        assert int(_MULAW_TABLE.max()) == 32124 == -int(_MULAW_TABLE.min())
        assert int(_ALAW_TABLE.max()) == 32256 == -int(_ALAW_TABLE.min())
        # every code distinct per sign half (the expansion is injective
        # up to the two zero codes in mu-law)
        assert len(set(_ALAW_TABLE.tolist())) == 256

    @pytest.mark.parametrize("law", ["mulaw", "alaw"])
    def test_g711_nearest_code_and_idempotence(self, law):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            _ALAW_TABLE,
            _MULAW_TABLE,
            encode_wav_g711,
        )

        table = _MULAW_TABLE if law == "mulaw" else _ALAW_TABLE
        x = np.linspace(-32000, 32000, 501).astype(int).tolist()
        _, _, dec = decode_wav(encode_wav_g711(x, 8000, law=law))
        for xi, di in zip(x, dec):
            assert di == int(table[np.abs(np.int64(xi) - table).argmin()])
        _, _, dec2 = decode_wav(encode_wav_g711(dec, 8000, law=law))
        assert dec2 == dec  # codebook values quantize to themselves

