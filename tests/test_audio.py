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



class TestIMAADPCM:
    """IMA/DVI ADPCM (WAV format 0x11): predictive 4:1 compression."""

    def test_step_recurrence_hand_values(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            _IMA_STEP_TABLE,
            _ima_step,
        )

        # pred=0, index=0, step=7: nibble 7 -> diff = 0+1+3+7 = 11, idx +8
        assert _ima_step(0, 0, 7) == (11, 8)
        assert _ima_step(0, 0, 15) == (-11, 8)
        # index clamps at both ends
        assert _ima_step(0, 0, 0)[1] == 0
        assert _ima_step(0, 88, 4)[1] == 88
        # predictor clamps to int16
        assert _ima_step(32700, 88, 7)[0] == 32767
        assert _ima_step(-32700, 88, 15)[0] == -32768
        assert _IMA_STEP_TABLE[88] == 32767 and len(_IMA_STEP_TABLE) == 89

    def test_encode_decode_tracks_signal(self):
        import math

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            decode_wav,
            encode_wav_adpcm_ima,
        )

        x = [int(6000 * math.sin(i / 9)) for i in range(505 * 3)]
        rate, ch, dec = decode_wav(encode_wav_adpcm_ima(x, 16000))
        assert (rate, ch) == (16000, 1)
        assert len(dec) == len(x)
        # after the per-block header resync the code tracks within a few
        # steps; ignore the first block's attack ramp
        tail_err = max(abs(a - b) for a, b in zip(x[505:], dec[505:]))
        assert tail_err < 1500

    def test_block_header_resyncs_exactly(self):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            decode_wav,
            encode_wav_adpcm_ima,
        )

        x = [0] * 505 + [12345] + [12345] * 504
        _, _, dec = decode_wav(encode_wav_adpcm_ima(x, 8000))
        assert dec[505] == 12345  # block 2's header carries the exact sample

    def test_corrupt_inputs_are_valueerror(self):
        import struct

        import pytest

        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            decode_wav,
            encode_wav_adpcm_ima,
        )

        good = bytearray(encode_wav_adpcm_ima([0] * 505, 8000))
        # step index byte out of range (>88): find the data chunk start
        pos = good.find(b"data") + 8
        bad = bytearray(good)
        bad[pos + 2] = 99
        with pytest.raises(ValueError, match="step index"):
            decode_wav(bytes(bad))
        # stereo rejected honestly
        fmt_pos = good.find(b"fmt ") + 8
        bad2 = bytearray(good)
        struct.pack_into("<H", bad2, fmt_pos + 2, 2)
        with pytest.raises(ValueError, match="mono"):
            decode_wav(bytes(bad2))
        with pytest.raises(ValueError):
            encode_wav_adpcm_ima([0] * 10, 8000, block_samples=4)  # even

    def test_audio_features_drives_adpcm(self, spark):
        from building_and_operating_data_pipelines_at_scale_using_ci_cd_spark.functions.audio import (
            audio_features,
            decode_wav,
            encode_wav_adpcm_ima,
        )

        wav = encode_wav_adpcm_ima([100, 200, -100, 50, 0] * 101, 8000)
        _, _, dec = decode_wav(wav)
        df = spark.createDataFrame([(1, bytearray(wav)), (2, bytearray(b"RIFFjunk"))],
                                   ["doc_id", "payload"])
        rows = {r.doc_id: r for r in audio_features(df).collect()}
        assert rows[1].n_samples == len(dec)
        assert rows[1].sum_abs == sum(abs(v) for v in dec)
        assert rows[1].decode_error is None
        assert rows[2].decode_error is not None  # corrupt row null-routes
