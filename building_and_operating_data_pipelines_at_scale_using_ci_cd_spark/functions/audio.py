"""WAV (RIFF PCM) audio codec + feature extraction — zero dependencies.

The multimodal tier treated audio as opaque bytes with a stand-in
feature kernel (``decode_media_batch``'s byte statistics). Like BMP/PPM
on the image side, uncompressed RIFF/WAVE needs nothing but struct
parsing, so the audio lane gets a REAL bytes→samples path:

  - **decode_wav**: RIFF chunk walk (fmt/data, unknown chunks skipped —
    LIST/INFO/fact appear in the wild); PCM at 8 (unsigned, offset
    removed), 16, and 24 bits little-endian at any rate/channel count,
    plus ITU-T G.711 µ-law (format 7) and A-law (format 6) expanded to
    16-bit linear through the closed-form segment expansion (round 8 —
    the first COMPRESSED audio the engine decodes natively; G.711 is a
    fixed 2:1 logarithmic code, no entropy coding, so it needs nothing
    but integer arithmetic), plus IMA/DVI ADPCM (format 0x11, round-8
    fifth session — PREDICTIVE 4:1 compression: each 4-bit code updates
    a per-block (predictor, step-index) state machine over the public
    89-entry step table). Anything else raises ``ValueError``
    honestly. Returns channel 0's samples — the deterministic mono
    reference every downstream feature uses — at native depth (8-bit →
    ±127, 24-bit → ±2^23).
  - **encode_wav_pcm16 / encode_wav_pcm8 / encode_wav_pcm24 /
    encode_wav_g711**: minimal spec-valid writers so tests and the
    oracle entry run on genuine RIFF streams. The G.711 encoder is a
    nearest-code quantizer over the 256-entry expansion table —
    equivalent to the bit-twiddling reference encoder up to ties, and
    by construction exactly consistent with the decoder.
  - **audio_features**: Arrow ``mapInPandas`` over a payload column →
    per-clip integer features (duration, peak, energy, zero crossings).
    ALL-INTEGER on purpose: PCM is integral, so every feature is exact
    and a DuckDB oracle can re-derive it from a synthesized waveform's
    closed form without parsing a single RIFF byte — the strict-oracle
    discipline the image codecs use, with no tolerance contract needed
    (PCM is lossless).

Scale shape: identical to ``decode_image`` — a narrow Arrow map stage,
parallel over rows, no shuffle; corrupt payloads null-route per row
with the reason, never killing the stage.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def mulaw_expand(u: int) -> int:
    """ITU-T G.711 µ-law byte → 16-bit linear (closed-form segment
    expansion: magnitude = ((mantissa·8 + 132) << exponent) − 132)."""
    u = ~u & 0xFF
    mag = (((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)
    mag -= 0x84
    return -mag if u & 0x80 else mag


def alaw_expand(a: int) -> int:
    """ITU-T G.711 A-law byte → 16-bit linear. Sign bit 1 = positive
    (after the 0x55 toggle, which A-law applies to even bits)."""
    a ^= 0x55
    seg = (a >> 4) & 7
    mant = a & 0x0F
    if seg == 0:
        mag = (mant << 4) + 8
    else:
        mag = ((mant << 4) + 0x108) << (seg - 1)
    return mag if a & 0x80 else -mag


_MULAW_TABLE = np.array([mulaw_expand(b) for b in range(256)], dtype=np.int64)
_ALAW_TABLE = np.array([alaw_expand(b) for b in range(256)], dtype=np.int64)

#: IMA/DVI ADPCM (WAV format 0x11) — the standard public tables
#: (IMA "Recommended Practices for Enhancing Digital Audio
#: Compatibility", 1992; identical in every implementation).
_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_step(pred: int, index: int, nib: int) -> tuple[int, int]:
    """One IMA ADPCM decoder step: (pred, index) + 4-bit code →
    (new_pred, new_index). The exact reference recurrence — sign bit 8,
    diff = step/8 + step/4·b0 + step/2·b1 + step·b2, clamp to int16,
    index walk clamped to [0, 88]."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if nib & 1:
        diff += step >> 2
    if nib & 2:
        diff += step >> 1
    if nib & 4:
        diff += step
    pred = pred - diff if nib & 8 else pred + diff
    pred = max(-32768, min(32767, pred))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[nib & 7]))
    return pred, index


def encode_wav_adpcm_ima(samples, sample_rate: int, block_samples: int = 505) -> bytes:
    """Mono IMA ADPCM WAV (format 0x11): the standard predictive
    encoder — each sample's difference from the running prediction is
    quantized to the largest 3-bit magnitude not exceeding it (plus the
    sign bit), then the encoder runs the DECODER's update so both sides
    track the identical state; by construction decode is exactly
    consistent. ``block_samples`` must be odd (1 header sample +
    2 nibbles per data byte)."""
    if block_samples < 3 or block_samples % 2 == 0:
        raise ValueError("block_samples must be odd and >= 3")
    arr = [int(v) for v in samples]
    index = 0
    blocks = []
    for start in range(0, len(arr), block_samples):
        chunk = arr[start : start + block_samples]
        pred = max(-32768, min(32767, chunk[0]))
        blocks.append(struct.pack("<hBB", pred, index, 0))
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEP_TABLE[index]
            delta = s - pred
            nib = 8 if delta < 0 else 0
            delta = abs(delta)
            if delta >= step:
                nib |= 4
                delta -= step
            if delta >= step >> 1:
                nib |= 2
                delta -= step >> 1
            if delta >= step >> 2:
                nib |= 1
            pred, index = _ima_step(pred, index, nib)
            nibs.append(nib)
        if len(nibs) % 2:  # final short block: pad with a 0 nibble
            nibs.append(0)
        blocks.append(bytes(nibs[i] | (nibs[i + 1] << 4) for i in range(0, len(nibs), 2)))
    data = b"".join(blocks)
    block_align = 4 + (block_samples - 1) // 2
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        (sample_rate * block_align) // block_samples, block_align, 4,
        2, block_samples,
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_wav_g711(samples, sample_rate: int, law: str = "mulaw") -> bytes:
    """Mono G.711 WAV: quantize 16-bit linear samples to the NEAREST
    code in the expansion table (ties to the lower byte value) and wrap
    in a format-7 (µ-law) / format-6 (A-law) RIFF container."""
    table = _MULAW_TABLE if law == "mulaw" else _ALAW_TABLE
    code = 7 if law == "mulaw" else 6
    arr = np.asarray(samples, dtype=np.int64)
    data = bytes(
        np.abs(arr[:, None] - table[None, :]).argmin(axis=1).astype(np.uint8)
    )
    fmt = struct.pack("<HHIIHH", code, 1, sample_rate, sample_rate, 1, 8)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _encode_pcm(samples, sample_rate: int, channels: int, bits: int, data: bytes) -> bytes:
    block_align = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, bits
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def encode_wav_pcm8(samples, sample_rate: int, channels: int = 1) -> bytes:
    """8-bit PCM WAV (stored unsigned with 128 offset, per spec);
    ``samples`` are signed −128..127."""
    arr = np.asarray(samples, dtype=np.int64)
    if channels <= 0 or len(arr) % channels:
        raise ValueError("sample count must be a multiple of channels")
    return _encode_pcm(
        samples, sample_rate, channels, 8, (arr + 128).astype(np.uint8).tobytes()
    )


def encode_wav_pcm24(samples, sample_rate: int, channels: int = 1) -> bytes:
    """24-bit PCM WAV, little-endian 3-byte signed samples."""
    arr = np.asarray(samples, dtype=np.int64)
    if channels <= 0 or len(arr) % channels:
        raise ValueError("sample count must be a multiple of channels")
    b = (arr & 0xFFFFFF).astype(np.uint32)
    raw = np.zeros((len(arr), 3), dtype=np.uint8)
    raw[:, 0] = b & 0xFF
    raw[:, 1] = (b >> 8) & 0xFF
    raw[:, 2] = (b >> 16) & 0xFF
    return _encode_pcm(samples, sample_rate, channels, 24, raw.tobytes())


def encode_wav_pcm16(samples, sample_rate: int, channels: int = 1) -> bytes:
    """Pack int16 samples (interleaved if ``channels`` > 1) into a
    canonical 44-byte-header RIFF/WAVE file."""
    arr = np.asarray(samples, dtype=np.int16)
    if channels <= 0 or len(arr) % channels:
        raise ValueError("sample count must be a multiple of channels")
    data = arr.tobytes()
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, byte_rate, block_align, 16
    )
    return (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def decode_wav(payload: bytes):
    """Decode PCM-16 RIFF/WAVE bytes → ``(sample_rate, n_channels,
    samples)`` with ``samples`` = channel 0 as a list of ints. Raises
    ``ValueError`` on non-RIFF, non-PCM, non-16-bit, or truncated
    input."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt ":
            if len(body) < 16:
                raise ValueError("truncated WAV fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif tag == b"data":
            if len(body) != size:
                raise ValueError("truncated WAV data chunk")
            data = body
        # unknown chunks (LIST, fact, cue…) skipped; chunks are
        # word-aligned — odd sizes carry a pad byte
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError("corrupt WAV: missing fmt or data chunk")
    audio_format, channels, sample_rate, _rate, _align, bits = fmt
    if channels <= 0:
        raise ValueError("corrupt WAV: zero channels")
    if sample_rate <= 0:
        # downstream duration math divides by the rate; a zero here must
        # surface as the per-row decode_error, not a stage-killing
        # ZeroDivisionError
        raise ValueError("corrupt WAV: zero sample rate")
    if audio_format == 1:  # linear PCM at 8/16/24 bits
        if bits == 16:
            arr = np.frombuffer(
                data[: (len(data) // (2 * channels)) * 2 * channels], dtype="<i2"
            )
            ch0 = arr[::channels].astype(np.int64)
        elif bits == 8:  # stored unsigned, offset 128
            arr = np.frombuffer(data[: (len(data) // channels) * channels], dtype=np.uint8)
            ch0 = arr[::channels].astype(np.int64) - 128
        elif bits == 24:  # 3-byte little-endian signed
            n = (len(data) // (3 * channels)) * (3 * channels)
            raw = np.frombuffer(data[:n], dtype=np.uint8).reshape(-1, 3)
            v = (
                raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16)
            )
            v -= (v >> 23) << 24  # sign-extend bit 23
            ch0 = v[::channels]
        else:
            raise ValueError(f"only 8/16/24-bit PCM supported (got {bits})")
    elif audio_format in (6, 7):  # G.711 A-law / µ-law, always 8-bit mono bytes
        if bits != 8:
            raise ValueError(f"corrupt WAV: G.711 with {bits}-bit samples")
        table = _MULAW_TABLE if audio_format == 7 else _ALAW_TABLE
        arr = np.frombuffer(data[: (len(data) // channels) * channels], dtype=np.uint8)
        ch0 = table[arr[::channels].astype(np.int64)]
    elif audio_format == 0x11:  # IMA/DVI ADPCM (predictive 4:1 compression)
        if bits != 4:
            raise ValueError(f"corrupt WAV: IMA ADPCM with {bits}-bit codes")
        if channels != 1:
            raise ValueError("IMA ADPCM: only mono streams decode natively")
        block_align = fmt[4]
        if block_align < 5:
            raise ValueError("corrupt WAV: IMA ADPCM block_align < 5")
        out: list[int] = []
        for start in range(0, len(data), block_align):
            block = data[start : start + block_align]
            if len(block) < 5:
                raise ValueError("corrupt WAV: truncated IMA ADPCM block")
            pred = struct.unpack_from("<h", block, 0)[0]
            index = block[2]
            if index > 88:
                raise ValueError("corrupt WAV: IMA ADPCM step index out of range")
            out.append(pred)
            # every nibble present decodes (low nibble first); a padded
            # final short block therefore yields its pad sample — the
            # samplesPerBlock-aware trim is the container's job
            for byte in block[4:]:
                for nib in (byte & 0x0F, byte >> 4):
                    pred, index = _ima_step(pred, index, nib)
                    out.append(pred)
        ch0 = np.asarray(out, dtype=np.int64)
    else:
        raise ValueError(
            f"unsupported WAV format code {audio_format} (PCM 8/16/24-bit, "
            "G.711 mu-law/A-law and IMA ADPCM decode natively; other "
            "compressed audio needs a codec library)"
        )
    return sample_rate, channels, [int(v) for v in ch0]


def decode_audio(payload: bytes):
    """Container dispatch: RIFF/WAVE → :func:`decode_wav` (PCM 8/16/24,
    G.711 µ-law/A-law), ``fLaC`` magic → :func:`flac.decode_flac` (the
    entropy-coded lossless path, round 8). Same ``(sample_rate,
    n_channels, ch0_samples)`` contract and ValueError corrupt-row class
    either way."""
    if payload[:4] == b"fLaC":
        from .flac import decode_flac

        return decode_flac(payload)
    return decode_wav(payload)


AUDIO_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("peak_abs", LongType()),
        StructField("sum_abs", LongType()),
        StructField("energy", LongType()),
        StructField("zero_crossings", LongType()),
        StructField("decode_error", StringType()),
    ]
)


def audio_feature_row(payload: bytes) -> tuple:
    """The per-clip integer feature tuple of :func:`audio_features` for
    ONE payload: (sample_rate, n_channels, n_samples, duration_ms,
    peak_abs, sum_abs, energy, zero_crossings, decode_error). The single
    source of truth for the feature math — the distributed kernel and
    the driver-side bounded-class decodes in the entry queries both call
    it, so they can never drift."""
    try:
        rate, channels, samples = decode_audio(bytes(payload))
        s = np.asarray(samples, dtype=np.int64)
        return (
            rate,
            channels,
            len(s),
            int(len(s)) * 1000 // rate,
            int(np.abs(s).max()) if len(s) else 0,
            int(np.abs(s).sum()),
            int((s * s).sum()),
            int(((s[:-1] * s[1:]) < 0).sum()) if len(s) > 1 else 0,
            None,
        )
    except ValueError as exc:
        return (None,) * 8 + (str(exc),)


#: per-task decode memo: skip caching clips bigger than this (a multi-MB
#: clip's features are cheap to recompute relative to holding its digest
#: entry hostage to a task-lifetime dict on a mostly-unique corpus)
_MEMO_MAX_PAYLOAD = 4 * 1024 * 1024
#: and cap the entry count outright — bounded memory per task, period
_MEMO_MAX_ENTRIES = 4096


def audio_features(df_with_payload: DataFrame) -> DataFrame:
    """Per-clip integer features over a (doc_id, payload) frame:
    duration (ms, floor), peak amplitude, Σ|s|, Σs² (the integer energy
    — RMS without the cross-engine sqrt), and zero crossings (count of
    adjacent sample pairs with strictly opposite signs, s_{i-1}·s_i<0).
    Undecodable rows null-route with the reason, like
    :func:`multimodal.decode_image`."""
    import hashlib

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # decode-once-per-distinct-payload (round 12): identical bytes
        # decode identically, so a per-task memo collapses duplicate
        # clips (re-uploads) to one decode each. Fresh per task — never
        # crosses runs. Round 13 (ADVICE fix): keyed on the md5 DIGEST
        # so the dict never retains payload bytes, entry count capped,
        # and oversized clips skip caching — bounded executor memory on
        # a mostly-unique multi-MB corpus.
        seen: dict = {}
        for pdf in batches:
            out = {f.name: [] for f in AUDIO_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                out["doc_id"].append(doc_id)
                raw = bytes(payload)
                cacheable = len(raw) <= _MEMO_MAX_PAYLOAD
                key = hashlib.md5(raw).digest() if cacheable else None
                feats = seen.get(key) if cacheable else None
                if feats is None:
                    feats = audio_feature_row(raw)
                    if cacheable and len(seen) < _MEMO_MAX_ENTRIES:
                        seen[key] = feats
                for k, v in zip(
                    (
                        "sample_rate", "n_channels", "n_samples", "duration_ms",
                        "peak_abs", "sum_abs", "energy", "zero_crossings",
                        "decode_error",
                    ),
                    feats,
                ):
                    out[k].append(v)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "sample_rate": pd.Series(out["sample_rate"], dtype="Int32"),
                    "n_channels": pd.Series(out["n_channels"], dtype="Int32"),
                    "n_samples": pd.Series(out["n_samples"], dtype="Int32"),
                    "duration_ms": pd.Series(out["duration_ms"], dtype="Int64"),
                    "peak_abs": pd.Series(out["peak_abs"], dtype="Int64"),
                    "sum_abs": pd.Series(out["sum_abs"], dtype="Int64"),
                    "energy": pd.Series(out["energy"], dtype="Int64"),
                    "zero_crossings": pd.Series(out["zero_crossings"], dtype="Int64"),
                    "decode_error": out["decode_error"],
                }
            )

    return df_with_payload.mapInPandas(kernel, AUDIO_SCHEMA)
