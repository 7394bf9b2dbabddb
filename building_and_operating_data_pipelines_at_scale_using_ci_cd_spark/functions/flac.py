"""FLAC codec (native FLAC container, the free-lossless bitstream) — zero
dependencies beyond numpy.

Closes the "entropy-coded audio" slice of ``decode_compressed_gate``
(after round 8's progressive JPEG / GIF-LZW / G.711 work, FLAC was the
last named audio format with no real decode path). Everything here is
from the PUBLIC format spec (xiph.org FLAC format / RFC 9639):

  - **decode_flac**: STREAMINFO + metadata-block walk, then per-frame
    decode with ALL subframe types — CONSTANT, VERBATIM, FIXED orders
    0-4, LPC orders 1-32 — Rice-coded residual partitions (both 4- and
    5-bit parameter widths, escape-to-raw), wasted-bits shifts, and the
    four channel assignments incl. left/side, right/side and mid/side
    decorrelation. CRC-8 (frame header) and CRC-16 (whole frame) are
    VERIFIED — a flipped payload byte surfaces as the per-row
    ``ValueError``, never as silently wrong samples.
  - **encode_flac**: a spec-valid encoder used by tests and the oracle
    entry: per-block best-of (constant | fixed 0-2 by absolute-residual
    sum) with proper Rice parameter selection, optional forced VERBATIM
    / LPC (hand-set coefficients, to pin the LPC decode path) and
    mid/side stereo. Decode(encode(x)) == x exactly — FLAC is lossless,
    so the oracle can recompute features from the raw sample formula.

Corrupt-input contract: every parse failure raises ``ValueError`` (the
class :func:`audio.audio_features` null-routes per row); struct/index
errors are normalized at the :func:`decode_flac` boundary like
``decode_jpeg`` does.

Scale shape: decoding is per-clip Python inside an Arrow batch — a
narrow map stage with no shuffle, the same shape as the JPEG/GIF tier.
The BitReader does bulk unary scans via ``int.bit_length`` over a
buffered window rather than per-bit loops, which keeps short-clip
decode ~µs/sample; clips are independent rows, so 100-TB audio is
partition-parallel by construction.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_flac", "encode_flac"]

# CRC-8, poly x^8+x^2+x+1 (0x07), init 0 — frame-header checksum
_CRC8_TABLE = []
for _b in range(256):
    _c = _b
    for _ in range(8):
        _c = ((_c << 1) ^ 0x07) & 0xFF if _c & 0x80 else (_c << 1) & 0xFF
    _CRC8_TABLE.append(_c)

# CRC-16, poly x^16+x^15+x^2+1 (0x8005), init 0 — whole-frame checksum
_CRC16_TABLE = []
for _b in range(256):
    _c = _b << 8
    for _ in range(8):
        _c = ((_c << 1) ^ 0x8005) & 0xFFFF if _c & 0x8000 else (_c << 1) & 0xFFFF
    _CRC16_TABLE.append(_c)


def _crc8(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC8_TABLE[c ^ byte]
    return c


def _crc16(data: bytes) -> int:
    c = 0
    for byte in data:
        c = _CRC16_TABLE[((c >> 8) ^ byte) & 0xFF] ^ ((c << 8) & 0xFFFF)
    return c


_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}
_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}
_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


class _BitReader:
    """MSB-first bit reader over bytes. Unary runs use int.bit_length on
    a buffered chunk instead of a per-bit Python loop."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        p, d = self.pos, self.data
        end = p + n
        if end > len(d) * 8:
            raise ValueError("truncated FLAC bitstream")
        first, last = p >> 3, (end + 7) >> 3
        chunk = int.from_bytes(d[first:last], "big")
        chunk >>= (last << 3) - end
        self.pos = end
        return chunk & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v & (1 << (n - 1)) else v

    def read_unary(self) -> int:
        """Count of 0 bits before the next 1 bit."""
        d = self.data
        total_bits = len(d) * 8
        q = 0
        while True:
            p = self.pos
            if p >= total_bits:
                raise ValueError("truncated FLAC bitstream (unary)")
            # examine up to 32 bits at a time
            take = min(32, total_bits - p)
            first, last = p >> 3, (p + take + 7) >> 3
            chunk = int.from_bytes(d[first:last], "big")
            width = (last - first) << 3
            chunk = (chunk >> (width - (p - (first << 3)) - take)) & ((1 << take) - 1)
            if chunk == 0:
                q += take
                self.pos = p + take
                continue
            lead = take - chunk.bit_length()  # zeros before the first 1
            self.pos = p + lead + 1
            return q + lead

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(br: _BitReader) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits)."""
    b0 = br.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x80
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 2 or n > 7:
        raise ValueError("corrupt FLAC: bad coded number")
    v = b0 & (0xFF >> (n + 1))
    for _ in range(n - 1):
        b = br.read(8)
        if (b & 0xC0) != 0x80:
            raise ValueError("corrupt FLAC: bad coded number continuation")
        v = (v << 6) | (b & 0x3F)
    return v


def _read_residual(br: _BitReader, block_size: int, order: int) -> list:
    method = br.read(2)
    if method > 1:
        raise ValueError(f"corrupt FLAC: reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    po = br.read(4)
    if block_size % (1 << po):
        raise ValueError("corrupt FLAC: partition order does not divide block")
    out = []
    for part in range(1 << po):
        n = (block_size >> po) - (order if part == 0 else 0)
        if n < 0:
            raise ValueError("corrupt FLAC: predictor order exceeds partition")
        k = br.read(pbits)
        if k == escape:
            raw = br.read(5)
            if raw == 0:
                out.extend([0] * n)
            else:
                out.extend(br.read_signed(raw) for _ in range(n))
        else:
            for _ in range(n):
                q = br.read_unary()
                v = (q << k) | br.read(k)
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(br: _BitReader, block_size: int, bps: int) -> list:
    if br.read(1):
        raise ValueError("corrupt FLAC: subframe padding bit set")
    sf_type = br.read(6)
    wasted = 0
    if br.read(1):
        wasted = br.read_unary() + 1
    bps -= wasted
    if bps <= 0:
        raise ValueError("corrupt FLAC: wasted bits exceed sample size")

    if sf_type == 0:  # CONSTANT
        samples = [br.read_signed(bps)] * block_size
    elif sf_type == 1:  # VERBATIM
        samples = [br.read_signed(bps) for _ in range(block_size)]
    elif 8 <= sf_type <= 12:  # FIXED, order 0-4
        order = sf_type - 8
        if order > block_size:
            raise ValueError("corrupt FLAC: fixed order exceeds block")
        samples = [br.read_signed(bps) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        coef = _FIXED_COEFFS[order]
        for e in resid:
            pred = 0
            for j, c in enumerate(coef):
                pred += c * samples[-1 - j]
            samples.append(e + pred)
    elif sf_type >= 32:  # LPC, order 1-32
        order = sf_type - 31
        if order > block_size:
            raise ValueError("corrupt FLAC: LPC order exceeds block")
        samples = [br.read_signed(bps) for _ in range(order)]
        precision = br.read(4) + 1
        if precision == 16:
            raise ValueError("corrupt FLAC: invalid LPC precision")
        shift = br.read_signed(5)
        if shift < 0:
            raise ValueError("corrupt FLAC: negative LPC shift")
        coef = [br.read_signed(precision) for _ in range(order)]
        resid = _read_residual(br, block_size, order)
        for e in resid:
            acc = 0
            for j, c in enumerate(coef):
                acc += c * samples[-1 - j]
            samples.append(e + (acc >> shift))
    else:
        raise ValueError(f"corrupt FLAC: reserved subframe type {sf_type}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _decode_frame(br: _BitReader, info: dict) -> tuple:
    """Returns (list-of-channel-sample-lists, sample_rate)."""
    start_byte = br.byte_pos()
    sync = br.read(14)
    if sync != 0x3FFE:
        raise ValueError("corrupt FLAC: lost frame sync")
    if br.read(1):
        raise ValueError("corrupt FLAC: reserved frame bit set")
    br.read(1)  # blocking strategy (fixed/variable) — number read below either way
    bs_code = br.read(4)
    sr_code = br.read(4)
    ch_code = br.read(4)
    ss_code = br.read(3)
    if br.read(1):
        raise ValueError("corrupt FLAC: reserved frame header bit")
    _read_utf8_number(br)
    if bs_code == 0:
        raise ValueError("corrupt FLAC: reserved block size code 0")
    elif bs_code == 6:
        block_size = br.read(8) + 1
    elif bs_code == 7:
        block_size = br.read(16) + 1
    else:
        block_size = _BLOCK_SIZES[bs_code]
    if sr_code == 0:
        rate = info["sample_rate"]
    elif sr_code == 12:
        rate = br.read(8) * 1000
    elif sr_code == 13:
        rate = br.read(16)
    elif sr_code == 14:
        rate = br.read(16) * 10
    elif sr_code == 15:
        raise ValueError("corrupt FLAC: invalid sample rate code")
    else:
        rate = _SAMPLE_RATES[sr_code]
    if ss_code == 0:
        bps = info["bits_per_sample"]
    elif ss_code == 3:
        raise ValueError("corrupt FLAC: reserved sample size code")
    else:
        bps = _SAMPLE_SIZES[ss_code]

    br.align()  # header ends padded? (no — CRC-8 is byte-aligned next)
    header = br.data[start_byte : br.byte_pos()]
    if br.read(8) != _crc8(header):
        raise ValueError("corrupt FLAC: frame header CRC-8 mismatch")

    if ch_code <= 7:
        n_ch = ch_code + 1
        chans = [_decode_subframe(br, block_size, bps) for _ in range(n_ch)]
    elif ch_code in (8, 9, 10):
        n_ch = 2
        # the SIDE channel carries one extra bit
        if ch_code == 8:  # left/side
            left = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            chans = [left, [l - s for l, s in zip(left, side)]]
        elif ch_code == 9:  # right/side
            side = _decode_subframe(br, block_size, bps + 1)
            right = _decode_subframe(br, block_size, bps)
            chans = [[r + s for r, s in zip(right, side)], right]
        else:  # mid/side
            mid = _decode_subframe(br, block_size, bps)
            side = _decode_subframe(br, block_size, bps + 1)
            left, right = [], []
            for m, s in zip(mid, side):
                m = (m << 1) | (s & 1)
                left.append((m + s) >> 1)
                right.append((m - s) >> 1)
            chans = [left, right]
    else:
        raise ValueError(f"corrupt FLAC: reserved channel assignment {ch_code}")
    if info["channels"] and n_ch != info["channels"]:
        raise ValueError("corrupt FLAC: frame channel count differs from STREAMINFO")

    br.align()
    frame = br.data[start_byte : br.byte_pos()]
    if br.read(16) != _crc16(frame):
        raise ValueError("corrupt FLAC: frame CRC-16 mismatch")
    return chans, rate


def decode_flac(payload: bytes):
    """Decode native-FLAC bytes → ``(sample_rate, n_channels, samples)``
    with ``samples`` = channel 0 as a list of ints — the same contract as
    :func:`audio.decode_wav`. Raises ``ValueError`` on any corruption
    (bad magic, CRC mismatch, reserved codes, truncation)."""
    try:
        if payload[:4] != b"fLaC":
            raise ValueError("not a FLAC stream (missing fLaC magic)")
        pos = 4
        info = None
        last = False
        while not last:
            if pos + 4 > len(payload):
                raise ValueError("truncated FLAC metadata")
            hdr = payload[pos]
            last = bool(hdr & 0x80)
            btype = hdr & 0x7F
            length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
            body = payload[pos + 4 : pos + 4 + length]
            if len(body) != length:
                raise ValueError("truncated FLAC metadata block")
            if btype == 0:  # STREAMINFO
                if length != 34:
                    raise ValueError("corrupt FLAC: STREAMINFO length != 34")
                bits = int.from_bytes(body[10:18], "big")
                info = {
                    "sample_rate": (bits >> 44) & 0xFFFFF,
                    "channels": ((bits >> 41) & 0x7) + 1,
                    "bits_per_sample": ((bits >> 36) & 0x1F) + 1,
                    "total_samples": bits & 0xFFFFFFFFF,
                }
            elif btype == 127:
                raise ValueError("corrupt FLAC: invalid metadata block type")
            pos += 4 + length
        if info is None:
            raise ValueError("corrupt FLAC: missing STREAMINFO")
        if info["sample_rate"] <= 0:
            raise ValueError("corrupt FLAC: zero sample rate")

        br = _BitReader(payload[pos:])
        ch0: list = []
        total = info["total_samples"]
        rate = info["sample_rate"]
        while (total and len(ch0) < total) or (
            not total and br.byte_pos() + 2 < len(br.data)
        ):
            chans, rate = _decode_frame(br, info)
            ch0.extend(chans[0])
        if total and len(ch0) > total:
            ch0 = ch0[:total]  # last block may be padded by sloppy encoders
        return rate, info["channels"], ch0
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(f"corrupt FLAC: {type(exc).__name__}") from exc


# ---------------------------------------------------------------------------
# encoder


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    nbytes = 2
    while n >= (1 << (nbytes * 5 + 1)) and nbytes < 7:
        nbytes += 1
    lead = (0xFF << (8 - nbytes)) & 0xFF
    shifts = (nbytes - 1) * 6
    out.append(lead | (n >> shifts))
    for i in range(nbytes - 1):
        shifts -= 6
        out.append(0x80 | ((n >> shifts) & 0x3F))
    return bytes(out)


def _best_rice_param(resid: list, pbits: int) -> int:
    if not resid:
        return 0
    mean = sum((v << 1) ^ (v >> 63) if v < 0 else (v << 1) for v in resid) // max(
        len(resid), 1
    )
    k = 0
    while (1 << (k + 1)) < mean + 1 and k < (1 << pbits) - 2:
        k += 1
    return k


def _write_residual(
    bw: _BitWriter, resid: list, block_size: int = 0, order: int = 0, po: int = 0
) -> None:
    """Rice-code the residual; ``po`` > 0 splits it into 2^po partitions
    with independent parameters (block_size/order required then).
    ``po`` is clamped to the largest LEGAL order for this block: 2^po
    must divide the block and partition 0 (which cedes ``order`` warmup
    samples) must not go negative — hypothesis found the unclamped
    version emitting a corrupt stream for a short tail block under a
    forced partition order."""
    while po and (block_size % (1 << po) or (block_size >> po) < order):
        po -= 1
    bw.write(0, 2)  # 4-bit rice params
    bw.write(po, 4)
    pos = 0
    for part in range(1 << po):
        n = (block_size >> po) - (order if part == 0 else 0) if po else len(resid)
        chunk = resid[pos : pos + n]
        pos += n
        k = _best_rice_param(chunk, 4)
        bw.write(k, 4)
        for v in chunk:
            u = (v << 1) if v >= 0 else ((-v << 1) - 1)
            bw.write_unary(u >> k)
            if k:
                bw.write(u & ((1 << k) - 1), k)


def _encode_subframe(
    bw: _BitWriter, samples: list, bps: int, force: str | None, po: int = 0
) -> None:
    n = len(samples)
    if force == "verbatim":
        bw.write(0, 1); bw.write(1, 6); bw.write(0, 1)
        for s in samples:
            bw.write(s, bps)
        return
    if force == "lpc":
        # order-2 LPC with explicit coefficients [2, -1] at shift 0 —
        # numerically the fixed-2 predictor, but through the LPC path
        order, precision, shift, coef = 2, 5, 0, [2, -1]
        bw.write(0, 1); bw.write(32 + order - 1, 6); bw.write(0, 1)
        for s in samples[:order]:
            bw.write(s, bps)
        bw.write(precision - 1, 4)
        bw.write(shift, 5)
        for c in coef:
            bw.write(c, precision)
        resid = [
            samples[i] - ((coef[0] * samples[i - 1] + coef[1] * samples[i - 2]) >> shift)
            for i in range(order, n)
        ]
        _write_residual(bw, resid, n, order, po)
        return
    if all(s == samples[0] for s in samples):
        bw.write(0, 1); bw.write(0, 6); bw.write(0, 1)
        bw.write(samples[0], bps)
        return
    # pick the fixed order 0-2 with the smallest |residual| sum
    best_order, best_resid, best_cost = 0, samples, sum(abs(v) for v in samples)
    arr = samples
    for order in (1, 2):
        if n <= order:
            break
        coef = _FIXED_COEFFS[order]
        resid = [
            arr[i] - sum(c * arr[i - 1 - j] for j, c in enumerate(coef))
            for i in range(order, n)
        ]
        cost = sum(abs(v) for v in resid)
        if cost < best_cost:
            best_order, best_resid, best_cost = order, resid, cost
    bw.write(0, 1); bw.write(8 + best_order, 6); bw.write(0, 1)
    for s in samples[:best_order]:
        bw.write(s, bps)
    _write_residual(bw, best_resid, n, best_order, po)


def encode_flac(
    channels: list,
    sample_rate: int,
    bps: int = 16,
    block_size: int = 4096,
    subframe: str | None = None,
    stereo: str = "independent",
    partition_order: int = 0,
) -> bytes:
    """Encode ``channels`` (list of per-channel int lists, equal length)
    as a native FLAC stream. ``subframe`` forces 'verbatim' or 'lpc' for
    path-pinning tests; default picks constant/fixed-order per block.
    ``stereo='mid/side'`` exercises the decorrelated 2-channel path."""
    n_ch = len(channels)
    if not 1 <= n_ch <= 8:
        raise ValueError("encode_flac supports 1-8 channels")
    total = len(channels[0])
    if any(len(c) != total for c in channels):
        raise ValueError("all channels must have equal length")
    if stereo == "mid/side" and n_ch != 2:
        raise ValueError("mid/side needs exactly 2 channels")

    out = bytearray(b"fLaC")
    body = bytearray()
    body += struct.pack(">HH", min(block_size, total) or 16, block_size)
    body += b"\x00\x00\x00" * 2  # min/max frame size unknown
    bits = (sample_rate << 44) | ((n_ch - 1) << 41) | ((bps - 1) << 36) | total
    body += bits.to_bytes(8, "big")
    body += b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + bytes(body)

    frame_no = 0
    pos = 0
    while pos < total or (total == 0 and frame_no == 0):
        blk = [c[pos : pos + block_size] for c in channels]
        bs = len(blk[0])
        if bs == 0:
            break
        bw = _BitWriter()
        bw.write(0x3FFE, 14)
        bw.write(0, 1)  # reserved
        bw.write(0, 1)  # fixed blocksize strategy
        bw.write(7, 4)  # block size: 16-bit value - 1 follows
        bw.write(0, 4)  # sample rate: from STREAMINFO
        if stereo == "mid/side":
            bw.write(10, 4)
        else:
            bw.write(n_ch - 1, 4)
        ss_code = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        bw.write(ss_code, 3)
        bw.write(0, 1)
        for b in _utf8_number(frame_no):
            bw.write(b, 8)
        bw.write(bs - 1, 16)
        header = bw.buf  # byte-aligned here by construction
        assert bw.nbits == 0
        bw.write(_crc8(bytes(header)), 8)
        po = partition_order if bs % (1 << partition_order) == 0 else 0
        if stereo == "mid/side":
            left, right = blk
            side = [l - r for l, r in zip(left, right)]
            mid = [(l + r) >> 1 for l, r in zip(left, right)]
            _encode_subframe(bw, mid, bps, subframe, po)
            _encode_subframe(bw, side, bps + 1, subframe, po)
        else:
            for c in blk:
                _encode_subframe(bw, c, bps, subframe, po)
        bw.align()
        frame = bytes(bw.buf)
        out += frame + struct.pack(">H", _crc16(frame))
        pos += bs
        frame_no += 1
    return bytes(out)
