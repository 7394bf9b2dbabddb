"""GIF codec — pure-Python LZW both directions, closing the GIF half of
the compressed-image gate the way ``png.py``/``jpeg.py`` closed theirs.

GIF is palette-indexed and LZW is lossless, so — like PNG — decode(
encode(img)) == img exactly and the driver entry carries a full-strength
position-weighted-checksum oracle. The pieces (GIF89a specification):

  - **decode_gif**: header + logical screen descriptor, global/local
    color tables, extension-block skipping (GCE parsed for transparency
    and disposal), image descriptors with per-frame LZW decode (variable
    code width 3..12 bits LSB-first, clear/EOI codes, the KwKwK case,
    deferred-clear full-table streams), GIF row interlace (the 4-pass
    8/8/4/2 scheme — distinct from PNG's Adam7), and multi-frame
    compositing (disposal 0/1 leave-in-place, 2 restore-to-background;
    transparent pixels keep the underlying canvas). Returns the FIRST
    composited frame's 601-luma raster; :func:`gif_frame_lumas` returns
    every frame for the video tier.
  - **encode_gif_gray**: single- or multi-frame greyscale writer over a
    256-entry identity-grey palette (palette[i] = (i,i,i), so luma ==
    index — lossless by construction) with a real LZW encoder
    (dictionary reset at 4096, matching the decoder's cap) and optional
    row interlace. Exists so tests and the oracle entry exercise REAL
    LZW bitstreams, not canned bytes.

Production note (same contract as jpeg.py/png.py): LZW here is
per-image sequential Python inside Arrow map stages — a cluster deploy
swaps in PIL/giflib for the kernel; the Spark plan shape (narrow map,
no shuffle, per-row ValueError null-routing) is identical, which is the
part that matters at 100 TB.
"""

from __future__ import annotations

import struct

import numpy as np

# GIF row-interlace passes: (first_row, step)
_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]
_MAX_CODE = 1 << 12  # LZW table hard cap (spec)


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> list[int]:
    """GIF-flavor LZW: codes are LSB-first, width grows from
    min_code_size+1 up to 12 bits, table appends are capped at 4096
    (deferred-clear streams keep emitting 12-bit codes without adding).
    Stops after ``expected`` indices or EOI."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"corrupt GIF: LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [(i,) for i in range(clear)] + [None, None]
    table = list(base)
    width = min_code_size + 1
    acc = nbits = pos = 0
    out: list[int] = []
    prev: tuple | None = None
    while len(out) < expected:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("corrupt GIF: LZW stream exhausted")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or table[code] is None:
                raise ValueError("corrupt GIF: LZW code before any output")
            entry = table[code]
        elif code < len(table) and table[code] is not None:
            entry = table[code]
            if len(table) < _MAX_CODE:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < _MAX_CODE:
            entry = prev + prev[:1]  # the KwKwK case
            table.append(entry)
        else:
            raise ValueError("corrupt GIF: LZW code out of range")
        if len(table) == (1 << width) and width < 12:
            width += 1
        out.extend(entry)
        prev = entry
    return out[:expected]


def _lzw_encode(min_code_size: int, indices) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    w: tuple = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < _MAX_CODE:
            table[wk] = next_code
            next_code += 1
            # the decoder learns each added string one code LATER than the
            # encoder creates it, so its width bump lands one read later —
            # hence +1 here. Rule validated against real tool-produced
            # GIFs (CPython idlelib icons cross the 512/1024 boundaries
            # and decode exactly with the decoder's len(table)==2^w rule).
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        w = (k,)
    if w:
        emit(table[w], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# Encoder (greyscale identity palette)
# ---------------------------------------------------------------------------


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif_gray(
    frames,
    width: int,
    height: int,
    interlace: bool = False,
    transparent_idx: int | None = None,
    disposals=None,
) -> bytes:
    """Grey GIF over the 256-entry identity palette. ``frames`` is one
    raster (flat or (h,w)) or a list of them; multi-frame output writes
    GIF89a with a Graphic Control Extension per frame (disposal from
    ``disposals``, default 1 = leave in place; ``transparent_idx`` marks
    that index transparent in frames AFTER the first)."""
    if not isinstance(frames, (list, tuple)) or (
        frames and isinstance(frames[0], (int, np.integer))
    ):
        frames = [frames]
    frames = [np.asarray(f, dtype=np.uint8).reshape(height, width) for f in frames]
    animated = len(frames) > 1
    out = bytearray(b"GIF89a" if animated or transparent_idx is not None else b"GIF87a")
    # logical screen: GCT flag set, 8-bit color resolution, GCT size 256
    out += struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    for i in range(256):
        out += bytes((i, i, i))
    for fi, img in enumerate(frames):
        if animated or transparent_idx is not None:
            disp = (disposals[fi] if disposals else 1) & 7
            packed = (disp << 2) | (
                1 if (transparent_idx is not None and fi > 0) else 0
            )
            out += bytes((0x21, 0xF9, 4, packed, 2, 0, transparent_idx or 0, 0))
        out += b"\x2c" + struct.pack(
            "<HHHHB", 0, 0, width, height, 0x40 if interlace else 0
        )
        if interlace:
            rows = [r for start, step in _INTERLACE for r in range(start, height, step)]
            img = img[rows]
        out.append(8)  # LZW min code size
        out += _sub_blocks(_lzw_encode(8, img.reshape(-1)))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_sub_blocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("corrupt GIF: unterminated sub-blocks")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += payload[pos : pos + n]
        if pos + n > len(payload):
            raise ValueError("corrupt GIF: truncated sub-block")
        pos += n


def gif_frame_lumas(payload: bytes):
    """Decode every frame of a GIF → ``(width, height, [luma_list...])``
    where each luma list is the FULL composited canvas after that frame
    (what a viewer shows), in ITU-R 601 integer luma. ValueError is the
    only corrupt-input exception (the decode_image null-route
    contract)."""
    try:
        return _gif_frames_inner(payload)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt GIF: truncated or malformed block ({exc})") from exc


def _gif_frames_inner(payload: bytes):
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (missing header)")
    width, height, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        if len(gct) < n:
            raise ValueError("corrupt GIF: truncated global color table")
        pos += 3 * n
    # background index can legally exceed the palette (viewers treat the
    # background as transparent); fall back to 0 so luma lookup stays in range
    if gct is None or bg_idx >= len(gct):
        bg_idx = 0
    canvas = np.full((height, width), bg_idx, dtype=np.uint8)
    luma_frames: list[list[int]] = []
    transparent: int | None = None
    disposal = 0
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _read_sub_blocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                gpacked = data[0]
                transparent = data[3] if gpacked & 1 else None
                disposal = (gpacked >> 2) & 7
            continue
        if block != 0x2C:
            raise ValueError(f"corrupt GIF: unknown block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack_from("<HHHHB", payload, pos)
        pos += 9
        if left + fw > width or top + fh > height:
            raise ValueError("corrupt GIF: frame rect outside logical screen")
        pal = gct
        if fpacked & 0x80:  # local color table
            n = 2 << (fpacked & 7)
            pal = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
            if len(pal) < n:
                raise ValueError("corrupt GIF: truncated local color table")
            pos += 3 * n
        if pal is None:
            raise ValueError("corrupt GIF: no color table")
        min_code = payload[pos]
        pos += 1
        data, pos = _read_sub_blocks(payload, pos)
        idx = np.array(
            _lzw_decode(min_code, data, fw * fh), dtype=np.int64
        ).reshape(fh, fw)
        # transparent pixels are never looked up in the palette, and real
        # encoders legally pick a transparent index past the table end —
        # only OPAQUE out-of-range indices are corrupt
        opaque = idx if transparent is None else idx[idx != transparent]
        if opaque.size and int(opaque.max()) >= len(pal):
            raise ValueError("corrupt GIF: pixel index outside color table")
        if fpacked & 0x40:  # row interlace: invert the 4-pass permutation
            rows = [r for start, step in _INTERLACE for r in range(start, fh, step)]
            deinter = np.empty_like(idx)
            deinter[rows] = idx
            idx = deinter
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = idx[mask].astype(np.uint8)
        else:
            region[:] = idx.astype(np.uint8)
        rgb = pal[canvas.astype(np.int64)].astype(np.int64)
        luma = (299 * rgb[..., 0] + 587 * rgb[..., 1] + 114 * rgb[..., 2]) // 1000
        luma_frames.append([int(v) for v in luma.reshape(-1)])
        if disposal == 2:  # restore the frame rect to background
            canvas[top : top + fh, left : left + fw] = bg_idx
        elif disposal not in (0, 1):
            raise ValueError(f"GIF disposal method {disposal} not supported")
        transparent = None
        disposal = 0
    if not luma_frames:
        raise ValueError("corrupt GIF: no image data")
    return width, height, luma_frames


def decode_gif(payload: bytes):
    """First composited frame as ``(width, height, luma)`` — the
    single-image contract shared with decode_png/decode_jpeg."""
    w, h, frames = gif_frame_lumas(payload)
    return w, h, frames[0]
