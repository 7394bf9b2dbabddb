"""Delta deletion vectors: descriptor resolution + the RoaringBitmapArray
codec (S9 extension; reference ``spark.json:19`` makes deltalake a
first-class format, and DVs are how modern delta writers encode
row-level DELETE/UPDATE/MERGE without rewriting parquet files).

Everything here is implemented from public specifications:

  - delta-io/delta PROTOCOL.md "Deletion Vectors": the ``deletionVector``
    descriptor on add/remove actions (``storageType`` ``u``/``i``/``p``,
    ``pathOrInlineDv``, ``offset``, ``sizeInBytes``, ``cardinality``),
    Base85 (RFC 1924 alphabet — exactly Python's ``base64.b85decode``)
    for the on-disk UUID and inline payloads, and the deletion vector
    file layout (format-version byte, then per DV: big-endian int32
    data size, the serialized bitmap, big-endian int32 CRC-32).
  - delta PROTOCOL.md "Deletion Vector Format": the 64-bit
    RoaringBitmapArray *portable* serialization — little-endian magic
    ``1681511377``, int64 bitmap count, then per bitmap an int32 key
    (the high 32 bits of the row index) followed by a standard 32-bit
    roaring bitmap.
  - RoaringBitmap/RoaringFormatSpec: the standard 32-bit format —
    cookies 12346 (no run containers) / 12347 (with a run-flag bitset),
    16-bit keyed containers as sorted uint16 arrays (cardinality ≤
    4096), 8 KiB bitsets, or ⟨start, length⟩ run pairs.

The DECODER is the load-bearing half (delta_lite reads foreign DV
tables). The ENCODER exists for test fixtures and oracle entries that
must hand-commit DV tables — writing deletion vectors into a real
table stays refused by delta_lite's writer-protocol gate; nothing here
changes that.

Scale note: descriptors ride the driver-side log replay (like every
other add-action field), but bitmap DECODING happens executor-side —
:func:`positions_iter` is called from an Arrow-batched ``mapInPandas``
kernel in delta_lite, so a table with thousands of DV files never
funnels bitmap bytes through the driver.
"""

from __future__ import annotations

import base64
import os
import struct
import uuid as _uuid
import zlib

#: RoaringBitmapArray portable-format magic (delta PROTOCOL.md)
MAGIC = 1681511377
#: standard 32-bit roaring cookies (RoaringFormatSpec)
_COOKIE_RUN = 12347
_COOKIE_NO_RUN = 12346
#: containers-at-or-above which the run format carries an offset header
_NO_OFFSET_THRESHOLD = 4
#: deletion vector file format version byte
_DV_FILE_VERSION = 1


# --------------------------------------------------------------------------
# 32-bit roaring bitmap (standard format)
# --------------------------------------------------------------------------


def _decode_rb32(buf: bytes, pos: int):
    """Decode one standard-format 32-bit roaring bitmap starting at
    ``pos``; returns ``(int64 ndarray, new_pos)`` with values sorted
    ascending (vectorized — the decode is the DV read hot path)."""
    (cookie32,) = struct.unpack_from("<i", buf, pos)
    cookie = cookie32 & 0xFFFF
    if cookie == _COOKIE_RUN:
        n = ((cookie32 >> 16) & 0xFFFF) + 1
        pos += 4
        flag_bytes = (n + 7) // 8
        run_flags = buf[pos : pos + flag_bytes]
        pos += flag_bytes
        is_run = [bool(run_flags[i // 8] & (1 << (i % 8))) for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        is_run = [False] * n
        has_offsets = True
    else:
        raise ValueError(f"not a roaring bitmap (cookie {cookie})")
    import numpy as np

    keys_cards = [
        struct.unpack_from("<HH", buf, pos + 4 * i) for i in range(n)
    ]
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential read
    out: list = []
    for i, (key, card_m1) in enumerate(keys_cards):
        base = key << 16
        card = card_m1 + 1
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            runs_arr = np.frombuffer(
                buf, dtype="<u2", count=2 * n_runs, offset=pos
            ).reshape(-1, 2)
            pos += 4 * n_runs
            vals = np.concatenate(
                [np.arange(s, s + l + 1, dtype=np.int64) for s, l in runs_arr]
            ) if n_runs else np.empty(0, dtype=np.int64)
        elif card <= 4096:
            vals = np.frombuffer(buf, dtype="<u2", count=card, offset=pos).astype(
                np.int64
            )
            pos += 2 * card
        else:
            bits = np.unpackbits(
                np.frombuffer(buf, dtype=np.uint8, count=8192, offset=pos),
                bitorder="little",
            )
            pos += 8192
            vals = np.nonzero(bits)[0].astype(np.int64)
        out.append(vals + base)
    merged = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return merged, pos


def _encode_rb32(values: list, runs: bool = False) -> bytes:
    """Encode sorted uint32 values as a standard-format 32-bit roaring
    bitmap. ``runs=True`` emits run containers (cookie 12347) for every
    container — fixtures use it to exercise the run-decoding path;
    otherwise containers are arrays (≤ 4096 values) or bitsets."""
    by_key: dict = {}
    for v in values:
        by_key.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(by_key)
    n = len(keys)
    parts: list = []
    if runs:
        header = struct.pack("<i", (_COOKIE_RUN & 0xFFFF) | ((n - 1) << 16))
        flags = bytearray((n + 7) // 8)
        for i in range(n):
            flags[i // 8] |= 1 << (i % 8)
        parts.append(header + bytes(flags))
    else:
        parts.append(struct.pack("<ii", _COOKIE_NO_RUN, n))
    for k in keys:
        parts.append(struct.pack("<HH", k, len(by_key[k]) - 1))
    containers: list = []
    for k in keys:
        vals = sorted(by_key[k])
        if runs:
            pairs: list = []
            start = prev = vals[0]
            for v in vals[1:]:
                if v == prev + 1:
                    prev = v
                    continue
                pairs.append((start, prev - start))
                start = prev = v
            pairs.append((start, prev - start))
            body = struct.pack("<H", len(pairs)) + b"".join(
                struct.pack("<HH", s, l) for s, l in pairs
            )
        elif len(vals) <= 4096:
            body = struct.pack(f"<{len(vals)}H", *vals)
        else:
            words = [0] * 1024
            for v in vals:
                words[v >> 6] |= 1 << (v & 63)
            body = struct.pack("<1024Q", *words)
        containers.append(body)
    has_offsets = (not runs) or n >= _NO_OFFSET_THRESHOLD
    if has_offsets:
        fixed = sum(len(p) for p in parts) + 4 * n
        offsets: list = []
        at = fixed
        for body in containers:
            offsets.append(at)
            at += len(body)
        parts.append(struct.pack(f"<{n}i", *offsets))
    return b"".join(parts) + b"".join(containers)


# --------------------------------------------------------------------------
# 64-bit RoaringBitmapArray (delta portable format)
# --------------------------------------------------------------------------


def decode_bitmap_array(data: bytes) -> list:
    """Serialized RoaringBitmapArray → sorted int64 row indexes."""
    if len(data) < 12:
        raise ValueError("deletion vector bitmap too short")
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(
            f"bad deletion vector magic {magic} (expected {MAGIC})"
        )
    import numpy as np

    (count,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list = []
    for _ in range(count):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _decode_rb32(data, pos)
        out.append(vals + (high << 32))
    merged = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
    return merged.tolist()


def encode_bitmap_array(positions: list, runs: bool = False) -> bytes:
    """Sorted-or-not int64 row indexes → serialized RoaringBitmapArray
    (fixture/oracle support — see module docstring)."""
    by_high: dict = {}
    for p in sorted(set(int(p) for p in positions)):
        if p < 0:
            raise ValueError(f"negative row index {p}")
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    parts = [struct.pack("<iq", MAGIC, len(by_high))]
    for high in sorted(by_high):
        parts.append(struct.pack("<i", high))
        parts.append(_encode_rb32(by_high[high], runs=runs))
    return b"".join(parts)


# --------------------------------------------------------------------------
# deletion vector files + descriptors
# --------------------------------------------------------------------------


def write_dv_file(path: str, payloads: list) -> list:
    """Write serialized bitmaps into one DV file; returns per-payload
    ``(offset, sizeInBytes)`` for the descriptors. Layout per the delta
    spec: one version byte, then for each DV a big-endian int32 data
    size, the data, and a big-endian int32 CRC-32 of the data."""
    out: list = []
    with open(path, "wb") as fh:
        fh.write(bytes([_DV_FILE_VERSION]))
        at = 1
        for data in payloads:
            fh.write(struct.pack(">i", len(data)))
            fh.write(data)
            fh.write(struct.pack(">i", zlib.crc32(data) & 0x7FFFFFFF))
            out.append((at, len(data)))
            at += 4 + len(data) + 4
    return out


def encode_dv_uuid_path(u: _uuid.UUID, prefix: str = "") -> str:
    """``pathOrInlineDv`` for storageType ``u``: optional random prefix
    + the 20-char Base85 (RFC 1924) encoding of the UUID bytes."""
    return prefix + base64.b85encode(u.bytes).decode("ascii")


def dv_file_name(u: _uuid.UUID) -> str:
    return f"deletion_vector_{u}.bin"


def resolve_dv_path(table_path: str, descriptor: dict) -> str | None:
    """Absolute filesystem path of an on-disk DV, or None for inline."""
    st = descriptor.get("storageType")
    ref = descriptor["pathOrInlineDv"]
    if st == "p":
        return ref
    if st == "u":
        prefix, enc = ref[:-20], ref[-20:]
        u = _uuid.UUID(bytes=base64.b85decode(enc))
        parts = [table_path] + ([prefix] if prefix else []) + [dv_file_name(u)]
        return os.path.join(*parts)
    if st == "i":
        return None
    raise ValueError(f"unknown deletion vector storageType {st!r}")


def dv_unique_id(descriptor: dict | None) -> str | None:
    """Identity of a DV for action reconciliation: storage type + path
    reference + offset (delta PROTOCOL.md 'Unique Identifiers')."""
    if not descriptor:
        return None
    base = f"{descriptor.get('storageType')}{descriptor.get('pathOrInlineDv')}"
    off = descriptor.get("offset")
    return base if off is None else f"{base}@{off}"


def read_dv_bytes(table_path: str, descriptor: dict) -> bytes:
    """Serialized bitmap bytes for a descriptor (any storage type), with
    the size and CRC-32 cross-checks the file format carries."""
    size = int(descriptor.get("sizeInBytes", -1))
    if descriptor.get("storageType") == "i":
        data = base64.b85decode(descriptor["pathOrInlineDv"])
        if size >= 0 and len(data) != size:
            raise ValueError(
                f"inline deletion vector size mismatch: descriptor says "
                f"{size}, payload is {len(data)}"
            )
        return data
    path = resolve_dv_path(table_path, descriptor)
    with open(path, "rb") as fh:
        fh.seek(int(descriptor.get("offset", 1)))
        (stored_size,) = struct.unpack(">i", fh.read(4))
        if size >= 0 and stored_size != size:
            raise ValueError(
                f"deletion vector size mismatch in {path}: descriptor says "
                f"{size}, file says {stored_size}"
            )
        data = fh.read(stored_size)
        if len(data) != stored_size:
            raise ValueError(f"truncated deletion vector in {path}")
        (crc,) = struct.unpack(">i", fh.read(4))
        if crc != (zlib.crc32(data) & 0x7FFFFFFF):
            raise ValueError(f"deletion vector CRC mismatch in {path}")
    return data


def dv_positions(table_path: str, descriptor: dict) -> list:
    """Deleted row indexes for a descriptor, cardinality-checked."""
    out = decode_bitmap_array(read_dv_bytes(table_path, descriptor))
    card = int(descriptor.get("cardinality", -1))
    if card >= 0 and len(out) != card:
        raise ValueError(
            f"deletion vector cardinality mismatch: descriptor says {card}, "
            f"bitmap has {len(out)}"
        )
    return out


def positions_iter(table_path: str, descriptors: list):
    """(file_key, descriptor) pairs → yields (file_key, position) — the
    executor-side kernel delta_lite maps over DV descriptors."""
    for file_key, descriptor in descriptors:
        for p in dv_positions(table_path, descriptor):
            yield file_key, p
