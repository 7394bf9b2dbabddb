"""EXIF metadata for the multimodal tier: parse, report, and STRIP.

Why this exists in a training-data engine: crawled images carry EXIF
APP1 payloads whose GPS IFD is raw location PII (and whose timestamps/
device fields are fingerprinting surface). A 100-TB image corpus needs
(a) a metadata REPORT (orientation for correct decode, capture time for
dedup/recency, GPS presence for the privacy audit) and (b) a SCRUB that
removes the metadata without re-encoding pixels — ``strip_exif`` drops
APP1..APP15 segments and leaves every entropy-coded byte untouched, so
the cleaned image decodes bit-identically (pinned by test).

Format scope (the parts of the public EXIF/TIFF 6.0 layout this
implements, from the spec structure — not from any codebase):

  - JPEG APP1 segment tagged ``Exif\\x00\\x00`` holding a TIFF file:
    byte-order mark ``II``/``MM``, magic 42, IFD0 offset;
  - IFD = count + 12-byte entries (tag, type, count, value-or-offset) +
    next-IFD offset; values wider than 4 bytes live at their offset;
  - IFD0 tags: Make (0x010F ASCII), Orientation (0x0112 SHORT),
    DateTime (0x0132 ASCII), GPS-IFD pointer (0x8825 LONG);
  - GPS IFD tags: LatRef/LonRef (ASCII ``N``/``S``/``E``/``W``) and
    Lat/Lon as three RATIONALs (deg, min, sec).

Coordinates convert to INTEGER micro-degrees (the geo.py unit): the
writer encodes micro-degrees exactly as (deg,1),(min,1),(sec·3600
remainder, 10⁶) rationals and the parser floors each rational
component back, so write→parse round-trips bit-exact — the property
test's contract. Malformed payloads raise ValueError with a reason and
the Spark kernels null-route them (the decode_image convention).

Everything driver/executor-side is stdlib ``struct`` — no imaging
library, same honesty as jpeg.py/png.py.
"""

from __future__ import annotations

import struct
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_TAG_MAKE = 0x010F
_TAG_ORIENTATION = 0x0112
_TAG_DATETIME = 0x0132
_TAG_GPS_IFD = 0x8825
_GPS_LAT_REF = 0x0001
_GPS_LAT = 0x0002
_GPS_LON_REF = 0x0003
_GPS_LON = 0x0004

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}


def _micro_to_dms(micro: int) -> list:
    """Non-negative micro-degrees → the DECIMAL-MINUTES rational form
    ``((deg,1), (rem·60, 10⁶), (0,1))`` many real writers emit —
    chosen because it round-trips EXACTLY through the floor-per-
    component parser: min·10⁶ // (60·den) = rem·60·10⁶ // (60·10⁶)
    = rem for every remainder (a seconds-based split is NOT exactly
    invertible when minutes·10⁶ isn't divisible by 60 — the first
    draft's bug, caught by the round-trip smoke)."""
    deg, rem = divmod(micro, 1_000_000)
    return [(deg, 1), (rem * 60, 1_000_000), (0, 1)]


def _dms_to_micro(rats: list) -> int:
    """Three (num, den) rationals → floor micro-degrees (exact inverse
    of :func:`_micro_to_dms` for its outputs)."""
    (dn, dd), (mn, md), (sn, sd) = rats
    if dd == 0 or md == 0 or sd == 0:
        raise ValueError("exif: zero-denominator GPS rational")
    return (
        dn * 1_000_000 // dd
        + mn * 1_000_000 // (60 * md)
        + sn * 1_000_000 // (3600 * sd)
    )


def build_exif_app1(
    orientation: int | None = None,
    datetime_str: str | None = None,
    make: str | None = None,
    gps_lat_micro: int | None = None,
    gps_lon_micro: int | None = None,
    byte_order: str = "II",
) -> bytes:
    """Serialize a minimal EXIF APP1 segment BODY (``Exif\\x00\\x00`` +
    TIFF) — the test/fixture writer whose output :func:`parse_exif`
    must round-trip exactly. Either byte order."""
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be 'II' or 'MM'")
    e = "<" if byte_order == "II" else ">"

    ifd0_entries = []  # (tag, type, count, payload_bytes_or_inline)
    data_blobs = []

    def _ascii(tag, s):
        raw = s.encode("ascii") + b"\x00"
        ifd0_entries.append((tag, 2, len(raw), raw))

    if make is not None:
        _ascii(_TAG_MAKE, make)
    if orientation is not None:
        ifd0_entries.append(
            (_TAG_ORIENTATION, 3, 1, struct.pack(e + "HH", orientation, 0))
        )
    if datetime_str is not None:
        _ascii(_TAG_DATETIME, datetime_str)

    has_gps = gps_lat_micro is not None and gps_lon_micro is not None
    gps_entries = []
    if has_gps:
        lat_ref = b"N\x00" if gps_lat_micro >= 0 else b"S\x00"
        lon_ref = b"E\x00" if gps_lon_micro >= 0 else b"W\x00"
        lat_r = _micro_to_dms(abs(gps_lat_micro))
        lon_r = _micro_to_dms(abs(gps_lon_micro))
        lat_raw = b"".join(struct.pack(e + "II", n, d) for n, d in lat_r)
        lon_raw = b"".join(struct.pack(e + "II", n, d) for n, d in lon_r)
        gps_entries = [
            (_GPS_LAT_REF, 2, 2, lat_ref),
            (_GPS_LAT, 5, 3, lat_raw),
            (_GPS_LON_REF, 2, 2, lon_ref),
            (_GPS_LON, 5, 3, lon_raw),
        ]
        ifd0_entries.append((_TAG_GPS_IFD, 4, 1, None))  # offset patched below

    ifd0_entries.sort(key=lambda t: t[0])
    n0 = len(ifd0_entries)
    ifd0_off = 8
    ifd0_size = 2 + n0 * 12 + 4
    gps_off = ifd0_off + ifd0_size
    gps_size = (2 + len(gps_entries) * 12 + 4) if has_gps else 0
    data_off = gps_off + gps_size

    def _render(entries, base_data_off):
        out = struct.pack(e + "H", len(entries))
        blobs = b""
        off = base_data_off
        for tag, typ, count, raw in entries:
            if tag == _TAG_GPS_IFD:
                out += struct.pack(e + "HHII", tag, typ, count, gps_off)
                continue
            size = _TYPE_SIZES[typ] * count
            if size <= 4:
                out += struct.pack(e + "HHI", tag, typ, count) + raw[:4].ljust(4, b"\x00")
            else:
                out += struct.pack(e + "HHII", tag, typ, count, off)
                blobs += raw
                off += size
        out += struct.pack(e + "I", 0)  # next IFD
        return out, blobs, off

    ifd0_bytes, blobs0, off_after0 = _render(ifd0_entries, data_off)
    header = byte_order.encode("ascii") + struct.pack(e + "HI", 42, 8)
    if has_gps:
        gps_bytes, blobs1, _ = _render(gps_entries, off_after0)
        body = header + ifd0_bytes + gps_bytes + blobs0 + blobs1
    else:
        body = header + ifd0_bytes + blobs0
    return b"Exif\x00\x00" + body


def inject_app1(jpeg_bytes: bytes, app1_body: bytes) -> bytes:
    """Insert an APP1 segment right after SOI — fixture helper."""
    if jpeg_bytes[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    seg = b"\xff\xe1" + struct.pack(">H", len(app1_body) + 2) + app1_body
    return jpeg_bytes[:2] + seg + jpeg_bytes[2:]


def _iter_segments(b: bytes):
    """Yield (marker, start, end) over JPEG table segments until SOS."""
    if len(b) < 4 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"exif: bad marker alignment at {i}")
        marker = b[i + 1]
        if marker == 0xDA:  # SOS: entropy-coded data follows
            yield (marker, i, len(b))
            return
        if marker in (0xD8, 0xD9):
            i += 2
            continue
        seg_len = struct.unpack(">H", b[i + 2 : i + 4])[0]
        end = i + 2 + seg_len
        if seg_len < 2 or end > len(b):
            raise ValueError("exif: segment overruns file")
        yield (marker, i, end)
        i = end


def strip_exif(jpeg_bytes: bytes) -> bytes:
    """Drop every APP1..APP15 segment (EXIF, XMP, ICC, vendor notes —
    the metadata/PII carriers) while keeping APP0/JFIF and every
    pixel-bearing byte; the result decodes identically."""
    out = bytearray(b"\xff\xd8")
    for marker, start, end in _iter_segments(bytes(jpeg_bytes)):
        if 0xE1 <= marker <= 0xEF:
            continue
        out += jpeg_bytes[start:end]
    return bytes(out)


def _read_ifd(b: bytes, e: str, off: int, depth: int = 0) -> dict:
    if depth > 2:
        raise ValueError("exif: IFD nesting too deep")
    if off + 2 > len(b):
        raise ValueError("exif: IFD offset out of range")
    (count,) = struct.unpack_from(e + "H", b, off)
    if count > 256:
        raise ValueError("exif: implausible IFD entry count")
    tags = {}
    for k in range(count):
        base = off + 2 + 12 * k
        if base + 12 > len(b):
            raise ValueError("exif: IFD entry out of range")
        tag, typ, cnt = struct.unpack_from(e + "HHI", b, base)
        if typ not in _TYPE_SIZES or cnt > 1 << 20:
            continue  # unknown type: skip, per spec readers must tolerate
        size = _TYPE_SIZES[typ] * cnt
        if size <= 4:
            voff = base + 8
        else:
            (voff,) = struct.unpack_from(e + "I", b, base + 8)
        if voff + size > len(b):
            raise ValueError("exif: value out of range")
        if typ == 2:  # ASCII
            val = b[voff : voff + cnt].split(b"\x00")[0].decode(
                "ascii", errors="replace"
            )
        elif typ == 3:
            val = list(struct.unpack_from(e + f"{cnt}H", b, voff))
        elif typ == 4:
            val = list(struct.unpack_from(e + f"{cnt}I", b, voff))
        elif typ == 5:
            val = [
                struct.unpack_from(e + "II", b, voff + 8 * j) for j in range(cnt)
            ]
        else:
            val = b[voff : voff + size]
        tags[tag] = val
    return tags


def parse_exif(jpeg_bytes: bytes) -> dict:
    """Extract the report fields from a JPEG's EXIF APP1 (or a bare
    ``Exif\\x00\\x00``/TIFF payload): ``orientation``, ``datetime``,
    ``make``, ``gps_lat_micro``, ``gps_lon_micro``, ``has_exif``.
    Images without EXIF return ``has_exif=False`` and NULL fields;
    STRUCTURALLY BROKEN EXIF raises ValueError (callers null-route)."""
    b = bytes(jpeg_bytes)
    body = None
    if b[:2] == b"\xff\xd8":
        for marker, start, end in _iter_segments(b):
            if marker == 0xE1 and b[start + 4 : start + 10] == b"Exif\x00\x00":
                body = b[start + 10 : end]
                break
    elif b[:6] == b"Exif\x00\x00":
        body = b[6:]
    elif b[:2] in (b"II", b"MM"):
        body = b
    out = {
        "has_exif": body is not None,
        "orientation": None,
        "datetime": None,
        "make": None,
        "gps_lat_micro": None,
        "gps_lon_micro": None,
    }
    if body is None:
        return out
    if len(body) < 8 or body[:2] not in (b"II", b"MM"):
        raise ValueError("exif: bad TIFF header")
    e = "<" if body[:2] == b"II" else ">"
    magic, ifd0 = struct.unpack_from(e + "HI", body, 2)
    if magic != 42:
        raise ValueError("exif: bad TIFF magic")
    tags = _read_ifd(body, e, ifd0)
    if _TAG_ORIENTATION in tags:
        out["orientation"] = int(tags[_TAG_ORIENTATION][0])
    if _TAG_DATETIME in tags:
        out["datetime"] = tags[_TAG_DATETIME]
    if _TAG_MAKE in tags:
        out["make"] = tags[_TAG_MAKE]
    if _TAG_GPS_IFD in tags:
        gps = _read_ifd(body, e, int(tags[_TAG_GPS_IFD][0]), depth=1)
        if _GPS_LAT in gps and _GPS_LAT_REF in gps:
            micro = _dms_to_micro(gps[_GPS_LAT])
            out["gps_lat_micro"] = -micro if gps[_GPS_LAT_REF] == "S" else micro
        if _GPS_LON in gps and _GPS_LON_REF in gps:
            micro = _dms_to_micro(gps[_GPS_LON])
            out["gps_lon_micro"] = -micro if gps[_GPS_LON_REF] == "W" else micro
    return out


EXIF_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("has_exif", BooleanType()),
        StructField("orientation", IntegerType()),
        StructField("capture_time", StringType()),
        StructField("make", StringType()),
        StructField("gps_lat_micro", LongType()),
        StructField("gps_lon_micro", LongType()),
        StructField("exif_error", StringType()),
    ]
)

STRIP_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("bytes_removed", LongType()),
        StructField("exif_error", StringType()),
    ]
)


def exif_features(df_with_payload: DataFrame) -> DataFrame:
    """Per-image EXIF report over a (doc_id, payload) frame — Arrow
    ``mapInPandas``, per-row ValueError null-routing (the
    decode_image/audio_features convention)."""
    import pandas as pd

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = {f.name: [] for f in EXIF_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(doc_id)
                try:
                    r = parse_exif(bytes(payload))
                    rows["has_exif"].append(r["has_exif"])
                    rows["orientation"].append(r["orientation"])
                    rows["capture_time"].append(r["datetime"])
                    rows["make"].append(r["make"])
                    rows["gps_lat_micro"].append(r["gps_lat_micro"])
                    rows["gps_lon_micro"].append(r["gps_lon_micro"])
                    rows["exif_error"].append(None)
                except ValueError as exc:
                    for k in (
                        "has_exif", "orientation", "capture_time", "make",
                        "gps_lat_micro", "gps_lon_micro",
                    ):
                        rows[k].append(None)
                    rows["exif_error"].append(str(exc))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "has_exif": pd.Series(rows["has_exif"], dtype="boolean"),
                    "orientation": pd.Series(rows["orientation"], dtype="Int32"),
                    "capture_time": rows["capture_time"],
                    "make": rows["make"],
                    "gps_lat_micro": pd.Series(rows["gps_lat_micro"], dtype="Int64"),
                    "gps_lon_micro": pd.Series(rows["gps_lon_micro"], dtype="Int64"),
                    "exif_error": rows["exif_error"],
                }
            )

    return df_with_payload.mapInPandas(kernel, EXIF_SCHEMA)


def strip_exif_payloads(df_with_payload: DataFrame) -> DataFrame:
    """Privacy scrub over a (doc_id, payload) frame: APP1..APP15
    removed, pixels untouched; returns the cleaned payload and how many
    bytes of metadata left. Broken JPEGs null-route."""
    import pandas as pd

    def kernel(batches: Iterator) -> Iterator:
        for pdf in batches:
            rows = {f.name: [] for f in STRIP_SCHEMA.fields}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rows["doc_id"].append(doc_id)
                try:
                    raw = bytes(payload)
                    cleaned = strip_exif(raw)
                    rows["payload"].append(cleaned)
                    rows["bytes_removed"].append(len(raw) - len(cleaned))
                    rows["exif_error"].append(None)
                except ValueError as exc:
                    rows["payload"].append(None)
                    rows["bytes_removed"].append(None)
                    rows["exif_error"].append(str(exc))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                    "payload": rows["payload"],
                    "bytes_removed": pd.Series(rows["bytes_removed"], dtype="Int64"),
                    "exif_error": rows["exif_error"],
                }
            )

    return df_with_payload.mapInPandas(kernel, STRIP_SCHEMA)
