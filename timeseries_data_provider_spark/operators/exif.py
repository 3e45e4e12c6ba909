"""EXIF metadata from JPEG APP1 segments — stdlib-only.

EXIF is how a crawled photo corpus carries camera, orientation,
timestamp, and GPS provenance — the fields an image pipeline routes,
dedups, and privacy-filters on (GPS stripping is a standard
pre-release step). Reference parity note: no reference surface
(index.js has no media path); [EXT] scope per SURVEY §2.

Public-knowledge basis: the EXIF 2.3 specification (JEITA CP-3451,
public) — an APP1 marker segment whose body is ``Exif\\0\\0`` followed
by a complete TIFF structure: IFD0 (camera make/model/orientation/
datetime) with pointer tags to the Exif sub-IFD (dimensions, exposure)
and the GPS IFD (rational degree/minute/second triples). The IFD walk
is SHARED with operators/tiff.py (``tiff.read_ifd`` — EXIF offsets are
relative to the same TIFF header, so slicing the buffer at the header
makes one walker serve both formats).

Scale shape: per-row independent Arrow pass over the first ~64 KB of
each JPEG (APP segments precede image data by construction — the walk
stops at SOS without touching entropy-coded bytes). GPS coordinates
are emitted as exact micro-degree integers (floor over the rational
arithmetic done in integers) so downstream joins/filters never see
float drift.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame

from . import tiff as _tiff

__all__ = [
    "exif_from_jpeg",
    "parse_exif_tiff",
    "build_exif_app1",
    "insert_app1",
    "exif_features",
]

# IFD0 tags
_MAKE = 271
_MODEL = 272
_ORIENTATION = 274
_SOFTWARE = 305
_DATETIME = 306
_EXIF_IFD = 34665
_GPS_IFD = 34853
# Exif sub-IFD tags
_EXPOSURE_TIME = 33434
_ISO = 34855
_DATETIME_ORIGINAL = 36867
_PIXEL_X = 40962
_PIXEL_Y = 40963
# GPS IFD tags
_GPS_LAT_REF = 1
_GPS_LAT = 2
_GPS_LON_REF = 3
_GPS_LON = 4


def _ascii(vals) -> str | None:
    if vals is None:
        return None
    return bytes(v & 0xFF for v in vals).decode(
        "ascii", "replace"
    ).rstrip("\x00")


def _scalar(vals) -> int | None:
    if not vals or not isinstance(vals[0], int):
        return None
    return vals[0]


def _gps_microdeg(triple, ref) -> int | None:
    """(deg, min, sec) rationals + 'N/S/E/W' ref -> exact signed
    micro-degrees: floor(1e6 * (d + m/60 + s/3600)) of the MAGNITUDE
    in integer arithmetic over a common denominator, then the
    hemisphere sign (i.e. truncation toward zero for S/W — stated so
    the contract is unambiguous at micro-degree boundaries)."""
    if not triple or len(triple) != 3 or ref not in ("N", "S", "E", "W"):
        return None
    try:
        (dn, dd), (mn, md), (sn, sd) = triple
    except (TypeError, ValueError):
        return None
    if dd == 0 or md == 0 or sd == 0:
        return None
    # value = dn/dd + mn/(60*md) + sn/(3600*sd); scale by 1e6 exactly
    num = (
        dn * md * sd * 3600 + mn * dd * sd * 60 + sn * dd * md
    ) * 1_000_000
    den = dd * md * sd * 3600
    micro = num // den
    return -micro if ref in ("S", "W") else micro


def parse_exif_tiff(buf: bytes) -> dict:
    """Parse the TIFF structure of an EXIF block (``buf`` starts at
    the TIFF header, i.e. after ``Exif\\0\\0``). Returns the routing
    fields; absent tags are None."""
    if len(buf) < 8:
        raise ValueError("exif: truncated TIFF header")
    if buf[:4] == b"II*\x00":
        bo = "<"
    elif buf[:4] == b"MM\x00*":
        bo = ">"
    else:
        raise ValueError("exif: bad TIFF magic")
    import struct

    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    ifd0 = _tiff.read_ifd(buf, bo, ifd_off)
    out = {
        "make": _ascii(ifd0.get(_MAKE)),
        "model": _ascii(ifd0.get(_MODEL)),
        "orientation": _scalar(ifd0.get(_ORIENTATION)),
        "software": _ascii(ifd0.get(_SOFTWARE)),
        "datetime": _ascii(ifd0.get(_DATETIME)),
        "datetime_original": None,
        "exif_width": None,
        "exif_height": None,
        "iso": None,
        "exposure_num": None,
        "exposure_den": None,
        "gps_lat_micro": None,
        "gps_lon_micro": None,
    }
    exif_ptr = _scalar(ifd0.get(_EXIF_IFD))
    if exif_ptr is not None:
        sub = _tiff.read_ifd(buf, bo, exif_ptr)
        out["datetime_original"] = _ascii(sub.get(_DATETIME_ORIGINAL))
        out["exif_width"] = _scalar(sub.get(_PIXEL_X))
        out["exif_height"] = _scalar(sub.get(_PIXEL_Y))
        out["iso"] = _scalar(sub.get(_ISO))
        exp = sub.get(_EXPOSURE_TIME)
        if exp and isinstance(exp[0], tuple):
            out["exposure_num"], out["exposure_den"] = exp[0]
    gps_ptr = _scalar(ifd0.get(_GPS_IFD))
    if gps_ptr is not None:
        gps = _tiff.read_ifd(buf, bo, gps_ptr)
        out["gps_lat_micro"] = _gps_microdeg(
            gps.get(_GPS_LAT), _ascii(gps.get(_GPS_LAT_REF))
        )
        out["gps_lon_micro"] = _gps_microdeg(
            gps.get(_GPS_LON), _ascii(gps.get(_GPS_LON_REF))
        )
    return out


def exif_from_jpeg(payload: bytes) -> dict | None:
    """Walk JPEG marker segments up to SOS; parse the first APP1
    whose body starts with ``Exif\\0\\0``. Returns None when the JPEG
    carries no EXIF (the common crawled case) — malformed marker
    structure raises the named error instead."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("exif: missing SOI marker")
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("exif: bad marker alignment")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # standalone
            pos += 2
            continue
        if marker == 0xDA:  # SOS: entropy-coded data follows
            return None
        seglen = int.from_bytes(payload[pos + 2 : pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > n:
            raise ValueError("exif: truncated marker segment")
        if marker == 0xE1:
            body = payload[pos + 4 : pos + 2 + seglen]
            if body[:6] == b"Exif\x00\x00":
                return parse_exif_tiff(body[6:])
        pos += 2 + seglen
    return None


# -- fixture writer ----------------------------------------------------


def _ifd_bytes(entries: list[tuple[int, int, int, bytes]], data_off: int):
    """Serialize little-endian IFD entries [(tag, type, count,
    value_bytes)]; values wider than 4 bytes go to a data area at
    ``data_off``. Returns (ifd_bytes, data_bytes)."""
    import struct

    ifd = struct.pack("<H", len(entries))
    data = b""
    for tag, typ, count, vb in sorted(entries):
        if len(vb) <= 4:
            field = vb + b"\x00" * (4 - len(vb))
        else:
            field = struct.pack("<I", data_off + len(data))
            data += vb
        ifd += struct.pack("<HHI", tag, typ, count) + field
    ifd += struct.pack("<I", 0)  # next-IFD pointer
    return ifd, data


def build_exif_app1(
    make: str = "TestCam",
    model: str = "M1",
    orientation: int = 1,
    datetime: str = "2026:01:01 00:00:00",
    width: int | None = None,
    height: int | None = None,
    gps: tuple | None = None,
) -> bytes:
    """Serialize a little-endian EXIF APP1 segment (marker + length +
    body). ``gps`` is ((lat_ref, d, m, s_num, s_den), (lon_ref, ...))
    with integer degree/minute and rational seconds."""
    import struct

    def s(v: str) -> bytes:
        return v.encode("ascii") + b"\x00"

    def rat3(d: int, m: int, s_num: int, s_den: int) -> bytes:
        return struct.pack("<6I", d, 1, m, 1, s_num, s_den)

    # layout: header(8) IFD0 [exif sub-IFD] [gps IFD] data area —
    # compute sizes iteratively by building with placeholder offsets
    # twice (sizes are offset-independent)
    def build(exif_off: int, gps_off: int, data_off: int):
        ifd0_entries = [
            (_MAKE, 2, len(s(make)), s(make)),
            (_MODEL, 2, len(s(model)), s(model)),
            (_ORIENTATION, 3, 1, struct.pack("<H", orientation)),
            (_DATETIME, 2, len(s(datetime)), s(datetime)),
        ]
        sub_needed = width is not None or height is not None
        if sub_needed:
            ifd0_entries.append(
                (_EXIF_IFD, 4, 1, struct.pack("<I", exif_off))
            )
        if gps is not None:
            ifd0_entries.append(
                (_GPS_IFD, 4, 1, struct.pack("<I", gps_off))
            )
        sub_entries = []
        if sub_needed:
            sub_entries = [
                (_PIXEL_X, 4, 1, struct.pack("<I", width or 0)),
                (_PIXEL_Y, 4, 1, struct.pack("<I", height or 0)),
            ]
        gps_entries = []
        if gps is not None:
            (lat_ref, ld, lm, lsn, lsd), (lon_ref, od, om, osn, osd) = gps
            gps_entries = [
                (_GPS_LAT_REF, 2, 2, s(lat_ref)),
                (_GPS_LAT, 5, 3, rat3(ld, lm, lsn, lsd)),
                (_GPS_LON_REF, 2, 2, s(lon_ref)),
                (_GPS_LON, 5, 3, rat3(od, om, osn, osd)),
            ]
        return ifd0_entries, sub_entries, gps_entries

    # pass 1: sizes with dummy offsets
    i0, se, ge = build(0, 0, 0)
    ifd0_size = 2 + 12 * len(i0) + 4
    sub_size = (2 + 12 * len(se) + 4) if se else 0
    gps_size = (2 + 12 * len(ge) + 4) if ge else 0
    exif_off = 8 + ifd0_size
    gps_off = exif_off + sub_size
    data_off = gps_off + gps_size
    # pass 2: real offsets; data areas are consumed in IFD order
    i0, se, ge = build(exif_off, gps_off, data_off)
    ifd0, d0 = _ifd_bytes(i0, data_off)
    body = ifd0
    doff = data_off + len(d0)
    data = d0
    if se:
        sub, d1 = _ifd_bytes(se, doff)
        body += sub
        data += d1
        doff += len(d1)
    if ge:
        gpsb, d2 = _ifd_bytes(ge, doff)
        body += gpsb
        data += d2
    tiff_block = b"II*\x00" + struct.pack("<I", 8) + body + data
    payload = b"Exif\x00\x00" + tiff_block
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_app1(jpeg: bytes, app1: bytes) -> bytes:
    """Splice an APP1 segment immediately after SOI."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("exif: not a JPEG")
    return jpeg[:2] + app1 + jpeg[2:]


def exif_features(
    df: DataFrame, blob_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched EXIF extraction: one row per input row with the
    routing fields (rows without EXIF come back all-NULL but present,
    so corpus-level EXIF coverage is a COUNT away)."""

    cols = [
        "make",
        "model",
        "orientation",
        "datetime",
        "exif_width",
        "exif_height",
        "gps_lat_micro",
        "gps_lon_micro",
    ]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {id_col: []}
            for c in cols:
                out[c] = []
            for rid, blob in zip(pdf[id_col], pdf[blob_col]):
                meta = exif_from_jpeg(bytes(blob))
                out[id_col].append(int(rid))
                for c in cols:
                    out[c].append(None if meta is None else meta[c])
            yield pd.DataFrame(out)

    schema = (
        f"{id_col} long, make string, model string, orientation long, "
        "datetime string, exif_width long, exif_height long, "
        "gps_lat_micro long, gps_lon_micro long"
    )
    return df.select(id_col, blob_col).mapInPandas(run, schema)
