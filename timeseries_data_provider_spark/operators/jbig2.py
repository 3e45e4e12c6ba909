"""JBIG2 generic-region decoding (ITU-T T.88) — the modern bilevel
scan codec, CCITT's successor and the default for bilevel images in
recent scanned PDFs (the ``JBIG2Decode`` filter).

Scope (honest, per the named-gap ladder): the GENERIC REGION path —
the MQ arithmetic coder (T.88 Annex E software conventions, the
same coder JPEG 2000 uses), generic-region templates 0-3 at their
NOMINAL adaptive-pixel positions with optional typical-prediction
(TPGDON), the MMR alternative (bit 0 of the region flags — T.6 MMR,
delegated to the in-repo, JDK-cross-validated ``operators/ccitt``
G4 codec), and the embedded segment stream PDF carries (segment
headers, page info, immediate generic regions, page composition by
OR/REPLACE). Symbol dictionaries, text/halftone/refinement
regions, non-nominal AT pixels, and unknown-length segments raise
named NotImplementedErrors — those files route to a codec library,
never to silent garbage.

Validation posture: the MMR path inherits the CCITT codec's
independent JDK cross-validation; the MQ path is validated by
encoder/decoder round-trip plus hand-checked spec mechanics and is
stated as self-validated (no independent JBIG2 implementation
exists in this container — same honest posture as the OLE2 tier).

Convention: decoded bitmaps are semantic bits (1 = black), the
T.88 convention; the PDF layer converts to display gray
(white = 255) exactly like the CCITT path.

Public-knowledge basis: ITU-T T.88 (public), ISO/IEC 14492.
Reference parity: index.js has no media surface; [EXT] SURVEY §2
(VERDICT r11 next-round item 8).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "decode_jbig2_embedded",
    "encode_jbig2_generic",
    "MQDecoder",
    "MQEncoder",
]

# T.88 Table E.1 — the MQ-coder probability state machine:
# (Qe, NMPS, NLPS, SWITCH)
_QE = [
    (0x5601, 1, 1, 1), (0x3401, 2, 6, 0), (0x1801, 3, 9, 0),
    (0x0AC1, 4, 12, 0), (0x0521, 5, 29, 0), (0x0221, 38, 33, 0),
    (0x5601, 7, 6, 1), (0x5401, 8, 14, 0), (0x4801, 9, 14, 0),
    (0x3801, 10, 14, 0), (0x3001, 11, 17, 0), (0x2401, 12, 18, 0),
    (0x1C01, 13, 20, 0), (0x1601, 29, 21, 0), (0x5601, 15, 14, 1),
    (0x5401, 16, 14, 0), (0x5101, 17, 15, 0), (0x4801, 18, 16, 0),
    (0x3801, 19, 17, 0), (0x3401, 20, 18, 0), (0x3001, 21, 19, 0),
    (0x2801, 22, 19, 0), (0x2401, 23, 20, 0), (0x2201, 24, 21, 0),
    (0x1C01, 25, 22, 0), (0x1801, 26, 23, 0), (0x1601, 27, 24, 0),
    (0x1401, 28, 25, 0), (0x1201, 29, 26, 0), (0x1101, 30, 27, 0),
    (0x0AC1, 31, 28, 0), (0x09C1, 32, 29, 0), (0x08A1, 33, 30, 0),
    (0x0521, 34, 31, 0), (0x0441, 35, 32, 0), (0x02A1, 36, 33, 0),
    (0x0221, 37, 34, 0), (0x0141, 38, 35, 0), (0x0111, 39, 36, 0),
    (0x0085, 40, 37, 0), (0x0049, 41, 38, 0), (0x0025, 42, 39, 0),
    (0x0015, 43, 40, 0), (0x0009, 44, 41, 0), (0x0005, 45, 42, 0),
    (0x0001, 45, 43, 0), (0x5601, 46, 46, 0),
]


class MQDecoder:
    """T.88 Annex E arithmetic decoder (software conventions:
    INITDEC / DECODE / BYTEIN / RENORMD). Context state lives in the
    caller-owned (index, mps) arrays so one decoder serves many
    context sets."""

    def __init__(self, data: bytes):
        self.data = data
        self.bp = 0
        b0 = data[0] if data else 0xFF
        self.c = b0 << 16
        self._bytein()
        self.c = (self.c << 7) & 0xFFFFFFFF
        self.ct -= 7
        self.a = 0x8000

    def _bytein(self) -> None:
        data, bp = self.data, self.bp
        b = data[bp] if bp < len(data) else 0xFF
        if b == 0xFF:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            if b1 > 0x8F:
                # marker found / data exhausted: feed 1-bits forever
                self.c += 0xFF00
                self.ct = 8
            else:
                self.bp = bp + 1
                self.c += b1 << 9
                self.ct = 7
        else:
            b1 = data[bp + 1] if bp + 1 < len(data) else 0xFF
            self.bp = bp + 1
            self.c += b1 << 8
            self.ct = 8

    def decode(self, icx: np.ndarray, mps: np.ndarray, cx: int) -> int:
        i = icx[cx]
        qe, nmps, nlps, switch = _QE[i]
        self.a -= qe
        if ((self.c >> 16) & 0xFFFF) < qe:
            # LPS-path exchange (E.3.2)
            if self.a < qe:
                d = mps[cx]
                icx[cx] = nmps
            else:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            self.a = qe
        else:
            self.c = (self.c - (qe << 16)) & 0xFFFFFFFF
            if self.a & 0x8000:
                return int(mps[cx])
            if self.a < qe:
                d = 1 - mps[cx]
                if switch:
                    mps[cx] = 1 - mps[cx]
                icx[cx] = nlps
            else:
                d = mps[cx]
                icx[cx] = nmps
        # RENORMD
        while True:
            if self.ct == 0:
                self._bytein()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break
        return int(d)


class MQEncoder:
    """T.88 Annex E arithmetic encoder (INITENC / CODEMPS / CODELPS
    / BYTEOUT / FLUSH) — the fixture-side mirror of MQDecoder. The
    spec's BP = BPST-1 convention is modeled with a leading dummy
    byte that absorbs a first-byte carry; it is dropped from the
    output when untouched (zero)."""

    def __init__(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0])  # the BPST-1 spacer

    def _byteout(self) -> None:
        b = self.out[-1]
        if b == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] = b + 1  # carry (b < 0xFF here)
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def encode(self, icx: np.ndarray, mps: np.ndarray, cx: int,
               bit: int) -> None:
        i = icx[cx]
        qe, nmps, nlps, switch = _QE[i]
        if bit == mps[cx]:  # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                self.c += qe
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            icx[cx] = nmps
        else:  # CODELPS
            self.a -= qe
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                mps[cx] = 1 - mps[cx]
            icx[cx] = nlps
        while True:  # RENORME
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def flush(self) -> bytes:
        # SETBITS + two byteouts (E.3.8): fill the low 16 bits of C
        # with 1s, backing off 0x8000 if that overshoots the interval
        top = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= top:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        out = self.out
        if out and out[0] == 0:
            out = out[1:]  # untouched spacer
        # terminating marker keeps the decoder's BYTEIN in the
        # feed-ones regime past the data
        return bytes(out) + b"\xff\xac"


# generic-region templates at NOMINAL AT positions (T.88 6.2.5.3,
# figures 4/5/6/7): (dx, dy) in MSB-first context order = raster
# order of the figure. Non-nominal AT raises (named scope).
_TEMPLATES = {
    0: [(-2, -2), (-1, -2), (0, -2), (1, -2), (2, -2),
        (-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (3, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
    1: [(-1, -2), (0, -2), (1, -2), (2, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1), (3, -1),
        (-3, 0), (-2, 0), (-1, 0)],
    2: [(-1, -2), (0, -2), (1, -2),
        (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-2, 0), (-1, 0)],
    3: [(-3, -1), (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
        (-4, 0), (-3, 0), (-2, 0), (-1, 0)],
}
_NOMINAL_AT = {
    0: [(3, -1), (-3, -1), (2, -2), (-2, -2)],
    1: [(3, -1)],
    2: [(2, -1)],
    3: [(2, -1)],
}
# TPGDON pseudo-pixel contexts (T.88 6.2.5.7)
_TPGD_CTX = {0: 0x9B25, 1: 0x0795, 2: 0x00E5, 3: 0x0195}

_MAX_PIXELS = 64 * 1024 * 1024


def _run_generic(w: int, h: int, template: int, tpgdon: bool,
                 coder, bitmap=None):
    """Shared encode/decode walk of a generic region: identical
    context formation on both sides. ``coder(cx, y, x) -> bit``
    decodes-or-encodes one pixel; with ``bitmap`` given (encoding)
    the walk feeds its bits, else it fills a fresh bitmap."""
    tmpl = _TEMPLATES[template]
    bm = np.zeros((h, w), np.uint8) if bitmap is None else bitmap
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= coder.sltp(y, ltp)
            if ltp:
                if bitmap is None and y > 0:
                    bm[y] = bm[y - 1]
                continue
        row = bm[y]
        for x in range(w):
            cx = 0
            for dx, dy in tmpl:
                yy, xx = y + dy, x + dx
                cx <<= 1
                # template pixels are strictly above or to the left,
                # so in raster order they are always already decoded;
                # out-of-bounds reads are 0 per the spec
                if 0 <= yy < h and 0 <= xx < w:
                    cx |= int(bm[yy, xx])
            row[x] = coder.pixel(cx, y, x)
    return bm


class _DecSide:
    def __init__(self, data: bytes, template: int):
        self.mq = MQDecoder(data)
        self.icx = np.zeros(1 << 16, np.uint8)
        self.mps = np.zeros(1 << 16, np.uint8)
        self.template = template

    def sltp(self, y: int, ltp: int) -> int:
        return self.mq.decode(
            self.icx, self.mps, _TPGD_CTX[self.template]
        )

    def pixel(self, cx: int, y: int, x: int) -> int:
        return self.mq.decode(self.icx, self.mps, cx)


class _EncSide:
    def __init__(self, bitmap: np.ndarray, template: int,
                 tpgdon: bool):
        self.mq = MQEncoder()
        self.icx = np.zeros(1 << 16, np.uint8)
        self.mps = np.zeros(1 << 16, np.uint8)
        self.template = template
        self.bitmap = bitmap
        self.tpgdon = tpgdon
        self._ltp = 0

    def sltp(self, y: int, ltp: int) -> int:
        bm = self.bitmap
        typical = int(
            y > 0 and bool((bm[y] == bm[y - 1]).all())
            or (y == 0 and not bm[0].any())
        )
        want_ltp = typical
        bit = want_ltp ^ ltp
        self.mq.encode(
            self.icx, self.mps, _TPGD_CTX[self.template], bit
        )
        return bit

    def pixel(self, cx: int, y: int, x: int) -> int:
        bit = int(self.bitmap[y, x])
        self.mq.encode(self.icx, self.mps, cx, bit)
        return bit


def decode_generic_region(data: bytes, w: int, h: int,
                          template: int = 0,
                          tpgdon: bool = False) -> np.ndarray:
    """Decode one MQ-coded generic region to an (h, w) uint8 bitmap
    (1 = black)."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"jbig2: unreasonable region {w}x{h}")
    if template not in _TEMPLATES:
        raise ValueError(f"jbig2: generic template {template}")
    side = _DecSide(data, template)
    bm = _run_generic(w, h, template, tpgdon, side)
    # TPGDON row copies happen inside _run_generic only for decode
    return bm


def encode_generic_region(bitmap: np.ndarray, template: int = 0,
                          tpgdon: bool = False) -> bytes:
    """Fixture-side MQ encoding of a bitmap (1 = black) as a generic
    region body."""
    bm = np.asarray(bitmap, np.uint8)
    h, w = bm.shape
    side = _EncSide(bm, template, tpgdon)
    _run_generic(w, h, template, tpgdon, side, bitmap=bm)
    return side.mq.flush()


# ---------------------------------------------------------------------------
# embedded segment stream (T.88 §7; the form PDF's JBIG2Decode carries)

_GENERIC_REGION_TYPES = (36, 38, 39)


def _parse_segment_header(data: bytes, pos: int):
    if pos + 11 > len(data):
        raise ValueError("jbig2: truncated segment header")
    (num,) = struct.unpack_from(">I", data, pos)
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page4 = bool(flags & 0x40)
    pos += 5
    rts = data[pos]
    if (rts >> 5) == 7:
        (count,) = struct.unpack_from(">I", data, pos)
        count &= 0x1FFFFFFF
        pos += 4 + (count + 8) // 8  # long form + retain bits
    else:
        count = rts >> 5
        pos += 1
    if count > 64:
        raise ValueError("jbig2: implausible referred-segment count")
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    refs = []
    for _ in range(count):
        if pos + ref_size > len(data):
            raise ValueError("jbig2: truncated referred segments")
        refs.append(
            int.from_bytes(data[pos : pos + ref_size], "big")
        )
        pos += ref_size
    if page4:
        if pos + 4 > len(data):
            raise ValueError("jbig2: truncated page association")
        (page,) = struct.unpack_from(">I", data, pos)
        pos += 4
    else:
        if pos >= len(data):
            raise ValueError("jbig2: truncated page association")
        page = data[pos]
        pos += 1
    if pos + 4 > len(data):
        raise ValueError("jbig2: truncated data length")
    (dlen,) = struct.unpack_from(">I", data, pos)
    pos += 4
    if dlen == 0xFFFFFFFF:
        raise NotImplementedError(
            "jbig2: unknown-length segment (MMR row-count form)"
        )
    if pos + dlen > len(data):
        raise ValueError("jbig2: segment data exceeds stream")
    return {
        "num": num,
        "type": seg_type,
        "refs": refs,
        "page": page,
        "data": data[pos : pos + dlen],
        "end": pos + dlen,
    }


def _decode_region_segment(seg_data: bytes) -> tuple:
    """One generic-region segment body -> (x, y, combop, bitmap)."""
    if len(seg_data) < 18:
        raise ValueError("jbig2: truncated region segment")
    w, h, x, y = struct.unpack_from(">IIII", seg_data, 0)
    combop = seg_data[16] & 0x07
    gflags = seg_data[17]
    mmr = gflags & 1
    template = (gflags >> 1) & 3
    tpgdon = bool(gflags & 8)
    pos = 18
    if mmr:
        if tpgdon:
            raise ValueError("jbig2: MMR with TPGDON is malformed")
        from timeseries_data_provider_spark.operators import (
            ccitt as _ccitt,
        )

        if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
            raise ValueError(f"jbig2: unreasonable region {w}x{h}")
        bm = _ccitt.decode_g4(seg_data[pos:], w, h)
    else:
        n_at = 4 if template == 0 else 1
        at = []
        for k in range(n_at):
            if pos + 2 > len(seg_data):
                raise ValueError("jbig2: truncated AT pixels")
            ax = struct.unpack_from("b", seg_data, pos)[0]
            ay = struct.unpack_from("b", seg_data, pos + 1)[0]
            at.append((ax, ay))
            pos += 2
        if at != _NOMINAL_AT[template]:
            raise NotImplementedError(
                f"jbig2: non-nominal AT pixels {at} (nominal-only "
                "scope; real encoders default to nominal)"
            )
        bm = decode_generic_region(
            seg_data[pos:], w, h, template, tpgdon
        )
    return x, y, combop, bm


def decode_jbig2_embedded(
    data: bytes, globals_data: bytes | None = None
) -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (segment headers, page
    info, immediate generic regions) to the page bitmap (1 = black).
    Symbol/text/halftone/refinement segments raise named errors."""
    page_bm = None
    page_default = 0

    def walk(stream: bytes) -> None:
        nonlocal page_bm, page_default
        pos = 0
        while pos < len(stream):
            seg = _parse_segment_header(stream, pos)
            pos = seg["end"]
            t = seg["type"]
            if t == 48:  # page info
                if len(seg["data"]) < 19:
                    raise ValueError("jbig2: truncated page info")
                pw, ph = struct.unpack_from(">II", seg["data"], 0)
                flags = seg["data"][16]
                page_default = (flags >> 2) & 1
                if ph == 0xFFFFFFFF:
                    raise NotImplementedError(
                        "jbig2: striped page with unknown height"
                    )
                if pw * ph > _MAX_PIXELS:
                    raise ValueError(
                        f"jbig2: unreasonable page {pw}x{ph}"
                    )
                page_bm = np.full(
                    (ph, pw), page_default, np.uint8
                )
            elif t in _GENERIC_REGION_TYPES:
                x, y, combop, bm = _decode_region_segment(seg["data"])
                if page_bm is None:
                    page_bm = bm
                    continue
                h, w = bm.shape
                ph, pw = page_bm.shape
                if y + h > ph or x + w > pw:
                    raise ValueError(
                        "jbig2: region exceeds page bounds"
                    )
                tgt = page_bm[y : y + h, x : x + w]
                if combop == 0:  # OR
                    tgt |= bm
                elif combop == 1:  # AND
                    tgt &= bm
                elif combop == 2:  # XOR
                    tgt ^= bm
                elif combop == 4:  # REPLACE
                    tgt[:] = bm
                else:
                    raise NotImplementedError(
                        f"jbig2: composition operator {combop}"
                    )
            elif t in (49, 50, 51, 62):
                continue  # end-of-page/stripe/file, extension
            elif t in (0, 4, 6, 7, 16, 20, 22, 23, 40, 42, 43):
                raise NotImplementedError(
                    f"jbig2: segment type {t} (symbol/text/halftone/"
                    "refinement — generic-region-only scope)"
                )
            elif t == 53:
                raise NotImplementedError(
                    "jbig2: custom table segment"
                )
            else:
                raise ValueError(f"jbig2: unknown segment type {t}")

    if globals_data:
        walk(globals_data)
    walk(data)
    if page_bm is None:
        raise ValueError("jbig2: no page or region in stream")
    return page_bm


def encode_jbig2_generic(
    bitmap: np.ndarray,
    template: int = 0,
    tpgdon: bool = False,
    mmr: bool = False,
) -> bytes:
    """Fixture writer: one page-info segment plus one immediate
    lossless generic region covering the page — the embedded stream
    a scanned-PDF writer emits."""
    bm = np.asarray(bitmap, np.uint8)
    h, w = bm.shape
    if mmr:
        from timeseries_data_provider_spark.operators import (
            ccitt as _ccitt,
        )

        body = _ccitt.encode_g4(bm)
        gflags = 1
        at = b""
    else:
        body = encode_generic_region(bm, template, tpgdon)
        gflags = (template << 1) | (8 if tpgdon else 0)
        at = b"".join(
            struct.pack("bb", ax, ay)
            for ax, ay in _NOMINAL_AT[template]
        )
    region = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([0])  # external combop OR
        + bytes([gflags])
        + at
        + body
    )

    def seg_header(num: int, typ: int, page: int,
                   payload: bytes) -> bytes:
        return (
            struct.pack(">I", num)
            + bytes([typ])
            + bytes([0])  # zero referred segments
            + bytes([page])
            + struct.pack(">I", len(payload))
            + payload
        )

    page_info = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([0])  # flags: default pixel 0, no overrides
        + struct.pack(">H", 0)
    )
    return seg_header(0, 48, 1, page_info) + seg_header(
        1, 39, 1, region  # immediate lossless generic region
    )
