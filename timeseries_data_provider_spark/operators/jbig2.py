"""JBIG2 generic-region decoding (ITU-T T.88) — the modern bilevel
scan codec, CCITT's successor and the default for bilevel images in
recent scanned PDFs (the ``JBIG2Decode`` filter).

Scope (honest, per the named-gap ladder): the ARITHMETIC paths —
the MQ coder (T.88 Annex E software conventions, the same coder
JPEG 2000 uses), generic-region templates 0-3 at their NOMINAL
adaptive-pixel positions with optional typical-prediction (TPGDON),
the MMR alternative (bit 0 of the region flags — T.6 MMR, delegated
to the in-repo, JDK-cross-validated ``operators/ccitt`` G4 codec),
SYMBOL DICTIONARIES and TEXT REGIONS (§6.4/§6.5 with the Annex A
arithmetic integer decoders — the glyph-clustered form real scanner
encoders in the jbig2enc family emit, r12: all four reference
corners, transposed mode, multi-strip, signed DS offsets, multi-
dictionary symbol concatenation), the HUFFMAN-coded variants of
both (r14 — SDHUFF/SBHUFF, the second scanner-encoder family:
Annex B canonical tables with the standard tables B.1-B.5
transcribed and Kraft-verified, custom table segments (type 53),
runcode-built symbol-ID codes, MMR or uncompressed collective
bitmaps; selecting an untranscribed standard table B.6-B.15 raises
the named error), and the embedded segment stream PDF carries
(segment headers, page info, immediate regions, page composition
by OR/REPLACE, JBIG2Globals), and the REFINEMENT tier (r15 —
generic refinement regions per §6.3 with both GRTEMPLATEs and
TPGRON typical prediction, immediate refinement segments refining
the page under their box, SDREFAGG dictionaries with
REFAGGNINST = 1, and RI = 1 refined text instances). Aggregate
coding (REFAGGNINST > 1), Huffman-coded refinement, intermediate
regions, halftone regions, non-nominal generic AT pixels, and
unknown-length segments raise named NotImplementedErrors — those
files route to a codec library, never to silent garbage.

Validation posture: the MMR path inherits the CCITT codec's
independent JDK cross-validation; the MQ coder is pinned BYTE-EXACT
in both directions to the spec's own Annex H.2 worked test sequence
(r14 — a genuine second writer); the context modelling and Huffman
layers above it are validated by encoder/decoder round-trip plus
hand-checked spec mechanics and stay stated as self-validated (no
independent JBIG2 implementation exists in this container — same
honest posture as the OLE2 tier pre-r13).

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
    "encode_jbig2_text_page",
    "decode_symbol_dict",
    "decode_text_region",
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
        while True:  # RENORME (E.3.3: shift, then BYTEOUT when CT
            # hits 0 — byte snapshots happen at that exact instant,
            # the canonical order the T.88 H.2 test sequence pins;
            # deferring the BYTEOUT lets later C += Qe carries be
            # absorbed in-register, which is arithmetically
            # equivalent but not the spec's byte stream — r14 fix)
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
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
        # E.3.8 tail: append 0xFF only when the last byte isn't
        # already one, then the 0xAC terminator — keeps the
        # decoder's BYTEIN in the feed-ones regime past the data
        # and matches the T.88 H.2 byte stream exactly (r14: the
        # old unconditional b"\xff\xac" doubled a trailing FF)
        tail = b"\xac" if out and out[-1] == 0xFF else b"\xff\xac"
        return bytes(out) + tail


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
# the pure-Python MQ generic path decodes ~160 kpx/s/core (§C jbig2
# row) — a memory-only bound lets a hostile 64M-px region wedge an
# executor for ~7 minutes (r12 review finding). 2^23 px admits a
# full 300-dpi letter page (~8.4M px, ~1 min — the honest envelope)
# and names anything larger as codec-library territory.
_MAX_ARITH_PIXELS = 1 << 23
_MAX_TEXT_INSTANCES = 1 << 20  # a dense page carries ~10^4 glyphs


# Register geometry of the incremental context walk, derived from
# _TEMPLATES: per template the (leftmost, rightmost) dx window each
# row contributes, in the fixed row order (-2, -1, 0). The packed
# context is (r2 << (n1 + n0)) | (r1 << n0) | r0 with each register's
# MSB the window's LEFTMOST pixel — exactly the MSB-first figure
# order _TEMPLATES lists, so the two formulations are bit-identical.
_TMPL_REG = {
    0: ((-2, 2), (-3, 3), (-4, -1)),
    1: ((-1, 2), (-2, 3), (-3, -1)),
    2: ((-1, 1), (-2, 2), (-2, -1)),
    3: (None, (-3, 2), (-4, -1)),
}


def _ctx_grid(bm: np.ndarray, template: int) -> np.ndarray:
    """Vectorized context values for EVERY pixel of a known bitmap
    (encode side: the coder's own output never feeds back into a
    template that only reads up/left pixels, so the whole grid is a
    pure function of the bitmap)."""
    h, w = bm.shape
    cx = np.zeros((h, w), np.int32)
    for dx, dy in _TEMPLATES[template]:
        cx <<= 1
        y0, y1 = max(0, -dy), min(h, h - dy)
        x0, x1 = max(0, -dx), min(w, w - dx)
        if y0 < y1 and x0 < x1:
            cx[y0:y1, x0:x1] |= bm[y0 + dy:y1 + dy, x0 + dx:x1 + dx]
    return cx


def _run_generic(w: int, h: int, template: int, tpgdon: bool,
                 coder, bitmap=None):
    """Shared encode/decode walk of a generic region: identical
    context formation on both sides (the packed register walk below
    reproduces _TEMPLATES' MSB-first context bit-for-bit; the encode
    side's vectorized grid is pinned to the same order). With
    ``bitmap`` given (encoding) the walk feeds its bits through the
    coder's MQ encoder, else it fills a fresh bitmap from the MQ
    decoder."""
    if bitmap is not None:
        _run_generic_encode(w, h, template, tpgdon, coder, bitmap)
        return bitmap
    return _run_generic_decode(w, h, template, tpgdon, coder)


def _run_generic_decode(w: int, h: int, template: int, tpgdon: bool,
                        coder) -> np.ndarray:
    mq, icx, mps = coder.mq, coder.icx, coder.mps
    qe_tab = _QE
    r2rng, r1rng, r0rng = _TMPL_REG[template]
    n0 = r0rng[1] - r0rng[0] + 1
    n1 = r1rng[1] - r1rng[0] + 1
    n2 = 0 if r2rng is None else (r2rng[1] - r2rng[0] + 1)
    s1 = n0
    s2 = n0 + n1
    m0, m1, m2 = (1 << n0) - 1, (1 << n1) - 1, (1 << n2) - 1
    right1 = r1rng[1]
    right2 = r2rng[1] if r2rng is not None else 0
    o1, o2 = right1 + 1, right2 + 1
    pad = 5
    zrow = [0] * (w + pad)
    rows: list[list[int]] = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= coder.sltp(y, ltp)
            if ltp:
                rows.append(rows[-1][:] if y > 0 else zrow[:])
                continue
        row1 = rows[y - 1] if y >= 1 else zrow
        row2 = rows[y - 2] if y >= 2 else zrow
        # registers at x = 0 (left-of-origin pixels read 0)
        r0 = 0
        r1 = 0
        for cc in range(0, right1 + 1):
            r1 |= row1[cc] << (right1 - cc)
        r2 = 0
        if n2:
            for cc in range(0, right2 + 1):
                r2 |= row2[cc] << (right2 - cc)
        row = [0] * (w + pad)
        # inlined MQ DECODE + RENORMD (T.88 E.3.2/E.3.4) over local
        # state — BYTEIN stays the decoder's own method (rare), with
        # the C register synced around each call
        c = mq.c
        a = mq.a
        ct = mq.ct
        for x in range(w):
            cx = (r2 << s2) | (r1 << s1) | r0
            i = icx[cx]
            qe, nmps, nlps, switch = qe_tab[i]
            a -= qe
            if ((c >> 16) & 0xFFFF) < qe:
                # LPS-path exchange (E.3.2)
                if a < qe:
                    d = mps[cx]
                    icx[cx] = nmps
                else:
                    d = 1 - mps[cx]
                    if switch:
                        mps[cx] = 1 - mps[cx]
                    icx[cx] = nlps
                a = qe
                while True:
                    if ct == 0:
                        mq.c = c
                        mq._bytein()
                        c = mq.c
                        ct = mq.ct
                    a = (a << 1) & 0xFFFF
                    c = (c << 1) & 0xFFFFFFFF
                    ct -= 1
                    if a & 0x8000:
                        break
            else:
                c = (c - (qe << 16)) & 0xFFFFFFFF
                if a & 0x8000:
                    d = mps[cx]
                else:
                    if a < qe:
                        d = 1 - mps[cx]
                        if switch:
                            mps[cx] = 1 - mps[cx]
                        icx[cx] = nlps
                    else:
                        d = mps[cx]
                        icx[cx] = nmps
                    while True:
                        if ct == 0:
                            mq.c = c
                            mq._bytein()
                            c = mq.c
                            ct = mq.ct
                        a = (a << 1) & 0xFFFF
                        c = (c << 1) & 0xFFFFFFFF
                        ct -= 1
                        if a & 0x8000:
                            break
            if d:
                row[x] = 1
                r0 = ((r0 << 1) | 1) & m0
            else:
                r0 = (r0 << 1) & m0
            r1 = ((r1 << 1) | row1[x + o1]) & m1
            if n2:
                r2 = ((r2 << 1) | row2[x + o2]) & m2
        mq.c = c
        mq.a = a
        mq.ct = ct
        rows.append(row)
    if not rows:
        return np.zeros((h, w), np.uint8)
    return np.array(
        [r[:w] for r in rows], np.uint8
    ).reshape(h, w)


def _run_generic_encode(w: int, h: int, template: int, tpgdon: bool,
                        coder, bitmap: np.ndarray) -> None:
    mq, icx, mps = coder.mq, coder.icx, coder.mps
    qe_tab = _QE
    cx_grid = _ctx_grid(np.asarray(bitmap, np.uint8), template)
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= coder.sltp(y, ltp)
            if ltp:
                continue
        _mq_encode_seq(
            mq, icx, mps, cx_grid[y].tolist(), bitmap[y].tolist(),
            qe_tab,
        )


class _DecSide:
    def __init__(self, data: bytes, template: int):
        self.mq = MQDecoder(data)
        self.icx = bytearray(1 << 16)
        self.mps = bytearray(1 << 16)
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
        self.icx = bytearray(1 << 16)
        self.mps = bytearray(1 << 16)
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


class _SharedDecSide:
    """Generic-region decode walk over a CALLER-OWNED MQ decoder and
    GB context arrays — the symbol-dictionary form (T.88 6.5.8.1:
    all of a dictionary's symbol bitmaps share one arithmetic
    bitstream and one generic context set with the integer
    contexts)."""

    def __init__(self, mq: MQDecoder, icx, mps):
        self.mq, self.icx, self.mps = mq, icx, mps

    def pixel(self, cx: int, y: int, x: int) -> int:
        return self.mq.decode(self.icx, self.mps, cx)


class _SharedEncSide:
    def __init__(self, mq: MQEncoder, icx, mps, bitmap):
        self.mq, self.icx, self.mps = mq, icx, mps
        self.bitmap = bitmap

    def pixel(self, cx: int, y: int, x: int) -> int:
        bit = int(self.bitmap[y, x])
        self.mq.encode(self.icx, self.mps, cx, bit)
        return bit


# ---------------------------------------------------------------------------
# arithmetic integer decoding (T.88 Annex A) — the IAx procedures the
# symbol-dictionary and text-region decoders drive, plus IAID (A.3)

_OOB = object()  # the out-of-band "no more values" marker (A.2)

# (prefix-length, value-bits, offset) ladder of Table A.1
_INT_CLASSES = [(2, 0), (4, 4), (6, 20), (8, 84), (12, 340), (32, 4436)]


class _IntCtx:
    """One IAx context set: the 512-state PREV tree of A.2 (IAID
    callers size it to 2^(codelen+1), A.3)."""

    def __init__(self, size: int = 512):
        self.icx = bytearray(size)
        self.mps = bytearray(size)


def _int_prev_next(prev: int, bit: int) -> int:
    if prev < 256:
        return (prev << 1) | bit
    return (((prev << 1) | bit) & 511) | 256


def decode_int(mq: MQDecoder, ctx: _IntCtx):
    """A.2 — returns an int, or the _OOB sentinel."""
    prev = 1
    s = mq.decode(ctx.icx, ctx.mps, prev)
    prev = _int_prev_next(prev, s)
    n_class = 0
    while n_class < 5:
        bit = mq.decode(ctx.icx, ctx.mps, prev)
        prev = _int_prev_next(prev, bit)
        if not bit:
            break
        n_class += 1
    nbits, offset = _INT_CLASSES[n_class]
    v = 0
    for _ in range(nbits):
        bit = mq.decode(ctx.icx, ctx.mps, prev)
        prev = _int_prev_next(prev, bit)
        v = (v << 1) | bit
    v += offset
    if s and v == 0:
        return _OOB
    return -v if s else v


def encode_int(mq: MQEncoder, ctx: _IntCtx, value) -> None:
    """Fixture-side inverse of decode_int (value may be _OOB)."""
    if value is _OOB:
        s, v = 1, 0
    else:
        s, v = (1, -value) if value < 0 else (0, value)
    prev = 1
    mq.encode(ctx.icx, ctx.mps, prev, s)
    prev = _int_prev_next(prev, s)
    n_class = 0
    while n_class < 5:
        nbits, offset = _INT_CLASSES[n_class]
        if v < offset + (1 << nbits):
            break
        n_class += 1
    for _ in range(n_class):
        mq.encode(ctx.icx, ctx.mps, prev, 1)
        prev = _int_prev_next(prev, 1)
    if n_class < 5:
        mq.encode(ctx.icx, ctx.mps, prev, 0)
        prev = _int_prev_next(prev, 0)
    nbits, offset = _INT_CLASSES[n_class]
    rem = v - offset
    for i in range(nbits - 1, -1, -1):
        bit = (rem >> i) & 1
        mq.encode(ctx.icx, ctx.mps, prev, bit)
        prev = _int_prev_next(prev, bit)


def decode_iaid(mq: MQDecoder, ctx: _IntCtx, codelen: int) -> int:
    """A.3 — symbol-ID decoding over a 2^(codelen+1) context tree
    (the 512-slot _IntCtx covers codelen <= 8; larger dictionaries
    allocate their own arrays at the call site)."""
    prev = 1
    for _ in range(codelen):
        bit = mq.decode(ctx.icx, ctx.mps, prev)
        prev = (prev << 1) | bit
    return prev - (1 << codelen)


def encode_iaid(mq: MQEncoder, ctx: _IntCtx, codelen: int,
                value: int) -> None:
    prev = 1
    for i in range(codelen - 1, -1, -1):
        bit = (value >> i) & 1
        mq.encode(ctx.icx, ctx.mps, prev, bit)
        prev = (prev << 1) | bit


def decode_generic_region(data: bytes, w: int, h: int,
                          template: int = 0,
                          tpgdon: bool = False) -> np.ndarray:
    """Decode one MQ-coded generic region to an (h, w) uint8 bitmap
    (1 = black)."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"jbig2: unreasonable region {w}x{h}")
    if w * h > _MAX_ARITH_PIXELS:
        raise NotImplementedError(
            f"jbig2: {w}x{h} arithmetic generic region exceeds the "
            "per-region decode-time guard (route oversized scans to "
            "a codec library; MMR regions have no such cap)"
        )
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
# generic refinement region decoding (T.88 6.3, r15 — VERDICT item
# 4): a region decoded AGAINST a reference bitmap at an offset. The
# context mixes pixels of the bitmap being decoded (the "coding"
# template) with pixels of the reference; GRTEMPLATE 0 is 13 bits
# with two adaptive pixels (A1 in the coding part, A2 in the
# reference part, both nominal (-1, -1) — 6.3.5.3 figures), 1 is a
# fixed 10-bit template. Contexts pack coding pixels then reference
# pixels MSB-first in figure order; the TPGRON pseudo-pixel context
# (6.3.5.6) is the value with only the reference-CENTRE pixel set
# (0x0020 / 0x0008 under this packing). Typical prediction: when
# LTP is on, a pixel whose 3x3 reference neighbourhood is uniform
# takes that value without being coded.
#
# Validation posture, stated: no JBIG2 implementation exists in
# this container to cross-decode against, so this cell is the usual
# self-validation tier — encoder and decoder share the single walk
# below, the MQ layer is pinned byte-exact to the T.88 H.2 spec
# sequence elsewhere, and tests/test_jbig2_handbuilt.py pins
# hand-derived (context, decision) sequences laid out from the
# 6.3.5.3 figures through the independent bit path.

_REF_TEMPLATES = {
    # (coding-template pixels, reference-template pixels), (dx, dy)
    0: ([(0, -1), (1, -1), (-1, 0)],
        [(0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
         (-1, 1), (0, 1), (1, 1)]),
    1: ([(-1, -1), (0, -1), (1, -1), (-1, 0)],
        [(0, -1), (-1, 0), (0, 0), (1, 0), (0, 1), (1, 1)]),
}
_NOMINAL_REF_AT = ((-1, -1), (-1, -1))
_TPGR_CTX = {0: 0x0020, 1: 0x0008}


def _shift_into(src: np.ndarray, h: int, w: int, dx_eff: int,
                dy_eff: int) -> np.ndarray:
    """(h, w) grid of src[y + dy_eff, x + dx_eff] with out-of-bounds
    reads 0 — the vectorized form of a bounds-checked neighbor
    fetch."""
    out = np.zeros((h, w), np.int32)
    sh, sw = src.shape
    y0, y1 = max(0, -dy_eff), min(h, sh - dy_eff)
    x0, x1 = max(0, -dx_eff), min(w, sw - dx_eff)
    if y0 < y1 and x0 < x1:
        out[y0:y1, x0:x1] = src[
            y0 + dy_eff:y1 + dy_eff, x0 + dx_eff:x1 + dx_eff
        ]
    return out


def _run_refinement(w: int, h: int, template: int, tpgron: bool,
                    ref: np.ndarray, dx: int, dy: int, coder,
                    at=_NOMINAL_REF_AT, bitmap=None):
    """Shared encode/decode walk of a generic refinement region:
    identical context formation on both sides (the _run_generic
    discipline). ``ref`` is indexed at (y - dy, x - dx);
    out-of-bounds reads are 0.

    The hot path (nominal AT) precomputes the reference-template
    contribution and the 3x3 typicality sums as vectorized grids —
    ``ref`` is fully known up front on both sides — leaving only the
    coding-template pixels (previous row + current-row left, both
    causal) to an incremental per-row walk; non-nominal AT falls back
    to the per-pixel general walk with identical semantics."""
    if tuple(map(tuple, at)) != _NOMINAL_REF_AT:
        return _run_refinement_general(
            w, h, template, tpgron, ref, dx, dy, coder, at=at,
            bitmap=bitmap,
        )
    coding, reference = _REF_TEMPLATES[template]
    if template == 0:
        coding = coding + [tuple(at[0])]
        reference = reference + [tuple(at[1])]
    ref = np.asarray(ref, np.uint8)
    # reference-part context contribution, every pixel, MSB-first in
    # figure order (the low len(reference) bits of the context)
    ref_part = np.zeros((h, w), np.int32)
    for px_, py_ in reference:
        ref_part <<= 1
        ref_part |= _shift_into(ref, h, w, px_ - dx, py_ - dy)
    # 3x3 typicality sums (TPGRON forced-value test, 6.3.5.6)
    if tpgron:
        ssum = np.zeros((h, w), np.int32)
        for q in (-1, 0, 1):
            for p in (-1, 0, 1):
                ssum += _shift_into(ref, h, w, p - dx, q - dy)
    mq, icx, mps = coder.mq, coder.icx, coder.mps
    qe_tab = _QE
    encode = bitmap is not None
    tpgr_cx = _TPGR_CTX[template]
    if encode:
        bm = bitmap
        bmu = np.asarray(bm, np.uint8)
        # coding-part contribution vectorized too (the bitmap is
        # fully known when encoding)
        cod_part = np.zeros((h, w), np.int32)
        for px_, py_ in coding:
            cod_part <<= 1
            cod_part |= _shift_into(bmu, h, w, px_, py_)
        cx_grid = (cod_part << len(reference)) | ref_part
        ltp = 0
        for y in range(h):
            if tpgron:
                # a row may be flagged typical only when every
                # uniformly-neighboured pixel already matches the
                # forced value
                srow = ssum[y]
                brow = bmu[y]
                safe = int(
                    not (
                        ((srow == 0) & (brow != 0)).any()
                        or ((srow == 9) & (brow == 0)).any()
                    )
                )
                bit = safe ^ ltp
                mq.encode(icx, mps, tpgr_cx, bit)
                ltp ^= bit
                if ltp:
                    cxs = cx_grid[y][
                        (srow != 0) & (srow != 9)
                    ].tolist()
                    bits = brow[(srow != 0) & (srow != 9)].tolist()
                else:
                    cxs = cx_grid[y].tolist()
                    bits = brow.tolist()
            else:
                cxs = cx_grid[y].tolist()
                bits = bmu[y].tolist()
            _mq_encode_seq(mq, icx, mps, cxs, bits, qe_tab)
        return bm
    # decode: previous-row coding pixels + the current-row left pixel
    # feed an incremental register; everything else is precomputed
    nref = len(reference)
    rows: list[list[int]] = []
    zrow = [0] * (w + 2)
    ltp = 0
    if template == 0:
        sh_up, sh_upr, sh_left, sh_upl = 12, 11, 10, 9
    else:
        sh_upl, sh_up, sh_upr, sh_left = 9, 8, 7, 6
    for y in range(h):
        if tpgron:
            ltp ^= mq.decode(icx, mps, tpgr_cx)
        prev_p = rows[y - 1] if y >= 1 else zrow
        rrow = ref_part[y].tolist()
        srow = ssum[y].tolist() if (tpgron and ltp) else None
        # prev_p[k] = bm[y-1][k-1] (one-left pad)
        row = [0] * (w + 2)
        c = mq.c
        a = mq.a
        ct = mq.ct
        left = 0
        for x in range(w):
            if srow is not None:
                s = srow[x]
                if s == 0:
                    left = 0
                    continue
                if s == 9:
                    row[x + 1] = 1
                    left = 1
                    continue
            cx = (
                (prev_p[x + 1] << sh_up)
                | (prev_p[x + 2] << sh_upr)
                | (left << sh_left)
                | (prev_p[x] << sh_upl)
                | rrow[x]
            )
            i = icx[cx]
            qe, nmps, nlps, switch = qe_tab[i]
            a -= qe
            if ((c >> 16) & 0xFFFF) < qe:
                if a < qe:
                    d = mps[cx]
                    icx[cx] = nmps
                else:
                    d = 1 - mps[cx]
                    if switch:
                        mps[cx] = 1 - mps[cx]
                    icx[cx] = nlps
                a = qe
                while True:
                    if ct == 0:
                        mq.c = c
                        mq._bytein()
                        c = mq.c
                        ct = mq.ct
                    a = (a << 1) & 0xFFFF
                    c = (c << 1) & 0xFFFFFFFF
                    ct -= 1
                    if a & 0x8000:
                        break
            else:
                c = (c - (qe << 16)) & 0xFFFFFFFF
                if a & 0x8000:
                    d = mps[cx]
                else:
                    if a < qe:
                        d = 1 - mps[cx]
                        if switch:
                            mps[cx] = 1 - mps[cx]
                        icx[cx] = nlps
                    else:
                        d = mps[cx]
                        icx[cx] = nmps
                    while True:
                        if ct == 0:
                            mq.c = c
                            mq._bytein()
                            c = mq.c
                            ct = mq.ct
                        a = (a << 1) & 0xFFFF
                        c = (c << 1) & 0xFFFFFFFF
                        ct -= 1
                        if a & 0x8000:
                            break
            if d:
                row[x + 1] = 1
                left = 1
            else:
                left = 0
        mq.c = c
        mq.a = a
        mq.ct = ct
        rows.append(row)
    if not rows:
        return np.zeros((h, w), np.uint8)
    return np.array(
        [r[1:w + 1] for r in rows], np.uint8
    ).reshape(h, w)


def _mq_encode_seq(mq: MQEncoder, icx, mps, cxs, bits,
                   qe_tab=_QE) -> None:
    """Encode a sequence of (context, bit) pairs through an inlined
    CODEMPS/CODELPS + RENORME loop (E.3.3 — byte snapshots at the
    exact CT-exhaustion instant, the H.2-pinned order); BYTEOUT stays
    the encoder's method with C/CT synced around each call."""
    c = mq.c
    a = mq.a
    ct = mq.ct
    for cx, bit in zip(cxs, bits):
        i = icx[cx]
        qe, nmps, nlps, switch = qe_tab[i]
        if bit == mps[cx]:  # CODEMPS
            a -= qe
            if a & 0x8000:
                c += qe
                continue
            if a < qe:
                a = qe
            else:
                c += qe
            icx[cx] = nmps
        else:  # CODELPS
            a -= qe
            if a < qe:
                c += qe
            else:
                a = qe
            if switch:
                mps[cx] = 1 - mps[cx]
            icx[cx] = nlps
        while True:
            a = (a << 1) & 0xFFFF
            c = (c << 1) & 0xFFFFFFFF
            ct -= 1
            if ct == 0:
                mq.c = c
                mq.ct = ct
                mq._byteout()
                c = mq.c
                ct = mq.ct
            if a & 0x8000:
                break
    mq.c = c
    mq.a = a
    mq.ct = ct


def _run_refinement_general(w: int, h: int, template: int,
                            tpgron: bool, ref: np.ndarray, dx: int,
                            dy: int, coder, at=_NOMINAL_REF_AT,
                            bitmap=None):
    """Per-pixel reference walk for NON-nominal adaptive pixels (the
    A1 coding pixel may point anywhere causal, which the incremental
    registers of the fast path cannot express)."""
    coding, reference = _REF_TEMPLATES[template]
    if template == 0:
        coding = coding + [tuple(at[0])]
        reference = reference + [tuple(at[1])]
    bm = np.zeros((h, w), np.uint8) if bitmap is None else bitmap
    rh, rw = ref.shape

    def refpx(yy: int, xx: int) -> int:
        if 0 <= yy < rh and 0 <= xx < rw:
            return int(ref[yy, xx])
        return 0

    ltp = 0
    for y in range(h):
        if tpgron:
            ltp ^= coder.sltp(_TPGR_CTX[template], y, ltp)
        row = bm[y]
        for x in range(w):
            rx, ry = x - dx, y - dy
            if ltp:
                s = sum(
                    refpx(ry + q, rx + p)
                    for q in (-1, 0, 1)
                    for p in (-1, 0, 1)
                )
                if s == 0:
                    row[x] = 0
                    continue
                if s == 9:
                    row[x] = 1
                    continue
            cx = 0
            for px_, py_ in coding:
                yy, xx = y + py_, x + px_
                cx <<= 1
                if 0 <= yy < h and 0 <= xx < w:
                    cx |= int(bm[yy, xx])
            for px_, py_ in reference:
                cx = (cx << 1) | refpx(ry + py_, rx + px_)
            row[x] = coder.pixel(cx, y, x)
    return bm


class _SharedRefDecSide:
    """Refinement walk over a caller-owned MQ decoder and GR context
    arrays (symbol-dictionary / text-region form: all refinements of
    a segment share one bitstream and one GR context set)."""

    def __init__(self, mq: MQDecoder, icx, mps):
        self.mq, self.icx, self.mps = mq, icx, mps

    def pixel(self, cx: int, y: int, x: int) -> int:
        return self.mq.decode(self.icx, self.mps, cx)

    def sltp(self, cx: int, y: int, ltp: int) -> int:
        return self.mq.decode(self.icx, self.mps, cx)


class _SharedRefEncSide:
    def __init__(self, mq: MQEncoder, icx, mps, bitmap, ref,
                 dx: int, dy: int):
        self.mq, self.icx, self.mps = mq, icx, mps
        self.bitmap, self.ref = bitmap, ref
        self.dx, self.dy = dx, dy

    def pixel(self, cx: int, y: int, x: int) -> int:
        bit = int(self.bitmap[y, x])
        self.mq.encode(self.icx, self.mps, cx, bit)
        return bit

    def sltp(self, cx: int, y: int, ltp: int) -> int:
        # a row may be flagged typical only when every uniformly-
        # neighboured pixel already matches the forced value
        bm, ref = self.bitmap, self.ref
        rh, rw = ref.shape
        h, w = bm.shape
        safe = 1
        for x in range(w):
            rx, ry = x - self.dx, y - self.dy
            s = 0
            for q in (-1, 0, 1):
                for p in (-1, 0, 1):
                    yy, xx = ry + q, rx + p
                    if 0 <= yy < rh and 0 <= xx < rw:
                        s += int(ref[yy, xx])
            if (s == 0 and bm[y, x]) or (s == 9 and not bm[y, x]):
                safe = 0
                break
        bit = safe ^ ltp
        self.mq.encode(self.icx, self.mps, cx, bit)
        return bit


def decode_refinement_region(data: bytes, w: int, h: int,
                             ref: np.ndarray, dx: int = 0,
                             dy: int = 0, template: int = 0,
                             tpgron: bool = False,
                             at=_NOMINAL_REF_AT) -> np.ndarray:
    """Decode one MQ-coded generic refinement region against
    ``ref`` to an (h, w) uint8 bitmap (1 = black)."""
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"jbig2: unreasonable region {w}x{h}")
    if w * h > _MAX_ARITH_PIXELS:
        raise NotImplementedError(
            f"jbig2: {w}x{h} refinement region exceeds the "
            "per-region decode-time guard"
        )
    if template not in _REF_TEMPLATES:
        raise ValueError(f"jbig2: refinement template {template}")
    mq = MQDecoder(data)
    icx = bytearray(1 << 13)
    mps = bytearray(1 << 13)
    side = _SharedRefDecSide(mq, icx, mps)
    return _run_refinement(w, h, template, tpgron, ref, dx, dy, side,
                           at=at)


def encode_refinement_region(bitmap: np.ndarray, ref: np.ndarray,
                             dx: int = 0, dy: int = 0,
                             template: int = 0,
                             tpgron: bool = False) -> bytes:
    """Fixture-side MQ encoding of a bitmap as a generic refinement
    region body against ``ref``."""
    bm = np.asarray(bitmap, np.uint8)
    h, w = bm.shape
    mq = MQEncoder()
    icx = bytearray(1 << 13)
    mps = bytearray(1 << 13)
    side = _SharedRefEncSide(mq, icx, mps, bm, ref, dx, dy)
    _run_refinement(w, h, template, tpgron, ref, dx, dy, side,
                    bitmap=bm)
    return mq.flush()


# ---------------------------------------------------------------------------
# Huffman coding (T.88 Annex B) — the second scanner-encoder family
# (r14, VERDICT item 4): MSB-first raw bit IO (no stuffing), the
# canonical prefix-code assignment of B.3, the parameterized table
# model (normal/lower/upper range lines + OOB), custom table
# segments (type 53, B.2.1), and the standard tables B.1-B.5.
#
# Standard-table posture, stated: only B.1-B.5 are transcribed —
# each verified COMPLETE (Kraft sum exactly 1, tests/test_jbig2) —
# because their line sets are recallable with confidence; the text-
# region standard tables B.6-B.15 are NOT transcribed and selecting
# one raises the named error (custom tables, which real Huffman
# encoders commonly carry anyway, cover the text region instead).
# Within-length code assignment follows table row order; encoder
# and decoder share one table object, so in-repo streams are
# consistent by construction (the usual self-validation tier).


class _BitReader:
    """MSB-first raw bit reader over a bytes buffer (Annex B data
    carries no FF stuffing, unlike MQ/packet headers)."""

    def __init__(self, data: bytes, at: int = 0):
        self.d = data
        self.at = at
        self.n = 0  # bits consumed of d[at]

    def bit(self) -> int:
        if self.at >= len(self.d):
            raise ValueError("jbig2: Huffman data truncated")
        b = (self.d[self.at] >> (7 - self.n)) & 1
        self.n += 1
        if self.n == 8:
            self.n = 0
            self.at += 1
        return b

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> None:
        if self.n:
            self.n = 0
            self.at += 1

    def take_bytes(self, count: int) -> bytes:
        """Aligned raw byte extraction (collective bitmaps)."""
        self.align()
        if self.at + count > len(self.d):
            raise ValueError("jbig2: collective bitmap truncated")
        out = self.d[self.at : self.at + count]
        self.at += count
        return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def bit(self, b: int) -> None:
        self.cur = (self.cur << 1) | (b & 1)
        self.n += 1
        if self.n == 8:
            self.out.append(self.cur)
            self.cur = 0
            self.n = 0

    def write(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self) -> None:
        while self.n:
            self.bit(0)

    def put_bytes(self, data: bytes) -> None:
        self.align()
        self.out += data

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


class _HuffTable:
    """One Annex B table: ``lines`` are (preflen, rangelen,
    rangelow, kind) with kind in {"norm", "lower", "oob"} — an
    "upper" line is a norm line with rangelen 32. Lines with
    preflen 0 carry no code (B.2.1 allows them in custom tables).
    Canonical code assignment per B.3: shorter lengths first,
    row order within a length."""

    def __init__(self, lines):
        self.lines = [
            (int(p), int(r), int(lo), k) for p, r, lo, k in lines
        ]
        coded = [ln for ln in self.lines if ln[0] > 0]
        if not coded:
            raise ValueError("jbig2: Huffman table with no codes")
        self.dec: dict = {}
        self.enc: dict = {}
        curcode = 0
        curlen = 0
        for ln in sorted(
            range(len(coded)), key=lambda i: (coded[i][0], i)
        ):
            line = coded[ln]
            curcode <<= line[0] - curlen
            curlen = line[0]
            if curcode >= (1 << curlen):
                raise ValueError("jbig2: oversubscribed Huffman table")
            self.dec[(curlen, curcode)] = line
            self.enc[id(line)] = (curlen, curcode)
            curcode += 1
        self.coded = coded

    def kraft(self) -> float:
        return sum(2.0 ** -ln[0] for ln in self.coded)

    def decode(self, rd: _BitReader):
        code = 0
        for ln in range(1, 33):
            code = (code << 1) | rd.bit()
            hit = self.dec.get((ln, code))
            if hit is None:
                continue
            preflen, rangelen, rangelow, kind = hit
            if kind == "oob":
                return _OOB
            if kind == "lower":
                return rangelow - rd.read(32)
            return rangelow + rd.read(rangelen)
        raise ValueError("jbig2: Huffman code longer than 32 bits")

    def _line_for(self, value):
        for line in self.coded:
            preflen, rangelen, rangelow, kind = line
            if kind == "oob":
                continue
            if kind == "lower":
                if value <= rangelow:
                    return line
            elif rangelen >= 32:
                if value >= rangelow:
                    return line
            elif rangelow <= value < rangelow + (1 << rangelen):
                return line
        raise ValueError(f"jbig2: value {value} outside the table")

    def encode(self, wr: _BitWriter, value) -> None:
        if value is _OOB:
            line = next(
                (ln for ln in self.coded if ln[3] == "oob"), None
            )
            if line is None:
                raise ValueError("jbig2: table has no OOB code")
            ln_, code = self.enc[id(line)]
            wr.write(code, ln_)
            return
        line = self._line_for(value)
        preflen, rangelen, rangelow, kind = line
        ln_, code = self.enc[id(line)]
        wr.write(code, ln_)
        if kind == "lower":
            wr.write(rangelow - value, 32)
        elif rangelen >= 32:
            wr.write(value - rangelow, 32)
        else:
            wr.write(value - rangelow, rangelen)


def _std_table(name: str) -> _HuffTable:
    def rows(*specs):
        return [
            (p, r, lo, k if k else "norm")
            for p, r, lo, k in (
                s if len(s) == 4 else (*s, "norm") for s in specs
            )
        ]

    tables = {
        # B.1 (no OOB): 0..15, 16..271, 272..65807, >=65808
        "B1": rows((1, 4, 0), (2, 8, 16), (3, 16, 272),
                   (3, 32, 65808)),
        # B.2 (OOB len 6)
        "B2": rows((1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
                   (5, 6, 11), (6, 32, 75), (6, 0, 0, "oob")),
        # B.3 (lower range, OOB len 6)
        "B3": rows((8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2),
                   (4, 3, 3), (5, 6, 11), (8, 32, -257, "lower"),
                   (7, 32, 75), (6, 0, 0, "oob")),
        # B.4 (no OOB): 1-based B.2
        "B4": rows((1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
                   (5, 6, 12), (5, 32, 76)),
        # B.5 (lower range, no OOB): 1-based B.3
        "B5": rows((7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3),
                   (4, 3, 4), (5, 6, 12), (7, 32, -256, "lower"),
                   (6, 32, 76)),
    }
    if name not in tables:
        raise NotImplementedError(
            f"jbig2: standard Huffman table {name} (only B.1-B.5 "
            "are transcribed; B.6-B.15 stay named — custom tables "
            "cover the text region)"
        )
    return _HuffTable(tables[name])


def parse_table_segment(seg_data: bytes) -> _HuffTable:
    """Custom Huffman table segment body (type 53, B.2.1)."""
    if len(seg_data) < 9:
        raise ValueError("jbig2: truncated table segment")
    flags = seg_data[0]
    oob = flags & 1
    htps = ((flags >> 1) & 7) + 1
    htrs = ((flags >> 4) & 7) + 1
    low, high = struct.unpack_from(">ii", seg_data, 1)
    if high <= low:
        raise ValueError("jbig2: table segment range empty")
    rd = _BitReader(seg_data, 9)
    lines = []
    cur = low
    while cur < high:
        preflen = rd.read(htps)
        rangelen = rd.read(htrs)
        if rangelen > 32:
            raise ValueError("jbig2: table range length > 32")
        lines.append((preflen, rangelen, cur, "norm"))
        if len(lines) > 4096:
            raise ValueError("jbig2: implausible table line count")
        cur += 1 << rangelen
    lines.append((rd.read(htps), 32, low - 1, "lower"))
    lines.append((rd.read(htps), 32, high, "norm"))
    if oob:
        lines.append((rd.read(htps), 0, 0, "oob"))
    return _HuffTable(lines)


def encode_table_segment(lines) -> bytes:
    """Fixture writer: one custom-table segment body from the same
    line model (the lower/upper/OOB entries are found by kind;
    normal lines must tile [low, high) contiguously)."""
    norm = [ln for ln in lines if ln[3] == "norm" and ln[1] < 32]
    lower = next((ln for ln in lines if ln[3] == "lower"), None)
    upper = next(
        (ln for ln in lines if ln[3] == "norm" and ln[1] >= 32), None
    )
    oob = next((ln for ln in lines if ln[3] == "oob"), None)
    low = norm[0][2]
    high = norm[-1][2] + (1 << norm[-1][1])
    htps = max(
        1, max(ln[0] for ln in lines).bit_length()
    )
    htrs = max(1, max(ln[1] for ln in norm).bit_length())
    if htps > 8 or htrs > 8:
        raise ValueError("jbig2: table parameters out of range")
    wr = _BitWriter()
    cur = low
    for preflen, rangelen, rangelow, _k in norm:
        if rangelow != cur:
            raise ValueError("jbig2: non-contiguous table lines")
        wr.write(preflen, htps)
        wr.write(rangelen, htrs)
        cur += 1 << rangelen
    wr.write(lower[0] if lower else 0, htps)
    wr.write(upper[0] if upper else 0, htps)
    if oob is not None:
        wr.write(oob[0], htps)
    head = bytes([
        (1 if oob is not None else 0)
        | ((htps - 1) << 1)
        | ((htrs - 1) << 4)
    ]) + struct.pack(">ii", low, high)
    return head + wr.done()


def _symcode_table(lengths: list[int]) -> _HuffTable:
    """SBSYMCODES (7.4.3.1.2): plain prefix codes over symbol ids —
    modeled as zero-range lines whose rangelow IS the id."""
    return _HuffTable(
        [(ln, 0, i, "norm") for i, ln in enumerate(lengths)]
    )


_RUNCODE_COUNT = 35


def _read_symcode_lengths(rd: _BitReader, n_syms: int) -> list[int]:
    """Symbol-code lengths via the runcode mechanism (7.4.3.1.2):
    35 four-bit runcode prefix lengths, then runcodes 0-31 = literal
    length, 32 = repeat previous 3+read(2), 33 = zeros 3+read(3),
    34 = zeros 11+read(7)."""
    run_lens = [rd.read(4) for _ in range(_RUNCODE_COUNT)]
    runtab = _HuffTable(
        [
            (ln, 0, i, "norm")
            for i, ln in enumerate(run_lens)
            if ln > 0
        ]
    )
    out: list[int] = []
    prev = 0
    while len(out) < n_syms:
        c = runtab.decode(rd)
        if c < 32:
            out.append(c)
            prev = c
        elif c == 32:
            out.extend([prev] * (3 + rd.read(2)))
        elif c == 33:
            out.extend([0] * (3 + rd.read(3)))
        else:
            out.extend([0] * (11 + rd.read(7)))
        if len(out) > n_syms:
            raise ValueError("jbig2: runcode overrun")
    return out


def _write_symcode_lengths(wr: _BitWriter, lengths: list[int]):
    """Fixture writer: one runcode (the shared length) gets a 1-bit
    prefix; every symbol emits it literally."""
    assert lengths and all(ln == lengths[0] for ln in lengths)
    shared = lengths[0]
    for i in range(_RUNCODE_COUNT):
        wr.write(1 if i == shared else 0, 4)
    for _ in lengths:
        wr.bit(0)  # the single 1-bit runcode


# ---------------------------------------------------------------------------
# symbol dictionary (T.88 §6.5 / 7.4.3) and text region (§6.4 /
# 7.4.4) — the ARITHMETIC path real scanner encoders (jbig2enc-
# class) emit, plus (r14) the HUFFMAN path (SDHUFF/SBHUFF) of the
# second encoder family; r15 adds the refinement tier below.

_MAX_SYMBOLS = 1 << 16
_MAX_SYMBOL_DIM = 1 << 14


def decode_symbol_dict(
    seg_data: bytes, input_syms: list, tables: list | None = None
) -> list:
    """Decode one symbol-dictionary segment body into its EXPORTED
    symbol list (each an (h, w) uint8 bitmap, 1 = black).
    ``input_syms`` are the exported symbols of the dictionaries this
    segment refers to, in reference order (6.5.8.2.1); ``tables``
    are the custom Huffman tables of the referred table segments,
    in reference order (used only when SDHUFF — r14)."""
    if len(seg_data) < 2:
        raise ValueError("jbig2: truncated symbol dictionary")
    (flags,) = struct.unpack_from(">H", seg_data, 0)
    sdhuff = flags & 1
    refagg = (flags >> 1) & 1
    template = (flags >> 10) & 3
    rtemplate = (flags >> 12) & 1
    ctx_used = (flags >> 8) & 1
    if refagg and sdhuff:
        raise NotImplementedError(
            "jbig2: Huffman refinement/aggregate symbol coding "
            "(SDHUFF + SDREFAGG)"
        )
    if ctx_used:
        raise NotImplementedError(
            "jbig2: imported bitmap coding context (flag bit 8)"
        )
    pos = 2
    if sdhuff:
        # table selections (7.4.3.1.1): customs consume the referred
        # table segments in order
        custom = list(tables or [])

        def pick(sel: int, options: dict, custom_sel: int = 3):
            if sel in options:
                return _std_table(options[sel])
            if sel == custom_sel:
                if not custom:
                    raise ValueError(
                        "jbig2: missing custom Huffman table"
                    )
                return custom.pop(0)
            raise ValueError(f"jbig2: Huffman table selector {sel}")

        t_dh = pick((flags >> 2) & 3, {0: "B4", 1: "B5"})
        t_dw = pick((flags >> 4) & 3, {0: "B2", 1: "B3"})
        # BMSIZE is a ONE-bit selector: 1 = custom (r14 review
        # finding — treating it like the 2-bit DH/DW selectors
        # quarantined conforming custom-BMSIZE dictionaries)
        t_bmsize = pick((flags >> 6) & 1, {0: "B1"}, custom_sel=1)
        # SDHUFFAGGINST (bit 7) only applies under SDREFAGG
    else:
        n_at = 4 if template == 0 else 1
        at = []
        for _ in range(n_at):
            if pos + 2 > len(seg_data):
                raise ValueError(
                    "jbig2: truncated symbol-dict AT pixels"
                )
            at.append(
                (
                    struct.unpack_from("b", seg_data, pos)[0],
                    struct.unpack_from("b", seg_data, pos + 1)[0],
                )
            )
            pos += 2
        if at != _NOMINAL_AT[template]:
            raise NotImplementedError(
                f"jbig2: non-nominal AT pixels {at} in symbol "
                "dictionary"
            )
        if refagg and rtemplate == 0:
            # refinement AT pixels (7.4.3.1.3, r15)
            if pos + 4 > len(seg_data):
                raise ValueError(
                    "jbig2: truncated refinement AT pixels"
                )
            rat = (
                (struct.unpack_from("b", seg_data, pos)[0],
                 struct.unpack_from("b", seg_data, pos + 1)[0]),
                (struct.unpack_from("b", seg_data, pos + 2)[0],
                 struct.unpack_from("b", seg_data, pos + 3)[0]),
            )
            pos += 4
        else:
            rat = _NOMINAL_REF_AT
    if pos + 8 > len(seg_data):
        raise ValueError("jbig2: truncated symbol dictionary counts")
    n_ex, n_new = struct.unpack_from(">II", seg_data, pos)
    pos += 8
    n_in = len(input_syms)
    if n_new > _MAX_SYMBOLS or n_ex > n_in + n_new:
        raise ValueError(
            f"jbig2: implausible symbol counts new={n_new} ex={n_ex}"
        )
    new_syms: list = []
    hcheight = 0
    total_px = 0  # decode-time guard across the dictionary
    if sdhuff:
        # 6.5.9: per height class, widths first (DW runs to OOB),
        # then the byte-aligned COLLECTIVE bitmap — BMSIZE 0 means
        # an uncompressed row-padded raster, nonzero means MMR
        from timeseries_data_provider_spark.operators import (
            ccitt as _ccitt,
        )

        rd = _BitReader(seg_data, pos)
        while len(new_syms) < n_new:
            dh = t_dh.decode(rd)
            if dh is _OOB:
                raise ValueError("jbig2: OOB height-class delta")
            hcheight += dh
            if not (0 < hcheight <= _MAX_SYMBOL_DIM):
                raise ValueError(f"jbig2: symbol height {hcheight}")
            widths = []
            symwidth = 0
            totwidth = 0
            while True:
                dw = t_dw.decode(rd)
                if dw is _OOB:
                    break
                symwidth += dw
                if not (0 < symwidth <= _MAX_SYMBOL_DIM):
                    raise ValueError(
                        f"jbig2: symbol width {symwidth}"
                    )
                if len(new_syms) + len(widths) >= n_new:
                    raise ValueError(
                        "jbig2: more symbols than SDNUMNEWSYMS "
                        "declares"
                    )
                widths.append(symwidth)
                totwidth += symwidth
                total_px += symwidth * hcheight
                if total_px > _MAX_ARITH_PIXELS:
                    raise NotImplementedError(
                        "jbig2: symbol dictionary exceeds the "
                        "decode-time area guard (route to a codec "
                        "library)"
                    )
            # the collective-bitmap fields are coded once per height
            # class UNCONDITIONALLY (6.5.5 step 4 — r14 review
            # finding: skipping them for an empty class desynced the
            # bit reader into reading BMSIZE bits as the next HCDH)
            bmsize = t_bmsize.decode(rd)
            if bmsize is _OOB or bmsize < 0:
                raise ValueError("jbig2: malformed BMSIZE")
            if not widths:
                if bmsize != 0:
                    raise ValueError(
                        "jbig2: collective bitmap for an empty "
                        "height class"
                    )
                rd.align()
                continue
            if bmsize == 0:
                stride = (totwidth + 7) // 8
                raw = rd.take_bytes(stride * hcheight)
                rows = np.frombuffer(raw, np.uint8).reshape(
                    hcheight, stride
                )
                coll = np.unpackbits(rows, axis=1)[:, :totwidth]
            else:
                data = rd.take_bytes(bmsize)
                coll = _ccitt.decode_g4(data, totwidth, hcheight)
            x0 = 0
            for wdt in widths:
                new_syms.append(
                    np.ascontiguousarray(coll[:, x0 : x0 + wdt])
                )
                x0 += wdt
        rd.align()
        t_ex = _std_table("B1")

        def ex_run():
            return t_ex.decode(rd)
    else:
        mq = MQDecoder(seg_data[pos:])
        gb_icx = bytearray(1 << 16)
        gb_mps = bytearray(1 << 16)
        iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
        if refagg:
            # refinement-coded symbols (6.5.8.2, r15): one GR
            # context set and the IAAI/IAID/IARDX/IARDY contexts
            # shared across the dictionary
            gr_icx = bytearray(1 << 13)
            gr_mps = bytearray(1 << 13)
            iaai, iardx, iardy = _IntCtx(), _IntCtx(), _IntCtx()
            sdcodelen = max(0, (n_in + n_new - 1).bit_length())
            iaid = _IntCtx(1 << (sdcodelen + 1))
        while len(new_syms) < n_new:
            dh = decode_int(mq, iadh)
            if dh is _OOB:
                raise ValueError("jbig2: OOB height-class delta")
            hcheight += dh
            if not (0 < hcheight <= _MAX_SYMBOL_DIM):
                raise ValueError(f"jbig2: symbol height {hcheight}")
            symwidth = 0
            while True:
                dw = decode_int(mq, iadw)
                if dw is _OOB:
                    break  # end of this height class (6.5.5 step 4c)
                symwidth += dw
                if not (0 < symwidth <= _MAX_SYMBOL_DIM):
                    raise ValueError(
                        f"jbig2: symbol width {symwidth}"
                    )
                if len(new_syms) >= n_new:
                    raise ValueError(
                        "jbig2: more symbols than SDNUMNEWSYMS "
                        "declares"
                    )
                total_px += symwidth * hcheight
                if total_px > _MAX_ARITH_PIXELS:
                    raise NotImplementedError(
                        "jbig2: symbol dictionary exceeds the "
                        "decode-time area guard (route to a codec "
                        "library)"
                    )
                if refagg:
                    # 6.5.8.2.2: REFAGGNINST = 1 refines one
                    # already-decoded symbol; > 1 embeds a full
                    # text region (aggregate coding) — named
                    n_inst = decode_int(mq, iaai)
                    if n_inst is _OOB or n_inst < 1:
                        raise ValueError(
                            "jbig2: malformed REFAGGNINST"
                        )
                    if n_inst != 1:
                        raise NotImplementedError(
                            "jbig2: aggregate symbol coding "
                            "(REFAGGNINST > 1 embeds a text "
                            "region)"
                        )
                    rid = decode_iaid(mq, iaid, sdcodelen)
                    have = n_in + len(new_syms)
                    if rid >= have:
                        raise ValueError(
                            f"jbig2: refinement reference id {rid} "
                            f"of {have}"
                        )
                    rdx = decode_int(mq, iardx)
                    rdy = decode_int(mq, iardy)
                    if rdx is _OOB or rdy is _OOB:
                        raise ValueError(
                            "jbig2: OOB refinement offset"
                        )
                    refsym = np.asarray(
                        input_syms[rid] if rid < n_in
                        else new_syms[rid - n_in],
                        np.uint8,
                    )
                    side = _SharedRefDecSide(mq, gr_icx, gr_mps)
                    bm = _run_refinement(
                        symwidth, hcheight, rtemplate, False,
                        refsym, rdx, rdy, side, at=rat,
                    )
                else:
                    side = _SharedDecSide(mq, gb_icx, gb_mps)
                    bm = _run_generic(
                        symwidth, hcheight, template, False, side
                    )
                new_syms.append(bm)

        def ex_run():
            return decode_int(mq, iaex)

    # export flags (6.5.10): alternating run lengths over the
    # concatenated input+new symbol list, starting NOT-exported —
    # IAEX under arithmetic coding, Table B.1 under Huffman
    all_syms = list(input_syms) + new_syms
    exported: list = []
    i, cur, rounds = 0, 0, 0
    while i < len(all_syms):
        run = ex_run()
        if run is _OOB or run < 0 or i + run > len(all_syms):
            raise ValueError("jbig2: malformed export run length")
        if cur:
            exported.extend(all_syms[i : i + run])
        i += run
        cur ^= 1
        rounds += 1
        if rounds > 2 * len(all_syms) + 2:
            raise ValueError("jbig2: export flag loop does not end")
    if len(exported) != n_ex:
        raise ValueError(
            f"jbig2: dictionary exported {len(exported)} symbols, "
            f"declared {n_ex}"
        )
    return exported


def decode_text_region(
    seg_data: bytes, syms: list, tables: list | None = None
) -> tuple:
    """One text-region segment body -> (x, y, combop, bitmap).
    ``syms`` is the symbol list from the referred dictionaries;
    ``tables`` the referred custom Huffman tables in reference
    order (SBHUFF only — r14). The layout loop is shared between
    the arithmetic and Huffman forms: only the six readers differ
    (6.4.5 reads via IADT/IAFS/IADS/IAIT/IAID/IARI under MQ, via
    the selected Annex B tables + raw bits under Huffman)."""
    if len(seg_data) < 23:
        raise ValueError("jbig2: truncated text region")
    w, h, x, y = struct.unpack_from(">IIII", seg_data, 0)
    ext_combop = seg_data[16] & 0x07
    (tflags,) = struct.unpack_from(">H", seg_data, 17)
    pos = 19
    sbhuff = tflags & 1
    refine = (tflags >> 1) & 1
    log_strips = (tflags >> 2) & 3
    sbstrips = 1 << log_strips
    refcorner = (tflags >> 4) & 3
    transposed = (tflags >> 6) & 1
    combop = (tflags >> 7) & 3
    defpixel = (tflags >> 9) & 1
    dsoffset = (tflags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32  # signed 5-bit (7.4.4.1.1)
    rtemplate = (tflags >> 15) & 1
    if sbhuff:
        # Huffman table selections (7.4.4.1.2); customs consume the
        # referred table segments in order. The refinement tables
        # (RDW/RDH/RDX/RDY/RSIZE) only matter under SBREFINE.
        if pos + 2 > len(seg_data):
            raise ValueError("jbig2: truncated Huffman flags")
        (hflags,) = struct.unpack_from(">H", seg_data, pos)
        pos += 2
        custom = list(tables or [])

        def pick(sel: int, options: dict, what: str):
            if sel in options:
                return _std_table(options[sel])
            if sel == 3:
                if not custom:
                    raise ValueError(
                        "jbig2: missing custom Huffman table"
                    )
                return custom.pop(0)
            raise ValueError(
                f"jbig2: Huffman {what} selector {sel}"
            )

        t_fs = pick(hflags & 3, {0: "B6", 1: "B7"}, "FS")
        t_ds = pick((hflags >> 2) & 3,
                    {0: "B8", 1: "B9", 2: "B10"}, "DS")
        t_dt = pick((hflags >> 4) & 3,
                    {0: "B11", 1: "B12", 2: "B13"}, "DT")
        if refine:
            raise NotImplementedError(
                "jbig2: Huffman refined text region (SBREFINE + "
                "SBHUFF)"
            )
    rat = _NOMINAL_REF_AT
    if refine and rtemplate == 0:
        # refinement AT pixels (7.4.4.1.4, r15 — previously skipped)
        if pos + 4 > len(seg_data):
            raise ValueError("jbig2: truncated refinement AT pixels")
        rat = (
            (struct.unpack_from("b", seg_data, pos)[0],
             struct.unpack_from("b", seg_data, pos + 1)[0]),
            (struct.unpack_from("b", seg_data, pos + 2)[0],
             struct.unpack_from("b", seg_data, pos + 3)[0]),
        )
        pos += 4
    if pos + 4 > len(seg_data):
        raise ValueError("jbig2: truncated text region header")
    (n_instances,) = struct.unpack_from(">I", seg_data, pos)
    pos += 4
    if not syms:
        raise ValueError("jbig2: text region with no symbols")
    if n_instances > _MAX_TEXT_INSTANCES:
        raise ValueError(
            "jbig2: implausible instance count (decode-time guard)"
        )
    if w <= 0 or h <= 0 or w * h > _MAX_PIXELS:
        raise ValueError(f"jbig2: unreasonable region {w}x{h}")
    codelen = max(0, (len(syms) - 1).bit_length())
    if sbhuff:
        rd = _BitReader(seg_data, pos)
        # SBSYMCODES (7.4.3.1.2): runcode-coded per-symbol prefix
        # lengths, byte-aligned afterwards
        lengths = _read_symcode_lengths(rd, len(syms))
        if all(ln == 0 for ln in lengths):
            raise ValueError("jbig2: empty symbol code table")
        symtab = _symcode_table(lengths)
        rd.align()

        def read_dt():
            return t_dt.decode(rd)

        def read_fs():
            return t_fs.decode(rd)

        def read_ds():
            return t_ds.decode(rd)

        def read_it():
            return rd.read(log_strips)

        def read_id():
            return symtab.decode(rd)

        def read_ri():  # pragma: no cover - refine rejected above
            return rd.bit()
    else:
        mq = MQDecoder(seg_data[pos:])
        iadt, iafs, iads, iait = (
            _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(),
        )
        iari = _IntCtx()
        iaid = _IntCtx(1 << (codelen + 1))

        def read_dt():
            return decode_int(mq, iadt)

        def read_fs():
            return decode_int(mq, iafs)

        def read_ds():
            return decode_int(mq, iads)

        def read_it():
            return decode_int(mq, iait)

        def read_id():
            return decode_iaid(mq, iaid, codelen)

        def read_ri():
            return decode_int(mq, iari)

        if refine:
            # r15: per-instance refinement contexts (6.4.11 — one
            # GR context set shared across the region)
            iardw, iardh = _IntCtx(), _IntCtx()
            iardx2, iardy2 = _IntCtx(), _IntCtx()
            gr_icx = bytearray(1 << 13)
            gr_mps = bytearray(1 << 13)

    refined_px = [0]

    def read_ds_int(ctx):
        v = decode_int(mq, ctx)
        if v is _OOB:
            raise ValueError("jbig2: OOB refinement field")
        return v

    bm = np.full((h, w), defpixel, np.uint8)
    dt = read_dt()
    if dt is _OOB:
        raise ValueError("jbig2: OOB initial strip delta")
    stript = -dt * sbstrips
    firsts = 0
    n_done = 0
    while n_done < n_instances:
        dt = read_dt()
        if dt is _OOB:
            raise ValueError("jbig2: OOB strip delta")
        stript += dt * sbstrips
        first = True
        curs = 0
        while True:
            if first:
                dfs = read_fs()
                if dfs is _OOB:
                    raise ValueError("jbig2: OOB first-symbol delta")
                firsts += dfs
                curs = firsts
                first = False
            else:
                ids = read_ds()
                if ids is _OOB:
                    break  # end of strip (6.4.5 step 3c(ii))
                curs += ids + dsoffset
            curt = 0 if sbstrips == 1 else read_it()
            if curt is _OOB:
                raise ValueError("jbig2: OOB in-strip T")
            ti = stript + curt
            sym_id = read_id()
            if sym_id >= len(syms):
                raise ValueError(
                    f"jbig2: symbol id {sym_id} out of range"
                )
            sb = syms[sym_id]
            hi, wi = sb.shape
            if refine:
                ri = read_ri()
                if ri is _OOB:
                    raise ValueError("jbig2: OOB refinement flag")
                if ri:
                    # 6.4.11 (r15): the instance is a refinement of
                    # its symbol — new dims (W+RDW, H+RDH), the
                    # reference laid at ((RDW>>1)+RDX, (RDH>>1)+RDY)
                    rdw = read_ds_int(iardw)
                    rdh = read_ds_int(iardh)
                    rdx = read_ds_int(iardx2)
                    rdy = read_ds_int(iardy2)
                    nw, nh = wi + rdw, hi + rdh
                    if not (
                        0 < nw <= _MAX_SYMBOL_DIM
                        and 0 < nh <= _MAX_SYMBOL_DIM
                    ):
                        raise ValueError(
                            f"jbig2: refined instance {nw}x{nh}"
                        )
                    refined_px[0] += nw * nh
                    if refined_px[0] > _MAX_ARITH_PIXELS:
                        raise NotImplementedError(
                            "jbig2: refined text region exceeds "
                            "the decode-time area guard"
                        )
                    side = _SharedRefDecSide(mq, gr_icx, gr_mps)
                    sb = _run_refinement(
                        nw, nh, rtemplate, False,
                        np.asarray(sb, np.uint8),
                        (rdw >> 1) + rdx, (rdh >> 1) + rdy,
                        side, at=rat,
                    )
                    hi, wi = nh, nw
            # placement (6.4.5 step 3c(iii-x)): the named corner of
            # the symbol sits on the (S, T) coordinate; along the S
            # axis the left/right corner forms differ only in when
            # CURS advances, which is placement-equivalent
            if not transposed:
                r0 = ti if refcorner in (1, 3) else ti - hi + 1
                c0 = curs
                adv = wi - 1
            else:
                r0 = curs
                c0 = ti if refcorner in (0, 1) else ti - wi + 1
                adv = hi - 1
            if r0 < 0 or c0 < 0 or r0 + hi > h or c0 + wi > w:
                raise ValueError(
                    "jbig2: symbol instance exceeds region bounds"
                )
            tgt = bm[r0 : r0 + hi, c0 : c0 + wi]
            if combop == 0:
                tgt |= sb
            elif combop == 1:
                tgt &= sb
            elif combop == 2:
                tgt ^= sb
            else:
                raise NotImplementedError(
                    f"jbig2: text composition operator {combop}"
                )
            curs += adv
            n_done += 1
            if n_done == n_instances:
                # spec ends the strip loop only on OOB; a conforming
                # encoder emits it right after the last instance
                ids = read_ds()
                if ids is not _OOB:
                    raise ValueError(
                        "jbig2: data past the last text instance"
                    )
                break
        if n_done == n_instances:
            break
    return x, y, ext_combop, bm


# ---------------------------------------------------------------------------
# embedded segment stream (T.88 §7; the form PDF's JBIG2Decode carries)

_GENERIC_REGION_TYPES = (38, 39)  # immediate / immediate lossless


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


def _decode_refinement_segment(seg_data: bytes, page_bm) -> tuple:
    """One immediate refinement-region segment body (7.4.7, r15) ->
    (x, y, combop, bitmap). The reference is the page content under
    the region box (7.4.7.2: a refinement segment with no referred
    intermediate region refines the page buffer)."""
    if len(seg_data) < 18:
        raise ValueError("jbig2: truncated refinement region")
    w, h, x, y = struct.unpack_from(">IIII", seg_data, 0)
    combop = seg_data[16] & 0x07
    rflags = seg_data[17]
    template = rflags & 1
    tpgron = bool(rflags & 2)
    pos = 18
    at = _NOMINAL_REF_AT
    if template == 0:
        if pos + 4 > len(seg_data):
            raise ValueError(
                "jbig2: truncated refinement AT pixels"
            )
        at = (
            (struct.unpack_from("b", seg_data, pos)[0],
             struct.unpack_from("b", seg_data, pos + 1)[0]),
            (struct.unpack_from("b", seg_data, pos + 2)[0],
             struct.unpack_from("b", seg_data, pos + 3)[0]),
        )
        pos += 4
    if page_bm is None:
        raise ValueError(
            "jbig2: refinement region before any page content"
        )
    ph, pw = page_bm.shape
    if w <= 0 or h <= 0 or y + h > ph or x + w > pw:
        raise ValueError(
            "jbig2: refinement region exceeds page bounds"
        )
    ref = np.ascontiguousarray(page_bm[y : y + h, x : x + w])
    bm = decode_refinement_region(
        seg_data[pos:], w, h, ref, 0, 0, template, tpgron, at=at
    )
    return x, y, combop, bm


def decode_jbig2_embedded(
    data: bytes, globals_data: bytes | None = None
) -> np.ndarray:
    """Decode a PDF-embedded JBIG2 stream (segment headers, page
    info, symbol dictionaries, immediate text regions, immediate
    generic regions, custom Huffman tables — both the arithmetic
    and the r14 Huffman symbol/text forms, plus r15 immediate
    refinement regions and refinement-coded symbols/instances) to
    the page bitmap (1 = black). Halftone and intermediate-region
    segments raise named errors."""
    page_bm = None
    page_default = 0
    sym_store: dict[int, list] = {}
    table_store: dict[int, _HuffTable] = {}

    def compose(x: int, y: int, combop: int, bm) -> None:
        nonlocal page_bm
        if page_bm is None:
            # page-info-less stream (tolerated): size the page to
            # contain the region AT ITS OFFSET (r12 review finding —
            # adopting the bitmap directly dropped nonzero x/y and
            # silently mis-positioned the raster)
            if x == 0 and y == 0:
                page_bm = bm
                return
            h, w = bm.shape
            if (y + h) * (x + w) > _MAX_PIXELS:
                raise ValueError(
                    "jbig2: offset region implies unreasonable page"
                )
            page_bm = np.zeros((y + h, x + w), np.uint8)
        h, w = bm.shape
        ph, pw = page_bm.shape
        if y + h > ph or x + w > pw:
            raise ValueError("jbig2: region exceeds page bounds")
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
                compose(x, y, combop, bm)
            elif t == 0:  # symbol dictionary (r12)
                input_syms: list = []
                ref_tables: list = []
                for r in seg["refs"]:
                    input_syms.extend(sym_store.get(r, []))
                    if r in table_store:
                        ref_tables.append(table_store[r])
                sym_store[seg["num"]] = decode_symbol_dict(
                    seg["data"], input_syms, ref_tables
                )
            elif t in (6, 7):  # immediate text region (r12)
                syms: list = []
                ref_tables = []
                for r in seg["refs"]:
                    syms.extend(sym_store.get(r, []))
                    if r in table_store:
                        ref_tables.append(table_store[r])
                x, y, combop, bm = decode_text_region(
                    seg["data"], syms, ref_tables
                )
                compose(x, y, combop, bm)
            elif t in (49, 50, 51, 62):
                continue  # end-of-page/stripe/file, extension
            elif t in (4, 36):
                raise NotImplementedError(
                    f"jbig2: intermediate region (type {t}) — a "
                    "refinement input, never page-composed (r12 "
                    "review finding: type 36 used to compose "
                    "directly)"
                )
            elif t in (42, 43):
                # immediate refinement region (r15): refines the
                # page buffer under its box; REPLACE is the
                # conforming external op for page refinement
                x, y, combop, bm = _decode_refinement_segment(
                    seg["data"], page_bm
                )
                compose(x, y, combop, bm)
            elif t in (16, 20, 22, 23, 40):
                raise NotImplementedError(
                    f"jbig2: segment type {t} (halftone/"
                    "intermediate-refinement scope)"
                )
            elif t == 53:  # custom Huffman table (r14)
                table_store[seg["num"]] = parse_table_segment(
                    seg["data"]
                )
            else:
                raise ValueError(f"jbig2: unknown segment type {t}")

    if globals_data:
        walk(globals_data)
    walk(data)
    if page_bm is None:
        raise ValueError("jbig2: no page or region in stream")
    return page_bm


def _seg_header(num: int, typ: int, page: int, payload: bytes,
                refs: tuple = ()) -> bytes:
    """Short-form segment header (§7.2): works for fixtures with
    <= 4 referred segments and numbers <= 256."""
    out = struct.pack(">I", num) + bytes([typ])
    out += bytes([len(refs) << 5])
    out += bytes(refs)  # 1-byte referred numbers (num <= 256)
    out += bytes([page])
    out += struct.pack(">I", len(payload)) + payload
    return out


def encode_symbol_dict(symbols: list, template: int = 0) -> bytes:
    """Fixture writer: one arithmetic symbol-dictionary segment body
    exporting ``symbols`` IN THE GIVEN ORDER (callers pre-sort into
    height classes; heights must be non-decreasing)."""
    mq = MQEncoder()
    gb_icx = bytearray(1 << 16)
    gb_mps = bytearray(1 << 16)
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        if h < hcheight:
            raise ValueError(
                "encode_symbol_dict: heights must be non-decreasing"
            )
        encode_int(mq, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < len(symbols) and symbols[i].shape[0] == h:
            bm = np.asarray(symbols[i], np.uint8)
            encode_int(mq, iadw, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            side = _SharedEncSide(mq, gb_icx, gb_mps, bm)
            _run_generic(
                bm.shape[1], h, template, False, side, bitmap=bm
            )
            i += 1
        encode_int(mq, iadw, _OOB)
    # export every symbol: run of 0 not-exported, then all exported
    encode_int(mq, iaex, 0)
    encode_int(mq, iaex, len(symbols))
    at = b"".join(
        struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_AT[template]
    )
    flags = template << 10
    return (
        struct.pack(">H", flags)
        + at
        + struct.pack(">II", len(symbols), len(symbols))
        + mq.flush()
    )


def encode_symbol_dict_refagg(
    new_symbols: list, refs: list, input_syms: list,
    rtemplate: int = 0,
) -> bytes:
    """Fixture writer (r15): one arithmetic SDREFAGG symbol-
    dictionary segment body. Every new symbol is refinement-coded
    (REFAGGNINST = 1) against ``refs[i] = (ref_id, rdx, rdy)``
    where ref_id indexes input symbols then new symbols so far;
    ``input_syms`` are the referred dictionaries' exports (the
    decoder receives the same list). Heights non-decreasing; only
    the new symbols are exported."""
    n_in = len(input_syms)
    n_new = len(new_symbols)
    mq = MQEncoder()
    iadh, iadw, iaex = _IntCtx(), _IntCtx(), _IntCtx()
    iaai, iardx, iardy = _IntCtx(), _IntCtx(), _IntCtx()
    sdcodelen = max(0, (n_in + n_new - 1).bit_length())
    iaid = _IntCtx(1 << (sdcodelen + 1))
    gr_icx = bytearray(1 << 13)
    gr_mps = bytearray(1 << 13)
    done: list = []
    hcheight = 0
    i = 0
    while i < n_new:
        h = new_symbols[i].shape[0]
        if h < hcheight:
            raise ValueError(
                "encode_symbol_dict_refagg: heights must be "
                "non-decreasing"
            )
        encode_int(mq, iadh, h - hcheight)
        hcheight = h
        symwidth = 0
        while i < n_new and new_symbols[i].shape[0] == h:
            bm = np.asarray(new_symbols[i], np.uint8)
            encode_int(mq, iadw, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            rid, rdx, rdy = refs[i]
            if rid >= n_in + len(done):
                raise ValueError(
                    "encode_symbol_dict_refagg: forward reference"
                )
            encode_int(mq, iaai, 1)
            encode_iaid(mq, iaid, sdcodelen, rid)
            encode_int(mq, iardx, rdx)
            encode_int(mq, iardy, rdy)
            refsym = np.asarray(
                input_syms[rid] if rid < n_in
                else done[rid - n_in],
                np.uint8,
            )
            side = _SharedRefEncSide(
                mq, gr_icx, gr_mps, bm, refsym, rdx, rdy
            )
            _run_refinement(
                bm.shape[1], h, rtemplate, False, refsym, rdx, rdy,
                side, bitmap=bm,
            )
            done.append(bm)
            i += 1
        encode_int(mq, iadw, _OOB)
    encode_int(mq, iaex, n_in)   # input symbols: not exported
    encode_int(mq, iaex, n_new)  # new symbols: exported
    flags = 2 | (rtemplate << 12)  # SDHUFF=0, SDREFAGG=1, tmpl 0
    at = b"".join(
        struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_AT[0]
    )
    rat = b""
    if rtemplate == 0:
        rat = b"".join(
            struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_REF_AT
        )
    return (
        struct.pack(">H", flags)
        + at
        + rat
        + struct.pack(">II", n_new, n_new)
        + mq.flush()
    )


def encode_text_region(
    region_w: int,
    region_h: int,
    symbols: list,
    placements: list,
    refcorner: int = 1,
    transposed: bool = False,
    log_strips: int = 0,
    dsoffset: int = 0,
) -> bytes:
    """Fixture writer: one arithmetic text-region segment body.
    ``placements`` are (symbol_index, row, col) TOP-LEFT positions
    — or (symbol_index, row, col, refined_bitmap) for an instance
    coded as a REFINEMENT of its symbol (r15: RI = 1 with
    RDW/RDH from the shape delta, RDX = RDY = 0); the writer
    converts to the (S, T) anchor the chosen REFCORNER /
    TRANSPOSED mode implies, so every mode must reproduce the same
    raster."""
    sbstrips = 1 << log_strips
    codelen = max(0, (len(symbols) - 1).bit_length())
    refine = any(len(e) > 3 for e in placements)
    inst = []
    for e in placements:
        idx, row, col = e[0], e[1], e[2]
        target = e[3] if len(e) > 3 else None
        hi, wi = (
            target.shape if target is not None
            else symbols[idx].shape
        )
        if not transposed:
            s = col
            t = row if refcorner in (1, 3) else row + hi - 1
            adv = wi - 1
        else:
            s = row
            t = col if refcorner in (0, 1) else col + wi - 1
            adv = hi - 1
        inst.append((t // sbstrips, s, t, idx, adv, target))
    inst.sort(key=lambda e: (e[0], e[1]))
    mq = MQEncoder()
    iadt, iafs, iads, iait = (
        _IntCtx(), _IntCtx(), _IntCtx(), _IntCtx(),
    )
    iaid = _IntCtx(1 << (codelen + 1))
    iari = _IntCtx()
    iardw, iardh = _IntCtx(), _IntCtx()
    iardx2, iardy2 = _IntCtx(), _IntCtx()
    gr_icx = bytearray(1 << 13)
    gr_mps = bytearray(1 << 13)
    encode_int(mq, iadt, 0)  # STRIPT starts at 0
    prev_key = 0
    firsts = 0
    j = 0
    while j < len(inst):
        key = inst[j][0]
        encode_int(mq, iadt, key - prev_key)
        prev_key = key
        first = True
        curs = 0
        while j < len(inst) and inst[j][0] == key:
            _, s, t, idx, adv, target = inst[j]
            if first:
                encode_int(mq, iafs, s - firsts)
                firsts = s
                first = False
            else:
                encode_int(mq, iads, s - curs - dsoffset)
            curs = s
            if sbstrips > 1:
                encode_int(mq, iait, t - key * sbstrips)
            encode_iaid(mq, iaid, codelen, idx)
            if refine:
                encode_int(mq, iari, 1 if target is not None else 0)
                if target is not None:
                    sb = np.asarray(symbols[idx], np.uint8)
                    tg = np.asarray(target, np.uint8)
                    rdw = tg.shape[1] - sb.shape[1]
                    rdh = tg.shape[0] - sb.shape[0]
                    encode_int(mq, iardw, rdw)
                    encode_int(mq, iardh, rdh)
                    encode_int(mq, iardx2, 0)
                    encode_int(mq, iardy2, 0)
                    side = _SharedRefEncSide(
                        mq, gr_icx, gr_mps, tg, sb,
                        rdw >> 1, rdh >> 1,
                    )
                    _run_refinement(
                        tg.shape[1], tg.shape[0], 0, False, sb,
                        rdw >> 1, rdh >> 1, side, bitmap=tg,
                    )
            curs += adv
            j += 1
        encode_int(mq, iads, _OOB)
    flags = (
        (int(refine) << 1)
        | (log_strips << 2)
        | (refcorner << 4)
        | (int(transposed) << 6)
        | ((dsoffset & 0x1F) << 10)
    )
    rat = b""
    if refine:
        # SBRTEMPLATE 0 (flag bit 15 stays 0): nominal AT pixels
        rat = b"".join(
            struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_REF_AT
        )
    return (
        struct.pack(">IIII", region_w, region_h, 0, 0)
        + bytes([0])  # external combop OR
        + struct.pack(">H", flags)
        + rat
        + struct.pack(">I", len(placements))
        + mq.flush()
    )


# the generous custom text-region tables the Huffman fixtures carry
# (one 1-bit code over [-1024, 1024), plus OOB where the strip loop
# needs it) — parse_table_segment reconstructs the same code
# assignment because preflen-0 lower/upper lines carry no code
_HUFF_FS_LINES = [(1, 11, -1024, "norm")]
_HUFF_DS_LINES = [(1, 11, -1024, "norm"), (1, 0, 0, "oob")]
_HUFF_DT_LINES = [(1, 11, -1024, "norm")]


def encode_symbol_dict_huff(
    symbols: list, collective: str = "mmr"
) -> bytes:
    """Fixture writer (r14): one HUFFMAN symbol-dictionary segment
    body exporting ``symbols`` in order (heights non-decreasing) —
    DH via standard table B.4, DW via B.3 (its lower range covers
    narrowing widths), BMSIZE via B.1; each height class carries a
    COLLECTIVE bitmap, MMR-coded (``collective="mmr"``) or the
    BMSIZE=0 uncompressed raster (``"raw"``)."""
    from timeseries_data_provider_spark.operators import (
        ccitt as _ccitt,
    )

    if collective not in ("mmr", "raw"):
        raise ValueError(f"collective {collective!r}")
    t_dh, t_dw, t_bm = (
        _std_table("B4"), _std_table("B3"), _std_table("B1")
    )
    wr = _BitWriter()
    hcheight = 0
    i = 0
    while i < len(symbols):
        h = symbols[i].shape[0]
        if h < hcheight:
            raise ValueError(
                "encode_symbol_dict_huff: heights must be "
                "non-decreasing"
            )
        t_dh.encode(wr, h - hcheight)
        hcheight = h
        symwidth = 0
        class_syms = []
        while i < len(symbols) and symbols[i].shape[0] == h:
            bm = np.asarray(symbols[i], np.uint8)
            t_dw.encode(wr, bm.shape[1] - symwidth)
            symwidth = bm.shape[1]
            class_syms.append(bm)
            i += 1
        t_dw.encode(wr, _OOB)
        coll = np.hstack(class_syms)
        if collective == "mmr":
            data = _ccitt.encode_g4(coll)
            t_bm.encode(wr, len(data))
            wr.put_bytes(data)
        else:
            t_bm.encode(wr, 0)
            wr.put_bytes(np.packbits(coll, axis=1).tobytes())
    # export flags: run of 0 not-exported, then all, via Table B.1
    t_ex = _std_table("B1")
    t_ex.encode(wr, 0)
    t_ex.encode(wr, len(symbols))
    flags = 1 | (1 << 4)  # SDHUFF, DH = B.4 (0), DW = B.3 (1)
    return (
        struct.pack(">H", flags)
        + struct.pack(">II", len(symbols), len(symbols))
        + wr.done()
    )


def encode_text_region_huff(
    region_w: int,
    region_h: int,
    symbols: list,
    placements: list,
    refcorner: int = 1,
    transposed: bool = False,
    log_strips: int = 0,
    dsoffset: int = 0,
) -> bytes:
    """Fixture writer (r14): one HUFFMAN text-region segment body —
    FS/DS/DT through the fixture's custom tables (emitted alongside
    as type-53 segments by encode_jbig2_text_page), symbol ids
    through equal-length runcode-built SBSYMCODES, CURT as raw
    bits. Mirrors encode_text_region's placement math exactly."""
    t_fs = _HuffTable(_HUFF_FS_LINES)
    t_ds = _HuffTable(_HUFF_DS_LINES)
    t_dt = _HuffTable(_HUFF_DT_LINES)
    sbstrips = 1 << log_strips
    n_syms = len(symbols)
    codelen = max(1, (n_syms - 1).bit_length())
    inst = []
    for idx, row, col in placements:
        hi, wi = symbols[idx].shape
        if not transposed:
            s = col
            t = row if refcorner in (1, 3) else row + hi - 1
            adv = wi - 1
        else:
            s = row
            t = col if refcorner in (0, 1) else col + wi - 1
            adv = hi - 1
        inst.append((t // sbstrips, s, t, idx, adv))
    inst.sort(key=lambda e: (e[0], e[1]))
    wr = _BitWriter()
    lengths = [codelen] * n_syms
    _write_symcode_lengths(wr, lengths)
    wr.align()  # 7.4.3.1.2 step 3
    symtab = _symcode_table(lengths)
    t_dt.encode(wr, 0)  # STRIPT starts at 0
    prev_key = 0
    firsts = 0
    j = 0
    while j < len(inst):
        key = inst[j][0]
        t_dt.encode(wr, key - prev_key)
        prev_key = key
        first = True
        curs = 0
        while j < len(inst) and inst[j][0] == key:
            _, s, t, idx, adv = inst[j]
            if first:
                t_fs.encode(wr, s - firsts)
                firsts = s
                first = False
            else:
                t_ds.encode(wr, s - curs - dsoffset)
            curs = s
            if sbstrips > 1:
                wr.write(t - key * sbstrips, log_strips)
            symtab.encode(wr, idx)
            curs += adv
            j += 1
        t_ds.encode(wr, _OOB)
    flags = (
        1  # SBHUFF
        | (log_strips << 2)
        | (refcorner << 4)
        | (int(transposed) << 6)
        | ((dsoffset & 0x1F) << 10)
    )
    hflags = 3 | (3 << 2) | (3 << 4)  # FS/DS/DT all custom
    return (
        struct.pack(">IIII", region_w, region_h, 0, 0)
        + bytes([0])  # external combop OR
        + struct.pack(">H", flags)
        + struct.pack(">H", hflags)
        + struct.pack(">I", len(placements))
        + wr.done()
    )


def encode_jbig2_text_page(
    page_w: int,
    page_h: int,
    symbols: list,
    placements: list,
    refcorner: int = 1,
    transposed: bool = False,
    log_strips: int = 0,
    dsoffset: int = 0,
    split_dicts: bool = False,
    globals_split: bool = False,
    huffman: bool = False,
    collective: str = "mmr",
):
    """Fixture writer: a full embedded stream — page info + symbol
    dictionary (or two, ``split_dicts``, to exercise multi-dict
    symbol concatenation) + one immediate text region. Symbols are
    height-class-sorted internally; placements index the CALLER's
    symbol order. With ``globals_split`` the dictionaries ride a
    separate JBIG2Globals stream and (globals, page) is returned."""
    syms = [np.asarray(s, np.uint8) for s in symbols]
    order = sorted(range(len(syms)), key=lambda k: syms[k].shape)
    sorted_syms = [syms[k] for k in order]
    remap = {orig: new for new, orig in enumerate(order)}
    places = [(remap[i], r, c) for i, r, c in placements]

    page_info = (
        struct.pack(">IIII", page_w, page_h, 0, 0)
        + bytes([0])
        + struct.pack(">H", 0)
    )
    if huffman:
        # r14 layout: custom FS/DS/DT table segments (1-3), one
        # Huffman symbol dictionary (4), the Huffman text region (5)
        # referring to dict + tables in consumption order
        if split_dicts or globals_split:
            raise ValueError(
                "encode_jbig2_text_page: huffman composes with the "
                "basic single-dict layout only"
            )
        segs = [
            _seg_header(0, 48, 1, page_info),
            _seg_header(
                1, 53, 1, encode_table_segment(_HUFF_FS_LINES)
            ),
            _seg_header(
                2, 53, 1, encode_table_segment(_HUFF_DS_LINES)
            ),
            _seg_header(
                3, 53, 1, encode_table_segment(_HUFF_DT_LINES)
            ),
            _seg_header(
                4, 0, 1,
                encode_symbol_dict_huff(sorted_syms, collective),
            ),
            _seg_header(
                5, 6, 1,
                encode_text_region_huff(
                    page_w, page_h, sorted_syms, places,
                    refcorner, transposed, log_strips, dsoffset,
                ),
                refs=(4, 1, 2, 3),
            ),
        ]
        return b"".join(segs)
    dict_segs = []
    if split_dicts and len(sorted_syms) > 1:
        half = (len(sorted_syms) + 1) // 2
        dict_segs.append(
            _seg_header(
                1, 0, 1, encode_symbol_dict(sorted_syms[:half])
            )
        )
        dict_segs.append(
            _seg_header(
                2, 0, 1, encode_symbol_dict(sorted_syms[half:])
            )
        )
        refs = (1, 2)
        tr_num = 3
    else:
        dict_segs.append(
            _seg_header(1, 0, 1, encode_symbol_dict(sorted_syms))
        )
        refs = (1,)
        tr_num = 2
    tr = _seg_header(
        tr_num,
        6,  # immediate text region
        1,
        encode_text_region(
            page_w, page_h, sorted_syms, places,
            refcorner, transposed, log_strips, dsoffset,
        ),
        refs=refs,
    )
    page_seg = _seg_header(0, 48, 1, page_info)
    if globals_split:
        return b"".join(dict_segs), page_seg + tr
    return page_seg + b"".join(dict_segs) + tr


def encode_jbig2_refined_page(
    base: np.ndarray, final: np.ndarray, template: int = 0,
    tpgron: bool = False, box: tuple | None = None,
) -> bytes:
    """Fixture writer (r15): page info + an immediate lossless
    generic region carrying ``base`` + an immediate refinement
    region (type 42, external op REPLACE) that refines the page
    content under ``box`` (default: the whole page) into
    ``final``."""
    bm0 = np.asarray(base, np.uint8)
    bm1 = np.asarray(final, np.uint8)
    h, w = bm0.shape
    if bm1.shape != bm0.shape:
        raise ValueError("encode_jbig2_refined_page: shape mismatch")
    x0, y0, bw, bh = (0, 0, w, h) if box is None else box
    body = encode_refinement_region(
        bm1[y0 : y0 + bh, x0 : x0 + bw],
        np.ascontiguousarray(bm0[y0 : y0 + bh, x0 : x0 + bw]),
        0, 0, template, tpgron,
    )
    rflags = template | (2 if tpgron else 0)
    rat = b""
    if template == 0:
        rat = b"".join(
            struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_REF_AT
        )
    refinement = (
        struct.pack(">IIII", bw, bh, x0, y0)
        + bytes([4])  # external combop REPLACE (conforming for
                      # page refinement)
        + bytes([rflags])
        + rat
        + body
    )
    gbody = encode_generic_region(bm0, 0, False)
    gat = b"".join(
        struct.pack("bb", ax, ay) for ax, ay in _NOMINAL_AT[0]
    )
    region = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([0]) + bytes([0]) + gat + gbody
    )
    page_info = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([0])
        + struct.pack(">H", 0)
    )
    return (
        _seg_header(0, 48, 1, page_info)
        + _seg_header(1, 39, 1, region)
        + _seg_header(2, 42, 1, refinement, refs=(1,))
    )


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

    page_info = (
        struct.pack(">IIII", w, h, 0, 0)
        + bytes([0])  # flags: default pixel 0, no overrides
        + struct.pack(">H", 0)
    )
    return _seg_header(0, 48, 1, page_info) + _seg_header(
        1, 39, 1, region  # immediate lossless generic region
    )
