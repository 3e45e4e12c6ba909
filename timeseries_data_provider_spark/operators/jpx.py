"""[EXT] JPEG 2000 (JPX) decoder — lossless 5/3 codestream subset,
pure Python/numpy, built on the SAME ITU-T T.88 MQ arithmetic coder
the JBIG2 tier uses (T.800 reuses it verbatim; operators/jbig2).

Why this exists: JPX is the archive.org-class book-scan default and
the highest-residual-frequency PDF image gap after JBIG2 (VERDICT
r12 item 6; SURVEY.md names it). The subset implemented here is the
shape a *lossless scan* actually uses, end to end:

- JP2 box container walk (``jp2c`` carries the codestream) or a
  bare codestream;
- SIZ: single-tile or tile grids whose dims are multiples of
  2^levels (r14 — exactly the grids where tile-local subband
  geometry provably equals T.800's canvas-anchored geometry; other
  grids stay named), 1 or 3 components, 8-bit unsigned, no
  subsampling; MULTIPLE TILE-PARTS per tile concatenate in TPsot
  order (r14, A.4.2);
- COD: all five progression orders (maximal precincts make the
  position dimension a singleton), 1..64 quality layers, 0..6
  decomposition
  levels, maximal precincts (the default), code-blocks to 64x64,
  reversible 5/3 OR irreversible 9/7 wavelets, optional RCT/ICT
  component transforms, optional SOP/EPH marker framing;
- QCD: no-quantization (reversible) signalling, guard bits +
  exponents feeding the bit-plane count;
- Tier-2: packet headers with inclusion/zero-bitplane TAG TREES,
  coding-pass codewords, Lblock length signalling, and the FF
  bit-stuffing rule;
- Tier-1: the full EBCOT context modeller — significance
  propagation / magnitude refinement / cleanup passes, orientation-
  dependent zero-coding contexts, sign contexts with XOR, run-length
  + UNIFORM contexts — driving the shared MQ coder; the COD coder
  options real encoders emit decode as of r14 (VERDICT item 1c):
  arithmetic BYPASS (raw SP/MR from the 5th plane, D.6, with the
  packet header's per-codeword-segment length fields, B.10.7.2),
  per-pass RESET, per-pass termination, VERTICALLY CAUSAL contexts
  (stripe-floor masking, D.7), and segmentation symbols (verified
  on decode — desync is loud); predictable termination (0x10)
  decodes as plain termination (its flush pattern is an optional
  error-detection aid this decoder does not verify — stated);
- inverse 5/3 lifting with symmetric extension across all levels,
  inverse RCT, DC level shift.

The 9/7 IRREVERSIBLE path (r13 late — the real-world lossy
default: OpenJPEG/Kakadu emit single-tile single-layer LRCP 9/7)
shares the whole Tier-1/2 machinery and adds float lifting, the
expounded scalar quantizer (QCD style 2, (eps, mantissa)-coded
deltas), and the irreversible color transform; see the 9/7 section
for the stated normalization posture. MULTIPLE QUALITY LAYERS
decode as of r13 late (per-codeblock tag-tree/Lblock/pass state
persists across the LRCP layer walk, chunks concatenate, and
Tier-1 runs with the summed pass budget — so truncated layered
streams, the essence of quality scalability, reconstruct
correctly). Informational pointer segments (TLM/PLM/PLT, COM) are
skipped per A.7 (r14 — a decoder may ignore them; Kakadu-class
encoders emit TLM by default). IMAGE/TILE GRID OFFSETS
(XOsiz/YOsiz/XTOsiz/YTOsiz — cropped/extracted codestreams) decode
as of r15 where per-component tile origins are multiples of
2^levels AND land on the codeblock partition (B.7 anchors blocks
at canvas 0; the same condition now guards zero-offset tilings
whose scaled origins straddle a block boundary — previously a
silent tile-local/conforming divergence). EXPLICIT PRECINCTS
(Scod bit 0 + per-resolution PPx/PPy — the Kakadu Cprecincts
archival form) decode as of r15 on the single-tile zero-offset
unsubsampled envelope: per-precinct packets and tag trees,
codeblocks clamped to the precinct, LRCP/RLCP/RPCL position
iteration. Named NotImplementedError gaps (quarantine, never
garbage — this list IS the raise-site ladder): tile dims/origins
off the 2^levels or codeblock grid, COC/QCC/RGN/POC/PPM/PPT
markers, precincts composed with tiling/offsets/subsampling or
PCRL/CPRL subdivision, sub-8-bit or signed or mixed-depth
components (8..16-bit unsigned decode as of r14, >8-bit
downconverting >>(depth-8), the TIFF rule), subsampled LUMA or
subsampled-with-tiling or RCT-over-subsampled forms (CHROMA
subsampling — 4:2:0/4:2:2, the camera JP2 form — decodes as of r14
late with nearest upsampling before the ICT, a stated
approximation), >3 or 2-component images, per-tile wavelet/MCT
overrides (other per-tile COD/QCD overrides decode as of r14),
JPP/JPT streams. QCD style 1 (scalar derived, E-5) decodes as of
r14.

Validation posture, stated: no independent JPEG 2000 implementation
exists in this container (the JDK has none). As of r14 the two
layers that CAN be second-writer-checked are: the MQ coder is pinned
BYTE-EXACT in both directions to the T.88 spec's own Annex H.2
worked test sequence (tests/test_jbig2.py), and the Tier-2 layout +
EBCOT context-decision order are pinned by HAND-ASSEMBLED
codestreams laid out from T.800's own tables with hand-derived
decision sequences (tests/test_jpx_handbuilt.py — the
test_cfb_handbuilt posture). The remainder (DWT normalization at
9/7, the wider Tier-1 state machine) stays encoder/decoder
round-trip over the in-repo fixture writer plus hand-checked spec
mechanics (tag-tree vectors, packet-header bit layouts, DWT
round-trips at every size/level combination). The decoder is
additionally exercised against hostile/truncated streams and
mutation fuzz for the loud-error contract.

Public-knowledge basis: ITU-T T.800 / ISO/IEC 15444-1 (public).
Reference parity: index.js has no media surface; [EXT] SURVEY §2
(VERDICT r12 next-round item 6).
"""

from __future__ import annotations

import struct

import numpy as np

from .jbig2 import MQDecoder, MQEncoder

__all__ = ["decode_jpx", "encode_jpx", "MAX_PIXELS"]

MAX_PIXELS = 64 * 1024 * 1024


# ---------------------------------------------------------------------------
# tag trees (T.800 B.10.2)


class _TagTreeDec:
    def __init__(self, w: int, h: int):
        self.levels = []
        while True:
            self.levels.append(
                (w, h, np.zeros((h, w), np.int32),
                 np.zeros((h, w), bool))
            )
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        # levels[0] = leaves .. levels[-1] = root

    def decode(self, rd, x: int, y: int, threshold: int) -> int:
        """Decode the leaf value with the standard coupled walk; stops
        early (returning >= threshold) when the value is known to be
        at least ``threshold``."""
        stack = []
        lx, ly = x, y
        for lw, lh, _vals, _done in self.levels:
            stack.append((lx, ly))
            lx, ly = lx // 2, ly // 2
        low = 0
        for li in range(len(self.levels) - 1, -1, -1):
            _lw, _lh, vals, done = self.levels[li]
            cx, cy = stack[li]
            if vals[cy, cx] < low:
                vals[cy, cx] = low
            while not done[cy, cx]:
                if vals[cy, cx] >= threshold:
                    return int(vals[cy, cx])
                if rd.bit():
                    done[cy, cx] = True
                else:
                    vals[cy, cx] += 1
            low = int(vals[cy, cx])
        return low


class _TagTreeEnc:
    def __init__(self, w: int, h: int, leaf_vals: np.ndarray):
        self.levels = []
        vals = leaf_vals.astype(np.int32)
        w0, h0 = w, h
        cur = vals
        while True:
            self.levels.append(
                [w0, h0, cur, np.zeros((h0, w0), np.int32),
                 np.zeros((h0, w0), bool)]
            )
            if w0 == 1 and h0 == 1:
                break
            nw, nh = (w0 + 1) // 2, (h0 + 1) // 2
            nxt = np.full((nh, nw), 2**30, np.int32)
            for yy in range(h0):
                for xx in range(w0):
                    nxt[yy // 2, xx // 2] = min(
                        nxt[yy // 2, xx // 2], cur[yy, xx]
                    )
            cur = nxt
            w0, h0 = nw, nh

    def encode(self, wr, x: int, y: int, threshold: int) -> None:
        stack = []
        lx, ly = x, y
        for lv in self.levels:
            stack.append((lx, ly))
            lx, ly = lx // 2, ly // 2
        low = 0
        for li in range(len(self.levels) - 1, -1, -1):
            _w, _h, true_vals, emitted, done = self.levels[li]
            cx, cy = stack[li]
            if emitted[cy, cx] < low:
                emitted[cy, cx] = low
            while not done[cy, cx]:
                if emitted[cy, cx] >= threshold:
                    break
                if emitted[cy, cx] == true_vals[cy, cx]:
                    wr.bit(1)
                    done[cy, cx] = True
                else:
                    wr.bit(0)
                    emitted[cy, cx] += 1
            low = max(low, int(min(emitted[cy, cx],
                                   true_vals[cy, cx])))


# ---------------------------------------------------------------------------
# packet-header bit IO with the FF stuffing rule (B.10.1)


class _HdrReader:
    def __init__(self, data: bytes, at: int = 0,
                 limit: int | None = None):
        self.d = data
        self.at = at
        self.limit = len(data) if limit is None else limit
        self.bits = 0
        self.n = 0
        self.prev_ff = False

    def bit(self) -> int:
        if self.n == 0:
            if self.at >= self.limit:
                raise ValueError("jpx: packet header truncated")
            b = self.d[self.at]
            self.at += 1
            if self.prev_ff:
                if b & 0x80:
                    raise ValueError("jpx: invalid header stuffing")
                self.n = 7
            else:
                self.n = 8
            self.prev_ff = b == 0xFF
            self.bits = b
        self.n -= 1
        return (self.bits >> self.n) & 1

    def read(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit()
        return v

    def align(self) -> int:
        """Finish the header: skip to the byte boundary (a pending
        FF forces one stuffed 0 bit first per B.10.1)."""
        if self.prev_ff and self.n == 0:
            # stuffing bit lives in the NEXT byte; consume it
            self.bit()
        self.n = 0
        self.prev_ff = False
        return self.at


class _HdrWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def _room(self) -> int:
        return 7 if self.out and self.out[-1] == 0xFF else 8

    def bit(self, b: int) -> None:
        room = self._room()
        self.cur = (self.cur << 1) | (b & 1)
        self.n += 1
        if self.n == room:
            self.out.append(self.cur)
            self.cur = 0
            self.n = 0

    def write(self, v: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.bit((v >> i) & 1)

    def finish(self) -> bytes:
        while self.n:
            self.bit(0)
        if self.out and self.out[-1] == 0xFF:
            self.out.append(0)  # trailing stuffing byte
        return bytes(self.out)


# ---------------------------------------------------------------------------
# EBCOT Tier-1 (T.800 Annex D) — shared context tables

# zero-coding context from (sum_h, sum_v, sum_d), per orientation
def _zc_tables():
    ll = np.zeros((3, 3, 5), np.int8)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                if h == 2:
                    c = 8
                elif h == 1:
                    c = 7 if v >= 1 else (6 if d >= 1 else 5)
                elif v == 2:
                    c = 4
                elif v == 1:
                    c = 3
                elif d >= 2:
                    c = 2
                elif d == 1:
                    c = 1
                else:
                    c = 0
                ll[h, v, d] = c
    hl = np.transpose(ll, (1, 0, 2)).copy()  # H and V swapped
    hh = np.zeros((3, 3, 5), np.int8)
    for h in range(3):
        for v in range(3):
            for d in range(5):
                hv = h + v
                if d >= 3:
                    c = 8
                elif d == 2:
                    c = 7 if hv >= 1 else 6
                elif d == 1:
                    c = 5 if hv >= 2 else (4 if hv == 1 else 3)
                else:
                    c = 2 if hv >= 2 else (1 if hv == 1 else 0)
                hh[h, v, d] = c
    return {"LL": ll, "LH": ll, "HL": hl, "HH": hh}


_ZC = _zc_tables()

# sign-coding: (h_contrib+1, v_contrib+1) -> (context, xor_bit)
_SC = {
    (2, 2): (13, 0), (2, 1): (12, 0), (2, 0): (11, 0),
    (1, 2): (10, 0), (1, 1): (9, 0), (1, 0): (10, 1),
    (0, 2): (11, 1), (0, 1): (12, 1), (0, 0): (13, 1),
}
_CX_RL = 17
_CX_UNI = 18
_N_CTX = 19


def _fresh_ctx():
    icx = bytearray(_N_CTX)
    mps = bytearray(_N_CTX)
    # T.800 D.2: initial states — UNIFORM at 46, RL at 3, ZC[0] at 4
    icx[0] = 4
    icx[_CX_RL] = 3
    icx[_CX_UNI] = 46
    return icx, mps


# flat-list mirrors of the context tables for fast scalar indexing
# (numpy scalar reads dominate a per-coefficient walk): ZC indexed
# (hsum*3 + vsum)*5 + dsum, SC indexed (hc+1)*3 + (vc+1)
_ZC_FLAT = {k: tuple(int(x) for x in v.reshape(-1))
            for k, v in _ZC.items()}
_SC_FLAT = tuple(
    _SC[(hc1, vc1)] for hc1 in range(3) for vc1 in range(3)
)


class _Block:
    """Shared Tier-1 state for one codeblock: significance map,
    magnitudes, signs, 'visited in this bitplane' flags. State lives
    in flat Python lists (padded (h+2) x (w+2) for sig/sgn) — the
    per-coefficient pass walks index them ~10x per visit, and plain
    list reads are several times cheaper than numpy scalar reads."""

    def __init__(self, h: int, w: int, orient: str):
        self.h, self.w = h, w
        self.w2 = w + 2
        self.zc = _ZC_FLAT[orient]
        self.orient = orient
        self.sig = [0] * ((h + 2) * (w + 2))  # padded, flat
        self.sgn = [0] * ((h + 2) * (w + 2))  # -1/0/+1, padded, flat
        self.mag = [0] * (h * w)
        self.visited = bytearray(h * w)
        self.refined = bytearray(h * w)
        # vertically-causal mode (r14, D.7): rows at/below this
        # floor are invisible to context formation; _t1_passes sets
        # it to the current stripe's bottom when the option is on
        self.floor = 1 << 30

    def zc_ctx(self, y: int, x: int) -> int:
        s = self.sig
        w2 = self.w2
        p = (y + 1) * w2 + (x + 1)
        hsum = s[p - 1] + s[p + 1]
        if y + 1 < self.floor:  # vertically-causal mask
            vsum = s[p - w2] + s[p + w2]
            dsum = (s[p - w2 - 1] + s[p - w2 + 1]
                    + s[p + w2 - 1] + s[p + w2 + 1])
        else:
            vsum = s[p - w2]
            dsum = s[p - w2 - 1] + s[p - w2 + 1]
        return self.zc[(hsum * 3 + vsum) * 5 + dsum]

    def sc_ctx(self, y: int, x: int):
        g = self.sgn
        w2 = self.w2
        p = (y + 1) * w2 + (x + 1)
        hc = g[p - 1] + g[p + 1]
        vc = g[p - w2] + (
            g[p + w2] if y + 1 < self.floor else 0
        )
        hc = -1 if hc < -1 else (1 if hc > 1 else hc)
        vc = -1 if vc < -1 else (1 if vc > 1 else vc)
        return _SC_FLAT[(hc + 1) * 3 + (vc + 1)]

    def mr_ctx(self, y: int, x: int) -> int:
        if self.refined[y * self.w + x]:
            return 16
        s = self.sig
        w2 = self.w2
        p = (y + 1) * w2 + (x + 1)
        any_n = (
            s[p - 1] + s[p + 1] + s[p - w2]
            + s[p - w2 - 1] + s[p - w2 + 1]
        )
        if y + 1 < self.floor:
            any_n += s[p + w2] + s[p + w2 - 1] + s[p + w2 + 1]
        return 15 if any_n else 14

    def prefer(self, y: int, x: int) -> bool:
        return self.zc_ctx(y, x) != 0 if self.orient != "HH" else (
            self.zc_ctx(y, x) != 0
        )


def _t1_passes(blk: _Block, plane: int, mq, icx, mps, encode: bool,
               get_bit=None, get_sign=None,
               which=("SP", "MR", "CU"), raw: bool = False,
               segmark: bool = False, causal: bool = False):
    """Run the three coding passes of one bit-plane over a codeblock
    in both directions: when ``encode`` the callbacks read the truth
    (magnitude bit / sign) and the MQ encoder writes; otherwise the
    MQ decoder drives and the block state is updated. The column-
    strip scan order (4-high strips, column-major inside) and the
    pass-membership rules are identical by construction — one body,
    two directions, so the two sides cannot disagree on mechanics.

    ``raw`` (r14 — the BYPASS coder option, T.800 D.6): ``mq`` is a
    raw bit engine (_HdrWriter / _HdrReader — raw coding uses the
    same FF-stuffing rule as packet headers) and significance/sign/
    refinement bits are coded context-free, the sign directly
    (0 = positive, no XOR). Only SP/MR passes can be raw. ``segmark``
    appends the 1010 segmentation symbol on the UNIFORM context at
    the end of every cleanup pass and the decode side verifies it."""
    h, w = blk.h, blk.w
    bit_val = 1 << plane
    sig, sgn, mag = blk.sig, blk.sgn, blk.mag
    visited = blk.visited
    w2 = blk.w2

    def code(cx, truth):
        if raw:
            if encode:
                mq.bit(truth)
                return truth
            return mq.bit()
        if encode:
            mq.encode(icx, mps, cx, truth)
            return truth
        return mq.decode(icx, mps, cx)

    def sig_code(y, x):
        """Significance + sign coding for (y, x) in this plane."""
        cx = blk.zc_ctx(y, x)
        truth = 0
        if encode:
            truth = 1 if get_bit(y, x, plane) else 0
        became = code(cx, truth)
        if became:
            if raw:
                sgn_truth = (
                    (0 if get_sign(y, x) > 0 else 1) if encode else 0
                )
                neg = code(None, sgn_truth) == 1
            else:
                scx, xor = blk.sc_ctx(y, x)
                if encode:
                    sgn_truth = (0 if get_sign(y, x) > 0 else 1) ^ xor
                else:
                    sgn_truth = 0
                sbit = code(scx, sgn_truth)
                neg = (sbit ^ xor) == 1
            p = (y + 1) * w2 + (x + 1)
            sig[p] = 1
            sgn[p] = -1 if neg else 1
            mag[y * w + x] = bit_val
        return became

    # pass 1: significance propagation
    for y0 in (range(0, h, 4) if "SP" in which else ()):
        blk.floor = y0 + 4 if causal else 1 << 30
        y1 = min(y0 + 4, h)
        for x in range(w):
            p = (y0 + 1) * w2 + (x + 1)
            q = y0 * w + x
            for y in range(y0, y1):
                if not sig[p] and (
                    sig[p - 1] or sig[p + 1] or sig[p - w2]
                    or sig[p + w2] or sig[p - w2 - 1]
                    or sig[p - w2 + 1] or sig[p + w2 - 1]
                    or sig[p + w2 + 1]
                ) and blk.zc_ctx(y, x) != 0:
                    sig_code(y, x)
                    visited[q] = 1
                p += w2
                q += w

    # pass 2: magnitude refinement
    for y0 in (range(0, h, 4) if "MR" in which else ()):
        blk.floor = y0 + 4 if causal else 1 << 30
        y1 = min(y0 + 4, h)
        for x in range(w):
            p = (y0 + 1) * w2 + (x + 1)
            q = y0 * w + x
            for y in range(y0, y1):
                if sig[p] and not visited[q] and mag[q] != bit_val:
                    cx = blk.mr_ctx(y, x)
                    truth = (
                        1 if (encode and get_bit(y, x, plane)) else 0
                    )
                    b = code(cx, truth)
                    if b:
                        mag[q] |= bit_val
                    blk.refined[q] = 1
                    visited[q] = 1
                p += w2
                q += w

    # pass 3: cleanup (with run-length shortcut)
    for y0 in (range(0, h, 4) if "CU" in which else ()):
        blk.floor = y0 + 4 if causal else 1 << 30
        strip_h = min(4, h - y0)
        for x in range(w):
            y = y0
            # run-length mode: whole 4-strip insignificant with all
            # zero contexts and nothing visited
            if (
                strip_h == 4
                and not any(
                    sig[(y0 + k + 1) * w2 + (x + 1)]
                    or visited[(y0 + k) * w + x]
                    for k in range(4)
                )
                and all(
                    blk.zc_ctx(y0 + k, x) == 0 for k in range(4)
                )
            ):
                if encode:
                    first = next(
                        (
                            k
                            for k in range(4)
                            if get_bit(y0 + k, x, plane)
                        ),
                        None,
                    )
                    any_sig = first is not None
                else:
                    first = None
                    any_sig = False
                got = code(_CX_RL, 1 if any_sig else 0)
                if not got:
                    continue
                if encode:
                    pos = first
                else:
                    pos = 0
                hi = code(_CX_UNI, (pos >> 1) & 1 if encode else 0)
                lo = code(_CX_UNI, pos & 1 if encode else 0)
                pos = (hi << 1) | lo
                yy = y0 + pos
                # the run-terminating coefficient codes only its sign
                scx, xor = blk.sc_ctx(yy, x)
                sgn_truth = (
                    (0 if get_sign(yy, x) > 0 else 1) ^ xor
                    if encode
                    else 0
                )
                sbit = code(scx, sgn_truth)
                neg = (sbit ^ xor) == 1
                p = (yy + 1) * w2 + (x + 1)
                sig[p] = 1
                sgn[p] = -1 if neg else 1
                mag[yy * w + x] = bit_val
                y = yy + 1
            for y in range(y, y0 + strip_h):
                if visited[y * w + x] or sig[(y + 1) * w2 + (x + 1)]:
                    continue
                sig_code(y, x)
    if "CU" in which:
        if segmark:
            # segmentation symbol (D.5): 1010 on the UNIFORM context
            # closes every cleanup pass; a mismatch on decode means
            # the bit budget desynced — loud, never garbage
            for want in (1, 0, 1, 0):
                got = code(_CX_UNI, want)
                if not encode and got != want:
                    raise ValueError(
                        "jpx: segmentation symbol mismatch"
                    )
        # the plane is complete: clear the membership marks (when a
        # truncated block never reaches its cleanup pass nothing
        # after it reads them, so per-pass invocation stays correct)
        visited[:] = bytes(len(visited))


def _pass_plan(n_planes: int, cb_style: int):
    """Per-pass coding plan for one codeblock under the COD
    codeblock-style options (r14 — T.800 D.3.5 bypass, D.4
    per-pass termination): a list of (kind, plane, raw, seg_idx) in
    coding order. ``raw`` marks the arithmetic-coder-BYPASS passes
    (SP/MR from the 5th most-significant plane on); ``seg_idx`` is
    the terminated-codeword-segment numbering that the packet
    header's length fields follow (B.10.7.2) — segments end after
    every pass under per-pass termination, at every MQ<->raw mode
    switch under bypass, and only at the block end otherwise."""
    bypass = bool(cb_style & 0x01)
    term_each = bool(cb_style & 0x04)
    plan = []
    for k in range(n_planes):  # k = plane index from the MSB
        plane = n_planes - 1 - k
        kinds = ("CU",) if k == 0 else ("SP", "MR", "CU")
        for kind in kinds:
            raw = bypass and k >= 4 and kind != "CU"
            plan.append([kind, plane, raw, 0])
    seg = 0
    for i, ent in enumerate(plan):
        ent[3] = seg
        if term_each:
            seg += 1
        elif bypass and i + 1 < len(plan) and plan[i + 1][2] != ent[2]:
            seg += 1
    return [tuple(e) for e in plan]


def _seg_pass_bounds(plan) -> list[int]:
    """Pass-count boundaries where a codeword segment ends (the only
    valid quality-layer split points once coder options are on)."""
    return [
        i + 1
        for i, ent in enumerate(plan)
        if i + 1 == len(plan) or plan[i + 1][3] != ent[3]
    ]


def _decode_codeblock(
    segs: list[bytes], h: int, w: int, orient: str, n_planes: int,
    n_passes: int | None = None, cb_style: int = 0,
) -> np.ndarray:
    """Tier-1 decode of one codeblock into signed ints. ``segs`` is
    the per-codeword-segment byte list (a single concatenated
    segment when no coder options are on). ``n_passes`` bounds the
    coding passes actually run (r13 late — quality-layer
    TRUNCATION: a layered lossy stream may stop a codeblock
    mid-plane; the pass budget is the per-layer counts summed by
    the packet parser). None = all 3*n_planes - 2."""
    if isinstance(segs, (bytes, bytearray)):
        segs = [segs]  # the single-segment (no coder options) form
    plan = _pass_plan(n_planes, cb_style)
    reset = bool(cb_style & 0x02)
    segmark = bool(cb_style & 0x20)
    causal = bool(cb_style & 0x08)
    icx, mps = _fresh_ctx()
    blk = _Block(h, w, orient)
    budget = 3 * n_planes - 2 if n_passes is None else n_passes
    eng = None
    cur_seg = -1
    for kind, plane, raw, seg_idx in plan:
        if budget <= 0:
            break
        if seg_idx != cur_seg:
            data = bytes(segs[seg_idx]) if seg_idx < len(segs) else b""
            eng = _HdrReader(data) if raw else MQDecoder(data)
            cur_seg = seg_idx
        if reset:
            f_icx, f_mps = _fresh_ctx()
            icx[:] = f_icx
            mps[:] = f_mps
        _t1_passes(
            blk, plane, eng, icx, mps, encode=False, which=(kind,),
            raw=raw, segmark=segmark, causal=causal,
        )
        budget -= 1
    mag = np.array(blk.mag, np.int64).reshape(h, w)
    sgn = np.array(blk.sgn, np.int8).reshape(h + 2, w + 2)[1:-1, 1:-1]
    return mag * np.where(sgn < 0, -1, 1).astype(np.int64)


def _encode_codeblock(
    coeffs: np.ndarray, orient: str, n_planes: int,
    want_marks: bool = False, cb_style: int = 0,
):
    """Tier-1 encode; returns the concatenated codeword bytes, or
    with ``want_marks`` the tuple (bytes, per-pass byte watermarks,
    per-segment byte-end offsets). Without coder options the
    watermarks are valid split points at ANY pass (the decoder
    concatenates every layer's chunks before running Tier-1, so a
    split needs no per-pass MQ termination); with coder options on,
    layer splits must land on segment ends (the byte-end list)."""
    plan = _pass_plan(n_planes, cb_style)
    reset = bool(cb_style & 0x02)
    segmark = bool(cb_style & 0x20)
    causal = bool(cb_style & 0x08)
    icx, mps = _fresh_ctx()
    h, w = coeffs.shape
    blk = _Block(h, w, orient)
    mags = np.abs(coeffs.astype(np.int64)).tolist()
    signs_nonneg = (coeffs >= 0).tolist()

    def get_bit(y, x, plane):
        return (mags[y][x] >> plane) & 1

    def get_sign(y, x):
        return 1 if signs_nonneg[y][x] else -1

    marks = []
    seg_byte_ends = []
    done = bytearray()
    eng = None
    cur_seg = -1
    cur_raw = False

    def _finish_current():
        nonlocal eng
        if eng is not None:
            done.extend(eng.finish() if cur_raw else eng.flush())
            seg_byte_ends.append(len(done))
            eng = None

    for kind, plane, raw, seg_idx in plan:
        if seg_idx != cur_seg:
            _finish_current()
            eng = _HdrWriter() if raw else MQEncoder()
            cur_seg, cur_raw = seg_idx, raw
        if reset:
            f_icx, f_mps = _fresh_ctx()
            icx[:] = f_icx
            mps[:] = f_mps
        _t1_passes(
            blk, plane, eng, icx, mps, encode=True,
            get_bit=get_bit, get_sign=get_sign, which=(kind,),
            raw=raw, segmark=segmark, causal=causal,
        )
        marks.append(len(done) + len(eng.out))
    _finish_current()
    data = bytes(done)
    if want_marks:
        marks = [min(m, len(data)) for m in marks]
        marks[-1] = len(data)
        return data, marks, seg_byte_ends
    return data


# ---------------------------------------------------------------------------
# 5/3 reversible DWT (T.800 Annex F), whole-sample symmetric extension


def _fdwt53(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched 5/3 analysis along the LAST axis (whole-sample
    symmetric extension). Each 1-D lifting step is elementwise over
    the opposite-parity samples, so a 2-D batch of rows vectorizes
    exactly: high[i] = x[2i+1] - ((x[2i] + x[2i+2]) >> 1),
    low[i] = x[2i] + ((h[i-1] + h[i] + 2) >> 2), with the extension
    folded into clipped neighbor indices (h(-1)=h(0), h(nh)=h(nh-1);
    x(n)=x(n-2) when n is even)."""
    x = np.asarray(x, np.int64)
    n = x.shape[-1]
    e = x[..., 0::2]
    o = x[..., 1::2]
    nl, nh = e.shape[-1], o.shape[-1]
    if nh == 0:
        return e.copy(), o.copy()
    if n % 2 == 0:
        e_next = np.concatenate([e[..., 1:], e[..., -1:]], axis=-1)
    else:
        e_next = e[..., 1:]
    high = o - ((e[..., :nh] + e_next) >> 1)
    idx1 = np.clip(np.arange(nl) - 1, 0, nh - 1)
    idx2 = np.clip(np.arange(nl), 0, nh - 1)
    low = e + ((high[..., idx1] + high[..., idx2] + 2) >> 2)
    return low, high


def _idwt53(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Batched 5/3 synthesis along the LAST axis — the exact inverse
    of _fdwt53 (same clipped-index extension)."""
    low = np.asarray(low, np.int64)
    high = np.asarray(high, np.int64)
    nl, nh = low.shape[-1], high.shape[-1]
    n = nl + nh
    if nh == 0:
        return low.copy()
    idx1 = np.clip(np.arange(nl) - 1, 0, nh - 1)
    idx2 = np.clip(np.arange(nl), 0, nh - 1)
    even = low - ((high[..., idx1] + high[..., idx2] + 2) >> 2)
    if n % 2 == 0:
        even_next = np.concatenate(
            [even[..., 1:], even[..., -1:]], axis=-1
        )
    else:
        even_next = even[..., 1:]
    odd = high + ((even[..., :nh] + even_next) >> 1)
    out = np.empty(low.shape[:-1] + (n,), np.int64)
    out[..., 0::2] = even
    out[..., 1::2] = odd
    return out


def _idwt53_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    return _idwt53(np.asarray(low), np.asarray(high))


def _fdwt53_1d(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return _fdwt53(np.asarray(x))


def _fdwt53_2d(a: np.ndarray):
    """One level: returns (LL, LH, HL, HH) — LH is the horizontally
    high-pass band of the LOW rows (the _idwt53_2d naming note)."""
    lo_cols, hi_cols = _fdwt53(np.asarray(a, np.int64).T)
    lo_cols, hi_cols = lo_cols.T, hi_cols.T
    ll, lh = _fdwt53(lo_cols)
    hl, hh = _fdwt53(hi_cols)
    return ll, lh, hl, hh


def _idwt53_2d(ll, lh, hl, hh):
    # NOTE naming: lh here = horizontally high-pass of the LOW row
    # band (matches _fdwt53_2d's outputs)
    rows_l = _idwt53(ll, lh)
    rows_h = _idwt53(hl, hh)
    return _idwt53(rows_l.T, rows_h.T).T


# ---------------------------------------------------------------------------
# codestream (T.800 Annex A markers, B packets)

_GAIN = {"LL": 0, "HL": 1, "LH": 1, "HH": 2}


def _precinct_geometry(w: int, h: int, levels: int, precincts,
                       cbw: int, cbh: int) -> list:
    """Per-resolution precinct/codeblock geometry for one zero-
    anchored tile-component (r15, T.800 B.6/B.7): a list indexed by
    resolution r of dicts {npx, npy, pbw, pbh, cbw, cbh} — npx/npy
    the precinct counts over the resolution-r grid, pbw/pbh the
    precinct dims IN BAND coordinates (half the resolution-grid
    size above r = 0), and cbw/cbh the EFFECTIVE codeblock dims
    (clamped to the precinct per B.7). ``precincts`` is the COD
    per-resolution (PPx, PPy) list, or None for the spec default
    (15, 15) — under which every realistic band is one precinct and
    the geometry degenerates to the pre-precinct walk."""
    dims = [(w, h)]
    for _ in range(levels):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    out = []
    for r in range(levels + 1):
        rw, rh = dims[levels - r]
        ppx, ppy = (15, 15) if precincts is None else precincts[r]
        shift = 1 if r else 0
        pbw = 1 << max(ppx - shift, 0)
        pbh = 1 << max(ppy - shift, 0)
        out.append({
            "npx": max(1, -(-rw // (1 << ppx))),
            "npy": max(1, -(-rh // (1 << ppy))),
            "pbw": pbw,
            "pbh": pbh,
            "cbw": min(cbw, pbw),
            "cbh": min(cbh, pbh),
        })
    return out


def _packet_order(prog: int, layers: int, n_res: int, n_comp: int,
                  n_prec: list | None = None):
    """Packet iteration order for the five T.800 progressions
    (B.12), the position dimension iterating precincts in raster
    order within each resolution (r15). ``n_prec[r]`` is the
    precinct count at resolution r (all components share it — the
    precinct envelope excludes subsampling); default singleton.
    PCRL/CPRL interleave positions ACROSS resolutions by sample
    coordinates, so they stay named when any resolution has more
    than one precinct. The persistent-state packet walk is
    order-agnostic as long as a block's layers arrive in ascending
    order within its (resolution, component, precinct) — true for
    every progression (L is ascending in all five)."""
    if n_prec is None:
        n_prec = [1] * n_res
    if prog == 0:  # LRCP
        return [
            (layer, r, ci, p)
            for layer in range(layers)
            for r in range(n_res)
            for ci in range(n_comp)
            for p in range(n_prec[r])
        ]
    if prog == 1:  # RLCP
        return [
            (layer, r, ci, p)
            for r in range(n_res)
            for layer in range(layers)
            for ci in range(n_comp)
            for p in range(n_prec[r])
        ]
    if prog == 2:  # RPCL
        return [
            (layer, r, ci, p)
            for r in range(n_res)
            for p in range(n_prec[r])
            for ci in range(n_comp)
            for layer in range(layers)
        ]
    if any(n > 1 for n in n_prec):
        raise NotImplementedError(
            "jpx: PCRL/CPRL with explicit sub-band-size precincts "
            "(position interleaves across resolutions)"
        )
    if prog == 3:  # PCRL (position singleton)
        return [
            (layer, r, ci, 0)
            for ci in range(n_comp)
            for r in range(n_res)
            for layer in range(layers)
        ]
    # prog == 4: CPRL
    return [
        (layer, r, ci, 0)
        for ci in range(n_comp)
        for r in range(n_res)
        for layer in range(layers)
    ]


def _npasses_write(wr: _HdrWriter, n: int) -> None:
    if n == 1:
        wr.bit(0)
    elif n == 2:
        wr.bit(1)
        wr.bit(0)
    elif n <= 5:
        wr.write(0b11, 2)
        wr.write(n - 3, 2)
    elif n <= 36:
        wr.write(0b1111, 4)
        wr.write(n - 6, 5)
    elif n <= 164:
        wr.write(0b111111111, 9)
        wr.write(n - 37, 7)
    else:
        raise ValueError(f"jpx: {n} coding passes")


def _npasses_read(rd: _HdrReader) -> int:
    if not rd.bit():
        return 1
    if not rd.bit():
        return 2
    v = rd.read(2)
    if v < 3:
        return 3 + v
    v = rd.read(5)
    if v < 31:
        return 6 + v
    return 37 + rd.read(7)


def _band_sizes(w: int, h: int, levels: int):
    """Per-resolution subband dims: returns (ll_w, ll_h at res 0,
    [(res, band, w, h), ...] for res 1..levels)."""
    dims = [(w, h)]
    for _ in range(levels):
        pw, ph = dims[-1]
        dims.append(((pw + 1) // 2, (ph + 1) // 2))
    # dims[k] = size after k decompositions; res r uses dims[levels-r]
    out = []
    for r in range(1, levels + 1):
        pw, ph = dims[levels - r]  # size being reconstructed at res r
        lw, lh = dims[levels - r + 1]
        hw, hh_ = pw - lw, ph - lh
        out.append((r, "HL", hw, lh))
        out.append((r, "LH", lw, hh_))
        out.append((r, "HH", hw, hh_))
    return dims[levels], out


def _cb_grid(bw: int, bh: int, cbw: int, cbh: int):
    return (bw + cbw - 1) // cbw if bw else 0, (
        bh + cbh - 1
    ) // cbh if bh else 0


def _canvas_cb_aligned(
    ox0: int, oy0: int, w: int, h: int, levels: int,
    cbw: int, cbh: int,
) -> bool:
    """True when the tile-local codeblock grid coincides with the
    canvas-anchored one for a tile whose per-component canvas origin
    is (ox0, oy0) — a multiple of 2^levels, so every band origin is
    the exact shift ox0 >> nb (B-15 with the half-shift ceil). The
    codeblock partition anchors at 0 of each band's CANVAS
    coordinates (B.7): the grids coincide iff each band's origin
    lands on a codeblock boundary, or the band spans a single
    (possibly partial) block both ways (r15 — also closes the
    latent misalignment for interior tiles whose scaled origins
    straddle a block boundary)."""
    ll0, band_list = _band_sizes(w, h, levels)
    entries = [(levels, ll0[0], ll0[1])] + [
        (levels - r + 1, bw, bh) for r, _nm, bw, bh in band_list
    ]
    for shift, bw, bh in entries:
        bx = (ox0 >> shift) % cbw
        by = (oy0 >> shift) % cbh
        if (bx and bx + bw > cbw) or (by and by + bh > cbh):
            return False
    return True


def encode_jpx(
    pixels: np.ndarray,
    levels: int = 2,
    cb_exp: tuple[int, int] = (5, 5),
    mct: bool | None = None,
    sop: bool = False,
    eph: bool = False,
    jp2: bool = False,
    irreversible: bool = False,
    planes: int = 10,
    layers: int = 1,
    prog: str = "LRCP",
    tile_size: tuple[int, int] | None = None,
    tile_kw: dict | None = None,
    tile_parts: int = 1,
    cb_style: int = 0,
    qcd_style: int = 2,
    depth: int = 8,
    subsampling: tuple[int, int] | None = None,
    offsets: tuple[int, int, int, int] | None = None,
    precincts=None,
    _fixed_guard: int | None = None,
) -> bytes:
    """Write a lossless 5/3 JPEG 2000 codestream (or JP2 file when
    ``jp2``): one tile, one layer, LRCP. ``pixels`` is (h, w) gray
    or (h, w, 3) RGB uint8; ``cb_exp`` are the codeblock width/
    height exponents (actual size 2^e, 4..64); ``mct`` applies the
    reversible RCT (default: on for RGB)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    n_comp = 1 if gray else px.shape[2]
    if n_comp not in (1, 3):
        raise ValueError("encode_jpx: 1 or 3 components")
    if not (0 <= levels <= 6):
        raise ValueError("encode_jpx: levels 0..6")
    if not all(2 <= e <= 6 for e in cb_exp):
        raise ValueError("encode_jpx: codeblock exponents 2..6")
    if not 8 <= depth <= 16:
        raise ValueError("encode_jpx: depth 8..16")
    if subsampling is not None:
        # chroma subsampling (r14 late — the 4:2:0/4:2:2 camera JP2
        # form): RGB through the ICT, then box-mean chroma
        # downsampling onto the (sx, sy) grid
        sx, sy = subsampling
        if n_comp != 3 or not irreversible or mct is False:
            raise ValueError(
                "encode_jpx: subsampling needs RGB + irreversible "
                "+ MCT"
            )
        if tile_size is not None or tile_parts != 1:
            raise ValueError(
                "encode_jpx: subsampling composes with the "
                "single-tile form only"
            )
        if not (1 <= sx <= 4 and 1 <= sy <= 4) or (sx, sy) == (1, 1):
            raise ValueError(f"encode_jpx: subsampling {sx}x{sy}")
    if int(px.max(initial=0)) >= (1 << depth):
        raise ValueError(
            f"encode_jpx: samples exceed {depth}-bit range"
        )
    if cb_style & ~0x2F:
        # writable coder options (r14): 0x01 bypass, 0x02 reset,
        # 0x04 per-pass termination, 0x08 vertically causal, 0x20
        # segmentation symbols; predictable termination (0x10)
        # stays out of the writable subset (its flush pattern is
        # not implemented)
        raise ValueError(f"encode_jpx: coder options {cb_style:#x}")
    if mct is None:
        mct = not gray
    if mct and gray:
        raise ValueError("encode_jpx: MCT needs 3 components")
    cbw, cbh = 1 << cb_exp[0], 1 << cb_exp[1]

    prec_list = None
    if precincts is not None:
        # r15 (VERDICT item 5): explicit precinct sizes — a single
        # (PPx, PPy) replicated per resolution, or one pair per
        # resolution (levels + 1 entries); single-tile zero-offset
        # unsubsampled form only (the decoder's envelope)
        if tile_size is not None or offsets is not None or (
            subsampling is not None
        ):
            raise ValueError(
                "encode_jpx: precincts compose with the "
                "single-tile zero-offset unsubsampled form only"
            )
        if isinstance(precincts, tuple) and len(precincts) == 2 \
                and all(isinstance(v, int) for v in precincts):
            prec_list = [precincts] * (levels + 1)
        else:
            prec_list = [tuple(pp) for pp in precincts]
        if len(prec_list) != levels + 1:
            raise ValueError(
                "encode_jpx: precincts needs one (PPx, PPy) per "
                "resolution"
            )
        for r, (ppx, ppy) in enumerate(prec_list):
            if not (0 <= ppx <= 15 and 0 <= ppy <= 15) or (
                r > 0 and (ppx == 0 or ppy == 0)
            ):
                raise ValueError(
                    f"encode_jpx: precinct exponents {(ppx, ppy)} "
                    f"at resolution {r}"
                )

    xo = yo = xto = yto = 0
    if offsets is not None:
        # r15 (VERDICT item 3): non-zero image/tile grid offsets on
        # the single-tile form — the tile covers the whole image
        # region, XTsiz/YTsiz = Xsiz - XTOsiz etc., and the
        # tile-local packet body is canvas-valid exactly under the
        # decoder's alignment conditions, enforced here so an
        # unexpressible request errors at encode time
        xo, yo, xto, yto = offsets
        if tile_size is not None:
            raise ValueError(
                "encode_jpx: offsets compose with the single-tile "
                "form only"
            )
        if not (0 <= xto <= xo and 0 <= yto <= yo):
            raise ValueError(
                "encode_jpx: offsets require 0 <= TOsiz <= Osiz"
            )
        step = 1 << levels
        sx0, sy0 = (1, 1) if subsampling is None else subsampling
        if (xo % sx0) or (yo % sy0) or (xto % sx0) or (yto % sy0):
            raise ValueError(
                "encode_jpx: offsets must be multiples of the "
                "subsampling factors"
            )
        for cw, ch, ox, oy in (
            (w, h, xo, yo),
            (-(-w // sx0), -(-h // sy0), xo // sx0, yo // sy0),
        ):
            if ox % step or oy % step:
                raise ValueError(
                    "encode_jpx: offsets must be multiples of "
                    "2^levels (canvas-anchored subband geometry)"
                )
            if not _canvas_cb_aligned(
                ox, oy, cw, ch, levels, cbw, cbh
            ):
                raise ValueError(
                    "encode_jpx: offsets misalign the codeblock "
                    "grid"
                )

    if tile_size is not None:
        # tiled form (r13 late): each tile's packet stream for its
        # own dims IS the stream the decoder expects for that tile,
        # so tiles encode through this same function and the main
        # header carries the grid. Guard bits are FIXED at 7 so the
        # single main-header QCD stays valid for every tile; the
        # reversible eps table is content-independent (irreversible
        # tiling would need per-tile QCD overrides — named).
        txs, tys = tile_size
        if irreversible:
            raise NotImplementedError(
                "encode_jpx: tiled irreversible (per-tile QCD)"
            )
        if tile_parts != 1:
            raise ValueError(
                "encode_jpx: tile_parts applies to the single-tile "
                "form"
            )
        if txs <= 0 or tys <= 0 or txs % (1 << levels) or (
            tys % (1 << levels)
        ):
            # must match the decoder's canvas-geometry equivalence
            # guard (tile origins at multiples of 2^levels)
            raise ValueError(
                "encode_jpx: tile dims must be multiples of 2^levels"
            )
        tiles_x = -(-w // txs)
        tiles_y = -(-h // tys)

        def _seg_of(blob: bytes, tag: bytes) -> bytes:
            at2 = blob.index(tag)
            (l2,) = struct.unpack_from(">H", blob, at2 + 2)
            return blob[at2 + 2 : at2 + 2 + l2]

        bodies = []
        cods = []
        qcds = []
        siz_first = [None]  # tile 0's SIZ (canvas-patched below)
        for ty in range(tiles_y):
            for tx in range(tiles_x):
                sub = px[
                    ty * tys : (ty + 1) * tys,
                    tx * txs : (tx + 1) * txs,
                ]
                kw2 = dict(
                    levels=levels, cb_exp=cb_exp, mct=mct,
                    sop=sop, eph=eph, layers=layers, prog=prog,
                    cb_style=cb_style, depth=depth,
                )
                # per-tile parameter overrides (r14 — emitted as
                # COD/QCD segments in that tile's first tile-part
                # header when they differ from the main header's).
                # Only COD/QCD-expressible keys are legal: depth and
                # wavelet are SIZ/stitch-global (r14 review finding —
                # a per-tile depth encoded without error and decoded
                # to silently wrong pixels)
                over = dict((tile_kw or {}).get(ty * tiles_x + tx, {}))
                bad_keys = set(over) - {
                    "levels", "cb_exp", "sop", "eph", "layers",
                    "prog", "cb_style",
                }
                if bad_keys:
                    raise ValueError(
                        "encode_jpx: tile_kw keys not expressible "
                        f"as per-tile COD/QCD: {sorted(bad_keys)}"
                    )
                kw2.update(over)
                if kw2["levels"] and (
                    txs % (1 << kw2["levels"])
                    or tys % (1 << kw2["levels"])
                ):
                    raise ValueError(
                        "encode_jpx: tile dims must be multiples "
                        "of 2^levels for every tile's levels"
                    )
                if not _canvas_cb_aligned(
                    tx * txs, ty * tys,
                    sub.shape[1], sub.shape[0],
                    kw2["levels"],
                    1 << kw2["cb_exp"][0], 1 << kw2["cb_exp"][1],
                ):
                    # r15: B.7 anchors the codeblock partition at
                    # canvas 0 per band — a scaled tile origin
                    # straddling a block boundary makes the
                    # tile-local body disagree with a conforming
                    # reader (the r14 latent hole, now loud on both
                    # sides)
                    raise ValueError(
                        "encode_jpx: tile grid misaligns the "
                        "codeblock partition (origin straddles a "
                        "block boundary)"
                    )
                one = encode_jpx(
                    sub, irreversible=False, _fixed_guard=7, **kw2
                )
                sod = one.index(b"\xff\x93")
                eoc = one.rindex(b"\xff\xd9")
                bodies.append(one[sod + 2 : eoc])
                cods.append(_seg_of(one, b"\xff\x52"))
                qcds.append(_seg_of(one, b"\xff\x5c"))
                if not siz_first[0]:
                    siz_first[0] = _seg_of(one, b"\xff\x51")
        # main header: tile 0's SIZ/COD/QCD shape with the full
        # canvas + tile grid; tiles whose COD/QCD differ carry the
        # override in their tile-part header
        siz0 = bytearray(siz_first[0])
        struct.pack_into(
            ">IIIIIIII", siz0, 4, w, h, 0, 0, txs, tys, 0, 0
        )
        out_cs = (
            b"\xff\x4f"
            + b"\xff\x51" + bytes(siz0)
            + b"\xff\x52" + cods[0]
            + b"\xff\x5c" + qcds[0]
        )
        for idx, body_t in enumerate(bodies):
            over = b""
            if cods[idx] != cods[0]:
                over += b"\xff\x52" + cods[idx]
            if qcds[idx] != qcds[0]:
                over += b"\xff\x5c" + qcds[idx]
            psot = 12 + len(over) + 2 + len(body_t)
            out_cs += (
                b"\xff\x90"
                + struct.pack(">HHIBB", 10, idx, psot, 0, 1)
                + over
                + b"\xff\x93"
                + body_t
            )
        out_cs += b"\xff\xd9"
        if not jp2:
            return out_cs
        return _wrap_jp2(out_cs, w, h, n_comp, depth)

    # DC level shift + component transform
    half = 1 << (depth - 1)
    comps = []
    if gray:
        comps = [px.astype(np.int64) - half]
    else:
        r = px[:, :, 0].astype(np.int64) - half
        g = px[:, :, 1].astype(np.int64) - half
        b = px[:, :, 2].astype(np.int64) - half
        if mct and irreversible:
            rf, gf, bf = (c.astype(np.float64) for c in (r, g, b))
            y = 0.299 * rf + 0.587 * gf + 0.114 * bf
            cb = -0.168736 * rf - 0.331264 * gf + 0.5 * bf
            cr = 0.5 * rf - 0.418688 * gf - 0.081312 * bf
            comps = [y, cb, cr]
        elif mct:
            y = (r + 2 * g + b) >> 2
            cb = b - g
            cr = r - g
            comps = [y, cb, cr]
        else:
            comps = [r, g, b]
    if irreversible:
        comps = [c.astype(np.float64) for c in comps]
    if subsampling is not None:
        sx, sy = subsampling

        def _box_down(a):
            h0, w0 = a.shape
            ph, pw = (-h0) % sy, (-w0) % sx
            if ph or pw:
                a = np.pad(a, ((0, ph), (0, pw)), mode="edge")
            return a.reshape(
                a.shape[0] // sy, sy, a.shape[1] // sx, sx
            ).mean(axis=(1, 3))

        comps = [comps[0], _box_down(comps[1]), _box_down(comps[2])]

    # wavelet decomposition per component
    ll0, band_list = _band_sizes(w, h, levels)
    per_comp_bands: list[dict] = []
    fdwt = _fdwt97_2d if irreversible else _fdwt53_2d
    for c in comps:
        cur = c
        bands: dict = {}
        for lvl in range(levels):
            r = levels - lvl  # this pass produces resolution r bands
            ll, t_hl, t_lh, hh = fdwt(cur)
            # the 2d forward's 2nd output is horizontally-high = HL
            bands[(r, "HL")] = t_hl
            bands[(r, "LH")] = t_lh
            bands[(r, "HH")] = hh
            cur = ll
        bands[(0, "LL")] = cur
        per_comp_bands.append(bands)

    deltas: dict = {}
    qcodes: dict = {}
    if qcd_style not in (1, 2):
        raise ValueError(f"encode_jpx: qcd_style {qcd_style}")
    if irreversible:
        # scalar quantizer: EXPOUNDED (QCD style 2, the default) —
        # one (eps, mantissa)-coded delta per subband picked from
        # the band's actual max so `planes` bit-planes cover it
        # (shared across components per the QCD scope) — or DERIVED
        # (style 1, r14): ONE pair, band exponents eps0 - (r-1)
        # with the mantissa shared (E-5), the base picked so every
        # band's derived delta still covers its max
        keys_all = [(0, "LL")] + [
            (r, nm) for r, nm, _w2, _h2 in band_list
        ]
        maxes = {}
        for key in keys_all:
            mx = 0.0
            for bands in per_comp_bands:
                if bands[key].size:
                    mx = max(mx, float(np.abs(bands[key]).max()))
            maxes[key] = mx
        if qcd_style == 1:
            base = 1e-6
            for key in keys_all:
                want = max(maxes[key] / (1 << planes), 1e-6)
                scale = 2.0 ** (
                    _GAIN[key[1]] + max(0, key[0] - 1)
                )
                base = max(base, want / scale)
            e0, m0 = _delta_to_code(base, depth)
            for key in keys_all:
                e_b = e0 - max(0, key[0] - 1)
                if e_b < 0:
                    raise ValueError(
                        "encode_jpx: levels too deep for the "
                        "derived quantizer"
                    )
                qcodes[key] = (e_b, m0)
                deltas[key] = _code_to_delta(
                    e_b, m0, depth + _GAIN[key[1]]
                )
        else:
            for key in keys_all:
                r_b = depth + _GAIN[key[1]]
                want = max(maxes[key] / (1 << planes), 1e-6)
                e, m = _delta_to_code(want, r_b)
                qcodes[key] = (e, m)
                deltas[key] = _code_to_delta(e, m, r_b)
        for bands in per_comp_bands:
            for key in bands:
                f = bands[key]
                q = np.floor(np.abs(f) / deltas[key]).astype(np.int64)
                bands[key] = (q * np.sign(f)).astype(np.int64)

    # bit-depth / guard bits: make Mb cover the widest coefficient
    if irreversible:
        eps = {}
        need = 1
        for key, (e, _m) in qcodes.items():
            mx = 0
            for bands in per_comp_bands:
                if bands[key].size:
                    mx = max(mx, int(np.abs(bands[key]).max()))
            need = max(need, mx.bit_length() - (e - 1) + 1)
        guard = _fixed_guard or min(7, max(2, need))
        mb = {key: guard + e - 1 for key, (e, _m) in qcodes.items()}
    else:
        eps = {
            b: depth + _GAIN[b] for b in ("LL", "HL", "LH", "HH")
        }
        need = 1
        for bands in per_comp_bands:
            for (r, name), arr in bands.items():
                if arr.size:
                    m = int(np.abs(arr).max())
                    nm = m.bit_length() - (eps[name] - 1)
                    need = max(need, nm + 1)
        guard = _fixed_guard or min(7, max(2, need))
        mb = {b: guard + eps[b] - 1 for b in eps}

    # packets (LRCP: layer -> res -> comp). With layers > 1 every
    # codeblock's single Tier-1 stream is SPLIT at per-pass byte
    # watermarks — valid because the decoder concatenates a block's
    # layer chunks before running Tier-1 (see _encode_codeblock).
    if not 1 <= layers <= 64:
        raise ValueError(f"encode_jpx: layers {layers}")
    try:
        prog_id = ("LRCP", "RLCP", "RPCL", "PCRL", "CPRL").index(
            prog
        )
    except ValueError:
        raise ValueError(f"encode_jpx: progression {prog!r}")
    prep: dict = {}
    grids: dict = {}
    enc_geo = _precinct_geometry(w, h, levels, prec_list, cbw, cbh)
    for ci in range(n_comp):
        bands = per_comp_bands[ci]
        for key in (
            [(0, "LL")]
            + [(r, nm) for r in range(1, levels + 1)
               for nm in ("HL", "LH", "HH")]
        ):
            arr = bands[key]
            bh_, bw_ = arr.shape
            cbw_e = enc_geo[key[0]]["cbw"]
            cbh_e = enc_geo[key[0]]["cbh"]
            gx, gy = _cb_grid(bw_, bh_, cbw_e, cbh_e)
            grids[(ci, key)] = (gx, gy)
            if gx == 0 or gy == 0:
                continue
            incl_leaf = np.full((gy, gx), layers, np.int32)
            zbp_leaf = np.zeros((gy, gx), np.int32)
            blocks = {}
            for by in range(gy):
                for bx in range(gx):
                    sub = arr[
                        by * cbh_e : (by + 1) * cbh_e,
                        bx * cbw_e : (bx + 1) * cbw_e,
                    ]
                    mx = int(np.abs(sub).max()) if sub.size else 0
                    if mx == 0:
                        continue
                    np_ = mx.bit_length()
                    incl_leaf[by, bx] = 0
                    mb_b = mb[key if irreversible else key[1]]
                    zbp_leaf[by, bx] = mb_b - np_
                    if zbp_leaf[by, bx] < 0:
                        raise ValueError(
                            "jpx: coefficient wider than Mb"
                        )
                    seg, marks, seg_ends = _encode_codeblock(
                        sub, key[1], np_, want_marks=True,
                        cb_style=cb_style,
                    )
                    total = 3 * np_ - 2
                    bounds_p = _seg_pass_bounds(
                        _pass_plan(np_, cb_style)
                    )
                    # split passes near-evenly; byte split at the
                    # pass watermark — snapped UP to a codeword-
                    # segment end when the style actually CREATES
                    # segments, i.e. bypass or per-pass termination
                    # (r14 review finding: reset/segmark-only styles
                    # have a single segment, so snapping would shove
                    # every pass into layer 0; their mid-codeword
                    # watermark splits stay valid). B.10.7.2: only
                    # whole terminated segments cut cleanly; the
                    # spec also allows mid-segment byte splits,
                    # which the decoder supports, but the encoder
                    # keeps cuts segment-aligned.
                    segmented = bool(cb_style & 0x05)
                    per = []
                    done_p = 0
                    done_b = 0
                    for li in range(layers):
                        # an earlier snap-up may already cover this
                        # layer's proportional share: clamp at zero
                        k = max(
                            0, (total * (li + 1)) // layers - done_p
                        )
                        if li == layers - 1:
                            k = total - done_p
                        if segmented and k > 0:
                            k = min(
                                b for b in bounds_p
                                if b >= done_p + k
                            ) - done_p
                        if segmented:
                            end_b = (
                                done_b
                                if k == 0
                                else seg_ends[
                                    bounds_p.index(done_p + k)
                                ]
                            )
                        else:
                            end_b = (
                                len(seg)
                                if done_p + k >= total
                                else marks[done_p + k - 1]
                                if k > 0
                                else done_b
                            )
                        # header-length partitions: one per whole
                        # codeword segment inside this layer chunk
                        parts = []
                        if k > 0 and segmented:
                            s_p, s_b = done_p, done_b
                            for b in bounds_p:
                                if b <= s_p:
                                    continue
                                if b > done_p + k:
                                    break
                                e_b = seg_ends[bounds_p.index(b)]
                                parts.append((b - s_p, seg[s_b:e_b]))
                                s_p, s_b = b, e_b
                        elif k > 0:
                            parts = [(k, seg[done_b:end_b])]
                        per.append((k, seg[done_b:end_b], parts))
                        done_p += k
                        done_b = end_b
                    first_layer = next(
                        li for li, (k, _d, _p) in enumerate(per)
                        if k > 0
                    )
                    incl_leaf[by, bx] = first_layer
                    blocks[(by, bx)] = {
                        "np": np_,
                        "per": per,
                        "lblock": 3,
                        "first": first_layer,
                    }
            prep[(ci, key)] = {
                "leaf_incl": incl_leaf,
                "leaf_zbp": zbp_leaf,
                "blocks": blocks,
            }

    body = bytearray()
    n_packet = 0
    pkt_bounds: list[int] = []  # packet end offsets (tile-part cuts)
    enc_nprec = [g["npx"] * g["npy"] for g in enc_geo]
    enc_trees: dict = {}
    for layer, r, ci, pidx in _packet_order(
        prog_id, layers, levels + 1, n_comp, enc_nprec
    ):
        if True:
            if True:
                if r == 0:
                    keys = [(0, "LL")]
                else:
                    keys = [(r, nm) for nm in ("HL", "LH", "HH")]
                g_r = enc_geo[r]
                cbw_e, cbh_e = g_r["cbw"], g_r["cbh"]
                pj, pi = divmod(pidx, g_r["npx"])

                def _prange(key):
                    bh_, bw_ = per_comp_bands[ci][key].shape
                    x0b = pi * g_r["pbw"]
                    y0b = pj * g_r["pbh"]
                    x1b = min(x0b + g_r["pbw"], bw_)
                    y1b = min(y0b + g_r["pbh"], bh_)
                    if x0b >= x1b or y0b >= y1b:
                        return None
                    bx0 = x0b // cbw_e
                    by0 = y0b // cbh_e
                    return (
                        bx0, by0,
                        -(-x1b // cbw_e) - bx0,
                        -(-y1b // cbh_e) - by0,
                    )

                wr = _HdrWriter()
                chunks = []
                any_cb = any(
                    grids[(ci, k2)][0] and grids[(ci, k2)][1]
                    and _prange(k2) is not None
                    for k2 in keys
                )
                if not any_cb:
                    wr.bit(0)
                else:
                    wr.bit(1)
                    for key in keys:
                        gx_f, gy_f = grids[(ci, key)]
                        if gx_f == 0 or gy_f == 0:
                            continue
                        rng = _prange(key)
                        if rng is None:
                            continue
                        bx0, by0, gx, gy = rng
                        pp = prep[(ci, key)]
                        tk = (ci, key, pidx)
                        if tk not in enc_trees:
                            enc_trees[tk] = (
                                _TagTreeEnc(
                                    gx, gy,
                                    pp["leaf_incl"][
                                        by0 : by0 + gy,
                                        bx0 : bx0 + gx,
                                    ],
                                ),
                                _TagTreeEnc(
                                    gx, gy,
                                    pp["leaf_zbp"][
                                        by0 : by0 + gy,
                                        bx0 : bx0 + gx,
                                    ],
                                ),
                            )
                        incl_t, zbp_t = enc_trees[tk]
                        for ly in range(gy):
                            for lx in range(gx):
                                by, bx = by0 + ly, bx0 + lx
                                blk = pp["blocks"].get((by, bx))
                                if blk is None or layer <= blk["first"]:
                                    # not yet included: the inclusion
                                    # tag tree speaks (and first
                                    # inclusion lands exactly when
                                    # the leaf value == layer)
                                    incl_t.encode(
                                        wr, lx, ly, layer + 1
                                    )
                                    if blk is None or (
                                        layer < blk["first"]
                                    ):
                                        continue
                                    zbp_t.encode(
                                        wr, lx, ly, 1 << 30
                                    )
                                else:
                                    k, _d, _p = blk["per"][layer]
                                    wr.bit(1 if k > 0 else 0)
                                    if k == 0:
                                        continue
                                k, data, parts = blk["per"][layer]
                                _npasses_write(wr, k)
                                # Lblock grows (shared signalling,
                                # B.10.7.1) until EVERY partition
                                # length fits its own field of
                                # Lblock + floor(log2(passes)) bits
                                while any(
                                    len(d2).bit_length()
                                    > blk["lblock"]
                                    + (p2.bit_length() - 1)
                                    for p2, d2 in parts
                                ):
                                    wr.bit(1)
                                    blk["lblock"] += 1
                                wr.bit(0)
                                for p2, d2 in parts:
                                    wr.write(
                                        len(d2),
                                        blk["lblock"]
                                        + (p2.bit_length() - 1),
                                    )
                                chunks.append(data)
                hdr = wr.finish()
                if sop:
                    body += (
                        b"\xff\x91"
                        + struct.pack(">HH", 4, n_packet & 0xFFFF)
                    )
                body += hdr
                if eph:
                    body += b"\xff\x92"
                for cseg in chunks:
                    body += cseg
                n_packet += 1
                pkt_bounds.append(len(body))

    # marker segments
    siz = struct.pack(
        ">HHIIIIIIIIH",
        38 + 3 * n_comp,
        0,
        xo + w,
        yo + h,
        xo,
        yo,
        xo + w - xto,
        yo + h - yto,
        xto,
        yto,
        n_comp,
    ) + b"".join(
        struct.pack(
            ">BBB",
            depth - 1,
            1 if (subsampling is None or ci == 0) else subsampling[0],
            1 if (subsampling is None or ci == 0) else subsampling[1],
        )
        for ci in range(n_comp)
    )
    scod = (2 if sop else 0) | (4 if eph else 0) | (
        1 if prec_list is not None else 0
    )
    prec_bytes = b"" if prec_list is None else bytes(
        ppx | (ppy << 4) for ppx, ppy in prec_list
    )
    cod = struct.pack(
        ">HBBHBBBBBB",
        12 + len(prec_bytes),
        scod,
        prog_id,
        layers,
        1 if mct else 0,
        levels,
        cb_exp[0] - 2,
        cb_exp[1] - 2,
        cb_style,  # coder options (bypass/reset/term/segmark, r14)
        0 if irreversible else 1,  # 9/7 vs 5/3
    ) + prec_bytes
    n_sb = 3 * levels + 1
    if irreversible and qcd_style == 1:
        sqcd = bytes([(guard << 5) | 1])
        e0, m0 = qcodes[(0, "LL")]
        qcd = struct.pack(">H", 5) + sqcd + struct.pack(
            ">H", (e0 << 11) | m0
        )
    elif irreversible:
        sqcd = bytes([(guard << 5) | 2])
        keys = [(0, "LL")] + [
            (r, nm)
            for r in range(1, levels + 1)
            for nm in ("HL", "LH", "HH")
        ]
        qcd = struct.pack(">H", 3 + 2 * n_sb) + sqcd + b"".join(
            struct.pack(">H", (qcodes[k][0] << 11) | qcodes[k][1])
            for k in keys
        )
    else:
        sqcd = bytes([(guard << 5) | 0])
        sb_eps = [eps["LL"]] + [
            eps[nm] for _r in range(1, levels + 1)
            for nm in ("HL", "LH", "HH")
        ]
        qcd = struct.pack(">H", 3 + n_sb) + sqcd + bytes(
            e << 3 for e in sb_eps
        )
    tile = bytes(body)
    cs = (
        b"\xff\x4f"
        + b"\xff\x51" + siz
        + b"\xff\x52" + cod
        + b"\xff\x5c" + qcd
    )
    if not 1 <= tile_parts <= 255:
        raise ValueError(f"encode_jpx: tile_parts {tile_parts}")
    # tile-parts must cut at PACKET boundaries (A.4.2): pick
    # near-even byte cuts from the recorded packet ends; asking for
    # more parts than packets yields empty SOT+SOD parts (legal,
    # Psot = 14) (r14)
    cuts = [0]
    for i in range(1, tile_parts):
        want = len(tile) * i // tile_parts
        cut = min(
            (b for b in pkt_bounds if b > cuts[-1]),
            key=lambda b: abs(b - want),
            default=cuts[-1],
        )
        cuts.append(cut)
    cuts.append(len(tile))
    for tp in range(tile_parts):
        part = tile[cuts[tp] : cuts[tp + 1]]
        psot = 12 + len(part) + 2  # SOT seg + SOD + data
        cs += (
            b"\xff\x90"
            + struct.pack(">HHIBB", 10, 0, psot, tp, tile_parts)
            + b"\xff\x93"
            + part
        )
    cs += b"\xff\xd9"
    if not jp2:
        return cs
    return _wrap_jp2(cs, w, h, n_comp, depth)


def _wrap_jp2(
    cs: bytes, w: int, h: int, n_comp: int, depth: int = 8
) -> bytes:
    """Minimal JP2 container: signature, ftyp, jp2h(ihdr+colr), jp2c."""
    ihdr = struct.pack(
        ">IIHBBBB", h, w, n_comp, depth - 1, 7, 0, 0
    )
    colr = b"\x01\x00\x00" + struct.pack(
        ">I", 16 if n_comp == 3 else 17
    )

    def box(tag: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + tag + payload

    jp2h = box(b"ihdr", ihdr) + box(b"colr", colr)
    return (
        box(b"jP  ", b"\x0d\x0a\x87\x0a")
        + box(b"ftyp", b"jp2 \x00\x00\x00\x00jp2 ")
        + box(b"jp2h", jp2h)
        + box(b"jp2c", cs)
    )


def _find_codestream(payload: bytes) -> bytes:
    if payload[:2] == b"\xff\x4f":
        return payload
    # JP2 box walk
    if payload[4:8] == b"jP  ":
        at = 0
        n = len(payload)
        while at + 8 <= n:
            (ln,) = struct.unpack_from(">I", payload, at)
            tag = payload[at + 4 : at + 8]
            if ln == 1:
                (ln,) = struct.unpack_from(">Q", payload, at + 8)
                hdr = 16
            else:
                hdr = 8
            if ln == 0:
                ln = n - at
            if ln < hdr or at + ln > n:
                raise ValueError("jpx: malformed JP2 box")
            if tag == b"jp2c":
                return payload[at + hdr : at + ln]
            at += ln
        raise ValueError("jpx: JP2 without a jp2c codestream box")
    raise ValueError("jpx: neither a codestream nor a JP2 file")




def _parse_cod(cod: bytes) -> dict:
    """COD segment -> validated parameter dict (r14 — factored so
    tile-part COD overrides parse through the identical ladder)."""
    if len(cod) < 12:
        raise ValueError(f"jpx: COD segment length {len(cod)}")
    scod = cod[2]
    prog, layers, mct, levels, cbe_w, cbe_h, cb_style, wavelet = (
        struct.unpack_from(">BHBBBBBB", cod, 3)
    )
    precincts = None
    if scod & 1:
        # explicit precinct sizes (r15, T.800 A.6.1/B.6): one byte
        # per resolution, PPx in the low nibble, PPy in the high
        if len(cod) < 12 + levels + 1:
            raise ValueError(
                "jpx: COD shorter than its precinct-size list"
            )
        precincts = []
        for r in range(levels + 1):
            b = cod[12 + r]
            ppx, ppy = b & 0x0F, b >> 4
            if r > 0 and (ppx == 0 or ppy == 0):
                # B.6: precincts at r > 0 must be >= 2 on the
                # resolution grid (the band-level half)
                raise ValueError(
                    "jpx: zero precinct exponent above resolution 0"
                )
            precincts.append((ppx, ppy))
    if prog > 4:
        raise ValueError(f"jpx: progression order {prog}")
    if mct not in (0, 1):
        raise ValueError(f"jpx: undefined MCT value {mct}")
    if not 1 <= layers <= 64:
        raise ValueError(f"jpx: implausible layer count {layers}")
    if cb_style & ~0x3F:
        raise ValueError(f"jpx: undefined coder options {cb_style:#x}")
    # all six defined options decode (r14): 0x01 bypass / 0x02
    # reset / 0x04 per-pass termination / 0x08 vertically causal /
    # 0x20 segmentation symbols change behavior; 0x10 predictable
    # termination only constrains how the ENCODER flushed each
    # segment — a decoder may use it for error detection, which
    # this one does not (stated), so it decodes as plain
    # termination
    if wavelet not in (0, 1):
        raise ValueError(f"jpx: wavelet id {wavelet}")
    if levels > 6 or cbe_w > 4 or cbe_h > 4:
        raise ValueError("jpx: implausible COD parameters")
    return {
        "use_sop": bool(scod & 2),
        "use_eph": bool(scod & 4),
        "precincts": precincts,
        "prog": prog,
        "layers": layers,
        "mct": mct,
        "levels": levels,
        "cbw": 1 << (cbe_w + 2),
        "cbh": 1 << (cbe_h + 2),
        "cb_style": cb_style,
        "irreversible": wavelet == 0,
    }


def _parse_qcd(
    qcd: bytes, levels: int, irreversible: bool, depth: int
):
    """QCD segment -> (deltas, mb_of) for the given decomposition
    depth (r14 — factored for tile-part QCD overrides)."""
    if len(qcd) < 3:
        raise ValueError(f"jpx: QCD segment length {len(qcd)}")
    sqcd = qcd[2]
    q_style = sqcd & 0x1F
    guard = sqcd >> 5
    n_sb = 3 * levels + 1
    keys = [(0, "LL")] + [
        (r, nm)
        for r in range(1, levels + 1)
        for nm in ("HL", "LH", "HH")
    ]
    deltas = None
    if q_style == 0:
        if irreversible:
            raise ValueError(
                "jpx: no-quantization QCD with the 9/7 wavelet"
            )
        sb_eps = [b >> 3 for b in qcd[3:]]
        if len(sb_eps) < n_sb:
            raise ValueError("jpx: QCD shorter than the subband count")
        mb_of = {k2: guard + sb_eps[i] - 1 for i, k2 in enumerate(keys)}
    elif q_style == 2:
        if not irreversible:
            raise ValueError(
                "jpx: expounded scalar QCD with the 5/3 wavelet"
            )
        body = qcd[3:]
        if len(body) < 2 * n_sb:
            raise ValueError("jpx: QCD shorter than the subband count")
        deltas = {}
        mb_of = {}
        for i, k2 in enumerate(keys):
            (v,) = struct.unpack_from(">H", body, 2 * i)
            e, m = v >> 11, v & 0x7FF
            r_b = depth + _GAIN[k2[1]]
            deltas[k2] = _code_to_delta(e, m, r_b)
            mb_of[k2] = guard + e - 1
    elif q_style == 1:
        # scalar DERIVED (r14 — E.1.1/E-5): ONE (eps0, mant) pair;
        # band exponents derive as eps_b = eps0 - (r - 1) with the
        # mantissa shared, so deltas scale by resolution
        if not irreversible:
            raise ValueError(
                "jpx: derived scalar QCD with the 5/3 wavelet"
            )
        if len(qcd) < 5:
            raise ValueError("jpx: QCD style 1 needs one step size")
        (v,) = struct.unpack_from(">H", qcd, 3)
        e0, m0 = v >> 11, v & 0x7FF
        deltas = {}
        mb_of = {}
        for k2 in keys:
            r2 = k2[0]
            e_b = e0 - max(0, r2 - 1)
            if e_b < 0:
                raise ValueError(
                    "jpx: derived exponent underflows at "
                    f"resolution {r2}"
                )
            r_b = depth + _GAIN[k2[1]]
            deltas[k2] = _code_to_delta(e_b, m0, r_b)
            mb_of[k2] = guard + e_b - 1
    else:
        raise NotImplementedError(f"jpx: QCD style {q_style}")
    return deltas, mb_of


def decode_jpx(payload: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Decode to {format, width, height, pixels} (uint8, (h, w) gray
    or (h, w, 3) RGB). Named errors for the out-of-subset shapes."""
    cs = _find_codestream(payload)
    if cs[:2] != b"\xff\x4f":
        raise ValueError("jpx: missing SOC")
    at = 2
    n = len(cs)
    siz = cod = qcd = None
    tiles: dict[int, dict[int, tuple[int, int]]] = {}
    while at + 4 <= n:
        if cs[at] != 0xFF:
            raise ValueError("jpx: marker expected")
        marker = cs[at + 1]
        at += 2
        if marker == 0xD9:
            break
        (ln,) = struct.unpack_from(">H", cs, at)
        if ln < 2:
            # a zero/one-length segment cannot advance the walk — a
            # hostile stream would otherwise loop here forever
            raise ValueError(f"jpx: marker FF{marker:02X} length {ln}")
        if marker == 0x51:
            siz = cs[at : at + ln]
        elif marker == 0x52:
            cod = cs[at : at + ln]
        elif marker == 0x5C:
            qcd = cs[at : at + ln]
        elif marker == 0x90:  # SOT (r14: multiple tile-parts per
            # tile — real encoders split big tiles; the per-tile
            # bitstreams concatenate in TPsot order, A.4.2)
            if ln != 10 or at + 10 > n:
                raise ValueError("jpx: malformed SOT")
            isot, psot, tpsot, _tnsot = struct.unpack_from(
                ">HIBB", cs, at + 2
            )
            sot_start = at - 2
            if psot == 0:
                psot = n - sot_start  # 0 = to EOC (last tile-part)
            end = sot_start + psot
            if end > n or psot < 14:
                raise ValueError("jpx: Psot out of bounds")
            # tile-part header walk (r14): COD/QCD overrides for
            # THIS tile parse through the main-header ladders (legal
            # in the first tile-part, A.4.2); informational PLT/COM
            # skip; the semantics-changing COC/QCC/RGN/POC/PPT stay
            # named
            entry = tiles.setdefault(
                isot, {"parts": {}, "cod": None, "qcd": None}
            )
            hdr_at = at + 10
            while True:
                if hdr_at + 2 > end or cs[hdr_at] != 0xFF:
                    raise ValueError(
                        "jpx: marker expected in tile-part header"
                    )
                m2 = cs[hdr_at + 1]
                if m2 == 0x93:  # SOD
                    hdr_at += 2
                    break
                if hdr_at + 4 > end:
                    raise ValueError("jpx: truncated tile-part header")
                (l2,) = struct.unpack_from(">H", cs, hdr_at + 2)
                if l2 < 2 or hdr_at + 2 + l2 > end:
                    raise ValueError(
                        f"jpx: tile-part marker FF{m2:02X} length {l2}"
                    )
                seg2 = cs[hdr_at + 2 : hdr_at + 2 + l2]
                if m2 in (0x52, 0x5C):
                    if tpsot != 0:
                        raise NotImplementedError(
                            "jpx: COD/QCD override outside the "
                            "first tile-part"
                        )
                    entry["cod" if m2 == 0x52 else "qcd"] = seg2
                elif m2 in (0x53, 0x5D, 0x5E, 0x5F, 0x61):
                    raise NotImplementedError(
                        f"jpx: tile-part marker FF{m2:02X} "
                        "(COC/QCC/RGN/POC/PPT) outside the subset"
                    )
                hdr_at += 2 + l2
            if tpsot in entry["parts"]:
                raise ValueError(
                    f"jpx: duplicate tile-part {tpsot} of tile {isot}"
                )
            entry["parts"][tpsot] = (hdr_at, end)
            at = end
            continue
        elif marker in (0x53, 0x5D, 0x5E):
            raise NotImplementedError(
                f"jpx: marker FF{marker:02X} (per-component/tile "
                "overrides) outside the lossless subset"
            )
        elif marker in (0x5F, 0x60):
            # POC changes the progression mid-stream and PPM moves
            # packet headers out of the bitstream — both SEMANTIC:
            # ignoring them would walk packets in the wrong order
            # (r14 review finding; the named error keeps the
            # no-garbage contract)
            raise NotImplementedError(
                f"jpx: marker FF{marker:02X} "
                f"({'POC progression change' if marker == 0x5F else 'PPM packed packet headers'})"
            )
        # informational pointer segments (TLM/PLM/PLT A.7, CRG,
        # COM) fall through to the length skip
        at += ln
    if siz is None or cod is None or qcd is None or not tiles:
        raise ValueError("jpx: missing SIZ/COD/QCD/SOD")
    # segment-length validation (r14, ADVICE): malformed headers are
    # the documented ValueError, never a raw struct/index error
    if len(siz) < 38:
        raise ValueError(f"jpx: SIZ segment length {len(siz)}")
    if len(cod) < 12:
        raise ValueError(f"jpx: COD segment length {len(cod)}")
    if len(qcd) < 3:
        raise ValueError(f"jpx: QCD segment length {len(qcd)}")

    (_rsiz, xs, ys, xo, yo, xt, yt, xto, yto, n_comp) = struct.unpack(
        ">HIIIIIIIIH", siz[2:38]
    )
    # image/tile grid offsets (r15, T.800 B.1/B.3 — cropped or
    # extracted real-world codestreams): the image region is
    # [XOsiz, Xsiz) x [YOsiz, Ysiz); the spec requires
    # XTOsiz <= XOsiz < XTOsiz + XTsiz (first tile contains the
    # image origin)
    if xs <= xo or ys <= yo:
        raise ValueError("jpx: empty image region (Osiz >= siz)")
    w, h = xs - xo, ys - yo
    if xs * ys > max_pixels:
        # the allocation guard outranks every other check — on the
        # full REFERENCE grid, since canvas coordinates size the
        # band/tile arithmetic
        raise ValueError(
            f"jpx: {xs}x{ys} canvas exceeds the "
            f"{max_pixels}-pixel guard"
        )
    if xt == 0 or yt == 0:
        raise ValueError("jpx: zero tile size")
    if xto > xo or yto > yo or xo >= xto + xt or yo >= yto + yt:
        raise ValueError(
            "jpx: tile grid offsets violate "
            "XTOsiz <= XOsiz < XTOsiz + XTsiz"
        )
    tiles_x = -(-(xs - xto) // xt)
    tiles_y = -(-(ys - yto) // yt)
    if tiles_x * tiles_y > 4096:
        raise ValueError("jpx: implausible tile count")
    if n_comp not in (1, 3):
        raise NotImplementedError(f"jpx: {n_comp} components")
    if len(siz) < 38 + 3 * n_comp:
        raise ValueError("jpx: SIZ shorter than its component list")
    depths = set()
    subs = []
    for ci in range(n_comp):
        ssiz, xr, yr = struct.unpack_from(">BBB", siz, 38 + 3 * ci)
        if ssiz & 0x80:
            raise NotImplementedError("jpx: signed components")
        if xr == 0 or yr == 0:
            # Table A.11: XRsiz/YRsiz are 1..255 — zero is a
            # MALFORMED header, not an unsupported feature (r14
            # review finding)
            raise ValueError("jpx: zero component subsampling")
        if not (xr <= 4 and yr <= 4):
            raise NotImplementedError(
                f"jpx: component subsampling {xr}x{yr}"
            )
        if (xo % xr) or (yo % yr) or (xto % xr) or (yto % yr):
            # offsets that do not land on the component grid would
            # shift every ceil below — named, never silently skewed
            raise NotImplementedError(
                "jpx: grid offsets not multiples of the component "
                "subsampling"
            )
        subs.append((xr, yr))
        depths.add((ssiz & 0x7F) + 1)
    if len(depths) != 1:
        raise NotImplementedError(
            f"jpx: mixed component depths {sorted(depths)}"
        )
    depth = depths.pop()
    if not 8 <= depth <= 16:
        # 10/12/16-bit unsigned decode as of r14 (archival/medical
        # gray scans); sub-8-bit stays named
        raise NotImplementedError(f"jpx: {depth}-bit components")
    subsampled = any(s != (1, 1) for s in subs)
    if subsampled and subs[0] != (1, 1):
        # chroma subsampling is the real-world form (4:2:0/4:2:2
        # camera-pipeline JP2s, r14 late); a subsampled FIRST
        # component stays named
        raise NotImplementedError("jpx: subsampled luma component")
    if subsampled and (tiles_x > 1 or tiles_y > 1):
        raise NotImplementedError(
            "jpx: subsampled components with tiling"
        )
    # per-component sample grid (B.2: ceil(size / R))
    comp_w = [-(-w // s[0]) for s in subs]
    comp_h = [-(-h // s[1]) for s in subs]

    main_cod = _parse_cod(cod)
    levels = main_cod["levels"]
    mct_f = main_cod["mct"]
    irreversible = main_cod["irreversible"]
    if subsampled and mct_f and not irreversible:
        raise NotImplementedError(
            "jpx: reversible RCT over subsampled components"
        )

    main_q = _parse_qcd(qcd, levels, irreversible, depth)

    def _decode_tile(buf: bytes, tw: int, th: int, P: dict, Q):
        """One tile's packet walk + reconstruction -> list of
        (th, tw) planes (int64 for 5/3, float64 for 9/7, pre
        DC-shift / MCT-inverse). ``buf`` is the tile's bitstream —
        its tile-part SOD payloads concatenated in TPsot order
        (r14), over which packets run contiguously per A.4.2.
        ``P``/``Q`` are the tile's effective COD params and QCD
        (deltas, mb_of) — the main header's unless a tile-part
        header override replaced them (r14)."""
        use_sop, use_eph = P["use_sop"], P["use_eph"]
        prog, layers = P["prog"], P["layers"]
        levels, cbw, cbh = P["levels"], P["cbw"], P["cbh"]
        cb_style = P["cb_style"]
        irreversible = P["irreversible"]
        deltas, mb_of = Q
        rd_at, end_at = 0, len(buf)

        # parse packets (bounded by this tile-part's Psot extent);
        # band geometry is PER COMPONENT (r14 late — subsampled
        # chroma components have their own sample grids, B.2)
        per_comp_bands = [dict() for _ in range(n_comp)]
        for ci in range(n_comp):
            ctw = -(-tw // subs[ci][0])
            cth = -(-th // subs[ci][1])
            ll0, band_list = _band_sizes(ctw, cth, levels)
            per_comp_bands[ci][(0, "LL")] = np.zeros(
                (ll0[1], ll0[0]), np.int64
            )
            for r, nm, bw_, bh_ in band_list:
                per_comp_bands[ci][(r, nm)] = np.zeros(
                    (bh_, bw_), np.int64
                )
        # LRCP packet walk across ALL quality layers (r13 late — layered
        # lossy streams are the common real-encoder shape): tag trees and
        # per-codeblock state (zbp, Lblock, accumulated passes, chunk
        # list) PERSIST across layers; already-included blocks signal
        # this-layer inclusion with a single bit; Tier-1 runs once per
        # codeblock at the END over the concatenated chunks with the
        # summed pass budget — which also makes TRUNCATED final layers
        # (the essence of quality scalability) decode correctly.
        trees: dict = {}
        cb: dict = {}
        geo = _precinct_geometry(
            tw, th, levels, P.get("precincts"), cbw, cbh
        )
        n_prec = [g["npx"] * g["npy"] for g in geo]
        for layer, r, ci, pidx in _packet_order(
            prog, layers, levels + 1, n_comp, n_prec
        ):
            if True:
                if True:
                    if use_sop:
                        if buf[rd_at : rd_at + 2] != b"\xff\x91":
                            raise ValueError("jpx: missing SOP marker")
                        rd_at += 6
                    rd = _HdrReader(buf, rd_at, limit=end_at)
                    if r == 0:
                        sbs = [(0, "LL")]
                    else:
                        sbs = [(r, nm) for nm in ("HL", "LH", "HH")]
                    g_r = geo[r]
                    cbw_e, cbh_e = g_r["cbw"], g_r["cbh"]
                    pj, pi = divmod(pidx, g_r["npx"])
                    chunks = []
                    nonempty = rd.bit()
                    if nonempty:
                        for key in sbs:
                            arr = per_comp_bands[ci][key]
                            bh_, bw_ = arr.shape
                            # this precinct's rect in band coords
                            # (precinct boundaries are multiples of
                            # the effective codeblock size, so the
                            # global cb grid restricts cleanly)
                            x0b = pi * g_r["pbw"]
                            y0b = pj * g_r["pbh"]
                            x1b = min(x0b + g_r["pbw"], bw_)
                            y1b = min(y0b + g_r["pbh"], bh_)
                            if x0b >= x1b or y0b >= y1b:
                                continue
                            bx0 = x0b // cbw_e
                            by0 = y0b // cbh_e
                            gx = -(-x1b // cbw_e) - bx0
                            gy = -(-y1b // cbh_e) - by0
                            if gx <= 0 or gy <= 0:
                                continue
                            tk = (ci, key, pidx)
                            if tk not in trees:
                                trees[tk] = (
                                    _TagTreeDec(gx, gy),
                                    _TagTreeDec(gx, gy),
                                )
                            incl_tt, zbp_tt = trees[tk]
                            for ly in range(gy):
                                for lx in range(gx):
                                    by, bx = by0 + ly, bx0 + lx
                                    bk = (ci, key, by, bx)
                                    st = cb.get(bk)
                                    if st is None:
                                        v = incl_tt.decode(
                                            rd, lx, ly, layer + 1
                                        )
                                        if v > layer:
                                            continue
                                        zbp = zbp_tt.decode(
                                            rd, lx, ly, 1 << 30
                                        )
                                        np_ = mb_of[key] - zbp
                                        if np_ <= 0:
                                            raise ValueError(
                                                "jpx: zero bit-planes "
                                                "exceed Mb"
                                            )
                                        bounds = _seg_pass_bounds(
                                            _pass_plan(
                                                np_, cb_style
                                            )
                                        )
                                        y0c = by * cbh_e
                                        x0c = bx * cbw_e
                                        st = cb[bk] = {
                                            "np": np_,
                                            "passes": 0,
                                            "lblock": 3,
                                            "bounds": bounds,
                                            "segs": [
                                                bytearray()
                                                for _ in bounds
                                            ],
                                            "y0": y0c,
                                            "x0": x0c,
                                            "sh": min(
                                                cbh_e, bh_ - y0c
                                            ),
                                            "sw": min(
                                                cbw_e, bw_ - x0c
                                            ),
                                        }
                                    elif not rd.bit():
                                        continue
                                    npass = _npasses_read(rd)
                                    while rd.bit():
                                        st["lblock"] += 1
                                    a0 = st["passes"]
                                    st["passes"] += npass
                                    if st["passes"] > 3 * st["np"] - 2:
                                        raise ValueError(
                                            "jpx: pass count exceeds "
                                            "the bit-plane budget"
                                        )
                                    # one length per codeword-
                                    # segment portion inside this
                                    # contribution (B.10.7.2); a
                                    # single segment when no coder
                                    # options are on
                                    s_p = a0
                                    seg_i = sum(
                                        1
                                        for b2 in st["bounds"]
                                        if b2 <= a0
                                    )
                                    while s_p < a0 + npass:
                                        e_p = min(
                                            st["bounds"][seg_i],
                                            a0 + npass,
                                        )
                                        p2 = e_p - s_p
                                        ln = rd.read(
                                            st["lblock"]
                                            + (p2.bit_length() - 1)
                                        )
                                        chunks.append(
                                            (bk, seg_i, ln)
                                        )
                                        if e_p == st["bounds"][seg_i]:
                                            seg_i += 1
                                        s_p = e_p
                    rd_at = rd.align()
                    if use_eph:
                        if buf[rd_at : rd_at + 2] != b"\xff\x92":
                            raise ValueError("jpx: missing EPH marker")
                        rd_at += 2
                    for bk, seg_i, ln in chunks:
                        if rd_at + ln > end_at:
                            raise ValueError(
                                "jpx: codeblock data truncated"
                            )
                        cb[bk]["segs"][seg_i] += buf[
                            rd_at : rd_at + ln
                        ]
                        rd_at += ln
        for (ci, key, by, bx), st in cb.items():
            arr = per_comp_bands[ci][key]
            y0, x0 = st["y0"], st["x0"]
            sh, sw = st["sh"], st["sw"]
            coeffs = _decode_codeblock(
                st["segs"], sh, sw, key[1], st["np"],
                n_passes=st["passes"], cb_style=cb_style,
            )
            arr[y0 : y0 + sh, x0 : x0 + sw] = coeffs

        # reconstruct per component
        outs = []
        for ci in range(n_comp):
            bands = per_comp_bands[ci]
            if irreversible:
                bands = {
                    k2: bands[k2].astype(np.float64) * deltas[k2]
                    for k2 in bands
                }
                cur = bands[(0, "LL")]
                for r in range(1, levels + 1):
                    cur = _idwt97_2d(
                        cur, bands[(r, "HL")], bands[(r, "LH")],
                        bands[(r, "HH")],
                    )
            else:
                cur = bands[(0, "LL")]
                for r in range(1, levels + 1):
                    cur = _idwt53_2d(
                        cur, bands[(r, "HL")], bands[(r, "LH")],
                        bands[(r, "HH")],
                    )
            outs.append(cur)
        return outs

    # decode every tile and stitch (r13 late); planes live on each
    # component's own sample grid (r14 late)
    out_planes = [
        np.zeros(
            (comp_h[ci], comp_w[ci]),
            np.float64 if irreversible else np.int64,
        )
        for ci in range(n_comp)
    ]
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            idx = ty * tiles_x + tx
            if idx not in tiles:
                raise ValueError(f"jpx: missing tile {idx}")
            # tile span on the reference grid, clipped to the image
            # region (B.3 eq. B-7/B-8)
            x0 = max(xto + tx * xt, xo)
            y0 = max(yto + ty * yt, yo)
            tw = min(xto + (tx + 1) * xt, xs) - x0
            th = min(yto + (ty + 1) * yt, ys) - y0
            entry = tiles[idx]
            parts = entry["parts"]
            if set(parts) != set(range(len(parts))):
                raise ValueError(
                    f"jpx: tile {idx} TPsot sequence has gaps"
                )
            P = (
                _parse_cod(entry["cod"])
                if entry["cod"] is not None
                else main_cod
            )
            if (xs > (1 << 15) or ys > (1 << 15)) and (
                tiles_x > 1 or tiles_y > 1 or xo or yo or xto or yto
            ):
                # r15 review: even WITHOUT Scod bit 0 the spec's
                # default precinct partition (PPx = PPy = 15) is
                # canvas-anchored — a tile/offset region straddling
                # a 32768 boundary carries more packets than the
                # zero-anchored walk below would read
                raise NotImplementedError(
                    "jpx: implicit 2^15 precinct partition spans a "
                    "canvas boundary under tiling/offsets"
                )
            if P.get("precincts") is not None and (
                tiles_x > 1 or tiles_y > 1 or subsampled
                or xo or yo or xto or yto
            ):
                # r15: explicit precincts compose with the
                # single-tile zero-offset unsubsampled form only —
                # the precinct partition anchors at canvas 0, and
                # this envelope is where that provably coincides
                # with the zero-anchored geometry below
                raise NotImplementedError(
                    "jpx: precincts with tiling/offsets/"
                    "subsampling"
                )
            if P["irreversible"] != irreversible or (
                P["mct"] != mct_f
            ):
                # the stitched inverse-MCT/rounding runs once over
                # the full canvas, so per-tile wavelet/MCT switches
                # stay named rather than silently mixed
                raise NotImplementedError(
                    "jpx: per-tile wavelet/MCT override"
                )
            if (tiles_x > 1 or tiles_y > 1) and (
                xt % (1 << P["levels"]) or yt % (1 << P["levels"])
            ):
                # T.800 anchors subband geometry to CANVAS
                # coordinates; tile-local equals canvas-anchored
                # exactly when every tile origin is a multiple of
                # 2^levels (r14, ADVICE)
                raise NotImplementedError(
                    "jpx: tile dims not a multiple of 2^levels "
                    "(canvas-anchored subband geometry)"
                )
            step = 1 << P["levels"]
            for ci in range(n_comp):
                cox0 = x0 // subs[ci][0]
                coy0 = y0 // subs[ci][1]
                if cox0 % step or coy0 % step:
                    # tile-local band geometry equals canvas-
                    # anchored exactly when the per-component tile
                    # origin is a multiple of 2^levels (the r14
                    # guard, generalized to offset grids r15)
                    raise NotImplementedError(
                        "jpx: tile origin not a multiple of "
                        "2^levels (canvas-anchored subband "
                        "geometry)"
                    )
                if not _canvas_cb_aligned(
                    cox0, coy0,
                    -(-tw // subs[ci][0]), -(-th // subs[ci][1]),
                    P["levels"], P["cbw"], P["cbh"],
                ):
                    # B.7 anchors the codeblock partition at canvas
                    # 0 per band: a scaled tile origin straddling a
                    # block boundary makes the tile-local grid
                    # disagree (r15 — previously silently latent
                    # for interior tiles)
                    raise NotImplementedError(
                        "jpx: codeblock grid not aligned with the "
                        "tile origin"
                    )
            Q = (
                _parse_qcd(
                    entry["qcd"], P["levels"], irreversible, depth
                )
                if entry["qcd"] is not None
                else (
                    main_q
                    if P["levels"] == levels
                    else _parse_qcd(
                        qcd, P["levels"], irreversible, depth
                    )
                )
            )
            buf = b"".join(
                cs[s0:e0]
                for _tp, (s0, e0) in sorted(parts.items())
            )
            t_outs = _decode_tile(buf, tw, th, P, Q)
            for ci in range(n_comp):
                cy0 = (y0 - yo) // subs[ci][1]
                cx0 = (x0 - xo) // subs[ci][0]
                oh, ow = t_outs[ci].shape
                out_planes[ci][cy0 : cy0 + oh, cx0 : cx0 + ow] = (
                    t_outs[ci]
                )
    outs = out_planes
    if subsampled:
        # nearest-neighbor upsample to the canvas grid before the
        # component transform — a stated approximation (a color-
        # managed pipeline would interpolate); ICT then applies on
        # full-resolution planes like real 4:2:0 decoders
        outs = [
            np.repeat(
                np.repeat(o, subs[ci][1], axis=0),
                subs[ci][0], axis=1,
            )[:h, :w]
            for ci, o in enumerate(outs)
        ]
    if n_comp == 3 and mct_f:
        if irreversible:
            y, cb, cr = (o.astype(np.float64) for o in outs)
            rr = y + 1.402 * cr
            g = y - 0.344136 * cb - 0.714136 * cr
            bb = y + 1.772 * cb
            outs = [rr, g, bb]
        else:
            y, cb, cr = outs
            g = y - ((cb + cr) >> 2)
            rr = cr + g
            bb = cb + g
            outs = [rr, g, bb]
    half = 1 << (depth - 1)
    maxv = (1 << depth) - 1
    if irreversible:
        full = [
            np.clip(np.floor(o + half + 0.5), 0, maxv).astype(
                np.int64
            )
            for o in outs
        ]
    else:
        full = [
            np.clip(o + half, 0, maxv).astype(np.int64)
            for o in outs
        ]
    # >8-bit components downconvert >> (depth - 8) — the TIFF rule,
    # stated; the engine's pixel contract is uint8
    px = [(f >> (depth - 8)).astype(np.uint8) for f in full]
    pixels = px[0] if n_comp == 1 else np.stack(px, axis=2)
    return {
        "format": "jp2",
        "width": w,
        "height": h,
        "pixels": pixels,
    }


# ---------------------------------------------------------------------------
# 9/7 irreversible path (r13 late): the real-world LOSSY JPEG 2000
# default (OpenJPEG/Kakadu emit single-tile single-layer LRCP 9/7 —
# the Tier-1/2 machinery above is shared; only the wavelet, the
# scalar quantizer, and the component transform differ).
#
# Normalization posture, stated: the four lifting constants and the
# ICT matrix are the spec's exact values; the final K scaling pair
# follows the common implementation convention (low x 1/K forward /
# x K inverse, high x 2/K forward / x K/2 inverse). Encoder and
# decoder mirror each other exactly and the quantizer deltas are
# (eps, mantissa)-coded per subband, so in-repo streams round-trip
# within quantization error by construction; with no independent
# JPEG 2000 implementation in this container the cross-decoder
# normalization cannot be verified here — the same stated
# self-validation tier as the 5/3 path, one notch weaker.

_A97 = -1.586134342059924
_B97 = -0.052980118572961
_G97 = 0.882911075530934
_D97 = 0.443506852043971
_K97 = 1.230174104914001


def _97_odd_neighbors(e: np.ndarray, n: int) -> np.ndarray:
    """For an odd-sample lifting step: elementwise e(i-1) + e(i+1)
    over the even snapshot, with whole-sample symmetric extension
    (e(n) reflects to e(n-2) when n is even). Each output element is
    one float add — the same operand order as the scalar loop."""
    nh = n // 2
    if n % 2 == 0:
        e_next = np.concatenate([e[..., 1:], e[..., -1:]], axis=-1)
    else:
        e_next = e[..., 1:]
    return e[..., :nh] + e_next


def _97_even_neighbors(o: np.ndarray, nl: int) -> np.ndarray:
    """For an even-sample lifting step: elementwise o(i-1) + o(i+1)
    over the odd snapshot with the reflection folded into clipped
    indices (o(-1) = o(0); o(nh) = o(nh-1) when n is odd)."""
    nh = o.shape[-1]
    idx_l = np.clip(np.arange(nl) - 1, 0, nh - 1)
    idx_r = np.clip(np.arange(nl), 0, nh - 1)
    return o[..., idx_l] + o[..., idx_r]


def _fdwt97(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Batched 9/7 analysis along the LAST axis. Each lifting step
    writes one parity reading only the opposite parity's snapshot, so
    the vectorized form performs the identical float operations per
    element as the per-sample loop (prev[i] + coef * (e(i-1)+e(i+1)))
    — bit-exact, not merely close."""
    x = np.asarray(x, np.float64)
    n = x.shape[-1]
    e = x[..., 0::2].copy()
    o = x[..., 1::2].copy()
    if o.shape[-1] == 0:
        return e, o
    nl = e.shape[-1]
    o = o + _A97 * _97_odd_neighbors(e, n)
    e = e + _B97 * _97_even_neighbors(o, nl)
    o = o + _G97 * _97_odd_neighbors(e, n)
    e = e + _D97 * _97_even_neighbors(o, nl)
    return e * (1.0 / _K97), o * (2.0 / _K97)


def _idwt97(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    """Batched 9/7 synthesis along the LAST axis — the elementwise
    inverse lifting ladder of _fdwt97."""
    low = np.asarray(low, np.float64)
    high = np.asarray(high, np.float64)
    nl, nh = low.shape[-1], high.shape[-1]
    n = nl + nh
    e = low * _K97
    o = high * (_K97 / 2.0)
    if nh == 0:
        if n == 1:
            return low.astype(np.float64).copy()
        return e
    e = e - _D97 * _97_even_neighbors(o, nl)
    o = o - _G97 * _97_odd_neighbors(e, n)
    e = e - _B97 * _97_even_neighbors(o, nl)
    o = o - _A97 * _97_odd_neighbors(e, n)
    out = np.empty(low.shape[:-1] + (n,), np.float64)
    out[..., 0::2] = e
    out[..., 1::2] = o
    return out


def _fdwt97_1d(x: np.ndarray):
    x = np.asarray(x)
    if x.shape[-1] == 1:
        return x.astype(np.float64).copy(), np.zeros(0, np.float64)
    return _fdwt97(x)


def _idwt97_1d(low: np.ndarray, high: np.ndarray) -> np.ndarray:
    return _idwt97(np.asarray(low), np.asarray(high))


def _fdwt97_2d(a: np.ndarray):
    lo_cols, hi_cols = _fdwt97(np.asarray(a, np.float64).T)
    lo_cols, hi_cols = lo_cols.T, hi_cols.T
    ll, lh = _fdwt97(lo_cols)
    hl, hh = _fdwt97(hi_cols)
    return ll, lh, hl, hh


def _idwt97_2d(ll, lh, hl, hh):
    rows_l = _idwt97(ll, lh)
    rows_h = _idwt97(hl, hh)
    return _idwt97(rows_l.T, rows_h.T).T


def _delta_to_code(delta: float, r_b: int) -> tuple[int, int]:
    """(eps, mantissa) for QCD style 2 so that
    delta == 2^(r_b - eps) * (1 + mant/2048) EXACTLY as re-derived by
    the decoder (the encoder re-reads its own code)."""
    import math

    e = r_b - math.floor(math.log2(delta))
    m = round((delta / (2.0 ** (r_b - e)) - 1.0) * 2048)
    while m >= 2048:
        e -= 1
        m = round((delta / (2.0 ** (r_b - e)) - 1.0) * 2048)
    while m < 0:
        e += 1
        m = round((delta / (2.0 ** (r_b - e)) - 1.0) * 2048)
    e = max(0, min(31, e))
    m = max(0, min(2047, m))
    return e, m


def _code_to_delta(eps: int, mant: int, r_b: int) -> float:
    return (2.0 ** (r_b - eps)) * (1.0 + mant / 2048.0)
