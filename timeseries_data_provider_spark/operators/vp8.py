"""[EXT] Lossy VP8 keyframe decoder (WebP ``VP8 `` chunks) —
pure-Python/numpy, spec-derived from RFC 6386 (public).

This closes the highest-frequency codec gap the r12 verdict named:
the dominant real-web ``.webp`` form is lossy VP8, and the image
tier could only read the lossless VP8L variant. A single-image WebP
file is always an intra-only KEY frame, which is exactly the subset
implemented here, end to end:

- frame tag + keyframe start code + 14-bit dimensions (RFC 9.1);
- the boolean (arithmetic) entropy decoder (RFC 7);
- full keyframe header: segmentation (map + feature data), loop
  filter parameters and per-segment/per-mode deltas, token partition
  count, quantizer indices with all five deltas, token probability
  updates, skip probability (RFC 9.2-9.11);
- per-macroblock intra modes: 16x16 DC/V/H/TM, B_PRED with all ten
  4x4 sub-modes under the keyframe above/left context model, chroma
  DC/V/H/TM (RFC 11.2-11.5);
- residual tokens across up to eight DCT partitions with the
  band/context probability model, dequantization (incl. the Y2
  x2 / x155/100 / uv-dc-117 rules), inverse WHT for Y2 and the
  35468/20091 inverse DCT (RFC 13, 14.1-14.3);
- reconstruction with the 127/129 border conventions and the
  macroblock-level top-right replication rule for 4x4 prediction;
- the in-loop deblocking filter, both NORMAL (mask + high-edge-
  variance split into subblock and macroblock-edge variants) and
  SIMPLE forms, with per-segment level adjustment, sharpness-derived
  interior limits, and the no-coefficient inner-edge skip (RFC 15).

Interframes (golden/altref prediction) are out of scope for a
single-image corpus tier and raise a named error.

The four large normative constant tables (default/update token
probabilities, keyframe 4x4 mode probabilities, dequant lookups)
are NOT transcribed from memory: ``vp8_tables.py`` pins the values
extracted from the system libwebp binary (tools/
extract_vp8_tables.py — decoder and encoder copies byte-identical),
and tests/test_vp8.py validates this decoder BIT-EXACTLY in YUV
space against libwebp's independent decoder over encoder outputs at
several qualities/sizes, plus a pinned real-world VP8X file. That is
the JDK-javax.imageio posture (BASELINE §C precedent) applied to
WebP: a transcription or convention error here fails a bit-exact
plane comparison loudly instead of emitting silent garbage.

Output contract: ``pixels`` is (h, w, 3) uint8 RGB like every other
decoder in the package; YUV->RGB uses BT.601 limited-range integer
coefficients with nearest-neighbor chroma upsampling (documented
package contract — the *decode* is validated in YUV space, where
bit-exactness is well-defined). An ALPH chunk (VP8X extended
files) decodes to a real alpha channel through
vp8l.decode_alpha_plane (raw and lossless-coded forms, all four
prediction filters) — output becomes (h, w, 4) RGBA, validated
against libwebp's WebPDecodeRGBA.

Hostile-input posture: dimension/area guard before any allocation,
all partition sizes bounds-checked, the boolean decoder tolerates
the spec's read-past-end but caps it, and malformed headers raise
named ValueErrors routed to quarantine by the envelope.

Reference parity: index.js has no image surface; [EXT] SURVEY §2
(VERDICT r12 next-round item 1).
"""

from __future__ import annotations

import numpy as np

from . import vp8_tables as T

__all__ = ["decode_vp8_chunk", "decode_vp8_frame", "MAX_PIXELS"]

MAX_PIXELS = 64 * 1024 * 1024  # same ceiling as the BMP/TIFF tiers

# ---------------------------------------------------------------------------
# mode constants (RFC 6386 numbering)

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# B-mode numbering MUST match the extracted kBModesProba context
# axes (libwebp's enum: RD/VR before LD — the RFC text lists LD
# first, but the tree's bit-pattern -> predictor mapping is
# identical either way; only these context ids index the table).
# Getting this wrong desyncs the mode parse at the first LD/RD/VR
# context — caught by the bit-exact libwebp comparison in tests.
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)

# trees: flat arrays, pairs of entries per internal node; a value
# <= 0 is a leaf (negated mode), a positive value is the index of
# the next node pair (RFC 6386 section 8.2 representation)
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_KF_YMODE_P = (145, 156, 163, 128)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_KF_UV_MODE_P = (142, 114, 183)
_BMODE_TREE = (
    -B_DC, 2, -B_TM, 4, -B_VE, 6, 8, 12, -B_HE, 10, -B_RD, -B_VR,
    -B_LD, 14, -B_VL, 16, -B_HD, -B_HU,
)
_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# token tree (RFC 13.2); leaves are token ids 0..11:
# 0..4 = literal coefficient values, 5..10 = categories, 11 = EOB
_TOK_EOB = 11
_COEFF_TREE = (
    -_TOK_EOB, 2, -0, 4, -1, 6, 8, 12, -2, 10, -3, -4,
    14, 16, -5, -6, 18, 20, -7, -8, -9, -10,
)
# extra-bit categories: token id -> (base value, extra-bit probs)
_CAT = {
    5: (5, (159,)),
    6: (7, (165, 145)),
    7: (11, (173, 148, 140)),
    8: (19, (176, 155, 140, 135)),
    9: (35, (180, 157, 141, 134, 130)),
    10: (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
}
_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
_ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# 16x16 mode -> implied 4x4 sub-mode for the keyframe above/left
# context of NEIGHBORING B_PRED blocks (RFC 11.3)
_MODE_TO_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}


def _nested(flat, *dims):
    """Reshape a flat extracted table into nested tuples."""
    a = np.array(flat, np.int32).reshape(dims)
    return a


_COEFF_PROBS0 = _nested(T.COEFF_PROBS, 4, 8, 3, 11)
_COEFF_UPDATE = _nested(T.COEFF_UPDATE_PROBS, 4, 8, 3, 11)
_KF_BMODE_P = _nested(T.KF_BMODE_PROBS, 10, 10, 9)
_DC_Q = T.DC_QLOOKUP
_AC_Q = T.AC_QLOOKUP


# ---------------------------------------------------------------------------
# boolean decoder (RFC 6386 section 7)


class _Bool:
    __slots__ = ("buf", "n", "pos", "val", "rng", "cnt")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.n = len(buf)
        self.val = 0
        self.pos = 0
        for _ in range(2):
            self.val = (self.val << 8) | (
                buf[self.pos] if self.pos < self.n else 0
            )
            self.pos += 1
        self.rng = 255
        self.cnt = 0

    def bit(self, prob: int) -> int:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        big = split << 8
        if self.val >= big:
            ret = 1
            self.rng -= split
            self.val -= big
        else:
            ret = 0
            self.rng = split
        # renormalize
        while self.rng < 128:
            self.val <<= 1
            self.rng <<= 1
            self.cnt += 1
            if self.cnt == 8:
                self.cnt = 0
                if self.pos < self.n:
                    self.val |= self.buf[self.pos]
                self.pos += 1
                if self.pos > self.n + 16:
                    # the spec allows a few virtual trailing zero
                    # bytes; a parse that runs this far past the
                    # partition is corrupt, not legal spill
                    raise ValueError("vp8: partition over-read")
        return ret

    def literal(self, nbits: int) -> int:
        v = 0
        for _ in range(nbits):
            v = (v << 1) | self.bit(128)
        return v

    def signed_literal(self, nbits: int) -> int:
        v = self.literal(nbits)
        return -v if self.bit(128) else v

    def flagged_delta(self, nbits: int) -> int:
        return self.signed_literal(nbits) if self.bit(128) else 0

    def tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.bit(probs[i >> 1])]
            if i <= 0:
                return -i


def _clamp_q(q: int, hi: int = 127) -> int:
    return 0 if q < 0 else hi if q > hi else q


# ---------------------------------------------------------------------------
# header + mode parsing


def decode_vp8_frame(data: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Decode one VP8 KEY frame to cropped uint8 Y/U/V planes:
    {"width", "height", "y", "u", "v"} (u/v at (h+1)//2 x (w+1)//2).
    Named errors for interframes and malformed streams."""
    if len(data) < 10:
        raise ValueError("vp8: frame tag truncated")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    if tag & 1:
        raise NotImplementedError(
            "vp8: interframe (single-image WebP is always a keyframe)"
        )
    part0_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("vp8: bad keyframe start code")
    width = (data[6] | (data[7] << 8)) & 0x3FFF
    height = (data[8] | (data[9] << 8)) & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("vp8: zero dimension")
    if width * height > max_pixels:
        raise ValueError(
            f"vp8: {width}x{height} exceeds the {max_pixels}-pixel guard"
        )
    if 10 + part0_size > len(data):
        raise ValueError("vp8: first partition truncated")
    bd = _Bool(data[10 : 10 + part0_size])

    bd.literal(1)  # color_space (0 = YCbCr per spec)
    bd.literal(1)  # clamping_type hint; this decoder always clamps

    # --- segmentation (RFC 9.3)
    seg_enabled = bd.bit(128)
    seg_update_map = 0
    seg_abs = 0
    seg_quant = [0, 0, 0, 0]
    seg_lf = [0, 0, 0, 0]
    seg_tree_probs = [255, 255, 255]
    if seg_enabled:
        seg_update_map = bd.bit(128)
        update_data = bd.bit(128)
        if update_data:
            seg_abs = bd.bit(128)
            for i in range(4):
                seg_quant[i] = bd.flagged_delta(7)
            for i in range(4):
                seg_lf[i] = bd.flagged_delta(6)
        if seg_update_map:
            for i in range(3):
                if bd.bit(128):
                    seg_tree_probs[i] = bd.literal(8)

    # --- loop filter (RFC 9.4)
    filter_simple = bd.bit(128)
    filter_level = bd.literal(6)
    sharpness = bd.literal(3)
    lf_delta_enabled = bd.bit(128)
    ref_lf_delta = [0, 0, 0, 0]
    mode_lf_delta = [0, 0, 0, 0]
    if lf_delta_enabled:
        if bd.bit(128):  # update
            for i in range(4):
                if bd.bit(128):
                    ref_lf_delta[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.bit(128):
                    mode_lf_delta[i] = bd.signed_literal(6)

    # --- token partitions (RFC 9.5)
    n_parts = 1 << bd.literal(2)
    rest = data[10 + part0_size :]
    if n_parts > 1:
        sizes_len = 3 * (n_parts - 1)
        if len(rest) < sizes_len:
            raise ValueError("vp8: partition size table truncated")
        sizes = [
            rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
            for i in range(n_parts - 1)
        ]
        body = rest[sizes_len:]
        parts = []
        at = 0
        for s in sizes:
            if at + s > len(body):
                raise ValueError("vp8: token partition truncated")
            parts.append(_Bool(body[at : at + s]))
            at += s
        parts.append(_Bool(body[at:]))
    else:
        parts = [_Bool(rest)]

    # --- quantizers (RFC 9.6)
    y_ac_qi = bd.literal(7)
    y_dc_d = bd.flagged_delta(4)
    y2_dc_d = bd.flagged_delta(4)
    y2_ac_d = bd.flagged_delta(4)
    uv_dc_d = bd.flagged_delta(4)
    uv_ac_d = bd.flagged_delta(4)

    def quants_for(seg: int):
        if seg_enabled:
            q = seg_quant[seg] if seg_abs else y_ac_qi + seg_quant[seg]
        else:
            q = y_ac_qi
        q = _clamp_q(q)
        return (
            _DC_Q[_clamp_q(q + y_dc_d)],
            _AC_Q[q],
            _DC_Q[_clamp_q(q + y2_dc_d)] * 2,
            max(8, (_AC_Q[_clamp_q(q + y2_ac_d)] * 155) // 100),
            _DC_Q[_clamp_q(q + uv_dc_d, 117)],
            _AC_Q[_clamp_q(q + uv_ac_d)],
        )

    seg_quants = [quants_for(s) for s in range(4)]

    bd.bit(128)  # refresh_entropy_probs (meaningless for one frame)

    # --- token probability updates (RFC 13.4)
    probs = _COEFF_PROBS0.copy()
    upd = _COEFF_UPDATE
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    if bd.bit(int(upd[i, j, k, m])):
                        probs[i, j, k, m] = bd.literal(8)
    # pre-build python tuples for the hot token loop
    probs_py = tuple(
        tuple(
            tuple(tuple(int(x) for x in probs[i, j, k]) for k in range(3))
            for j in range(8)
        )
        for i in range(4)
    )

    mb_no_skip = bd.bit(128)
    skip_prob = bd.literal(8) if mb_no_skip else 0

    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16

    # --- per-MB mode parse (all in partition 0, RFC 10/11)
    kf_b = _KF_BMODE_P
    ymodes = np.zeros((mb_h, mb_w), np.uint8)
    uvmodes = np.zeros((mb_h, mb_w), np.uint8)
    segments = np.zeros((mb_h, mb_w), np.uint8)
    skips = np.zeros((mb_h, mb_w), np.uint8)
    # 4x4 sub-mode grid for B_PRED context (B_DC outside the frame)
    sub = np.zeros((4 * mb_h, 4 * mb_w), np.uint8)
    submodes: dict[tuple[int, int], list[int]] = {}
    for my in range(mb_h):
        for mx in range(mb_w):
            if seg_update_map:
                segments[my, mx] = bd.tree(_SEGMENT_TREE, seg_tree_probs)
            if mb_no_skip:
                skips[my, mx] = bd.bit(skip_prob)
            ym = bd.tree(_KF_YMODE_TREE, _KF_YMODE_P)
            ymodes[my, mx] = ym
            if ym == B_PRED:
                blk = []
                for r in range(4):
                    for c in range(4):
                        gy, gx = 4 * my + r, 4 * mx + c
                        above = int(sub[gy - 1, gx]) if gy > 0 else B_DC
                        left = int(sub[gy, gx - 1]) if gx > 0 else B_DC
                        bm = bd.tree(_BMODE_TREE, kf_b[above, left])
                        sub[gy, gx] = bm
                        blk.append(bm)
                submodes[(my, mx)] = blk
            else:
                sub[4 * my : 4 * my + 4, 4 * mx : 4 * mx + 4] = (
                    _MODE_TO_B[ym]
                )
            uvmodes[my, mx] = bd.tree(_UV_MODE_TREE, _KF_UV_MODE_P)

    # --- residual decode (RFC 13)
    # nonzero-context trackers, per 4x4 subblock: above spans the
    # frame width, left resets each MB row. layout per MB:
    # 4 Y + 2 U + 2 V, plus 1 Y2 slot per MB.
    above_nz = np.zeros((mb_w, 8), np.uint8)
    above_nz_y2 = np.zeros(mb_w, np.uint8)
    # coefficient storage: 25 blocks per MB (Y2 + 16 Y + 4 U + 4 V)
    coeffs = np.zeros((mb_h, mb_w, 25, 16), np.int32)
    mb_has_coeffs = np.zeros((mb_h, mb_w), bool)

    def decode_block(bd2, ctx, first, probs_t, qdc, qac, out):
        """Token loop for one 4x4 block; returns 1 if any nonzero."""
        n = first
        nz = 0
        skip_eob = False
        bit = bd2.bit
        tree = _COEFF_TREE
        while n < 16:
            p = probs_t[_BANDS[n]][ctx]
            # inline tree walk; after a zero token the EOB branch is
            # structurally impossible and is skipped (start at node 2)
            i = 2 if skip_eob else 0
            while True:
                i = tree[i + bit(p[i >> 1])]
                if i <= 0:
                    break
            tok = -i
            if tok == _TOK_EOB:
                break
            if tok == 0:
                ctx = 0
                skip_eob = True
                n += 1
                continue
            skip_eob = False
            if tok <= 4:
                val = tok
                ctx = 1 if tok == 1 else 2
            else:
                base, extp = _CAT[tok]
                add = 0
                for pp in extp:
                    add = (add << 1) | bit(pp)
                val = base + add
                ctx = 2
            if bit(128):
                val = -val
            out[_ZIGZAG[n]] = val * (qdc if n == 0 else qac)
            nz = 1
            n += 1
        return nz

    for my in range(mb_h):
        bd2 = parts[my % n_parts]
        left_nz = np.zeros(8, np.uint8)
        left_nz_y2 = 0
        for mx in range(mb_w):
            ym = int(ymodes[my, mx])
            has_y2 = ym != B_PRED
            qy_dc, qy_ac, qy2_dc, qy2_ac, quv_dc, quv_ac = seg_quants[
                int(segments[my, mx])
            ]
            if mb_no_skip and skips[my, mx]:
                left_nz[:] = 0
                above_nz[mx, :] = 0
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mx] = 0
                continue
            mb = coeffs[my, mx]
            any_nz = 0
            if has_y2:
                ctx = left_nz_y2 + above_nz_y2[mx]
                nz = decode_block(
                    bd2, ctx, 0, probs_py[1], qy2_dc, qy2_ac, mb[0]
                )
                left_nz_y2 = nz
                above_nz_y2[mx] = nz
                any_nz |= nz
                ty, first = 0, 1
            else:
                ty, first = 3, 0
            probs_y = probs_py[ty]
            for b in range(16):
                r, c = b >> 2, b & 3
                ctx = int(left_nz[r]) + int(above_nz[mx, c])
                nz = decode_block(
                    bd2, ctx, first, probs_y, qy_dc, qy_ac, mb[1 + b]
                )
                left_nz[r] = nz
                above_nz[mx, c] = nz
                any_nz |= nz
            probs_uv = probs_py[2]
            for plane in range(2):  # U then V
                for b in range(4):
                    r, c = b >> 1, b & 1
                    li, ai = 4 + 2 * plane + r, 4 + 2 * plane + c
                    ctx = int(left_nz[li]) + int(above_nz[mx, ai])
                    nz = decode_block(
                        bd2, ctx, 0, probs_uv, quv_dc, quv_ac,
                        mb[17 + 4 * plane + b],
                    )
                    left_nz[li] = nz
                    above_nz[mx, ai] = nz
                    any_nz |= nz
            mb_has_coeffs[my, mx] = bool(any_nz)

    # --- reconstruction
    y_plane, u_plane, v_plane = _reconstruct(
        mb_w, mb_h, ymodes, uvmodes, submodes, coeffs, width
    )

    # --- loop filter (RFC 15)
    if filter_level > 0:
        lf_levels = np.zeros((mb_h, mb_w), np.int32)
        for my in range(mb_h):
            for mx in range(mb_w):
                if seg_enabled:
                    s = int(segments[my, mx])
                    lvl = seg_lf[s] if seg_abs else filter_level + seg_lf[s]
                else:
                    lvl = filter_level
                if lf_delta_enabled:
                    lvl += ref_lf_delta[0]  # keyframe = INTRA frame
                    if ymodes[my, mx] == B_PRED:
                        lvl += mode_lf_delta[0]
                lf_levels[my, mx] = min(63, max(0, lvl))
        inner_ok = mb_has_coeffs | (ymodes == B_PRED)
        _loop_filter(
            y_plane, u_plane, v_plane, lf_levels, inner_ok,
            filter_simple, sharpness,
        )

    cw, ch = (width + 1) // 2, (height + 1) // 2
    return {
        "width": width,
        "height": height,
        "y": y_plane[:height, :width],
        "u": u_plane[:ch, :cw],
        "v": v_plane[:ch, :cw],
        # diagnostic metadata (tests assert filter/mode coverage)
        "meta": {
            "ymodes": ymodes,
            "uvmodes": uvmodes,
            "submodes": submodes,
            "filter_level": filter_level,
            "filter_simple": filter_simple,
            "sharpness": sharpness,
            "n_parts": n_parts,
            "segments": segments if seg_enabled else None,
        },
    }


# ---------------------------------------------------------------------------
# transforms (RFC 14.3)

def _iwht4x4(blk: np.ndarray) -> np.ndarray:
    b = blk.reshape(4, 4).astype(np.int64)
    a1 = b[0] + b[3]
    b1 = b[1] + b[2]
    c1 = b[1] - b[2]
    d1 = b[0] - b[3]
    t = np.empty((4, 4), np.int64)
    t[0] = a1 + b1
    t[1] = c1 + d1
    t[2] = a1 - b1
    t[3] = d1 - c1
    a1 = t[:, 0] + t[:, 3]
    b1 = t[:, 1] + t[:, 2]
    c1 = t[:, 1] - t[:, 2]
    d1 = t[:, 0] - t[:, 3]
    o = np.empty((4, 4), np.int64)
    o[:, 0] = (a1 + b1 + 3) >> 3
    o[:, 1] = (c1 + d1 + 3) >> 3
    o[:, 2] = (a1 - b1 + 3) >> 3
    o[:, 3] = (d1 - c1 + 3) >> 3
    return o


def _idct4x4(blk: np.ndarray) -> np.ndarray:
    # columns then rows; 35468 = sin(pi/8)*sqrt(2)<<16,
    # 20091 = cos(pi/8)*sqrt(2)<<16 - 1<<16 (RFC 14.3); Python's >>
    # on negatives floors like the C arithmetic shift
    b = blk.reshape(4, 4).astype(np.int64)

    def butterfly(m):
        a1 = m[0] + m[2]
        b1 = m[0] - m[2]
        t1 = (m[1] * 35468) >> 16
        t2 = m[3] + ((m[3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = m[1] + ((m[1] * 20091) >> 16)
        t2 = (m[3] * 35468) >> 16
        d1 = t1 + t2
        return a1 + d1, b1 + c1, b1 - c1, a1 - d1

    r0, r1, r2, r3 = butterfly([b[0], b[1], b[2], b[3]])
    t = np.stack([r0, r1, r2, r3])
    c0, c1, c2, c3 = butterfly([t[:, 0], t[:, 1], t[:, 2], t[:, 3]])
    o = np.stack([c0, c1, c2, c3], axis=1)
    return (o + 4) >> 3


# ---------------------------------------------------------------------------
# intra prediction + reconstruction

def _clip8(a):
    return np.clip(a, 0, 255)


def _pred_16_or_8(plane, py, px, size, mode, have_above, have_left):
    """DC/V/H/TM prediction into a (size, size) block read from the
    padded plane (pad row 0 = 127, pad col 0 = 129)."""
    above = plane[py - 1, px : px + size].astype(np.int32)
    left = plane[py : py + size, px - 1].astype(np.int32)
    al = int(plane[py - 1, px - 1])
    if mode == DC_PRED:
        if have_above and have_left:
            dc = (int(above.sum()) + int(left.sum()) + size) >> (
                5 if size == 16 else 4
            )
        elif have_above:
            dc = (int(above.sum()) + size // 2) >> (4 if size == 16 else 3)
        elif have_left:
            dc = (int(left.sum()) + size // 2) >> (4 if size == 16 else 3)
        else:
            dc = 128
        return np.full((size, size), dc, np.int32)
    if mode == V_PRED:
        return np.tile(above, (size, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, size))
    # TM
    return _clip8(left[:, None] + above[None, :] - al)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _pred_b(mode, A, L, P):
    """One 4x4 sub-mode prediction. A = 8 above/above-right pixels,
    L = 4 left, P = above-left (all int)."""
    o = np.empty((4, 4), np.int32)
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        o[:] = dc
    elif mode == B_TM:
        o[:] = _clip8(
            np.array(L, np.int32)[:, None]
            + np.array(A[:4], np.int32)[None, :]
            - P
        )
    elif mode == B_VE:
        e = [P] + list(A[:5])
        row = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        o[:] = np.array(row, np.int32)[None, :]
    elif mode == B_HE:
        e = [P] + list(L) + [L[3]]
        col = [_avg3(e[i], e[i + 1], e[i + 2]) for i in range(4)]
        o[:] = np.array(col, np.int32)[:, None]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                o[r, c] = (
                    _avg3(A[6], A[7], A[7])
                    if i == 6
                    else _avg3(A[i], A[i + 1], A[i + 2])
                )
    elif mode in (B_RD, B_VR, B_HD):
        pp = [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]]
        if mode == B_RD:
            for r in range(4):
                for c in range(4):
                    d = 3 + c - r
                    o[r, c] = _avg3(pp[d], pp[d + 1], pp[d + 2])
        elif mode == B_VR:
            o[3, 0] = _avg3(pp[1], pp[2], pp[3])
            o[2, 0] = _avg3(pp[2], pp[3], pp[4])
            o[3, 1] = o[1, 0] = _avg3(pp[3], pp[4], pp[5])
            o[2, 1] = o[0, 0] = _avg2(pp[4], pp[5])
            o[3, 2] = o[1, 1] = _avg3(pp[4], pp[5], pp[6])
            o[2, 2] = o[0, 1] = _avg2(pp[5], pp[6])
            o[3, 3] = o[1, 2] = _avg3(pp[5], pp[6], pp[7])
            o[2, 3] = o[0, 2] = _avg2(pp[6], pp[7])
            o[1, 3] = _avg3(pp[6], pp[7], pp[8])
            o[0, 3] = _avg2(pp[7], pp[8])
        else:  # B_HD
            o[3, 0] = _avg2(pp[0], pp[1])
            o[3, 1] = _avg3(pp[0], pp[1], pp[2])
            o[2, 0] = o[3, 2] = _avg2(pp[1], pp[2])
            o[2, 1] = o[3, 3] = _avg3(pp[1], pp[2], pp[3])
            o[2, 2] = o[1, 0] = _avg2(pp[2], pp[3])
            o[2, 3] = o[1, 1] = _avg3(pp[2], pp[3], pp[4])
            o[1, 2] = o[0, 0] = _avg2(pp[3], pp[4])
            o[1, 3] = o[0, 1] = _avg3(pp[3], pp[4], pp[5])
            o[0, 2] = _avg3(pp[4], pp[5], pp[6])
            o[0, 3] = _avg3(pp[5], pp[6], pp[7])
    elif mode == B_VL:
        o[0, 0] = _avg2(A[0], A[1])
        o[1, 0] = _avg3(A[0], A[1], A[2])
        o[2, 0] = o[0, 1] = _avg2(A[1], A[2])
        o[1, 1] = o[3, 0] = _avg3(A[1], A[2], A[3])
        o[2, 1] = o[0, 2] = _avg2(A[2], A[3])
        o[3, 1] = o[1, 2] = _avg3(A[2], A[3], A[4])
        o[2, 2] = o[0, 3] = _avg2(A[3], A[4])
        o[3, 2] = o[1, 3] = _avg3(A[3], A[4], A[5])
        o[2, 3] = _avg3(A[4], A[5], A[6])
        o[3, 3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HU:
        o[0, 0] = _avg2(L[0], L[1])
        o[0, 1] = _avg3(L[0], L[1], L[2])
        o[0, 2] = o[1, 0] = _avg2(L[1], L[2])
        o[0, 3] = o[1, 1] = _avg3(L[1], L[2], L[3])
        o[1, 2] = o[2, 0] = _avg2(L[2], L[3])
        o[1, 3] = o[2, 1] = _avg3(L[2], L[3], L[3])
        o[2, 2] = o[2, 3] = L[3]
        o[3, :] = L[3]
    else:
        raise ValueError(f"vp8: B mode {mode}")
    return o


def _reconstruct(mb_w, mb_h, ymodes, uvmodes, submodes, coeffs, width):
    """Unfiltered intra reconstruction into padded planes. Padding:
    one border row (127) above, one border col (129) left, plus 4
    right columns on luma kept as a replication of the row's last
    pixel for the 4x4 top-right rule. Prediction reads neighbors
    straight from the plane (keyframe prediction is pre-filter)."""
    H, W = 16 * mb_h, 16 * mb_w
    y = np.full((H + 1, W + 1 + 4), 127, np.uint8)
    u = np.full((8 * mb_h + 1, 8 * mb_w + 1), 127, np.uint8)
    v = np.full((8 * mb_h + 1, 8 * mb_w + 1), 127, np.uint8)
    y[1:, 0] = 129
    u[1:, 0] = 129
    v[1:, 0] = 129

    for my in range(mb_h):
        for mx in range(mb_w):
            mb = coeffs[my, mx]
            ym = int(ymodes[my, mx])
            py, px = 1 + 16 * my, 1 + 16 * mx
            have_above, have_left = my > 0, mx > 0
            if ym != B_PRED:
                # scatter the WHT-transformed Y2 into the Y DCs
                y2 = _iwht4x4(mb[0])
                pred = _pred_16_or_8(
                    y, py, px, 16, ym, have_above, have_left
                )
                out = pred.copy()
                for b in range(16):
                    r, c = b >> 2, b & 3
                    blk = mb[1 + b].copy()
                    blk[0] = y2[r, c]
                    res = _idct4x4(blk)
                    out[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                        res.astype(np.int32)
                    )
                y[py : py + 16, px : px + 16] = _clip8(out).astype(
                    np.uint8
                )
            else:
                blkmodes = submodes[(my, mx)]
                # the MB-level top-right 4 pixels, reused by every
                # right-column subblock below row 0 (libwebp's
                # "replicate top-right on the rows below")
                tr = y[py - 1, px + 16 : px + 20].astype(np.int32)
                for b in range(16):
                    r, c = b >> 2, b & 3
                    by, bx = py + 4 * r, px + 4 * c
                    above = y[by - 1, bx : bx + 4].astype(np.int32)
                    if c == 3 and r > 0:
                        ar = tr
                    else:
                        ar = y[by - 1, bx + 4 : bx + 8].astype(np.int32)
                    A = list(above) + list(ar)
                    L = list(y[by : by + 4, bx - 1].astype(np.int32))
                    P = int(y[by - 1, bx - 1])
                    pred = _pred_b(blkmodes[b], A, L, P)
                    res = _idct4x4(mb[1 + b])
                    y[by : by + 4, bx : bx + 4] = _clip8(
                        pred + res.astype(np.int32)
                    ).astype(np.uint8)
            # keep the luma right-extension pads as a replication of
            # each row's last reconstructed pixel (the rightmost-MB
            # top-right convention)
            if mx == mb_w - 1:
                y[py : py + 16, W + 1 : W + 5] = y[
                    py : py + 16, W : W + 1
                ]
            # chroma
            uvm = int(uvmodes[my, mx])
            cy, cx = 1 + 8 * my, 1 + 8 * mx
            for plane, base in ((u, 17), (v, 21)):
                pred = _pred_16_or_8(
                    plane, cy, cx, 8, uvm, have_above, have_left
                )
                out = pred.copy()
                for b in range(4):
                    r, c = b >> 1, b & 1
                    res = _idct4x4(mb[base + b])
                    out[4 * r : 4 * r + 4, 4 * c : 4 * c + 4] += (
                        res.astype(np.int32)
                    )
                plane[cy : cy + 8, cx : cx + 8] = _clip8(out).astype(
                    np.uint8
                )
    return y[1:, 1 : W + 1], u[1:, 1:], v[1:, 1:]


# ---------------------------------------------------------------------------
# loop filter (RFC 15) — vectorized per edge line with numpy

def _c(x):
    return np.clip(x, -128, 127)


def _filter_common(p1, p0, q0, q1, use_outer):
    # the outer-tap term is clamped BEFORE the sum (RFC 15.3's
    # double clamp: a = c(c(P1 - Q1) + 3*(Q0 - P0)))
    a = _c((_c(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    return f1, f2


def _simple_filter(p1, p0, q0, q1, limit):
    mask = (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= limit
    f1, f2 = _filter_common(p1, p0, q0, q1, True)
    q0n = _c(q0 - np.where(mask, f1, 0))
    p0n = _c(p0 + np.where(mask, f2, 0))
    return p0n, q0n


def _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
    return (
        (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
        & ((np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1)) <= edge)
    )


def _hev(p1, p0, q0, q1, thresh):
    return (np.abs(p1 - p0) > thresh) | (np.abs(q1 - q0) > thresh)


def _subblock_filter(px, interior, edge, hev_t):
    """px: int32 array (8, n) of signed (x-128) pixels p3..q3 along
    the edge normal; filtered in place where the mask passes."""
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in range(8))
    mask = _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge)
    hev = _hev(p1, p0, q0, q1, hev_t)
    a = _c(np.where(hev, _c(p1 - q1), 0) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    q0n = _c(q0 - f1)
    p0n = _c(p0 + f2)
    a2 = (f1 + 1) >> 1
    q1n = _c(q1 - np.where(hev, 0, a2))
    p1n = _c(p1 + np.where(hev, 0, a2))
    px[3] = np.where(mask, p0n, p0)
    px[4] = np.where(mask, q0n, q0)
    px[2] = np.where(mask, p1n, p1)
    px[5] = np.where(mask, q1n, q1)


def _mb_filter(px, interior, edge, hev_t):
    p3, p2, p1, p0, q0, q1, q2, q3 = (px[i] for i in range(8))
    mask = _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge)
    hev = _hev(p1, p0, q0, q1, hev_t)
    # high-variance edges get the sharp common adjustment; the rest
    # get the 27/18/9 wide smoothing (RFC 15.3)
    a = _c(_c(p1 - q1) + 3 * (q0 - p0))
    f1 = _c(a + 4) >> 3
    f2 = _c(a + 3) >> 3
    q0_h = _c(q0 - f1)
    p0_h = _c(p0 + f2)
    w = _c(_c(p1 - q1) + 3 * (q0 - p0))
    a27 = (27 * w + 63) >> 7
    a18 = (18 * w + 63) >> 7
    a9 = (9 * w + 63) >> 7
    q0_s = _c(q0 - a27)
    p0_s = _c(p0 + a27)
    q1_s = _c(q1 - a18)
    p1_s = _c(p1 + a18)
    q2_s = _c(q2 - a9)
    p2_s = _c(p2 + a9)
    use_s = mask & ~hev
    use_h = mask & hev
    px[3] = np.where(use_s, p0_s, np.where(use_h, p0_h, p0))
    px[4] = np.where(use_s, q0_s, np.where(use_h, q0_h, q0))
    px[2] = np.where(use_s, p1_s, p1)
    px[5] = np.where(use_s, q1_s, q1)
    px[1] = np.where(use_s, p2_s, p2)
    px[6] = np.where(use_s, q2_s, q2)


def _gather_v(plane, x, y0, n):
    """Signed p3..q3 around the vertical edge at column x (pixels
    plane[y0:y0+n, x-4:x+4]) as an (8, n) int32 array."""
    return plane[y0 : y0 + n, x - 4 : x + 4].astype(np.int32).T - 128


def _scatter_v(plane, x, y0, n, px):
    plane[y0 : y0 + n, x - 4 : x + 4] = (px.T + 128).astype(np.uint8)


def _gather_h(plane, y, x0, n):
    return plane[y - 4 : y + 4, x0 : x0 + n].astype(np.int32) - 128


def _scatter_h(plane, y, x0, n, px):
    plane[y - 4 : y + 4, x0 : x0 + n] = (px + 128).astype(np.uint8)


def _loop_filter(y, u, v, levels, inner_ok, simple, sharpness):
    mb_h, mb_w = levels.shape
    for my in range(mb_h):
        for mx in range(mb_w):
            lvl = int(levels[my, mx])
            if lvl == 0:
                continue
            interior = lvl
            if sharpness:
                interior >>= 2 if sharpness > 4 else 1
                if interior > 9 - sharpness:
                    interior = 9 - sharpness
            if interior < 1:
                interior = 1
            mb_edge = ((lvl + 2) * 2) + interior
            sb_edge = (lvl * 2) + interior
            hev_t = 2 if lvl >= 40 else (1 if lvl >= 15 else 0)
            inner = bool(inner_ok[my, mx])
            yy, yx = 16 * my, 16 * mx
            cy, cx = 8 * my, 8 * mx
            if simple:
                # luma only, p1..q1 mask (RFC 15.1)
                if mx > 0:
                    px = _gather_v(y, yx, yy, 16)
                    p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
                    px[3], px[4] = _simple_filter(p1, p0, q0, q1, mb_edge)
                    _scatter_v(y, yx, yy, 16, px)
                if inner:
                    for dx in (4, 8, 12):
                        px = _gather_v(y, yx + dx, yy, 16)
                        p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
                        px[3], px[4] = _simple_filter(
                            p1, p0, q0, q1, sb_edge
                        )
                        _scatter_v(y, yx + dx, yy, 16, px)
                if my > 0:
                    px = _gather_h(y, yy, yx, 16)
                    p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
                    px[3], px[4] = _simple_filter(p1, p0, q0, q1, mb_edge)
                    _scatter_h(y, yy, yx, 16, px)
                if inner:
                    for dy in (4, 8, 12):
                        px = _gather_h(y, yy + dy, yx, 16)
                        p1, p0, q0, q1 = px[2], px[3], px[4], px[5]
                        px[3], px[4] = _simple_filter(
                            p1, p0, q0, q1, sb_edge
                        )
                        _scatter_h(y, yy + dy, yx, 16, px)
                continue
            # normal filter: luma + chroma
            if mx > 0:
                px = _gather_v(y, yx, yy, 16)
                _mb_filter(px, interior, mb_edge, hev_t)
                _scatter_v(y, yx, yy, 16, px)
                for pl in (u, v):
                    px = _gather_v(pl, cx, cy, 8)
                    _mb_filter(px, interior, mb_edge, hev_t)
                    _scatter_v(pl, cx, cy, 8, px)
            if inner:
                for dx in (4, 8, 12):
                    px = _gather_v(y, yx + dx, yy, 16)
                    _subblock_filter(px, interior, sb_edge, hev_t)
                    _scatter_v(y, yx + dx, yy, 16, px)
                for pl in (u, v):
                    px = _gather_v(pl, cx + 4, cy, 8)
                    _subblock_filter(px, interior, sb_edge, hev_t)
                    _scatter_v(pl, cx + 4, cy, 8, px)
            if my > 0:
                px = _gather_h(y, yy, yx, 16)
                _mb_filter(px, interior, mb_edge, hev_t)
                _scatter_h(y, yy, yx, 16, px)
                for pl in (u, v):
                    px = _gather_h(pl, cy, cx, 8)
                    _mb_filter(px, interior, mb_edge, hev_t)
                    _scatter_h(pl, cy, cx, 8, px)
            if inner:
                for dy in (4, 8, 12):
                    px = _gather_h(y, yy + dy, yx, 16)
                    _subblock_filter(px, interior, sb_edge, hev_t)
                    _scatter_h(y, yy + dy, yx, 16, px)
                for pl in (u, v):
                    px = _gather_h(pl, cy + 4, cx, 8)
                    _subblock_filter(px, interior, sb_edge, hev_t)
                    _scatter_h(pl, cy + 4, cx, 8, px)


# ---------------------------------------------------------------------------
# RGB conversion + container entry

def _yuv_to_rgb(yp, up, vp):
    """BT.601 limited-range integer conversion with nearest-neighbor
    chroma upsampling — the package's documented contract (the codec
    itself is validated in YUV space)."""
    h, w = yp.shape
    u2 = np.repeat(np.repeat(up, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    v2 = np.repeat(np.repeat(vp, 2, 0), 2, 1)[:h, :w].astype(np.int32)
    c = 298 * (yp.astype(np.int32) - 16)
    d = u2 - 128
    e = v2 - 128
    r = (c + 409 * e + 128) >> 8
    g = (c - 100 * d - 208 * e + 128) >> 8
    b = (c + 516 * d + 128) >> 8
    return np.stack(
        [_clip8(r), _clip8(g), _clip8(b)], axis=2
    ).astype(np.uint8)


def decode_vp8_chunk(body: bytes, max_pixels: int = MAX_PIXELS) -> dict:
    """Decode a WebP ``VP8 `` chunk body to the package image dict
    {format, width, height, pixels(RGB)}."""
    f = decode_vp8_frame(body, max_pixels)
    return {
        "format": "webp",
        "width": f["width"],
        "height": f["height"],
        "pixels": _yuv_to_rgb(f["y"], f["u"], f["v"]),
    }


# ---------------------------------------------------------------------------
# fixture/corpus encoder: a minimal spec-driven VP8 keyframe WRITER.
#
# It does NOT do rate-distortion or even a forward transform — the
# caller hands it per-MB modes and per-block quantized coefficient
# LEVELS (zigzag scan order), and it emits a conformant keyframe
# bitstream: the q63 corpus plants and the tests drive the paths the
# libwebp simple API never emits (simple filter, 2/4/8 token
# partitions, segmentation with per-segment quantizers, cat1..cat6
# token magnitudes, chosen 4x4 sub-modes). libwebp's decoder stays
# the independent oracle for every stream this writer produces.


class _BoolEnc:
    """RFC 6386 section 7.3 boolean encoder (24-bit window with
    carry propagation into already-emitted bytes)."""

    __slots__ = ("rng", "bottom", "bit_count", "out")

    def __init__(self):
        self.rng = 255
        self.bottom = 0
        self.bit_count = 24
        self.out = bytearray()

    def put(self, prob: int, v: int) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if v:
            self.bottom += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            if self.bottom & (1 << 31):
                i = len(self.out) - 1
                while i >= 0 and self.out[i] == 0xFF:
                    self.out[i] = 0
                    i -= 1
                if i >= 0:
                    self.out[i] += 1
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flagged_signed(self, v: int, nbits: int) -> None:
        if v == 0:
            self.put(128, 0)
        else:
            self.put(128, 1)
            self.literal(abs(v), nbits)
            self.put(128, 1 if v < 0 else 0)

    def finish(self) -> bytes:
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


def _tree_paths(tree) -> dict[int, list[tuple[int, int]]]:
    paths: dict[int, list[tuple[int, int]]] = {}

    def walk(i, path):
        for b in (0, 1):
            v = tree[i + b]
            step = path + [(i >> 1, b)]
            if v <= 0:
                paths[-v] = step
            else:
                walk(v, step)

    walk(0, [])
    return paths


_COEFF_PATHS = _tree_paths(_COEFF_TREE)
_YMODE_PATHS = _tree_paths(_KF_YMODE_TREE)
_UV_PATHS = _tree_paths(_UV_MODE_TREE)
_BMODE_PATHS = _tree_paths(_BMODE_TREE)
_SEG_PATHS = _tree_paths(_SEGMENT_TREE)


def _tree_put(enc, paths, probs, sym, skip_first=False):
    path = paths[sym]
    if skip_first:
        path = path[1:]
    for pi, b in path:
        enc.put(int(probs[pi]), b)


def _level_token(a: int) -> int:
    if a <= 4:
        return a
    for tok in (5, 6, 7, 8, 9, 10):
        base, extp = _CAT[tok]
        if a < base + (1 << len(extp)):
            return tok
    raise ValueError(f"vp8 encoder: coefficient level {a} > cat6 max")


def _encode_block(enc, probs_t, ctx, first, levels) -> int:
    """Token-encode one block's zigzag-scan LEVELS; returns nonzero
    flag. Mirrors decode_block exactly (same band/ctx/skip-EOB)."""
    last = -1
    for i in range(first, 16):
        if levels[i]:
            last = i
    n = first
    nz = 0
    skip_eob = False
    while n < 16:
        p = probs_t[_BANDS[n]][ctx]
        if n > last:
            _tree_put(enc, _COEFF_PATHS, p, _TOK_EOB)
            return nz
        v = int(levels[n])
        a = abs(v)
        tok = _level_token(a)
        _tree_put(enc, _COEFF_PATHS, p, tok, skip_first=skip_eob)
        if tok == 0:
            ctx = 0
            skip_eob = True
            n += 1
            continue
        skip_eob = False
        if tok > 4:
            base, extp = _CAT[tok]
            extra = a - base
            for i, pp in enumerate(extp):
                enc.put(pp, (extra >> (len(extp) - 1 - i)) & 1)
        enc.put(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        nz = 1
        n += 1
    return nz


def encode_vp8_frame(
    width: int,
    height: int,
    mbs: list,
    q_index: int = 8,
    quant_deltas=(0, 0, 0, 0, 0),
    filter_level: int = 0,
    filter_simple: bool = False,
    sharpness: int = 0,
    n_parts: int = 1,
    segmentation: dict | None = None,
    skip_prob: int = 192,
) -> bytes:
    """Write one keyframe. ``mbs`` is raster-order per-MB dicts:
    {"ymode", "uvmode", "submodes" (16 ids, B_PRED only),
    "skip" (bool), "segment" (int), "coeffs" ((25, 16) int levels in
    zigzag scan order: Y2, 16 Y, 4 U, 4 V)}. ``segmentation`` =
    {"abs": bool, "quants": [4], "lf": [4], "tree_probs": [3]}.
    Returns the ``VP8 `` chunk body."""
    mb_w = (width + 15) // 16
    mb_h = (height + 15) // 16
    if len(mbs) != mb_w * mb_h:
        raise ValueError("encode_vp8_frame: MB count mismatch")
    if n_parts not in (1, 2, 4, 8):
        raise ValueError("encode_vp8_frame: partitions must be 1/2/4/8")
    # Dequantized-coefficient gamut guard: real encoders only emit
    # coefficients whose dequantized magnitude is bounded by the
    # 8-bit pixel range plus transform headroom; far outside that,
    # SIMD decoder builds (16-bit lanes) legitimately diverge from
    # the C reference (measured: libwebp's SSE path departs above
    # ~2048 per dequantized coefficient). The fixture writer stays
    # inside the domain where every conformant decoder agrees.
    def _check_gamut(levels, factor_dc, factor_ac, first, where):
        for i in range(first, 16):
            f = factor_dc if i == 0 else factor_ac
            if abs(int(levels[i])) * f > 2048:
                raise ValueError(
                    f"encode_vp8_frame: {where} level {levels[i]} x "
                    f"quant {f} exceeds the 2048 dequantized-"
                    "coefficient gamut"
                )
    e = _BoolEnc()
    e.literal(0, 1)  # color_space
    e.literal(0, 1)  # clamping_type
    if segmentation is not None:
        e.put(128, 1)
        e.put(128, 1)  # update map
        e.put(128, 1)  # update data
        e.put(128, 1 if segmentation.get("abs") else 0)
        for v in segmentation.get("quants", [0, 0, 0, 0]):
            e.flagged_signed(v, 7)
        for v in segmentation.get("lf", [0, 0, 0, 0]):
            e.flagged_signed(v, 6)
        tree_probs = segmentation.get("tree_probs", [128, 128, 128])
        for p in tree_probs:
            e.put(128, 1)
            e.literal(p, 8)
    else:
        e.put(128, 0)
    e.put(128, 1 if filter_simple else 0)
    e.literal(filter_level, 6)
    e.literal(sharpness, 3)
    e.put(128, 0)  # loop-filter deltas off
    e.literal({1: 0, 2: 1, 4: 2, 8: 3}[n_parts], 2)
    e.literal(q_index, 7)
    for d in quant_deltas:
        e.flagged_signed(d, 4)
    e.put(128, 0)  # refresh_entropy_probs
    upd = _COEFF_UPDATE
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for m in range(11):
                    e.put(int(upd[i, j, k, m]), 0)  # keep defaults
    e.put(128, 1)  # mb_no_coeff_skip
    e.literal(skip_prob, 8)

    # per-MB modes (same context model as the decoder)
    sub = np.zeros((4 * mb_h, 4 * mb_w), np.uint8)
    tp = (
        segmentation.get("tree_probs", [128, 128, 128])
        if segmentation is not None
        else None
    )
    for my in range(mb_h):
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            if segmentation is not None:
                _tree_put(e, _SEG_PATHS, tp, mb.get("segment", 0))
            e.put(skip_prob, 1 if mb.get("skip") else 0)
            ym = mb["ymode"]
            _tree_put(e, _YMODE_PATHS, _KF_YMODE_P, ym)
            if ym == B_PRED:
                modes = mb["submodes"]
                for r in range(4):
                    for c in range(4):
                        gy, gx = 4 * my + r, 4 * mx + c
                        above = int(sub[gy - 1, gx]) if gy > 0 else B_DC
                        left = int(sub[gy, gx - 1]) if gx > 0 else B_DC
                        bm = modes[4 * r + c]
                        _tree_put(
                            e, _BMODE_PATHS, _KF_BMODE_P[above, left], bm
                        )
                        sub[gy, gx] = bm
            else:
                sub[4 * my : 4 * my + 4, 4 * mx : 4 * mx + 4] = (
                    _MODE_TO_B[ym]
                )
            _tree_put(e, _UV_PATHS, _KF_UV_MODE_P, mb["uvmode"])
    part0 = e.finish()

    # token partitions
    probs_py = tuple(
        tuple(
            tuple(
                tuple(int(x) for x in _COEFF_PROBS0[i, j, k])
                for k in range(3)
            )
            for j in range(8)
        )
        for i in range(4)
    )
    def _quants_for(seg_id):
        if segmentation is not None:
            sq = segmentation.get("quants", [0] * 4)[seg_id]
            q = sq if segmentation.get("abs") else q_index + sq
        else:
            q = q_index
        q = _clamp_q(q)
        d = quant_deltas
        return (
            _DC_Q[_clamp_q(q + d[0])],
            _AC_Q[q],
            _DC_Q[_clamp_q(q + d[1])] * 2,
            max(8, (_AC_Q[_clamp_q(q + d[2])] * 155) // 100),
            _DC_Q[_clamp_q(q + d[3], 117)],
            _AC_Q[_clamp_q(q + d[4])],
        )

    encs = [_BoolEnc() for _ in range(n_parts)]
    above_nz = np.zeros((mb_w, 8), np.uint8)
    above_nz_y2 = np.zeros(mb_w, np.uint8)
    for my in range(mb_h):
        enc = encs[my % n_parts]
        left_nz = np.zeros(8, np.uint8)
        left_nz_y2 = 0
        for mx in range(mb_w):
            mb = mbs[my * mb_w + mx]
            ym = mb["ymode"]
            has_y2 = ym != B_PRED
            co = np.asarray(mb.get("coeffs", np.zeros((25, 16), int)))
            qy_dc, qy_ac, qy2_dc, qy2_ac, quv_dc, quv_ac = _quants_for(
                mb.get("segment", 0)
            )
            if has_y2:
                _check_gamut(co[0], qy2_dc, qy2_ac, 0, "Y2")
            for b in range(16):
                _check_gamut(
                    co[1 + b], qy_dc, qy_ac, 1 if has_y2 else 0, "Y"
                )
            for b in range(8):
                _check_gamut(co[17 + b], quv_dc, quv_ac, 0, "UV")
            if mb.get("skip"):
                if co.any():
                    raise ValueError(
                        "encode_vp8_frame: skipped MB with coefficients"
                    )
                left_nz[:] = 0
                above_nz[mx, :] = 0
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mx] = 0
                continue
            if has_y2:
                ctx = left_nz_y2 + above_nz_y2[mx]
                nz = _encode_block(enc, probs_py[1], ctx, 0, co[0])
                left_nz_y2 = nz
                above_nz_y2[mx] = nz
                ty, first = 0, 1
            else:
                if co[0].any():
                    raise ValueError(
                        "encode_vp8_frame: B_PRED MB with Y2 levels"
                    )
                ty, first = 3, 0
            for b in range(16):
                r, c = b >> 2, b & 3
                ctx = int(left_nz[r]) + int(above_nz[mx, c])
                nz = _encode_block(
                    enc, probs_py[ty], ctx, first, co[1 + b]
                )
                left_nz[r] = nz
                above_nz[mx, c] = nz
            for plane in range(2):
                for b in range(4):
                    r, c = b >> 1, b & 1
                    li, ai = 4 + 2 * plane + r, 4 + 2 * plane + c
                    ctx = int(left_nz[li]) + int(above_nz[mx, ai])
                    nz = _encode_block(
                        enc, probs_py[2], ctx, 0, co[17 + 4 * plane + b]
                    )
                    left_nz[li] = nz
                    above_nz[mx, ai] = nz
    bodies = [x.finish() for x in encs]

    tag = (len(part0) << 5) | (1 << 4)  # keyframe, version 0, shown
    head = (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + width.to_bytes(2, "little")
        + height.to_bytes(2, "little")
    )
    sizes = b"".join(len(b).to_bytes(3, "little") for b in bodies[:-1])
    return head + part0 + sizes + b"".join(bodies)


def encode_webp(frame_body: bytes) -> bytes:
    """Wrap a ``VP8 `` chunk body in a RIFF WebP container."""
    chunk = b"VP8 " + len(frame_body).to_bytes(4, "little") + frame_body
    if len(frame_body) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
