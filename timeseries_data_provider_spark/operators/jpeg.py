"""[EXT] Pure-numpy baseline JPEG codec (VERDICT r5 item 7): the
highest-value missing capability for a real multimodal corpus — most
crawled image data is JPEG — implemented against the public JPEG/JFIF
baseline process with ONLY the stdlib + numpy (this container has no
PIL/libjpeg), and shipped as a plug-in for the codec registry in
``operators/multimodal.py``:

    from timeseries_data_provider_spark.operators import jpeg
    media_features(df, codec_setup=jpeg.register)   # worker-side hook

Scope (honest): BASELINE SEQUENTIAL only — 8-bit samples, Huffman
entropy coding, grayscale or YCbCr with any H/V sampling factors
(4:4:4 / 4:2:2 / 4:2:0 covered), restart markers (DRI) supported,
plus the Adobe/APP14 color family (r12): 4-component CMYK and YCCK
incl. the inverted-storage convention (decoded pixels are TRUE CMYK,
(h, w, 4)), and transform-0 direct-stored RGB. Arithmetic coding,
12-bit, and hierarchical modes raise ``NotImplementedError`` naming
the gap — same contract as the other plug-in points (progressive
SOF2 decodes since r10). Throughput is Python-loop bound in the Huffman
stage (~the cost honesty of a stdlib codec); the Spark-side value is
that the full decode path — schema, Arrow batching, registry
distribution to workers — runs REAL bytes end to end.

``encode_baseline_jpeg`` is the matching minimal encoder (used by the
declared q63 JPEG branch and the round-trip tests): it emits valid
baseline JFIF with per-image canonical Huffman tables (single code
length, all-ones code left unused) rather than the Annex K defaults —
any spec-compliant decoder accepts explicit DHT segments. With the
default all-ones quantization tables a solid-color image round-trips
EXACTLY (the DCT of a constant block is a lone DC coefficient), which
is what makes the q63 branch closed-form for the DuckDB oracle.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------------------
# shared constants

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: M[u, x] = c(u)/2 * cos((2x+1)u*pi/16)
_DCT_M = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCT_M[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _DCT_M @ block @ _DCT_M.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _DCT_M.T @ coef @ _DCT_M


# --------------------------------------------------------------------------
# decoder

class _Marker(Exception):
    def __init__(self, code: int):
        self.code = code


class _BitReader:
    """Entropy-segment bit reader: MSB-first, 0xFF00 byte-stuffing
    removed on the fly; a bare 0xFF-marker raises ``_Marker`` so the
    MCU loop can handle restart/EOI.

    Hot-path design (the Huffman stage is the codec's honest Python
    cost — §C jpegdecode row): ``fill`` buffers whole bytes WITHOUT
    raising at markers/EOF so ``_huff_decode`` can peek 8 bits and
    hit a 256-entry LUT, and ``bits`` extracts multi-bit fields in
    one shift instead of a per-bit loop. Buffering stops AT markers,
    so consume-side semantics (``_Marker`` from ``bit()``) are
    byte-identical to the unbuffered reader; after a scan,
    ``self.pos`` may sit before buffered-but-unconsumed PADDING
    bytes only — both scan-end consumers (restart alignment, the
    progressive next-marker scan) skip padding themselves."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.cur = 0
        self.nbits = 0

    def _load(self) -> None:
        d = self.data
        if self.pos + 1 >= len(d):
            raise ValueError("jpeg: truncated scan data")
        b = d[self.pos]
        if b == 0xFF:
            m = d[self.pos + 1]
            if m == 0x00:
                self.pos += 2
            else:
                raise _Marker(m)
        else:
            self.pos += 1
        self.cur = (self.cur << 8) | b
        self.nbits += 8

    def fill(self, n: int) -> int:
        """Buffer bytes until >= n bits are available or a marker/EOF
        blocks; never raises — returns the available bit count."""
        d = self.data
        end = len(d) - 1
        while self.nbits < n:
            p = self.pos
            if p >= end:
                break
            b = d[p]
            if b == 0xFF:
                if d[p + 1] != 0x00:
                    break
                self.pos = p + 2
            else:
                self.pos = p + 1
            self.cur = (self.cur << 8) | b
            self.nbits += 8
        return self.nbits

    def bit(self) -> int:
        if self.nbits == 0:
            self._load()
        self.nbits -= 1
        return (self.cur >> self.nbits) & 1

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.fill(n) >= n:
            self.nbits -= n
            v = (self.cur >> self.nbits) & ((1 << n) - 1)
            self.cur &= (1 << self.nbits) - 1
            return v
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def byte_align(self) -> None:
        self.nbits = 0
        self.cur = 0

    def expect_marker(self) -> int:
        """After byte_align: consume an 0xFF-marker (restart). Skips
        0xFF fill bytes AND a stuffed 0xFF00 padding byte — an
        all-ones padded byte is emitted as FF 00 and may precede the
        marker when buffering didn't consume it."""
        d = self.data
        while True:
            if d[self.pos] == 0xFF and d[self.pos + 1] == 0x00:
                self.pos += 2
                continue
            if d[self.pos] == 0xFF and d[self.pos + 1] == 0xFF:
                self.pos += 1  # fill byte
                continue
            break
        if d[self.pos] != 0xFF:
            raise ValueError("jpeg: expected restart marker")
        m = d[self.pos + 1]
        self.pos += 2
        return m


def _build_huff(bits: list[int], vals: bytes) -> tuple[dict, list]:
    """Canonical JPEG Huffman reconstruction:
    ({(length, code): symbol}, 256-entry LUT for codes <= 8 bits).
    LUT entry = (symbol, length) replicated across the 2^(8-length)
    prefixes, or None where the code is longer than 8 bits (slow
    dict walk — rare in real streams)."""
    table = {}
    lut: list = [None] * 256
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            table[(ln, code)] = vals[k]
            if ln <= 8:
                base = code << (8 - ln)
                hit = (vals[k], ln)
                for i in range(1 << (8 - ln)):
                    lut[base + i] = hit
            code += 1
            k += 1
        code <<= 1
    return table, lut


def _huff_decode(reader: _BitReader, table: tuple[dict, list]) -> int:
    avail = reader.fill(8)
    if avail:
        nb = reader.nbits
        peek = (
            (reader.cur >> (nb - 8)) & 0xFF
            if nb >= 8
            else (reader.cur << (8 - nb)) & 0xFF
        )
        hit = table[1][peek]
        if hit is not None and hit[1] <= avail:
            reader.nbits = nb - hit[1]
            reader.cur &= (1 << reader.nbits) - 1
            return hit[0]
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | reader.bit()
        sym = table[0].get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("jpeg: invalid Huffman code in scan data")


def _extend(v: int, n: int) -> int:
    if n == 0:
        return 0
    return v if v >= (1 << (n - 1)) else v - (1 << n) + 1


def decode_baseline_jpeg(
    payload: bytes, max_pixels: int = 100_000_000
) -> dict:
    """Decode a baseline-sequential JFIF payload to the image codec
    contract dict: {format, width, height, pixels} with pixels an
    (h, w, 3) uint8 RGB grid (or (h, w) for single-component files).

    ``max_pixels`` bounds the allocation a hostile header can demand
    (a 12-byte file claiming 65535x65535 would otherwise commit ~100
    GB of planes inside a Python worker — corpus bytes are untrusted
    input). EVERY malformed payload fails as ``ValueError('jpeg:
    ...')`` (unsupported-but-valid modes as NotImplementedError) — a
    corpus triage path classifies on that contract, so raw
    IndexError/struct.error from truncated headers must not escape
    (review finding)."""
    try:
        return _decode_baseline(payload, max_pixels)
    except (IndexError, struct.error) as ex:
        raise ValueError(
            f"jpeg: truncated or corrupt payload ({ex})"
        ) from ex


def _decode_baseline(payload: bytes, max_pixels: int) -> dict:
    if payload[:2] != b"\xff\xd8":
        raise ValueError("jpeg: missing SOI marker")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    dri = 0
    adobe = None  # APP14 ColorTransform (None = no Adobe marker)
    n = len(payload)
    while pos < n:
        if payload[pos] != 0xFF:
            raise ValueError(f"jpeg: expected marker at offset {pos}")
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            if marker == 0xD9:
                raise ValueError("jpeg: EOI before SOS")
            continue
        seg_len = struct.unpack(">H", payload[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(
                f"jpeg: truncated segment for marker 0x{marker:02X} "
                f"(claims {seg_len} bytes)"
            )
        seg = payload[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                width = 64 if pq == 0 else 128
                if p + width > len(seg):
                    raise ValueError(
                        "jpeg: truncated DQT table body"
                    )
                if pq == 0:
                    tbl = np.frombuffer(
                        seg, np.uint8, count=64, offset=p
                    ).astype(np.float64)
                else:
                    tbl = (
                        np.frombuffer(seg, ">u2", count=64, offset=p)
                        .astype(np.float64)
                    )
                p += width
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec = seg[0]
            if prec != 8:
                raise NotImplementedError(
                    f"jpeg: {prec}-bit precision (baseline is 8-bit)"
                )
            h, w = struct.unpack(">HH", seg[1:5])
            if h == 0 or w == 0:
                raise ValueError("jpeg: zero image dimension in SOF")
            if h * w > max_pixels:
                raise ValueError(
                    f"jpeg: {w}x{h} exceeds max_pixels={max_pixels} "
                    "(untrusted-header allocation guard)"
                )
            ncomp = seg[5]
            if ncomp not in (1, 3, 4):
                # reject BEFORE the scan decoder allocates per-component
                # planes: a hostile SOF claiming 255 components at
                # ~max_pixels would otherwise commit ncomp * max_pixels
                # * 8 bytes of float64 planes before the old
                # post-decode check fired (review finding)
                raise NotImplementedError(
                    f"jpeg: {ncomp}-component frame not supported — "
                    "grayscale, YCbCr/RGB, and CMYK/YCCK only"
                )
            if len(seg) < 6 + 3 * ncomp:
                raise ValueError(
                    f"jpeg: truncated SOF ({ncomp} components claimed)"
                )
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            # validate sampling factors HERE, before either scan
            # decoder runs: the progressive path has no equivalent of
            # _decode_scan's per-scan check, so a hostile SOF2 with a
            # zero H/V nibble used to reach _comp_grids and escape the
            # ValueError/NotImplementedError contract as a
            # ZeroDivisionError (ADVICE r7 high finding)
            _check_sampling(comps)
            frame = {
                "w": w,
                "h": h,
                "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF marker 0x{marker:02X} (extended/arithmetic/"
                "hierarchical) not supported — baseline sequential only"
            )
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xEE and seg[:5] == b"Adobe":
            # APP14 "Adobe" (Adobe TN 5116): 5-byte tag, 2-byte
            # DCTEncodeVersion, 2+2 flag words, then the
            # ColorTransform byte — 0 none (CMYK/RGB as stored),
            # 1 YCbCr, 2 YCCK. Governs 3/4-component color
            # interpretation AND marks the inverted-CMYK storage
            # convention Adobe writers use.
            if len(seg) >= 12:
                adobe = seg[11]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("jpeg: SOS before SOF")
            frame["adobe"] = adobe
            if frame["progressive"]:
                # progressive streams carry MANY scans — hand the
                # whole remaining stream (this SOS included) to the
                # multi-scan decoder, which owns qt/huff/dri updates
                # between scans
                return _decode_progressive(
                    payload, pos - 2, frame, qt, huff, dri
                )
            ns = seg[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    f"jpeg: {ns}-component scan over a "
                    f"{len(frame['comps'])}-component frame "
                    "(non-interleaved multi-scan) not supported — "
                    "baseline single-scan only"
                )
            scan_tbl = {}
            for si in range(ns):
                cid = seg[1 + 2 * si]
                tsel = seg[2 + 2 * si]
                scan_tbl[cid] = (tsel >> 4, tsel & 0xF)
            return _decode_scan(
                payload, pos + seg_len, frame, scan_tbl, qt, huff, dri
            )
        pos += seg_len
    raise ValueError("jpeg: no SOS marker found")


def _check_sampling(comps: list[dict]) -> None:
    """Shared SOF-time sampling-factor validation for the baseline and
    progressive paths. Zero nibbles are malformed (T.81 B.2.2 requires
    1-4) -> ValueError; spec-legal non-integer ratios (e.g. 3x1 luma
    over 2x1 chroma) are a named gap of the pixel-replication
    upsampler -> NotImplementedError."""
    for c in comps:
        if not (1 <= c["h"] <= 4) or not (1 <= c["v"] <= 4):
            raise ValueError(
                f"jpeg: sampling factor {c['h']}x{c['v']} outside the "
                "spec range 1-4 (T.81 B.2.2)"
            )
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise NotImplementedError(
                f"jpeg: non-integer sampling ratio {c['h']}x{c['v']} "
                f"vs max {hmax}x{vmax} (spec-legal but exotic; the "
                "pixel-replication upsampler requires integer ratios)"
            )


def _coefs_to_plane(zz_coefs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Dequantize + de-zigzag + IDCT a whole component at once:
    ``zz_coefs`` is (blocks_y, blocks_x, 64) int32 in zigzag order,
    ``q`` the 64-entry zigzag-order quant table. Vectorized over all
    blocks (einsum both 8-point DCT contractions) — the per-block
    Python loop only exists in the Huffman stage now."""
    deq = zz_coefs.astype(np.float64) * q
    nat = np.zeros_like(deq)
    nat[..., _ZIGZAG] = deq
    by, bx = nat.shape[:2]
    b8 = nat.reshape(by, bx, 8, 8)
    # idct(C) = M.T @ C @ M, batched: out[i,j] = sum_uv M[u,i] C[u,v] M[v,j]
    spat = np.einsum("ui,yxuv,vj->yxij", _DCT_M, b8, _DCT_M) + 128.0
    return spat.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)


def _assemble_image(frame: dict, planes: list[np.ndarray]) -> dict:
    """Crop each component plane to its true size, upsample to full
    resolution (pixel replication), color-convert — shared tail of the
    baseline and progressive decode paths."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    full = []
    for ci, c in enumerate(comps):
        cw = -(-w * c["h"] // hmax)  # ceil
        ch = -(-h * c["v"] // vmax)
        p = planes[ci][:ch, :cw]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(
                np.repeat(p, vmax // c["v"], axis=0),
                hmax // c["h"],
                axis=1,
            )
        full.append(p[:h, :w])

    adobe = frame.get("adobe")
    if len(comps) == 1:
        px = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return {"format": "jpeg", "width": w, "height": h, "pixels": px}

    def ycc_to_rgb(y, cb, cr):
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        return r, g, b

    if len(comps) == 4:
        # CMYK family (Adobe TN 5116). Output is TRUE CMYK (h, w, 4):
        # Adobe writers store all four channels INVERTED (the
        # libjpeg-documented convention), which this path undoes when
        # the APP14 marker is present; a 4-component file WITHOUT the
        # marker is taken as non-inverted CMYK (stated choice —
        # behavior varies in the wild, and such files are rare).
        if adobe == 2:  # YCCK: YCbCr over the inverted C'M'Y' + K'
            r, g, b = ycc_to_rgb(full[0], full[1], full[2])
            # stored (C', M', Y') = (255-R, 255-G, 255-B); undoing
            # the Adobe inversion gives C = R, M = G, Y = B and
            # K = 255 - K'
            cmyk = np.stack([r, g, b, 255.0 - full[3]], axis=-1)
        elif adobe == 1:
            raise ValueError(
                "jpeg: APP14 transform 1 (YCbCr) on a 4-component "
                "frame is malformed"
            )
        elif adobe is not None:  # transform 0: stored inverted CMYK
            cmyk = 255.0 - np.stack(full, axis=-1)
        else:
            cmyk = np.stack(full, axis=-1)
        px = np.clip(np.rint(cmyk), 0, 255).astype(np.uint8)
        return {
            "format": "jpeg",
            "width": w,
            "height": h,
            "pixels": px,
            "colorspace": "cmyk",
        }

    if adobe == 0:
        # APP14 transform 0 on a 3-component frame: samples are RGB
        # stored directly, no color transform (the Adobe-RGB shape)
        px = np.clip(np.rint(np.stack(full, axis=-1)), 0, 255).astype(
            np.uint8
        )
        return {"format": "jpeg", "width": w, "height": h, "pixels": px}
    r, g, b = ycc_to_rgb(*full)
    px = np.clip(
        np.rint(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)
    return {"format": "jpeg", "width": w, "height": h, "pixels": px}


def _decode_scan(data, pos, frame, scan_tbl, qt, huff, dri) -> dict:
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if c["id"] not in scan_tbl:
            raise ValueError(
                f"jpeg: SOS names no tables for component {c['id']}"
            )
        if c["tq"] not in qt:
            raise ValueError(
                f"jpeg: component references missing quant table "
                f"{c['tq']}"
            )
        for cls, t in ((0, scan_tbl[c["id"]][0]),
                       (1, scan_tbl[c["id"]][1])):
            if (cls, t) not in huff:
                raise ValueError(
                    f"jpeg: scan references missing Huffman table "
                    f"class={cls} id={t}"
                )
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h

    coefs = [
        np.zeros((mcus_y * c["v"], mcus_x * c["h"], 64), np.int32)
        for c in comps
    ]

    reader = _BitReader(data, pos)
    preds = [0] * len(comps)
    rst_expect = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and mcu_index and mcu_index % dri == 0:
                # byte_align discards buffered padding bits only (it
                # reads nothing), and expect_marker raises ValueError,
                # never _Marker — no handler needed here
                reader.byte_align()
                m = reader.expect_marker()
                if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != rst_expect:
                    raise ValueError(
                        f"jpeg: bad restart marker 0x{m:02X}"
                    )
                rst_expect = (rst_expect + 1) % 8
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t, ac_t = scan_tbl[c["id"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        try:
                            coef_z = _decode_block(
                                reader,
                                huff[(0, dc_t)],
                                huff[(1, ac_t)],
                            )
                        except _Marker as mk:
                            raise ValueError(
                                "jpeg: unexpected marker "
                                f"0x{mk.code:02X} inside MCU"
                            ) from None
                        coef_z[0] += preds[ci]
                        preds[ci] = coef_z[0]
                        coefs[ci][
                            my * c["v"] + by, mx * c["h"] + bx
                        ] = coef_z
            mcu_index += 1

    planes = [
        _coefs_to_plane(coefs[ci], qt[c["tq"]])
        for ci, c in enumerate(comps)
    ]
    return _assemble_image(frame, planes)


def _decode_block(reader, dc_table, ac_table) -> list:
    # plain Python ints end to end: this is the per-block hot loop,
    # and numpy scalar boxing here measured ~2x the whole stage
    coef = [0] * 64
    s = _huff_decode(reader, dc_table)
    coef[0] = _extend(reader.bits(s), s)
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("jpeg: AC run past end of block")
        coef[k] = _extend(reader.bits(s), s)
        k += 1
    return coef


# --------------------------------------------------------------------------
# progressive (SOF2) decoding — spectral selection + successive
# approximation per ITU T.81 Annex G: coefficients accumulate across
# scans in per-component zigzag arrays; reconstruction (dequantize +
# IDCT + upsample + color) happens once, at EOI.

def _comp_grids(frame: dict) -> tuple[int, int, list[dict]]:
    """Per-component geometry: MCU counts plus each component's
    MCU-padded block grid (interleaved traversal) and TRUE block grid
    (non-interleaved traversal covers only ceil(comp_size/8) blocks —
    NOT padded to MCU boundaries, T.81 A.2.2)."""
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    geo = []
    for c in comps:
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        geo.append(
            {
                "pad_bx": mcus_x * c["h"],
                "pad_by": mcus_y * c["v"],
                "true_bx": -(-cw // 8),
                "true_by": -(-ch // 8),
            }
        )
    return mcus_x, mcus_y, geo


def _expect_restart(reader: _BitReader, rst_expect: int) -> int:
    reader.byte_align()
    m = reader.expect_marker()
    if not (0xD0 <= m <= 0xD7) or (m - 0xD0) != rst_expect:
        raise ValueError(f"jpeg: bad restart marker 0x{m:02X}")
    return (rst_expect + 1) % 8


def _decode_progressive(data, pos, frame, qt, huff, dri) -> dict:
    comps = frame["comps"]
    mcus_x, mcus_y, geo = _comp_grids(frame)
    coefs = [
        np.zeros((g["pad_by"], g["pad_bx"], 64), np.int32) for g in geo
    ]
    n = len(data)
    saw_eoi = False
    while pos < n:
        if data[pos] != 0xFF:
            raise ValueError(
                f"jpeg: expected marker at offset {pos} (progressive)"
            )
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:
            saw_eoi = True
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7 or marker == 0xFF:
            # TEM / stray RST / fill byte between segments
            pos -= 1 if marker == 0xFF else 0
            continue
        seg_len = struct.unpack(">H", data[pos : pos + 2])[0]
        if seg_len < 2 or pos + seg_len > n:
            raise ValueError(
                f"jpeg: truncated segment for marker 0x{marker:02X} "
                f"(claims {seg_len} bytes)"
            )
        seg = data[pos + 2 : pos + seg_len]
        if marker == 0xC4:  # DHT — tables MAY be redefined per scan
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                bits = list(seg[p + 1 : p + 17])
                nv = sum(bits)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _build_huff(bits, vals)
                p += 17 + nv
        elif marker == 0xDB:  # DQT between scans
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                width = 64 if pq == 0 else 128
                if p + width > len(seg):
                    raise ValueError("jpeg: truncated DQT table body")
                if pq == 0:
                    qt[tq] = np.frombuffer(
                        seg, np.uint8, count=64, offset=p
                    ).astype(np.float64)
                else:
                    qt[tq] = np.frombuffer(
                        seg, ">u2", count=64, offset=p
                    ).astype(np.float64)
                p += width
        elif marker == 0xDD:  # DRI
            dri = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            pos = _progressive_scan(
                data, pos + seg_len, seg, frame, geo, mcus_x, mcus_y,
                coefs, huff, dri,
            )
            continue
        # APPn / COM / anything else: skip
        pos += seg_len
    if not saw_eoi:
        raise ValueError(
            "jpeg: truncated progressive stream (no EOI marker)"
        )
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(
                f"jpeg: component references missing quant table "
                f"{c['tq']}"
            )
    planes = [
        _coefs_to_plane(coefs[ci], qt[c["tq"]])
        for ci, c in enumerate(comps)
    ]
    return _assemble_image(frame, planes)


def _progressive_scan(
    data, pos, seg, frame, geo, mcus_x, mcus_y, coefs, huff, dri
) -> int:
    """Decode one progressive scan's entropy data into ``coefs``;
    returns the offset of the marker that terminates the scan."""
    comps = frame["comps"]
    ns = seg[0]
    if len(seg) < 4 + 2 * ns:
        raise ValueError("jpeg: truncated SOS header")
    sel = []  # (comp_index, dc_table, ac_table)
    for si in range(ns):
        cid = seg[1 + 2 * si]
        tsel = seg[2 + 2 * si]
        matches = [i for i, c in enumerate(comps) if c["id"] == cid]
        if not matches:
            raise ValueError(
                f"jpeg: scan names unknown component id {cid}"
            )
        sel.append((matches[0], tsel >> 4, tsel & 0xF))
    ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
    a = seg[3 + 2 * ns]
    ah, al = a >> 4, a & 0xF
    if ss > se or se > 63:
        raise ValueError(f"jpeg: bad spectral band Ss={ss} Se={se}")
    if ss == 0 and se != 0:
        raise ValueError("jpeg: DC scan must have Se=0 (T.81 G.1.1.1.1)")
    if ss > 0 and ns != 1:
        raise ValueError(
            "jpeg: AC scans must be single-component (T.81 G.1.1.1.1)"
        )
    if ah != 0 and ah != al + 1:
        raise ValueError(
            f"jpeg: successive approximation must refine one bit per "
            f"scan (Ah={ah}, Al={al})"
        )

    reader = _BitReader(data, pos)
    if ss == 0:
        if ah == 0:
            for ci, dc_t, _ in sel:
                if (0, dc_t) not in huff:
                    raise ValueError(
                        f"jpeg: scan references missing Huffman table "
                        f"class=0 id={dc_t}"
                    )
            _scan_dc_first(
                reader, sel, comps, geo, mcus_x, mcus_y, coefs, huff,
                dri, al,
            )
        else:
            # DC refinement: one raw bit per block, no Huffman tables
            _scan_dc_refine(
                reader, sel, comps, geo, mcus_x, mcus_y, coefs, dri, al
            )
    else:
        ci, _, ac_t = sel[0]
        if (1, ac_t) not in huff:
            raise ValueError(
                f"jpeg: scan references missing Huffman table "
                f"class=1 id={ac_t}"
            )
        if ah == 0:
            _scan_ac_first(
                reader, ci, geo[ci], coefs[ci], huff[(1, ac_t)], dri,
                ss, se, al,
            )
        else:
            _scan_ac_refine(
                reader, ci, geo[ci], coefs[ci], huff[(1, ac_t)], dri,
                ss, se, al,
            )
    # the scan's entropy data ends at the next real marker; buffered
    # padding bits in the reader are discarded by construction
    p = reader.pos
    n = len(data)
    while p + 1 < n and (data[p] != 0xFF or data[p + 1] == 0x00):
        p += 1
    if p + 1 >= n:
        raise ValueError("jpeg: scan data runs past end of stream")
    return p


def _scan_units_interleaved(sel, comps, mcus_x, mcus_y):
    """Yield per-MCU lists of (selector_idx, comp_idx, block_y,
    block_x) in interleaved order."""
    for my in range(mcus_y):
        for mx in range(mcus_x):
            unit = []
            for si, (ci, _dc, _ac) in enumerate(sel):
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        unit.append(
                            (si, ci, my * c["v"] + by, mx * c["h"] + bx)
                        )
            yield unit


def _scan_units_single(ci, g):
    """Non-interleaved traversal: one block per unit over the TRUE
    block grid (not MCU-padded)."""
    for by in range(g["true_by"]):
        for bx in range(g["true_bx"]):
            yield [(0, ci, by, bx)]


def _scan_dc_first(
    reader, sel, comps, geo, mcus_x, mcus_y, coefs, huff, dri, al
):
    if len(sel) > 1:
        units = _scan_units_interleaved(sel, comps, mcus_x, mcus_y)
    else:
        units = _scan_units_single(sel[0][0], geo[sel[0][0]])
    preds = [0] * len(sel)
    rst_expect = 0
    unit_index = 0
    for unit in units:
        if dri and unit_index and unit_index % dri == 0:
            rst_expect = _expect_restart(reader, rst_expect)
            preds = [0] * len(sel)
        try:
            for si, ci, by, bx in unit:
                dc_tbl = huff[(0, sel[si][1])]
                s = _huff_decode(reader, dc_tbl)
                diff = _extend(reader.bits(s), s)
                preds[si] += diff
                coefs[ci][by, bx, 0] = preds[si] << al
        except _Marker as mk:
            raise ValueError(
                f"jpeg: unexpected marker 0x{mk.code:02X} in DC scan"
            ) from None
        unit_index += 1


def _scan_dc_refine(
    reader, sel, comps, geo, mcus_x, mcus_y, coefs, dri, al
):
    if len(sel) > 1:
        units = _scan_units_interleaved(sel, comps, mcus_x, mcus_y)
    else:
        units = _scan_units_single(sel[0][0], geo[sel[0][0]])
    rst_expect = 0
    unit_index = 0
    bit = 1 << al
    for unit in units:
        if dri and unit_index and unit_index % dri == 0:
            rst_expect = _expect_restart(reader, rst_expect)
        try:
            for _si, ci, by, bx in unit:
                if reader.bit():
                    # two's-complement OR reconstructs negative DC
                    # exactly: ((v>>1)<<1) | (v&1) == v
                    coefs[ci][by, bx, 0] |= bit
        except _Marker as mk:
            raise ValueError(
                f"jpeg: unexpected marker 0x{mk.code:02X} in DC "
                "refinement scan"
            ) from None
        unit_index += 1


def _scan_ac_first(reader, ci, g, coef, ac_tbl, dri, ss, se, al):
    rst_expect = 0
    eobrun = 0
    unit_index = 0
    try:
        for by in range(g["true_by"]):
            for bx in range(g["true_bx"]):
                if dri and unit_index and unit_index % dri == 0:
                    rst_expect = _expect_restart(reader, rst_expect)
                    eobrun = 0
                unit_index += 1
                if eobrun > 0:
                    eobrun -= 1
                    continue
                blk = coef[by, bx]
                k = ss
                while k <= se:
                    rs = _huff_decode(reader, ac_tbl)
                    r, s = rs >> 4, rs & 0xF
                    if s == 0:
                        if r != 15:
                            eobrun = (1 << r) - 1
                            if r:
                                eobrun += reader.bits(r)
                            break
                        k += 16  # ZRL
                        continue
                    k += r
                    if k > se:
                        raise ValueError(
                            "jpeg: AC run past end of band"
                        )
                    blk[k] = _extend(reader.bits(s), s) << al
                    k += 1
    except _Marker as mk:
        raise ValueError(
            f"jpeg: unexpected marker 0x{mk.code:02X} in AC scan"
        ) from None


def _scan_ac_refine(reader, ci, g, coef, ac_tbl, dri, ss, se, al):
    p1 = 1 << al
    rst_expect = 0
    eobrun = 0
    unit_index = 0

    def correct(blk, k):
        # correction bit for a nonzero-history coefficient: magnitude
        # grows away from zero (AC point transform is sign-magnitude).
        # The (|blk[k]| & p1) == 0 guard mirrors libjpeg: successive
        # approximation can set each bit position at most once, so a
        # corrupt stream repeating correction bits must not inflate the
        # magnitude further (ADVICE r7 finding); the bit is still
        # consumed either way to keep the reader in sync.
        if reader.bit() and not (abs(int(blk[k])) & p1):
            blk[k] += p1 if blk[k] > 0 else -p1

    try:
        for by in range(g["true_by"]):
            for bx in range(g["true_bx"]):
                if dri and unit_index and unit_index % dri == 0:
                    rst_expect = _expect_restart(reader, rst_expect)
                    eobrun = 0
                unit_index += 1
                blk = coef[by, bx]
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = _huff_decode(reader, ac_tbl)
                        r, s = rs >> 4, rs & 0xF
                        newval = 0
                        if s == 0:
                            if r != 15:
                                eobrun = 1 << r
                                if r:
                                    eobrun += reader.bits(r)
                                break
                            # ZRL: skip 16 zero-history coefficients
                        elif s == 1:
                            newval = p1 if reader.bit() else -p1
                        else:
                            raise ValueError(
                                "jpeg: refinement scan carries "
                                f"size-{s} coefficient (must be 1)"
                            )
                        # advance: skip r zero-history coefficients,
                        # correcting nonzero-history ones on the way
                        while k <= se:
                            if blk[k] != 0:
                                correct(blk, k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if s:
                            if k > se:
                                raise ValueError(
                                    "jpeg: refinement run past end "
                                    "of band"
                                )
                            blk[k] = newval
                        k += 1
                if eobrun > 0:
                    # EOB covers this block too: only correction bits
                    # for the band's remaining nonzero coefficients
                    while k <= se:
                        if blk[k] != 0:
                            correct(blk, k)
                        k += 1
                    eobrun -= 1
    except _Marker as mk:
        raise ValueError(
            f"jpeg: unexpected marker 0x{mk.code:02X} in AC "
            "refinement scan"
        ) from None


# --------------------------------------------------------------------------
# encoder (minimal baseline emitter — tests + the declared q63 branch)

def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extra_bits(v: int, s: int) -> tuple[int, int]:
    if s == 0:
        return 0, 0
    return (v if v >= 0 else v + (1 << s) - 1), s


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.cur <<= 8 - self.nbits
            self.cur |= (1 << (8 - self.nbits)) - 1  # pad with 1s
            self.out.append(self.cur)
            if self.cur == 0xFF:
                self.out.append(0x00)
            self.cur = 0
            self.nbits = 0


def _flat_table(symbols: set[int]) -> tuple[list[int], bytes, dict]:
    """Single-length canonical Huffman table over ``symbols``: length
    L with 2**L > len(symbols) keeps the all-ones code unused (spec
    hygiene). Returns (BITS, VALS, {symbol: (code, length)})."""
    vals = sorted(symbols) or [0]
    ln = max(1, (len(vals)).bit_length())
    if (1 << ln) <= len(vals):
        ln += 1
    bits = [0] * 16
    bits[ln - 1] = len(vals)
    enc = {v: (i, ln) for i, v in enumerate(vals)}
    return bits, bytes(vals), enc


def _to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    p = px.astype(np.float64)
    r, g, b = p[..., 0], p[..., 1], p[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return [y, cb, cr]


def _pad_to(a: np.ndarray, bh: int, bw: int) -> np.ndarray:
    h, w = a.shape
    ph, pw = -(-h // bh) * bh, -(-w // bw) * bw
    return np.pad(a, ((0, ph - h), (0, pw - w)), mode="edge")


def _component_coefs(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 64) zigzagged quantized integer coefficients."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    out = np.zeros((h // 8, w // 8, 64), dtype=np.int64)
    for by in range(h // 8):
        for bx in range(w // 8):
            coef = _fdct(blocks[by, bx])
            z = coef.reshape(64)[_ZIGZAG]
            out[by, bx] = np.rint(z / q).astype(np.int64)
    return out


def _prepare_components(pixels, quant, subsample, adobe_transform=None):
    """Shared encoder front half: color convert, subsample, pad, and
    forward-DCT-quantize every component. Returns
    (gray, q, comps, hmax, vmax, mcus_x, mcus_y, h, w). A 4-channel
    input is TRUE CMYK and requires ``adobe_transform`` 0 (inverted
    CMYK storage, no color transform) or 2 (YCCK)."""
    px = np.asarray(pixels)
    gray = px.ndim == 2
    cmyk = px.ndim == 3 and px.shape[2] == 4
    if cmyk and adobe_transform not in (0, 2):
        raise ValueError(
            "encode: 4-channel input needs adobe_transform 0 (CMYK) "
            "or 2 (YCCK)"
        )
    if not cmyk and adobe_transform not in (None, 0):
        raise ValueError(
            "encode: adobe_transform 2 needs a 4-channel input"
        )
    h, w = px.shape[:2]
    if quant is None:
        quant = 1
    if np.isscalar(quant):
        q = np.full(64, float(quant))
    else:
        q = np.asarray(quant, dtype=np.float64).reshape(64)
    # THE effective table: exactly what the DQT segment stores is
    # exactly what quantizes the coefficients — a raw float/overrange
    # table used for math but clipped for storage silently
    # desynchronized encoder and decoder (review finding: quant=300
    # decoded to 255/300-scaled pixels). Clamped to [1, 255]: BASELINE
    # streams may only carry 8-bit (Pq=0) quant tables (ITU T.81
    # B.2.4.1) — emitting a 16-bit table here would be internally
    # consistent but rejected by spec-compliant external decoders
    # (second review finding). The decoder still READS Pq=1 tables
    # (extended-sequential files reuse the baseline scan layout).
    q = np.clip(np.rint(q), 1, 255).astype(np.int64)
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    if cmyk and subsample != "444":
        raise ValueError("encode: CMYK/YCCK is 444-only")
    sub = 2 if (subsample == "420" and not gray and not cmyk) else 1

    if gray:
        comps = [
            {"id": 1, "h": 1, "v": 1, "tq": 0,
             "plane": _pad_to(px.astype(np.float64), 8, 8)}
        ]
    elif cmyk:
        if adobe_transform == 2:
            # YCCK: YCbCr over (R, G, B) = TRUE (C, M, Y); K channel
            # stored inverted (the Adobe convention the decoder
            # undoes)
            y, cb, cr = _to_ycbcr(px[..., :3])
            planes = [y, cb, cr, 255.0 - px[..., 3].astype(np.float64)]
        else:
            # transform 0: all four channels stored inverted, no
            # color transform — exact (DCT-only) round-trip regime
            planes = [
                255.0 - px[..., i].astype(np.float64) for i in range(4)
            ]
        comps = [
            {"id": i + 1, "h": 1, "v": 1, "tq": 0 if i == 0 else 1,
             "plane": _pad_to(p, 8, 8)}
            for i, p in enumerate(planes)
        ]
    elif adobe_transform == 0:
        # 3-component APP14 transform 0: RGB stored directly
        comps = [
            {"id": i + 1, "h": 1, "v": 1, "tq": 0 if i == 0 else 1,
             "plane": _pad_to(px[..., i].astype(np.float64), 8, 8)}
            for i in range(3)
        ]
    else:
        y, cb, cr = _to_ycbcr(px)
        if sub == 2:
            yp = _pad_to(y, 16, 16)
            # average 2x2 chroma over the padded-to-even grid
            cbp = _pad_to(cb, 2, 2)
            crp = _pad_to(cr, 2, 2)
            cbs = cbp.reshape(
                cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            crs = crp.reshape(
                crp.shape[0] // 2, 2, crp.shape[1] // 2, 2
            ).mean(axis=(1, 3))
            comps = [
                {"id": 1, "h": 2, "v": 2, "tq": 0, "plane": yp},
                {"id": 2, "h": 1, "v": 1, "tq": 1,
                 "plane": _pad_to(cbs, 8, 8)},
                {"id": 3, "h": 1, "v": 1, "tq": 1,
                 "plane": _pad_to(crs, 8, 8)},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "tq": 0, "plane": _pad_to(y, 8, 8)},
                {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": _pad_to(cb, 8, 8)},
                {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": _pad_to(cr, 8, 8)},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        need_h = mcus_y * c["v"] * 8
        need_w = mcus_x * c["h"] * 8
        p = c["plane"]
        c["plane"] = np.pad(
            p,
            ((0, need_h - p.shape[0]), (0, need_w - p.shape[1])),
            mode="edge",
        )
        c["coefs"] = _component_coefs(c["plane"], q)
    return gray, q, comps, hmax, vmax, mcus_x, mcus_y, h, w


def encode_baseline_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | int | None = None,
    subsample: str = "444",
    restart_interval: int = 0,
    adobe_transform: int | None = None,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB grid (or (h, w) grayscale) as a
    baseline JFIF byte string. ``quant``: a 64-entry zigzag-order
    table, a scalar (constant table), or None for all-ones (the
    closed-form round-trip regime). ``subsample``: '444' or '420'
    (chroma 2x2). ``restart_interval``: emit a DRI segment and RSTn
    markers every N MCUs (0 = none). A 4-channel input is TRUE CMYK
    and needs ``adobe_transform`` 0 (inverted-CMYK storage) or 2
    (YCCK); either writes the APP14 Adobe marker in place of the
    JFIF APP0 (JFIF only admits 1/3-component streams).
    ``adobe_transform=0`` with a 3-channel input writes
    direct-stored RGB."""
    gray, q, comps, hmax, vmax, mcus_x, mcus_y, h, w = (
        _prepare_components(pixels, quant, subsample, adobe_transform)
    )

    # entropy symbols grouped per MCU, with DC differentials (reset at
    # restart boundaries when restart_interval is set)
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    mcu_tokens = []
    preds = [0] * len(comps)
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                preds = [0] * len(comps)
            tok = []
            for ci, c in enumerate(comps):
                cls = 0 if ci == 0 else 1
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        z = c["coefs"][
                            my * c["v"] + by, mx * c["h"] + bx
                        ]
                        diff = int(z[0]) - preds[ci]
                        preds[ci] = int(z[0])
                        s = _category(diff)
                        dc_syms[cls].add(s)
                        tok.append(("dc", cls, s, diff))
                        run = 0
                        last_nz = 0
                        for k in range(1, 64):
                            if z[k] != 0:
                                last_nz = k
                        for k in range(1, last_nz + 1):
                            v = int(z[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                ac_syms[cls].add(0xF0)
                                tok.append(("ac", cls, 0xF0, 0))
                                run -= 16
                            s = _category(v)
                            sym = (run << 4) | s
                            ac_syms[cls].add(sym)
                            tok.append(("ac", cls, sym, v))
                            run = 0
                        if last_nz < 63:
                            ac_syms[cls].add(0x00)
                            tok.append(("ac", cls, 0x00, 0))
            mcu_tokens.append(tok)
            mcu_index += 1

    dc_tbl = [_flat_table(dc_syms[0]), _flat_table(dc_syms[1])]
    ac_tbl = [_flat_table(ac_syms[0]), _flat_table(ac_syms[1])]

    bw = _BitWriter()
    rst = 0
    for mi, tok in enumerate(mcu_tokens):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        for kind, cls, sym, v in tok:
            enc = (dc_tbl if kind == "dc" else ac_tbl)[cls][2]
            code, ln = enc[sym]
            bw.write(code, ln)
            s = sym if kind == "dc" else sym & 0xF
            if s:
                ev, en = _extra_bits(v, s)
                bw.write(ev, en)
    bw.flush()

    out = bytearray(b"\xff\xd8")
    if adobe_transform is not None:
        # APP14 Adobe marker in place of JFIF (which only admits
        # 1/3-component streams): tag, DCTEncodeVersion 101, two
        # zero flag words, ColorTransform
        out += (
            b"\xff\xee"
            + struct.pack(">H", 14)
            + b"Adobe"
            + struct.pack(">HHH", 101, 0, 0)
            + bytes([adobe_transform])
        )
    else:
        out += b"\xff\xe0" + struct.pack(">H", 16) \
            + b"JFIF\x00\x01\x01\x00" \
            + struct.pack(">HH", 1, 1) + b"\x00\x00"
    qbytes = q.astype(np.uint8).tobytes()  # always Pq=0 (baseline)
    ntab = 1 if gray else 2
    for tq in range(ntab):
        out += (
            b"\xff\xdb"
            + struct.pack(">H", 3 + len(qbytes))
            + bytes([tq])
            + qbytes
        )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls in range(2 if not gray else 1):
        for tc, tbl in ((0, dc_tbl[cls]), (1, ac_tbl[cls])):
            bits, vals, _ = tbl
            body = bytes([(tc << 4) | cls]) + bytes(bits) + vals
            out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([len(comps)])
    for ci, c in enumerate(comps):
        cls = 0 if ci == 0 else 1
        sos += bytes([c["id"], (cls << 4) | cls])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# progressive (SOF2) encoder — emits a spectral-selection + successive-
# approximation scan script (T.81 Annex G) so the progressive decoder
# can be round-trip tested against real multi-scan streams: DC first
# (Al=1) -> DC refine -> per-component AC first over two spectral bands
# (Al=1) -> per-component AC refine, with EOB runs, ZRL-with-correction
# interleaving, per-scan DHT redefinition, and optional restart markers.

def _point_ac(v: int, al: int) -> int:
    """AC point transform: sign-magnitude shift (T.81 G.1.2.2)."""
    return -((-v) >> al) if v < 0 else v >> al


def _tok_dc_first(comps, sel, units, dri, al):
    syms, toks = set(), []
    preds = [0] * len(sel)
    unit_index = 0
    for unit in units:
        if dri and unit_index and unit_index % dri == 0:
            toks.append(("rst",))
            preds = [0] * len(sel)
        for si, ci, by, bx in unit:
            v = int(comps[ci]["coefs"][by, bx, 0]) >> al  # arithmetic
            diff = v - preds[si]
            preds[si] = v
            s = _category(diff)
            syms.add(s)
            toks.append(("sym", s))
            ev, en = _extra_bits(diff, s)
            if en:
                toks.append(("bits", ev, en))
        unit_index += 1
    return syms, toks


def _tok_dc_refine(comps, units, dri, al):
    toks = []
    unit_index = 0
    for unit in units:
        if dri and unit_index and unit_index % dri == 0:
            toks.append(("rst",))
        for _si, ci, by, bx in unit:
            toks.append(
                ("bits", (int(comps[ci]["coefs"][by, bx, 0]) >> al) & 1, 1)
            )
        unit_index += 1
    return set(), toks


def _tok_ac_first(coefs, g, dri, ss, se, al):
    syms, toks = set(), []
    eobrun = 0

    def flush():
        nonlocal eobrun
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        sym = r << 4
        syms.add(sym)
        toks.append(("sym", sym))
        if r:
            toks.append(("bits", eobrun - (1 << r), r))
        eobrun = 0

    unit_index = 0
    for by in range(g["true_by"]):
        for bx in range(g["true_bx"]):
            if dri and unit_index and unit_index % dri == 0:
                flush()
                toks.append(("rst",))
            unit_index += 1
            band = [
                _point_ac(int(coefs[by, bx, k]), al)
                for k in range(ss, se + 1)
            ]
            nz = [i for i, v in enumerate(band) if v]
            if not nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            run = 0
            for i in range(nz[-1] + 1):
                v = band[i]
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    syms.add(0xF0)
                    toks.append(("sym", 0xF0))
                    run -= 16
                s = _category(v)
                sym = (run << 4) | s
                syms.add(sym)
                toks.append(("sym", sym))
                ev, en = _extra_bits(v, s)
                toks.append(("bits", ev, en))
                run = 0
            if nz[-1] < se - ss:
                eobrun += 1  # trailing zeros become the first pending end
    flush()
    return syms, toks


def _tok_ac_refine(coefs, g, dri, ss, se, al):
    p1s = al + 1  # history precision
    syms, toks = set(), []
    eobrun = 0
    pending = []  # correction bits for blocks covered by the EOB run

    def flush():
        nonlocal eobrun, pending
        if not eobrun:
            return
        r = eobrun.bit_length() - 1
        sym = r << 4
        syms.add(sym)
        toks.append(("sym", sym))
        if r:
            toks.append(("bits", eobrun - (1 << r), r))
        toks.extend(("bits", b, 1) for b in pending)
        pending = []
        eobrun = 0

    unit_index = 0
    for by in range(g["true_by"]):
        for bx in range(g["true_bx"]):
            if dri and unit_index and unit_index % dri == 0:
                flush()
                toks.append(("rst",))
            unit_index += 1
            z = coefs[by, bx]
            hist = [_point_ac(int(z[k]), p1s) for k in range(ss, se + 1)]
            bit = [(abs(int(z[k])) >> al) & 1 for k in range(ss, se + 1)]
            newnz = [
                i
                for i in range(se - ss + 1)
                if hist[i] == 0 and bit[i]
            ]
            if not newnz:
                eobrun += 1
                pending.extend(
                    bit[i] for i in range(se - ss + 1) if hist[i]
                )
                if eobrun == 0x7FFF:
                    flush()
                continue
            flush()
            i = 0
            for pos in newnz:
                run = 0
                corr = []
                while i < pos:
                    if hist[i]:
                        corr.append(bit[i])
                    else:
                        run += 1
                        if run == 16:
                            syms.add(0xF0)
                            toks.append(("sym", 0xF0))
                            toks.extend(("bits", b, 1) for b in corr)
                            corr = []
                            run = 0
                    i += 1
                sym = (run << 4) | 1
                syms.add(sym)
                toks.append(("sym", sym))
                toks.append(("bits", 1 if int(z[ss + pos]) > 0 else 0, 1))
                toks.extend(("bits", b, 1) for b in corr)
                i = pos + 1
            if i <= se - ss:
                eobrun += 1
                pending.extend(
                    bit[j] for j in range(i, se - ss + 1) if hist[j]
                )
    flush()
    return syms, toks


def _serialize_scan(toks, enc) -> bytes:
    bw = _BitWriter()
    rst = 0
    for t in toks:
        if t[0] == "rst":
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        elif t[0] == "sym":
            code, ln = enc[t[1]]
            bw.write(code, ln)
        else:
            bw.write(t[1], t[2])
    bw.flush()
    return bytes(bw.out)


def encode_progressive_jpeg(
    pixels: np.ndarray,
    quant: np.ndarray | int | None = None,
    subsample: str = "444",
    restart_interval: int = 0,
    ac_split: int = 5,
) -> bytes:
    """Encode an (h, w, 3) uint8 RGB grid (or (h, w) grayscale) as a
    progressive (SOF2) JFIF byte string. The scan script is the
    classic successive-approximation ladder: interleaved DC first
    (Al=1), DC refine, then per component AC first over the bands
    [1..ac_split] and [ac_split+1..63] at Al=1 followed by the two
    matching refinement scans — every decoder path (spectral
    selection, EOB runs spanning blocks, ZRL-with-correction-bit
    interleaving, per-scan DHT redefinition, restart markers) is
    exercised by construction. Shares the quant/subsample/restart
    contract of ``encode_baseline_jpeg``."""
    gray, q, comps, hmax, vmax, mcus_x, mcus_y, h, w = (
        _prepare_components(pixels, quant, subsample)
    )
    if not (1 <= ac_split <= 62):
        raise ValueError("ac_split must be in [1, 62]")
    frame = {"w": w, "h": h, "comps": comps}
    _mx, _my, geo = _comp_grids(frame)
    dri = restart_interval

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    qbytes = q.astype(np.uint8).tobytes()
    for tq in range(1 if gray else 2):
        out += (
            b"\xff\xdb"
            + struct.pack(">H", 3 + len(qbytes))
            + bytes([tq])
            + qbytes
        )
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)

    def dht(tc, syms):
        bits, vals, enc = _flat_table(syms)
        body = bytes([tc << 4]) + bytes(bits) + vals  # table id 0
        return (
            b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body,
            enc,
        )

    def sos(comp_specs, ss, se, ah, al):
        body = bytes([len(comp_specs)])
        for cid, dc_t, ac_t in comp_specs:
            body += bytes([cid, (dc_t << 4) | ac_t])
        body += bytes([ss, se, (ah << 4) | al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    sel = [(ci, 0, 0) for ci in range(len(comps))]
    if len(comps) > 1:
        dc_units = list(
            _scan_units_interleaved(sel, comps, mcus_x, mcus_y)
        )
    else:
        dc_units = list(_scan_units_single(0, geo[0]))

    # scan 1: DC first, Al=1 (every scan redefines Huffman table id 0 —
    # the decoder's per-scan DHT path is part of what's under test)
    syms, toks = _tok_dc_first(comps, sel, dc_units, dri, 1)
    seg, enc = dht(0, syms)
    out += seg
    out += sos([(c["id"], 0, 0) for c in comps], 0, 0, 0, 1)
    out += _serialize_scan(toks, enc)
    # scan 2: DC refine to full precision (raw bits, no DHT needed)
    _s, toks = _tok_dc_refine(comps, dc_units, dri, 0)
    out += sos([(c["id"], 0, 0) for c in comps], 0, 0, 1, 0)
    out += _serialize_scan(toks, {})
    # AC scans: first pass at Al=1 over both spectral bands, then the
    # matching refinement passes — non-interleaved by spec
    bands = [(1, ac_split), (ac_split + 1, 63)]
    for first in (True, False):
        for ci, c in enumerate(comps):
            for ss, se in bands:
                if first:
                    syms, toks = _tok_ac_first(
                        c["coefs"], geo[ci], dri, ss, se, 1
                    )
                else:
                    syms, toks = _tok_ac_refine(
                        c["coefs"], geo[ci], dri, ss, se, 0
                    )
                seg, enc = dht(1, syms)
                out += seg
                out += sos(
                    [(c["id"], 0, 0)], ss, se, 0 if first else 1,
                    1 if first else 0,
                )
                out += _serialize_scan(toks, enc)
    out += b"\xff\xd9"
    return bytes(out)


JPEG_MAGIC = b"\xff\xd8\xff"  # SOI + first marker byte — every JFIF


def register() -> None:
    """Install the baseline decoder in the multimodal codec registry —
    picklable module-level function, usable directly as the
    ``codec_setup=`` worker hook of ``media_features``. Registered
    under the full 3-byte JPEG magic: Spark REUSES Python workers
    across jobs, so a codec another job registered for the same format
    may still be installed — identical keys make each job's own
    ``codec_setup`` deterministically override it for that job's
    partitions (measured: a stale 2×3 stub codec from an earlier test
    shadowed this decoder under a shorter prefix)."""
    from timeseries_data_provider_spark.operators.multimodal import (
        register_image_codec,
    )

    register_image_codec(JPEG_MAGIC, decode_baseline_jpeg)
