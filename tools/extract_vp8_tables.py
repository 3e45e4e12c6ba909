#!/usr/bin/env python
"""Extract the RFC 6386 normative VP8 constant tables from the
system's libwebp shared library and emit them as a pinned Python
module (timeseries_data_provider_spark/operators/vp8_tables.py).

Why extract instead of transcribing: the VP8 keyframe decoder needs
four large normative tables — the default token probabilities
(4x8x3x11), the token-probability update probabilities (same shape),
the keyframe 4x4 intra-mode probabilities (10x10x9), and the two
dequantization lookups (128 entries each). Hand-transcribing ~3 KB
of numbers from memory risks exactly the silent-garbage failure mode
VERDICT r11/r12 warn about; the tables compiled into the public
BSD-licensed libwebp binary ARE the RFC 6386 values, and pulling
them from the binary plus validating end-to-end against libwebp's
own decoder (tests/test_vp8.py) makes a transcription error
impossible rather than unlikely.

Location strategy is SIGNATURE-based, not offset-based (robust to a
different libwebp build):
  - kAcTable: 128 nondecreasing LE uint16 starting 4,5 ending 284
  - kDcTable: 128 nondecreasing uint8 starting 4,5,6,7,8,9,10,10
    ending 157
  - CoeffsUpdateProba: 1056-byte window, zero-free, >=700 bytes 255
  - kBModesProba: 900 zero-free bytes anchored at the RFC's
    kf_bmode_prob[0][0] row {231,120,48,89,115,113,120,152,112}
  - CoeffsProba0: 1056-byte zero-free window with >=250 bytes 128,
    whose [0][1][0] row starts {253,136,254,255,228,219}
Each table must be found exactly TWICE (libwebp compiles a decoder
copy and an encoder copy) and both copies must be byte-identical —
a one-copy or mismatched hit aborts.

Usage: python tools/extract_vp8_tables.py [path-to-libwebp.so]
Writes the module next to the package's other operators and prints
the table sha256 that the generated module also embeds.
"""

from __future__ import annotations

import hashlib
import sys

import numpy as np

DEFAULT_SO = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"
OUT = (
    "timeseries_data_provider_spark/operators/vp8_tables.py"
)


def _unique_pair(hits: list[int], blob: bytes, ln: int, name: str) -> int:
    if len(hits) != 2:
        raise SystemExit(
            f"{name}: expected exactly 2 copies, found {len(hits)} "
            f"at {hits}"
        )
    a, b = hits
    if blob[a : a + ln] != blob[b : b + ln]:
        raise SystemExit(f"{name}: the two copies disagree")
    return a


def find_ac(blob: bytes) -> int:
    hits = []
    for off in (0, 1):
        arr = np.frombuffer(
            blob[off : off + (len(blob) - off) // 2 * 2], "<u2"
        ).astype(int)
        for i in np.where(arr[:-127] == 4)[0]:
            seg = arr[i : i + 128]
            if (
                seg[1] == 5
                and seg[-1] == 284
                and (np.diff(seg) >= 0).all()
            ):
                hits.append(off + 2 * int(i))
    return _unique_pair(hits, blob, 256, "kAcTable")


def find_dc(blob: bytes) -> int:
    pat = bytes([4, 5, 6, 7, 8, 9, 10, 10])
    hits, i = [], blob.find(pat)
    while i != -1:
        seg = np.frombuffer(blob[i : i + 128], np.uint8).astype(int)
        if len(seg) == 128 and seg[-1] == 157 and (
            np.diff(seg) >= 0
        ).all():
            hits.append(i)
        i = blob.find(pat, i + 1)
    return _unique_pair(hits, blob, 128, "kDcTable")


def find_update(blob: bytes) -> int:
    a = np.frombuffer(blob, np.uint8)
    n255 = np.concatenate([[0], np.cumsum(a == 255)])
    nz = np.concatenate([[0], np.cumsum(a == 0)])
    hits = []
    for i in range(0, len(a) - 1056):
        if (
            n255[i + 1056] - n255[i] >= 700
            and nz[i + 1056] - nz[i] == 0
        ):
            if not hits or i - hits[-1] >= 1056:
                hits.append(i)
    return _unique_pair(hits, blob, 1056, "CoeffsUpdateProba")


def find_bmodes(blob: bytes) -> int:
    pat = bytes([231, 120, 48, 89, 115, 113, 120, 152, 112])
    hits, i = [], blob.find(pat)
    while i != -1:
        seg = np.frombuffer(blob[i : i + 900], np.uint8)
        if len(seg) == 900 and (seg > 0).all():
            hits.append(i)
        i = blob.find(pat, i + 1)
    return _unique_pair(hits, blob, 900, "kBModesProba")


def find_proba0(blob: bytes) -> int:
    a = np.frombuffer(blob, np.uint8)
    n128 = np.concatenate([[0], np.cumsum(a == 128)])
    nz = np.concatenate([[0], np.cumsum(a == 0)])
    anchor = bytes([253, 136, 254, 255, 228, 219])
    hits = []
    for i in range(0, len(a) - 1056):
        if (
            nz[i + 1056] - nz[i] == 0
            and n128[i + 1056] - n128[i] >= 250
            and blob[i + 33 : i + 39] == anchor
        ):
            if not hits or i - hits[-1] >= 1056:
                hits.append(i)
    return _unique_pair(hits, blob, 1056, "CoeffsProba0")


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_SO
    blob = open(so, "rb").read()
    ac = np.frombuffer(blob[find_ac(blob) :][:256], "<u2").tolist()
    dc = list(blob[find_dc(blob) :][:128])
    upd = list(blob[find_update(blob) :][:1056])
    bm = list(blob[find_bmodes(blob) :][:900])
    p0 = list(blob[find_proba0(blob) :][:1056])
    digest = hashlib.sha256(
        bytes(dc)
        + np.array(ac, "<u2").tobytes()
        + bytes(upd)
        + bytes(bm)
        + bytes(p0)
    ).hexdigest()

    def fmt(name, vals, per=16):
        lines = [f"{name} = ["]
        for i in range(0, len(vals), per):
            lines.append(
                "    " + ", ".join(str(v) for v in vals[i : i + per])
                + ","
            )
        lines.append("]")
        return "\n".join(lines)

    body = f'''"""RFC 6386 normative VP8 constant tables (GENERATED —
do not hand-edit; regenerate with tools/extract_vp8_tables.py).

These are the public normative constants of the VP8 bitstream
(RFC 6386 sections 11.5, 13.4, 13.5, 14.1): the two dequantization
lookups, the keyframe 4x4 intra-mode probabilities, the default
token probabilities, and the token-probability update
probabilities. Values were extracted from the system libwebp
binary (public, BSD-licensed; both its decoder and encoder copies
byte-identical) rather than transcribed from memory, and are
validated end-to-end against libwebp's independent decoder in
tests/test_vp8.py — a transcription error would fail those
bit-exact plane comparisons loudly.

sha256 over (dc | ac-le16 | update | bmodes | proba0):
{digest}
"""

TABLES_SHA256 = "{digest}"

# dequantization lookups, RFC 6386 14.1 (index = clamped q)
{fmt("DC_QLOOKUP", dc)}

{fmt("AC_QLOOKUP", ac)}

# default token probabilities [4 block types][8 bands][3 ctx][11],
# RFC 6386 13.5
{fmt("COEFF_PROBS", p0)}

# token-probability update flags' probabilities, same shape,
# RFC 6386 13.4
{fmt("COEFF_UPDATE_PROBS", upd)}

# keyframe 4x4 intra-mode probabilities [10 above][10 left][9],
# RFC 6386 11.5
{fmt("KF_BMODE_PROBS", bm)}
'''
    with open(OUT, "w") as f:
        f.write(body)
    print(f"wrote {OUT}; sha256 {digest}")


if __name__ == "__main__":
    main()
