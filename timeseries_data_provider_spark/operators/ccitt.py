"""CCITT Group 3 / Group 4 fax codes (ITU-T T.4 / T.6) — stdlib+numpy.

Scanned documents are a major crawl-corpus shape (books, papers,
records), and their TIFFs overwhelmingly carry CCITT bilevel
compression: TIFF Compression 2 (Modified Huffman, byte-aligned
rows), 3 (T.4 Group 3, 1D or 2D lines behind EOL tags) and 4 (T.6
Group 4 MMR — the archive-scan default). This module implements the
codes themselves; operators/tiff wires them into ``decode_tiff`` so
the image-dedup ladder (pixel-hash/dHash/pHash) covers scan corpora.

Public-knowledge basis: ITU-T Recommendation T.4 (Tables 2/3/4 —
the terminating, make-up and extended make-up code words — and the
2D coding procedure of §4.2) and T.6 §2 (MMR: the same 2D modes
against an all-white first reference line, EOFB terminator).
Transcription risk is handled two ways: structural tests prove the
tables are prefix-free and complete, and golden fixtures produced by
an INDEPENDENT implementation (the JDK's javax.imageio TIFF plugin)
are pinned in tests/test_ccitt.py — both directions (this decoder
reads JDK-encoded strips; the JDK reads strips this encoder wrote).

Decode contract: every function returns a (height, width) uint8
array of FAX bits — 0 = white, 1 = black; the caller maps them onto
the TIFF photometric convention. Corrupt streams (run overruns, bad
prefixes, truncation mid-line) raise ValueError with a named reason,
never return wrong pixels silently. Uncompressed-mode extensions
(T.4 §4.2.1.3.5 / T6Options bit 1) raise NotImplementedError.

Scale shape: per-payload independent (Arrow fan-out under
mapInPandas like every codec here); bit-serial pure Python at the
run level — the honest envelope is measured in the §C stress rows,
and a real deployment swaps libtiff through the codec registry.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "decode_mh",
    "decode_g3",
    "decode_g4",
    "encode_mh",
    "encode_g3_1d",
    "encode_g4",
]

# -- T.4 code tables (transcribed from Tables 2, 3 and 4) -------------

_WHITE_CODES = """
0 00110101  1 000111    2 0111      3 1000      4 1011
5 1100      6 1110      7 1111      8 10011     9 10100
10 00111    11 01000    12 001000   13 000011   14 110100
15 110101   16 101010   17 101011   18 0100111  19 0001100
20 0001000  21 0010111  22 0000011  23 0000100  24 0101000
25 0101011  26 0010011  27 0100100  28 0011000  29 00000010
30 00000011 31 00011010 32 00011011 33 00010010 34 00010011
35 00010100 36 00010101 37 00010110 38 00010111 39 00101000
40 00101001 41 00101010 42 00101011 43 00101100 44 00101101
45 00000100 46 00000101 47 00001010 48 00001011 49 01010010
50 01010011 51 01010100 52 01010101 53 00100100 54 00100101
55 01011000 56 01011001 57 01011010 58 01011011 59 01001010
60 01001011 61 00110010 62 00110011 63 00110100
64 11011     128 10010     192 010111    256 0110111
320 00110110 384 00110111  448 01100100  512 01100101
576 01101000 640 01100111  704 011001100 768 011001101
832 011010010 896 011010011 960 011010100 1024 011010101
1088 011010110 1152 011010111 1216 011011000 1280 011011001
1344 011011010 1408 011011011 1472 010011000 1536 010011001
1600 010011010 1664 011000    1728 010011011
"""

_BLACK_CODES = """
0 0000110111  1 010         2 11          3 10          4 011
5 0011        6 0010        7 00011       8 000101      9 000100
10 0000100    11 0000101    12 0000111    13 00000100   14 00000111
15 000011000  16 0000010111 17 0000011000 18 0000001000
19 00001100111 20 00001101000 21 00001101100 22 00000110111
23 00000101000 24 00000010111 25 00000011000
26 000011001010 27 000011001011 28 000011001100 29 000011001101
30 000001101000 31 000001101001 32 000001101010 33 000001101011
34 000011010010 35 000011010011 36 000011010100 37 000011010101
38 000011010110 39 000011010111 40 000001101100 41 000001101101
42 000011011010 43 000011011011 44 000001010100 45 000001010101
46 000001010110 47 000001010111 48 000001100100 49 000001100101
50 000001010010 51 000001010011 52 000000100100 53 000000110111
54 000000111000 55 000000100111 56 000000101000 57 000001011000
58 000001011001 59 000000101011 60 000000101100 61 000001011010
62 000001100110 63 000001100111
64 0000001111   128 000011001000 192 000011001001 256 000001011011
320 000000110011 384 000000110100 448 000000110101
512 0000001101100 576 0000001101101 640 0000001001010
704 0000001001011 768 0000001001100 832 0000001001101
896 0000001110010 960 0000001110011 1024 0000001110100
1088 0000001110101 1152 0000001110110 1216 0000001110111
1280 0000001010010 1344 0000001010011 1408 0000001010100
1472 0000001010101 1536 0000001011010 1600 0000001011011
1664 0000001100100 1728 0000001100101
"""

# Table 4: extended make-up codes, shared by both colours
_EXT_CODES = """
1792 00000001000  1856 00000001100  1920 00000001101
1984 000000010010 2048 000000010011 2112 000000010100
2176 000000010101 2240 000000010110 2304 000000010111
2368 000000011100 2432 000000011101 2496 000000011110
2560 000000011111
"""


def _parse_codes(src: str) -> dict[int, str]:
    toks = src.split()
    return {int(toks[i]): toks[i + 1] for i in range(0, len(toks), 2)}


WHITE = _parse_codes(_WHITE_CODES)
BLACK = _parse_codes(_BLACK_CODES)
EXT = _parse_codes(_EXT_CODES)


def _build_tree(codes: dict[int, str], extend: bool = True) -> dict:
    """Prefix tree: node = {0: child|leaf, 1: child|leaf}; a leaf is
    the run length int. Raises at import if any code shadows
    another — the transcription self-check."""
    root: dict = {}
    items = dict(codes)
    if extend:
        items.update(EXT)
    for run, code in items.items():
        node = root
        for b in code[:-1]:
            nxt = node.setdefault(int(b), {})
            if not isinstance(nxt, dict):
                raise AssertionError(f"ccitt: code shadowing at {run}")
            node = nxt
        last = int(code[-1])
        if last in node:
            raise AssertionError(f"ccitt: duplicate code for {run}")
        node[last] = run
    return root


_WHITE_TREE = _build_tree(WHITE)
_BLACK_TREE = _build_tree(BLACK)

# 2D mode code words (T.4 §4.2.1.3, shared with T.6): returned tags
_MODE_CODES = {
    "1": "V0",
    "011": "VR1",
    "000011": "VR2",
    "0000011": "VR3",
    "010": "VL1",
    "000010": "VL2",
    "0000010": "VL3",
    "001": "H",
    "0001": "P",
    "0000001111": "EXT",  # 2D extensions / uncompressed entry
}
_MODE_TREE: dict = {}
for _code, _tag in _MODE_CODES.items():
    _node = _MODE_TREE
    for _b in _code[:-1]:
        _node = _node.setdefault(int(_b), {})
    _node[int(_code[-1])] = _tag


class _BitReader:
    """MSB-first bit reader over a bytes payload."""

    __slots__ = ("data", "pos", "n")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.n = len(data) * 8

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.n:
            raise ValueError("ccitt: truncated stream")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def exhausted(self, slack_bits: int = 7) -> bool:
        return self.pos + slack_bits >= self.n


def _read_tree(br: _BitReader, tree: dict):
    node = tree
    for _ in range(14):  # longest code is 13 bits
        node = node.get(br.read_bit())
        if node is None:
            raise ValueError("ccitt: invalid code prefix")
        if not isinstance(node, dict):
            return node
    raise ValueError("ccitt: invalid code prefix")


def _read_run(br: _BitReader, color: int) -> int:
    """One total run of ``color``: zero or more make-up codes, then a
    terminating code (< 64)."""
    total = 0
    for _ in range(64):  # bounded: runs can't exceed 2623 per code
        v = _read_tree(br, _BLACK_TREE if color else _WHITE_TREE)
        total += v
        if v < 64:
            return total
    raise ValueError("ccitt: runaway make-up chain")


def _decode_1d_line(br: _BitReader, width: int) -> list[int]:
    """One 1D-coded line -> transition positions (where the colour
    CHANGES, starting from white; always ends with pos == width)."""
    trans: list[int] = []
    pos = 0
    color = 0
    while pos < width:
        run = _read_run(br, color)
        pos += run
        if pos > width:
            raise ValueError("ccitt: 1D run overruns the line")
        trans.append(pos)
        color ^= 1
    # collapse a trailing zero-length run transition bookkeeping:
    # transitions at == width are legal; consumers treat list end
    return trans


def _decode_2d_line(
    br: _BitReader, width: int, ref: list[int]
) -> list[int]:
    """One 2D-coded line against reference transitions ``ref`` (the
    previous line's transition positions). T.4 §4.2.1.3 / T.6 §2.2."""
    trans: list[int] = []
    a0 = -1
    color = 0
    ptr = 0  # monotonic: a0 only grows, so the b1 scan never restarts
    while True:
        # b1: first reference transition > a0 with the SAME parity as
        # the number of transitions emitted so far would imply —
        # i.e. a transition to the colour opposite the current one.
        while ptr < len(ref) and ref[ptr] <= a0:
            ptr += 1
        # transitions alternate parity, so the matching index is ptr
        # or ptr+1 (ref is non-decreasing: ref[ptr+1] > a0 too)
        i = ptr if (ptr & 1) == color else ptr + 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width
        mode = _read_tree(br, _MODE_TREE)
        if mode == "P":
            if b2 > width:
                raise ValueError("ccitt: pass mode beyond line end")
            a0 = b2
        elif mode == "H":
            start = 0 if a0 < 0 else a0
            r1 = _read_run(br, color)
            r2 = _read_run(br, color ^ 1)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width:
                raise ValueError("ccitt: horizontal runs overrun")
            trans.append(a1)
            trans.append(a2)
            a0 = a2
        elif mode == "EXT":
            raise NotImplementedError(
                "ccitt: uncompressed-mode extension"
            )
        else:  # vertical family
            delta = {
                "V0": 0, "VR1": 1, "VR2": 2, "VR3": 3,
                "VL1": -1, "VL2": -2, "VL3": -3,
            }[mode]
            a1 = b1 + delta
            if a1 < 0 or a1 > width or a1 <= a0 and a0 >= 0:
                raise ValueError("ccitt: vertical mode out of order")
            trans.append(a1)
            a0 = a1
            color ^= 1
        if a0 >= width:
            break
    return trans


def _lines_to_bits(lines: list[list[int]], width: int) -> np.ndarray:
    """Transition lists -> (h, w) uint8 fax bits (0 white, 1 black)
    via cumulative XOR over transition impulses."""
    h = len(lines)
    acc = np.zeros((h, width + 1), np.uint8)
    for y, trans in enumerate(lines):
        for t in trans:
            if t < width:
                acc[y, t] ^= 1
    return np.cumsum(acc[:, :width], axis=1, dtype=np.uint8) & 1


def _expect_eol(br: _BitReader) -> None:
    """Consume fill zeros + the 000000000001 EOL."""
    zeros = 0
    for _ in range(br.n - br.pos + 1):
        b = br.read_bit()
        if b == 1:
            if zeros >= 11:
                return
            raise ValueError("ccitt: malformed EOL")
        zeros += 1
    raise ValueError("ccitt: truncated EOL")


def decode_mh(
    data: bytes, width: int, height: int, align: bool = True
) -> np.ndarray:
    """Pure-1D lines with no EOLs. ``align=True`` is TIFF
    Compression 2 (every line starts on a byte boundary);
    ``align=False`` is PDF CCITTFaxDecode K=0 with the default
    EncodedByteAlign=false (lines packed back-to-back)."""
    br = _BitReader(data)
    lines = []
    for _ in range(height):
        lines.append(_decode_1d_line(br, width))
        if align:
            br.align()
    return _lines_to_bits(lines, width)


def decode_g3(
    data: bytes, width: int, height: int, two_d: bool = False
) -> np.ndarray:
    """TIFF Compression 3 (T.4): EOL before every line; in 2D mode
    (T4Options bit 0) a tag bit after each EOL selects 1D/2D for
    that line. Fill bits before EOLs are consumed; trailing RTC
    (6 EOLs) is tolerated."""
    br = _BitReader(data)
    lines: list[list[int]] = []
    ref: list[int] = []
    for _ in range(height):
        _expect_eol(br)
        if two_d:
            line_1d = br.read_bit() == 1
        else:
            line_1d = True
        if line_1d:
            trans = _decode_1d_line(br, width)
        else:
            trans = _decode_2d_line(br, width, ref)
        lines.append(trans)
        ref = trans
    return _lines_to_bits(lines, width)


def decode_g4(
    data: bytes, width: int, height: int, align: bool = False
) -> np.ndarray:
    """TIFF Compression 4 / PDF K<0 (T.6 MMR): every line 2D against
    the previous line, the first against an imaginary all-white
    line; EOFB after the last line is tolerated but not required
    (strips/streams are length-bounded). ``align=True`` is PDF's
    EncodedByteAlign (each line starts on a byte boundary)."""
    br = _BitReader(data)
    lines: list[list[int]] = []
    ref: list[int] = []
    for _ in range(height):
        if align:
            br.align()
        trans = _decode_2d_line(br, width, ref)
        lines.append(trans)
        ref = trans
    return _lines_to_bits(lines, width)


# -- encoders (fixtures + the write path) ------------------------------


class _BitWriter:
    __slots__ = ("bits",)

    def __init__(self):
        self.bits: list[str] = []

    def put(self, code: str) -> None:
        self.bits.append(code)

    def align(self) -> None:
        n = sum(len(b) for b in self.bits) & 7
        if n:
            self.bits.append("0" * (8 - n))

    def tobytes(self) -> bytes:
        s = "".join(self.bits)
        s += "0" * (-len(s) % 8)
        return bytes(
            int(s[i : i + 8], 2) for i in range(0, len(s), 8)
        )


def _put_run(bw: _BitWriter, run: int, color: int) -> None:
    """Make-up codes (extended table above 1791, chained 2560s above
    2623) followed by one terminating code — the T.4 emission rule."""
    table = BLACK if color else WHITE
    while run >= 2624:
        bw.put(EXT[2560])
        run -= 2560
    if run >= 1792:
        m = (run // 64) * 64
        bw.put(EXT[m])
        run -= m
    elif run >= 64:
        m = (run // 64) * 64
        bw.put(table[m])
        run -= m
    bw.put(table[run])


def _encode_1d_line(bw: _BitWriter, row: np.ndarray) -> None:
    """Alternating colour runs from white (a black-first row gets the
    zero-length white code, per T.4 §4.1.2)."""
    w = len(row)
    pos = 0
    color = 0
    while pos < w:
        end = pos
        while end < w and row[end] == color:
            end += 1
        _put_run(bw, end - pos, color)
        color ^= 1
        pos = end


def encode_mh(bits: np.ndarray, align: bool = True) -> bytes:
    """1D per line: byte-aligned (TIFF Compression 2) or packed
    back-to-back (PDF K=0, ``align=False``)."""
    bw = _BitWriter()
    for row in np.asarray(bits, np.uint8):
        _encode_1d_line(bw, row)
        if align:
            bw.align()
    return bw.tobytes()


def encode_g3_1d(bits: np.ndarray, rtc: bool = False) -> bytes:
    """TIFF Compression 3 writer, 1D lines each behind an EOL;
    ``rtc`` appends the 6-EOL return-to-control trailer (fax-stream
    form — TIFF strips are length-bounded and usually omit it)."""
    bw = _BitWriter()
    for row in np.asarray(bits, np.uint8):
        bw.put("000000000001")
        _encode_1d_line(bw, row)
    if rtc:
        for _ in range(6):
            bw.put("000000000001")
    return bw.tobytes()


def _transitions(row: np.ndarray) -> list[int]:
    d = np.flatnonzero(np.diff(np.concatenate(([0], row))))
    return d.tolist()


def encode_g4(bits: np.ndarray) -> bytes:
    """TIFF Compression 4 (T.6 MMR) writer with EOFB."""
    bits = np.asarray(bits, np.uint8)
    h, w = bits.shape
    bw = _BitWriter()
    ref: list[int] = []
    vcodes = {
        0: "1", 1: "011", 2: "000011", 3: "0000011",
        -1: "010", -2: "000010", -3: "0000010",
    }
    for y in range(h):
        cur = _transitions(bits[y])
        a0 = -1
        color = 0
        ci = 0
        ptr = 0  # monotonic b1 scan (a0 only grows along the line)
        while True:
            a1 = cur[ci] if ci < len(cur) else w
            a2 = cur[ci + 1] if ci + 1 < len(cur) else w
            while ptr < len(ref) and ref[ptr] <= a0:
                ptr += 1
            i = ptr if (ptr & 1) == color else ptr + 1
            b1 = ref[i] if i < len(ref) else w
            b2 = ref[i + 1] if i + 1 < len(ref) else w
            if b2 < a1:
                bw.put("0001")  # pass
                a0 = b2
            elif abs(a1 - b1) <= 3:
                bw.put(vcodes[a1 - b1])  # vertical
                a0 = a1
                color ^= 1
                ci += 1
            else:  # horizontal
                start = 0 if a0 < 0 else a0
                bw.put("001")
                _put_run(bw, a1 - start, color)
                _put_run(bw, a2 - a1, color ^ 1)
                a0 = a2
                ci += 2
            if a0 >= w:
                break
        ref = cur
    bw.put("000000000001000000000001")  # EOFB
    return bw.tobytes()
