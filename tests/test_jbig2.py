"""JBIG2 generic-region codec (operators/jbig2.py, r12): the MQ
arithmetic coder + T.88 generic templates + the embedded segment
stream PDFs carry. Validation is encoder/decoder round-trip (stated
self-validation posture — no independent JBIG2 exists in this
container) EXCEPT the MMR path, which rides the JDK-cross-validated
CCITT G4 codec."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import ccitt, jbig2, pdf


def _rand_bitmaps(rng, n=6):
    for k in range(n):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 60))
        if k % 3 == 0:
            yield (rng.random((h, w)) < 0.5).astype(np.uint8)
        elif k % 3 == 1:
            yield (rng.random((h, w)) < 0.05).astype(np.uint8)
        else:
            bm = np.zeros((h, w), np.uint8)
            bm[::3] = 1
            yield bm


def test_mq_coder_roundtrip_random_and_skewed():
    rng = np.random.default_rng(11)
    for n in (1, 2, 17, 300, 4000):
        for skew in (0.5, 0.02, 0.98):
            bits = (rng.random(n) < skew).astype(int)
            ctxs = rng.integers(0, 16, n)
            icx = np.zeros(16, np.uint8)
            mps = np.zeros(16, np.uint8)
            enc = jbig2.MQEncoder()
            for b, cx in zip(bits, ctxs):
                enc.encode(icx, mps, int(cx), int(b))
            data = enc.flush()
            icx2 = np.zeros(16, np.uint8)
            mps2 = np.zeros(16, np.uint8)
            dec = jbig2.MQDecoder(data)
            got = [dec.decode(icx2, mps2, int(cx)) for cx in ctxs]
            assert got == list(bits), (n, skew)


def test_generic_region_all_templates_roundtrip():
    rng = np.random.default_rng(3)
    for bm in _rand_bitmaps(rng):
        h, w = bm.shape
        for template in (0, 1, 2, 3):
            for tpgdon in (False, True):
                data = jbig2.encode_generic_region(
                    bm, template, tpgdon
                )
                out = jbig2.decode_generic_region(
                    data, w, h, template, tpgdon
                )
                assert np.array_equal(out, bm), (template, tpgdon)


def test_tpgdon_compresses_typical_rows():
    # banded content (rows repeat) must code smaller with TPGDON on
    bm = np.zeros((64, 64), np.uint8)
    bm[8:56] = 1
    plain = jbig2.encode_generic_region(bm, 0, False)
    typical = jbig2.encode_generic_region(bm, 0, True)
    assert len(typical) < len(plain)


def test_embedded_stream_roundtrip_and_mmr():
    rng = np.random.default_rng(5)
    bm = (rng.random((33, 47)) < 0.2).astype(np.uint8)
    for mmr in (False, True):
        blob = jbig2.encode_jbig2_generic(bm, mmr=mmr)
        out = jbig2.decode_jbig2_embedded(blob)
        assert np.array_equal(out, bm), mmr
    # the MMR region body IS a T.6 stream — decodable by the
    # JDK-cross-validated ccitt codec directly (tier consistency)
    assert np.array_equal(
        ccitt.decode_g4(ccitt.encode_g4(bm), 47, 33), bm
    )


def test_page_composition_and_bounds():
    # hand-build: 10x6 page, one 4x3 region at (2,1) composed by OR
    region_bm = np.ones((3, 4), np.uint8)
    body = jbig2.encode_generic_region(region_bm, 0, False)
    at = b"".join(
        struct.pack("bb", ax, ay) for ax, ay in jbig2._NOMINAL_AT[0]
    )
    region = (
        struct.pack(">IIII", 4, 3, 2, 1) + bytes([0]) + bytes([0])
        + at + body
    )
    page_info = (
        struct.pack(">IIII", 10, 6, 0, 0) + bytes([0])
        + struct.pack(">H", 0)
    )

    def seg(num, typ, payload):
        return (
            struct.pack(">I", num) + bytes([typ]) + bytes([0])
            + bytes([1]) + struct.pack(">I", len(payload)) + payload
        )

    stream = seg(0, 48, page_info) + seg(1, 39, region)
    out = jbig2.decode_jbig2_embedded(stream)
    want = np.zeros((6, 10), np.uint8)
    want[1:4, 2:6] = 1
    assert np.array_equal(out, want)
    # region spilling past the page is loud
    bad_region = (
        struct.pack(">IIII", 9, 3, 2, 4) + bytes([0]) + bytes([0])
        + at + body
    )
    with pytest.raises(ValueError, match="exceeds page"):
        jbig2.decode_jbig2_embedded(
            seg(0, 48, page_info) + seg(1, 39, bad_region)
        )


def test_named_gaps_and_hostile_inputs():
    bm = np.zeros((4, 4), np.uint8)
    blob = bytearray(jbig2.encode_jbig2_generic(bm))
    with pytest.raises(ValueError, match="truncated segment header"):
        jbig2.decode_jbig2_embedded(bytes(blob[:7]))
    # symbol-dictionary segments are the named scope boundary
    sym = bytearray(blob)
    sym[4] = (sym[4] & 0xC0) | 0  # first segment type -> 0
    with pytest.raises(NotImplementedError, match="symbol"):
        jbig2.decode_jbig2_embedded(bytes(sym))
    # unknown-length segment
    ul = bytearray(blob)
    struct.pack_into(">I", ul, 7, 0xFFFFFFFF)
    with pytest.raises(NotImplementedError, match="unknown-length"):
        jbig2.decode_jbig2_embedded(bytes(ul))
    # data length beyond the stream
    dl = bytearray(blob)
    struct.pack_into(">I", dl, 7, 10_000)
    with pytest.raises(ValueError, match="exceeds stream"):
        jbig2.decode_jbig2_embedded(bytes(dl))
    # non-nominal AT pixels are a named scope boundary: patch the
    # first AT byte (located by its nominal signature)
    nn = bytearray(blob)
    at0 = bytes(blob).find(b"\x03\xff\xfd\xff")  # A1=(3,-1), A2=(-3,-1)
    assert at0 > 0
    nn[at0] = 1
    with pytest.raises(NotImplementedError, match="non-nominal"):
        jbig2.decode_jbig2_embedded(bytes(nn))
    # implausible page raises before allocation
    huge = bytearray(blob)
    struct.pack_into(">II", huge, 11, 1 << 16, 1 << 16)
    with pytest.raises(ValueError, match="unreasonable page"):
        jbig2.decode_jbig2_embedded(bytes(huge))
    # empty stream
    with pytest.raises(ValueError, match="no page or region"):
        jbig2.decode_jbig2_embedded(b"")


def test_pdf_scan_chain_pixel_exact():
    rng = np.random.default_rng(8)
    gray = np.where(
        rng.random((40, 56)) < 0.15, 0, 255
    ).astype(np.uint8)
    blob = pdf.encode_scan_pdf(
        [("jbig2", gray), ("jbig2-mmr", gray), ("jbig2-tpgdon", gray)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert [i["filter"] for i in imgs] == ["JBIG2Decode"] * 3
    for img in imgs:
        assert img["channels"] == 1
        assert np.array_equal(img["pixels"], gray)


def test_pdf_image_features_jbig2(spark):
    rng = np.random.default_rng(21)
    gray = np.where(
        rng.random((24, 32)) < 0.3, 0, 255
    ).astype(np.uint8)
    blob = pdf.encode_scan_pdf([("jbig2", gray)])
    df = spark.createDataFrame(
        [(1, blob)], "doc_id long, payload binary"
    )
    rows = pdf.pdf_image_features(df).collect()
    assert len(rows) == 1
    assert rows[0]["pixel_milli"] == (
        1000 * int(gray.sum(dtype=np.int64))
    ) // gray.size
