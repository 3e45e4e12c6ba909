"""PDF image XObject extraction (operators/pdf, r11 late): scanned
documents are PDFs wrapping page images — DCT (JPEG), CCITTFaxDecode
(via operators/ccitt), and raw Flate rasters — and extracting them
puts scan corpora on the same image-dedup ladder as standalone
images (pixel_sha256 exact tier + dHash quarters)."""

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import imagehash, pdf

RNG = np.random.default_rng(5)
GRAY = RNG.integers(0, 256, size=(40, 60)).astype(np.uint8)
RGBGRAY = RNG.integers(0, 256, size=(40, 60)).astype(np.uint8)
RGB = RNG.integers(0, 256, size=(30, 50, 3)).astype(np.uint8)
BIL = np.where(RNG.random((25, 70)) < 0.4, 0, 255).astype(np.uint8)
IDX = RNG.integers(0, 216, size=(20, 30)).astype(np.uint8)
LUT = np.array(
    [
        (r, g, b)
        for r in range(0, 256, 51)
        for g in range(0, 256, 51)
        for b in range(0, 256, 51)
    ],
    np.uint8,
)


def test_raw_raster_kinds_roundtrip():
    blob = pdf.encode_scan_pdf(
        [("gray8", GRAY), ("rgb8", RGB), ("gray1", BIL), ("indexed", IDX)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert [i["page"] for i in imgs] == [1, 2, 3, 4]
    assert (imgs[0]["pixels"] == GRAY).all() and imgs[0]["channels"] == 1
    assert (imgs[1]["pixels"] == RGB).all() and imgs[1]["channels"] == 3
    assert (imgs[2]["pixels"] == BIL).all()
    assert (imgs[3]["pixels"] == LUT[IDX]).all()


@pytest.mark.parametrize(
    "kind", ["ccitt-g4", "ccitt-k0", "ccitt-k0-aligned"]
)
def test_ccitt_fax_kinds_roundtrip(kind):
    # the three PDF CCITT layouts: G4 (K<0), unaligned 1D (K=0,
    # EncodedByteAlign default false — a DIFFERENT bitstream from
    # TIFF Compression 2), and byte-aligned 1D
    blob = pdf.encode_scan_pdf([(kind, BIL)])
    (img,) = pdf.extract_pdf_images(blob)
    assert img["filter"] == "CCITTFaxDecode"
    assert (img["pixels"] == BIL).all()


def test_dct_and_mask_kinds():
    blob = pdf.encode_scan_pdf([("dct", GRAY), ("mask", BIL)])
    imgs = pdf.extract_pdf_images(blob)
    assert imgs[0]["filter"] == "DCTDecode"
    err = np.abs(
        imgs[0]["pixels"].astype(int) - GRAY.astype(int)
    ).max()
    assert err <= 3  # the JPEG codec's derived round-trip bound
    assert (
        imgs[1]["pixels"] == (BIL >= 128).astype(np.uint8) * 255
    ).all()


def test_inline_and_form_images():
    # r11 late: inline BI..ID..EI images in page content and images
    # nested inside Form XObject resource trees (both were named
    # gaps) extract alongside direct page images
    blob = pdf.encode_scan_pdf(
        [("inline", GRAY), ("form", GRAY), ("gray8", RGBGRAY)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert [i["page"] for i in imgs] == [1, 2, 3]
    assert imgs[0]["name"] == "inline:0" and imgs[0]["obj"] == 0
    assert (imgs[0]["pixels"] == GRAY).all()
    assert imgs[1]["name"] == "Fx0/Im0"
    assert (imgs[1]["pixels"] == GRAY).all()
    assert (imgs[2]["pixels"] == RGBGRAY).all()


def test_inline_adversaries():
    # raster bytes containing ' EI ' (exact-length path) and a 'BI'
    # inside a text string (must not trip the scanner)
    import zlib as _z

    tricky = bytearray(GRAY.tobytes())
    tricky[10:14] = b" EI "
    img2 = np.frombuffer(bytes(tricky), np.uint8).reshape(GRAY.shape)
    h, w = GRAY.shape
    content = (
        f"BT (a BI not an image) Tj ET "
        f"BI /W {w} /H {h} /BPC 8 /CS /G ID ".encode()
        + bytes(tricky)
        + b" EI"
    )
    z = _z.compress(content)
    blob = (
        b"%PDF-1.4\n1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(z)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + z
        + b"\nendstream\nendobj\n"
        b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n"
    )
    imgs = pdf.extract_pdf_images(blob)
    assert len(imgs) == 1 and (imgs[0]["pixels"] == img2).all()


def test_iccbased_maps_to_device_space():
    # ICCBased N=3 decodes as DeviceRGB (the stated colorimetric
    # approximation for a dedup/feature tier)
    blob = pdf.encode_scan_pdf([("rgb8", RGB)])
    blob = blob.replace(
        b"/ColorSpace /DeviceRGB", b"/ColorSpace [/ICCBased 99 0 R]"
    )
    icc = b"99 0 obj\n<< /N 3 /Length 0 >>\nstream\n\nendstream\nendobj\n"
    at = blob.find(b"xref")
    blob = blob[:at] + icc + blob[at:]
    (img,) = pdf.extract_pdf_images(blob)
    assert (img["pixels"] == RGB).all()


def test_separation_and_lab_color_spaces():
    # r14 (VERDICT item 5 — print-originated scans): /Separation
    # through both tint-transform function types, and /Lab via the
    # D50 inverse-f + XYZ->sRGB chain (stated colorimetric
    # approximation, the ICCBased precedent)
    rng = np.random.default_rng(44)
    g = rng.integers(0, 256, (20, 30)).astype(np.uint8)
    lab = rng.integers(0, 256, (10, 14, 3)).astype(np.uint8)
    blob = pdf.encode_scan_pdf(
        [("sep-gray-exp", g), ("sep-sampled", g), ("lab", lab)]
    )
    a, b, c = pdf.extract_pdf_images(blob)
    # exponential 1 - t over DeviceGray: bit-exact inversion
    assert a["channels"] == 1 and (a["pixels"] == 255 - g).all()
    # sampled square-law table: 8-bit inputs land exactly on the
    # 256 samples, so the output IS the table lookup
    table = np.array(
        [int(round((j / 255.0) ** 2 * 255)) for j in range(256)],
        np.uint8,
    )
    assert b["channels"] == 1 and (b["pixels"] == table[g]).all()
    # Lab -> RGB: independent replica of the D50 inverse-f + sRGB
    # encode with the same floor(x*255+.5) rounding
    s = lab.astype(np.float64)
    L = s[:, :, 0] * (100 / 255)
    A = -100 + s[:, :, 1] * (200 / 255)
    B = -100 + s[:, :, 2] * (200 / 255)
    fy = (L + 16) / 116
    fx = fy + A / 500
    fz = fy - B / 200
    d = 6 / 29

    def gf(t):
        return np.where(t > d, t ** 3, 3 * d * d * (t - 4 / 29))

    X, Y, Z = 0.9643 * gf(fx), gf(fy), 0.8251 * gf(fz)
    lin = [
        3.2406 * X - 1.5372 * Y - 0.4986 * Z,
        -0.9689 * X + 1.8758 * Y + 0.0415 * Z,
        0.0557 * X - 0.2040 * Y + 1.0570 * Z,
    ]

    def srgb(v):
        v = np.clip(v, 0, 1)
        return np.where(
            v <= 0.0031308, 12.92 * v, 1.055 * v ** (1 / 2.4) - 0.055
        )

    want = np.clip(
        np.floor(np.stack([srgb(v) for v in lin], axis=2) * 255 + 0.5),
        0, 255,
    ).astype(np.uint8)
    assert c["channels"] == 3 and (c["pixels"] == want).all()
    # edge samples: full-ink black, no-ink white through Separation
    edges = np.array([[0, 255]], np.uint8)
    blob = pdf.encode_scan_pdf([("sep-gray-exp", edges)])
    (img,) = pdf.extract_pdf_images(blob)
    assert img["pixels"].tolist() == [[255, 0]]
    # a type-4 flag on a STREAMLESS inline dict is loud (r14 late:
    # type 4 itself now decodes through the calculator)
    blob = pdf.encode_scan_pdf([("sep-gray-exp", g)])
    bad = blob.replace(b"/FunctionType 2", b"/FunctionType 4")
    with pytest.raises(ValueError, match="without a stream"):
        pdf.extract_pdf_images(bad)
    bad = blob.replace(b"/FunctionType 2", b"/FunctionType 7")
    with pytest.raises(NotImplementedError, match="FunctionType 7"):
        pdf.extract_pdf_images(bad)
    # r14 review finding: a NON-default Lab /Decode is a remap this
    # branch does not model — named, never silently ignored; the
    # explicit default still decodes
    blob = pdf.encode_scan_pdf([("lab", lab)])
    deco = blob.replace(
        b"/BitsPerComponent 8",
        b"/BitsPerComponent 8 /Decode [100 0 -100 100 -100 100]",
    )
    with pytest.raises(NotImplementedError, match="Lab /Decode"):
        pdf.extract_pdf_images(deco)
    deco = blob.replace(
        b"/BitsPerComponent 8",
        b"/BitsPerComponent 8 /Decode [0 100 -100 100 -100 100]",
    )
    (img,) = pdf.extract_pdf_images(deco)
    assert (img["pixels"] == c["pixels"]).all()


def test_stitching_calculator_and_devicen():
    # r14 late: type 3 stitching, the type 4 PostScript calculator,
    # and multi-colorant DeviceN — the remaining tint-transform
    # forms print PDFs carry
    rng = np.random.default_rng(46)
    g = rng.integers(0, 256, (18, 26)).astype(np.uint8)
    ink2 = rng.integers(0, 256, (14, 20, 2)).astype(np.uint8)
    blob = pdf.encode_scan_pdf(
        [("sep-stitch", g), ("sep-ps", g), ("devicen", ink2)]
    )
    a, b, c = pdf.extract_pdf_images(blob)
    # two-segment stitch composing the exact identity
    assert (a["pixels"] == g).all()
    # calculator { 1 exch sub }: exact inversion
    assert (b["pixels"] == 255 - g).all()
    # DeviceN { add 2 div 1 exch sub } over two inks
    va, vb = ink2[:, :, 0] / 255.0, ink2[:, :, 1] / 255.0
    want = np.clip(
        np.floor(np.clip(1 - (va + vb) / 2, 0, 1) * 255 + 0.5),
        0, 255,
    ).astype(np.uint8)
    assert c["channels"] == 1 and (c["pixels"] == want).all()
    # an unknown calculator operator is the named error (same
    # length as 'sub' so the declared /Length still covers it)
    bad = blob.replace(b"{ 1 exch sub }", b"{ 1 exch qux }")
    with pytest.raises(NotImplementedError, match="qux"):
        pdf.extract_pdf_images(bad)
    # colorant-count / function-arity mismatch is loud
    bad = blob.replace(
        b"[/DeviceN [/InkA /InkB]", b"[/DeviceN [/InkA]   "
    )
    with pytest.raises(ValueError, match="arity"):
        pdf.extract_pdf_images(bad)


def test_calculator_hostility_stays_named():
    # r14 review findings: hostile programs must die inside the
    # quarantine envelope's named-error net, never with raw
    # ZeroDivisionError/OverflowError/TypeError
    rng = np.random.default_rng(47)
    g = rng.integers(0, 256, (6, 8)).astype(np.uint8)
    blob = pdf.encode_scan_pdf([("sep-ps", g)])

    def swap(prog):
        assert len(prog) == len(b"{ 1 exch sub }")
        return blob.replace(b"{ 1 exch sub }", prog)

    for prog in (b"{ pop 1 0 div}", b"{ pop 9 nan  }",
                 b"{ pop { } add}", b"{ pop 3 1 rol}"):
        with pytest.raises((ValueError, NotImplementedError)):
            pdf.extract_pdf_images(swap(prog))
    # overflow-prone arithmetic saturates through errstate+clip
    # rather than crashing (inf clips into Range)
    out = pdf.extract_pdf_images(swap(b"{ pop 9 9 exp}"))
    assert out[0]["pixels"].shape == g.shape


def test_calculator_bitwise_and_jp2_depth_and_tile_kw_guards():
    import numpy as np

    from timeseries_data_provider_spark.operators import jpx
    from timeseries_data_provider_spark.operators.pdf import (
        _ps_exec,
        _ps_tokenize,
    )

    # r14 review: and/or/xor are BITWISE on truncated ints (0/1
    # boolean encoding coincides with logical); not is logical on
    # 0/1 and one's-complement elsewhere
    st = []
    _ps_exec(_ps_tokenize(b"{ 6 1 and 6 1 or 6 1 xor 5 not }"), st)
    assert st == [0.0, 7.0, 7.0, -6.0]
    st = [np.array([0.0, 1.0])]
    _ps_exec(_ps_tokenize(b"{ not }"), st)
    assert st[-1].tolist() == [1.0, 0.0]
    # r14 review: JP2 ihdr BPC carries the real depth
    b12 = jpx.encode_jpx(
        np.zeros((16, 16), np.uint16), depth=12, jp2=True
    )
    at = b12.index(b"ihdr")
    assert b12[at + 14] == 11
    # r14 review: per-tile overrides outside the COD/QCD-expressible
    # set are loud (depth is SIZ-global — it silently corrupted)
    with pytest.raises(ValueError, match="not expressible"):
        jpx.encode_jpx(
            np.zeros((64, 64), np.uint8), tile_size=(32, 32),
            tile_kw={1: {"depth": 12}},
        )
    with pytest.raises(ValueError, match="not expressible"):
        jpx.encode_jpx(
            np.zeros((64, 64), np.uint8), tile_size=(32, 32),
            tile_kw={0: {"irreversible": True}},
        )


def test_ps_calculator_operator_matrix():
    # the vectorized RPN interpreter: stack ops, comparisons, and
    # an ARRAY-valued ifelse (both branches run, where-blended)
    import numpy as np

    from timeseries_data_provider_spark.operators.pdf import (
        _ps_exec,
        _ps_tokenize,
    )

    x = np.array([0.0, 0.25, 0.5, 0.75, 1.0])
    proc = _ps_tokenize(
        b"{ dup 0.5 lt { 2 mul } { 1 sub neg 2 mul } ifelse }"
    )
    st = [x.copy()]
    _ps_exec(proc, st)
    assert np.allclose(st[-1], [0.0, 0.5, 1.0, 0.5, 0.0])
    # roll / index / copy / arithmetic
    proc = _ps_tokenize(b"{ 1 2 3 3 -1 roll add add sqrt }")
    st = []
    _ps_exec(proc, st)
    assert np.isclose(st[-1], 6.0 ** 0.5)
    proc = _ps_tokenize(b"{ 4 2 1 index idiv exch pop }")
    st = []
    _ps_exec(proc, st)
    assert st == [4.0, 0.0] or np.isclose(st[-1], 0.0)
    # degrees trig + atan quadrant rule
    proc = _ps_tokenize(b"{ 90 sin 1 1 atan }")
    st = []
    _ps_exec(proc, st)
    assert np.isclose(st[-2], 1.0) and np.isclose(st[-1], 45.0)
    # stack underflow and unbalanced braces are loud
    with pytest.raises(ValueError, match="underflow"):
        _ps_exec(_ps_tokenize(b"{ add }"), [])
    with pytest.raises(ValueError, match="braces"):
        _ps_tokenize(b"{ 1 2 add ")


def test_malformed_page_tree_nodes_are_named_errors():
    # r14 fuzz findings: a catalog or /Kids entry resolving to a
    # non-dict must raise the named ValueError — a raw
    # AttributeError would escape the quarantine envelope's
    # (ValueError, NotImplementedError) net and kill the task
    g = np.zeros((4, 4), np.uint8)
    blob = pdf.encode_scan_pdf([("gray8", g)])
    bad = blob.replace(b"<< /Type /Catalog /Pages 2 0 R >>",
                       b"7", 1)
    with pytest.raises(ValueError, match="catalog|trailer|no doc"):
        pdf.extract_pdf_images(bad)
    bad2 = blob.replace(
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Pages /Kids [9] /Count 1 >>  ",
        1,
    )  # kid is a bare int
    with pytest.raises(ValueError, match="page tree"):
        pdf.extract_pdf_images(bad2)


def test_text_pdf_has_no_images():
    blob = pdf.encode_pdf([["just text"]], encrypt="rc4-128")
    assert pdf.extract_pdf_images(blob) == []


def test_named_gaps_and_hostile():
    blob = pdf.encode_scan_pdf([("gray8", GRAY)])
    # /JPXDecode DECODES as of r13 (operators/jpx) — a Flate raster
    # relabeled as JPX is now corrupt data, not a named gap
    with pytest.raises(ValueError, match="jpx"):
        pdf.extract_pdf_images(
            blob.replace(b"/FlateDecode", b"/JPXDecode\x20\x20")
        )
    with pytest.raises(NotImplementedError, match="colour space"):
        pdf.extract_pdf_images(
            blob.replace(b"/DeviceGray", b"/Separation")
        )
    # geometry lie: Width patched up -> raster too short, loud
    with pytest.raises(ValueError, match="raster|canvas"):
        pdf.extract_pdf_images(
            blob.replace(b"/Width 60", b"/Width 61")
        )
    # CCITT geometry disagreement between DecodeParms and the dict
    cblob = pdf.encode_scan_pdf([("ccitt-g4", BIL)])
    with pytest.raises(ValueError, match="disagrees"):
        pdf.extract_pdf_images(
            cblob.replace(b"/Columns 70", b"/Columns 71")
        )
    # Indexed sample above hival
    iblob = pdf.encode_scan_pdf([("indexed", IDX)])
    with pytest.raises(ValueError, match="hival"):
        pdf.extract_pdf_images(
            iblob.replace(b"215 <", b"002 <")
        )


def test_truncated_image_stream_loud():
    blob = pdf.encode_scan_pdf([("ccitt-g4", BIL)])
    # halve the stream's bytes but keep /Length honest about it:
    # decode must fail loudly, not emit a partial page silently
    at = blob.find(b"stream\n", blob.find(b"/CCITTFaxDecode")) + 7
    end = blob.find(b"\nendstream", at)
    n = end - at
    cut = blob[: at + n // 2] + blob[end:]
    cut = cut.replace(
        f"/Length {n}".encode(), f"/Length {n // 2}".encode()
    )
    with pytest.raises(ValueError):
        pdf.extract_pdf_images(cut)


def test_pdf_image_features_spark(spark):
    import pandas as pd

    blob1 = pdf.encode_scan_pdf(
        [("ccitt-g4", BIL), ("gray8", GRAY)]
    )
    blob2 = pdf.encode_scan_pdf([("ccitt-g4", BIL)])  # dup page scan
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, None],
                "payload": [blob1, blob2, None],
            }
        )
    )
    rows = pdf.pdf_image_features(df).orderBy("doc_id", "page").collect()
    assert len(rows) == 3  # NULL row dropped JVM-side
    r1, r2, r3 = rows
    assert (r1["doc_id"], r1["page"], r1["filter"]) == (
        1,
        1,
        "CCITTFaxDecode",
    )
    # exact dedup: the duplicated scan page hashes identically
    assert r1["pixel_sha256"] == r3["pixel_sha256"]
    assert r1["dhash"] == r3["dhash"]
    assert r2["pixel_sha256"] != r1["pixel_sha256"]
    # dhash parity with the standalone image ladder
    want = imagehash.dhash_bits(BIL)
    got = r1["dhash"] + (1 << 64) if r1["dhash"] < 0 else r1["dhash"]
    assert got == want
    assert [r1[f"q{q}"] for q in range(4)] == [
        (want >> (16 * q)) & 0xFFFF for q in range(4)
    ]


def test_cmyk_image_chain():
    # r12: 4-component Adobe DCT (CMYK + YCCK) and raw DeviceCMYK
    # Flate rasters decode through the scan chain with channels=4
    rng = np.random.default_rng(99)
    cmyk = (
        np.cumsum(rng.integers(-3, 4, size=(16, 24, 4)), axis=1) % 230
        + 10
    ).astype(np.uint8)
    blob = pdf.encode_scan_pdf(
        [("dct-cmyk", cmyk), ("dct-ycck", cmyk), ("cmyk8", cmyk)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert [i["page"] for i in imgs] == [1, 2, 3]
    assert all(i["channels"] == 4 for i in imgs)
    # raw raster is exact; DCT forms inside the derived bound
    assert np.array_equal(imgs[2]["pixels"], cmyk)
    for i, bound in ((0, 1), (1, 3)):
        err = np.abs(
            imgs[i]["pixels"].astype(int) - cmyk.astype(int)
        ).max()
        assert err <= bound, (i, err)
    assert imgs[0]["filter"] == "DCTDecode"
    assert imgs[2]["filter"] is None


def test_cmyk_features_rows(spark):
    rng = np.random.default_rng(3)
    cmyk = (rng.integers(0, 256, size=(8, 8, 4))).astype(np.uint8)
    blob = pdf.encode_scan_pdf([("cmyk8", cmyk)])
    df = spark.createDataFrame(
        [(1, blob)], "doc_id long, payload binary"
    )
    rows = pdf.pdf_image_features(df).collect()
    assert len(rows) == 1 and rows[0]["channels"] == 4
    assert rows[0]["pixel_milli"] == (
        1000 * int(cmyk.sum(dtype=np.int64))
    ) // cmyk.size


def test_decode_inversion_arrays():
    # /Decode [1 0 ...] (r12): full per-component inversion on every
    # raster family; stored data is unchanged, so output must be the
    # channel inverse of the no-Decode form
    cmyk = np.dstack([GRAY, 255 - GRAY, GRAY // 2, 255 - GRAY // 2])
    idx_stored = (255 - IDX).astype(np.uint8)  # maps back into 0..215
    blob = pdf.encode_scan_pdf(
        [
            ("gray8+dinv", GRAY),
            ("rgb8+dinv", RGB),
            ("cmyk8+dinv", cmyk),
            ("gray1+dinv", BIL),
            ("mask+dinv", BIL),
            ("indexed+dinv", idx_stored),
        ]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert (imgs[0]["pixels"] == 255 - GRAY).all()
    assert (imgs[1]["pixels"] == 255 - RGB).all()
    assert (imgs[2]["pixels"] == 255 - cmyk).all()
    assert (imgs[3]["pixels"] == 255 - BIL).all()
    assert (imgs[4]["pixels"] == 255 - BIL).all()
    # Indexed /Decode [255 0] reverses INDEX values, not colors
    assert (imgs[5]["pixels"] == LUT[IDX]).all()


def test_decode_inversion_mixed_components():
    # per-component flags are independent: invert R and B, keep G
    blob = pdf.encode_scan_pdf([("rgb8", RGB)]).replace(
        b"/BitsPerComponent 8",
        b"/BitsPerComponent 8 /Decode [1 0 0 1 1 0]",
    )
    (img,) = pdf.extract_pdf_images(blob)
    want = RGB.copy()
    want[:, :, 0] = 255 - want[:, :, 0]
    want[:, :, 2] = 255 - want[:, :, 2]
    assert (img["pixels"] == want).all()


def test_ccitt_blackis1_and_decode():
    # BlackIs1 true: fax bits ARE the stored samples (§7.4.6
    # Table 11), so display inverts vs the default — unless /Decode
    # [1 0] inverts it back
    b_plain = pdf.encode_scan_pdf([("ccitt-g4", BIL)])
    b_b1 = pdf.encode_scan_pdf([("ccitt-g4-b1", BIL)])
    b_b1_inv = pdf.encode_scan_pdf([("ccitt-g4-b1+dinv", BIL)])
    b_inv = pdf.encode_scan_pdf([("ccitt-g4+dinv", BIL)])
    assert (pdf.extract_pdf_images(b_plain)[0]["pixels"] == BIL).all()
    assert (pdf.extract_pdf_images(b_b1)[0]["pixels"] == 255 - BIL).all()
    assert (pdf.extract_pdf_images(b_b1_inv)[0]["pixels"] == BIL).all()
    assert (pdf.extract_pdf_images(b_inv)[0]["pixels"] == 255 - BIL).all()


def test_jbig2_and_dct_decode_inversion():
    blob = pdf.encode_scan_pdf(
        [("jbig2+dinv", BIL), ("dct", GRAY), ("dct+dinv", GRAY)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert (imgs[0]["pixels"] == 255 - BIL).all()
    # DCT is bounded-lossy, but inversion applies to the DECODED
    # pixels, so the pair is exactly complementary
    assert (imgs[2]["pixels"] == 255 - imgs[1]["pixels"]).all()


def test_decode_array_hostile():
    base = pdf.encode_scan_pdf([("gray8+dinv", GRAY)])
    # fractional endpoints REMAP as of r13 (linear tone curve,
    # floor(x+0.5)): [0 2] doubles the sample, clipped at 255
    wide = base.replace(b"/Decode [1 0]", b"/Decode [0 2]")
    got = pdf.extract_pdf_images(wide)[0]["pixels"]
    want = np.clip(
        np.floor(GRAY.astype(np.float64) * 2 + 0.5), 0, 255
    ).astype(np.uint8)
    assert (got == want).all()
    # a half-range remap [0 0.5]
    half = base.replace(b"/Decode [1 0]", b"/Decode [0 0.5]")
    got = pdf.extract_pdf_images(half)[0]["pixels"]
    want = np.floor(GRAY.astype(np.float64) * 0.5 + 0.5).astype(
        np.uint8
    )
    assert (got == want).all()
    # wrong arity is malformed, not unsupported
    bad = base.replace(b"/Decode [1 0]", b"/Decode [1 0 1]")
    with pytest.raises(ValueError, match="Decode array"):
        pdf.extract_pdf_images(bad)
    # Indexed non-default/non-reversal /Decode is a named gap
    idx = pdf.encode_scan_pdf([("indexed+dinv", 255 - IDX)]).replace(
        b"/Decode [255 0]", b"/Decode [0 101]"
    )
    with pytest.raises(NotImplementedError, match="Indexed /Decode"):
        pdf.extract_pdf_images(idx)


def test_sampled_function_encode_decode_order_size1():
    # r15 (VERDICT finding #1 + ADVICE): the Type 0 sampled tint
    # transform honors /Encode and /Decode, names /Order 3, and
    # accepts the legal /Size [1] constant table
    g = np.arange(256, dtype=np.uint8).reshape(16, 16)
    blob = pdf.encode_scan_pdf([("sep-sampled", g)])
    table = np.array(
        [int(round((j / 255.0) ** 2 * 255)) for j in range(256)],
        np.uint8,
    )
    # non-default /Encode [255 0]: reversed index walk — 8-bit
    # inputs land exactly on the flipped samples
    enc = blob.replace(
        b"/Size [256]", b"/Size [256] /Encode [255 0]"
    )
    (img,) = pdf.extract_pdf_images(enc)
    assert (img["pixels"] == table[255 - g]).all()
    # non-default /Decode [0 0.5]: output remap BEFORE the Range
    # clip — half-intensity, floor(x*255 + .5) device rounding
    dec = blob.replace(
        b"/Size [256]", b"/Size [256] /Decode [0 0.5]"
    )
    (img,) = pdf.extract_pdf_images(dec)
    want = np.floor(table.astype(np.float64) * 0.5 + 0.5).astype(
        np.uint8
    )
    assert (img["pixels"] == want[g]).all()
    # /Order 3 cubic-spline interpolation is the named gap
    o3 = blob.replace(b"/Size [256]", b"/Size [256] /Order 3")
    with pytest.raises(NotImplementedError, match="Order 3"):
        pdf.extract_pdf_images(o3)
    # /Size [1] is a legal constant table (ADVICE r14) — every
    # input maps to sample 0
    s1 = blob.replace(b"/Size [256]", b"/Size [1]")
    (img,) = pdf.extract_pdf_images(s1)
    assert (img["pixels"] == table[0]).all()
    # malformed /Encode arity stays a named ValueError
    bad = blob.replace(
        b"/Size [256]", b"/Size [256] /Encode [0 1 2]"
    )
    with pytest.raises(ValueError, match="Encode shape"):
        pdf.extract_pdf_images(bad)


def test_calculator_bitshift_scalar_array_parity():
    # ADVICE r14: arithmetic right shift must agree between the
    # scalar and array paths for negative operands (floor, not
    # trunc-toward-zero)
    import numpy as np

    from timeseries_data_provider_spark.operators.pdf import (
        _ps_exec,
        _ps_tokenize,
    )

    st = []
    _ps_exec(_ps_tokenize(b"{ -3 -1 bitshift }"), st)
    assert st == [-2.0]
    st = [np.array([-3.0, 3.0, -8.0, 7.0])]
    _ps_exec(_ps_tokenize(b"{ -1 bitshift }"), st)
    assert st[-1].tolist() == [-2.0, 1.0, -4.0, 3.0]
    # left shift parity on the same operands
    st = [np.array([-3.0, 3.0])]
    _ps_exec(_ps_tokenize(b"{ 2 bitshift }"), st)
    assert st[-1].tolist() == [-12.0, 12.0]


def test_jpx_undefined_mct_byte_is_loud():
    # ADVICE r14: SGcod multiple-component-transform bytes other
    # than 0/1 are undefined (T.800 A.6.1) — named, never silently
    # truthy
    import numpy as np

    from timeseries_data_provider_spark.operators import jpx

    blob = jpx.encode_jpx(np.zeros((16, 16, 3), np.uint8))
    at = blob.index(b"\xff\x52")
    assert blob[at + 8] in (0, 1)
    bad = blob[: at + 8] + b"\x02" + blob[at + 9 :]
    with pytest.raises(ValueError, match="MCT"):
        jpx.decode_jpx(bad)


def test_pdf_chain_fused_matches_two_pipelines(spark):
    """The r15 fused PDF pass must emit exactly what the separate
    synth_pdf_corpus + pdf_features and synth_scan_pdf_media +
    pdf_image_features + per-doc aggregate pipelines produce, across
    the full font (id%9) and codec (id%6 / id%8 / id%2) rotations."""
    from pyspark.sql import functions as F

    from timeseries_data_provider_spark.operators import pdf as pdfmod

    rows = [(i, f"body text {i} qq") for i in range(0, 24)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    fused = (
        pdfmod.synth_pdf_chain_features(d).orderBy("doc_id").toPandas()
    )
    pdfcols = pdfmod.pdf_features(pdfmod.synth_pdf_corpus(d)).select(
        "doc_id",
        F.col("n_pages").alias("pdf_pages"),
        F.col("title").alias("pdf_title"),
        F.col("text").alias("pdf_text"),
        F.col("n_text_chars").alias("pdf_text_chars"),
    )
    scancols = (
        pdfmod.pdf_image_features(pdfmod.synth_scan_pdf_media(d))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("scan_pages"),
            F.sum(
                F.when(F.col("page") == 1, F.col("pixel_milli"))
            ).alias("scan_px1_milli"),
            F.sum(
                F.when(F.col("page") == 2, F.col("pixel_milli"))
            ).alias("scan_px2_milli"),
            F.sum(
                F.when(F.col("page") == 3, F.col("pixel_milli"))
            ).alias("scan_px3_milli"),
        )
    )
    want = (
        pdfcols.join(scancols, "doc_id").orderBy("doc_id").toPandas()
    )
    assert list(fused.columns) == list(want.columns)
    for col in fused.columns:
        a, b = fused[col], want[col]
        assert ((a == b) | (a.isna() & b.isna())).all(), col
