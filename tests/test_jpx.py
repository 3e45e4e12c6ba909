"""JPEG 2000 lossless 5/3 subset (operators/jpx.py, r13 — VERDICT
r12 item 6). Validation posture per the module docstring: no
independent JPEG 2000 implementation exists in this container, so
these tests pin encoder/decoder round-trips across the parameter
matrix, the spec mechanics in isolation (tag trees, pass codewords,
DWT at every length), hostile-input contracts, and a byte-pinned
fixture so any mechanical drift fails loudly."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import jpx, pdf


def test_dwt53_roundtrip_every_length():
    rng = np.random.default_rng(1)
    for n in range(1, 70):
        x = rng.integers(-1000, 1000, n)
        lo, hi = jpx._fdwt53_1d(x)
        assert len(lo) == (n + 1) // 2 and len(hi) == n // 2
        assert (jpx._idwt53_1d(lo, hi) == x).all(), n
    for shape in ((8, 8), (13, 7), (1, 9), (9, 1), (32, 17), (2, 2)):
        a = rng.integers(-300, 300, shape)
        ll, lh, hl, hh = jpx._fdwt53_2d(a)
        assert (jpx._idwt53_2d(ll, lh, hl, hh) == a).all(), shape


def test_tier1_codeblock_roundtrip_all_orients():
    rng = np.random.default_rng(2)
    for shape in ((4, 4), (16, 16), (13, 9), (1, 1), (3, 17),
                  (64, 64)):
        for orient in ("LL", "HL", "LH", "HH"):
            c = rng.integers(-200, 200, shape)
            n_planes = max(1, int(np.abs(c).max()).bit_length())
            data = jpx._encode_codeblock(c, orient, n_planes)
            back = jpx._decode_codeblock(
                data, shape[0], shape[1], orient, n_planes
            )
            assert (back == c).all(), (shape, orient)
    # sparse blocks (the realistic post-DWT shape: run-length paths)
    c = np.zeros((32, 32), np.int64)
    idx = rng.integers(0, 32, (40, 2))
    c[idx[:, 0], idx[:, 1]] = rng.integers(-1000, 1000, 40)
    n_planes = int(np.abs(c).max()).bit_length()
    back = jpx._decode_codeblock(
        jpx._encode_codeblock(c, "HH", n_planes), 32, 32, "HH",
        n_planes,
    )
    assert (back == c).all()


def test_tagtree_roundtrip():
    rng = np.random.default_rng(3)
    for w, h in ((1, 1), (3, 2), (8, 8), (5, 7)):
        vals = rng.integers(0, 6, (h, w)).astype(np.int32)
        wr = jpx._HdrWriter()
        enc = jpx._TagTreeEnc(w, h, vals)
        for y in range(h):
            for x in range(w):
                enc.encode(wr, x, y, 1 << 30)
        data = wr.finish()
        rd = jpx._HdrReader(data)
        dec = jpx._TagTreeDec(w, h)
        for y in range(h):
            for x in range(w):
                assert dec.decode(rd, x, y, 1 << 30) == vals[y, x]


def test_codestream_roundtrip_matrix():
    rng = np.random.default_rng(9)
    ys, xs = np.mgrid[0:40, 0:56]
    cases = [
        (((xs * 3 + ys * 5) % 256).astype(np.uint8), {}),
        (np.stack(
            [(xs * 7) % 256, (ys * 3) % 256, (xs * ys) % 256], 2
        ).astype(np.uint8), {}),
        (np.stack(
            [(xs * 7) % 256, (ys * 3) % 256, ((xs + ys) * 2) % 256],
            2,
        ).astype(np.uint8), {"mct": False}),
        (rng.integers(0, 256, (33, 47)).astype(np.uint8),
         {"levels": 3}),
        (rng.integers(0, 256, (17, 11)).astype(np.uint8),
         {"levels": 0}),
        (rng.integers(0, 256, (70, 90)).astype(np.uint8),
         {"levels": 5}),
        (rng.integers(0, 256, (50, 60)).astype(np.uint8),
         {"cb_exp": (4, 4)}),
        (rng.integers(0, 256, (24, 24, 3)).astype(np.uint8),
         {"sop": True, "eph": True}),
        (rng.integers(0, 256, (18, 30)).astype(np.uint8),
         {"jp2": True}),
        (np.array([[7]], np.uint8), {"levels": 0}),
        (np.full((32, 32), 200, np.uint8), {}),
        (rng.integers(0, 256, (1, 37)).astype(np.uint8),
         {"levels": 1}),
    ]
    for img, kw in cases:
        blob = jpx.encode_jpx(img, **kw)
        d = jpx.decode_jpx(blob)
        assert d["pixels"].shape == img.shape, kw
        assert (d["pixels"] == img).all(), kw


def test_pinned_fixture_bytes_and_decode():
    # deterministic fixture: any mechanical drift in the encoder OR
    # decoder (tag trees, MQ, DWT, packet layout) moves these hashes
    ys, xs = np.mgrid[0:24, 0:40]
    img = ((xs * 11 + ys * 7) % 256).astype(np.uint8)
    blob = jpx.encode_jpx(img, levels=2)
    assert hashlib.sha256(blob).hexdigest() == (
        "36086cfdd280c9c2968abd60ba014024758756ca42cead9a7bd8c4dd1b8e253f"
    )
    d = jpx.decode_jpx(blob)
    assert (d["pixels"] == img).all()


def test_hostile_inputs_named_errors():
    img = np.full((16, 16), 9, np.uint8)
    good = jpx.encode_jpx(img, levels=1)
    with pytest.raises(ValueError, match="neither a codestream"):
        jpx.decode_jpx(b"garbage here")
    with pytest.raises(ValueError, match="missing SIZ|marker"):
        jpx.decode_jpx(good[:4])
    # dimension guard
    big = bytearray(good)
    at = good.index(b"\xff\x51") + 6
    import struct as _s

    _s.pack_into(">II", big, at, 100000, 100000)
    with pytest.raises(ValueError, match="pixel guard"):
        jpx.decode_jpx(bytes(big))
    # 9/7 DECODES as of r13 late — but a 9/7 flag over a
    # no-quantization QCD is inconsistent and loud
    w97 = bytearray(good)
    cod_at = good.index(b"\xff\x52")
    w97[cod_at + 13] = 0  # SPcod transform byte
    with pytest.raises(ValueError, match="no-quantization"):
        jpx.decode_jpx(bytes(w97))
    # layers DECODE as of r13 late; a header claiming more layers
    # than the stream carries is loud damage, and an implausible
    # count is guarded
    lay = bytearray(good)
    _s.pack_into(">H", lay, cod_at + 6, 3)
    with pytest.raises(ValueError, match="jpx"):
        jpx.decode_jpx(bytes(lay))
    lay2 = bytearray(good)
    _s.pack_into(">H", lay2, cod_at + 6, 999)
    with pytest.raises(ValueError, match="implausible layer"):
        jpx.decode_jpx(bytes(lay2))
    # truncated codeblock data
    with pytest.raises(ValueError, match="truncated|header|Psot"):
        jpx.decode_jpx(good[:-20])
    # r13 review: a zero-length marker segment must raise, not loop
    zl = bytearray(good)
    _s.pack_into(">H", zl, good.index(b"\xff\x52") + 2, 0)
    with pytest.raises(ValueError, match="length 0"):
        jpx.decode_jpx(bytes(zl))
    # encoder guards
    with pytest.raises(ValueError, match="components"):
        jpx.encode_jpx(np.zeros((4, 4, 2), np.uint8))
    with pytest.raises(ValueError, match="levels"):
        jpx.encode_jpx(img, levels=9)


def test_pdf_jpx_scan_chain():
    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, (20, 41)).astype(np.uint8)
    rgb = rng.integers(0, 256, (18, 22, 3)).astype(np.uint8)
    blob = pdf.encode_scan_pdf(
        [("jpx", gray), ("jpx-jp2", rgb), ("jpx", gray)]
    )
    imgs = pdf.extract_pdf_images(blob)
    assert [im["filter"] for im in imgs] == ["JPXDecode"] * 3
    assert (imgs[0]["pixels"] == gray).all()
    assert (imgs[1]["pixels"] == rgb).all()
    # a geometry lie is loud
    broken = pdf.encode_scan_pdf([("jpx", gray)])
    bad = broken.replace(b"/Width 41", b"/Width 40")
    with pytest.raises(ValueError, match="dict says"):
        pdf.extract_pdf_images(bad)


def test_dwt53_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-(1 << 20), max_value=1 << 20),
            min_size=1,
            max_size=80,
        )
    )
    def check(xs):
        x = np.array(xs, np.int64)
        lo, hi = jpx._fdwt53_1d(x)
        assert (jpx._idwt53_1d(lo, hi) == x).all()

    check()


def test_tier1_roundtrip_property():
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=0, max_value=3),
        st.data(),
    )
    def check(h, w, oi, data):
        orient = ("LL", "HL", "LH", "HH")[oi]
        c = np.array(
            data.draw(
                st.lists(
                    st.integers(min_value=-300, max_value=300),
                    min_size=h * w,
                    max_size=h * w,
                )
            ),
            np.int64,
        ).reshape(h, w)
        n_planes = max(1, int(np.abs(c).max()).bit_length())
        seg = jpx._encode_codeblock(c, orient, n_planes)
        back = jpx._decode_codeblock(seg, h, w, orient, n_planes)
        assert (back == c).all()
        # r14: the same block under a random coder-option combo
        style = data.draw(
            st.sampled_from([0x01, 0x02, 0x04, 0x20, 0x05, 0x27])
        )
        blob, _marks, seg_ends = jpx._encode_codeblock(
            c, orient, n_planes, want_marks=True, cb_style=style
        )
        segs = [
            blob[a:b] for a, b in zip([0] + seg_ends[:-1], seg_ends)
        ]
        back = jpx._decode_codeblock(
            segs, h, w, orient, n_planes, cb_style=style
        )
        assert (back == c).all(), style

    check()


def test_irreversible_97_roundtrip_and_consistency():
    # the real-world lossy default (r13 late): 9/7 + expounded
    # scalar quantizer + ICT; self round-trip within quantization
    # error (posture stated in the module docstring)
    rng = np.random.default_rng(4)
    ys, xs = np.mgrid[0:40, 0:56]
    gray = ((xs * 3 + ys * 5) % 256).astype(np.uint8)
    rgb = np.stack(
        [(xs * 7) % 256, (ys * 3) % 256, (xs * ys) % 256], 2
    ).astype(np.uint8)
    noise = rng.integers(0, 256, (23, 31)).astype(np.uint8)
    for img, tol in ((gray, 1), (rgb, 2), (noise, 3)):
        for levels in (1, 3):
            blob = jpx.encode_jpx(
                img, levels=levels, irreversible=True
            )
            d = jpx.decode_jpx(blob)
            err = np.abs(
                d["pixels"].astype(int) - img.astype(int)
            ).max()
            assert err <= tol, (img.shape, levels, err)
    # more planes -> tighter reconstruction
    blob = jpx.encode_jpx(rgb, levels=2, irreversible=True, planes=14)
    d = jpx.decode_jpx(blob)
    assert np.abs(d["pixels"].astype(int) - rgb.astype(int)).max() == 0
    # 1D 9/7 lifting is numerically lossless pre-quantization
    for n in (1, 2, 7, 40):
        x = rng.normal(0, 200, n)
        lo, hi = jpx._fdwt97_1d(x)
        assert np.abs(jpx._idwt97_1d(lo, hi) - x).max() < 1e-9
    # mixed wavelet/QCD styles are loud both ways
    blob97 = jpx.encode_jpx(gray, levels=1, irreversible=True)
    import struct as _s

    cod_at = blob97.index(b"\xff\x52")
    flip = bytearray(blob97)
    flip[cod_at + 13] = 1  # claim 5/3 over a style-2 QCD
    with pytest.raises(ValueError, match="expounded"):
        jpx.decode_jpx(bytes(flip))
    # QCD style 1 (scalar derived) is the remaining named gap
    qcd_at = blob97.index(b"\xff\x5c")
    der = bytearray(blob97)
    # r14: QCD style 1 (scalar derived) now DECODES — a style-2
    # stream reflagged as style 1 is syntactically a VALID derived
    # stream with different step sizes, so it either decodes (to
    # other values) or dies loudly on a bit-plane mismatch; it can
    # never be told apart from a real style-1 stream
    der[qcd_at + 4] = (der[qcd_at + 4] & 0xE0) | 1
    try:
        out = jpx.decode_jpx(bytes(der))
        assert out["pixels"].shape == rgb.shape
    except ValueError:
        pass


def test_multi_layer_roundtrip_and_truncation():
    # quality layers (r13 late): tag-tree/Lblock/pass state persists
    # across layers, chunks concatenate, and Tier-1 runs with the
    # summed pass budget — so TRUNCATED layered streams decode
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for layers in (2, 3, 5):
        blob = jpx.encode_jpx(img, levels=2, layers=layers)
        assert (jpx.decode_jpx(blob)["pixels"] == img).all(), layers
    # the desync trap: blocks whose total passes < layer count get
    # their first inclusion in a LATER layer via the tag tree
    flat = np.full((20, 20), 128, np.uint8)
    flat[3, 4] = 129
    for layers in (3, 8):
        blob = jpx.encode_jpx(flat, levels=2, layers=layers)
        assert (jpx.decode_jpx(blob)["pixels"] == flat).all(), layers
    # lossy multi-layer
    rgb = rng.integers(0, 256, (24, 33, 3)).astype(np.uint8)
    blob = jpx.encode_jpx(
        rgb, levels=3, layers=4, irreversible=True, planes=12
    )
    d = jpx.decode_jpx(blob)
    assert np.abs(
        d["pixels"].astype(int) - rgb.astype(int)
    ).max() <= 2
    # pass-budget truncation at the Tier-1 level: decoding a prefix
    # with fewer passes yields a coarser but valid block
    c = rng.integers(-200, 200, (16, 16))
    n_planes = int(np.abs(c).max()).bit_length()
    data, marks, _seg_ends = jpx._encode_codeblock(
        c, "HH", n_planes, want_marks=True
    )
    total = 3 * n_planes - 2
    errs = []
    for k in (1, total // 2, total):
        part = jpx._decode_codeblock(
            data[: marks[k - 1] + 8], 16, 16, "HH", n_planes,
            n_passes=k,
        )
        errs.append(int(np.abs(part - c).max()))
    assert errs[0] >= errs[1] >= errs[2] == 0


def test_all_progression_orders():
    # with maximal precincts the position dimension is a singleton,
    # so all five T.800 progressions are packet-iteration
    # permutations of the same persistent-state walk (r13 late)
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    rgb = rng.integers(0, 256, (24, 33, 3)).astype(np.uint8)
    for prog in ("LRCP", "RLCP", "RPCL", "PCRL", "CPRL"):
        blob = jpx.encode_jpx(img, levels=2, layers=3, prog=prog)
        assert (jpx.decode_jpx(blob)["pixels"] == img).all(), prog
        blob = jpx.encode_jpx(
            rgb, levels=2, layers=2, prog=prog,
            irreversible=True, planes=13,
        )
        d = jpx.decode_jpx(blob)
        assert np.abs(
            d["pixels"].astype(int) - rgb.astype(int)
        ).max() <= 1, prog
    with pytest.raises(ValueError, match="progression"):
        jpx.encode_jpx(img, prog="XXXX")
    # a hostile progression id past the spec's five is loud
    good = jpx.encode_jpx(img, levels=1)
    bad = bytearray(good)
    bad[good.index(b"\xff\x52") + 5] = 9
    with pytest.raises(ValueError, match="progression order"):
        jpx.decode_jpx(bytes(bad))


def test_tiled_roundtrip():
    # tiles (r13 late): per-tile packet walks + stitching; even tile
    # grids keep the DWT sample parity (odd tile dims stay named)
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    for ts in ((32, 32), (64, 64)):
        blob = jpx.encode_jpx(img, levels=2, tile_size=ts)
        assert (jpx.decode_jpx(blob)["pixels"] == img).all(), ts
    # (64, 48) tiling at the default 32x32 codeblock: tile row 1's
    # level-1 bands start at canvas y=24 and span past the block
    # boundary at 32 — a conforming reader splits them; tile-local
    # coding would disagree, so BOTH sides are loud (r15, the r14
    # latent hole)
    with pytest.raises(ValueError, match="misaligns the codeblock"):
        jpx.encode_jpx(img, levels=2, tile_size=(64, 48))
    # odd image dims -> odd-sized LAST tiles (origin parity is what
    # matters); tiled + layered + RGB + JP2 compose
    odd = rng.integers(0, 256, (37, 53)).astype(np.uint8)
    blob = jpx.encode_jpx(odd, levels=3, tile_size=(16, 16))
    assert (jpx.decode_jpx(blob)["pixels"] == odd).all()
    rgb = rng.integers(0, 256, (50, 66, 3)).astype(np.uint8)
    blob = jpx.encode_jpx(
        rgb, levels=2, tile_size=(32, 32), layers=2, jp2=True
    )
    assert (jpx.decode_jpx(blob)["pixels"] == rgb).all()
    # named/hostile
    with pytest.raises(ValueError, match="multiples of 2"):
        jpx.encode_jpx(img, tile_size=(15, 16))
    with pytest.raises(ValueError, match="multiples of 2"):
        # even but not a multiple of 2^levels: the canvas-anchored
        # subband geometry differs from tile-local (r14, ADVICE)
        jpx.encode_jpx(img, levels=2, tile_size=(6, 6))
    with pytest.raises(NotImplementedError, match="per-tile QCD"):
        jpx.encode_jpx(img, tile_size=(16, 16), irreversible=True)
    blob = jpx.encode_jpx(img, levels=1, tile_size=(32, 32))
    import struct as _s

    bad = bytearray(blob)
    _s.pack_into(">H", bad, blob.index(b"\xff\x90") + 4, 7)
    with pytest.raises(ValueError, match="tile"):
        jpx.decode_jpx(bytes(bad))
    # decoder-side geometry guard: patch XTsiz/YTsiz of a tiled
    # stream to 6 (even, not a multiple of 2^levels=4) — named
    blob = jpx.encode_jpx(img, levels=2, tile_size=(32, 32))
    bad = bytearray(blob)
    siz_at = blob.index(b"\xff\x51")
    _s.pack_into(">II", bad, siz_at + 22, 6, 6)
    with pytest.raises(NotImplementedError, match="2.levels"):
        jpx.decode_jpx(bytes(bad))


def test_multiple_tile_parts_concatenate_in_tpsot_order():
    # r14 (VERDICT item 1b): real encoders split big tiles into
    # several SOT..SOD tile-parts; packets run contiguously over the
    # concatenation (T.800 A.4.2)
    rng = np.random.default_rng(14)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    one = jpx.decode_jpx(jpx.encode_jpx(img, levels=2))["pixels"]
    for k in (2, 3, 5):
        blob = jpx.encode_jpx(img, levels=2, tile_parts=k)
        assert blob.count(b"\xff\x90") == k
        d = jpx.decode_jpx(blob)
        assert (d["pixels"] == img).all(), k
        assert (d["pixels"] == one).all(), k
    # layered + SOP/EPH framing still parses across the part cuts
    blob = jpx.encode_jpx(
        img, levels=2, layers=3, sop=True, eph=True, tile_parts=3
    )
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    # duplicate TPsot is loud
    blob = jpx.encode_jpx(img, levels=1, tile_parts=2)
    import struct as _s

    second = blob.index(b"\xff\x90", blob.index(b"\xff\x90") + 2)
    bad = bytearray(blob)
    bad[second + 10] = 0  # TPsot of part 2 -> 0 (duplicate)
    with pytest.raises(ValueError, match="duplicate tile-part"):
        jpx.decode_jpx(bytes(bad))
    # a TPsot gap is loud too
    bad = bytearray(blob)
    bad[second + 10] = 2  # TPsot of part 2 -> 2 (missing 1)
    with pytest.raises(ValueError, match="TPsot sequence"):
        jpx.decode_jpx(bytes(bad))


def test_coder_options_roundtrip_matrix():
    # r14 (VERDICT item 1c): the coder options real encoders emit —
    # 0x01 arithmetic BYPASS (raw SP/MR from the 5th plane, D.6),
    # 0x02 context RESET per pass, 0x04 per-pass termination, 0x20
    # segmentation symbols — alone and composed, across layers,
    # progressions, tiles, tile-parts, and the 9/7 path
    rng = np.random.default_rng(41)
    img = rng.integers(0, 256, (48, 64)).astype(np.uint8)
    for style in (0x01, 0x02, 0x04, 0x20, 0x05, 0x27):
        blob = jpx.encode_jpx(img, levels=2, cb_style=style)
        assert (jpx.decode_jpx(blob)["pixels"] == img).all(), style
    # bypass genuinely engages (random 8-bit content has >4 planes:
    # multiple codeword segments appear in the plan)
    plan = jpx._pass_plan(9, 0x01)
    assert plan[-1][3] + 1 == 1 + 2 * (9 - 4)
    assert any(raw for _k, _p, raw, _s in plan)
    # layered splits snap to segment boundaries
    for style in (0x01, 0x04, 0x27):
        for layers in (2, 3, 5):
            blob = jpx.encode_jpx(
                img, levels=2, cb_style=style, layers=layers
            )
            d = jpx.decode_jpx(blob)
            assert (d["pixels"] == img).all(), (style, layers)
    rgb = rng.integers(0, 256, (33, 47, 3)).astype(np.uint8)
    for prog in ("RLCP", "CPRL"):
        blob = jpx.encode_jpx(
            rgb, levels=2, cb_style=0x05, layers=2, prog=prog
        )
        assert (jpx.decode_jpx(blob)["pixels"] == rgb).all(), prog
    blob = jpx.encode_jpx(img, levels=2, cb_style=0x27,
                          tile_size=(32, 32))
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    blob = jpx.encode_jpx(
        img, levels=2, cb_style=0x05, layers=3, tile_parts=3,
        sop=True, eph=True,
    )
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    blob = jpx.encode_jpx(img, levels=2, cb_style=0x01,
                          irreversible=True)
    err = np.abs(
        jpx.decode_jpx(blob)["pixels"].astype(int) - img.astype(int)
    ).max()
    assert err <= 2


def test_coder_options_named_gaps_and_segmark_detection():
    img = np.full((16, 16), 3, np.uint8)
    # the writable subset excludes predictable termination (0x10);
    # undefined style bits are loud on decode (r14 — causal 0x08
    # and 0x10-as-plain-termination now decode, tested separately)
    with pytest.raises(ValueError, match="coder options"):
        jpx.encode_jpx(img, cb_style=0x10)
    blob = jpx.encode_jpx(img, levels=1)
    at = blob.index(b"\xff\x52")
    bad = bytearray(blob)
    bad[at + 12] = 0x40  # undefined SPcod style bit
    with pytest.raises(ValueError, match="undefined coder"):
        jpx.decode_jpx(bytes(bad))
    # segmentation symbols detect a corrupted Tier-1 stream loudly
    rng = np.random.default_rng(42)
    noisy = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    blob = jpx.encode_jpx(noisy, levels=1, cb_style=0x20)
    bad = bytearray(blob)
    bad[-40] ^= 0x55
    with pytest.raises(ValueError):
        jpx.decode_jpx(bytes(bad))


def test_informational_pointer_markers_are_skipped():
    # r14 (VERDICT finding 1): TLM/PLM/PLT/COM are informational
    # pointer segments a decoder may ignore (T.800 A.7) — Kakadu
    # emits TLM by default, so rejecting them quarantined decodable
    # real-world streams
    img = np.arange(24 * 16, dtype=np.uint8).reshape(24, 16) % 251
    blob = jpx.encode_jpx(img, levels=2)
    at = blob.index(b"\xff\x5c")  # before QCD
    import struct as _s

    tlm = b"\xff\x55" + _s.pack(">HBB", 4, 0, 0x60)
    plt = b"\xff\x58" + _s.pack(">HB", 5, 0) + b"\x85\x04"
    plm = b"\xff\x57" + _s.pack(">HB", 4, 0) + b"\x00"
    com = b"\xff\x64" + _s.pack(">HH", 9, 1) + b"hello"
    for seg in (tlm, plt, plm, com):
        patched = blob[:at] + seg + blob[at:]
        d = jpx.decode_jpx(patched)
        assert (d["pixels"] == img).all(), seg[:2].hex()
    # all four at once
    patched = blob[:at] + tlm + plt + plm + com + blob[at:]
    assert (jpx.decode_jpx(patched)["pixels"] == img).all()


def test_qcd_style1_derived_quantizer():
    # r14: scalar DERIVED quantization (E-5) — one (eps0, mant)
    # pair, band exponents eps0 - (r-1), mantissa shared
    rng = np.random.default_rng(33)
    img = rng.integers(0, 256, (40, 52)).astype(np.uint8)
    for levels in (1, 2, 4):
        blob = jpx.encode_jpx(
            img, levels=levels, irreversible=True, qcd_style=1
        )
        # the QCD really is the 1-pair style-1 form
        at = blob.index(b"\xff\x5c")
        assert blob[at + 2 : at + 4] == b"\x00\x05"
        assert blob[at + 4] & 0x1F == 1
        err = np.abs(
            jpx.decode_jpx(blob)["pixels"].astype(int)
            - img.astype(int)
        ).max()
        assert err <= 2, levels
    # derived + bypass + layers + ICT composes; exact at planes=14
    rgb = rng.integers(0, 256, (30, 34, 3)).astype(np.uint8)
    blob = jpx.encode_jpx(
        rgb, levels=2, irreversible=True, qcd_style=1,
        cb_style=0x01, layers=2,
    )
    err = np.abs(
        jpx.decode_jpx(blob)["pixels"].astype(int) - rgb.astype(int)
    ).max()
    assert err <= 3
    blob = jpx.encode_jpx(
        img, levels=2, irreversible=True, qcd_style=1, planes=14
    )
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    # style 1 with the 5/3 wavelet is malformed (loud)
    blob = jpx.encode_jpx(img, levels=1)
    bad = bytearray(blob)
    at = blob.index(b"\xff\x5c")
    bad[at + 4] = (bad[at + 4] & 0xE0) | 1
    with pytest.raises(ValueError, match="derived"):
        jpx.decode_jpx(bytes(bad))


def test_high_bit_depth_components():
    # r14: 10/12/16-bit unsigned components decode, downconverting
    # >> (depth - 8) (the TIFF rule, stated)
    rng = np.random.default_rng(61)
    for depth in (10, 12, 16):
        px = rng.integers(0, 1 << depth, (24, 36)).astype(np.uint16)
        blob = jpx.encode_jpx(px, levels=2, depth=depth)
        d = jpx.decode_jpx(blob)
        assert (
            d["pixels"] == (px >> (depth - 8)).astype(np.uint8)
        ).all(), depth
    # 12-bit 9/7 derived + bypass; 16-bit RGB through the RCT
    px = rng.integers(0, 4096, (24, 36)).astype(np.uint16)
    blob = jpx.encode_jpx(
        px, levels=2, depth=12, irreversible=True, qcd_style=1,
        cb_style=0x01, planes=12,
    )
    err = np.abs(
        jpx.decode_jpx(blob)["pixels"].astype(int)
        - (px >> 4).astype(int)
    ).max()
    assert err <= 2
    rgb = rng.integers(0, 65536, (12, 14, 3)).astype(np.uint16)
    blob = jpx.encode_jpx(rgb, levels=1, depth=16)
    assert (
        jpx.decode_jpx(blob)["pixels"] == (rgb >> 8).astype(np.uint8)
    ).all()
    # signed / sub-8-bit stay named
    blob = jpx.encode_jpx(
        np.zeros((8, 8), np.uint8), levels=1
    )
    at = blob.index(b"\xff\x51")
    for ssiz, msg in ((0x87, "signed"), (3, "4-bit")):
        bad = bytearray(blob)
        bad[at + 2 + 38] = ssiz
        with pytest.raises(NotImplementedError, match=msg):
            jpx.decode_jpx(bytes(bad))


def test_tile_part_cod_qcd_overrides():
    # r14: per-tile COD/QCD overrides in the first tile-part header
    # (the remaining tile cell real encoders hit) — tiles may carry
    # their own layers/options/levels/progression
    rng = np.random.default_rng(71)
    img = rng.integers(0, 256, (64, 96)).astype(np.uint8)
    blob = jpx.encode_jpx(
        img, levels=2, tile_size=(32, 32),
        tile_kw={
            1: {"layers": 3, "cb_style": 0x01},
            3: {"levels": 1},
            4: {"prog": "RLCP"},
        },
    )
    d = jpx.decode_jpx(blob)
    assert (d["pixels"] == img).all()
    # an override in a NON-first tile-part is named: retag part 0
    plain = jpx.encode_jpx(
        img, levels=2, tile_size=(32, 32), tile_kw={1: {"layers": 2}}
    )
    assert (jpx.decode_jpx(plain)["pixels"] == img).all()
    second = plain.index(b"\xff\x90", plain.index(b"\xff\x90") + 2)
    bad = bytearray(plain)
    bad[second + 10] = 1  # TPsot of the COD-carrying part -> 1
    with pytest.raises(
        (NotImplementedError, ValueError)
    ):
        jpx.decode_jpx(bytes(bad))
    # semantics-changing tile-part markers stay named
    sod = plain.index(b"\xff\x93")
    import struct as _s

    poc = b"\xff\x5f" + _s.pack(">H", 9) + bytes(7)
    bad = bytearray(plain[:sod] + poc + plain[sod:])
    # fix Psot of the first tile-part (+11 bytes)
    sot = plain.index(b"\xff\x90")
    (psot,) = _s.unpack_from(">I", plain, sot + 6)
    _s.pack_into(">I", bad, sot + 6, psot + len(poc))
    with pytest.raises(NotImplementedError, match="FF5F"):
        jpx.decode_jpx(bytes(bad))


def test_vertically_causal_and_predictable_termination():
    # r14: causal contexts mask the stripe floor on both sides;
    # 0x10 decodes as plain termination (stated non-verification)
    rng = np.random.default_rng(81)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for style in (0x08, 0x09, 0x0D, 0x2F):
        blob = jpx.encode_jpx(img, levels=2, cb_style=style,
                              layers=2)
        assert (jpx.decode_jpx(blob)["pixels"] == img).all(), style
    # causal genuinely changes the bitstream (the mask is live)
    a = jpx.encode_jpx(img, levels=2)
    b = jpx.encode_jpx(img, levels=2, cb_style=0x08)
    assert a != b
    blob = jpx.encode_jpx(img, levels=2, cb_style=0x04)
    bad = bytearray(blob)
    at = blob.index(b"\xff\x52")
    bad[at + 12] = 0x14  # + predictable termination
    assert (jpx.decode_jpx(bytes(bad))["pixels"] == img).all()
    # the writable subset excludes 0x10; undefined bits are loud
    with pytest.raises(ValueError, match="coder options"):
        jpx.encode_jpx(img, cb_style=0x10)
    bad = bytearray(blob)
    bad[at + 12] = 0x40
    with pytest.raises(ValueError, match="undefined coder"):
        jpx.decode_jpx(bytes(bad))


def test_subsampled_chroma_components():
    # r14 late: 4:2:0 / 4:2:2 / 4:4:0 chroma subsampling — the
    # camera-pipeline JP2 form: per-component sample grids (B.2),
    # box-mean downsample on encode, nearest upsample before the
    # ICT on decode (stated approximation)
    ys, xs = np.mgrid[0:48, 0:64]
    rgb = np.stack(
        [(xs * 2) % 256, (ys * 3) % 256, ((xs + ys) * 2) % 256],
        axis=2,
    ).astype(np.uint8)
    for sub in ((2, 2), (2, 1), (1, 2)):
        blob = jpx.encode_jpx(
            rgb, levels=2, irreversible=True, subsampling=sub,
            planes=12,
        )
        # the SIZ really declares per-component grids
        at = blob.index(b"\xff\x51")
        assert blob[at + 2 + 42 : at + 2 + 44] == bytes(sub)
        d = jpx.decode_jpx(blob)
        err = np.abs(
            d["pixels"].astype(int) - rgb.astype(int)
        ).max()
        assert d["pixels"].shape == rgb.shape
        assert err <= 3, (sub, err)
    # constant chroma: upsampling is exact, only quantization left
    flat = np.zeros((20, 26, 3), np.uint8)
    flat[:] = (120, 64, 200)
    blob = jpx.encode_jpx(
        flat, levels=1, irreversible=True, subsampling=(2, 2),
        planes=13,
    )
    assert np.abs(
        jpx.decode_jpx(blob)["pixels"].astype(int)
        - flat.astype(int)
    ).max() <= 1
    # odd canvas dims: ceil grids on both sides
    odd = rgb[:37, :53]
    blob = jpx.encode_jpx(
        odd, levels=2, irreversible=True, subsampling=(2, 2),
        planes=12,
    )
    d = jpx.decode_jpx(blob)
    assert d["pixels"].shape == odd.shape
    assert np.abs(
        d["pixels"].astype(int) - odd.astype(int)
    ).max() <= 3
    # named gates: encoder preconditions; subsampled luma; RCT over
    # subsampled grids
    with pytest.raises(ValueError, match="RGB . irreversible"):
        jpx.encode_jpx(rgb, subsampling=(2, 2))
    blob = jpx.encode_jpx(
        rgb, levels=1, irreversible=True, subsampling=(2, 2)
    )
    at = blob.index(b"\xff\x51")
    bad = bytearray(blob)
    bad[at + 2 + 39] = 2
    bad[at + 2 + 40] = 2
    with pytest.raises(NotImplementedError, match="luma"):
        jpx.decode_jpx(bytes(bad))
    bad = bytearray(blob)
    cod_at = blob.index(b"\xff\x52")
    bad[cod_at + 8] = 1  # MCT flag with a 5/3 wavelet claim
    bad[cod_at + 13] = 1
    with pytest.raises((NotImplementedError, ValueError)):
        jpx.decode_jpx(bytes(bad))


def test_semantic_markers_poc_ppm_are_named_not_skipped():
    # r14 review finding: POC (progression change) and PPM (packed
    # packet headers) are SEMANTIC — silently length-skipping them
    # would walk packets in the wrong order
    img = np.arange(16 * 16, dtype=np.uint8).reshape(16, 16)
    blob = jpx.encode_jpx(img, levels=1)
    at = blob.index(b"\xff\x5c")
    import struct as _s

    poc = b"\xff\x5f" + _s.pack(">H", 9) + bytes(7)
    ppm = b"\xff\x60" + _s.pack(">HB", 3, 0)
    for seg, name in ((poc, "POC"), (ppm, "PPM")):
        patched = blob[:at] + seg + blob[at:]
        with pytest.raises(NotImplementedError, match=name):
            jpx.decode_jpx(patched)


def test_reset_only_style_still_spreads_layers():
    # r14 review finding: reset/segmark-only styles create no extra
    # codeword segments, so layer splits must keep using the pass
    # watermarks instead of snapping everything into layer 0
    rng = np.random.default_rng(51)
    img = rng.integers(0, 256, (32, 32)).astype(np.uint8)
    blob = jpx.encode_jpx(
        img, levels=1, cb_style=0x02, layers=3, sop=True, eph=True
    )
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    # with SOP framing the packet boundaries are visible: more than
    # one of the 6 packets (3 layers x 2 resolutions) must carry a
    # non-trivial body
    sops = []
    at = 0
    while True:
        at = blob.find(b"\xff\x91", at + 1)
        if at < 0:
            break
        sops.append(at)
    sizes = [
        b - a for a, b in zip(sops, sops[1:] + [blob.rindex(b"\xff\xd9")])
    ]
    assert len(sizes) == 6
    assert sum(1 for s in sizes if s > 12) >= 3, sizes


def test_short_header_segments_raise_named_valueerrors():
    # r14 (ADVICE): truncated SIZ/COD/QCD segments are the documented
    # ValueError, never a raw struct.error/IndexError
    img = np.full((16, 16), 7, np.uint8)
    blob = jpx.encode_jpx(img, levels=1)
    import struct as _s

    for tag in (b"\xff\x51", b"\xff\x52", b"\xff\x5c"):
        at = blob.index(tag)
        bad = bytearray(blob)
        _s.pack_into(">H", bad, at + 2, 2)  # empty segment body
        with pytest.raises(ValueError, match="jpx"):
            jpx.decode_jpx(bytes(bad))


def test_grid_offsets_roundtrip():
    # r15 (VERDICT item 3): non-zero XOsiz/YOsiz/XTOsiz/YTOsiz per
    # T.800 B.1 — cropped/extracted real-world codestreams. The
    # accepted envelope is the provable tile-local == canvas-
    # anchored set: per-component origins multiples of 2^levels
    # with codeblock-partition alignment; everything else is loud
    rng = np.random.default_rng(15)
    img = rng.integers(0, 256, (40, 56)).astype(np.uint8)
    for offs in ((4, 8, 0, 0), (8, 4, 8, 4), (64, 64, 32, 32)):
        blob = jpx.encode_jpx(img, levels=2, offsets=offs)
        out = jpx.decode_jpx(blob)
        assert out["width"] == 56 and out["height"] == 40
        assert (out["pixels"] == img).all(), offs
    # JP2 wrap: ihdr carries the image-REGION dims
    blob = jpx.encode_jpx(img, levels=2, offsets=(4, 8, 0, 0), jp2=True)
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    # RGB + MCT
    rgb = rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
    blob = jpx.encode_jpx(rgb, levels=2, offsets=(16, 8, 4, 4))
    assert (jpx.decode_jpx(blob)["pixels"] == rgb).all()
    # offsets + chroma subsampling compose (the VERDICT compose
    # fixture): pixel-identical to the non-offset encode
    blob = jpx.encode_jpx(
        rgb, levels=1, irreversible=True, subsampling=(2, 2),
        offsets=(8, 8, 4, 4),
    )
    ref = jpx.encode_jpx(
        rgb, levels=1, irreversible=True, subsampling=(2, 2)
    )
    assert (
        jpx.decode_jpx(blob)["pixels"]
        == jpx.decode_jpx(ref)["pixels"]
    ).all()
    # layered + coder options + tile-parts compose with offsets
    blob = jpx.encode_jpx(
        img, levels=2, offsets=(8, 4, 8, 4), layers=3,
        cb_style=0x01, tile_parts=2,
    )
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()


def test_grid_offsets_guards():
    import struct as _s

    img = np.zeros((40, 56), np.uint8)
    # encode guards: misaligned origin / codeblock straddle /
    # malformed TOsiz
    with pytest.raises(ValueError, match="multiples of"):
        jpx.encode_jpx(img, levels=2, offsets=(3, 0, 0, 0))
    with pytest.raises(ValueError, match="misalign the codeblock"):
        jpx.encode_jpx(img, levels=2, offsets=(64, 32, 16, 8))
    with pytest.raises(ValueError, match="TOsiz"):
        jpx.encode_jpx(img, levels=2, offsets=(4, 0, 8, 0))
    # decode guards on hand-patched SIZ
    blob = jpx.encode_jpx(img, levels=2)
    at = blob.index(b"\xff\x51")
    bad = bytearray(blob)
    _s.pack_into(">I", bad, at + 6, 56 + 3)   # Xsiz += 3
    _s.pack_into(">I", bad, at + 14, 3)       # XOsiz = 3
    with pytest.raises(NotImplementedError, match="not a multiple"):
        jpx.decode_jpx(bytes(bad))
    bad = bytearray(blob)
    _s.pack_into(">I", bad, at + 30, 5)       # XTOsiz > XOsiz
    with pytest.raises(ValueError, match="XTOsiz"):
        jpx.decode_jpx(bytes(bad))
    bad = bytearray(blob)
    _s.pack_into(">I", bad, at + 14, 56)      # XOsiz >= Xsiz
    with pytest.raises(ValueError, match="empty image region"):
        jpx.decode_jpx(bytes(bad))


def test_precinct_roundtrips():
    # r15 (VERDICT item 5): explicit precinct subdivision (Scod bit
    # 0 + per-resolution PPx/PPy) — multiple packets per (layer,
    # resolution, component), per-precinct tag trees, codeblocks
    # clamped to the precinct (B.7)
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (70, 90)).astype(np.uint8)
    for prec in ((6, 6), (5, 5), [(4, 4), (5, 5), (6, 6)]):
        for prog in ("LRCP", "RLCP", "RPCL"):
            blob = jpx.encode_jpx(
                img, levels=2, precincts=prec, prog=prog
            )
            assert (jpx.decode_jpx(blob)["pixels"] == img).all(), (
                prec, prog,
            )
    # codeblock larger than the precinct clamps (B.7)
    blob = jpx.encode_jpx(img, levels=1, precincts=(4, 4),
                          cb_exp=(6, 6))
    assert (jpx.decode_jpx(blob)["pixels"] == img).all()
    # layers + coder options + SOP/EPH + tile-parts + RGB + JP2
    rgb = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    blob = jpx.encode_jpx(
        rgb, levels=2, precincts=(5, 5), layers=3, cb_style=0x01,
        sop=True, eph=True, tile_parts=2, jp2=True,
    )
    assert (jpx.decode_jpx(blob)["pixels"] == rgb).all()
    # irreversible 9/7 composes
    blob = jpx.encode_jpx(
        img, levels=2, precincts=(5, 5), irreversible=True
    )
    out = jpx.decode_jpx(blob)["pixels"]
    ref = jpx.decode_jpx(
        jpx.encode_jpx(img, levels=2, irreversible=True)
    )["pixels"]
    # precincts change packet FRAMING only, never the coefficients:
    # single-layer outputs are bit-identical to the unprecincted form
    assert (out == ref).all()


def test_precinct_guards():
    import struct as _s

    img = np.zeros((40, 56), np.uint8)
    # envelope: tiling / offsets / subsampling stay named
    with pytest.raises(ValueError, match="single-tile"):
        jpx.encode_jpx(img, precincts=(5, 5), tile_size=(32, 32))
    with pytest.raises(ValueError, match="single-tile"):
        jpx.encode_jpx(img, precincts=(5, 5),
                       offsets=(4, 4, 0, 0), levels=2)
    # PCRL/CPRL with real subdivision is the named gap
    with pytest.raises(NotImplementedError, match="PCRL"):
        jpx.encode_jpx(img, levels=2, precincts=(4, 4),
                       prog="PCRL")
    # malformed: zero precinct exponent above resolution 0
    blob = jpx.encode_jpx(img, levels=2, precincts=(5, 5))
    at = blob.index(b"\xff\x52")
    bad = bytearray(blob)
    bad[at + 14 + 1] = 0  # resolution-1 byte -> PPx=PPy=0
    with pytest.raises(ValueError, match="precinct exponent"):
        jpx.decode_jpx(bytes(bad))
    # COD shorter than its precinct list
    lcod = _s.unpack_from(">H", blob, at + 2)[0]
    bad = blob[: at + 2] + _s.pack(">H", lcod - 2) + blob[
        at + 4 : at + 2 + lcod - 2
    ] + blob[at + 2 + lcod :]
    with pytest.raises(ValueError, match="precinct|COD"):
        jpx.decode_jpx(bad)
    # bad exponent at encode
    with pytest.raises(ValueError, match="precinct exponents"):
        jpx.encode_jpx(img, levels=1, precincts=[(5, 5), (0, 5)])
    with pytest.raises(ValueError, match="per.*resolution"):
        jpx.encode_jpx(img, levels=2, precincts=[(5, 5)])


def test_implicit_precinct_boundary_guard():
    import struct as _s

    # r15 review: the spec DEFAULT PPx=PPy=15 partition is also
    # canvas-anchored — a tile/offset region straddling a 32768
    # boundary carries more packets than the zero-anchored walk
    # reads, so it must be loud, not silently desynced
    img = np.zeros((16, 16), np.uint8)
    blob = jpx.encode_jpx(img, levels=0)
    at = blob.index(b"\xff\x51")
    bad = bytearray(blob)
    _s.pack_into(">I", bad, at + 6, 16 + 32760)   # Xsiz
    _s.pack_into(">I", bad, at + 14, 32760)       # XOsiz (aligned)
    _s.pack_into(">I", bad, at + 22, 16 + 32760)  # XTsiz covers
    with pytest.raises(NotImplementedError, match="2\\^15"):
        jpx.decode_jpx(bytes(bad))
