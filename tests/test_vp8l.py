"""WebP VP8L lossless codec (operators/vp8l.py, VERDICT r6 item 6):
encoder/decoder round-trips across every entropy-symbol class,
hand-assembled transform streams (the encoder machinery doubles as
the sub-image writer), hostile-input contract, and registry
dispatch. Cross-implementation caveat: no reference codec exists in
this container — see the module docstring."""

from __future__ import annotations

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import vp8l
from timeseries_data_provider_spark.operators import multimodal as mm

RNG = np.random.RandomState(20260814)


def _roundtrip(img, **kw):
    dec = vp8l.decode_webp(vp8l.encode_vp8l(img, **kw))
    assert (dec["height"], dec["width"]) == img.shape[:2]
    return dec["pixels"]


def test_rgb_roundtrip_exact_all_symbol_classes():
    img = RNG.randint(0, 256, (16, 16, 3), np.uint8)
    for kw in (
        {},
        {"use_cache": True},
        {"use_lz77": True},
        {"use_cache": True, "use_lz77": True},
        {"use_cache": True, "cache_bits": 8},
    ):
        assert np.array_equal(_roundtrip(img, **kw), img), kw


def test_lossless_means_lossless_on_gradients_and_solids():
    grad = np.stack(
        [
            np.tile(np.arange(32, dtype=np.uint8), (8, 1)),
            np.full((8, 32), 7, np.uint8),
            np.tile(np.arange(32, dtype=np.uint8)[::-1], (8, 1)),
        ],
        axis=-1,
    )
    assert np.array_equal(_roundtrip(grad), grad)
    solid = np.full((20, 30, 3), 42, np.uint8)
    # solid + lz77: the whole image collapses to literals + one run
    enc = vp8l.encode_vp8l(solid, use_lz77=True)
    assert len(enc) < 200
    assert np.array_equal(vp8l.decode_webp(enc)["pixels"], solid)


def test_alpha_channel_preserved_or_dropped():
    rgba = RNG.randint(0, 256, (6, 5, 4), np.uint8)
    rgba[..., 3] = 128
    out = _roundtrip(rgba)
    assert out.shape == (6, 5, 4)
    assert np.array_equal(out, rgba)
    opaque = rgba.copy()
    opaque[..., 3] = 255
    out = _roundtrip(opaque)
    # fully-opaque streams decode to plain RGB
    assert out.shape == (6, 5, 3)
    assert np.array_equal(out, opaque[..., :3])


def test_single_pixel_and_extreme_dims():
    assert np.array_equal(
        _roundtrip(np.full((1, 1, 3), 9, np.uint8)),
        np.full((1, 1, 3), 9, np.uint8),
    )
    wide = RNG.randint(0, 256, (1, 64, 3), np.uint8)
    tall = RNG.randint(0, 256, (64, 1, 3), np.uint8)
    assert np.array_equal(_roundtrip(wide), wide)
    assert np.array_equal(_roundtrip(tall), tall)


def _stream_header(bw, w, h):
    bw.bits(0x2F, 8)
    bw.bits(w - 1, 14)
    bw.bits(h - 1, 14)
    bw.bit(0)
    bw.bits(0, 3)


def _argb_list(img):
    h, w = img.shape[:2]
    return [
        (255 << 24)
        | int(img[y, x, 0]) << 16
        | int(img[y, x, 1]) << 8
        | int(img[y, x, 2])
        for y in range(h)
        for x in range(w)
    ]


def test_subtract_green_transform_stream():
    img = RNG.randint(0, 256, (6, 9, 3), np.uint8)
    h, w = img.shape[:2]
    bw = vp8l._BitWriter()
    _stream_header(bw, w, h)
    bw.bit(1)
    bw.bits(2, 2)  # SUBTRACT_GREEN
    bw.bit(0)
    res = []
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            res.append(
                (255 << 24)
                | (((r - g) & 0xFF) << 16)
                | (g << 8)
                | ((b - g) & 0xFF)
            )
    vp8l.write_entropy_image(bw, res, level0=True)
    dec = vp8l.decode_webp(vp8l.wrap_riff(bw.flush()))
    assert np.array_equal(dec["pixels"], img)


@pytest.mark.parametrize("mode", [0, 1, 2, 7, 11, 12, 13])
def test_predictor_transform_modes(mode):
    img = RNG.randint(0, 256, (5, 7, 3), np.uint8)
    h, w = img.shape[:2]
    size_bits = 2
    bw = vp8l._BitWriter()
    _stream_header(bw, w, h)
    bw.bit(1)
    bw.bits(0, 2)  # PREDICTOR
    bw.bits(size_bits - 2, 3)
    mw, mh = -(-w // 4), -(-h // 4)
    vp8l.write_entropy_image(
        bw, [(255 << 24) | (mode << 8)] * (mw * mh), level0=False
    )
    bw.bit(0)  # end of transforms
    # residuals vs the decoder's own predictor rules (first row/col
    # forced to L/T/black regardless of mode)
    A = np.zeros((h, w, 4), np.int64)
    A[..., 0] = 255
    A[..., 1:] = img
    res = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], np.int64)
            elif y == 0:
                pred = A[0, x - 1]
            elif x == 0:
                pred = A[y - 1, 0]
            else:
                L, T, TL = A[y, x - 1], A[y - 1, x], A[y - 1, x - 1]
                TR = A[y - 1, x + 1] if x + 1 < w else A[y, 0]
                pred = vp8l._predict(
                    mode,
                    L.astype(np.int32),
                    T.astype(np.int32),
                    TL.astype(np.int32),
                    TR.astype(np.int32),
                )
            d = (A[y, x] - pred) & 0xFF
            res.append(int((d[0] << 24) | (d[1] << 16) | (d[2] << 8) | d[3]))
    vp8l.write_entropy_image(bw, res, level0=True)
    dec = vp8l.decode_webp(vp8l.wrap_riff(bw.flush()))
    assert np.array_equal(dec["pixels"], img), mode


def test_color_transform_stream():
    img = RNG.randint(0, 256, (4, 6, 3), np.uint8)
    h, w = img.shape[:2]
    g2r, g2b, r2b = 23, 200, 133  # arbitrary int8 factors
    bw = vp8l._BitWriter()
    _stream_header(bw, w, h)
    bw.bit(1)
    bw.bits(1, 2)  # COLOR transform
    bw.bits(0, 3)  # size_bits = 2 -> one 4x4 block covers ceil dims
    mw, mh = -(-w // 4), -(-h // 4)
    elem = (255 << 24) | (r2b << 16) | (g2b << 8) | g2r
    vp8l.write_entropy_image(bw, [elem] * (mw * mh), level0=False)
    bw.bit(0)
    # forward transform (inverse of the decoder's inverse)
    res = []
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            fr = (r - vp8l._ct_delta(g2r, g)) & 0xFF
            fb = (
                b
                - vp8l._ct_delta(g2b, g)
                - vp8l._ct_delta(r2b, (fr + vp8l._ct_delta(g2r, g)) & 0xFF)
            ) & 0xFF
            res.append((255 << 24) | (fr << 16) | (g << 8) | fb)
    vp8l.write_entropy_image(bw, res, level0=True)
    dec = vp8l.decode_webp(vp8l.wrap_riff(bw.flush()))
    assert np.array_equal(dec["pixels"], img)


@pytest.mark.parametrize("n_colors,width_bits", [(2, 3), (4, 2), (12, 1), (40, 0)])
def test_color_indexing_with_pixel_bundling(n_colors, width_bits):
    palette_rgb = RNG.randint(0, 256, (n_colors, 3), np.uint8)
    w, h = 11, 5
    idx = RNG.randint(0, n_colors, (h, w))
    img = palette_rgb[idx]
    bw = vp8l._BitWriter()
    _stream_header(bw, w, h)
    bw.bit(1)
    bw.bits(3, 2)  # COLOR_INDEXING
    bw.bits(n_colors - 1, 8)
    # palette sub-image: per-channel deltas to the previous entry
    pal_argb = [
        (255 << 24) | int(c[0]) << 16 | int(c[1]) << 8 | int(c[2])
        for c in palette_rgb
    ]
    deltas = []
    prev = np.zeros(4, np.int64)
    for p in pal_argb:
        cur = vp8l._split(p).astype(np.int64)
        deltas.append(vp8l._join((cur - prev) & 0xFF))
        prev = cur
    vp8l.write_entropy_image(bw, deltas, level0=False)
    bw.bit(0)
    # packed index image in the green channel
    if width_bits:
        per = 1 << width_bits
        bits_px = 8 >> width_bits
        packed_w = -(-w // per)
        packed = []
        for y in range(h):
            for px_ in range(packed_w):
                v = 0
                for j in range(per):
                    x = px_ * per + j
                    if x < w:
                        v |= int(idx[y, x]) << (j * bits_px)
                packed.append((255 << 24) | (v << 8))
    else:
        packed = [
            (255 << 24) | (int(idx[y, x]) << 8)
            for y in range(h)
            for x in range(w)
        ]
    vp8l.write_entropy_image(bw, packed, level0=True)
    dec = vp8l.decode_webp(vp8l.wrap_riff(bw.flush()))
    assert np.array_equal(dec["pixels"], img)


def test_meta_prefix_codes_path():
    """Level-0 meta entropy image: two groups, left half uses group 0,
    right half group 1 (hand-assembled — the encoder itself emits a
    single group)."""
    w, h = 8, 4
    img = RNG.randint(0, 256, (h, w, 3), np.uint8)
    argb = _argb_list(img)
    bw = vp8l._BitWriter()
    _stream_header(bw, w, h)
    bw.bit(0)  # no transforms
    bw.bit(0)  # no color cache
    bw.bit(1)  # meta prefix codes present
    meta_bits = 2  # 4x4 blocks -> meta image 2x1
    bw.bits(meta_bits - 2, 3)
    # meta image pixels carry the group index in (red<<8)|green
    vp8l.write_entropy_image(
        bw, [(255 << 24) | (0 << 8), (255 << 24) | (1 << 8)], level0=False
    )
    # two identical FULL groups: write each over the whole alphabet
    groups = []
    for _ in range(2):
        enc = []
        for syms, size in (
            (sorted({(p >> 8) & 0xFF for p in argb}), 256 + 24),
            (sorted({(p >> 16) & 0xFF for p in argb}), 256),
            (sorted({p & 0xFF for p in argb}), 256),
            (sorted({(p >> 24) & 0xFF for p in argb}), 256),
            ([0], 40),
        ):
            enc.append(
                vp8l._write_prefix_code(
                    bw, vp8l._balanced_lengths(list(syms)), size
                )
            )
        groups.append(enc)
    for i, p in enumerate(argb):
        y, x = divmod(i, w)
        g = groups[(x >> meta_bits)]
        for ch, tbl in (((p >> 8) & 0xFF, g[0]), ((p >> 16) & 0xFF, g[1]),
                        ((p & 0xFF), g[2]), ((p >> 24) & 0xFF, g[3])):
            code, n = tbl[ch]
            bw.code(code, n)
    dec = vp8l.decode_webp(vp8l.wrap_riff(bw.flush()))
    assert np.array_equal(dec["pixels"], img)


def test_error_contract():
    img = np.full((4, 4, 3), 5, np.uint8)
    good = vp8l.encode_vp8l(img)
    with pytest.raises(ValueError, match="RIFF"):
        vp8l.decode_webp(b"not a webp at all....")
    # a RIFF of a DIFFERENT form (AVI) is an unsupported FORMAT, not a
    # corrupt file: NotImplementedError, the plug-in-point class
    # (review finding — registering the RIFF magic used to turn every
    # non-WebP RIFF into ValueError through decode_image)
    avi = (
        b"RIFF" + (12).to_bytes(4, "little") + b"AVI "
        + b"LIST" + (0).to_bytes(4, "little")
    )
    with pytest.raises(NotImplementedError, match="AVI"):
        vp8l.decode_webp(avi)
    try:
        vp8l.register()
        with pytest.raises(NotImplementedError, match="AVI"):
            mm.decode_image(avi)
    finally:
        mm.IMAGE_CODECS.pop(vp8l.WEBP_MAGIC, None)
    # VP8 lossy chunk now ROUTES to the r13 decoder (operators/vp8);
    # a garbage body is a loud corrupt-payload error, not a gap
    lossy = (
        b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
        + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8
    )
    with pytest.raises(ValueError, match="vp8"):
        vp8l.decode_webp(lossy)
    # bad signature byte
    bad = bytearray(good)
    sig_at = good.index(b"VP8L") + 8
    bad[sig_at] = 0x30
    with pytest.raises(ValueError, match="signature"):
        vp8l.decode_webp(bytes(bad))


def test_every_truncation_point_keeps_error_contract():
    img = RNG.randint(0, 256, (8, 8, 3), np.uint8)
    enc = vp8l.encode_vp8l(img, use_cache=True, use_lz77=True)
    for cut in range(0, len(enc), 3):
        try:
            vp8l.decode_webp(enc[:cut])
        except ValueError as e:
            assert str(e).startswith(("webp:", "vp8l:")), (cut, e)
        except NotImplementedError:
            pass


def test_registry_dispatch_upgrades_header_only_path():
    img = np.full((3, 7, 3), 77, np.uint8)
    payload = vp8l.encode_vp8l(img)
    # built-in: header-only (pixels None)
    out = mm.decode_image(payload)
    assert out["variant"] == "vp8l" and out["pixels"] is None
    assert (out["width"], out["height"]) == (7, 3)
    try:
        vp8l.register()
        out = mm.decode_image(payload)
        assert out["pixels"] is not None
        assert np.array_equal(out["pixels"], img)
    finally:
        mm.IMAGE_CODECS.pop(vp8l.WEBP_MAGIC, None)


# --- property test --------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    cache=st.booleans(),
    lz77=st.booleans(),
    palette_like=st.booleans(),
)
def test_property_roundtrip_lossless(seed, h, w, cache, lz77, palette_like):
    r = np.random.RandomState(seed)
    if palette_like:  # few distinct colors drive cache/run paths hard
        pal = r.randint(0, 256, (3, 3), np.uint8)
        img = pal[r.randint(0, 3, (h, w))]
    else:
        img = r.randint(0, 256, (h, w, 3), np.uint8)
    dec = vp8l.decode_webp(
        vp8l.encode_vp8l(img, use_cache=cache, use_lz77=lz77)
    )
    assert np.array_equal(dec["pixels"], img)
