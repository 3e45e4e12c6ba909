"""Baseline TIFF codec (operators/tiff.py): self-roundtrip across
byte orders / compressions / strip layouts, hand-built hostile
streams, named plug-in gaps, every-offset truncation fuzz, and
registry dispatch — the GIF/VP8L verification posture (no reference
TIFF library exists in this container)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import multimodal as mm
from timeseries_data_provider_spark.operators import tiff


def _find_entry(payload: bytes, tag: int, bo: str = "<") -> int:
    """Byte offset of an IFD entry in a payload built by encode_tiff
    (single IFD at offset 8)."""
    n = struct.unpack_from(bo + "H", payload, 8)[0]
    for i in range(n):
        base = 10 + 12 * i
        if struct.unpack_from(bo + "H", payload, base)[0] == tag:
            return base
    raise AssertionError(f"tag {tag} not in IFD")


def test_roundtrip_matrix():
    rng = np.random.RandomState(5)
    for be in (False, True):
        for pb in (False, True):
            for shape in ((7, 5), (6, 4, 3), (1, 1), (3, 128)):
                px = rng.randint(0, 256, shape).astype(np.uint8)
                for rps in (None, 1, 2, 3):
                    p = tiff.encode_tiff(
                        shape[1],
                        shape[0],
                        px,
                        big_endian=be,
                        packbits=pb,
                        rows_per_strip=rps,
                    )
                    d = tiff.decode_tiff(p)
                    assert d["format"] == "tiff"
                    assert (d["width"], d["height"]) == (shape[1], shape[0])
                    assert np.array_equal(d["pixels"], px), (
                        be,
                        pb,
                        shape,
                        rps,
                    )


def test_packbits_worst_and_best_case():
    # best case: long runs compress hard; worst case: alternating
    # bytes stay literal (PackBits never exceeds input + n/128 + 1)
    flat = np.zeros((2, 256), np.uint8)
    p_runs = tiff.encode_tiff(256, 2, flat, packbits=True)
    p_plain = tiff.encode_tiff(256, 2, flat, packbits=False)
    assert len(p_runs) < len(p_plain)
    alt = np.tile(np.array([0, 255], np.uint8), 128).reshape(1, 256)
    d = tiff.decode_tiff(tiff.encode_tiff(256, 1, alt, packbits=True))
    assert np.array_equal(d["pixels"], alt)


def test_min_is_white_inverts():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = bytearray(tiff.encode_tiff(4, 3, px))
    e = _find_entry(bytes(p), 262)
    p[e + 8] = 0  # Photometric: MinIsBlack -> MinIsWhite
    d = tiff.decode_tiff(bytes(p))
    assert np.array_equal(d["pixels"], 255 - px)


def test_named_gaps():
    px = np.zeros((2, 2), np.uint8)
    p = bytearray(tiff.encode_tiff(2, 2, px))
    e = _find_entry(bytes(p), 259)
    p[e + 8] = 6  # old-style JPEG (new-style 7 is supported since r11)
    with pytest.raises(NotImplementedError, match="compression 6"):
        tiff.decode_tiff(bytes(p))
    p = bytearray(tiff.encode_tiff(2, 2, px))
    e = _find_entry(bytes(p), 258)
    p[e + 8] = 4  # 4-bit samples (16-bit is supported since r11)
    with pytest.raises(NotImplementedError, match="bits per sample"):
        tiff.decode_tiff(bytes(p))
    p = bytearray(tiff.encode_tiff(2, 2, px))
    e = _find_entry(bytes(p), 284)
    p[e + 8] = 2  # planar
    with pytest.raises(NotImplementedError, match="planar"):
        tiff.decode_tiff(bytes(p))
    p = bytearray(tiff.encode_tiff(2, 2, px))
    e = _find_entry(bytes(p), 262)
    p[e + 8] = 6  # YCbCr (palette is supported since r11)
    with pytest.raises(NotImplementedError, match="photometric 6"):
        tiff.decode_tiff(bytes(p))


def test_hostile_inputs():
    px = np.zeros((2, 3), np.uint8)
    good = tiff.encode_tiff(3, 2, px)
    with pytest.raises(ValueError, match="magic"):
        tiff.decode_tiff(b"XX*\x00" + good[4:])
    # IFD offset beyond the payload
    bad = bytearray(good)
    struct.pack_into("<I", bad, 4, len(good) + 100)
    with pytest.raises(ValueError, match="IFD offset"):
        tiff.decode_tiff(bytes(bad))
    # strip offset out of bounds
    bad = bytearray(good)
    e = _find_entry(good, 273)
    struct.pack_into("<I", bad, e + 8, len(good))
    with pytest.raises(ValueError, match="strip out of bounds"):
        tiff.decode_tiff(bytes(bad))
    # canvas bomb: huge width x height from a tiny stream
    bad = bytearray(good)
    e = _find_entry(good, 256)
    struct.pack_into("<H", bad, e + 8, 65535)
    e = _find_entry(good, 257)
    struct.pack_into("<H", bad, e + 8, 65535)
    with pytest.raises(ValueError, match="unreasonable canvas"):
        tiff.decode_tiff(bytes(bad))
    # strips covering fewer rows than ImageLength
    bad = bytearray(good)
    e = _find_entry(good, 257)
    struct.pack_into("<H", bad, e + 8, 3)  # claim 3 rows, strips carry 2
    with pytest.raises(ValueError, match="strip|rows"):
        tiff.decode_tiff(bytes(bad))


def test_truncation_fuzz_every_offset():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    for pb in (False, True):
        good = tiff.encode_tiff(6, 4, px, packbits=pb, rows_per_strip=2)
        full = tiff.decode_tiff(good)
        assert np.array_equal(full["pixels"], px)
        for cut in range(len(good)):
            try:
                tiff.decode_tiff(good[:cut])
            except (ValueError, NotImplementedError):
                continue  # every failure is a NAMED error, never junk
            # a successful decode of a prefix is impossible: the strip
            # data is the suffix
            raise AssertionError(f"decode survived truncation at {cut}")


def test_registry_dispatch_both_byte_orders():
    tiff.register()
    px = np.arange(6, dtype=np.uint8).reshape(2, 3)
    for be in (False, True):
        p = tiff.encode_tiff(3, 2, px, big_endian=be)
        d = mm.decode_image(p)
        assert d["format"] == "tiff"
        assert np.array_equal(d["pixels"], px)
    assert not mm.is_audio_payload(tiff.encode_tiff(3, 2, px))


# --- property roundtrip ------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    be=st.booleans(),
    pb=st.booleans(),
    rgb=st.booleans(),
    rps=st.integers(min_value=1, max_value=13),
)
def test_property_lossless_roundtrip(w, h, seed, be, pb, rgb, rps):
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if rgb else (h, w)
    px = rng.randint(0, 256, shape).astype(np.uint8)
    p = tiff.encode_tiff(
        w, h, px, big_endian=be, packbits=pb, rows_per_strip=rps
    )
    d = tiff.decode_tiff(p)
    assert np.array_equal(d["pixels"], px)


# --- LZW (compression 5) + predictor ----------------------------------------


def test_lzw_roundtrip_matrix_and_predictor():
    rng = np.random.RandomState(9)
    for be in (False, True):
        for pred in (1, 2):
            for shape in ((7, 5), (6, 4, 3), (40, 70)):
                px = rng.randint(0, 256, shape).astype(np.uint8)
                p = tiff.encode_tiff(
                    shape[1], shape[0], px,
                    big_endian=be, lzw=True, predictor=pred,
                    rows_per_strip=3,
                )
                assert np.array_equal(
                    tiff.decode_tiff(p)["pixels"], px
                ), (be, pred, shape)
    # predictor 2 is why real photographic TIFFs compress: a smooth
    # gradient collapses to near-constant deltas
    smooth = (
        np.add.outer(np.arange(100), np.arange(256)) % 256
    ).astype(np.uint8)
    p1 = tiff.encode_tiff(256, 100, smooth, lzw=True, predictor=1)
    p2 = tiff.encode_tiff(256, 100, smooth, lzw=True, predictor=2)
    assert np.array_equal(tiff.decode_tiff(p2)["pixels"], smooth)
    assert len(p2) < len(p1) / 4


def test_lzw_width_regimes_and_clear_on_full():
    # cyclic data drives the table through the 9->10->11->12-bit
    # regimes; high-entropy data past 4094 entries forces the
    # clear-on-full path
    big = np.tile(np.arange(256, dtype=np.uint8), 600).reshape(300, 512)
    assert np.array_equal(
        tiff.decode_tiff(tiff.encode_tiff(512, 300, big, lzw=True))[
            "pixels"
        ],
        big,
    )
    rng = np.random.RandomState(3)
    noise = rng.randint(0, 256, (200, 300)).astype(np.uint8)
    assert np.array_equal(
        tiff.decode_tiff(tiff.encode_tiff(300, 200, noise, lzw=True))[
            "pixels"
        ],
        noise,
    )


def test_lzw_hostile_streams_and_predictor_gap():
    px = np.arange(24, dtype=np.uint8).reshape(4, 6)
    good = tiff.encode_tiff(6, 4, px, lzw=True)
    # stream ending before the expected bytes is a named error
    for cut in range(len(good)):
        try:
            tiff.decode_tiff(good[:cut])
        except (ValueError, NotImplementedError):
            continue
        raise AssertionError(f"lzw decode survived truncation at {cut}")
    # predictor 3 (floating point) is a named gap
    p = bytearray(tiff.encode_tiff(6, 4, px, lzw=True, predictor=2))
    e = _find_entry(bytes(p), 317)
    p[e + 8] = 3
    with pytest.raises(NotImplementedError, match="predictor 3"):
        tiff.decode_tiff(bytes(p))
    # exclusive-compression guard on the encoder
    with pytest.raises(ValueError, match="exclusive"):
        tiff.encode_tiff(6, 4, px, lzw=True, packbits=True)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=10),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    levels=st.sampled_from([2, 8, 256]),
    pred=st.sampled_from([1, 2]),
)
def test_property_lzw_lossless(w, h, seed, levels, pred):
    rng = np.random.RandomState(seed)
    px = (rng.randint(0, levels, (h, w)) * (256 // levels)).astype(np.uint8)
    p = tiff.encode_tiff(w, h, px, lzw=True, predictor=pred)
    assert np.array_equal(tiff.decode_tiff(p)["pixels"], px)


def test_large_dimensions_use_long_typed_tags():
    # review finding: SHORT-only dimension tags crashed on any
    # dimension above 65,535 while the decoder accepts up to
    # MAX_PIXELS
    px = np.zeros((1, 70_000), np.uint8)
    p = tiff.encode_tiff(70_000, 1, px)
    d = tiff.decode_tiff(p)
    assert (d["width"], d["height"]) == (70_000, 1)
    assert np.array_equal(d["pixels"], px)


def test_hostile_ifd_value_types_raise_named_errors():
    # review finding: RATIONAL-typed or count=0 scalar tags surfaced
    # as raw TypeError/IndexError instead of the contract's named
    # errors
    px = np.zeros((2, 3), np.uint8)
    good = tiff.encode_tiff(3, 2, px)
    # retype ImageWidth as RATIONAL (type 5) pointing at in-bounds data
    bad = bytearray(good)
    e = _find_entry(good, 256)
    struct.pack_into("<H", bad, e + 2, 5)   # type = RATIONAL
    struct.pack_into("<I", bad, e + 4, 1)   # count = 1
    struct.pack_into("<I", bad, e + 8, 8)   # offset: anywhere in-bounds
    with pytest.raises(ValueError, match="non-integer"):
        tiff.decode_tiff(bytes(bad))
    # count=0 Compression entry
    bad = bytearray(good)
    e = _find_entry(good, 259)
    struct.pack_into("<I", bad, e + 4, 0)
    with pytest.raises(ValueError, match="empty"):
        tiff.decode_tiff(bytes(bad))


def test_palette_photometric3_roundtrip():
    # r11: palette-indexed TIFFs (photometric 3 + 16-bit ColorMap)
    # were a named gap; channels map v*257 so >>8 inverts exactly
    rng = np.random.RandomState(1)
    idx = rng.randint(0, 256, (20, 30)).astype(np.uint8)
    pal = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    for bo in (False, True):
        for kw in ({}, {"packbits": True}, {"lzw": True}):
            blob = tiff.encode_tiff(
                30, 20, idx, big_endian=bo, palette=pal, **kw
            )
            dec = tiff.decode_tiff(blob)
            assert dec["pixels"].shape == (20, 30, 3)
            assert (dec["pixels"] == pal[idx]).all(), (bo, kw)
    # hostile: photometric 3 without a ColorMap is loud
    blob = tiff.encode_tiff(30, 20, idx, palette=pal)
    import struct as _s

    # find and zero the ColorMap tag id (320) in the IFD
    bad = blob.replace(_s.pack("<H", 320), _s.pack("<H", 999), 1)
    with pytest.raises(ValueError, match="ColorMap"):
        tiff.decode_tiff(bad)
    with pytest.raises(ValueError, match="palette needs"):
        tiff.encode_tiff(30, 20, np.zeros((20, 30, 3), np.uint8),
                         palette=pal)


def test_deflate_compression_roundtrip():
    # r11: Adobe Deflate (8) was a named gap and is pure zlib;
    # legacy 32946 decodes through the same branch
    rng = np.random.RandomState(3)
    for shape in [(12, 17), (12, 17, 3)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        for bo in (False, True):
            blob = tiff.encode_tiff(17, 12, px, big_endian=bo,
                                    deflate=True, rows_per_strip=5)
            dec = tiff.decode_tiff(blob)
            assert (dec["pixels"] == px).all()
    # deflate pairs with predictor 2 like LZW does
    px = rng.randint(0, 256, (8, 9)).astype(np.uint8)
    blob = tiff.encode_tiff(9, 8, px, deflate=True, predictor=2)
    assert (tiff.decode_tiff(blob)["pixels"] == px).all()
    # legacy tag 32946
    import struct as _s

    b = bytearray(tiff.encode_tiff(9, 8, px, deflate=True))
    e = _find_entry(bytes(b), 259)
    b[e + 8 : e + 10] = _s.pack("<H", 32946)
    assert (tiff.decode_tiff(bytes(b))["pixels"] == px).all()
    # corrupt deflate data is loud
    b = bytearray(tiff.encode_tiff(9, 8, px, deflate=True))
    b[-10] ^= 0xFF
    with pytest.raises(ValueError):
        tiff.decode_tiff(bytes(b))
    with pytest.raises(ValueError, match="exclusive"):
        tiff.encode_tiff(9, 8, px, deflate=True, lzw=True)


def test_jpeg_in_tiff_roundtrip_and_tables():
    # r11: new-style JPEG-in-TIFF (compression 7, TIFF Tech Note 2)
    # delegates strips to the in-repo baseline JPEG codec; shared
    # DQT/DHT hoist into JPEGTables (abbreviated streams), strips
    # whose optimal tables differ keep them in-strip. Lossy within
    # the codec's derived round-trip bound (3 RGB / 1 gray).
    rng = np.random.RandomState(2)
    for shape, bound in [((24, 31, 3), 3), ((24, 31), 1)]:
        px = rng.randint(0, 256, shape).astype(np.uint8)
        for bo in (False, True):
            for rps in (None, 8, 5):
                blob = tiff.encode_tiff(
                    31, 24, px, big_endian=bo,
                    jpeg_strips=True, rows_per_strip=rps,
                )
                dec = tiff.decode_tiff(blob)
                assert dec["pixels"].shape == px.shape
                d = int(
                    np.max(
                        np.abs(
                            dec["pixels"].astype(int) - px.astype(int)
                        )
                    )
                )
                assert d <= bound, (shape, bo, rps, d)
    # the single-strip form really is abbreviated: JPEGTables holds
    # the DQT marker, the strip itself does not
    px = rng.randint(0, 256, (10, 12, 3)).astype(np.uint8)
    blob = tiff.encode_tiff(12, 10, px, jpeg_strips=True)
    tags = tiff.read_ifd(blob, "<", struct.unpack_from("<I", blob, 4)[0])
    tbl = bytes(v & 0xFF for v in tags[347])
    assert b"\xff\xdb" in tbl
    off, cnt = tags[273][0], tags[279][0]
    assert b"\xff\xdb" not in blob[off : off + cnt]
    # photometric is YCbCr (6) for RGB jpeg strips
    assert tags[262] == [6]
    # hostile: a strip that isn't JPEG is loud
    bad = bytearray(blob)
    bad[off] = 0x00
    with pytest.raises(ValueError, match="SOI"):
        tiff.decode_tiff(bytes(bad))
    # exclusivity guards
    with pytest.raises(ValueError, match="exclusive"):
        tiff.encode_tiff(12, 10, px, jpeg_strips=True, lzw=True)
    with pytest.raises(ValueError, match="palette|predictor"):
        tiff.encode_tiff(12, 10, px, jpeg_strips=True, predictor=2)


def test_planar_configuration_2_roundtrip():
    # r11: planar config 2 (per-channel strip groups) was a named
    # gap; all raster compressions and the predictor pair with it
    rng = np.random.RandomState(4)
    px = rng.randint(0, 256, (14, 9, 3)).astype(np.uint8)
    for bo in (False, True):
        for kw in (
            {},
            {"packbits": True},
            {"lzw": True},
            {"deflate": True},
            {"lzw": True, "predictor": 2},
        ):
            for rps in (None, 5):
                blob = tiff.encode_tiff(
                    9, 14, px, big_endian=bo, planar2=True,
                    rows_per_strip=rps, **kw,
                )
                dec = tiff.decode_tiff(blob)
                assert (dec["pixels"] == px).all(), (bo, kw, rps)
    # the layout really is planar: 3x the strip count, planar tag 2
    blob = tiff.encode_tiff(9, 14, px, planar2=True, rows_per_strip=5)
    tags = tiff.read_ifd(blob, "<", struct.unpack_from("<I", blob, 4)[0])
    assert tags[284] == [2] and len(tags[273]) == 9
    # wrong strip count is loud
    bad = bytearray(blob)
    e = _find_entry(bytes(bad), 278)
    struct.pack_into("<H", bad, e + 8, 14)  # 1 strip/channel claimed
    with pytest.raises(ValueError, match="planar-2 needs"):
        tiff.decode_tiff(bytes(bad))


def test_ccitt_photometric1_inverts():
    # r12 ADVICE: under TIFF 6.0 the fax bits ARE the samples (white
    # pel -> 0), so photometric 1 (BlackIsZero) marks a REVERSED
    # image that must display inverted relative to the photometric-0
    # scanner default
    px = np.where(
        (np.arange(64).reshape(8, 8) % 3).astype(bool), 255, 0
    ).astype(np.uint8)
    blob = tiff.encode_tiff(8, 8, px, ccitt="g4")
    assert np.array_equal(tiff.decode_tiff(blob)["pixels"], px)
    b = bytearray(blob)
    e = _find_entry(bytes(b), 262)
    b[e + 8] = 1  # Photometric: WhiteIsZero -> BlackIsZero
    d = tiff.decode_tiff(bytes(b))
    assert np.array_equal(d["pixels"], 255 - px)
