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
    p[e + 8] = 9  # JBIG-in-TIFF: still a named compression gap
    with pytest.raises(NotImplementedError, match="compression 9"):
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


def test_palette_16bit_indices_roundtrip():
    # r13: 16-bit palette INDICES (photometric 3 + BitsPerSample 16
    # + a 3x65536 ColorMap) were a named gap; a 16-bit sample there
    # is an index — it must look up BEFORE the >>8 downshift the
    # 16-bit intensity tier applies. Cross-validated at build time:
    # the JDK's independent javax.imageio TIFF reader decoded THIS
    # exact deterministic fixture from this encoder's bytes and
    # matched pal[idx] pixel-for-pixel.
    h, w = 13, 31
    rng = np.random.RandomState(42)
    idx = rng.randint(0, 65536, (h, w)).astype(np.uint16)
    pal = np.stack(
        [
            np.arange(65536) % 256,
            (np.arange(65536) // 7) % 256,
            (np.arange(65536) // 13) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    for bo in (False, True):
        for kw in ({}, {"lzw": True, "predictor": 2},
                   {"packbits": True}, {"deflate": True}):
            blob = tiff.encode_tiff(
                w, h, idx, big_endian=bo, palette=pal, bits=16, **kw
            )
            dec = tiff.decode_tiff(blob)
            assert dec["pixels"].shape == (h, w, 3)
            assert (dec["pixels"] == pal[idx]).all(), (bo, kw)
    # an index above 255 must resolve through the wide map (the old
    # behavior downshifted it into the low palette rows)
    one = np.array([[300]], np.uint16)
    dec = tiff.decode_tiff(
        tiff.encode_tiff(1, 1, one, palette=pal, bits=16)
    )
    assert (dec["pixels"][0, 0] == pal[300]).all()
    # hostile: a ColorMap whose size disagrees with BitsPerSample
    blob = tiff.encode_tiff(w, h, idx, palette=pal, bits=16)
    import struct as _s

    e = _find_entry(blob, 258)  # BitsPerSample -> 8 vs 65536 map
    bad = bytearray(blob)
    _s.pack_into("<I", bad, e + 8, 8)
    with pytest.raises(ValueError, match="does not match"):
        tiff.decode_tiff(bytes(bad))
    with pytest.raises(ValueError, match="palette needs"):
        tiff.encode_tiff(w, h, idx, palette=pal[:256], bits=16)


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


# ---------------------------------------------------------------------------
# old-style JPEG-in-TIFF, compression 6 (r12 late) — the deprecated
# TIFF 6.0 §22 form 90s scanners wrote: JPEGInterchangeFormat points
# at ONE complete JFIF stream. Cross-validated against the JDK's
# independent javax.imageio reader: the rasters below are what the
# JDK decoded from THIS encoder's files at build time (pinned), and
# agreement is within JPEG IDCT rounding.

_OLDJPEG_JDK_GRAY = (
    "KS0yNzxBRktQVVpfZGluc3h9goeMkZaboKWqr7S5vsMrMDU6P0RJT1RZXmNpbXN4fYKH"
    "jJGXnKGnq7C1u8DFyi4zOD1DSE1TWF1iaG1yd32Ch42Sl52ip6yyt7zCx8zRMTY7QUZM"
    "UVdcYWdsc3d9goeNkpieo6mts7i+w8nO09k0OT9ESk9VW2Bma3F2fIKHjZKYnaOprrS5"
    "vsTJ0NXbLDc8QkhNU1lfZGpwdXuBh4ySmJ2jqa60usDFy9HXKS40Oj9FS1FXXWNobnR6"
    "gIaMkZedo6mvtbrAxszS2CsvNTs9Q0lPVVthaG1yeH+Fi5GXnaOpr7W7wcfN0tksMTc9"
    "Qz9GTFJYXmRrcXd9g4mPlpyjqK6zusHHzdPZKzI4PURKQ0lPVVxiaG51e4GIjpSboaet"
    "tLrAx83T2SwyOD9FS1BGTFJZX2Zsc3l/hoyTmaCmrLS5wMbN09ksMTk/RkxSWUlPVlxj"
    "aXB3fYSKkZeepauyuL/FzNPZLDI5P0ZNU1pgTFJZYGZtdHuBiI+VnKOqsLe+xMvS2Ssy"
    "OT9GTVRaYWhPVVxjanF4f4WMk5qgp661vMPK0dgrMTg/Rk1UW2Fob1JZX2dudXyDipGY"
    "n6attLvCydDXKjE5P0ZNVFtiaXB3VVxjanF4f4eOlZyjqrG5wMfO1SgvNz5FTFJaYmlw"
    "d35YX2ZtdXyDi5KZoKivtr7FzNPbLjQ9REtSWmFocHd+hVtiaXF4gIePlp2lrLS7xMvR"
    "2Sw0O0NKUVlgaG93f4WNXmVsdHyDi5OaoqmxuMDIz9cqMzlBSVBYX2dudn6FjZRhaHB4"
    "f4ePl56mrrS9xc3UKDA3QEdPVl5mbXV9hYyUnGRrc3uDi5OboqqyusLK0tksNT1FTVVc"
    "ZGxzfISMk5ujZ293f4eOl5+nr7e/x8/XKzM7Q0tTXGNrc3uDi5Obo6tqcnqCipKao6uz"
    "u8PK0ygwOEBIUFhhaHF5gYqSmqKqsmx1fYWOlp6nr7i/yNDYLTU9RU5WXmdvd3+IkJih"
    "qbG5"
)
_OLDJPEG_JDK_RGB = (
    "KLnYLb7RM8POOCjHPC7DQDO/Rja6Sj2zT0GwVUepWkykX1ChZFSbaVmXbV+Sc2SNeGmI"
    "fW6Bg3N9iHh4i310kYJvlodqm4xloZFeppZbrJtWsKFQtaVNuapFv65CxLQ7K8DUMcXP"
    "NsrKOivEPzC/RTW6Sjq2UD+xVUSsWUqnXk+gZFSbaVmXbl2RdGONd2iHfG2Cg3N9hnh3"
    "jXxykYJtlodom4xjoZFep5dZqpxTsqFRtaZJu6pCwLA/xbU7ybs0LsbTM83NN9HHPC7B"
    "RDO9SDe3TD2yU0StV0inXE2iY1OcaFiXbl2Tc2KOd2iHfG2CgnJ9h3d4jXxykYJtl4Zo"
    "m4xhopFdp5hXrZxUs6NOt6dHvaxEwrM+ybc5zLwz0cEuMM7PNtPIO9jDQjG+Rja6Szyz"
    "UUGuV0epXEykYFKfZ1eYbVyScmGNd2iJfmyCgnJ9h3d3jXxykoFtmIhnno1ho5Jcp5hV"
    "rp5Rs6NMuKhIv61Bw7I8yrk3z74y0sMs2MkmNNbLONvGQCzBRTW8STm1UD+xVEOpXEmj"
    "YVCgZlWZaluScWCNdmaKfWuDgnB8iHV3jXxykoFtl4dmnI1io5JcqZdVrpxQtKNLualH"
    "wK5AxLQ7yrk10MAv1cUq28okK9DSNyjJPS/EQjS9Rza2TjyyU0KsWUimX02hZVSbaVqV"
    "cF6OdWWKfGqEgHB9iHV3jHtzkoFtl4dmnYxho5JcqZdVr51RtKNLuqhGwK4+xLQ6y7s0"
    "0MAt18QoKMzWLtHQNdfKOS/EQDXARTq6TDq0UT+vV0WoXUuhY1GbaFiXbl2Rc2OKe2iG"
    "gW9/h3R6jHt0kYBul4ZonYxhopFbqZdVr55QtKNJu6lFv68+xbY5zLoy0sEt2MYmKczV"
    "L9LPNdfKOyrEPDjDRD2+SkO3TzyvVkOsW0iiYU6dZlWZbluScmGNeGiFf26AhHN5jHl1"
    "kn9uloVnnYxhopFbqZdXrp1PtKNJu6lDwbA+x7U5zrsx08Iu2MYkKs3UMtPOONnJPCzC"
    "QjG7QD2+R0O7TEuzUT+tV0amXkyiZFOaaliScl6PeGSJfWuDg3J8iXd1j31vl4NqnYlk"
    "oZBcqZVWrpxQtKJMuqhEwq4+x7M4zLoy08Iu2cclKs3UMtPON9jGPyvCRDK8Sje1Q0W8"
    "SEu2TlGwVUOpXEmjYk+eaFWVblyOdGKKe2iEgW99iXV3jnxyk4FpmohkoI5ep5RZrZtT"
    "s6FLu6dGv609yLQ5zLow0sEt2sYlK87TMtPNONnHPizARjK4Szi1UT+tRk24TVOzUlis"
    "WkanYEyhZlKabFiTcl+MeWaGf2yAhnN5jHlzlH9smYZmoYxfppNZq5hTsqBMuKVGwaw/"
    "x7M6zbky1MAr2sYnK83SMtPNOdrIPy3BRzO5TTmyUj6tV0akSlS2UFqxV2GpXEmjZE+c"
    "aVaWcFyPd2OIfWmChHB7i3h0knxumIRpnYpgppFaq5hUsp1Mt6RFwKtAxbI6y7kz1MAt"
    "2cUmK83SMtPNOtnFPyvARjK4TTmyUj+rWkalYE2fTFqzU2GsWGikX0yeZlKXbViRdWCL"
    "e2eDgm1+iHR2j3twloJqnIhjo49cqpVUr5xPt6RIvKlAxLA9yrc0074t2cUoKsvVMtPN"
    "ONrFPyu+RjK4TTm0VT+rWkalYkyeaVSXT2CwVWiqXHCjY06balaVcFyNeGKIgGqBhXF6"
    "jHdylH9smoZloYxfp5NYrppRtaFKvKlDw688yrU10bwv2MQnKsvVMtHNN9jIPyvARTG3"
    "Tji0VT+sW0ajYkyeaVSXb1uQUmmtWXCmYHegZ1KXbViRdWCJe2eCg259iXV2knxvmINm"
    "n4pfppFarJhTtZ9KuqZDwa08yLQ30bsx18InKsjTMtDPOdfIPyvARzG4TDixVT+rWkej"
    "Yk2caVSXcVqQd2GHVnCpW3ikY36calaVcluPeGKGgGp/hnF4j3hylX9qm4dko41bqpVU"
    "sZtPuqNGwKk/x7E5z7kw1MApJ8fXMM7RN9XHQCnCRS66TTe1VD6rWkSmYkyfaVOUcVqQ"
    "d2GIf2iCWHemX32fZoWZbViTdl+Le2eDg2x8i3Zzkn1smoNkoIteqJJYr5lQtqBLvqhC"
    "xK86zLUx070r28UkL8zRNtPKPdvERC27SzW0Uz2sWkSmYUueZ1KXcVqQd2GIfmeBhnF6"
    "W36kYYWdaI2WcluPeGKIgWmBiHF5kHlxloBonYdipo9brZZTtJ5LvKVFw6w8ybQ10bou"
    "2MQlLMrVNNHKOtnDQiy7SzS2UjuvWUOnYUueZ1KXcFmRd2GIfmeBhW97jHdyXoagZY2Z"
    "bZSTdF6MfGWCg2x8jHR0k3xsm4RlooxdqJJWsZpOuKNIwKk/xrA2zrgv2MAqK8nVM8/M"
    "OtfGQiq+STK2UDmuV0GmYEmhZlCZb1eRdl+JfmeDhG56i3ZzlH1rYYydaJSXcJyPd2GH"
    "fmh/h3B4j3hwl39nn4dhpo9ZrpdRtJ5JvaVBxa46zLUz070rKMXYL83QONTJPyjARy+3"
    "TzexVT+rXkehZU+YblaSdV6KfWaChW17jXVzlH1rnIVjY5SbbJuVc6OLe2ODg2p9jHR0"
    "k3xumoNko4tdq5NXsptNu6JFwqo+yrI007os2cImLMvRNdLLPdnDRC27TTSzVT6qXESi"
    "ZE2bbVWTdF2LfGWChGx6jHR0k3xsm4RkpIxcZ5uXb6KRd6uHf2d/hm95j3ZvmIBon4hf"
    "po9Zr5dPtp5GvqdBx644z7cv178nK8fUM8/MOdbDQyy7TDO1UzurW0OjYkudbFOVc1uL"
    "e2ODg2t7i3NzknttnINlo4tdq5NTaqKVc6qNerKFgml+i3J2lHptmoNkoopcq5FUtJpN"
    "u6JFw6w8zLM10rstKMPXMMvPONLGQCi+RzC2UDmuWUCmYEicZ1CWc1iPeWCHgGl9iXB0"
    "kXltmoBloopeqpJWsptNbqqRdLGIfbiAhW16jnVxln1nnoZip45YrpZQt51Iv6ZByK84"
    "z7cv2L8nLsjSNdDKPNjCRi66TjayVz2qXkWhZk6Yb1aQdV6If2eBiG53j3ZvmIBooYhf"
    "qZBXsJhOuqFF"
)


def _oldjpeg_pattern():
    ys, xs = np.mgrid[0:24, 0:32]
    gray = ((xs * 5 + ys * 3 + (xs * ys) // 7) % 180 + 40).astype(
        np.uint8
    )
    return gray, np.dstack([gray, np.roll(gray, 3, 1), 255 - gray])


def test_oldstyle_jpeg_roundtrip_and_jdk_cross_validation():
    import base64 as _b64

    gray, rgb = _oldjpeg_pattern()
    for px, golden, shape in (
        (gray, _OLDJPEG_JDK_GRAY, (24, 32)),
        (rgb, _OLDJPEG_JDK_RGB, (24, 32, 3)),
    ):
        blob = tiff.encode_tiff(32, 24, px, jpeg_old=True)
        dec = tiff.decode_tiff(blob)
        assert dec["pixels"].shape == px.shape
        # own round-trip within the codec's derived bound
        assert (
            np.abs(dec["pixels"].astype(int) - px.astype(int)).max()
            <= 3
        )
        # JDK agreement within IDCT rounding (independent decoder)
        jdk = np.frombuffer(
            _b64.b64decode(golden), np.uint8
        ).reshape(shape)
        assert (
            np.abs(dec["pixels"].astype(int) - jdk.astype(int)).max()
            <= 2
        )


def test_oldstyle_jpeg_hostile():
    import struct as _s

    gray, _ = _oldjpeg_pattern()
    blob = tiff.encode_tiff(32, 24, gray, jpeg_old=True)
    # fragment-table form (no JPEGInterchangeFormat) is named: strip
    # the tag by renumbering it to an unknown one
    at = blob.find(_s.pack("<HHI", 513, 4, 1))
    assert at > 0
    nojif = bytearray(blob)
    _s.pack_into("<H", nojif, at, 50513)
    with pytest.raises(NotImplementedError, match="JPEGInterchange"):
        tiff.decode_tiff(bytes(nojif))
    # pointer past the file is loud
    bad = bytearray(blob)
    _s.pack_into("<I", bad, at + 8, len(blob) + 9)
    with pytest.raises(ValueError, match="out of bounds"):
        tiff.decode_tiff(bytes(bad))
    # geometry lies are loud
    lie = bytearray(blob)
    at_w = blob.find(_s.pack("<HHI", 256, 3, 1))
    _s.pack_into("<H", lie, at_w + 8, 31)
    with pytest.raises(ValueError, match="IFD says"):
        tiff.decode_tiff(bytes(lie))
