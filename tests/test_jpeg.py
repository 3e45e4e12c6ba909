"""Baseline JPEG codec (operators/jpeg.py, VERDICT r5 item 7):
round-trips through our own encoder — closed-form where the math
allows (solid blocks + all-ones quant are EXACT), tolerance-bounded
where float DCT rounding is inherent — plus the worker-side registry
distribution path through real Spark mapInPandas."""

from __future__ import annotations

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import jpeg
from timeseries_data_provider_spark.operators import multimodal as mm

RNG = np.random.RandomState(20260814)


def _maxdiff(a, b) -> int:
    return int(np.abs(a.astype(int) - b.astype(int)).max())


def test_solid_color_roundtrip_exact():
    # constant block => lone DC coefficient; quant=1 => bit-exact
    for v in (0, 1, 128, 137, 254, 255):
        img = np.full((16, 24, 3), v, np.uint8)
        dec = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
        assert dec["format"] == "jpeg"
        assert (dec["width"], dec["height"]) == (24, 16)
        assert np.array_equal(dec["pixels"], img), v


def test_random_rgb_roundtrip_near_lossless():
    img = RNG.randint(0, 256, (24, 33, 3), np.uint8)
    dec = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
    assert dec["pixels"].shape == img.shape
    # all-ones quant: the only loss is float DCT/YCbCr rounding
    assert _maxdiff(dec["pixels"], img) <= 2


def test_grayscale_odd_dimensions():
    img = RNG.randint(0, 256, (13, 19), np.uint8)
    dec = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
    assert dec["pixels"].shape == (13, 19)
    assert _maxdiff(dec["pixels"], img) <= 1  # no chroma stage at all


def test_chroma_420_subsampling():
    base = RNG.randint(0, 256, (32, 32), np.uint8)
    img = np.stack([base, base, base], axis=-1)  # constant chroma 128
    enc = jpeg.encode_baseline_jpeg(img, subsample="420")
    dec = jpeg.decode_baseline_jpeg(enc)
    assert _maxdiff(dec["pixels"], img) <= 1
    # odd dims exercise the partial-MCU crop path
    img2 = np.stack([base[:25, :27]] * 3, axis=-1)
    dec2 = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img2, subsample="420")
    )
    assert dec2["pixels"].shape == (25, 27, 3)
    assert _maxdiff(dec2["pixels"], img2) <= 1


def test_restart_markers_roundtrip():
    img = RNG.randint(0, 256, (40, 56, 3), np.uint8)
    enc = jpeg.encode_baseline_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in enc  # DRI segment present
    dec = jpeg.decode_baseline_jpeg(enc)
    assert _maxdiff(dec["pixels"], img) <= 2


def test_quantized_encode_is_lossy_but_sane():
    img = RNG.randint(0, 256, (40, 40, 3), np.uint8)
    dec = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img, quant=16))
    # heavy quantization of NOISE loses a lot — just bound the wreckage
    err = np.abs(dec["pixels"].astype(int) - img.astype(int)).mean()
    assert 0 < err < 40


def test_unsupported_modes_raise_named_errors():
    # SOF2 is SUPPORTED as of r7 — arithmetic coding (SOF9) is the
    # nearest still-unsupported mode and keeps the named contract
    with pytest.raises(NotImplementedError, match="arithmetic"):
        jpeg.decode_baseline_jpeg(
            b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01"
            b"\x01\x11\x00"
        )
    with pytest.raises(ValueError, match="SOI"):
        jpeg.decode_baseline_jpeg(b"not a jpeg")
    with pytest.raises(NotImplementedError, match="12"):
        # SOF0 with 12-bit precision
        jpeg.decode_baseline_jpeg(
            b"\xff\xd8\xff\xc0\x00\x0b\x0c\x00\x10\x00\x10\x01"
            b"\x01\x11\x00"
        )


def test_registered_codec_through_decode_image():
    payload = jpeg.encode_baseline_jpeg(
        np.full((8, 8, 3), 200, np.uint8)
    )
    # unregistered: the documented plug-in point
    with pytest.raises(NotImplementedError, match="register_image_codec"):
        mm.decode_image(payload)
    try:
        jpeg.register()
        out = mm.decode_image(payload)
        assert out["format"] == "jpeg"
        assert np.array_equal(
            out["pixels"], np.full((8, 8, 3), 200, np.uint8)
        )
    finally:
        mm.IMAGE_CODECS.pop(jpeg.JPEG_MAGIC, None)


def test_jpeg_decode_in_spark_workers(spark):
    """The distribution contract: jpeg.register as the codec_setup
    hook installs the decoder inside mapInPandas workers; planted
    solid-color JPEGs decode to closed-form means."""
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StructField,
        StructType,
    )

    rows = [
        (i, jpeg.encode_baseline_jpeg(
            np.full((8, 16, 3), 40 + 20 * i, np.uint8)
        ))
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("doc_id", LongType()),
                StructField("payload", BinaryType()),
            ]
        ),
    )
    out = (
        mm.media_features(df, codec_setup=jpeg.register)
        .orderBy("doc_id")
        .collect()
    )
    assert [r["kind"] for r in out] == ["jpeg"] * 5
    for r in out:
        # solid color v: feat_milli = (1000 * v * npix) // npix = 1000v
        assert (r["width"], r["height"]) == (16, 8)
        assert r["feat_milli"] == 1000 * (40 + 20 * r["doc_id"])


def test_hostile_headers_fail_loudly_not_oom():
    # 65535x65535 header in a tiny payload: allocation guard, not OOM
    big = (
        b"\xff\xd8\xff\xc0\x00\x11\x08\xff\xff\xff\xff\x03"
        b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    with pytest.raises(ValueError, match="max_pixels"):
        jpeg.decode_baseline_jpeg(big)
    # zero dimension
    zero = (
        b"\xff\xd8\xff\xc0\x00\x11\x08\x00\x00\x00\x10\x03"
        b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )
    with pytest.raises(ValueError, match="zero"):
        jpeg.decode_baseline_jpeg(zero)
    # truncated scan data: named error, not IndexError
    enc = jpeg.encode_baseline_jpeg(
        RNG.randint(0, 256, (16, 16, 3), np.uint8)
    )
    with pytest.raises(ValueError, match="truncated|Huffman"):
        jpeg.decode_baseline_jpeg(enc[: len(enc) // 2])


def test_hostile_component_count_rejected_before_allocation():
    # ADVICE r6: a SOF claiming 255 components at ~max_pixels must be
    # rejected at header parse, BEFORE the scan decoder allocates
    # ncomp * max_pixels * 8 bytes of float64 planes. 10000x10000 is
    # inside the max_pixels guard, so only the component check fires.
    import struct as _s

    ncomp = 255
    sof_body = bytes([8]) + _s.pack(">HH", 10_000, 10_000) + bytes([ncomp])
    for ci in range(ncomp):
        sof_body += bytes([ci + 1, 0x11, 0])
    payload = (
        b"\xff\xd8"
        + b"\xff\xc0"
        + _s.pack(">H", 2 + len(sof_body))
        + sof_body
    )
    with pytest.raises(NotImplementedError, match="255-component"):
        jpeg.decode_baseline_jpeg(payload)
    # 5-component rejects with the same named contract, also at SOF
    # parse time (4-component is the CMYK family, supported since r12)
    sof5 = bytes([8]) + _s.pack(">HH", 8, 8) + bytes([5])
    for ci in range(5):
        sof5 += bytes([ci + 1, 0x11, 0])
    payload5 = (
        b"\xff\xd8" + b"\xff\xc0" + _s.pack(">H", 2 + len(sof5)) + sof5
    )
    with pytest.raises(NotImplementedError, match="5-component"):
        jpeg.decode_baseline_jpeg(payload5)


# --- property tests (hypothesis) ------------------------------------------

from hypothesis import example, given, settings
from hypothesis import strategies as st


def _img(seed: int, h: int, w: int, channels: int) -> np.ndarray:
    r = np.random.RandomState(seed)
    shape = (h, w) if channels == 1 else (h, w, 3)
    return r.randint(0, 256, shape, np.uint8)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    restart=st.sampled_from([0, 2]),
)
def test_property_grayscale_roundtrip(seed, h, w, restart):
    img = _img(seed, h, w, 1)
    dec = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img, restart_interval=restart)
    )
    assert dec["pixels"].shape == (h, w)
    assert _maxdiff(dec["pixels"], img) <= 1


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 20),
    w=st.integers(1, 20),
)
@example(seed=34753, h=16, w=6)  # hypothesis-found maxdiff-3 tail case
def test_property_rgb_444_roundtrip(seed, h, w):
    # Error budget at quant=1 (the codec's precision floor — baseline
    # DQT entries are integers >= 1): each of the 64 DCT coefficients
    # carries a +-0.5 rounding residue; the orthonormal IDCT maps those
    # to a per-pixel plane error with std 0.5/sqrt(12) ~= 0.29, and the
    # BT.601 inverse amplifies chroma error by up to 1.772 (blue), so
    # the pre-rint RGB error is ~0.6 std with rare multi-sigma tails.
    # Measured: 3000 images at the adversarial 16x6 shape -> worst
    # maxdiff 3, only 1/3000 above 2; a diff of 4 needs pre-rint error
    # > 3.5 (~6 sigma). The true round-trip bound is 3, not 2.
    img = _img(seed, h, w, 3)
    dec = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
    assert dec["pixels"].shape == (h, w, 3)
    assert _maxdiff(dec["pixels"], img) <= 3


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 33),
    w=st.integers(1, 33),
)
def test_property_gray_content_420_roundtrip(seed, h, w):
    # constant-chroma content: 4:2:0 loss is bounded by rounding only
    base = _img(seed, h, w, 1)
    img = np.stack([base] * 3, axis=-1)
    dec = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img, subsample="420")
    )
    assert dec["pixels"].shape == (h, w, 3)
    assert _maxdiff(dec["pixels"], img) <= 2


def test_large_and_float_quant_tables_stay_consistent():
    # review finding: a >255 or float quant used to quantize with the
    # RAW table but store a clipped one — encoder and decoder silently
    # desynchronized. Now the effective table is clamped to the
    # baseline-legal [1, 255] and used on BOTH sides.
    img = np.full((16, 16, 3), 200, np.uint8)
    dec = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img, quant=300)
    )
    # quant=300 clamps to the baseline-legal 255 (8-bit DQT only per
    # T.81 B.2.4.1): DC 8*(200-128)=576 -> /255 rint 2 -> 510 ->
    # 63.75+128 -> rint 192 exactly, with the SAME table both sides
    assert int(dec["pixels"][0, 0, 0]) == 192
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (24, 24, 3), np.uint8)
    dec = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img, quant=1.4)
    )
    assert _maxdiff(dec["pixels"], img) <= 3


def test_every_truncation_point_keeps_error_contract():
    rng = np.random.RandomState(5)
    enc = jpeg.encode_baseline_jpeg(
        rng.randint(0, 256, (16, 16, 3), np.uint8)
    )
    for cut in range(2, len(enc), 7):
        try:
            jpeg.decode_baseline_jpeg(enc[:cut])
        except ValueError as e:
            assert str(e).startswith("jpeg:"), (cut, e)
        except NotImplementedError:
            pass


# --- progressive (SOF2) decode — ADVICE r7 medium finding: the scan
# ladder must be exercised by real multi-scan streams, not just "SOF2
# no longer raises". The in-library progressive encoder shares
# _prepare_components with the baseline encoder, so with identical
# quant both paths produce IDENTICAL coefficient arrays and the decoded
# pixels must match bit-for-bit — every divergence is a decoder bug in
# DC first/refine, AC first/refine, EOB runs, or ZRL correction
# interleaving.


def _scan_count(enc: bytes) -> int:
    return enc.count(b"\xff\xda")


def test_progressive_roundtrip_matches_baseline_exactly():
    cases = [
        ((24, 33, 3), "444"),
        ((25, 27, 3), "420"),
        ((13, 19), "444"),
        ((8, 8), "444"),
    ]
    for shape, sub in cases:
        img = RNG.randint(0, 256, shape, np.uint8)
        penc = jpeg.encode_progressive_jpeg(img, subsample=sub)
        assert b"\xff\xc2" in penc  # really SOF2
        # DC first + DC refine + 2 bands x first/refine per component
        ncomp = 1 if len(shape) == 2 else 3
        assert _scan_count(penc) == 2 + 4 * ncomp
        pdec = jpeg.decode_baseline_jpeg(penc)
        bdec = jpeg.decode_baseline_jpeg(
            jpeg.encode_baseline_jpeg(img, subsample=sub)
        )
        assert np.array_equal(pdec["pixels"], bdec["pixels"]), (shape, sub)


def test_progressive_solid_color_is_pure_eob_runs_and_exact():
    # solid image: every AC band of every block is empty, so each AC
    # first scan is a single EOBn whose run spans ALL 36 blocks (extra
    # bits present since 36 > 1) — the eobrun-spanning-blocks path of
    # the ADVICE finding; quant=1 solid blocks decode bit-exact
    img = np.full((48, 48, 3), 137, np.uint8)
    dec = jpeg.decode_baseline_jpeg(jpeg.encode_progressive_jpeg(img))
    assert np.array_equal(dec["pixels"], img)


def test_progressive_restart_markers_roundtrip():
    img = RNG.randint(0, 256, (40, 56, 3), np.uint8)
    enc = jpeg.encode_progressive_jpeg(img, restart_interval=3)
    assert b"\xff\xdd" in enc
    assert b"\xff\xd0" in enc  # RST0 actually emitted in some scan
    dec = jpeg.decode_baseline_jpeg(enc)
    ref = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
    assert np.array_equal(dec["pixels"], ref["pixels"])


def test_progressive_quantized_matches_baseline():
    # real quantization: sparse AC bands drive mixed EOB runs, ZRLs,
    # and refinement correction bits through nonzero-history paths
    img = RNG.randint(0, 256, (32, 40, 3), np.uint8)
    for q in (4, 16):
        p = jpeg.decode_baseline_jpeg(
            jpeg.encode_progressive_jpeg(img, quant=q)
        )
        b = jpeg.decode_baseline_jpeg(
            jpeg.encode_baseline_jpeg(img, quant=q)
        )
        assert np.array_equal(p["pixels"], b["pixels"]), q


def test_progressive_spectral_split_variants():
    img = RNG.randint(0, 256, (17, 23, 3), np.uint8)
    ref = jpeg.decode_baseline_jpeg(jpeg.encode_baseline_jpeg(img))
    for split in (1, 9, 62):
        dec = jpeg.decode_baseline_jpeg(
            jpeg.encode_progressive_jpeg(img, ac_split=split)
        )
        assert np.array_equal(dec["pixels"], ref["pixels"]), split


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(0, 2**31 - 1),
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    restart=st.sampled_from([0, 2]),
    quant=st.sampled_from([1, 8]),
)
def test_property_progressive_equals_baseline(seed, h, w, restart, quant):
    img = _img(seed, h, w, 3)
    p = jpeg.decode_baseline_jpeg(
        jpeg.encode_progressive_jpeg(
            img, quant=quant, restart_interval=restart
        )
    )
    b = jpeg.decode_baseline_jpeg(
        jpeg.encode_baseline_jpeg(img, quant=quant, restart_interval=restart)
    )
    assert np.array_equal(p["pixels"], b["pixels"])


def test_progressive_every_truncation_point_keeps_error_contract():
    rng = np.random.RandomState(9)
    enc = jpeg.encode_progressive_jpeg(
        rng.randint(0, 256, (16, 16, 3), np.uint8), quant=4
    )
    for cut in range(2, len(enc), 7):
        try:
            jpeg.decode_baseline_jpeg(enc[:cut])
        except ValueError as e:
            assert str(e).startswith("jpeg:"), (cut, e)
        except NotImplementedError:
            pass


def test_progressive_hostile_zero_sampling_nibble():
    import struct as _s

    # ADVICE r7 high finding: SOF2 with a 0x00 H/V byte used to reach
    # _comp_grids and crash with ZeroDivisionError; must be ValueError
    sof = (
        bytes([8]) + _s.pack(">HH", 16, 16) + bytes([1])
        + bytes([1, 0x00, 0])
    )
    payload = b"\xff\xd8\xff\xc2" + _s.pack(">H", 2 + len(sof)) + sof
    with pytest.raises(ValueError, match="sampling factor"):
        jpeg.decode_baseline_jpeg(payload)


def test_non_integer_sampling_ratio_is_named_at_sof_parse():
    import struct as _s

    # 3x1 luma over 2x1 chroma: spec-legal, upsampler can't express it
    # — must be the NAMED NotImplementedError on BOTH frame types
    for marker in (b"\xff\xc0", b"\xff\xc2"):
        sof = (
            bytes([8]) + _s.pack(">HH", 16, 16) + bytes([3])
            + bytes([1, 0x31, 0]) + bytes([2, 0x21, 1])
            + bytes([3, 0x11, 1])
        )
        payload = b"\xff\xd8" + marker + _s.pack(">H", 2 + len(sof)) + sof
        with pytest.raises(
            NotImplementedError, match="non-integer sampling ratio"
        ):
            jpeg.decode_baseline_jpeg(payload)


def test_malformed_dqt_and_sof_keep_error_contract():
    import struct

    # DQT whose segment length can't hold a full table body
    p1 = (
        b"\xff\xd8\xff\xdb" + struct.pack(">H", 12) + b"\x00"
        + b"\x00" * 9
    )
    with pytest.raises(ValueError, match="jpeg: truncated DQT"):
        jpeg.decode_baseline_jpeg(p1)
    # SOF claiming 3 components but carrying bytes for one
    p2 = (
        b"\xff\xd8\xff\xc0" + struct.pack(">H", 11) + bytes([8])
        + struct.pack(">HH", 16, 16) + bytes([3]) + b"\x01\x11\x00"
    )
    with pytest.raises(ValueError, match="jpeg: truncated SOF"):
        jpeg.decode_baseline_jpeg(p2)


# -- Adobe APP14 color family (r12): CMYK / YCCK / direct RGB ----------

# frozen fixture: a seeded transform-0 CMYK file from THIS encoder,
# with the raster the JDK's INDEPENDENT ImageIO decoder returned for
# it via readRaster (pre-color-transform samples) — the CCITT/JDK
# cross-validation methodology applied to the 4-component path. The
# JDK agreed with the encoder's stored samples within +-1 everywhere
# (DCT rounding); the raster is pinned base64 so the agreement stays
# asserted without a JVM at test time.
import base64 as _b64

_CMYK_FIXTURE_JPG = (
    "/9j/7gAOQWRvYmUAZQAAAAAA/9sAQwABAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB/9sAQwEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEB/8AAFAgAEAAYBAERAAIRAQMRAQQRAf/EABcAAAAEAAAAAAAAAAAAAAAAAAUGBwj/"
    "xAAfEAAAAAwAAAAAAAAAAAAAAAAAAQIDBAUGBwgJChX/xAAaAQAABwAAAAAAAAAAAAAA"
    "AAADBAUGBwgJ/8QAIhEAAAAPAAAAAAAAAAAAAAAAAQIDBAUGBwgJChITFRYX/9oADgQB"
    "AAIRAxEEEQA/AFjZZXvZU7CO0iNf+amWtsS/heOqfepneSgFrMneA1sQDqVc7xmXfu3e"
    "s/2IdsXvu5h9QHUvQdw6hUqBXOnOOvZaZyonHH4WWgiJiSaZ+xD+mzamTWIxXXjGBtGa"
    "66GxxJrq+Pqq9L+vDKlzYoydeo1TSmoO0oRYESzJRG7Nea8qkYFTuWr2vAEMiUqv7FVa"
    "ZMypQ1GT60IhakOz9RwtVNVZNQW9Rq2evCMkZmQeSeTakBJKam1gXNbG7wVHkF7c1PkC"
    "q5QqeKSsbGEm7w+qtKstXeKTZmsCwOvL8gFxGZgrpil1ZaM3sdkqbRCNc5eGKNrgpnTv"
    "SaY2sDyTCGhJOW4Z4vrK2rMLKqMtrUW1uuptnSVKs8Pl1RraGHLYztsbG2+PWnyDNlKJ"
    "KAwNpxFYlsc/a0i16Y+iG3GK8tebU0155rrZXRN8+OEVau/dwsl7AFUcPKSGlXpTUrh0"
    "hTQzVFi0zo2mdU3aiaR2bRtuceDGEoXYJa+S2lUileY7BaOpbp4yxZVPZxXrdoUlgmtQ"
    "FWrgWWuNjjkMMWUxVRb3goryWSSRQZBYDY7ZJA3hzt+VkRGnR+lEYRNz5dXfnwWlqOjU"
    "2KcIo7KHSrpFPI5ZzEwOEYlD1FG6LTKFPEhCylri2plyxM/XhnUc17gC3KshEyQWUZq7"
    "1EJN4FnK0LMmD9cTAVLmbJWnRx0+z40QZqoibVxDmquLsi2mJIwXxAJJpKEWdDl0mrSu"
    "qIYb20h4cqoTVnYmXjy4zOmXtvZStJ+0ZrUPx8dBOlI9PJlGM6bCriuMwXkZEPfMLXJq"
    "ycPDZY0qiVSUprTK2nusnKzNMVY8aePrRivCRVI5QztrAi7hrlmxDvYM54MN7HpjqVUk"
    "pDUtIxM2ZOdOmrFfOPYVzRt3JhjXYPreS0xh6rp3ZFqp1rLtyU69GZp3R1xqpWLlHrm0"
    "ZjHKtStZdBEDX9j7NrqfR80krTOGUKOAul1yac4ZD5TRJX1JUZAVJBa2htQaG7KlUyl8"
    "YgkSXS62r8vi0pBLnllILEtKfPz0c+SIZoV1tiKVFWFeVwZ+dp7VzhDIJFkEwvzZoiDM"
    "0w0NalkKGBuVWtLJE5Y3NUO/szMkIXWQ4SgFGV1BMuRZ8qaiCK0rS2LQ0xcESsLTVxvQ"
    "7m7dFoedVkZtrGnn3CmhKemkCqSsJtR1UiwxiWtq6yBoyIR54tq1K+mlxY0+MvqNLNWL"
    "IpoSqoVoKJJNgX9RjIwVVS0qzsmYG6bT60r6xFAp1XZvuY1Zse5COeF5gHURC3l57BMa"
    "xkuZmF22C2ZR1S1dqxTVPGcC/KJeJt68Zp5xa4aNCYJqDbWsM/paOWbVVPaVDSMMsE51"
    "T8FCJqq1DNGj4kmqtBYUvUZpwVlbW2aoFOrcnlObuykV3c/TqjKuQaOdrO0xmpy3CGiz"
    "5HtkZUrCMZG0VOrA1Nj50vDO0KrirHi0JJZTVXi5kkju3T3aDhJvSqYzlR2CtfhbIx3d"
    "YQMwaUgkC3KKI8qw1l7Cksl0scAXVNqTCqY0uzGWWIReCbLlgWRICIsdqDr67pFsK/Lq"
    "UaiYotMFlxSi6OJkDOHHXrT54RjrG3WH+3s2ZLA1VVW8vHMdVF/l0hane1VZ2vitLGpb"
    "v7CWbqk6jFwYy7cpiEZGmHb1FIMrQK2qs2demYMbZKrbPD1HIZWkqw5bFHHHCSsYpYS3"
    "etAJwM6WPR3rsHRqB0TQHHZmpYMZi9ZlAQHqN0yj72ZRXVuEaJuF4Ya1en2xRkI/EGy7"
    "oGDX7TMQgrh5TsomlSzrNtc9NkFu7FQaDGAWJkzxq6IKPQ4a3dpLFWVHrV1TY06CZuCt"
    "iP1jVtAnIxmuq2tdXxsSquyqawVlagHSUVNJrg1BJna7mCOVk+WA9EQxysiKVdTl9LMM"
    "g+wtSTT1aVBn78LHGUvYnAVaX5hqxQ0W/NOYU9CMpS0MfW5ZlgImyFbw+8/mdrcozUGO"
    "rohGhIpPM6VBQEtz1HnCZFWlYmfLgkjcF5WJMQWJAsnUJX1xhhRVWJpRV0ERVYzZQxqM"
    "qlF1ZOo6sq4cFkEpaus/WRIRWGKnBRBmammKCASRZuypUzFWigS6tIoilEYiTRNpFT14"
    "92Z6zLbMCgq2Z9GI9timrLapQtkuUCn7fe6FbOpW55UmDrHN+s0VaQcvEG3DDqcRDQrN"
    "dMszCIYbVtW0VbuHQI593DDvZeDFRDFbFhTbpplJH6jM7aC5u4kpZoSQhJFJ1vLbVqEO"
    "DI4PkAq5cqOsy+Id3F51Y0uQTi7JVHEjY4IMxYsbKuZrKnyASCuKipxE5LoXRNpkM5TU"
    "/wBCKPdt3PmgOLm+3La0NkjTWxRQjcVHsyVHIrkqZ20JrTSIsK8seHAzJIIVWFwW1dk4"
    "74aINI6ofpdHIJnhwdI5KKyx20Du8qyWSKhtMc1jGLutitIVR28FGDKrE1XB4BuAFYVt"
    "rSso5QmyK+7kzWL60RsabQSltjMlbPUQ0NV1ASaPUhb0AQWQZNIYsrBdJoz/2Q=="
)
_CMYK_JDK_RASTER = (
    "8vLyEPTv9RIR8PUV9fLzFvPv8Bjz7/IX8OzxFfDr7hTz6ewV8OvqEvDu7BHz7e8P8/Dx"
    "8/Tw8PQQ8/D19fDwEBHu7/P18O3wEPLr7fP16O3z8+Xv8fDi7PLu4+zx7+HsEhLzEfUS"
    "9fUREvQQEPX19BL1EvQR8xPyEfQU8BHyEu0U9hTtEvQS7xX0FO8U8RLyE/MS9BbzERET"
    "9fUTFvP1EhcQEhQa9RMXGvIWGhjwGRoV8RccEu4XHfXxGSEQ8Rce9BDx8xDy8hD19PT1"
    "9fX1EfX19fUR9BEREPMQEvT1E/XxERby9RIW8vIUGPDzFxnt8BUY7+0UFPLwFBT18BcT"
    "EO0WE/TsFRHz7xL29O0V8hDxEvL08hXw8fUU8+7yFvDtEfUQEfQSExAQFRASERX1ERAW"
    "8/X0FPHz9hH0EPIT9RPwFxAT7hQRFfAR9RLuEhIU7BITFe4VExjxFBQX7xETGe71ERns"
    "9fQd7PIRHOnyExjo9RYW5fUXGOjyFxbm8hgVEfUREhIQEBQREvQS9PUQFPPz9Bfw8REV"
    "7/T0GO718RXu8vMV7O/xFOzy8Bfv7/IY7+3yGvHr9Bzy7fMc9O7yG/Lx8R3z7vAc9PDz"
    "HvLy9SDz7/Md8/DyHvPy8yHv8vMh9fPz9RIQ8/X1E/UQ9BMSEPUSEvMSExPxEBMV7xET"
    "F+8TExrvEhAa8vUTGfT1FhsRERccFBEXGhERFh31ERUdEhIXIBL1Fx/1ERke9RMZG/MR"
    "HBnw9BoZ8PMbFvP0HhPxEPIS8vP0EvH09RDzERD08xMTEfMWFPX0FhMT9RgREfUV9fTz"
    "F/X18Bb08vETEO/zFhHu9RkR7/MZFO7xGxbt8BgZ7e4VF+zwFxTp8RYT6fMXE+nyFxXs"
    "8xUV6fMYFunzEBIQ9fQVExHyEhET7xMUFOwSFhTr9RcS7PIUFO71ExHt8REU7vITF+v0"
    "Fhjq9Rcb6vIZHOfyFxvo8BQY6e8WFebvFxPn8RgS5fMZEOXwHPXn8xry5/Mc9Of0GvPq"
    "ERjyEPISEBDxEPQQ7/URFO708xLt9PUU6xDzEegTEBLpExAU7BUREekT9PXsEvPy7BLw"
    "8esS7fTsEOv06vXu8Ozx7vLr7fHv7fDx7u7y8PDw8vLv7/L17vD19fDzEhHx8xH1EvTy"
    "8xPz8xAQ8RER9fITE/PwEBH07RATEewSFBTqEhcS6BEXFOoQGhHtERcQ6xIVEesRFvXs"
    "EhkQ6xUY8+4XFvPtGBP06hsR8uoYEvHtFhPx8BgW7+8aFe7tHBTv7RwT9BDx8/UT8BAS"
    "FvMQEBXz9RIU8PIRE+/0FBXv8RMS7fMUEO31FxHw8hgT8fUYEfTzFhL18hcREPIaFBDy"
    "HRMQ9RoS8/Ma9fDxG/Lx7x7x8vAe9PPtIfP06yH28uwi9fXuEhP09BUT9fIVF/T0Fhjx"
    "9RgY8fUZG/QQGBoR8xYZEfEXGBLxFxUU8RkVE/AWFhLtExb07REY8ewUGPDvExny8hQb"
    "9e8SGBLtEhYV7hEZEuwSGxHrEhkQ7PUc9esQHfPu9RD18vQS9O/xEvXu7xQQ7/EXEfLy"
    "FxD08RUR9fIS9fP0FfQQ8xXzEPMT8fPwEfH07fTu8e308PLu9e/v7BDx7u4T8PHuEfDt"
    "8RHw7PQU8u0RF/Pu9Bjw7xEa7+30F/Hw8vTyEO/08RHs8e4T7fDxEezz8xDs8fIQ7PTv"
    "E+707xHw8+0U9PTsFfL17xjw9fAZ7/PvHO/17R/xEOod8hPoHvQS6SD0FeYj9RTpJPUT"
    "6ibzFOkjEBLoIvP16yP19Osi9fUQ9BAS8/TzFPP18hLvEPP17PXw8+708/Dw8fPt7e8Q"
    "8ezz9e7p7xDt7PAR7Ozy9O3r8/Xv7PUR7OryEOzn8hLp5vES7OTyEe3m8xTv4/UQ7uPy"
    "Eevg9BLr4BAT7N0TEPQREPTxEhHy9BEQ8xAQEBAQEPP1ERHx9PUR9PERE/PxEBLw7xH1"
    "9O8TEvTvFBPy7xIS7+v1EOzp9PPs6BDw7+f18e7m9PDx5PLw9OTy8RHl7+8Q4/Dx8+Xv"
    "8/Xm7BDy"
)


def _cmyk_fixture_pixels() -> np.ndarray:
    rng = np.random.default_rng(1234)
    return (
        np.cumsum(rng.integers(-3, 4, size=(16, 24, 4)), axis=1) % 230
        + 10
    ).astype(np.uint8)


def test_cmyk_roundtrip_both_transforms():
    px = _cmyk_fixture_pixels()
    for t in (0, 2):
        blob = jpeg.encode_baseline_jpeg(px, adobe_transform=t)
        d = jpeg.decode_baseline_jpeg(blob)
        assert d.get("colorspace") == "cmyk"
        assert d["pixels"].shape == (16, 24, 4)
        # transform 0 pays only DCT rounding; YCCK adds the color
        # transform's float round trip — both inside the derived
        # JPEG bound
        assert _maxdiff(d["pixels"], px) <= (1 if t == 0 else 3), t


def test_cmyk_jdk_cross_validation_pinned():
    blob = _b64.b64decode(_CMYK_FIXTURE_JPG)
    jdk = np.frombuffer(
        _b64.b64decode(_CMYK_JDK_RASTER), np.uint8
    ).reshape(16, 24, 4)
    # the JDK raster is PRE-color-transform (stored, Adobe-inverted)
    # samples; this decoder's TRUE-CMYK output must agree with the
    # JDK's implied truth within DCT rounding
    d = jpeg.decode_baseline_jpeg(blob)
    assert d.get("colorspace") == "cmyk"
    assert _maxdiff(d["pixels"], 255 - jdk.astype(int)) <= 1
    # and the frozen bytes still reproduce from the seeded source
    assert _maxdiff(d["pixels"], _cmyk_fixture_pixels()) <= 1


def test_cmyk_without_adobe_marker_is_not_inverted():
    px = _cmyk_fixture_pixels()
    blob = bytearray(jpeg.encode_baseline_jpeg(px, adobe_transform=0))
    # excise the APP14 segment (FFEE, 14-byte length)
    at = bytes(blob).find(b"\xff\xee")
    assert at > 0
    del blob[at : at + 16]
    d = jpeg.decode_baseline_jpeg(bytes(blob))
    # without the marker the stored (inverted) samples are taken
    # as-is, so the result is the complement of the true values
    assert _maxdiff(d["pixels"], 255 - px.astype(int)) <= 1


def test_adobe_transform0_rgb_direct():
    rng = np.random.default_rng(7)
    px = (
        np.cumsum(rng.integers(-2, 3, size=(12, 20, 3)), axis=0) % 220
        + 10
    ).astype(np.uint8)
    blob = jpeg.encode_baseline_jpeg(px, adobe_transform=0)
    assert b"Adobe" in blob and b"JFIF" not in blob
    d = jpeg.decode_baseline_jpeg(blob)
    assert d["pixels"].shape == (12, 20, 3)
    # no YCbCr transform in the loop: DCT rounding only
    assert _maxdiff(d["pixels"], px) <= 1


def test_transform1_on_4comp_frame_is_malformed():
    px = _cmyk_fixture_pixels()
    blob = bytearray(jpeg.encode_baseline_jpeg(px, adobe_transform=2))
    at = bytes(blob).find(b"Adobe") + 11
    blob[at] = 1  # ColorTransform: YCCK -> YCbCr (illegal on 4 comps)
    with pytest.raises(ValueError, match="transform 1"):
        jpeg.decode_baseline_jpeg(bytes(blob))


def test_cmyk_encoder_input_validation():
    px = _cmyk_fixture_pixels()
    with pytest.raises(ValueError, match="adobe_transform"):
        jpeg.encode_baseline_jpeg(px)  # 4 channels need a transform
    with pytest.raises(ValueError, match="444"):
        jpeg.encode_baseline_jpeg(
            px, adobe_transform=2, subsample="420"
        )
    with pytest.raises(ValueError, match="4-channel"):
        jpeg.encode_baseline_jpeg(
            np.zeros((8, 8, 3), np.uint8), adobe_transform=2
        )


def test_cmyk_media_features_driver_vs_worker(spark):
    # q63-style driver-vs-worker parity on planted CMYK JPEGs:
    # worker-side decode (media_features through the codec registry)
    # reproduces the driver-side feat_milli exactly
    rows, want = [], {}
    for i in range(4):
        rng = np.random.default_rng(100 + i)
        px = (
            np.cumsum(rng.integers(-3, 4, size=(12, 16, 4)), axis=1)
            % 230 + 10
        ).astype(np.uint8)
        blob = jpeg.encode_baseline_jpeg(
            px, adobe_transform=0 if i % 2 == 0 else 2
        )
        rows.append((i, blob))
        d = jpeg.decode_baseline_jpeg(blob)["pixels"]
        want[i] = (1000 * int(d.sum(dtype=np.int64))) // d.size
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = (
        mm.media_features(df, codec_setup=jpeg.register)
        .orderBy("doc_id")
        .collect()
    )
    assert [r["feat_milli"] for r in out] == [want[i] for i in range(4)]
    assert all(r["kind"] == "jpeg" for r in out)
