"""Perceptual image hashing + near-dup pairs (operators/imagehash).

Covers: dhash_bits against an independent Python reference, re-encode
invariance (same pixels through BMP vs PNG hash identically),
rescale robustness (2x upscale within a few bits), distinct images
far apart, hamming_pairs blocking (planted near/far pairs), and the
end-to-end Spark pipeline over mixed real formats."""

import numpy as np
import pandas as pd
import pytest

from timeseries_data_provider_spark.operators import imagehash as IH
from timeseries_data_provider_spark.operators import multimodal as mm


def _img(seed, w=32, h=24):
    rng = np.random.RandomState(seed)
    # smooth-ish gradient + noise so dhash bits are stable under resize
    x = np.arange(w)[None, :] * 3
    y = np.arange(h)[:, None] * 5
    base = (x + y) % 256
    return ((base + rng.randint(0, 8, (h, w))) % 256).astype(np.uint8)


def _ref_dhash(px):
    px = px.astype(np.int64)
    if px.ndim == 3:
        px = px.sum(axis=2) // px.shape[2]
    h, w = px.shape
    ys = (np.arange(8) * h) // 8
    xs = (np.arange(9) * w) // 9
    small = px[ys][:, xs]
    out = 0
    i = 0
    for yy in range(8):
        for xx in range(8):
            if small[yy, xx + 1] > small[yy, xx]:
                out |= 1 << i
            i += 1
    return out


def _ham(a, b):
    return bin(a ^ b).count("1")


def test_bits_match_reference():
    for seed in range(5):
        px = _img(seed)
        assert IH.dhash_bits(px) == _ref_dhash(px)


def test_reencode_invariance_and_rescale():
    px = _img(1)
    h_bmp = IH.dhash_bits(mm.decode_image(mm.encode_bmp(32, 24, px))["pixels"])
    h_png = IH.dhash_bits(mm.decode_image(mm.encode_png(32, 24, px))["pixels"])
    # BMP replicates gray to 3 channels; the channel mean cancels
    assert h_bmp == h_png
    # 2x nearest-neighbor upscale: hash within a few bits
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    assert _ham(IH.dhash_bits(px), IH.dhash_bits(up)) <= 4


def test_distinct_images_far_apart():
    a = IH.dhash_bits(_img(1))
    b = IH.dhash_bits(_img(2, w=40, h=40)[::-1])  # different structure
    rng = np.random.RandomState(99)
    c = IH.dhash_bits(rng.randint(0, 256, (24, 32)).astype(np.uint8))
    assert _ham(a, c) > 6 and _ham(b, c) > 6


def test_hamming_pairs_blocking(spark):
    # planted sketches: A~B at distance 2 (one quarter still equal),
    # C far from both
    base = 0x1234_5678_9ABC_DEF0
    near = base ^ 0b11  # 2 bits in quarter 0
    far = base ^ ((1 << 5) | (1 << 20) | (1 << 37) | (1 << 52))  # every quarter
    rows = []
    for i, hv in ((1, base), (2, near), (3, far)):
        rows.append(
            (i, hv - (1 << 64) if hv >> 63 else hv)
            + tuple((hv >> (16 * q)) & 0xFFFF for q in range(4))
        )
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "dhash", "q0", "q1", "q2", "q3"])
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in IH.hamming_pairs(df, max_distance=3).collect()
    }
    assert got == {(1, 2): 2}


def test_end_to_end_mixed_formats(spark):
    px = _img(7)
    blobs = [
        (1, mm.encode_bmp(32, 24, px)),
        (2, mm.encode_png(32, 24, px)),  # re-encode of the same image
        # structurally different image (pure noise, not the gradient
        # family — the gradient base is shared across _img seeds)
        (
            3,
            mm.encode_png(
                32,
                24,
                np.random.RandomState(42)
                .randint(0, 256, (24, 32))
                .astype(np.uint8),
            ),
        ),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(blobs, columns=["doc_id", "payload"])
    )
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in IH.image_neardup_pairs(media, max_distance=4).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == 0
    assert all(p == (1, 2) for p in pairs)


def test_metadata_only_payload_raises(spark):
    # truncated PNG decodes header-only (pixels None); hashing must
    # be loud, not silently skip
    png = mm.encode_png(8, 6, np.zeros((6, 8), np.uint8))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [png[:33]]})
    )
    with pytest.raises(Exception, match="cannot hash"):
        IH.image_dhash(df).collect()


def test_hash_size_guard():
    import pyspark.sql  # noqa: F401

    with pytest.raises(ValueError, match="hash_size=8"):
        IH.image_dhash(None, hash_size=4)


# ---------------------------------------------------------------------------
# pHash


def _ref_phash(px, hash_size=8, f=4):
    """Independent reference: scipy-free DCT-II from the definition
    (naive O(n^3) triple loop via explicit cosine sums)."""
    import math

    px = px.astype(np.int64)
    if px.ndim == 3:
        px = px.sum(axis=2) // px.shape[2]
    n = hash_size * f
    h, w = px.shape
    ys = (np.arange(n) * h) // n
    xs = (np.arange(n) * w) // n
    small = px[ys][:, xs].astype(np.float64)
    # rows then cols, orthonormal
    def dct1(v):
        N = len(v)
        out = np.empty(N)
        for k in range(N):
            s = sum(
                v[m] * math.cos(math.pi * (2 * m + 1) * k / (2 * N))
                for m in range(N)
            )
            out[k] = s * math.sqrt((1.0 if k else 0.5) * 2.0 / N)
        return out

    tmp = np.apply_along_axis(dct1, 1, small)
    d = np.apply_along_axis(dct1, 0, tmp)
    low = d[:hash_size, :hash_size]
    med = float(np.median(low))
    out = 0
    for i, v in enumerate(low.flatten()):
        if v > med:
            out |= 1 << i
    return out


def test_phash_matches_independent_dct():
    for seed in range(3):
        px = _img(seed)
        got = IH.phash_bits(px)
        ref = _ref_phash(px)
        # two float DCT formulations may disagree only where a
        # coefficient sits within rounding of the median
        assert _ham(got, ref) <= 1, seed


def test_phash_brightness_and_upscale_invariance():
    # mid-range image (40..167) so +10 clips nothing: a uniform shift
    # is then a pure DC move in DCT space
    px = (40 + _img(7, w=32, h=32).astype(np.int64) // 2).astype(np.uint8)
    base = IH.phash_bits(px)
    brighter = (px.astype(np.int64) + 10).astype(np.uint8)
    assert _ham(base, IH.phash_bits(brighter)) <= 1
    # exact 2x pixel doubling nearest-resizes back to the same grid
    up = px.repeat(2, axis=0).repeat(2, axis=1)
    assert IH.phash_bits(up) == base
    # a different image is far away
    other = _img(99, w=32, h=32)
    assert _ham(base, IH.phash_bits(other)) > 12


def test_phash_spark_pairs(spark):
    px = _img(3)
    near = np.clip(px.astype(np.int64) + 6, 0, 255).astype(np.uint8)
    far = _img(55)
    rows = [
        (1, mm.encode_bmp(32, 24, px)),
        (2, mm.encode_bmp(32, 24, near)),
        (3, mm.encode_bmp(32, 24, far)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    )
    sk = IH.image_phash(df).localCheckpoint(eager=True)
    got = {r["doc_id"]: r["phash"] for r in sk.collect()}
    assert len(got) == 3
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in IH.hamming_pairs(sk, max_distance=3).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs
    with pytest.raises(ValueError):
        IH.image_phash(df, hash_size=4)


def test_pixel_hash_exact_cross_format_dedup(spark):
    """image_pixel_hash: BMP and PNG encodings of the SAME pixels
    share a hash (byte dedup can't see this); one changed pixel
    breaks it (exactness — the perceptual tier would not)."""
    px = _img(5)
    tweaked = px.copy()
    tweaked[0, 0] = (int(tweaked[0, 0]) + 1) % 256
    rows = [
        (1, mm.encode_bmp(32, 24, px)),
        (2, mm.encode_png(32, 24, px)),
        (3, mm.encode_bmp(32, 24, tweaked)),
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "payload"])
    )
    got = {r["doc_id"]: r for r in IH.image_pixel_hash(df).collect()}
    assert got[1]["pixel_sha"] == got[2]["pixel_sha"]
    assert got[1]["pixel_sha"] != got[3]["pixel_sha"]
    assert got[1]["width"] == 32 and got[1]["height"] == 24
    # the dHash tier still calls the tweak a near-dup — the ladder:
    # exact tier separates, perceptual tier clusters
    d1 = IH.dhash_bits(mm.decode_image(rows[0][1])["pixels"])
    d3 = IH.dhash_bits(mm.decode_image(rows[2][1])["pixels"])
    assert _ham(d1, d3) <= 2


def test_null_payload_and_big_id_guard(spark):
    # review finding (r10): bytes(None) killed the task on one NULL
    # payload, and one NULL id coerced the pandas id column to
    # float64, silently mangling ids > 2^53 — the cdc_chunks hazard.
    # NULL rows now drop JVM-side before the Arrow pass.
    big = (1 << 62) + 12345  # far above float64's exact-int range
    png = mm.encode_png(8, 6, np.zeros((6, 8), np.uint8))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": pd.array([big, None, 7], dtype="Int64"),
                "payload": [png, png, None],
            }
        )
    )
    for fn in (IH.image_dhash, IH.image_phash, IH.image_pixel_hash):
        rows = fn(df).collect()
        assert [r["doc_id"] for r in rows] == [big]
