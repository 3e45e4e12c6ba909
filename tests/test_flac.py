"""FLAC codec (operators/flac).

Covers: exact roundtrips across subframe types / stereo modes /
depths / multi-frame streams (+ hypothesis property), hand-built
streams for the decoder paths the encoder never emits (LPC, 5-bit
rice method, raw-bits escape, partition order > 0, wasted bits),
CRC-8/CRC-16 corruption detection, hostile inputs, every-offset
truncation fuzz, and registry dispatch through decode_audio +
audio_features end-to-end in Spark."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from timeseries_data_provider_spark.operators import flac, multimodal


def _roundtrip(s, **kw):
    s = np.asarray(s, dtype=np.int64)
    blob = flac.encode_flac(s, **kw)
    d = flac.decode_flac(blob)
    assert np.array_equal(np.asarray(d["samples"], dtype=np.int64), s)
    return blob, d


@pytest.mark.parametrize("sub", [None, "constant", "verbatim", "fixed0", "fixed1", "fixed2"])
def test_subframe_modes(sub):
    rng = np.random.RandomState(1)
    s = (
        np.full(400, 77)
        if sub == "constant"
        else rng.randint(-800, 800, 400)
    )
    _roundtrip(s, subframe=sub)


@pytest.mark.parametrize(
    "mode", ["independent", "left_side", "right_side", "mid_side"]
)
def test_stereo_modes(mode):
    rng = np.random.RandomState(2)
    blob, d = _roundtrip(
        rng.randint(-1000, 1000, 600), channels=2, stereo_mode=mode
    )
    assert d["channels"] == 2


@pytest.mark.parametrize("bits,dt", [(8, np.int16), (16, np.int16), (24, np.int32)])
def test_depths(bits, dt):
    rng = np.random.RandomState(3)
    lim = 1 << (bits - 1)
    _, d = _roundtrip(rng.randint(-lim, lim, 256), bits=bits)
    assert d["samples"].dtype == dt and d["bits"] == bits


def test_multiframe_and_partial_final():
    rng = np.random.RandomState(4)
    blob, d = _roundtrip(rng.randint(-500, 500, 2500), blocksize=512)
    assert d["sample_rate"] == 8000


@settings(max_examples=25, deadline=None)
@given(
    st.lists(st.integers(-32000, 32000), min_size=1, max_size=300),
    st.sampled_from([1, 2]),
)
def test_roundtrip_property(vals, channels):
    if len(vals) % channels:
        vals.append(0)
    _roundtrip(vals, channels=channels, blocksize=64)


def _handmade_stream(build_subframe, blocksize, samples, bps=16):
    """Minimal one-frame stream whose subframe bits come from
    ``build_subframe(writer)`` — drives decoder paths the encoder
    never emits."""
    out = bytearray(b"fLaC")
    si = flac._BitW()
    si.write(blocksize, 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(8000, 20)
    si.write(0, 3)
    si.write(bps - 1, 5)
    si.write(len(samples), 36)
    si.out += b"\x00" * 16
    out += bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si.out)
    w = flac._BitW()
    w.write(0x3FFE, 14)
    w.write(0, 2)
    w.write(7, 4)
    w.write(0, 4)
    w.write(0, 4)
    w.write(4, 3)
    w.write(0, 1)
    w.write(0, 8)  # frame 0
    w.write(blocksize - 1, 16)
    w.write(flac._crc8(bytes(w.out)), 8)
    build_subframe(w)
    w.align()
    body = bytes(w.out)
    out += body + struct.pack(">H", flac._crc16(body))
    return bytes(out), samples


def test_lpc_subframe_hand_built():
    # order 2, precision 4, shift 1, coefs [3, -1]:
    # s[i] = r[i] + (3*s[i-1] - s[i-2]) >> 1
    warm = [10, 14]
    res = [3, -2, 5, 0, -7, 1]
    s = list(warm)
    for r in res:
        s.append(r + ((3 * s[-1] - 1 * s[-2]) >> 1))

    def build(w):
        w.write(0, 1)
        w.write(32 + 1, 6)  # LPC order 2
        w.write(0, 1)
        for v in warm:
            w.write(v, 16)
        w.write(3, 4)  # precision-1 = 3 -> 4 bits
        w.write(1, 5)  # shift
        w.write(3, 4)  # coef 3
        w.write(-1, 4)  # coef -1
        w.write(0, 2)  # 4-bit rice
        w.write(0, 4)  # porder 0
        w.write(2, 4)  # k = 2
        for r in res:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            w.unary(u >> 2)
            w.write(u, 2)

    blob, expect = _handmade_stream(build, len(s), s)
    d = flac.decode_flac(blob)
    assert list(d["samples"]) == expect


def test_rice2_escape_and_partitions_hand_built():
    # verbatim warmup 0, fixed order 0, 5-bit rice method, partition
    # order 1 (two partitions): first uses k=1, second the raw escape
    vals = [1, -2, 3, -4, 1000, -2000, 3000, -4000]

    def build(w):
        w.write(0, 1)
        w.write(8, 6)  # FIXED order 0
        w.write(0, 1)
        w.write(1, 2)  # method 1: 5-bit params
        w.write(1, 4)  # partition order 1
        w.write(1, 5)  # k=1 for partition 0
        for r in vals[:4]:
            u = (r << 1) if r >= 0 else ((-r) << 1) - 1
            w.unary(u >> 1)
            w.write(u, 1)
        w.write(31, 5)  # escape
        w.write(14, 5)  # raw 14-bit residuals
        for r in vals[4:]:
            w.write(r, 14)

    blob, expect = _handmade_stream(build, len(vals), vals)
    assert list(flac.decode_flac(blob)["samples"]) == expect


def test_wasted_bits_hand_built():
    # constant subframe with 2 wasted bits: stored value is s >> 2
    def build(w):
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(1, 1)  # has wasted bits
        w.write(1, 2)  # unary(1) = "01" -> wasted = 2
        w.write(25, 14)  # 16 - 2 effective bits

    blob, _ = _handmade_stream(build, 4, [100, 100, 100, 100])
    assert list(flac.decode_flac(blob)["samples"]) == [100] * 4


def test_crc_corruption_detected():
    blob, _ = _roundtrip(np.arange(100) % 50)
    # flip a bit inside the last frame body
    bad = bytearray(blob)
    bad[-5] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        flac.decode_flac(bytes(bad))
    # corrupt the frame header (after CRC-8 was computed over it)
    hdr_pos = 4 + 4 + 34  # first frame start
    bad = bytearray(blob)
    bad[hdr_pos + 2] ^= 0x01
    with pytest.raises(ValueError):
        flac.decode_flac(bytes(bad))


def test_hostile_inputs():
    with pytest.raises(ValueError, match="magic"):
        flac.decode_flac(b"nope")
    with pytest.raises(ValueError, match="truncated metadata"):
        flac.decode_flac(b"fLaC\x80\x00\x00\x22" + b"\x00" * 10)
    # STREAMINFO declaring 32-bit samples -> named gap
    si = flac._BitW()
    si.write(16, 16); si.write(16, 16); si.write(0, 24); si.write(0, 24)
    si.write(8000, 20); si.write(0, 3); si.write(31, 5); si.write(0, 36)
    si.out += b"\x00" * 16
    blob = b"fLaC" + bytes([0x80]) + struct.pack(">I", 34)[1:] + bytes(si.out)
    with pytest.raises(NotImplementedError, match="32-bit"):
        flac.decode_flac(blob)


def test_truncation_fuzz():
    blob, _ = _roundtrip(np.arange(200) % 97, blocksize=64)
    for cut in range(len(blob)):
        with pytest.raises((ValueError, NotImplementedError)):
            flac.decode_flac(blob[:cut])


def test_registry_dispatch_and_features(spark):
    import pandas as pd

    rng = np.random.RandomState(9)
    s = rng.randint(-1000, 1000, 256)
    blob = flac.encode_flac(s, sample_rate=8000)
    try:
        flac.register()
        d = multimodal.decode_audio(blob)
        assert d["format"] == "flac"
        assert np.array_equal(np.asarray(d["samples"], np.int64), s)
        # end-to-end through audio_features in Spark workers
        df = spark.createDataFrame(
            pd.DataFrame(
                {"doc_id": [1], "kind": ["flac"], "payload": [blob],
                 "byte_len": [len(blob)]}
            )
        )
        row = multimodal.audio_features(
            df, codec_setup=flac.register
        ).collect()[0]
        assert row["peak_abs"] == int(np.abs(s).max())
    finally:
        # driver-side registration must not leak into other tests'
        # unknown-format assertions (the jpeg/vp8l cleanup rule)
        multimodal.AUDIO_CODECS.pop(b"fLaC", None)
