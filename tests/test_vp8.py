"""Lossy VP8 keyframe codec (operators/vp8.py, r13) — validated
against the system libwebp, the INDEPENDENT reference implementation
(the javax.imageio posture): pinned goldens are libwebp-encoder
output decoded here with bit-exact YUV plane hashes, live tests
re-encode/re-decode through libwebp when the shared library is
present, and the in-repo spec-driven encoder's streams are decoded
by BOTH decoders and compared plane-for-plane. A transcription error
in the extracted RFC 6386 tables or any convention slip fails these
loudly."""

from __future__ import annotations

import base64
import hashlib
import sys
import os

import numpy as np
import pytest

from timeseries_data_provider_spark.operators import vp8 as V
from timeseries_data_provider_spark.operators import vp8_tables as T
from timeseries_data_provider_spark.operators import multimodal as mm
from timeseries_data_provider_spark.operators import vp8l
from timeseries_data_provider_spark.operators.vp8l import riff_chunks

sys.path.insert(
    0, os.path.join(os.path.dirname(__file__), "..", "tools")
)
import vp8_oracle as O  # noqa: E402

_HAVE_LIB = O.libwebp() is not None
needs_libwebp = pytest.mark.skipif(
    not _HAVE_LIB, reason="system libwebp not present"
)


def _vp8_chunk(blob: bytes) -> bytes:
    for tag, body in riff_chunks(blob, b"WEBP"):
        if tag == b"VP8 ":
            return body
    raise AssertionError("no VP8 chunk")


def _planes_sha(f: dict) -> str:
    return hashlib.sha256(
        f["y"].tobytes() + f["u"].tobytes() + f["v"].tobytes()
    ).hexdigest()


# ---------------------------------------------------------------------------
# pinned goldens: (libwebp-encoder WebP bytes, sha256 of this
# decoder's Y|U|V planes — verified bit-identical to libwebp's own
# WebPDecodeYUV at pin time). python_vp8x is a REAL-WORLD VP8X file
# (CPython's test corpus: Lib/test/test_email/data/python.webp, PSF
# test data) carrying a VP8 chunk plus an ALPH chunk.

_GOLDENS = {
    "waves_q40": (
    "UklGRkgBAABXRUJQVlA4IDwBAADwCQCdASpAADAAPuliqE2pJaQiNVQKASAdCWwAnTKE"
    "cte6eYJUP8TrCUweVSPBLFfoAdJ2EpKbfOV+ShDjUgdQD0tRhD4+tbnecdP+IF2Mzykw"
    "JCfDPCAAAP7eT6V+Zdc05SSNwnIj/da19sBAlkcqHPVW0fIvw4PEvG4CN9qoTXJL81nc"
    "5TPzFYJhpIo+rtaGt2LgeX5QW/BS9gz/HsSBPGN7iFQb9jxI6Hbumr6UcF9P+SELW0nW"
    "ma4dxNvhW3JaRw16HrJAMe2YzWzWDYyYVDUEPTJ8Isxd7TKeg+ZabXUFje6+G9/0mC8u"
    "Tr0uqiDxQuHvxwW8u54nUwf9FYTzfioIIq4qQgFrjTnBB7HFGvcUgj5suTNPMrfEljpG"
    "w+h6q4Ob8gdF63w7HaNC26jT+dBySHoOGjYL8AAA"
    , "76113f9cf190f5bd19174e3e68dee215515cb0e2924a63ec01f02535a0b227b4"),
    "noise_q15": (
    "UklGRlQCAABXRUJQVlA4IEgCAADwCQCdASorAB0ABgCIJbACdMsv3jPtjhyPPQBtgOej"
    "0znosfVR/2VoCNF+0zESytMCVBDUPFS9o8lUtLrOXNE8xVJIjovsDLf7bnq1YFwrr9ac"
    "AcF7TvAAAO/758SbqpcxpdrjcRZf6XSnrTjwG4HqgGZcvu3jcQUddErgovJ7ya6STcA+"
    "8MsdhlT0t223o2wuF1JnzFf71HLqva/GkuiSICv+ZWGtdRqy0PTx5/CXQr2QwwEd5X/z"
    "kljitq+EKW8EwEsjqcCaTkDTi+53vdUiNlgHf+6g/5pso+BS9VNjEyDJsa9SBknYcRu8"
    "euWiAIpAV4f/3ZKpB7yQrejNPqRo95H1R7j+LTIeSQCZW1GMSuoDIiBerQexmN5TQSHM"
    "WSqIL9XZbA6ZscYus/DSftPaG2R0xjgt9Md043/hfTg06DNmsV3CTT7ipgu+FqwugHcd"
    "qMA4kMl2e438vekdawmqnp5q6RBxX88IB2H54N/d2QVsOPSiSkxYk1fmGSCdkvk2YDdc"
    "njA0PfDe4ct5uufy4jvl4iFteU6Lrj9brVX2ewohCNsYea3pNT9xfE/MqVxsMQmmUEUM"
    "fPwR6+vH2l/vfrJNfr8GiTJet0RITJYP20j+8IrmvPM8U2cmPRkcFLhDGJXN0XZ5ogZU"
    "ftc4U8bWAAdzVxReMqrzdE9Ovi4qiarWDdRHwvhLCtajxhUpcE5/+vT64+tL7hjq5KKf"
    "9rDyOO8ZWk9JOItP3SGGkqoKNn6BnFAHRPmk5RoJ9zkujzDhO02jfoAAAA=="
    , "bca656aa252f8f2125849057e7eebd74b7a4aee9599c396df7a8f309ad76a895"),
    "python_vp8x": (
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ff"
    "KpmImP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2"
    "PLbtd/uvKa4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0p"
    "fk52CPuInrOR75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6W"
    "dYoYMQ+KqixQNPowgt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0"
    "JbACdDBPCIUMfAMdCCz96AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOu"
    "up+XhN9BojvaW+Tv+MvxvX/hr/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85"
    "VSB/lU/8Ofj/b9JrA+ifvIOYZm2x1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkY"
    "w73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
    , "7dd6b6a3a3ba7567cf996eaa40520547d4a010230cc385909bf7697662a2b5d3"),
}


def test_extracted_tables_shape_and_pin():
    # the generated module pins its own digest; recompute and check
    digest = hashlib.sha256(
        bytes(T.DC_QLOOKUP)
        + np.array(T.AC_QLOOKUP, "<u2").tobytes()
        + bytes(T.COEFF_UPDATE_PROBS)
        + bytes(T.KF_BMODE_PROBS)
        + bytes(T.COEFF_PROBS)
    ).hexdigest()
    assert digest == T.TABLES_SHA256
    assert len(T.DC_QLOOKUP) == 128 and T.DC_QLOOKUP[-1] == 157
    assert len(T.AC_QLOOKUP) == 128 and T.AC_QLOOKUP[-1] == 284
    assert len(T.COEFF_PROBS) == 4 * 8 * 3 * 11
    assert len(T.KF_BMODE_PROBS) == 10 * 10 * 9
    assert min(T.COEFF_PROBS) >= 1 and min(T.KF_BMODE_PROBS) >= 1


def test_pinned_goldens_decode_bit_exact():
    for name, (b64, sha) in _GOLDENS.items():
        blob = base64.b64decode(b64)
        f = V.decode_vp8_frame(_vp8_chunk(blob))
        assert _planes_sha(f) == sha, name
        # container route: RGB, or RGBA when an ALPH chunk rides along
        d = vp8l.decode_webp(blob)
        nch = 4 if name == "python_vp8x" else 3
        assert d["pixels"].shape == (f["height"], f["width"], nch), name


def test_decode_image_routing_returns_pixels():
    # snapshot the global codec registries: registering here must not
    # leak into tests that assert empty-registry behavior
    saved_img = dict(mm.IMAGE_CODECS)
    saved_aud = dict(mm.AUDIO_CODECS)
    try:
        mm.register_builtin_codecs()
        blob = base64.b64decode(_GOLDENS["python_vp8x"][0])
        d = mm.decode_image(blob)
        assert d["format"] == "webp"
        # the VP8X ALPH chunk decodes to a real alpha channel (r13)
        assert d["pixels"] is not None
        assert d["pixels"].shape == (16, 16, 4)
    finally:
        mm.IMAGE_CODECS.clear()
        mm.IMAGE_CODECS.update(saved_img)
        mm.AUDIO_CODECS.clear()
        mm.AUDIO_CODECS.update(saved_aud)


@needs_libwebp
def test_live_cross_validation_battery():
    rng = np.random.default_rng(7)
    ys, xs = np.mgrid[0:48, 0:64]
    cases = [
        np.stack(
            [(xs * 4) % 256, (ys * 5) % 256, ((xs + ys) * 3) % 256], 2
        ).astype(np.uint8),
        rng.integers(0, 256, (33, 47, 3)).astype(np.uint8),
    ]
    edge = np.zeros((40, 56, 3), np.uint8)
    edge[:, 28:] = 220
    edge[20:, :, 1] = 100
    cases.append(edge)
    for img in cases:
        for q in (10, 50, 90):
            blob = O.encode_rgb(img, q)
            f = V.decode_vp8_frame(_vp8_chunk(blob))
            ly, lu, lv = O.decode_yuv(blob)
            for k, ref in (("y", ly), ("u", lu), ("v", lv)):
                assert (f[k] == ref).all(), (img.shape, q, k)


def _rand_mb(rng, bpred=False, skip=False, seg=0, small=False):
    co = np.zeros((25, 16), int)
    if not skip:
        vals = (
            [1, -1, 2, 3, -4]
            if small
            else [1, -1, 2, 3, -4, 5, 8, 15, 30, 60, -100]
        )
        for blk in range(25):
            for pos in rng.integers(0, 16, size=rng.integers(0, 6)):
                co[blk, pos] = int(rng.choice(vals))
        if bpred:
            co[0] = 0
    mb = {
        "ymode": V.B_PRED if bpred else int(rng.integers(0, 4)),
        "uvmode": int(rng.integers(0, 4)),
        "skip": skip,
        "segment": seg,
        "coeffs": co,
    }
    if bpred:
        mb["submodes"] = [int(rng.integers(0, 10)) for _ in range(16)]
    return mb


def _synth_cases():
    rng = np.random.default_rng(3)
    seg = {
        "abs": True,
        "quants": [0, 20, 60, 100],
        "lf": [0, 20, 40, 63],
        "tree_probs": [100, 150, 200],
    }
    cat6 = np.zeros((25, 16), int)
    cat6[2, 1] = 500
    cat6[3, 2] = -400
    cat6[5, 1] = 77
    return [
        ("mixed", dict(
            width=48, height=32, q_index=4,
            mbs=[_rand_mb(rng, bpred=(i % 2 == 0)) for i in range(6)],
        )),
        ("simple_filter", dict(
            width=48, height=32, q_index=4, filter_level=25,
            filter_simple=True,
            mbs=[_rand_mb(rng) for _ in range(6)],
        )),
        ("simple_sharp", dict(
            width=48, height=32, q_index=4, filter_level=55,
            filter_simple=True, sharpness=3,
            mbs=[_rand_mb(rng) for _ in range(6)],
        )),
        ("normal_sharp", dict(
            width=48, height=32, q_index=4, filter_level=50,
            sharpness=5,
            mbs=[_rand_mb(rng, bpred=True) for _ in range(6)],
        )),
        ("parts8", dict(
            width=32, height=144, q_index=0, n_parts=8,
            filter_level=33,
            mbs=[_rand_mb(rng) for _ in range(18)],
        )),
        ("segments", dict(
            width=64, height=32, q_index=50, filter_level=30,
            segmentation=seg,
            mbs=[
                dict(_rand_mb(rng, small=True), segment=i % 4)
                for i in range(8)
            ],
        )),
        ("skips", dict(
            width=48, height=48, q_index=4, filter_level=20,
            mbs=[_rand_mb(rng, skip=(i % 3 == 0)) for i in range(9)],
        )),
        ("cat6", dict(
            width=16, height=16, q_index=0,
            mbs=[{
                "ymode": 0, "uvmode": 0, "skip": False,
                "segment": 0, "coeffs": cat6,
            }],
        )),
    ]


# this decoder's plane hashes for the synthetic battery, pinned at
# build time AFTER verifying each stream decodes bit-identically in
# libwebp (test_synthetic_streams_vs_libwebp re-checks live)
_SYNTH_SHA = {
    "mixed": "0bfbfe73111c7471950820d528cbe26b4a8d1bf8af8f9071fd675a1e45f764e0",
    "simple_filter": "d59981b9573bb37ed2414a051cd35d5a106174f36bd0992bce205bb13d9796d4",
    "simple_sharp": "836810e67b0a050ba9bb7d6d6d6efd084b7456e49e5c88626808570d36b234e0",
    "normal_sharp": "f05c6d088fd5cb5f8adc39da864664869e29d4f4e83bb0489fa2a7123cf4294b",
    "parts8": "ab497daff99cdc6689f6eb358f1efb038d41bfb2914be721ba70760e1f0e803c",
    "segments": "e3d91bee20ee2591447cdcc645589c49863b555c67bf2bb23f44877395a256c8",
    "skips": "a1e7aa8e93c033e3a970a282e74cd98986f62b6b3f511c888cedd987afaced95",
    "cat6": "34b803c08f17c9ffab87ff26756dfd9e11ee55d890f7eda0ae0b7a83eb55e454",
}


def test_synthetic_streams_self_consistent():
    for name, kw in _synth_cases():
        body = V.encode_vp8_frame(**kw)
        f = V.decode_vp8_frame(body)
        assert f["width"] == kw["width"], name
        want = _SYNTH_SHA[name]
        if want is not None:
            assert _planes_sha(f) == want, name


@needs_libwebp
def test_synthetic_streams_vs_libwebp():
    for name, kw in _synth_cases():
        body = V.encode_vp8_frame(**kw)
        blob = V.encode_webp(body)
        f = V.decode_vp8_frame(body)
        ly, lu, lv = O.decode_yuv(blob)
        for k, ref in (("y", ly), ("u", lu), ("v", lv)):
            assert (f[k] == ref).all(), (name, k)


def test_encoder_guards():
    mb = {"ymode": 0, "uvmode": 0, "skip": False, "segment": 0,
          "coeffs": np.zeros((25, 16), int)}
    co = np.zeros((25, 16), int)
    co[2, 1] = 2000  # x ac quant 12 (q8) = 24000 >> gamut
    with pytest.raises(ValueError, match="gamut"):
        V.encode_vp8_frame(16, 16, [dict(mb, coeffs=co)], q_index=8)
    co2 = np.zeros((25, 16), int)
    co2[1, 1] = 1
    with pytest.raises(ValueError, match="skipped MB"):
        V.encode_vp8_frame(
            16, 16, [dict(mb, skip=True, coeffs=co2)], q_index=8
        )
    with pytest.raises(ValueError, match="MB count"):
        V.encode_vp8_frame(32, 16, [mb], q_index=8)


def test_hostile_inputs_named_errors():
    mb = {"ymode": 0, "uvmode": 0, "skip": False, "segment": 0,
          "coeffs": np.zeros((25, 16), int)}
    good = V.encode_vp8_frame(16, 16, [mb], q_index=8)
    with pytest.raises(ValueError, match="truncated"):
        V.decode_vp8_frame(good[:8])
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8_frame(good[:3] + b"xyz" + good[6:])
    with pytest.raises(NotImplementedError, match="interframe"):
        V.decode_vp8_frame(bytes([good[0] | 1]) + good[1:])
    # dimension guard before any allocation
    huge = bytearray(good)
    huge[6:8] = (0x3FFF).to_bytes(2, "little")
    huge[8:10] = (0x3FFF).to_bytes(2, "little")
    with pytest.raises(ValueError, match="pixel guard"):
        V.decode_vp8_frame(bytes(huge))
    # truncated first partition
    tag = good[0] | (good[1] << 8) | (good[2] << 16)
    big = (tag & 0x1F) | ((1 << 19) - 1) << 5
    with pytest.raises(ValueError, match="first partition truncated"):
        V.decode_vp8_frame(big.to_bytes(3, "little") + good[3:])


@needs_libwebp
def test_vp8l_decoder_vs_libwebp_lossless_encoder():
    # closes a piece of VERDICT r12 item 2: the VP8L decoder was
    # validated only against this repo's own encoder; libwebp's
    # lossless encoder is an independent writer exercising transform
    # paths (predictor/color/subtract-green) ours never emits
    rng = np.random.default_rng(5)
    ys, xs = np.mgrid[0:40, 0:56]
    cases = [
        np.stack(
            [(xs * 7) % 256, (ys * 3) % 256, ((xs * ys)) % 256], 2
        ).astype(np.uint8),
        rng.integers(0, 256, (21, 17, 3)).astype(np.uint8),
        np.repeat(
            rng.integers(0, 8, (30, 30, 1)) * 32, 3, axis=2
        ).astype(np.uint8),  # palette-friendly
    ]
    for img in cases:
        blob = O.encode_lossless_rgb(img)
        d = vp8l.decode_webp(blob)
        px = d["pixels"]
        if px.ndim == 3 and px.shape[2] == 4:
            px = px[:, :, :3]
        assert (px == img).all(), img.shape


def test_synth_vp8_media_closed_form():
    # the q63 plant's oracle algebra: flat luma 128+(L+4)//8, chroma
    # 128, gray = (298*(y0-16)+128)//256 — checked without Spark by
    # decoding the same frames the synth builds
    for i in (16_000, 16_001, 16_007, 16_023, 16_049):
        lev = (23 * i + 11) % 64
        co = np.zeros((25, 16), np.int64)
        co[0, 0] = lev
        mb = {"ymode": V.DC_PRED, "uvmode": V.DC_PRED, "skip": False,
              "segment": 0, "coeffs": co}
        body = V.encode_vp8_frame(
            8 + i % 9, 6 + i % 7, [mb], q_index=0,
            filter_level=0 if i % 3 == 0 else 1 + i % 63,
            filter_simple=(i % 3 == 2),
            sharpness=i % 8 if i % 3 == 2 else 0,
            n_parts=2 if i % 2 else 1,
        )
        d = V.decode_vp8_chunk(body)
        y0 = 128 + (lev + 4) // 8
        gray = (298 * (y0 - 16) + 128) // 256
        assert (d["pixels"] == gray).all(), i
        if _HAVE_LIB:
            ly, lu, lv = O.decode_yuv(V.encode_webp(body))
            assert (ly == y0).all() and (lu == 128).all(), i


@needs_libwebp
def test_lossy_rgb_output_close_to_libwebp_rgb():
    # the RGB contract differs from libwebp's fancy upsampler by
    # design; bound the divergence so a channel-order or range slip
    # can't hide (chroma interpolation differences stay small)
    blob = base64.b64decode(_GOLDENS["waves_q40"][0])
    mine = vp8l.decode_webp(blob)["pixels"].astype(int)
    ref = O.decode_rgb(blob).astype(int)
    assert mine.shape == ref.shape
    assert np.abs(mine - ref).mean() < 8
    assert np.abs(mine - ref).max() < 128


@needs_libwebp
def test_alpha_plane_vs_libwebp_rgba():
    # lossy+ALPH files from libwebp's own encoder: the alpha plane
    # must match WebPDecodeRGBA exactly (lossless-coded alpha path,
    # incl. whatever prediction filter the encoder picked)
    import ctypes

    lib = O.libwebp()
    lib.WebPEncodeRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.c_void_p
    lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    rng = np.random.default_rng(17)
    ys, xs = np.mgrid[0:40, 0:56]
    alphas = [
        ((xs * 4 + ys * 3) % 256).astype(np.uint8),  # gradient
        rng.integers(0, 256, (40, 56)).astype(np.uint8),  # noise
        np.where((xs // 8 + ys // 8) % 2 == 0, 255, 40).astype(
            np.uint8
        ),  # blocks
    ]
    for aplane in alphas:
        rgba = np.dstack(
            [((xs * 7) % 256), ((ys * 5) % 256), ((xs + ys) % 256),
             aplane]
        ).astype(np.uint8)
        out = ctypes.c_void_p()
        n = lib.WebPEncodeRGBA(
            rgba.tobytes(), 56, 40, 56 * 4, 75.0, ctypes.byref(out)
        )
        assert n
        blob = ctypes.string_at(out, n)
        lib.WebPFree(out)
        mine = vp8l.decode_webp(blob)["pixels"]
        assert mine.shape == (40, 56, 4)
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            blob, len(blob), ctypes.byref(w), ctypes.byref(h)
        )
        ref = np.frombuffer(
            ctypes.string_at(p, 56 * 40 * 4), np.uint8
        ).reshape(40, 56, 4).copy()
        lib.WebPFree(ctypes.c_void_p(p))
        assert (mine[:, :, 3] == ref[:, :, 3]).all()


def test_alpha_plane_raw_and_filters():
    # hand-built ALPH chunks: raw storage plus each prediction filter
    rng = np.random.default_rng(23)
    plane = rng.integers(0, 256, (9, 13)).astype(np.int64)
    h, w = plane.shape
    # raw, no filter
    raw = bytes([0]) + plane.astype(np.uint8).tobytes()
    got = vp8l.decode_alpha_plane(raw, w, h)
    assert (got == plane).all()
    # horizontal filter: residual[y][x] = a - pred (mod 256)
    for filt in (1, 2, 3):
        res = plane.copy()
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                if x == 0 and y == 0:
                    continue
                if filt == 1:
                    p = plane[y, x - 1] if x else plane[y - 1, 0]
                elif filt == 2:
                    p = plane[y - 1, x] if y else plane[0, x - 1]
                else:
                    if y == 0:
                        p = plane[0, x - 1]
                    elif x == 0:
                        p = plane[y - 1, 0]
                    else:
                        p = min(255, max(0, int(
                            plane[y, x - 1] + plane[y - 1, x]
                            - plane[y - 1, x - 1]
                        )))
                res[y, x] = (plane[y, x] - p) & 0xFF
        blob = bytes([filt << 2]) + res.astype(np.uint8).tobytes()
        got = vp8l.decode_alpha_plane(blob, w, h)
        assert (got == plane).all(), filt
    with pytest.raises(ValueError, match="truncated"):
        vp8l.decode_alpha_plane(bytes([0]) + b"xy", w, h)
    with pytest.raises(NotImplementedError, match="compression"):
        vp8l.decode_alpha_plane(bytes([2]) + bytes(w * h), w, h)


def test_bool_coder_roundtrip_property():
    # hypothesis: arbitrary (prob, bit) sequences round-trip through
    # the RFC 6386 boolean encoder/decoder pair
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=254),
                st.integers(min_value=0, max_value=1),
            ),
            min_size=0,
            max_size=400,
        )
    )
    def check(seq):
        enc = V._BoolEnc()
        for prob, bit in seq:
            enc.put(prob, bit)
        data = enc.finish()
        dec = V._Bool(data)
        for prob, bit in seq:
            assert dec.bit(prob) == bit

    check()
