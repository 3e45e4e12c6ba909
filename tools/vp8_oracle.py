"""ctypes bindings to the system libwebp — the INDEPENDENT encode/
decode oracle for tests/test_vp8.py and fixture generation (the
javax.imageio posture applied to WebP). Import-gated: everything
returns None/skips when the shared library is absent, so the pinned
goldens still validate the decoder without it.

Only the stable simple API is used (WebPEncodeRGB /
WebPEncodeLosslessRGB / WebPDecodeYUV / WebPDecodeRGB / WebPFree) —
no struct-layout guessing across library versions.
"""

from __future__ import annotations

import ctypes

import numpy as np

_LIB = None
_TRIED = False


def libwebp():
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        try:
            lib = ctypes.CDLL("libwebp.so.7")
        except OSError:
            return None
        lib.WebPEncodeRGB.restype = ctypes.c_size_t
        lib.WebPEncodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
        lib.WebPEncodeLosslessRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_void_p),
        ]
        lib.WebPDecodeYUV.restype = ctypes.c_void_p
        lib.WebPDecodeYUV.argtypes = (
            [ctypes.c_char_p, ctypes.c_size_t]
            + [ctypes.POINTER(ctypes.c_int)] * 2
            + [ctypes.POINTER(ctypes.c_void_p)] * 2
            + [ctypes.POINTER(ctypes.c_int)] * 2
        )
        lib.WebPDecodeRGB.restype = ctypes.c_void_p
        lib.WebPDecodeRGB.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.WebPFree.restype = None
        lib.WebPFree.argtypes = [ctypes.c_void_p]
        _LIB = lib
    return _LIB


def encode_rgb(rgb: np.ndarray, quality: float = 75.0) -> bytes:
    """Lossy-encode an (h, w, 3) uint8 array; returns WebP bytes."""
    lib = libwebp()
    h, w = rgb.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        float(quality), ctypes.byref(out),
    )
    if not n:
        raise RuntimeError("libwebp: encode failed")
    blob = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return blob


def encode_lossless_rgb(rgb: np.ndarray) -> bytes:
    lib = libwebp()
    h, w = rgb.shape[:2]
    out = ctypes.c_void_p()
    n = lib.WebPEncodeLosslessRGB(
        np.ascontiguousarray(rgb).tobytes(), w, h, w * 3,
        ctypes.byref(out),
    )
    if not n:
        raise RuntimeError("libwebp: lossless encode failed")
    blob = ctypes.string_at(out, n)
    lib.WebPFree(out)
    return blob


def decode_yuv(blob: bytes):
    """Decode to (y, u, v) uint8 planes via libwebp."""
    lib = libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    up = ctypes.c_void_p()
    vp = ctypes.c_void_p()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    yp = lib.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(up), ctypes.byref(vp),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not yp:
        raise RuntimeError("libwebp: YUV decode failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    y = np.frombuffer(
        ctypes.string_at(yp, stride.value * H), np.uint8
    ).reshape(H, stride.value)[:, :W].copy()
    u = np.frombuffer(
        ctypes.string_at(up.value, uv_stride.value * ch), np.uint8
    ).reshape(ch, uv_stride.value)[:, :cw].copy()
    v = np.frombuffer(
        ctypes.string_at(vp.value, uv_stride.value * ch), np.uint8
    ).reshape(ch, uv_stride.value)[:, :cw].copy()
    lib.WebPFree(ctypes.c_void_p(yp))
    return y, u, v


def decode_rgb(blob: bytes):
    lib = libwebp()
    w = ctypes.c_int()
    h = ctypes.c_int()
    p = lib.WebPDecodeRGB(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h)
    )
    if not p:
        raise RuntimeError("libwebp: RGB decode failed")
    rgb = np.frombuffer(
        ctypes.string_at(p, w.value * h.value * 3), np.uint8
    ).reshape(h.value, w.value, 3).copy()
    lib.WebPFree(ctypes.c_void_p(p))
    return rgb
