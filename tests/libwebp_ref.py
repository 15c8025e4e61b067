"""ctypes bridge to the SYSTEM libwebp — the independent reference
implementation the VP8 decoder tests compare against (and a real
lossy-WebP ENCODER for fixtures, which no test-side Python could
provide). Pure stdlib ctypes over a public BSD library already on
the host; everything is gated on its presence (tests skip cleanly
without it). Used by tests only — the engine's decode path stays
from-scratch."""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_PTR8 = ctypes.POINTER(ctypes.c_uint8)


def load():
    """The system libwebp, or None."""
    name = ctypes.util.find_library("webp")
    for cand in ([name] if name else []) + [
        "libwebp.so.7", "libwebp.7.dylib", "libwebp.so"
    ]:
        try:
            lib = ctypes.CDLL(cand)
            lib.WebPEncodeRGB  # encoder+decoder both required
            lib.WebPDecodeYUV
            return lib
        except (OSError, AttributeError):
            continue
    return None


def encode_rgb(lib, img: np.ndarray, quality: float) -> bytes:
    """Lossy WebP (= VP8 keyframe payload) from an (h, w, 3) uint8."""
    h, w, _ = img.shape
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(_PTR8),
    ]
    out = _PTR8()
    n = lib.WebPEncodeRGB(
        np.ascontiguousarray(img).tobytes(), w, h, w * 3,
        ctypes.c_float(quality), ctypes.byref(out),
    )
    if not n:
        raise RuntimeError("WebPEncodeRGB failed")
    blob = bytes(
        bytearray(ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents)
    )
    lib.WebPFree(out)
    return blob


def decode_yuv(lib, blob: bytes):
    """libwebp's own decode → (y, u, v) uint8 planes (pre-RGB, the
    bit-exact VP8 output)."""
    lib.WebPDecodeYUV.restype = _PTR8
    lib.WebPDecodeYUV.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(_PTR8), ctypes.POINTER(_PTR8),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    w = ctypes.c_int()
    h = ctypes.c_int()
    u = _PTR8()
    v = _PTR8()
    stride = ctypes.c_int()
    uv_stride = ctypes.c_int()
    y = lib.WebPDecodeYUV(
        blob, len(blob), ctypes.byref(w), ctypes.byref(h),
        ctypes.byref(u), ctypes.byref(v),
        ctypes.byref(stride), ctypes.byref(uv_stride),
    )
    if not y:
        raise RuntimeError("WebPDecodeYUV failed")
    W, H = w.value, h.value
    cw, ch = (W + 1) // 2, (H + 1) // 2
    yarr = np.ctypeslib.as_array(y, shape=(H, stride.value))[:, :W].copy()
    uarr = np.ctypeslib.as_array(u, shape=(ch, uv_stride.value))[:, :cw].copy()
    varr = np.ctypeslib.as_array(v, shape=(ch, uv_stride.value))[:, :cw].copy()
    lib.WebPFree(y)
    return yarr, uarr, varr


def vp8_payload(blob: bytes) -> bytes:
    """Extract the raw VP8 chunk payload from a simple lossy WebP."""
    import struct

    assert blob[:4] == b"RIFF" and blob[8:12] == b"WEBP"
    pos = 12
    while pos + 8 <= len(blob):
        tag = blob[pos:pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if tag == b"VP8 ":
            return blob[pos + 8:pos + 8 + size]
        pos += 8 + size + (size & 1)
    raise AssertionError("no VP8 chunk")
