"""vp8_lite (r14): VP8 intra keyframe decode.

Layers:
1. REAL-stream certification (gated on the system libwebp): frames
   encoded by libwebp's own encoder must decode pixel-for-pixel
   identically to libwebp's own decoder (VP8 decoding is normatively
   bit-exact) — covers header parsing incl. segmentation, token
   probability updates, skip flags, and the in-loop filter at the
   levels real encoders pick.
2. Directed sweeps through the test-side minimal encoder
   (tests/vp8_enc.py — independent bool/token emission): every 16x16
   and 4x4 intra mode with residuals and neighbor contexts, all six
   coefficient categories, both loop-filter profiles across
   levels/sharpness — each stream decoded by BOTH libwebp and
   vp8_lite, outputs compared exactly.
3. Ungated analytic roundtrips + quarantine/guard behavior.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import media, vp8_lite as V
from tests import libwebp_ref as ref
from tests.vp8_enc import encode_keyframe, wrap_webp

_LIB = ref.load()
needs_libwebp = pytest.mark.skipif(
    _LIB is None, reason="system libwebp not available"
)

_rng = np.random.default_rng(11)


def _rand_levels(n=4, hi=8):
    lv = [0] * 16
    for _ in range(n):
        lv[int(_rng.integers(0, 16))] = int(_rng.integers(-hi, hi + 1))
    return lv


def _assert_match(payload: bytes):
    blob = wrap_webp(payload)
    ry, ru, rv = ref.decode_yuv(_LIB, blob)
    out = V.decode_frame(payload)
    for mine, theirs, name in (
        (out["y"], ry, "y"), (out["u"], ru, "u"), (out["v"], rv, "v")
    ):
        assert np.array_equal(mine, theirs), (
            name,
            int((mine.astype(int) != theirs.astype(int)).sum()),
            np.argwhere(mine != theirs)[:3].tolist(),
        )
    return out


@needs_libwebp
def test_libwebp_encoded_streams_match_exactly():
    """Real encoder output across content types and qualities —
    includes streams with segmentation enabled and filter_level up
    to 63 (q5), plus MB-fractional dimensions."""
    rng = np.random.default_rng(3)
    gx, gy = np.linspace(0, 255, 64), np.linspace(0, 255, 48)
    grad = (gy[:, None] + gx[None, :]) / 2
    yy, xx = np.mgrid[0:80, 0:96]
    photo = np.stack([
        128 + 60 * np.sin(yy / 9) * np.cos(xx / 13),
        120 + 50 * np.cos(yy / 17 + 1) * np.sin(xx / 7),
        100 + 80 * np.sin((xx + yy) / 21),
    ], axis=2).clip(0, 255).astype(np.uint8)
    cases = [
        (np.stack([grad, 255 - grad, grad * 0.5], axis=2).astype(np.uint8), 90),
        (np.stack([grad, 255 - grad, grad * 0.5], axis=2).astype(np.uint8), 40),
        (rng.integers(0, 256, (48, 48, 3)).astype(np.uint8), 75),
        (rng.integers(0, 256, (21, 37, 3)).astype(np.uint8), 60),
        (photo, 30),
        (photo, 5),     # q5: segmentation on, filter_level 63
        (photo, 95),
    ]
    for img, q in cases:
        payload = ref.vp8_payload(ref.encode_rgb(_LIB, img, q))
        _assert_match(payload)


@needs_libwebp
def test_all_16x16_modes_with_residuals():
    for ym in range(4):
        mbs = [
            {
                "ymode": (ym + i) % 4, "uv": i % 4,
                "y": [_rand_levels() for _ in range(16)],
                "u": [_rand_levels(2) for _ in range(4)],
                "v": [_rand_levels(2) for _ in range(4)],
                "y2": _rand_levels(3),
            }
            for i in range(9)
        ]
        _assert_match(encode_keyframe(48, 48, mbs))


@needs_libwebp
def test_all_4x4_submodes_with_residuals():
    """Each of the 10 B modes uniformly (pins every 4x4 predictor and
    the kf_bmode context table), then random submode mixes (pins the
    context-chained probability rows)."""
    for m in range(10):
        mbs = [
            {
                "ymode": V.B_PRED, "uv": int(_rng.integers(0, 4)),
                "sub": [m] * 16,
                "y": [_rand_levels() for _ in range(16)],
                "u": [_rand_levels(2) for _ in range(4)],
                "v": [_rand_levels(2) for _ in range(4)],
            }
            for _ in range(4)
        ]
        _assert_match(encode_keyframe(32, 32, mbs))
    for _ in range(4):
        mbs = []
        for i in range(9):
            if _rng.integers(0, 2):
                mbs.append({
                    "ymode": V.B_PRED, "uv": int(_rng.integers(0, 4)),
                    "sub": [int(_rng.integers(0, 10)) for _ in range(16)],
                    "y": [_rand_levels() for _ in range(16)],
                })
            else:
                mbs.append({
                    "ymode": int(_rng.integers(0, 4)),
                    "uv": int(_rng.integers(0, 4)),
                    "y": [_rand_levels() for _ in range(16)],
                    "y2": _rand_levels(),
                })
        _assert_match(encode_keyframe(48, 48, mbs))


@needs_libwebp
def test_coefficient_categories_and_zero_runs():
    y = [[0] * 16 for _ in range(16)]
    # literals 1-4, every extra-bit category, zero runs before values
    y[0] = [900, -70, 20, -12, 6, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    y[3] = [0, 1500, 0, 0, 0, 0, 0, 0, -300, 0, 0, 0, 0, 0, 0, 68]
    y[7] = [1, -1, 2, -2, 3, -3, 4, -4, 5, -5, 11, -19, 35, -67, 8, 9]
    _assert_match(encode_keyframe(
        16, 16, [{"ymode": V.DC_PRED, "uv": V.DC_PRED, "y": y}]
    ))


@needs_libwebp
def test_loop_filter_profiles_levels_sharpness():
    """Both filter profiles across the hev-threshold bands (15/40)
    and sharpness settings, on mode-mixed residual-heavy frames."""
    for simple in (0, 1):
        for level, sharp in [(10, 0), (20, 0), (45, 0), (63, 0),
                             (30, 3), (30, 7), (8, 5)]:
            mbs = []
            for i in range(9):
                if _rng.integers(0, 2):
                    mbs.append({
                        "ymode": V.B_PRED, "uv": int(_rng.integers(0, 4)),
                        "sub": [int(_rng.integers(0, 10))
                                for _ in range(16)],
                        "y": [_rand_levels(5, 40) for _ in range(16)],
                        "u": [_rand_levels(3, 40) for _ in range(4)],
                        "v": [_rand_levels(3, 40) for _ in range(4)],
                    })
                else:
                    mbs.append({
                        "ymode": int(_rng.integers(0, 4)),
                        "uv": int(_rng.integers(0, 4)),
                        "y": [_rand_levels(5, 40) for _ in range(16)],
                        "y2": _rand_levels(3, 30),
                        "u": [_rand_levels(3, 40) for _ in range(4)],
                        "v": [_rand_levels(3, 40) for _ in range(4)],
                    })
            _assert_match(encode_keyframe(
                48, 48, mbs, q_index=40, filter_level=level,
                filter_simple=simple, sharpness=sharp,
            ))


# ------------------------------------------------- ungated (no libwebp)


def test_flat_dc_roundtrip_analytic():
    """All-DC zero-residual keyframe reconstructs flat 128 (DC
    predictor with no neighbors); a Y2 DC level shifts luma by the
    dequantized iWHT amount."""
    out = V.decode_frame(encode_keyframe(
        32, 16, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}] * 2
    ))
    assert out["y"].shape == (16, 32)
    assert (out["y"] == 128).all() and (out["u"] == 128).all()
    # q_index 10 -> y2 dc quant = dc_q(10)*2 = 28; level 3 -> 84;
    # iwht spreads dc: (84+3)>>3 = 10 per subblock -> idct dc-only
    # residual (10+4)>>3 = 1
    out2 = V.decode_frame(encode_keyframe(
        16, 16,
        [{"ymode": V.DC_PRED, "uv": V.DC_PRED, "y2": [3] + [0] * 15}],
    ))
    assert (out2["y"] == 129).all()


def test_inter_frame_quarantined():
    payload = bytearray(encode_keyframe(
        16, 16, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}]
    ))
    payload[0] |= 1  # frame_type = inter
    with pytest.raises(ValueError, match="inter frame"):
        V.decode_frame(bytes(payload))


def test_guard_and_rejects():
    good = encode_keyframe(16, 16, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}])
    big = bytearray(good)
    big[6:10] = struct.pack("<HH", 2000, 1500)  # 3MP > 2MP guard
    with pytest.raises(ValueError, match="2MP decode guard"):
        V.decode_frame(bytes(big))
    bad_code = bytearray(good)
    bad_code[4] = 0x77
    with pytest.raises(ValueError, match="start code"):
        V.decode_frame(bytes(bad_code))
    with pytest.raises(ValueError, match="overruns|short"):
        V.decode_frame(good[:8])


def test_media_routes_lossy_webp_through_real_decode():
    payload = encode_keyframe(
        32, 32, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}] * 4
    )
    st = media.real_decode(wrap_webp(payload), "image/webp")
    assert (st["width"], st["height"], st["n_frames"]) == (32, 32, 1)
    assert st["mean_intensity"] == pytest.approx(128 / 255.0, abs=1e-12)


def test_spec_tables_structurally_sound():
    """The RFC constant tables: probabilities are valid (1..255 —
    zero would divide the bool-decoder range to nothing), quant
    lookups are monotone with the documented endpoints, zigzag and
    bands are the spec permutations."""
    from pythondataingestionprocess_spark.multimodal import _vp8_tables as t

    for table in (t.COEFF_PROBS_FLAT, t.KF_BMODE_PROBS_FLAT):
        assert min(table) >= 1 and max(table) <= 255
    assert min(t.COEFF_UPDATE_PROBS_FLAT) >= 1
    assert list(t.AC_QLOOKUP) == sorted(t.AC_QLOOKUP)
    assert t.AC_QLOOKUP[0] == 4 and t.AC_QLOOKUP[127] == 284
    assert list(t.DC_QLOOKUP) == sorted(t.DC_QLOOKUP)
    assert t.DC_QLOOKUP[0] == 4 and t.DC_QLOOKUP[127] == 157
    assert sorted(V.ZIGZAG) == list(range(16))
    assert len(V.COEFF_BANDS) == 16 and max(V.COEFF_BANDS) == 7


def test_bool_coder_roundtrip_fuzz():
    """Seeded fuzz over the RFC 7 boolean coder pair (test encoder vs
    engine decoder): random (prob, bit) sequences roundtrip exactly —
    statistically exercises the encoder's carry propagation (incl.
    0xFF cascades, where a naive bytearray increment would raise)."""
    import random

    from tests.vp8_enc import BoolEncoder

    rng = random.Random(5)
    for trial in range(300):
        seq = [(rng.randrange(1, 256), rng.randrange(2))
               for _ in range(rng.randrange(1, 400))]
        be = BoolEncoder()
        for p, b in seq:
            be.put(p, b)
        bd = V._Bool(be.flush())
        for p, b in seq:
            assert bd.get(p) == b, trial


def _anmf(payload_chunks: bytes, fw: int, fh: int) -> bytes:
    hdr = (
        (0).to_bytes(3, "little") + (0).to_bytes(3, "little")
        + (fw - 1).to_bytes(3, "little") + (fh - 1).to_bytes(3, "little")
        + (100).to_bytes(3, "little") + b"\x00"
    )
    body = hdr + payload_chunks
    chunk = b"ANMF" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return chunk


def test_vp8x_animation_first_frame_decodes():
    """r14: animated WebP stats come from the FIRST frame (the
    mp4/MJPEG convention): canvas dims from VP8X, n_frames = ANMF
    count, mean from frame 0's inner VP8 keyframe."""
    p0 = encode_keyframe(16, 16, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}])
    p1 = encode_keyframe(
        16, 16,
        [{"ymode": V.DC_PRED, "uv": V.DC_PRED, "y2": [3] + [0] * 15}],
    )
    def vp8_chunk(p):
        c = b"VP8 " + struct.pack("<I", len(p)) + p
        return c + (b"\x00" if len(p) & 1 else b"")
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes([0x02]) + bytes(3) + (
        (15).to_bytes(3, "little") + (15).to_bytes(3, "little")
    )
    frames = _anmf(vp8_chunk(p0), 16, 16) + _anmf(vp8_chunk(p1), 16, 16)
    blob = b"RIFF" + struct.pack(
        "<I", 4 + len(vp8x) + len(frames)
    ) + b"WEBP" + vp8x + frames
    st = media.real_decode(blob, "image/webp")
    assert (st["width"], st["height"], st["n_frames"]) == (16, 16, 2)
    # frame 0 is the flat-128 keyframe (frame 1's mean would be 129)
    assert st["mean_intensity"] == pytest.approx(128 / 255.0, abs=1e-12)


@needs_libwebp
def test_vp8x_alpha_still_decodes_via_inner_vp8():
    """libwebp's RGBA encoder emits VP8X + ALPH + VP8; the stats
    contract excludes alpha, so mean_intensity equals the inner VP8
    keyframe's Y mean — cross-checked against libwebp's own YUV
    decode of the same container."""
    import ctypes

    _LIB.WebPEncodeRGBA.restype = ctypes.c_size_t
    _LIB.WebPEncodeRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
    out = ctypes.POINTER(ctypes.c_uint8)()
    n = _LIB.WebPEncodeRGBA(
        img.tobytes(), 32, 24, 32 * 4, ctypes.c_float(75.0),
        ctypes.byref(out),
    )
    blob = bytes(bytearray(
        ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents
    ))
    _LIB.WebPFree(out)
    assert b"VP8X" in blob and b"ALPH" in blob
    ry, _, _ = ref.decode_yuv(_LIB, blob)
    st = media.real_decode(blob, "image/webp")
    assert (st["width"], st["height"], st["n_frames"]) == (32, 24, 1)
    exp = ry.astype(np.float64).mean() / 255.0
    assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12)


def test_vp8_in_mp4_first_frame_stats():
    """r14: 'vp08' sample entries route the first sample (a raw VP8
    keyframe) through vp8_lite; an inter first-sample quarantines to
    metadata-only, never a misread."""
    from tests.test_multimodal_headers import _mp4_mjpeg

    payload = encode_keyframe(
        16, 16,
        [{"ymode": V.DC_PRED, "uv": V.DC_PRED, "y2": [3] + [0] * 15}],
    )
    blob = _mp4_mjpeg(payload, codec=b"vp08", n_samples=4, w=16, h=16)
    st = media.real_decode(blob, "video/mp4")
    assert (st["width"], st["height"], st["n_frames"]) == (16, 16, 4)
    assert st["mean_intensity"] == pytest.approx(129 / 255.0, abs=1e-12)

    inter = bytearray(payload)
    inter[0] |= 1  # frame_type = inter -> metadata-only
    blob2 = _mp4_mjpeg(bytes(inter), codec=b"vp08", n_samples=2, w=16, h=16)
    st2 = media.real_decode(blob2, "video/mp4")
    assert st2["n_frames"] == 2 and st2["mean_intensity"] is None


def test_malformed_streams_quarantine_cleanly():
    """Corrupted/truncated/random payloads must either decode (VP8
    has no integrity check — zero padding decodes deterministically,
    as libwebp also accepts) or raise ValueError (the quarantine
    split) — never hang, IndexError, or overflow out of an Arrow
    batch."""
    rng = np.random.default_rng(7)
    good = encode_keyframe(
        32, 32, [{"ymode": V.DC_PRED, "uv": V.DC_PRED}] * 4
    )
    for trial in range(120):
        kind = trial % 4
        if kind == 0:
            blob = bytes(good[:10]) + bytes(
                rng.integers(0, 256, int(rng.integers(0, 80))).astype(np.uint8)
            )
        elif kind == 1:
            blob = bytes(good[:int(rng.integers(3, len(good)))])
        elif kind == 2:
            b = bytearray(good)
            for _ in range(int(rng.integers(1, 8))):
                b[int(rng.integers(0, len(b)))] = int(rng.integers(0, 256))
            blob = bytes(b)
        else:
            blob = bytes(
                rng.integers(0, 256, int(rng.integers(0, 60))).astype(np.uint8)
            )
        try:
            out = V.decode_frame(blob)
            assert out["y"].shape[0] == out["height"]
        except ValueError:
            pass
