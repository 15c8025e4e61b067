"""qoi_lite (r13): QOI decode. Layers: hand-built op vectors (every
opcode with hand-computed pixel outcomes), a from-scratch greedy
test-side encoder (independent per-op arithmetic) + seeded roundtrip
fuzz, and router/reject checks."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import media, qoi_lite

_END = b"\x00" * 7 + b"\x01"


def _hdr(w, h, channels=4):
    return b"qoif" + struct.pack(">IIBB", w, h, channels, 0)


def qoi_encode(px: np.ndarray, channels=4) -> bytes:
    """Greedy test-side encoder: RUN > INDEX > DIFF > LUMA > literal,
    with its own independent hash/delta arithmetic."""
    h, w, _ = px.shape
    out = bytearray(_hdr(w, h, channels))
    index = [(0, 0, 0, 0)] * 64
    prev = (0, 0, 0, 255)
    flat = [tuple(int(v) for v in p) for p in px.reshape(-1, 4)]
    i = 0
    while i < len(flat):
        cur = flat[i]
        if cur == prev:
            run = 1
            while i + run < len(flat) and flat[i + run] == cur and run < 62:
                run += 1
            out.append(0xC0 | (run - 1))
            i += run
            continue
        r, g, b, a = cur
        key = (r * 3 + g * 5 + b * 7 + a * 11) % 64
        if index[key] == cur:
            out.append(key)
        else:
            pr, pg, pb, pa = prev
            dr = (r - pr + 128) % 256 - 128
            dg = (g - pg + 128) % 256 - 128
            db = (b - pb + 128) % 256 - 128
            if a == pa and -2 <= dr <= 1 and -2 <= dg <= 1 and -2 <= db <= 1:
                out.append(0x40 | ((dr + 2) << 4) | ((dg + 2) << 2) | (db + 2))
            elif (
                a == pa and -32 <= dg <= 31
                and -8 <= dr - dg <= 7 and -8 <= db - dg <= 7
            ):
                out.append(0x80 | (dg + 32))
                out.append(((dr - dg + 8) << 4) | (db - dg + 8))
            elif a == pa:
                out += bytes([0xFE, r, g, b])
            else:
                out += bytes([0xFF, r, g, b, a])
        index[key] = cur
        prev = cur
        i += 1
    return bytes(out) + _END


def test_opcode_hand_vectors():
    """Every opcode with hand-computed outcomes: start state is
    (0,0,0,255); RGB literal, DIFF (+1,-2,+1), LUMA (dg=10, dr-dg=-3,
    db-dg=5), RUN of 3, INDEX back to the literal."""
    ops = bytearray()
    ops += bytes([0xFE, 100, 50, 25])          # px0 = (100,50,25,255)
    ops.append(0x40 | (3 << 4) | (0 << 2) | 3)  # px1 = (101,48,26)
    ops.append(0x80 | (10 + 32))                # px2: dg=10
    ops.append(((-3 + 8) << 4) | (5 + 8))       # dr=7, db=15
    ops.append(0xC0 | 2)                        # px3-5: run of 3
    key = (100 * 3 + 50 * 5 + 25 * 7 + 255 * 11) % 64
    ops.append(key)                             # px6 = px0 via INDEX
    blob = _hdr(7, 1) + bytes(ops) + _END
    st = qoi_lite.decode(blob)
    px2 = (101 + 7, 48 + 10, 26 + 15)
    exp_px = [
        (100, 50, 25), (101, 48, 26), px2, px2, px2, px2, (100, 50, 25),
    ]
    exp = np.mean([v for p in exp_px for v in p]) / 255.0
    assert st["width"] == 7 and st["height"] == 1
    assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12)


def test_roundtrip_fuzz():
    rng = np.random.default_rng(21)
    for trial in range(60):
        h = int(rng.integers(1, 12))
        w = int(rng.integers(1, 16))
        if trial % 3 == 0:  # few colors → runs + index ops
            pool = rng.integers(0, 256, (5, 4)).astype(np.uint8)
            pool[:, 3] = 255
            img = pool[rng.integers(0, 5, (h, w))]
        elif trial % 3 == 1:  # smooth gradient → diff/luma ops
            base = rng.integers(0, 200)
            ramp = (base + np.arange(h * w) % 40).astype(np.uint8)
            img = np.stack([ramp, ramp, ramp, np.full(h * w, 255, np.uint8)],
                           axis=1).reshape(h, w, 4)
        else:  # random with alpha variation → literals
            img = rng.integers(0, 256, (h, w, 4)).astype(np.uint8)
        blob = qoi_encode(img)
        st = qoi_lite.decode(blob)
        exp = img[:, :, :3].astype(np.float64).mean() / 255.0
        assert (st["width"], st["height"]) == (w, h), trial
        assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12), trial


def test_rejects_and_router():
    with pytest.raises(ValueError, match="magic"):
        qoi_lite.decode(b"qoix" + bytes(30))
    good = qoi_encode(np.full((2, 2, 4), 255, dtype=np.uint8))
    rng = np.random.default_rng(3)
    long_blob = qoi_encode(
        rng.integers(0, 256, (6, 6, 4)).astype(np.uint8)
    )
    with pytest.raises(ValueError, match="truncated|end marker"):
        qoi_lite.decode(long_blob[:-9])
    bad_run = _hdr(2, 1) + bytes([0xC0 | 10]) + _END  # run 11 > 2 px
    with pytest.raises(ValueError, match="overflows"):
        qoi_lite.decode(bad_run)
    # r14 ADVICE: an op whose OPERANDS straddle the end marker must
    # raise, not decode marker zero bytes as pixel data
    for straddle_op in (b"\xFE", b"\xFF", bytes([0x80 | 32])):
        with pytest.raises(ValueError, match="truncated"):
            qoi_lite.decode(_hdr(1, 1) + straddle_op + _END)
    st = media.real_decode(good, "image/qoi")
    assert (st["width"], st["height"], st["n_frames"]) == (2, 2, 1)
    assert st["mean_intensity"] == pytest.approx(1.0)
