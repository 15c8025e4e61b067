"""Minimal test-side VP8 intra keyframe ENCODER (RFC 6386).

Independent of the engine decoder: its own bool encoder and token
emission, sharing only the normative spec tables. It exists so the
system libwebp can act as ground truth in BOTH directions: streams
built here decode through libwebp AND through vp8_lite, and the two
pixel outputs must agree exactly — any transcription error in trees,
probabilities, scan order, dequant, or prediction desynchronizes one
side and fails loudly.

Scope: keyframes, no segmentation, selectable loop-filter level,
single token partition, no probability updates, mb_no_skip off (every
MB codes tokens). Modes and raw quantization LEVELS are caller-chosen
per MB/subblock.
"""

from __future__ import annotations

import struct

from pythondataingestionprocess_spark.multimodal.vp8_lite import (
    BMODE_TREE,
    B_PRED,
    COEFF_BANDS,
    COEFF_TREE,
    KF_UV_MODE_PROB,
    KF_YMODE_PROB,
    KF_YMODE_TREE,
    UV_MODE_TREE,
    ZIGZAG,
    _CAT_PROBS,
    _COEFF_PROBS_DEFAULT,
    _IMPLIED_B,
    _KF_BMODE,
    B_DC,
)


class BoolEncoder:
    """RFC 6386 section 7 boolean encoder."""

    def __init__(self):
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self):
        i = len(self.out) - 1
        while i >= 0 and self.out[i] == 0xFF:
            self.out[i] = 0  # bytearray[i] += 1 would RAISE on 0xFF
            i -= 1
        if i < 0:  # cannot happen on valid prob sequences — fail
            # loudly instead of wrapping to out[-1]
            raise AssertionError("bool-encoder carry past start")
        self.out[i] += 1

    def put(self, prob: int, value: int):
        split = 1 + (((self.range - 1) * prob) >> 8)
        if value:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, n: int, v: int):
        for shift in range(n - 1, -1, -1):
            self.put(128, (v >> shift) & 1)

    def tree(self, tree: tuple, probs, symbol: int, start: int = 0):
        """Emit the bits that walk `tree` from `start` to leaf
        -symbol."""
        # find path by DFS
        path = []

        def dfs(i, acc):
            for bit in (0, 1):
                t = tree[i + bit]
                if t == -symbol and (t <= 0):
                    path.append(acc + [(i, bit)])
                elif t > 0:
                    dfs(t, acc + [(i, bit)])

        dfs(start, [])
        assert path, (symbol, start)
        for i, bit in path[0]:
            self.put(probs[i >> 1], bit)

    def flush(self) -> bytes:
        c = self.bit_count
        v = self.bottom
        if v & (1 << (32 - c)):
            self._carry()
        v = (v << (c & 7)) & 0xFFFFFFFF
        c >>= 3
        while c > 0:
            v = (v << 8) & 0xFFFFFFFF
            c -= 1
        for _ in range(4):
            self.out.append((v >> 24) & 0xFF)
            v = (v << 8) & 0xFFFFFFFF
        return bytes(self.out)


def _encode_block(be: BoolEncoder, probs, ctx: int, first: int,
                  levels) -> int:
    """Token-encode one 4x4 block of quantization LEVELS (raster
    order; zigzag applied here). Returns block nz flag."""
    zz = [levels[ZIGZAG[c]] for c in range(16)]
    # find last nonzero in scan order
    last = -1
    for c in range(first, 16):
        if zz[c]:
            last = c
    c = first
    prev_zero = False
    while True:
        band_probs = probs[COEFF_BANDS[c]][ctx]
        start = 2 if prev_zero else 0
        if c > last:
            # EOB (only legal when prev token wasn't ZERO — callers
            # must not ask for a trailing zero before EOB)
            assert not prev_zero
            be.tree(COEFF_TREE, band_probs, 0)
            break
        v = zz[c]
        a = abs(v)
        if a == 0:
            be.tree(COEFF_TREE, band_probs, 1, start=start)
            prev_zero = True
            ctx = 0
            c += 1
            continue
        prev_zero = False
        if a <= 4:
            be.tree(COEFF_TREE, band_probs, a + 1, start=start)
        else:
            for tok, (base, cat_probs) in enumerate(_CAT_PROBS):
                nbits = len(cat_probs)
                if a < base + (1 << nbits):
                    break
            else:
                raise ValueError(f"coefficient level {a} too large")
            be.tree(COEFF_TREE, band_probs, tok + 6, start=start)
            extra = a - base
            for k, pb in enumerate(cat_probs):
                be.put(pb, (extra >> (nbits - 1 - k)) & 1)
        be.put(128, 1 if v < 0 else 0)
        ctx = 1 if a == 1 else 2
        c += 1
        if c == 16:
            break
    return 1 if last >= first else 0


def encode_keyframe(
    width: int,
    height: int,
    mb_modes,
    q_index: int = 10,
    filter_level: int = 0,
    filter_simple: int = 0,
    sharpness: int = 0,
) -> bytes:
    """Build a VP8 keyframe payload.

    mb_modes: list (raster) of dicts per MB:
      {"ymode": int, "uv": int, "sub": [16 bmodes] (if ymode==B_PRED),
       "y2": [16 levels], "y": [16][16 levels], "u": [4][16], "v": [4][16]}
    Missing coefficient arrays mean all-zero. Levels are RAW
    quantization levels (pre-dequant integers).
    """
    mb_w = (width + 15) >> 4
    mb_h = (height + 15) >> 4
    assert len(mb_modes) == mb_w * mb_h

    # ---- first partition: header + modes
    be = BoolEncoder()
    be.put(128, 0)  # color_space
    be.put(128, 0)  # clamping
    be.put(128, 0)  # segmentation_enabled
    be.put(128, filter_simple)
    be.literal(6, filter_level)
    be.literal(3, sharpness)
    be.put(128, 0)  # lf_delta_enabled
    be.literal(2, 0)  # log2(partitions) = 0 -> 1 partition
    be.literal(7, q_index)
    for _ in range(5):  # y_dc, y2_dc, y2_ac, uv_dc, uv_ac deltas
        be.put(128, 0)
    be.put(128, 0)  # refresh_entropy (keyframe)
    # token prob updates: all "keep default"
    from pythondataingestionprocess_spark.multimodal.vp8_lite import (
        _COEFF_UPDATE,
    )
    for p in range(4):
        for b in range(8):
            for ctx in range(3):
                for t in range(11):
                    be.put(_COEFF_UPDATE[p][b][ctx][t], 0)
    be.put(128, 0)  # mb_no_coeff_skip off: every MB codes tokens

    # per-MB modes (keyframe trees)
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]
    for mby in range(mb_h):
        left_sub = [B_DC] * 4
        for mbx in range(mb_w):
            mb = mb_modes[mby * mb_w + mbx]
            ymode = mb["ymode"]
            be.tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                subs = mb["sub"]
                assert len(subs) == 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = above_sub[mbx][c] if r == 0 else subs[sb - 4]
                    l = left_sub[r] if c == 0 else subs[sb - 1]
                    be.tree(BMODE_TREE, _KF_BMODE[a][l], subs[sb])
            else:
                subs = [_IMPLIED_B[ymode]] * 16
            above_sub[mbx] = subs[12:16]
            left_sub = [subs[3], subs[7], subs[11], subs[15]]
            be.tree(UV_MODE_TREE, KF_UV_MODE_PROB, mb["uv"])
    part1 = be.flush()

    # ---- token partition
    te = BoolEncoder()
    probs = _COEFF_PROBS_DEFAULT
    above_nz_y = [[0] * 4 for _ in range(mb_w)]
    above_nz_u = [[0] * 2 for _ in range(mb_w)]
    above_nz_v = [[0] * 2 for _ in range(mb_w)]
    above_nz_y2 = [0] * mb_w
    zeros = [0] * 16
    for mby in range(mb_h):
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        for mbx in range(mb_w):
            mb = mb_modes[mby * mb_w + mbx]
            has_y2 = mb["ymode"] != B_PRED
            if has_y2:
                nz = _encode_block(
                    te, probs[1], above_nz_y2[mbx] + left_nz_y2, 0,
                    mb.get("y2", zeros),
                )
                above_nz_y2[mbx] = nz
                left_nz_y2 = nz
                first, pp = 1, probs[0]
            else:
                first, pp = 0, probs[3]
            y_levels = mb.get("y") or [zeros] * 16
            nz_grid = [0] * 16
            for sb in range(16):
                r, c = sb >> 2, sb & 3
                a_nz = above_nz_y[mbx][c] if r == 0 else nz_grid[sb - 4]
                l_nz = left_nz_y[r] if c == 0 else nz_grid[sb - 1]
                nz_grid[sb] = _encode_block(
                    te, pp, a_nz + l_nz, first, y_levels[sb]
                )
            above_nz_y[mbx] = nz_grid[12:16]
            left_nz_y = [nz_grid[3], nz_grid[7], nz_grid[11], nz_grid[15]]
            for key, above_nz, left_nz in (
                ("u", above_nz_u, left_nz_u), ("v", above_nz_v, left_nz_v)
            ):
                levels4 = mb.get(key) or [zeros] * 4
                nz4 = [0] * 4
                for sb in range(4):
                    r, c = sb >> 1, sb & 1
                    a_nz = above_nz[mbx][c] if r == 0 else nz4[sb - 2]
                    l_nz = left_nz[r] if c == 0 else nz4[sb - 1]
                    nz4[sb] = _encode_block(
                        te, probs[2], a_nz + l_nz, 0, levels4[sb]
                    )
                above_nz[mbx][0] = nz4[2]
                above_nz[mbx][1] = nz4[3]
                left_nz[0] = nz4[1]
                left_nz[1] = nz4[3]
    tokens = te.flush()

    tag = (0) | (0 << 1) | (1 << 4) | (len(part1) << 5)
    header = bytes((tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF))
    header += b"\x9d\x01\x2a"
    header += struct.pack("<HH", width, height)
    return header + part1 + tokens


def wrap_webp(payload: bytes) -> bytes:
    """RIFF/WEBP container around a VP8 payload (for libwebp)."""
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
