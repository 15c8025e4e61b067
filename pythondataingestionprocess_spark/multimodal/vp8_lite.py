"""Dependency-free VP8 intra-frame (keyframe) decoder — RFC 6386.

Decodes the lossy WebP payload format for real: boolean (arithmetic)
decoder, keyframe header (segmentation / loop filter / quantizers /
token-probability updates), keyframe intra mode parsing (16x16 and
per-subblock 4x4 trees with spatial contexts), DCT/WHT coefficient
token decoding with band/context probabilities, dequantization,
exact-integer inverse WHT and DCT, all intra predictors, and the
normative in-loop deblocking filter (normal and simple profiles).
Inter (non-key) frames are honestly quarantined — this engine only
needs first-frame stats, and a keyframe IS the first frame of any
valid stream.

Bit-exactness: VP8 decoding is normatively exact (every transform and
filter is integer), so the tests compare full Y/U/V planes against
the system libwebp's decoder on libwebp-encoded fixtures — an
independent implementation, pixel-for-pixel (tests/test_vp8_decode.py,
gated on the library's presence). The big probability/quantizer
tables are RFC constants (see _vp8_tables.py).

Reference anchor: binary media ingestion is the engine-added analog
of the reference's binary statement ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import numpy as np

from pythondataingestionprocess_spark.multimodal._vp8_tables import (
    AC_QLOOKUP,
    COEFF_PROBS_FLAT,
    COEFF_UPDATE_PROBS_FLAT,
    DC_QLOOKUP,
    KF_BMODE_PROBS_FLAT,
)

# ----------------------------------------------------------- bool decoder


class _Bool:
    """RFC 6386 section 7 boolean decoder (16-bit value window).

    Reads past the end of the partition yield zero bytes — the spec's
    bitstream has no terminator; partition sizes bound the data and
    the final bools legitimately drain padding.
    """

    __slots__ = ("data", "idx", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        b0 = data[0] if len(data) > 0 else 0
        b1 = data[1] if len(data) > 1 else 0
        self.value = (b0 << 8) | b1
        self.idx = 2
        self.range = 255
        self.bit_count = 0

    def get(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.idx < len(self.data):
                    self.value |= self.data[self.idx]
                    self.idx += 1
        return ret

    def flag(self) -> int:
        return self.get(128)

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.get(128) else v

    def tree(self, tree: tuple, probs, start: int = 0) -> int:
        i = tree[start + self.get(probs[start >> 1])]
        while i > 0:
            i = tree[i + self.get(probs[i >> 1])]
        return -i


# ----------------------------------------------------------- spec tables

DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

# 4x4 modes — numbered by the order the probability tables are
# indexed with (RD/VR before LD; verified empirically against the
# system libwebp: the uniform-submode encoder sweeps desync under the
# LD=4 ordering and match bit-exactly under this one)
(B_DC, B_TM, B_VE, B_HE, B_RD, B_VR, B_LD, B_VL, B_HD, B_HU) = range(10)
BMODE_TREE = (
    -B_DC, 2,
    -B_TM, 4,
    -B_VE, 6,
    8, 12,
    -B_HE, 10,
    -B_RD, -B_VR,
    -B_LD, 14,
    -B_VL, 16,
    -B_HD, -B_HU,
)
# 16x16 mode implied per-subblock mode (for neighbor context)
_IMPLIED_B = {DC_PRED: B_DC, V_PRED: B_VE, H_PRED: B_HE, TM_PRED: B_TM}

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# coefficient token tree (RFC 6386 13.2); 11 tokens, 11 probs/context
COEFF_TREE = (
    -0, 2,        # EOB (token index 0 in this tree is DCT_EOB)
    -1, 4,        # ZERO
    -2, 6,        # ONE
    8, 12,
    -3, 10,       # TWO
    -4, -5,       # THREE, FOUR
    14, 16,
    -6, -7,       # CAT1, CAT2
    18, 20,
    -8, -9,       # CAT3, CAT4
    -10, -11,     # CAT5, CAT6
)
# token id -> (base value, extra-bit probs); ids 2..6 are literals 0..4
_CAT_PROBS = (
    (5, (159,)),
    (7, (165, 145)),
    (11, (173, 148, 140)),
    (19, (176, 155, 140, 135)),
    (35, (180, 157, 141, 134, 130)),
    (67, (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129)),
)

COEFF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)
ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# [plane][band][ctx][prob] views over the flat RFC tables
_COEFF_PROBS_DEFAULT = [
    [
        [
            list(COEFF_PROBS_FLAT[((p * 8 + b) * 3 + c) * 11:
                                  ((p * 8 + b) * 3 + c) * 11 + 11])
            for c in range(3)
        ]
        for b in range(8)
    ]
    for p in range(4)
]
_COEFF_UPDATE = [
    [
        [
            COEFF_UPDATE_PROBS_FLAT[((p * 8 + b) * 3 + c) * 11:
                                    ((p * 8 + b) * 3 + c) * 11 + 11]
            for c in range(3)
        ]
        for b in range(8)
    ]
    for p in range(4)
]
_KF_BMODE = [
    [
        KF_BMODE_PROBS_FLAT[(a * 10 + l) * 9:(a * 10 + l) * 9 + 9]
        for l in range(10)
    ]
    for a in range(10)
]


def _q(idx: int, table) -> int:
    return table[min(127, max(0, idx))]


# --------------------------------------------------- inverse transforms


def _iwht4x4(coeffs: list) -> list:
    """Inverse Walsh-Hadamard (Y2 DC plane), RFC 6386 14.3 — exact."""
    tmp = [0] * 16
    for i in range(4):
        a1 = coeffs[i] + coeffs[12 + i]
        b1 = coeffs[4 + i] + coeffs[8 + i]
        c1 = coeffs[4 + i] - coeffs[8 + i]
        d1 = coeffs[i] - coeffs[12 + i]
        tmp[i] = a1 + b1
        tmp[4 + i] = c1 + d1
        tmp[8 + i] = a1 - b1
        tmp[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = tmp[r] + tmp[r + 3]
        b1 = tmp[r + 1] + tmp[r + 2]
        c1 = tmp[r + 1] - tmp[r + 2]
        d1 = tmp[r] - tmp[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


def _idct4x4(coeffs: list) -> list:
    """Inverse 4x4 DCT, RFC 6386 14.3 — exact integer arithmetic
    (cospi8sqrt2minus1 = 20091, sinpi8sqrt2 = 35468)."""
    tmp = [0] * 16
    for i in range(4):
        ip0, ip4 = coeffs[i], coeffs[4 + i]
        ip8, ip12 = coeffs[8 + i], coeffs[12 + i]
        a1 = ip0 + ip8
        b1 = ip0 - ip8
        c1 = ((ip4 * 35468) >> 16) - (ip12 + ((ip12 * 20091) >> 16))
        d1 = (ip4 + ((ip4 * 20091) >> 16)) + ((ip12 * 35468) >> 16)
        tmp[i] = a1 + d1
        tmp[12 + i] = a1 - d1
        tmp[4 + i] = b1 + c1
        tmp[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        ip0, ip1, ip2, ip3 = tmp[r], tmp[r + 1], tmp[r + 2], tmp[r + 3]
        a1 = ip0 + ip2
        b1 = ip0 - ip2
        c1 = ((ip1 * 35468) >> 16) - (ip3 + ((ip3 * 20091) >> 16))
        d1 = (ip1 + ((ip1 * 20091) >> 16)) + ((ip3 * 35468) >> 16)
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


# ----------------------------------------------------------- header


class _Frame:
    pass


def _parse_header(payload: bytes) -> _Frame:
    if len(payload) < 10:
        raise ValueError("VP8 payload too short")
    tag = payload[0] | (payload[1] << 8) | (payload[2] << 16)
    f = _Frame()
    f.key_frame = (tag & 1) == 0
    f.version = (tag >> 1) & 7
    f.show = (tag >> 4) & 1
    part1_size = tag >> 5
    if not f.key_frame:
        raise ValueError(
            "VP8 inter frame (intra-only decoder; keyframes only)"
        )
    if payload[3:6] != b"\x9d\x01\x2a":
        raise ValueError("bad VP8 keyframe start code")
    f.width = (payload[6] | (payload[7] << 8)) & 0x3FFF
    f.height = (payload[8] | (payload[9] << 8)) & 0x3FFF
    if not f.width or not f.height:
        raise ValueError("bad VP8 dimensions")
    if f.width * f.height > 2_000_000:
        # per-pixel Python decode: bound wall time per blob like the
        # VP8L guard does (quarantine, not stall)
        raise ValueError("VP8 dimensions exceed the 2MP decode guard")
    body = payload[10:]
    if part1_size > len(body):
        raise ValueError("VP8 first partition overruns payload")
    bd = _Bool(body[:part1_size])
    f.color_space = bd.flag()
    f.clamping = bd.flag()

    # segmentation (RFC 9.3)
    f.segmentation = bd.flag()
    f.update_map = 0
    f.segment_probs = [255, 255, 255]
    f.seg_abs = 0
    f.seg_q = [0, 0, 0, 0]
    f.seg_lf = [0, 0, 0, 0]
    if f.segmentation:
        f.update_map = bd.flag()
        update_data = bd.flag()
        if update_data:
            f.seg_abs = bd.flag()
            for i in range(4):
                if bd.flag():
                    f.seg_q[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.flag():
                    f.seg_lf[i] = bd.signed_literal(6)
        if f.update_map:
            for i in range(3):
                if bd.flag():
                    f.segment_probs[i] = bd.literal(8)

    # loop filter (RFC 9.4)
    f.filter_simple = bd.flag()
    f.filter_level = bd.literal(6)
    f.sharpness = bd.literal(3)
    f.lf_delta_enabled = bd.flag()
    f.ref_lf_deltas = [0, 0, 0, 0]
    f.mode_lf_deltas = [0, 0, 0, 0]
    if f.lf_delta_enabled:
        if bd.flag():  # update
            for i in range(4):
                if bd.flag():
                    f.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.flag():
                    f.mode_lf_deltas[i] = bd.signed_literal(6)

    # token partitions (RFC 9.5)
    n_parts = 1 << bd.literal(2)
    rest = body[part1_size:]
    sizes_bytes = 3 * (n_parts - 1)
    if len(rest) < sizes_bytes:
        raise ValueError("VP8 partition size table truncated")
    part_sizes = [
        rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        for i in range(n_parts - 1)
    ]
    data = rest[sizes_bytes:]
    f.partitions = []
    off = 0
    for i in range(n_parts - 1):
        if off + part_sizes[i] > len(data):
            raise ValueError("VP8 token partition overruns payload")
        f.partitions.append(data[off:off + part_sizes[i]])
        off += part_sizes[i]
    f.partitions.append(data[off:])

    # quantizers (RFC 9.6)
    f.y_ac_qi = bd.literal(7)
    f.y_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.y2_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.y2_ac_delta = bd.signed_literal(4) if bd.flag() else 0
    f.uv_dc_delta = bd.signed_literal(4) if bd.flag() else 0
    f.uv_ac_delta = bd.signed_literal(4) if bd.flag() else 0

    f.refresh_entropy = bd.flag()

    # token probability updates (RFC 13.4)
    probs = [
        [[list(r) for r in c] for c in b] for b in _COEFF_PROBS_DEFAULT
    ]
    for p in range(4):
        for b in range(8):
            for c in range(3):
                upd = _COEFF_UPDATE[p][b][c]
                row = probs[p][b][c]
                for t in range(11):
                    if bd.get(upd[t]):
                        row[t] = bd.literal(8)
    f.coeff_probs = probs

    f.mb_no_skip = bd.flag()
    f.prob_skip_false = bd.literal(8) if f.mb_no_skip else 0

    f.bd = bd  # mode parsing continues in the first partition
    return f


def _quantizers(f: _Frame, segment: int) -> tuple:
    base = f.y_ac_qi
    if f.segmentation:
        base = f.seg_q[segment] if f.seg_abs else base + f.seg_q[segment]
    base = min(127, max(0, base))
    y_dc = _q(base + f.y_dc_delta, DC_QLOOKUP)
    y_ac = _q(base, AC_QLOOKUP)
    y2_dc = _q(base + f.y2_dc_delta, DC_QLOOKUP) * 2
    y2_ac = _q(base + f.y2_ac_delta, AC_QLOOKUP) * 155 // 100
    if y2_ac < 8:
        y2_ac = 8
    uv_dc = _q(base + f.uv_dc_delta, DC_QLOOKUP)
    if uv_dc > 132:
        uv_dc = 132
    uv_ac = _q(base + f.uv_ac_delta, AC_QLOOKUP)
    return (y_dc, y_ac), (y2_dc, y2_ac), (uv_dc, uv_ac)


# ----------------------------------------------------------- tokens


def _decode_coeffs(bd: _Bool, probs, ctx: int, first: int, dq: tuple) -> list | None:
    """One 4x4 block's coefficients (dequantized, in raster order via
    zigzag), or None if all-zero. RFC 6386 section 13."""
    out = None
    c = first
    prev_zero = False
    dq_dc, dq_ac = dq
    while c < 16:
        band_probs = probs[COEFF_BANDS[c]][ctx]
        if prev_zero:
            # a ZERO token cannot be followed by EOB: reenter the
            # tree past the EOB branch
            token = bd.tree(COEFF_TREE, band_probs, start=2)
        else:
            token = bd.tree(COEFF_TREE, band_probs)
            if token == 0:  # EOB
                break
        if token == 1:  # ZERO
            prev_zero = True
            ctx = 0
            c += 1
            continue
        prev_zero = False
        if token < 6:
            value = token - 1  # tokens 2..5 are literals 1..4
        else:
            base, cat_probs = _CAT_PROBS[token - 6]
            extra = 0
            for pb in cat_probs:
                extra = (extra << 1) | bd.get(pb)
            value = base + extra
        ctx = 1 if value == 1 else 2
        if bd.flag():
            value = -value
        if out is None:
            out = [0] * 16
        out[ZIGZAG[c]] = value * (dq_dc if c == 0 else dq_ac)
        c += 1
    return out


# ----------------------------------------------------------- predictors


def _pred_dc(above, left, size: int):
    have_a = above is not None
    have_l = left is not None
    if have_a and have_l:
        s = int(above.sum()) + int(left.sum())
        dc = (s + size) >> (5 if size == 16 else 4)
    elif have_a:
        dc = (int(above.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    elif have_l:
        dc = (int(left.sum()) + (size >> 1)) >> (4 if size == 16 else 3)
    else:
        dc = 128
    return np.full((size, size), dc, dtype=np.int32)


def _pred_tm(above, left, tl: int, size: int):
    a = above.astype(np.int32)
    l = left.astype(np.int32)
    return np.clip(l[:, None] + a[None, :] - tl, 0, 255)


def _pred_block16(mode, plane, x, y, size):
    """16x16 luma / 8x8 chroma whole-block prediction. Edge pixels
    outside the frame use the spec constants (above: 127, left: 129)."""
    have_a = y > 0
    have_l = x > 0
    above = plane[y - 1, x:x + size].astype(np.int32) if have_a else None
    left = plane[y:y + size, x - 1].astype(np.int32) if have_l else None
    if mode == DC_PRED:
        return _pred_dc(above, left, size)
    if above is None:
        above = np.full(size, 127, dtype=np.int32)
    if left is None:
        left = np.full(size, 129, dtype=np.int32)
    if mode == V_PRED:
        return np.repeat(above[None, :], size, axis=0)
    if mode == H_PRED:
        return np.repeat(left[:, None], size, axis=1)
    if mode == TM_PRED:
        # edge rule: the whole missing ABOVE row (incl. top-left) is
        # 127; a missing LEFT column with a real above row gives a
        # 129 top-left (libwebp-verified, same as _sub_edges)
        if not have_a:
            tl = 127
        elif not have_l:
            tl = 129
        else:
            tl = int(plane[y - 1, x - 1])
        return _pred_tm(above, left, tl, size)
    raise ValueError(f"bad 16x16/8x8 intra mode {mode}")


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _avg2(a, b):
    return (a + b + 1) >> 1


def _pred_b(mode: int, A, L, P: int) -> list:
    """4x4 subblock prediction (RFC 6386 12.3). A: 8 above pixels
    (incl. above-right), L: 4 left pixels, P: top-left. Returns a
    4x4 row-major list of lists of ints."""
    out = [[0] * 4 for _ in range(4)]
    if mode == B_DC:
        dc = (sum(A[:4]) + sum(L) + 4) >> 3
        for r in range(4):
            for c in range(4):
                out[r][c] = dc
    elif mode == B_TM:
        for r in range(4):
            for c in range(4):
                v = L[r] + A[c] - P
                out[r][c] = 0 if v < 0 else (255 if v > 255 else v)
    elif mode == B_VE:
        top = [
            _avg3(P, A[0], A[1]),
            _avg3(A[0], A[1], A[2]),
            _avg3(A[1], A[2], A[3]),
            _avg3(A[2], A[3], A[4]),
        ]
        for r in range(4):
            out[r] = top[:]
    elif mode == B_HE:
        col = [
            _avg3(P, L[0], L[1]),
            _avg3(L[0], L[1], L[2]),
            _avg3(L[1], L[2], L[3]),
            _avg3(L[2], L[3], L[3]),
        ]
        for r in range(4):
            for c in range(4):
                out[r][c] = col[r]
    elif mode == B_LD:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    out[r][c] = _avg3(A[i], A[i + 1], A[i + 2])
                else:
                    out[r][c] = _avg3(A[6], A[7], A[7])
    elif mode == B_RD:
        # explicit per-pixel diagonal assignments (RFC 6386 12.3 /
        # the reference decoder's intra4x4 predictor definitions)
        v_l321 = _avg3(L[3], L[2], L[1])
        v_l210 = _avg3(L[2], L[1], L[0])
        v_l0p = _avg3(L[1], L[0], P)
        v_pa = _avg3(L[0], P, A[0])
        v_a01 = _avg3(P, A[0], A[1])
        v_a012 = _avg3(A[0], A[1], A[2])
        v_a123 = _avg3(A[1], A[2], A[3])
        out[3][0] = v_l321
        out[3][1] = out[2][0] = v_l210
        out[3][2] = out[2][1] = out[1][0] = v_l0p
        out[3][3] = out[2][2] = out[1][1] = out[0][0] = v_pa
        out[2][3] = out[1][2] = out[0][1] = v_a01
        out[1][3] = out[0][2] = v_a012
        out[0][3] = v_a123
    elif mode == B_VR:
        out[3][0] = _avg3(L[2], L[1], L[0])
        out[2][0] = _avg3(L[1], L[0], P)
        out[3][1] = out[1][0] = _avg3(L[0], P, A[0])
        out[2][1] = out[0][0] = _avg2(P, A[0])
        out[3][2] = out[1][1] = _avg3(P, A[0], A[1])
        out[2][2] = out[0][1] = _avg2(A[0], A[1])
        out[3][3] = out[1][2] = _avg3(A[0], A[1], A[2])
        out[2][3] = out[0][2] = _avg2(A[1], A[2])
        out[1][3] = _avg3(A[1], A[2], A[3])
        out[0][3] = _avg2(A[2], A[3])
    elif mode == B_VL:
        out[0][0] = _avg2(A[0], A[1])
        out[1][0] = _avg3(A[0], A[1], A[2])
        out[2][0] = out[0][1] = _avg2(A[1], A[2])
        out[1][1] = out[3][0] = _avg3(A[1], A[2], A[3])
        out[2][1] = out[0][2] = _avg2(A[2], A[3])
        out[3][1] = out[1][2] = _avg3(A[2], A[3], A[4])
        out[2][2] = out[0][3] = _avg2(A[3], A[4])
        out[3][2] = out[1][3] = _avg3(A[3], A[4], A[5])
        out[2][3] = _avg3(A[4], A[5], A[6])
        out[3][3] = _avg3(A[5], A[6], A[7])
    elif mode == B_HD:
        out[0][0] = _avg2(L[0], P)
        out[0][1] = _avg3(L[0], P, A[0])
        out[0][2] = _avg3(P, A[0], A[1])
        out[0][3] = _avg3(A[0], A[1], A[2])
        out[1][0] = _avg2(L[1], L[0])
        out[1][1] = _avg3(L[1], L[0], P)
        out[1][2] = out[0][0]
        out[1][3] = out[0][1]
        out[2][0] = _avg2(L[2], L[1])
        out[2][1] = _avg3(L[2], L[1], L[0])
        out[2][2] = out[1][0]
        out[2][3] = out[1][1]
        out[3][0] = _avg2(L[3], L[2])
        out[3][1] = _avg3(L[3], L[2], L[1])
        out[3][2] = out[2][0]
        out[3][3] = out[2][1]
    elif mode == B_HU:
        out[0][0] = _avg2(L[0], L[1])
        out[0][1] = _avg3(L[0], L[1], L[2])
        out[0][2] = out[1][0] = _avg2(L[1], L[2])
        out[0][3] = out[1][1] = _avg3(L[1], L[2], L[3])
        out[1][2] = out[2][0] = _avg2(L[2], L[3])
        out[1][3] = out[2][1] = _avg3(L[2], L[3], L[3])
        out[2][2] = out[2][3] = L[3]
        out[3][0] = out[3][1] = out[3][2] = out[3][3] = L[3]
    else:
        raise ValueError(f"bad 4x4 intra mode {mode}")
    return out


# ----------------------------------------------------------- decoding


def decode_frame(payload: bytes) -> dict:
    """VP8 keyframe → {'y','u','v' numpy uint8 planes (cropped),
    'width','height'}. Raises for inter frames (quarantine)."""
    f = _parse_header(payload)
    bd = f.bd
    mb_w = (f.width + 15) >> 4
    mb_h = (f.height + 15) >> 4

    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.uint8)

    # neighbor state
    above_sub = [[B_DC] * 4 for _ in range(mb_w)]  # bottom row submodes
    above_nz_y = [[0] * 4 for _ in range(mb_w)]
    above_nz_u = [[0] * 2 for _ in range(mb_w)]
    above_nz_v = [[0] * 2 for _ in range(mb_w)]
    above_nz_y2 = [0] * mb_w

    # per-MB records for the loop filter pass
    mb_info = [[None] * mb_w for _ in range(mb_h)]

    # one persistent bool decoder per token partition: a partition is
    # a CONTINUOUS stream across all the MB rows assigned to it
    token_bds = [_Bool(p) for p in f.partitions]

    for mby in range(mb_h):
        token_bd = token_bds[mby % len(token_bds)]
        left_sub = [B_DC] * 4
        left_nz_y = [0] * 4
        left_nz_u = [0] * 2
        left_nz_v = [0] * 2
        left_nz_y2 = 0
        for mbx in range(mb_w):
            segment = 0
            if f.update_map:
                segment = bd.tree(MB_SEGMENT_TREE, f.segment_probs)
            skip_flag = bd.get(f.prob_skip_false) if f.mb_no_skip else 0
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            if ymode == B_PRED:
                submodes = []
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a = above_sub[mbx][c] if r == 0 else submodes[sb - 4]
                    l = left_sub[r] if c == 0 else submodes[sb - 1]
                    submodes.append(
                        bd.tree(BMODE_TREE, _KF_BMODE[a][l])
                    )
            else:
                submodes = [_IMPLIED_B[ymode]] * 16
            above_sub[mbx] = submodes[12:16]
            left_sub = [submodes[3], submodes[7], submodes[11], submodes[15]]
            uv_mode = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)

            dq_y, dq_y2, dq_uv = _quantizers(f, segment)
            has_y2 = ymode != B_PRED

            y_coeffs = [None] * 16
            u_coeffs = [None] * 4
            v_coeffs = [None] * 4
            y2_out = None
            mb_has_coeffs = False

            if skip_flag:
                # skipped MB: zero the nz contexts; Y2 context is
                # preserved across i4x4 MBs (which carry no Y2 block)
                left_nz_y = [0] * 4
                left_nz_u = [0] * 2
                left_nz_v = [0] * 2
                above_nz_y[mbx] = [0] * 4
                above_nz_u[mbx] = [0] * 2
                above_nz_v[mbx] = [0] * 2
                if has_y2:
                    left_nz_y2 = 0
                    above_nz_y2[mbx] = 0
            else:
                tb = token_bd
                if has_y2:
                    ctx = above_nz_y2[mbx] + left_nz_y2
                    y2 = _decode_coeffs(
                        tb, f.coeff_probs[1], ctx, 0, dq_y2
                    )
                    nz = 1 if y2 is not None else 0
                    above_nz_y2[mbx] = nz
                    left_nz_y2 = nz
                    if y2 is not None:
                        mb_has_coeffs = True
                        y2_out = _iwht4x4(y2)
                    first = 1
                    plane_probs = f.coeff_probs[0]
                else:
                    first = 0
                    plane_probs = f.coeff_probs[3]
                nz_grid = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    a_nz = above_nz_y[mbx][c] if r == 0 else nz_grid[sb - 4]
                    l_nz = left_nz_y[r] if c == 0 else nz_grid[sb - 1]
                    coeffs = _decode_coeffs(
                        tb, plane_probs, a_nz + l_nz, first, dq_y
                    )
                    nz_grid[sb] = 1 if coeffs is not None else 0
                    if coeffs is not None:
                        mb_has_coeffs = True
                    y_coeffs[sb] = coeffs
                above_nz_y[mbx] = nz_grid[12:16]
                left_nz_y = [nz_grid[3], nz_grid[7],
                             nz_grid[11], nz_grid[15]]
                for plane_coeffs, above_nz, left_nz in (
                    (u_coeffs, above_nz_u, left_nz_u),
                    (v_coeffs, above_nz_v, left_nz_v),
                ):
                    nz4 = [0] * 4
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        a_nz = above_nz[mbx][c] if r == 0 else nz4[sb - 2]
                        l_nz = left_nz[r] if c == 0 else nz4[sb - 1]
                        coeffs = _decode_coeffs(
                            tb, f.coeff_probs[2], a_nz + l_nz, 0, dq_uv
                        )
                        nz4[sb] = 1 if coeffs is not None else 0
                        if coeffs is not None:
                            mb_has_coeffs = True
                        plane_coeffs[sb] = coeffs
                    above_nz[mbx][0] = nz4[2]
                    above_nz[mbx][1] = nz4[3]
                    left_nz[0] = nz4[1]
                    left_nz[1] = nz4[3]

            # --------------------------------------------- reconstruct
            x0, y0 = mbx * 16, mby * 16
            if ymode != B_PRED:
                pred = _pred_block16(ymode, Y, x0, y0, 16)
                blk = pred.copy()
                for sb in range(16):
                    coeffs = y_coeffs[sb]
                    dc = y2_out[sb] if y2_out is not None else 0
                    if coeffs is None and dc == 0:
                        continue
                    if coeffs is None:
                        coeffs = [0] * 16
                    if y2_out is not None:
                        coeffs[0] = dc
                    if any(coeffs[1:]):
                        res = _idct4x4(coeffs)
                    else:
                        res = [(coeffs[0] + 4) >> 3] * 16
                    r, c = (sb >> 2) * 4, (sb & 3) * 4
                    blk[r:r + 4, c:c + 4] += np.asarray(
                        res, dtype=np.int32
                    ).reshape(4, 4)
                Y[y0:y0 + 16, x0:x0 + 16] = np.clip(blk, 0, 255)
            else:
                # subblock-by-subblock: prediction reads reconstructed
                # neighbors, including within this MB
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    px, py = x0 + c * 4, y0 + r * 4
                    A, L, P = _sub_edges(Y, px, py, mb_w * 16)
                    pred = _pred_b(submodes[sb], A, L, P)
                    coeffs = y_coeffs[sb]
                    if coeffs is not None:
                        if any(coeffs[1:]):
                            res = _idct4x4(coeffs)
                        else:
                            res = [(coeffs[0] + 4) >> 3] * 16
                    else:
                        res = None
                    for rr in range(4):
                        row = pred[rr]
                        if res is not None:
                            for cc in range(4):
                                v = row[cc] + res[rr * 4 + cc]
                                row[cc] = 0 if v < 0 else (
                                    255 if v > 255 else v
                                )
                        Y[py + rr, px:px + 4] = row
            cx, cy = mbx * 8, mby * 8
            for plane, coeffs4 in ((U, u_coeffs), (V, v_coeffs)):
                pred = _pred_block16(uv_mode, plane, cx, cy, 8)
                blk = pred.copy()
                for sb in range(4):
                    coeffs = coeffs4[sb]
                    if coeffs is None:
                        continue
                    if any(coeffs[1:]):
                        res = _idct4x4(coeffs)
                    else:
                        res = [(coeffs[0] + 4) >> 3] * 16
                    r, c = (sb >> 1) * 4, (sb & 1) * 4
                    blk[r:r + 4, c:c + 4] += np.asarray(
                        res, dtype=np.int32
                    ).reshape(4, 4)
                plane[cy:cy + 8, cx:cx + 8] = np.clip(blk, 0, 255)

            mb_info[mby][mbx] = (segment, ymode, mb_has_coeffs)

    if f.filter_level:
        _loop_filter(f, Y, U, V, mb_info, mb_w, mb_h)

    return {
        "y": Y[:f.height, :f.width],
        "u": U[:(f.height + 1) >> 1, :(f.width + 1) >> 1],
        "v": V[:(f.height + 1) >> 1, :(f.width + 1) >> 1],
        "width": f.width,
        "height": f.height,
    }


def _sub_edges(Y: np.ndarray, px: int, py: int, padded_w: int):
    """Edge pixel fetch for one 4x4 luma subblock (RFC 6386 12.3):
    A = 8 above pixels (incl. above-right), L = 4 left, P top-left.
    Outside the frame: above = 127, left = 129, consistent with the
    whole-block predictors. Above-right pixels that would come from
    the not-yet-decoded right MB use the row above the current MB
    (the spec's fixed top-right rule); past the padded frame edge
    they replicate pixel A[3]."""
    if py > 0:
        A = [int(v) for v in Y[py - 1, px:px + 4]]
    else:
        A = [127, 127, 127, 127]
    # above-right: only valid straight from the frame when the 4
    # pixels lie in an already-reconstructed area: same MB (not the
    # right column) or the row above the current MB
    mb_right = ((px >> 4) + 1) << 4  # right edge x of the current MB
    ar_y = py - 1
    if ar_y < 0:
        ar = [127, 127, 127, 127]
    elif px + 4 < mb_right or (py & 15) == 0:
        # in-MB neighbor or above-MB row: reconstructed
        if px + 8 <= padded_w:
            ar = [int(v) for v in Y[ar_y, px + 4:px + 8]]
        else:
            ar = [int(Y[ar_y, padded_w - 1])] * 4
    else:
        # right-column subblock below the MB top: use the pixels of
        # the row above the MB (fixed for the whole MB)
        mb_top = (py >> 4) << 4
        if mb_top > 0:
            if mb_right + 4 <= padded_w:
                ar = [int(v) for v in Y[mb_top - 1, mb_right:mb_right + 4]]
            else:
                ar = [int(Y[mb_top - 1, padded_w - 1])] * 4
        else:
            ar = [127, 127, 127, 127]
    A = A + ar
    if px > 0:
        L = [int(v) for v in Y[py:py + 4, px - 1]]
    else:
        L = [129, 129, 129, 129]
    if px > 0 and py > 0:
        P = int(Y[py - 1, px - 1])
    elif py > 0:
        P = 129
    else:
        P = 127
    return A, L, P


# ----------------------------------------------------------- loop filter


def _c128(v: int) -> int:
    return -128 if v < -128 else (127 if v > 127 else v)


def _u2s(v: int) -> int:
    return v - 128


def _s2u(v: int) -> int:
    v = _c128(v)
    return v + 128


def _filter_limits(f: _Frame, level: int):
    interior = level
    if f.sharpness:
        interior >>= 2 if f.sharpness > 4 else 1
        if interior > 9 - f.sharpness:
            interior = 9 - f.sharpness
    if interior < 1:
        interior = 1
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    else:
        hev = 0
    mb_edge = ((level + 2) * 2) + interior
    sub_edge = (level * 2) + interior
    return interior, hev, mb_edge, sub_edge


def _mb_level(f: _Frame, segment: int, ymode: int) -> int:
    level = f.filter_level
    if f.segmentation:
        level = f.seg_lf[segment] if f.seg_abs else level + f.seg_lf[segment]
    if f.lf_delta_enabled:
        level += f.ref_lf_deltas[0]  # intra frame
        if ymode == B_PRED:
            level += f.mode_lf_deltas[0]
    return min(63, max(0, level))


def _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge) -> bool:
    return (
        abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge
        and abs(p3 - p2) <= interior and abs(p2 - p1) <= interior
        and abs(p1 - p0) <= interior and abs(q1 - q0) <= interior
        and abs(q2 - q1) <= interior and abs(q3 - q2) <= interior
    )


def _hev(p1, p0, q0, q1, thresh) -> bool:
    return abs(p1 - p0) > thresh or abs(q1 - q0) > thresh


def _common_adjust(use_outer: bool, px, i, stride):
    """RFC 6386 15.2/15.3 common filter on 4 pixels around edge at i
    (px flat array view, stride = distance between the samples)."""
    p1 = _u2s(px[i - 2 * stride])
    p0 = _u2s(px[i - stride])
    q0 = _u2s(px[i])
    q1 = _u2s(px[i + stride])
    a = _c128((_c128(p1 - q1) if use_outer else 0) + 3 * (q0 - p0))
    f1 = _c128(a + 4) >> 3
    f2 = _c128(a + 3) >> 3
    px[i] = _s2u(q0 - f1)
    px[i - stride] = _s2u(p0 + f2)
    return f1


def _sub_filter(px, i, stride, hev_t, interior, edge):
    vals = [px[i + k * stride] for k in range(-4, 4)]
    p3, p2, p1, p0, q0, q1, q2, q3 = vals
    if not _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
        return
    hv = _hev(p1, p0, q0, q1, hev_t)
    f1 = _common_adjust(hv, px, i, stride)
    if not hv:
        a = (f1 + 1) >> 1
        px[i + stride] = _s2u(_u2s(px[i + stride]) - a)
        px[i - 2 * stride] = _s2u(_u2s(px[i - 2 * stride]) + a)


def _mb_filter(px, i, stride, hev_t, interior, edge):
    vals = [px[i + k * stride] for k in range(-4, 4)]
    p3, p2, p1, p0, q0, q1, q2, q3 = vals
    if not _normal_mask(p3, p2, p1, p0, q0, q1, q2, q3, interior, edge):
        return
    if _hev(p1, p0, q0, q1, hev_t):
        _common_adjust(True, px, i, stride)
        return
    p2s, p1s, p0s = _u2s(p2), _u2s(p1), _u2s(p0)
    q0s, q1s, q2s = _u2s(q0), _u2s(q1), _u2s(q2)
    w = _c128(_c128(p1s - q1s) + 3 * (q0s - p0s))
    a = (27 * w + 63) >> 7
    px[i] = _s2u(q0s - a)
    px[i - stride] = _s2u(p0s + a)
    a = (18 * w + 63) >> 7
    px[i + stride] = _s2u(q1s - a)
    px[i - 2 * stride] = _s2u(p1s + a)
    a = (9 * w + 63) >> 7
    px[i + 2 * stride] = _s2u(q2s - a)
    px[i - 3 * stride] = _s2u(p2s + a)


def _simple_filter(px, i, stride, edge):
    p1 = px[i - 2 * stride]
    p0 = px[i - stride]
    q0 = px[i]
    q1 = px[i + stride]
    if abs(p0 - q0) * 2 + abs(p1 - q1) // 2 <= edge:
        _common_adjust(True, px, i, stride)


def _loop_filter(f, Y, U, V, mb_info, mb_w, mb_h):
    """Normative deblocking (RFC 6386 15): per MB in raster order —
    left MB edge, inner vertical edges, top MB edge, inner horizontal
    edges; luma + chroma for the normal filter, luma only for the
    simple one. Lists give scalar speed; planes written back at the
    end."""
    ly = Y.shape[1]
    lu = U.shape[1]
    fy = [int(v) for v in Y.reshape(-1)]
    fu = [int(v) for v in U.reshape(-1)]
    fv = [int(v) for v in V.reshape(-1)]
    for mby in range(mb_h):
        for mbx in range(mb_w):
            segment, ymode, has_coeffs = mb_info[mby][mbx]
            level = _mb_level(f, segment, ymode)
            if level == 0:
                continue
            interior, hev_t, mb_edge, sub_edge = _filter_limits(f, level)
            inner = has_coeffs or ymode == B_PRED
            x0, y0 = mbx * 16, mby * 16
            cx, cy = mbx * 8, mby * 8
            if f.filter_simple:
                if mbx > 0:
                    for r in range(16):
                        _simple_filter(fy, (y0 + r) * ly + x0, 1, mb_edge)
                if inner:
                    for dx in (4, 8, 12):
                        for r in range(16):
                            _simple_filter(
                                fy, (y0 + r) * ly + x0 + dx, 1, sub_edge
                            )
                if mby > 0:
                    for c in range(16):
                        _simple_filter(fy, y0 * ly + x0 + c, ly, mb_edge)
                if inner:
                    for dy in (4, 8, 12):
                        for c in range(16):
                            _simple_filter(
                                fy, (y0 + dy) * ly + x0 + c, ly, sub_edge
                            )
                continue
            if mbx > 0:
                for r in range(16):
                    _mb_filter(fy, (y0 + r) * ly + x0, 1,
                               hev_t, interior, mb_edge)
                for r in range(8):
                    _mb_filter(fu, (cy + r) * lu + cx, 1,
                               hev_t, interior, mb_edge)
                    _mb_filter(fv, (cy + r) * lu + cx, 1,
                               hev_t, interior, mb_edge)
            if inner:
                for dx in (4, 8, 12):
                    for r in range(16):
                        _sub_filter(fy, (y0 + r) * ly + x0 + dx, 1,
                                    hev_t, interior, sub_edge)
                for r in range(8):
                    _sub_filter(fu, (cy + r) * lu + cx + 4, 1,
                                hev_t, interior, sub_edge)
                    _sub_filter(fv, (cy + r) * lu + cx + 4, 1,
                                hev_t, interior, sub_edge)
            if mby > 0:
                for c in range(16):
                    _mb_filter(fy, y0 * ly + x0 + c, ly,
                               hev_t, interior, mb_edge)
                for c in range(8):
                    _mb_filter(fu, cy * lu + cx + c, lu,
                               hev_t, interior, mb_edge)
                    _mb_filter(fv, cy * lu + cx + c, lu,
                               hev_t, interior, mb_edge)
            if inner:
                for dy in (4, 8, 12):
                    for c in range(16):
                        _sub_filter(fy, (y0 + dy) * ly + x0 + c, ly,
                                    hev_t, interior, sub_edge)
                for c in range(8):
                    _sub_filter(fu, (cy + 4) * lu + cx + c, lu,
                                hev_t, interior, sub_edge)
                    _sub_filter(fv, (cy + 4) * lu + cx + c, lu,
                                hev_t, interior, sub_edge)
    Y[:] = np.asarray(fy, dtype=np.uint8).reshape(Y.shape)
    U[:] = np.asarray(fu, dtype=np.uint8).reshape(U.shape)
    V[:] = np.asarray(fv, dtype=np.uint8).reshape(V.shape)


def decode_stats(payload: bytes) -> dict:
    """png_lite-style stats for a VP8 keyframe: mean_intensity is the
    Y (BT.601 luma) plane mean / 255 — a luminance, same contract as
    the PNM decoder documents."""
    out = decode_frame(payload)
    return {
        "width": out["width"],
        "height": out["height"],
        "channels": 3,
        "mean_intensity": float(out["y"].astype(np.float64).mean() / 255.0),
    }
