"""webp_lite (r13): WebP container metadata + FULL VP8L lossless
pixel decode.

Verification layers (no WebP encoder exists in this container):
1. Hand-built bit vectors for the canonical-prefix machinery — the
   code-length-code bootstrap, 16/17/18 repeats, simple codes — where
   the expected bits are derived from the spec by hand in the test.
2. A from-scratch test-side VP8L ENCODER (canonical Huffman from
   frequencies, LZ77 runs, color cache, and all four transforms in
   their forward direction) + seeded roundtrip fuzz across image
   shapes: decoded ARGB must equal the source array bit-exactly.
3. Structural invariants on the spec-transcribed 120-entry distance
   neighborhood (uniqueness, ranges, causality).
"""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import media, webp_lite


# ---------------------------------------------------------- bit writer

class BitW:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int):
        """LSB-first: emit n bits of value, low bit first."""
        for i in range(n):
            self.bits.append((value >> i) & 1)

    def put_code(self, code: int, length: int):
        """Canonical codeword: MSB of the code goes FIRST."""
        for i in range(length - 1, -1, -1):
            self.bits.append((code >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        chunk = self.bits + [0] * ((-len(self.bits)) % 8)
        for i in range(0, len(chunk), 8):
            b = 0
            for j, bit in enumerate(chunk[i:i + 8]):
                b |= bit << j
            out.append(b)
        return bytes(out)


# ----------------------------------------------- canonical huffman enc

def _huff_lengths(freqs: dict[int, int], cap: int = 15) -> dict[int, int]:
    """Code lengths from frequencies (heapq Huffman; alphabet sizes in
    these tests keep depths well under the cap, asserted)."""
    live = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items())) if f]
    if not live:
        return {}
    if len(live) == 1:
        return {live[0][2][0]: 1}
    heapq.heapify(live)
    depths = {s: 0 for _, _, (s,) in [(f, i, grp) for f, i, grp in live]}
    uid = len(live)
    while len(live) > 1:
        f1, _, g1 = heapq.heappop(live)
        f2, _, g2 = heapq.heappop(live)
        for s in g1 + g2:
            depths[s] += 1
        heapq.heappush(live, (f1 + f2, uid, g1 + g2))
        uid += 1
    assert max(depths.values()) <= cap
    return depths


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length), same canonical convention the decoder
    reconstructs (sorted by (length, symbol), sequential codes). A
    single-symbol code emits ZERO bits per symbol (the spec's
    degenerate-tree rule — the decoder reads nothing)."""
    if len(lengths) == 1:
        (sym,) = lengths
        return {sym: (0, 0)}
    max_len = max(lengths.values())
    counts = [0] * (max_len + 1)
    for ln in lengths.values():
        counts[ln] += 1
    code = 0
    first = [0] * (max_len + 2)
    for ln in range(1, max_len + 1):
        first[ln] = code
        code = (code + counts[ln]) << 1
    out = {}
    nxt = list(first)
    for ln, sym in sorted((ln, s) for s, ln in lengths.items()):
        out[sym] = (nxt[ln], ln)
        nxt[ln] += 1
    return out


def _write_prefix_code(bw: BitW, lengths: dict[int, int], alphabet: int):
    """Normal (non-simple) form: full 19 CLC lengths, then one CLC
    symbol per alphabet entry (no 16/17/18 shortcuts — size doesn't
    matter in tests; the repeat paths get their own hand vectors)."""
    if len(lengths) == 1:
        (sym,) = lengths
        bw.put(1, 1)            # simple
        bw.put(0, 1)            # one symbol
        if sym < 2:
            bw.put(0, 1)
            bw.put(sym, 1)
        else:
            bw.put(1, 1)
            bw.put(sym, 8)
        return
    bw.put(0, 1)  # not simple
    full = [lengths.get(i, 0) for i in range(alphabet)]
    clc_freq: dict[int, int] = {}
    for ln in full:
        clc_freq[ln] = clc_freq.get(ln, 0) + 1
    clc_lengths = _huff_lengths(clc_freq, cap=7)
    if len(clc_lengths) == 1:
        # a degenerate CLC can't be written in normal form (Kraft);
        # give the lone symbol a partner of equal weight
        (only,) = clc_lengths
        partner = 0 if only != 0 else 1
        clc_lengths = {only: 1, partner: 1}
    clc_codes = _canonical_codes(clc_lengths)
    bw.put(19 - 4, 4)
    for sym in webp_lite._CLC_ORDER:
        bw.put(clc_lengths.get(sym, 0), 3)
    bw.put(0, 1)  # no max-symbol limit
    for ln in full:
        code, n = clc_codes[ln]
        bw.put_code(code, n)


def _inv_lz77(value: int) -> tuple[int, int, int]:
    """value → (prefix_code, n_extra_bits, extra) per the spec's
    length/distance prefix scheme."""
    assert value >= 1
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    hi = v.bit_length() - 1
    extra_bits = hi - 1
    code = 2 * hi + ((v >> extra_bits) & 1)
    offset = (2 + ((v >> extra_bits) & 1)) << extra_bits
    return code, extra_bits, value - offset - 1


# ---------------------------------------- reference predictor helpers
# Plain per-channel arithmetic, written INDEPENDENTLY of webp_lite's
# SWAR/packed implementations (r13 review: the first encoder called
# the module's own helpers, so roundtrips were tautological for them
# — three real predictor bugs sailed through 12 green tests).

def _ch(px):
    return [(px >> s) & 0xFF for s in (24, 16, 8, 0)]


def _pack(chs):
    a, r, g, b = chs
    return (a << 24) | (r << 16) | (g << 8) | b


def _ref_avg2(x, y):
    return _pack([(cx + cy) >> 1 for cx, cy in zip(_ch(x), _ch(y))])


def _ref_select(left, top, topleft):
    p_top = sum(abs(ct - ctl) for ct, ctl in zip(_ch(top), _ch(topleft)))
    p_left = sum(abs(cl - ctl) for cl, ctl in zip(_ch(left), _ch(topleft)))
    return left if p_top < p_left else top  # ties → top


def _ref_casf(c1, c2, c3):
    return _pack([
        min(255, max(0, a + b - c))
        for a, b, c in zip(_ch(c1), _ch(c2), _ch(c3))
    ])


def _ref_cash(c1, c2, c3):
    out = []
    for a, b, c in zip(_ch(c1), _ch(c2), _ch(c3)):
        ave = (a + b) >> 1
        d = ave - c
        v = ave + (abs(d) >> 1) * (1 if d >= 0 else -1)  # trunc to 0
        out.append(min(255, max(0, v)))
    return _pack(out)


def _ref_predict(mode, left, top, topleft, topright):
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return topright
    if mode == 4:
        return topleft
    if mode == 5:
        return _ref_avg2(_ref_avg2(left, topright), top)
    if mode == 6:
        return _ref_avg2(left, topleft)
    if mode == 7:
        return _ref_avg2(left, top)
    if mode == 8:
        return _ref_avg2(topleft, top)
    if mode == 9:
        return _ref_avg2(top, topright)
    if mode == 10:
        return _ref_avg2(_ref_avg2(left, topleft), _ref_avg2(top, topright))
    if mode == 11:
        return _ref_select(left, top, topleft)
    if mode == 12:
        return _ref_casf(left, top, topleft)
    return _ref_cash(left, top, topleft)


def test_predictor_helpers_match_reference():
    """Direct (non-roundtrip) equivalence of the module's packed SWAR
    helpers against the per-channel reference over random pixels —
    the check the tautological roundtrip could not provide."""
    rng = np.random.default_rng(77)
    assert webp_lite._avg2(0x00, 0xFF) == 0x7F
    assert webp_lite._avg2(0xFF, 0xFF) == 0xFF
    for _ in range(3000):
        x, y, z = (int(v) for v in rng.integers(0, 1 << 32, 3))
        assert webp_lite._avg2(x, y) == _ref_avg2(x, y)
        assert webp_lite._select(x, y, z) == _ref_select(x, y, z)
        assert webp_lite._clamp_add_sub_full(x, y, z) == _ref_casf(x, y, z)
        assert webp_lite._clamp_add_sub_half(x, y, z) == _ref_cash(x, y, z)


# ------------------------------------------------------ image encoder

def _encode_image(bw: BitW, argb: np.ndarray, w: int, h: int,
                  use_cache_bits: int = 0, use_lz77: bool = False,
                  level0: bool = False):
    """Entropy-code one ARGB image (no meta groups; the level-0 image
    must still write the 'no meta prefix codes' bit)."""
    flat = [int(v) for v in argb.reshape(-1)]
    cache = [0] * (1 << use_cache_bits) if use_cache_bits else None

    # plan ops
    ops = []  # ("lit", px) | ("cache", idx) | ("copy", length)
    i = 0
    n = len(flat)
    while i < n:
        px = flat[i]
        if use_lz77 and i > 0 and flat[i - 1] == px:
            run = 1
            while i + run < n and flat[i + run] == px:
                run += 1
            ops.append(("copy", run))
            if cache is not None:
                for _ in range(run):
                    cache[webp_lite._cache_key(px, use_cache_bits)] = px
            i += run
            continue
        if cache is not None:
            key = webp_lite._cache_key(px, use_cache_bits)
            if cache[key] == px and i > 0:
                ops.append(("cache", key))
                i += 1
                continue
            cache[key] = px
        ops.append(("lit", px))
        i += 1

    gfreq: dict[int, int] = {}
    rfreq: dict[int, int] = {}
    bfreq: dict[int, int] = {}
    afreq: dict[int, int] = {}
    dfreq: dict[int, int] = {}
    for op in ops:
        if op[0] == "lit":
            px = op[1]
            gfreq[(px >> 8) & 0xFF] = gfreq.get((px >> 8) & 0xFF, 0) + 1
            rfreq[(px >> 16) & 0xFF] = rfreq.get((px >> 16) & 0xFF, 0) + 1
            bfreq[px & 0xFF] = bfreq.get(px & 0xFF, 0) + 1
            afreq[px >> 24] = afreq.get(px >> 24, 0) + 1
        elif op[0] == "cache":
            s = 256 + 24 + op[1]
            gfreq[s] = gfreq.get(s, 0) + 1
        else:
            code, _, _ = _inv_lz77(op[1])
            gfreq[256 + code] = gfreq.get(256 + code, 0) + 1
            dcode, _, _ = _inv_lz77(1 + 120)  # dist 1, linear form
            dfreq[dcode] = dfreq.get(dcode, 0) + 1
    for f in (rfreq, bfreq, afreq, dfreq):
        if not f:
            f[0] = 1  # decoder still reads a (possibly trivial) code

    bw.put(1 if use_cache_bits else 0, 1)
    if use_cache_bits:
        bw.put(use_cache_bits, 4)
    if level0:
        bw.put(0, 1)  # no meta prefix codes

    galpha = 256 + 24 + ((1 << use_cache_bits) if use_cache_bits else 0)
    codes = []
    for freq, alpha in ((gfreq, galpha), (rfreq, 256), (bfreq, 256),
                        (afreq, 256), (dfreq, 40)):
        lengths = _huff_lengths(freq)
        _write_prefix_code(bw, lengths, alpha)
        codes.append(_canonical_codes(lengths))
    gc, rc, bc, ac, dc = codes

    for op in ops:
        if op[0] == "lit":
            px = op[1]
            bw.put_code(*gc[(px >> 8) & 0xFF])
            bw.put_code(*rc[(px >> 16) & 0xFF])
            bw.put_code(*bc[px & 0xFF])
            bw.put_code(*ac[px >> 24])
        elif op[0] == "cache":
            bw.put_code(*gc[256 + 24 + op[1]])
        else:
            code, eb, extra = _inv_lz77(op[1])
            bw.put_code(*gc[256 + code])
            bw.put(extra, eb)
            dcode, deb, dextra = _inv_lz77(121)  # distance 1 linear
            bw.put_code(*dc[dcode])
            bw.put(dextra, deb)


def encode_vp8l(argb: np.ndarray, *, cache_bits=0, lz77=False,
                subtract_green=False, predictor_mode=None,
                color_elements=None, palette=False) -> bytes:
    """Test-side VP8L encoder: forward transforms then one
    entropy-coded image; wraps in the RIFF container."""
    h, w = argb.shape
    img = argb.astype(np.int64).copy()
    bw = BitW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version

    pending = []  # transform writer thunks, stream order

    def chan(px, s):
        return (px >> s) & 0xFF

    if predictor_mode is not None:
        m = predictor_mode
        res = img.copy()
        for y in range(h - 1, -1, -1):
            for x in range(w - 1, -1, -1):
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = int(img[0, x - 1])
                elif x == 0:
                    pred = int(img[y - 1, 0])
                else:
                    left, top = int(img[y, x - 1]), int(img[y - 1, x])
                    topleft = int(img[y - 1, x - 1])
                    topright = (
                        int(img[y - 1, x + 1]) if x + 1 < w
                        else int(img[y, 0])
                    )
                    # REFERENCE predictors only — never the module's
                    # own helpers (r13 review: tautology)
                    pred = _ref_predict(m, left, top, topleft, topright)
                px = int(img[y, x])
                res[y, x] = (
                    ((chan(px, 24) - chan(pred, 24)) & 0xFF) << 24
                    | ((chan(px, 16) - chan(pred, 16)) & 0xFF) << 16
                    | ((chan(px, 8) - chan(pred, 8)) & 0xFF) << 8
                    | ((chan(px, 0) - chan(pred, 0)) & 0xFF)
                )
        img = res
        bits = 3  # tile size 32 — one tile for small fixtures
        tw = (w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        tile_img = np.full((th, tw), 0xFF000000 | (m << 8), dtype=np.int64)

        def _wr(bw=bw, tile_img=tile_img, bits=bits, tw=tw, th=th):
            bw.put(1, 1)
            bw.put(0, 2)  # PREDICTOR
            bw.put(bits - 2, 3)
            _encode_image(bw, tile_img, tw, th)

        pending.append(_wr)

    if color_elements is not None:
        g2r, g2b, r2b = color_elements

        def s8(v):
            return (v ^ 0x80) - 0x80

        res = img.copy()
        for y in range(h):
            for x in range(w):
                px = int(img[y, x])
                a, r, g, b = chan(px, 24), chan(px, 16), chan(px, 8), chan(px, 0)
                nr = (r - ((s8(g2r & 0xFF) * s8(g)) >> 5)) & 0xFF
                nb = (b - ((s8(g2b & 0xFF) * s8(g)) >> 5)) & 0xFF
                # r2b uses the ORIGINAL red: the decoder recovers red
                # first, so its r2b delta sees the original value
                nb = (nb - ((s8(r2b & 0xFF) * s8(r)) >> 5)) & 0xFF
                res[y, x] = (a << 24) | (nr << 16) | (g << 8) | nb
        img = res
        bits = 3
        tw = (w + (1 << bits) - 1) >> bits
        th = (h + (1 << bits) - 1) >> bits
        # mask each element to its byte: Python's | with a NEGATIVE
        # int collapses the whole pixel (x | -1 == -1) — caught by the
        # r14 libwebp certification test; negative elements never
        # reached the stream correctly before
        element = (
            0xFF000000 | ((r2b & 0xFF) << 16)
            | ((g2b & 0xFF) << 8) | (g2r & 0xFF)
        )
        tile_img = np.full((th, tw), element, dtype=np.int64)

        def _wr(bw=bw, tile_img=tile_img, bits=bits, tw=tw, th=th):
            bw.put(1, 1)
            bw.put(1, 2)  # COLOR
            bw.put(bits - 2, 3)
            _encode_image(bw, tile_img, tw, th)

        pending.append(_wr)

    if subtract_green:
        res = img.copy()
        for y in range(h):
            for x in range(w):
                px = int(img[y, x])
                g = chan(px, 8)
                res[y, x] = (
                    (px & 0xFF00FF00)
                    | (((chan(px, 16) - g) & 0xFF) << 16)
                    | ((chan(px, 0) - g) & 0xFF)
                )
        img = res

        def _wr(bw=bw):
            bw.put(1, 1)
            bw.put(2, 2)  # SUBTRACT GREEN

        pending.append(_wr)

    xsize = w
    if palette:
        colors = []
        index = {}
        for v in img.reshape(-1):
            if int(v) not in index:
                index[int(v)] = len(colors)
                colors.append(int(v))
        assert len(colors) <= 256
        n_colors = len(colors)
        if n_colors <= 2:
            pbits = 3
        elif n_colors <= 4:
            pbits = 2
        elif n_colors <= 16:
            pbits = 1
        else:
            pbits = 0
        idx = np.vectorize(lambda v: index[int(v)])(img)
        if pbits:
            per = 1 << pbits
            ibits = 8 >> pbits
            xsize = (w + per - 1) // per
            packed = np.zeros((h, xsize), dtype=np.int64)
            for x in range(w):
                packed[:, x // per] |= idx[:, x] << ((x % per) * ibits)
            img = 0xFF000000 | (packed << 8)
        else:
            img = 0xFF000000 | (idx.astype(np.int64) << 8)
            xsize = w
        # delta-coded palette image
        deltas = []
        prev = 0
        for c in colors:
            deltas.append(
                ((chan(c, 24) - chan(prev, 24)) & 0xFF) << 24
                | ((chan(c, 16) - chan(prev, 16)) & 0xFF) << 16
                | ((chan(c, 8) - chan(prev, 8)) & 0xFF) << 8
                | ((chan(c, 0) - chan(prev, 0)) & 0xFF)
            )
            prev = c
        pal_img = np.array(deltas, dtype=np.int64).reshape(1, n_colors)

        def _wr(bw=bw, pal_img=pal_img, n_colors=n_colors):
            bw.put(1, 1)
            bw.put(3, 2)  # COLOR_INDEXING
            bw.put(n_colors - 1, 8)
            _encode_image(bw, pal_img, n_colors, 1)

        pending.append(_wr)

    for thunk in pending:
        thunk()
    bw.put(0, 1)  # no more transforms
    _encode_image(bw, img, xsize, h, use_cache_bits=cache_bits,
                  use_lz77=lz77, level0=True)

    payload = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\0"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _roundtrip(argb: np.ndarray, **kw) -> None:
    blob = encode_vp8l(argb, **kw)
    st = webp_lite.decode_vp8l(
        blob[blob.index(b"VP8L") + 8:]
    )
    got = st["argb"].astype(np.int64)
    assert got.shape == argb.shape, kw
    if not (got == argb.astype(np.int64)).all():
        bad = np.argwhere(got != argb)
        raise AssertionError(
            f"pixel mismatch at {bad[:4]} kw={kw}: "
            f"{[hex(int(got[tuple(p)])) for p in bad[:4]]} vs "
            f"{[hex(int(argb[tuple(p)])) for p in bad[:4]]}"
        )


def _rand_argb(rng, h, w, distinct=None):
    if distinct:
        pool = (
            0xFF000000
            | rng.integers(0, 1 << 24, distinct).astype(np.int64)
        )
        return pool[rng.integers(0, distinct, (h, w))]
    return (
        0xFF000000 | rng.integers(0, 1 << 24, (h, w)).astype(np.int64)
    )


# ----------------------------------------------------------- the tests

def test_prefix_code_hand_vector_with_repeats():
    """Hand-built normal prefix code exercising CLC symbols 16
    (repeat-previous) and 17/18 (zero runs): alphabet 300 where
    symbols 0..3 get length 2 (symbol 0 plainly, 1..3 via one code
    16 with repeat=3) and every other symbol is zeroed by
    18(138) + 18(138) + 18(20) runs. Kraft: 4 x 2^-2 = 1, complete.
    All bits below come from the test's own writer — independent of
    both the module and the roundtrip encoder."""
    clc_lengths = {2: 2, 16: 2, 17: 2, 18: 2}
    codes = _canonical_codes(clc_lengths)

    def build(zero_runs):
        bw = BitW()
        bw.put(0, 1)        # normal form
        bw.put(19 - 4, 4)   # all 19 CLC lengths transmitted
        for sym in webp_lite._CLC_ORDER:
            bw.put(clc_lengths.get(sym, 0), 3)
        bw.put(0, 1)        # no max-symbol limit
        bw.put_code(*codes[2])    # symbol 0: length 2
        bw.put_code(*codes[16])   # repeat previous length 3-6 times
        bw.put(0, 2)              # +3 → symbols 1,2,3 at length 2
        for run in zero_runs:     # zero out symbols 4..299
            bw.put_code(*codes[18])
            bw.put(run - 11, 7)
        return bw.bytes()

    blob = build((138, 138, 20))  # 296 zeros: complete
    code = webp_lite._read_prefix_code(webp_lite._Bits(blob), 300)
    # canonical order at length 2: symbols 0..3 get codes 00,01,10,11
    # (MSB-first within the codeword, bits read LSB-first from bytes)
    assert [code.read(webp_lite._Bits(bytes([b]))) for b in
            (0b00, 0b10, 0b01, 0b11)] == [0, 1, 2, 3]
    # symbol 17 path too: 8-zero run variant keeps the code complete
    bw_tail_17 = build((138, 138))  # only 276 zeros; finish with 17s
    # appending via a fresh build is simpler: 17 covers 3..10 zeros
    bw = BitW()
    bw.put(0, 1)
    bw.put(19 - 4, 4)
    for sym in webp_lite._CLC_ORDER:
        bw.put(clc_lengths.get(sym, 0), 3)
    bw.put(0, 1)
    bw.put_code(*codes[2])
    bw.put_code(*codes[16])
    bw.put(0, 2)
    bw.put_code(*codes[18])
    bw.put(138 - 11, 7)
    bw.put_code(*codes[18])
    bw.put(138 - 11, 7)
    for _ in range(2):            # 2 x 10-zero runs via 17
        bw.put_code(*codes[17])
        bw.put(10 - 3, 3)
    code = webp_lite._read_prefix_code(webp_lite._Bits(bw.bytes()), 300)
    assert code.read(webp_lite._Bits(bytes([0b11]))) == 3


def test_simple_codes_and_zero_bit_tree():
    bw = BitW()
    bw.put(1, 1)   # simple
    bw.put(1, 1)   # two symbols
    bw.put(1, 1)   # first is 8-bit
    bw.put(200, 8)
    bw.put(7, 8)
    br = webp_lite._Bits(bw.bytes())
    code = webp_lite._read_prefix_code(br, 256)
    # canonical: lower symbol gets code 0
    r = webp_lite._Bits(bytes([0b10]))
    assert code.read(r) == 7 and code.read(r) == 200
    # single-symbol tree consumes no bits
    bw = BitW()
    bw.put(1, 1)
    bw.put(0, 1)
    bw.put(1, 1)
    bw.put(99, 8)
    code = webp_lite._read_prefix_code(webp_lite._Bits(bw.bytes()), 256)
    assert code.read(webp_lite._Bits(b"")) == 99


def test_distance_neighborhood_invariants():
    tbl = webp_lite._DIST_NEIGHBORS
    assert len(tbl) == 120
    assert len(set(tbl)) == 120
    for dx, dy in tbl:
        assert 0 <= dy <= 7 and -7 <= dx <= 8
        if dy == 0:
            assert dx > 0  # strictly backward references only
    # mapping: code 1 → (0,1) → width; code 2 → (1,0) → 1
    assert webp_lite._dist_map(1, 10) == 10
    assert webp_lite._dist_map(2, 10) == 1
    assert webp_lite._dist_map(121, 10) == 1  # linear region


def test_roundtrip_literals_and_shapes():
    rng = np.random.default_rng(5)
    for h, w in ((1, 1), (1, 7), (5, 1), (4, 6), (11, 13)):
        _roundtrip(_rand_argb(rng, h, w))


def test_roundtrip_lz77_and_cache():
    rng = np.random.default_rng(6)
    img = _rand_argb(rng, 8, 9, distinct=4)  # runs + repeats
    _roundtrip(img, lz77=True)
    _roundtrip(img, cache_bits=4)
    _roundtrip(img, lz77=True, cache_bits=6)


def test_roundtrip_each_transform():
    rng = np.random.default_rng(7)
    img = _rand_argb(rng, 6, 10, distinct=9)
    _roundtrip(img, subtract_green=True)
    for mode in range(14):  # every predictor mode, 0..13
        _roundtrip(img, predictor_mode=mode)
    _roundtrip(img, color_elements=(0x30, 0xE0, 0x15))
    _roundtrip(img, palette=True)            # 9 colors → 1-bit... 4-bit
    _roundtrip(_rand_argb(rng, 3, 17, distinct=2), palette=True)  # 8/byte
    _roundtrip(_rand_argb(rng, 5, 9, distinct=3), palette=True)
    _roundtrip(_rand_argb(rng, 4, 4, distinct=16), palette=True)
    big_pal = _rand_argb(rng, 8, 40, distinct=200)
    _roundtrip(big_pal, palette=True)        # unbundled path


def test_roundtrip_stacked_transforms():
    rng = np.random.default_rng(8)
    img = _rand_argb(rng, 7, 12, distinct=6)
    _roundtrip(img, subtract_green=True, predictor_mode=7)
    _roundtrip(img, color_elements=(0x11, 0x22, 0x33),
               predictor_mode=2, lz77=True)
    _roundtrip(img, subtract_green=True, palette=True, cache_bits=3)


def test_roundtrip_fuzz():
    rng = np.random.default_rng(9)
    for trial in range(40):
        h = int(rng.integers(1, 14))
        w = int(rng.integers(1, 14))
        distinct = int(rng.integers(2, 30))
        img = _rand_argb(rng, h, w, distinct=distinct)
        kw = {}
        if trial % 2:
            kw["lz77"] = True
        if trial % 3 == 0:
            kw["cache_bits"] = int(rng.integers(1, 8))
        if trial % 5 == 0:
            kw["subtract_green"] = True
        if trial % 7 == 0:
            kw["predictor_mode"] = trial % 14
        _roundtrip(img, **kw)


def test_container_and_routing():
    rng = np.random.default_rng(10)
    img = _rand_argb(rng, 3, 5, distinct=4)
    blob = encode_vp8l(img)
    st = media.real_decode(blob, "image/webp")
    exp = float(
        (((img >> 16) & 0xFF) + ((img >> 8) & 0xFF) + (img & 0xFF))
        .mean() / 3.0 / 255.0
    )
    assert (st["width"], st["height"], st["n_frames"]) == (5, 3, 1)
    assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12)

    # lossy VP8 (r14): REAL intra keyframe decode through vp8_lite —
    # an all-DC zero-residual keyframe reconstructs flat 128 luma
    from tests.vp8_enc import encode_keyframe, wrap_webp
    from pythondataingestionprocess_spark.multimodal.vp8_lite import DC_PRED

    payload = encode_keyframe(
        32, 16, [{"ymode": DC_PRED, "uv": DC_PRED}] * 2
    )
    st = media.real_decode(wrap_webp(payload), "image/webp")
    assert (st["width"], st["height"], st["n_frames"]) == (32, 16, 1)
    assert st["mean_intensity"] == pytest.approx(128 / 255.0, abs=1e-12)

    # VP8X animation: canvas dims + ANMF count; frames with no inner
    # image chunk stay honestly NULL (r14: frames WITH one decode for
    # real — test_vp8x_animation_first_frame_decodes)
    vp8x = b"VP8X" + struct.pack("<I", 10) + bytes(4) + (
        (639).to_bytes(3, "little") + (479).to_bytes(3, "little")
    )
    anmf = (b"ANMF" + struct.pack("<I", 16) + bytes(16)) * 3
    blob = b"RIFF" + struct.pack(
        "<I", 4 + len(vp8x) + len(anmf)
    ) + b"WEBP" + vp8x + anmf
    st = media.real_decode(blob, "image/webp")
    assert (st["width"], st["height"], st["n_frames"]) == (640, 480, 3)


def test_rejects():
    with pytest.raises(ValueError, match="RIFF/WEBP"):
        webp_lite.decode(b"RIFFxxxxWAVExxxx")
    with pytest.raises(ValueError, match="signature"):
        webp_lite.decode_vp8l(b"\x30aaaa")
    rng = np.random.default_rng(11)
    blob = encode_vp8l(_rand_argb(rng, 3, 3))
    with pytest.raises(ValueError):
        payload = blob[blob.index(b"VP8L") + 8:]
        webp_lite.decode_vp8l(payload[: len(payload) // 2])


def test_meta_prefix_groups_hand_built():
    """Two prefix-code groups selected by a meta image (tile bits 2 →
    4-pixel tiles): pixels 0-3 decode through group 0 (greens from
    {0x11}), pixels 4-7 through group 1 (greens from {0x77}) — the
    groups' codes are DISJOINT so a group-selection bug cannot decode
    the stream."""
    bw = BitW()
    bw.put(8 - 1, 14)
    bw.put(1 - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)   # no transforms
    bw.put(0, 1)   # no color cache
    bw.put(1, 1)   # USE meta prefix codes
    bw.put(0, 3)   # meta_bits = 2 → 4-px tiles; meta image is 2x1
    # meta image (is_level0=False): greens 0 and 1 = group indices
    meta = np.array([[0xFF000000, 0xFF000100]], dtype=np.int64)
    _encode_image(bw, meta, 2, 1)
    # group 0: all-constant codes (single-symbol, zero bits/pixel)
    for lengths, alpha in (
        ({0x11: 1}, 256 + 24), ({0xA0: 1}, 256), ({0xB0: 1}, 256),
        ({0xFF: 1}, 256), ({0: 1}, 40),
    ):
        _write_prefix_code(bw, lengths, alpha)
    # group 1
    for lengths, alpha in (
        ({0x77: 1}, 256 + 24), ({0xC0: 1}, 256), ({0xD0: 1}, 256),
        ({0xFF: 1}, 256), ({0: 1}, 40),
    ):
        _write_prefix_code(bw, lengths, alpha)
    # pixels: all single-symbol codes → zero data bits
    payload = b"\x2f" + bw.bytes()
    st = webp_lite.decode_vp8l(payload)
    row = [int(v) for v in st["argb"].reshape(-1)]
    assert row[:4] == [0xFFA011B0] * 4
    assert row[4:] == [0xFFC077D0] * 4


def test_lz77_2d_distance_neighborhood_hand_built():
    """A backref with distance code 1 — the (0, 1) neighbor — must
    copy from exactly one ROW above (distance = width), pinning the
    2D mapping through a decode rather than just table invariants."""
    w, h = 5, 2
    row_px = [0xFF000000 | (g << 8) for g in (1, 2, 3, 4, 5)]
    bw = BitW()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)   # no transforms
    bw.put(0, 1)   # no cache
    bw.put(0, 1)   # no meta
    # green: literals 1..5 + length code for length 5 (prefix 256+?)
    lcode, leb, lextra = _inv_lz77(5)
    glengths = _huff_lengths({g: 1 for g in (1, 2, 3, 4, 5)} | {256 + lcode: 1})
    _write_prefix_code(bw, glengths, 256 + 24)
    for lengths, alpha in (
        ({0: 1}, 256), ({0: 1}, 256), ({0xFF: 1}, 256),
    ):
        _write_prefix_code(bw, lengths, alpha)
    _write_prefix_code(bw, {1 - 1: 1}, 40)  # dist prefix code 0 → value 1
    gc = _canonical_codes(glengths)
    for g in (1, 2, 3, 4, 5):
        bw.put_code(*gc[g])  # r/b/a are zero-bit single-symbol codes
    bw.put_code(*gc[256 + lcode])
    bw.put(lextra, leb)
    # dist tree is single-symbol (code 0 → _lz77_extra → 1 → neighbor
    # (0,1) → distance w): zero bits
    payload = b"\x2f" + bw.bytes()
    st = webp_lite.decode_vp8l(payload)
    got = st["argb"].reshape(2, 5)
    assert [int(v) for v in got[0]] == row_px
    assert [int(v) for v in got[1]] == row_px  # copied from one row up


def test_vp8l_test_encoder_certified_by_libwebp():
    """r14: the system libwebp (independent implementation, ctypes
    test gate) must decode the TEST-SIDE encoder's streams to exactly
    the input pixels, for every transform combination. This closes
    the encoder half of the roundtrip loop externally: the engine
    decoder is pinned against this encoder by the tests above, and
    the encoder is now pinned against libwebp — so a matched
    encoder/decoder misreading of the format can no longer hide."""
    import ctypes

    from tests import libwebp_ref as lref

    lib = lref.load()
    if lib is None:
        pytest.skip("system libwebp not available")
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)

    def dec_rgba(blob):
        w = ctypes.c_int()
        h = ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            blob, ctypes.c_size_t(len(blob)), ctypes.byref(w), ctypes.byref(h)
        )
        assert p, "libwebp rejected the test-encoder stream"
        arr = np.ctypeslib.as_array(p, shape=(h.value, w.value, 4)).copy()
        lib.WebPFree(p)
        return arr

    rng = np.random.default_rng(9)
    combos = [
        {},
        {"lz77": True},
        {"cache_bits": 4},
        {"lz77": True, "cache_bits": 6},
        {"subtract_green": True},
        {"predictor_mode": 2},
        {"predictor_mode": 11, "lz77": True},
        {"color_elements": (12, -7, 5)},
        {"palette": True},
        {"palette": True, "lz77": True},
        {"subtract_green": True, "predictor_mode": 5, "cache_bits": 3},
    ]
    for kw in combos:
        h, w = int(rng.integers(5, 40)), int(rng.integers(5, 40))
        img = _rand_argb(rng, h, w, distinct=(7 if kw.get("palette") else None))
        blob = encode_vp8l(img, **kw)
        rgba = dec_rgba(blob)
        got = (
            rgba[:, :, 3].astype(np.int64) << 24
            | rgba[:, :, 0].astype(np.int64) << 16
            | rgba[:, :, 1].astype(np.int64) << 8
            | rgba[:, :, 2].astype(np.int64)
        )
        assert np.array_equal(got, img & 0xFFFFFFFF), kw
        # and the engine decoder agrees with libwebp's RGB mean
        st = webp_lite.decode(blob)
        exp = rgba[:, :, :3].astype(np.float64).mean() / 255.0
        assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12), kw


def test_vp8l_decoder_certified_on_real_libwebp_streams():
    """r14: REAL lossless streams from the system libwebp's own
    encoder — encoder-chosen feature stacks the test-side encoder
    never emits (META prefix groups, combined predictor+color
    transforms, encoder-tuned caches/LZ77). Opaque images must
    roundtrip to the exact input; random-alpha images are compared
    against libwebp's own decode (the simple lossless API is NOT
    RGB-exact under transparency — cleanup is the encoder's
    documented default, not decoder drift)."""
    import ctypes

    from tests import libwebp_ref as lref

    lib = lref.load()
    if lib is None:
        pytest.skip("system libwebp not available")
    lib.WebPEncodeLosslessRGBA.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGBA.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
    ]
    lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)

    def enc(img):
        h, w, _ = img.shape
        out = ctypes.POINTER(ctypes.c_uint8)()
        n = lib.WebPEncodeLosslessRGBA(
            np.ascontiguousarray(img).tobytes(), w, h, w * 4,
            ctypes.byref(out),
        )
        assert n
        blob = bytes(bytearray(
            ctypes.cast(out, ctypes.POINTER(ctypes.c_uint8 * n)).contents
        ))
        lib.WebPFree(out)
        return blob

    def dec(blob):
        wv = ctypes.c_int()
        hv = ctypes.c_int()
        p = lib.WebPDecodeRGBA(
            blob, ctypes.c_size_t(len(blob)), ctypes.byref(wv),
            ctypes.byref(hv),
        )
        arr = np.ctypeslib.as_array(p, shape=(hv.value, wv.value, 4)).copy()
        lib.WebPFree(p)
        return arr

    rng = np.random.default_rng(21)
    cases = []
    noise = rng.integers(0, 256, (64, 48, 4)).astype(np.uint8)
    noise[:, :, 3] = 255
    cases.append(("noise-opaque", noise, True))
    half = np.zeros((128, 256, 4), np.uint8)
    half[:, :128] = rng.integers(0, 256, (128, 128, 4)).astype(np.uint8)
    half[:, :, 3] = 255
    cases.append(("half-noise META groups", half, True))
    yy, xx = np.mgrid[0:200, 0:300]
    photo = np.stack([
        (128 + 90 * np.sin(yy / 4) * np.cos(xx / 5)).clip(0, 255),
        (100 + 90 * np.cos(yy / 3 + xx / 9)).clip(0, 255),
        (90 + 90 * np.sin((xx * yy) / 700)).clip(0, 255),
        np.full(yy.shape, 255),
    ], axis=2).astype(np.uint8)
    cases.append(("photo predictor+color+META", photo, True))
    randalpha = rng.integers(0, 256, (64, 48, 4)).astype(np.uint8)
    cases.append(("random alpha (vs libwebp decode)", randalpha, False))
    for name, img, exact in cases:
        blob = enc(img)
        st = webp_lite.decode(blob)
        if exact:
            exp = img[:, :, :3].astype(np.float64).mean() / 255.0
        else:
            rgba = dec(blob)
            exp = rgba[:, :, :3].astype(np.float64).mean() / 255.0
        assert st["mean_intensity"] == pytest.approx(exp, abs=1e-12), name
        assert (st["width"], st["height"]) == (img.shape[1], img.shape[0])


def test_oversize_lossy_keyframe_keeps_header_dimensions():
    """A lossy still past the 2MP decode guard (any >1080p photo) must
    keep its REAL keyframe-header dimensions with honest NULL stats —
    not quarantine the whole file (r14 ADVICE)."""
    # keyframe tag (bit0=0), start code, 2000x2000 (4MP > guard)
    hdr = bytes([0x00, 0x00, 0x00]) + b"\x9d\x01\x2a" + struct.pack(
        "<HH", 2000, 2000
    )
    payload = hdr + bytes(64)
    chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
    st = webp_lite.decode(blob)
    assert (st["width"], st["height"], st["n_frames"]) == (2000, 2000, 1)
    assert st["mean_intensity"] is None
    # a broken START CODE is still a hard reject (dims unparseable)
    bad = bytearray(blob)
    bad[blob.index(b"\x9d\x01\x2a")] = 0x00
    with pytest.raises(ValueError, match="VP8"):
        webp_lite.decode(bytes(bad))
