"""Baseline JPEG pixel decode (multimodal/jpeg_lite.decode, r10).

Fixtures implement the T.81 ENCODER side independently (canonical
Huffman emission, zigzag, byte stuffing, restart markers) so the
decoder is checked against the spec, not against itself. Analytic
expectations: a DC-only block IDCTs to the flat value dc/8 + 128, and
a single AC(0,1) coefficient of amplitude a contributes mean 0 and
std exactly a/8 — so mean pins the DC path and std pins the AC path.
"""

from __future__ import annotations

import math
import struct

import pytest

from pythondataingestionprocess_spark.multimodal import jpeg_lite

# zigzag position -> natural index (same public constant the decoder
# uses; trivial enough that sharing it is not self-checking)
ZZ = jpeg_lite._ZZ


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def put(self, value: int, nbits: int) -> None:
        for k in range(nbits - 1, -1, -1):
            self.cur = (self.cur << 1) | ((value >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.cur)
                if self.cur == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.cur = 0
                self.n = 0

    def align(self) -> None:
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s

    def raw_marker(self, byte2: int) -> None:
        self.align()
        self.out += bytes([0xFF, byte2])


# one shared Huffman table (used for DC and AC classes alike): the
# first 15 symbols take 4-bit canonical codes, the rest 5-bit —
# canonical code assignment written out here independently of the
# decoder's table builder
_SYMBOLS = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 0x11, 0x21, 0xF0,
    0x25, 0x35,
]
_BITS = [0] * 16
_BITS[3] = min(len(_SYMBOLS), 15)
_BITS[4] = len(_SYMBOLS) - _BITS[3]
_CODE = {}
_c = 0
_k = 0
for _ln in range(1, 17):
    for _ in range(_BITS[_ln - 1]):
        _CODE[_SYMBOLS[_k]] = (_c, _ln)
        _c += 1
        _k += 1
    _c <<= 1


def _dht(cls: int, tid: int) -> bytes:
    body = bytes([cls << 4 | tid]) + bytes(_BITS) + bytes(_SYMBOLS)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _dqt(tid: int) -> bytes:
    body = bytes([tid]) + bytes([1] * 64)  # all-ones: dequant no-op
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _sof0(w: int, h: int, comps: list[tuple[int, int, int]]) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hs, vs in comps:
        body += bytes([cid, hs << 4 | vs, 0])
    return b"\xff\xc0" + struct.pack(">H", len(body) + 2) + body


def _sos(comp_ids: list[int]) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([0, 63, 0])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _emit_value(w: _BitWriter, v: int) -> int:
    """Return the size category and write the value bits."""
    size = v.bit_length() if v >= 0 else (-v).bit_length()
    if size:
        w.put(v if v >= 0 else v + (1 << size) - 1, size)
    return size


def _emit_block(w: _BitWriter, dc_diff: int, ac: dict[int, int]) -> None:
    """dc_diff plus {zigzag position -> value} AC coefficients."""
    bw = _BitWriter()  # size probe only
    size = _emit_value(bw, dc_diff)
    w.put(*_CODE[size])
    _emit_value(w, dc_diff)
    k = 1
    for pos in sorted(ac):
        run = pos - k
        while run > 15:
            w.put(*_CODE[0xF0])  # ZRL
            run -= 16
        v = ac[pos]
        size = v.bit_length() if v >= 0 else (-v).bit_length()
        w.put(*_CODE[run << 4 | size])
        _emit_value(w, v)
        k = pos + 1
    if k <= 63:
        w.put(*_CODE[0])  # EOB


def _gray_jpeg(w: int, h: int, blocks: list[tuple[int, dict[int, int]]],
               dri: int = 0) -> bytes:
    """Grayscale baseline JPEG; blocks = [(dc_ABSOLUTE, ac_dict), ...]
    in MCU order. With dri=1, a RSTn rides between every MCU and DC
    predictors reset (absolute re-encoding), exactly per §F.2.2.5."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += _sof0(w, h, [(1, 1, 1)]) + _sos([1])
    bw = _BitWriter()
    pred, seq = 0, 0
    for i, (dc, ac) in enumerate(blocks):
        if dri and i and i % dri == 0:
            bw.raw_marker(0xD0 + (seq & 7))
            seq += 1
            pred = 0
        _emit_block(bw, dc - pred, ac)
        pred = dc
    bw.align()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_dc_only_uniform_block():
    """coeff[0,0] = 160 with unit quant IDCTs to the flat value
    160/8 + 128 = 148 everywhere."""
    jpg = _gray_jpeg(8, 8, [(160, {})])
    got = jpeg_lite.decode(jpg)
    assert (got["width"], got["height"]) == (8, 8)
    assert got["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)
    assert got["std_intensity"] == pytest.approx(0.0, abs=1e-9)


def test_two_blocks_dc_differential():
    """Second block's DC is coded as a DIFFERENCE; means average."""
    jpg = _gray_jpeg(16, 8, [(160, {}), (-160, {})])
    got = jpeg_lite.decode(jpg)
    assert got["mean_intensity"] == pytest.approx(
        ((148) + (128 - 20)) / 2 / 255, abs=1e-9
    )


def test_single_ac_coefficient_std_is_analytic():
    """AC(0,1) amplitude 40: mean unchanged (every AC basis function
    integrates to zero), std exactly 40/8 = 5 gray levels — the AC
    path's numeric witness."""
    jpg = _gray_jpeg(8, 8, [(0, {1: 40})])
    got = jpeg_lite.decode(jpg)
    assert got["mean_intensity"] == pytest.approx(128 / 255, abs=1e-9)
    assert got["std_intensity"] == pytest.approx(5 / 255, rel=1e-9)


def test_zrl_long_zero_run():
    """A coefficient at zigzag position 20 behind a 15+ zero run
    exercises the ZRL symbol; std stays analytic: a/8."""
    jpg = _gray_jpeg(8, 8, [(0, {20: 24})])
    got = jpeg_lite.decode(jpg)
    assert got["std_intensity"] == pytest.approx(3 / 255, rel=1e-9)


def test_ycbcr_420_uses_luma_only():
    """4:2:0 MCU = 4 Y blocks + Cb + Cr. Chroma blocks carry big DCs
    that MUST NOT move the intensity stats; the four Y DCs set the
    quadrant means."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    out += _sof0(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)]) + _sos([1, 2, 3])
    bw = _BitWriter()
    pred = 0
    for dc in [160, 160, -160, -160]:  # Y blocks, differential
        _emit_block(bw, dc - pred, {})
        pred = dc
    _emit_block(bw, 400, {})   # Cb (own predictor chain)
    _emit_block(bw, -400, {})  # Cr
    bw.align()
    jpg = bytes(out) + bw.out + b"\xff\xd9"
    got = jpeg_lite.decode(jpg)
    assert (got["width"], got["height"], got["n_components"]) == (16, 16, 3)
    assert got["mean_intensity"] == pytest.approx(
        (148 + 108) / 2 / 255, abs=1e-9
    )


def test_restart_interval_resets_predictor():
    """DRI=1: an RST0 sits between the two MCUs, the second block's DC
    is re-coded ABSOLUTE — a decoder that kept the predictor would be
    off by 160/8 = 20 gray levels."""
    jpg = _gray_jpeg(16, 8, [(160, {}), (160, {})], dri=1)
    assert b"\xff\xd0" in jpg
    got = jpeg_lite.decode(jpg)
    assert got["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)
    assert got["std_intensity"] == pytest.approx(0.0, abs=1e-9)


def test_edge_crop_partial_mcu():
    """12x8 image spans two MCUs horizontally; the right block's
    overhang is padding and must not enter the stats."""
    jpg = _gray_jpeg(12, 8, [(160, {}), (-160, {})])
    got = jpeg_lite.decode(jpg)
    # 8 columns at 148, 4 visible columns at 108
    assert got["mean_intensity"] == pytest.approx(
        (8 * 148 + 4 * 108) / 12 / 255, abs=1e-9
    )


def test_progressive_raises_and_media_falls_back():
    """SOF2 raises; media.real_decode keeps header metadata with NULL
    mean (the documented fallback)."""
    from pythondataingestionprocess_spark.multimodal import media

    jpg = bytearray(_gray_jpeg(8, 8, [(160, {})]))
    i = jpg.index(b"\xff\xc0")
    jpg[i + 1] = 0xC2  # rewrite SOF0 -> SOF2
    with pytest.raises(ValueError, match="SOF2|unsupported"):
        jpeg_lite.decode(bytes(jpg))
    stats = media.real_decode(bytes(jpg), "image")
    assert (stats["width"], stats["height"]) == (8, 8)
    assert stats["mean_intensity"] is None


def test_real_decode_routes_baseline_jpeg():
    from pythondataingestionprocess_spark.multimodal import media

    stats = media.real_decode(_gray_jpeg(8, 8, [(160, {})]), "image")
    assert stats["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)
    assert (stats["width"], stats["height"], stats["n_frames"]) == (8, 8, 1)


def test_truncated_entropy_keeps_header_metadata():
    from pythondataingestionprocess_spark.multimodal import media

    jpg = _gray_jpeg(8, 8, [(160, {})])
    cut = jpg[: jpg.index(b"\xff\xda") + 8]  # SOS header, no data
    with pytest.raises(ValueError):
        jpeg_lite.decode(cut)
    stats = media.real_decode(cut, "image")
    assert stats["width"] == 8 and stats["mean_intensity"] is None


def test_quant_table_applied():
    """Quant value scales the DC: with q[0] = 2 the same coded DC 80
    dequantizes to 160 -> flat 148 again."""
    jpg = bytearray(_gray_jpeg(8, 8, [(80, {})]))
    i = jpg.index(b"\xff\xdb")
    jpg[i + 5] = 2  # first quant entry (DC) : 1 -> 2
    got = jpeg_lite.decode(bytes(jpg))
    assert got["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)


def test_pixel_grid_against_reference_idct():
    """Full numeric cross-check: a block with several AC terms decoded
    by the module must match a from-scratch double-precision IDCT-III
    loop (written here independently) through the mean/std pair."""
    ac = {1: 40, 2: -24, 5: 17, 9: 31}
    jpg = _gray_jpeg(8, 8, [(48, ac)])
    got = jpeg_lite.decode(jpg)

    coeff = [[0.0] * 8 for _ in range(8)]
    coeff[0][0] = 48
    for pos, v in ac.items():
        nat = ZZ[pos]
        coeff[nat // 8][nat % 8] = float(v)

    def c(u):
        return 1 / math.sqrt(2) if u == 0 else 1.0

    px = []
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        c(u) * c(v) / 4 * coeff[u][v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            px.append(min(255.0, max(0.0, s + 128.0)))
    mean = sum(px) / 64
    std = math.sqrt(sum((p - mean) ** 2 for p in px) / 64)
    assert got["mean_intensity"] == pytest.approx(mean / 255, rel=1e-9)
    assert got["std_intensity"] == pytest.approx(std / 255, rel=1e-9)
