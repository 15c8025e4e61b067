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
# first 13 symbols take 4-bit canonical codes, the rest 5-bit (Kraft:
# 13/16 + 6/32 = 1 — a complete code) — canonical code assignment
# written out here independently of the decoder's table builder.
# 0x10/0x20/0x30 are the progressive EOBn symbols (EOB runs of
# 2-3 / 4-7 / 8-15 blocks).
_SYMBOLS = [
    0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 0x11, 0x21, 0xF0,
    0x25, 0x35, 0x10, 0x20, 0x30,
]
_BITS = [0] * 16
_BITS[3] = min(len(_SYMBOLS), 13)
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


def test_arithmetic_raises_and_media_falls_back():
    """SOF9 (arithmetic sequential) raises — arithmetic entropy coding
    stays out of scope; media.real_decode keeps header metadata with
    NULL mean (the documented fallback). Was the SOF2 fallback test
    until r12 made progressive decode real."""
    from pythondataingestionprocess_spark.multimodal import media

    jpg = bytearray(_gray_jpeg(8, 8, [(160, {})]))
    i = jpg.index(b"\xff\xc0")
    jpg[i + 1] = 0xC9  # rewrite SOF0 -> SOF9
    with pytest.raises(ValueError, match="SOF9|unsupported"):
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


# ---- progressive decode (r12, T.81 §G) ------------------------------

def _sos_prog(comp_ids: list[int], ss: int, se: int, ah: int,
              al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0, AC table 0
    body += bytes([ss, se, ah << 4 | al])
    return b"\xff\xda" + struct.pack(">H", len(body) + 2) + body


def _scan_bytes(emit) -> bytes:
    """Run an emitter over a fresh writer, return the aligned bytes."""
    w = _BitWriter()
    emit(w)
    w.align()
    return bytes(w.out)


def _prog_gray(w: int, h: int, scans: list[tuple[bytes, bytes]]) -> bytes:
    """Grayscale PROGRESSIVE JPEG from (sos_header, entropy_bytes)
    pairs; SOF2 with the shared tables."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    sof = _sof0(w, h, [(1, 1, 1)])
    out += b"\xff\xc2" + sof[2:]  # same layout, SOF2 marker
    for sos, data in scans:
        out += sos + data
    out += b"\xff\xd9"
    return bytes(out)


def _emit_dc_first(w: _BitWriter, dcs: list[int], al: int) -> None:
    pred = 0
    for dc in dcs:
        diff = (dc >> al) - pred
        pred = dc >> al
        size = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        w.put(*_CODE[size])
        _emit_value(w, diff)


def test_progressive_dc_two_stage_successive_approximation():
    """DC first scan at Al=1 codes 161>>1 = 80; the refinement scan
    appends the low bit (1) -> 161, flat value 161/8 + 128."""
    scans = [
        (_sos_prog([1], 0, 0, 0, 1),
         _scan_bytes(lambda w: _emit_dc_first(w, [161], al=1))),
        (_sos_prog([1], 0, 0, 1, 0),
         _scan_bytes(lambda w: w.put(161 & 1, 1))),
    ]
    got = jpeg_lite.decode(_prog_gray(8, 8, scans))
    assert got["mean_intensity"] == pytest.approx(
        (161 / 8 + 128) / 255, abs=1e-9
    )
    assert got["std_intensity"] == pytest.approx(0.0, abs=1e-9)


def test_progressive_ac_band_and_refinement_bits():
    """AC(0,1) = 45 arrives in three scans: first scan at Al=2 codes
    45>>2 = 11 (stored 44), refinement at Al=1 appends bit 0,
    refinement at Al=0 appends bit 1 (44 -> 45). std = 45/8 exactly —
    a wrong correction-bit path misses by 1/8 gray level."""
    def ac_first(w):
        w.put(*_CODE[0x04])      # run 0, size 4
        _emit_value(w, 45 >> 2)  # 11
        w.put(*_CODE[0x00])      # EOB

    def ac_refine_bit(bit):
        # one nonzero-history coeff in band: EOB0 then its correction
        # bit rides the EOB path of THIS block
        def emit(w):
            w.put(*_CODE[0x00])  # EOB1 (r=0): eobrun=1, current block
            w.put(bit, 1)        # correction bit for coeff at pos 1
        return emit

    scans = [
        (_sos_prog([1], 0, 0, 0, 0),
         _scan_bytes(lambda w: _emit_dc_first(w, [0], al=0))),
        (_sos_prog([1], 1, 63, 0, 2), _scan_bytes(ac_first)),
        (_sos_prog([1], 1, 63, 2, 1),
         _scan_bytes(ac_refine_bit((45 >> 1) & 1))),   # 0
        (_sos_prog([1], 1, 63, 1, 0),
         _scan_bytes(ac_refine_bit(45 & 1))),          # 1
    ]
    got = jpeg_lite.decode(_prog_gray(8, 8, scans))
    assert got["mean_intensity"] == pytest.approx(128 / 255, abs=1e-9)
    assert got["std_intensity"] == pytest.approx(45 / 8 / 255, rel=1e-9)


def test_progressive_eobrun_spans_blocks():
    """Four blocks; block 1 carries AC(0,1)=40 then an EOB4 (symbol
    0x20, two extra bits 00) ends it AND declares blocks 2-4
    all-zero — one symbol for three whole blocks."""
    def dc_scan(w):
        _emit_dc_first(w, [160, 160, 160, 160], al=0)

    def ac_scan(w):
        w.put(*_CODE[0x06])  # run 0, size 6 (40 = 0b101000)
        _emit_value(w, 40)
        w.put(*_CODE[0x20])  # EOBn, r=2
        w.put(0, 2)          # extra bits: run = 4 blocks total
    scans = [
        (_sos_prog([1], 0, 0, 0, 0), _scan_bytes(dc_scan)),
        (_sos_prog([1], 1, 63, 0, 0), _scan_bytes(ac_scan)),
    ]
    got = jpeg_lite.decode(_prog_gray(32, 8, scans))
    assert got["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)
    # variance concentrates in block 1: std = sqrt(25/4) = 2.5 gray
    assert got["std_intensity"] == pytest.approx(2.5 / 255, rel=1e-9)


def test_progressive_spectral_selection_split_bands():
    """Two AC scans over disjoint bands (1..5 and 6..63) of the same
    block both land: pos 1 from band one, pos 20 (ZRL + run) from
    band two; std adds in quadrature: sqrt(40^2 + 24^2)/8."""
    def band1(w):
        w.put(*_CODE[0x06])
        _emit_value(w, 40)   # pos 1
        w.put(*_CODE[0x00])  # EOB rest of band

    def band2(w):
        # pos 20 from ss=6: run = 14 -> no ZRL needed... use ZRL to
        # exercise it anyway: ZRL skips 16 (6..21)? no — run past 20.
        # run = 20 - 6 = 14: symbol 0xE5 not in table; compose
        # ZRL(16 zeros: 6..21) would pass 20. Instead put the value at
        # pos 22 = 6 + 16: ZRL then run 0.
        w.put(*_CODE[0xF0])  # ZRL: positions 6..21 zero
        w.put(*_CODE[0x05])  # run 0, size 5 at pos 22
        _emit_value(w, 24)
        w.put(*_CODE[0x00])  # EOB
    scans = [
        (_sos_prog([1], 0, 0, 0, 0),
         _scan_bytes(lambda w: _emit_dc_first(w, [0], al=0))),
        (_sos_prog([1], 1, 5, 0, 0), _scan_bytes(band1)),
        (_sos_prog([1], 6, 63, 0, 0), _scan_bytes(band2)),
    ]
    got = jpeg_lite.decode(_prog_gray(8, 8, scans))
    expect = math.sqrt(40 ** 2 + 24 ** 2) / 8
    assert got["std_intensity"] == pytest.approx(expect / 255, rel=1e-9)


def test_progressive_restart_resets_dc_predictor():
    """DRI=1 on a progressive DC scan: RST0 between the blocks, the
    second DC re-coded absolute."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)
    sof = _sof0(16, 8, [(1, 1, 1)])
    out += b"\xff\xc2" + sof[2:]
    out += _sos_prog([1], 0, 0, 0, 0)
    w = _BitWriter()
    _emit_dc_first(w, [160], al=0)
    w.raw_marker(0xD0)
    _emit_dc_first(w, [160], al=0)  # absolute again after RST
    w.align()
    out += w.out + b"\xff\xd9"
    got = jpeg_lite.decode(bytes(out))
    assert got["mean_intensity"] == pytest.approx(148 / 255, abs=1e-9)
    assert got["std_intensity"] == pytest.approx(0.0, abs=1e-9)


def test_progressive_ycbcr_chroma_scan_skipped_bytewise():
    """Interleaved DC scan (Y+Cb+Cr, 4:2:0) then a chroma-only AC scan
    (skipped at byte level — its entropy bytes are arbitrary) then the
    luma AC scan; stats see luma only."""
    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    sof = _sof0(16, 16, [(1, 2, 2), (2, 1, 1), (3, 1, 1)])
    out += b"\xff\xc2" + sof[2:]
    # DC scan: MCU = 4 Y blocks + Cb + Cr, separate predictor chains
    out += _sos_prog([1, 2, 3], 0, 0, 0, 0)
    w = _BitWriter()
    pred = 0
    for dc in [160, 160, -160, -160]:
        diff = dc - pred
        pred = dc
        size = diff.bit_length() if diff >= 0 else (-diff).bit_length()
        w.put(*_CODE[size])
        _emit_value(w, diff)
    for dc in [400, -400]:  # Cb, Cr
        size = dc.bit_length() if dc >= 0 else (-dc).bit_length()
        w.put(*_CODE[size])
        _emit_value(w, dc)
    w.align()
    out += w.out
    # chroma AC scan: arbitrary marker-free junk, skipped bytewise
    out += _sos_prog([2], 1, 63, 0, 0) + b"\x12\x34\x56"
    # luma AC scan: AC(0,1)=40 in the first Y block only
    out += _sos_prog([1], 1, 63, 0, 0)
    w = _BitWriter()
    w.put(*_CODE[0x06])
    _emit_value(w, 40)
    w.put(*_CODE[0x20])  # EOB4: this block + remaining 3 Y blocks
    w.put(0, 2)
    w.align()
    out += w.out + b"\xff\xd9"
    got = jpeg_lite.decode(bytes(out))
    assert (got["width"], got["height"], got["n_components"]) == (16, 16, 3)
    assert got["mean_intensity"] == pytest.approx(
        (148 + 108) / 2 / 255, abs=1e-9
    )
    # variance = quadrant-DC term (20^2) + AC term in one of four
    # blocks ((40/8)^2 / 4); cross-term zero (AC is zero-mean)
    assert got["std_intensity"] == pytest.approx(
        math.sqrt(400 + 6.25) / 255, rel=1e-9
    )


def test_progressive_new_coefficient_during_refinement():
    """A coefficient BORN in a refinement scan (±1<<Al insertion): the
    first AC scan codes only pos 1; the refinement scan at Al=0 adds a
    brand-new +1 at pos 2 after pos 1's correction bit."""
    def ac_first(w):
        w.put(*_CODE[0x05])
        _emit_value(w, 40 >> 1)  # 20 (size 5) at Al=1 -> stored 40
        w.put(*_CODE[0x00])

    def ac_refine(w):
        # symbol (run=0, size=1): new coeff, sign bit 1 (+1<<0), lands
        # at the first zero-history position AFTER pos 1's correction
        w.put(*_CODE[0x01])
        w.put(1, 1)          # sign: positive
        w.put(0, 1)          # correction bit for nonzero-history pos 1
        w.put(*_CODE[0x00])  # EOB rest
    scans = [
        (_sos_prog([1], 0, 0, 0, 0),
         _scan_bytes(lambda w: _emit_dc_first(w, [0], al=0))),
        (_sos_prog([1], 1, 63, 0, 1), _scan_bytes(ac_first)),
        (_sos_prog([1], 1, 63, 1, 0), _scan_bytes(ac_refine)),
    ]
    got = jpeg_lite.decode(_prog_gray(8, 8, scans))
    expect = math.sqrt(40 ** 2 + 1 ** 2) / 8
    assert got["std_intensity"] == pytest.approx(expect / 255, rel=1e-9)


def test_real_decode_routes_progressive_jpeg():
    """media.real_decode now gets REAL stats from progressive JPEGs
    (r12) — the pre-r12 fallback returned NULL mean for these."""
    from pythondataingestionprocess_spark.multimodal import media

    scans = [
        (_sos_prog([1], 0, 0, 0, 1),
         _scan_bytes(lambda w: _emit_dc_first(w, [161], al=1))),
        (_sos_prog([1], 0, 0, 1, 0),
         _scan_bytes(lambda w: w.put(161 & 1, 1))),
    ]
    stats = media.real_decode(_prog_gray(8, 8, scans), "image")
    assert stats["mean_intensity"] == pytest.approx(
        (161 / 8 + 128) / 255, abs=1e-9
    )
    assert (stats["width"], stats["height"], stats["n_frames"]) == (8, 8, 1)


def test_truncated_progressive_sos_keeps_header_metadata():
    """r12 review finding 2: a progressive SOS segment missing its
    spectral-selection bytes must raise ValueError (not IndexError) so
    media.real_decode's header-metadata fallback still catches it."""
    from pythondataingestionprocess_spark.multimodal import media

    out = bytearray(b"\xff\xd8")
    out += _dqt(0) + _dht(0, 0) + _dht(1, 0)
    sof = _sof0(8, 8, [(1, 1, 1)])
    out += b"\xff\xc2" + sof[2:]
    # SOS with component entry but NO Ss/Se/AhAl bytes
    body = bytes([1, 1, 0x00])
    out += b"\xff\xda" + struct.pack(">H", len(body) + 2) + body
    out += b"\x00\xff\xd9"
    with pytest.raises(ValueError, match="truncated SOS"):
        jpeg_lite.decode(bytes(out))
    stats = media.real_decode(bytes(out), "image")
    assert (stats["width"], stats["height"]) == (8, 8)
    assert stats["mean_intensity"] is None


def test_missing_quant_table_raises_value_error():
    """Missing DQT must be ValueError, not KeyError, on both paths."""
    scans = [
        (_sos_prog([1], 0, 0, 0, 0),
         _scan_bytes(lambda w: _emit_dc_first(w, [160], al=0))),
    ]
    jpg = _prog_gray(8, 8, scans)
    # strip the DQT segment entirely
    i = jpg.index(b"\xff\xdb")
    (seg_len,) = struct.unpack(">H", jpg[i + 2:i + 4])
    no_dqt = jpg[:i] + jpg[i + 2 + seg_len:]
    with pytest.raises(ValueError, match="quantization"):
        jpeg_lite.decode(no_dqt)
    base = _gray_jpeg(8, 8, [(160, {})])
    i = base.index(b"\xff\xdb")
    (seg_len,) = struct.unpack(">H", base[i + 2:i + 4])
    with pytest.raises(ValueError, match="quantization"):
        jpeg_lite.decode(base[:i] + base[i + 2 + seg_len:])
