"""tiff_lite (r13): baseline TIFF decode — strips, PackBits, LZW
(MSB-first, EARLY code-width change), predictor 2, gray/RGB/palette,
both byte orders.

LZW verification is layered: (1) a bit-level vector built by an
in-test bit-writer (independent of both the module and the test
encoder) that crosses the 9→10-bit boundary at the spec's EARLY
position — a decoder using the GIF (late) rule desyncs and fails;
(2) a greedy in-test encoder + seeded roundtrip fuzz over data long
enough to force width growth and KwKwK patterns; (3) hand-computed
stats fixtures for every photometric/compression combination.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import media, tiff_lite


# ------------------------------------------------------------- builders

def make_tiff(width, height, strips, *, bo="<", spp=1, bits=None,
              compression=1, photometric=1, rows_per_strip=None,
              predictor=1, colormap=None, extra_tags=()):
    """Assemble a single-IFD TIFF. ``strips`` is a list of raw strip
    payloads (already compressed per ``compression``)."""
    bits = bits if bits is not None else (8,) * spp
    rows_per_strip = rows_per_strip or height
    header = (b"II" if bo == "<" else b"MM") + struct.pack(bo + "HI", 42, 8)
    # lay out: header(8) IFD ... then value arrays then strip data
    tags = []

    def tag(tid, typ, values):
        tags.append((tid, typ, values))

    tag(256, 4, (width,))
    tag(257, 4, (height,))
    tag(258, 3, tuple(bits))
    tag(259, 3, (compression,))
    tag(262, 3, (photometric,))
    tag(277, 3, (spp,))
    tag(278, 4, (rows_per_strip,))
    if predictor != 1:
        tag(317, 3, (predictor,))
    if colormap is not None:
        tag(320, 3, tuple(colormap))
    for t in extra_tags:
        tag(*t)
    # strip offsets/counts resolved after layout
    n = len(tags) + 2
    ifd_size = 2 + 12 * n + 4
    # overflow value area after IFD
    value_area = bytearray()
    value_off = 8 + ifd_size

    def encode_values(typ, values):
        fmt = {3: "H", 4: "I", 1: "B"}[typ]
        size = {3: 2, 4: 4, 1: 1}[typ] * len(values)
        raw = struct.pack(bo + fmt * len(values), *values)
        if size <= 4:
            return raw + b"\0" * (4 - size), None
        off = value_off + len(value_area)
        value_area.extend(raw)
        return struct.pack(bo + "I", off), None

    # reserve strip data positions (after value area; recompute later)
    strip_sizes = [len(s) for s in strips]
    # first pass to know value_area size: strip offset/count arrays may
    # overflow 4 bytes when >1 strip
    tmp_tags = tags + [
        (273, 4, tuple(0 for _ in strips)),
        (279, 4, tuple(strip_sizes)),
    ]
    overflow = sum(
        {3: 2, 4: 4, 1: 1}[typ] * len(vals)
        for _, typ, vals in tmp_tags
        if {3: 2, 4: 4, 1: 1}[typ] * len(vals) > 4
    )
    data_start = 8 + ifd_size + overflow
    offs = []
    pos = data_start
    for s in strip_sizes:
        offs.append(pos)
        pos += s
    tags.append((273, 4, tuple(offs)))
    tags.append((279, 4, tuple(strip_sizes)))
    tags.sort(key=lambda t: t[0])

    ifd = struct.pack(bo + "H", len(tags))
    for tid, typ, values in tags:
        enc, _ = encode_values(typ, values)
        ifd += struct.pack(bo + "HHI", tid, typ, len(values)) + enc
    ifd += struct.pack(bo + "I", 0)  # no next IFD
    assert len(ifd) == ifd_size
    blob = header + ifd + bytes(value_area) + b"".join(strips)
    assert len(value_area) == overflow
    return blob


def packbits_encode(data: bytes) -> bytes:
    """Simple literal/repeat PackBits encoder (test-side)."""
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and data[i + run] == data[i]
               and run < 128):
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < len(data) and (j - i) < 128
                   and not (j + 1 < len(data) and data[j] == data[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


class _BitWriter:
    """MSB-first bit packer (independent of tiff_lite)."""

    def __init__(self):
        self.bits = []

    def write(self, code, width):
        self.bits += [(code >> (width - 1 - k)) & 1 for k in range(width)]

    def bytes(self):
        bs = bytearray()
        chunk = self.bits + [0] * ((-len(self.bits)) % 8)
        for i in range(0, len(chunk), 8):
            b = 0
            for bit in chunk[i:i + 8]:
                b = (b << 1) | bit
            bs.append(b)
        return bytes(bs)


def lzw_encode(data: bytes) -> bytes:
    """Greedy TIFF-LZW encoder (test-side): ClearCode first, Clear
    again when the table fills to 4094. Width bookkeeping: the encoder
    runs one table entry AHEAD of the decoder (it adds on emit, the
    decoder adds on the NEXT read), so the encoder widens when its
    next free slot reaches 2^width exactly when the decoder's table
    hits the spec's early-change point 2^width - 1."""
    w = _BitWriter()
    width = 9
    table = {bytes([c]): c for c in range(256)}
    next_code = 258
    w.write(256, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        w.write(table[prev], width)
        table[cur] = next_code
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:
            w.write(256, width)
            table = {bytes([c]): c for c in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        w.write(table[prev], width)
        next_code += 1
        if next_code == (1 << width) and width < 12:
            width += 1
    w.write(257, width)  # EOI
    return w.bytes()


# ------------------------------------------------------------------ LZW

def test_lzw_early_change_bit_vector():
    """Bit-level vector crossing the 9→10-bit boundary: 300 literal
    root codes after Clear. The decoder's table hits 511 entries after
    the 254th code, so codes 255.. are 10 bits wide — at the EARLY
    (TIFF) position. A late-change (GIF-rule) decoder desyncs here."""
    w = _BitWriter()
    w.write(256, 9)
    expected = bytearray()
    width = 9
    table_len = 258
    for i in range(300):
        w.write(i % 256, width)
        expected.append(i % 256)
        if i > 0:
            table_len += 1
            if table_len == (1 << width) - 1:
                width += 1
    w.write(257, width)
    out = tiff_lite._lzw_decode(w.bytes(), 300)
    assert out == bytes(expected)


def test_lzw_roundtrip_fuzz_forces_width_growth_and_kwkwk():
    rng = np.random.default_rng(59)
    for trial in range(60):
        n = int(rng.integers(1, 3000))
        if trial % 3 == 0:
            data = rng.integers(0, 4, n).astype(np.uint8).tobytes()  # runs
        elif trial % 3 == 1:
            data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        else:
            data = (b"ab" * (n // 2 + 1))[:n]  # KwKwK-heavy
        enc = lzw_encode(data)
        assert tiff_lite._lzw_decode(enc, n) == data, trial


def test_lzw_rejects_overrun_and_truncation():
    enc = lzw_encode(b"hello world")
    with pytest.raises(ValueError, match="more bytes"):
        tiff_lite._lzw_decode(enc, 5)
    with pytest.raises(ValueError, match="LZW"):
        tiff_lite._lzw_decode(enc[:3], 11)


# --------------------------------------------------------------- decode

def test_gray_uncompressed_both_byte_orders_and_whiteiszero():
    img = np.arange(24, dtype=np.uint8).reshape(4, 6)
    for bo in ("<", ">"):
        blob = make_tiff(6, 4, [img.tobytes()], bo=bo, photometric=1)
        stats = tiff_lite.decode(blob)
        assert (stats["width"], stats["height"]) == (6, 4)
        assert stats["mean_intensity"] == pytest.approx(
            img.mean() / 255.0, abs=1e-12
        )
    # WhiteIsZero inverts
    blob = make_tiff(6, 4, [img.tobytes()], photometric=0)
    assert tiff_lite.decode(blob)["mean_intensity"] == pytest.approx(
        1.0 - img.mean() / 255.0, abs=1e-12
    )


def test_rgb_multistrip_packbits():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 4, 3)).astype(np.uint8)
    strips = [
        packbits_encode(img[:2].tobytes()),
        packbits_encode(img[2:4].tobytes()),
        packbits_encode(img[4:].tobytes()),
    ]
    blob = make_tiff(4, 5, strips, spp=3, photometric=2,
                     compression=32773, rows_per_strip=2)
    stats = tiff_lite.decode(blob)
    assert stats["channels"] == 3
    assert stats["mean_intensity"] == pytest.approx(
        img.astype(np.float64).mean() / 255.0, abs=1e-12
    )


def test_rgba_alpha_excluded():
    img = np.zeros((2, 2, 4), dtype=np.uint8)
    img[:, :, :3] = 90
    img[:, :, 3] = 255  # alpha must not contribute
    blob = make_tiff(2, 2, [img.tobytes()], spp=4, photometric=2,
                     bits=(8, 8, 8, 8))
    stats = tiff_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(90 / 255.0, abs=1e-12)


def test_lzw_with_horizontal_predictor():
    """LZW + predictor 2 (the default libtiff combination): encoder
    side differencing in the test, decoder must re-accumulate."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (6, 8, 3)).astype(np.uint8)
    diff = img.astype(np.int16).copy()
    diff[:, 1:, :] -= img[:, :-1, :].astype(np.int16)
    raw = (diff % 256).astype(np.uint8).tobytes()
    blob = make_tiff(8, 6, [lzw_encode(raw)], spp=3, photometric=2,
                     compression=5, predictor=2)
    stats = tiff_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(
        img.astype(np.float64).mean() / 255.0, abs=1e-12
    )


def test_palette_colormap():
    cmap = [0] * 768
    cmap[1] = 65535          # R of index 1
    cmap[256 + 1] = 65535    # G of index 1
    cmap[512 + 1] = 65535    # B of index 1
    img = np.array([[1, 0], [0, 1]], dtype=np.uint8)
    blob = make_tiff(2, 2, [img.tobytes()], photometric=3, colormap=cmap)
    stats = tiff_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(0.5, abs=1e-12)


def test_rejects_unsupported_variants():
    img = bytes(4)
    with pytest.raises(ValueError, match="byte-order"):
        tiff_lite.decode(b"XX\x2a\x00garbage.....")
    with pytest.raises(ValueError, match="tiled"):
        tiff_lite.decode(make_tiff(2, 2, [img],
                                   extra_tags=((322, 4, (16,)),)))
    with pytest.raises(ValueError, match="planar"):
        tiff_lite.decode(make_tiff(2, 2, [img],
                                   extra_tags=((284, 3, (2,)),)))
    with pytest.raises(ValueError, match="compression"):
        tiff_lite.decode(make_tiff(2, 2, [img], compression=4))  # G4 fax
    with pytest.raises(ValueError, match="bits-per-sample"):
        tiff_lite.decode(make_tiff(2, 2, [img], bits=(16,)))
    with pytest.raises(ValueError, match="strip extends"):
        tiff_lite.decode(make_tiff(2, 2, [img])[:-2])


def test_media_routes_tiff():
    img = np.full((3, 3), 51, dtype=np.uint8)
    blob = make_tiff(3, 3, [img.tobytes()])
    stats = media.real_decode(blob, "image/tiff")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (3, 3, 1)
    assert stats["mean_intensity"] == pytest.approx(0.2, abs=1e-12)


def test_decode_fuzz_roundtrip_all_compressions():
    """90 seeded random images across gray/RGB, strip splits, byte
    orders, and all three compressions — decoder mean always equals
    the direct numpy mean."""
    rng = np.random.default_rng(97)
    for trial in range(90):
        spp = (1, 3)[trial % 2]
        w = int(rng.integers(1, 20))
        h = int(rng.integers(1, 12))
        rps = int(rng.integers(1, h + 1))
        comp = (1, 5, 32773)[trial % 3]
        bo = ("<", ">")[trial % 2]
        img = rng.integers(0, 256, (h, w, spp)).astype(np.uint8)
        strips = []
        for r0 in range(0, h, rps):
            raw = img[r0:r0 + rps].tobytes()
            if comp == 5:
                strips.append(lzw_encode(raw))
            elif comp == 32773:
                strips.append(packbits_encode(raw))
            else:
                strips.append(raw)
        blob = make_tiff(w, h, strips, bo=bo, spp=spp,
                         photometric=2 if spp == 3 else 1,
                         compression=comp, rows_per_strip=rps)
        stats = tiff_lite.decode(blob)
        assert stats["mean_intensity"] == pytest.approx(
            img.astype(np.float64).mean() / 255.0, abs=1e-12
        ), trial
