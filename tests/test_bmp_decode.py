"""bmp_lite (r13): BMP decode without PIL — raw BGR rows, palettes,
BITFIELDS, and RLE8, all against hand-computed fixtures (BMP is
simple enough that every expected mean here is arithmetic done in the
test, not a replay of the implementation)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import bmp_lite, media


def make_bmp(width, height, bpp, pixel_data, palette=b"", compression=0,
             masks=None, top_down=False, core=False):
    """Assemble a BMP: file header + DIB + optional masks/palette +
    pixel data. ``pixel_data`` must already be row-padded."""
    if core:
        dib = struct.pack("<IHHHH", 12, width, height, 1, bpp)
        extra = b""
    else:
        h = -height if top_down else height
        dib = struct.pack(
            "<IiihhIIiiII", 40, width, h, 1, bpp, compression,
            len(pixel_data), 2835, 2835, len(palette) // 4, 0,
        )
        extra = struct.pack("<III", *masks) if masks else b""
    data_off = 14 + len(dib) + len(extra) + len(palette)
    hdr = b"BM" + struct.pack(
        "<IHHI", data_off + len(pixel_data), 0, 0, data_off
    )
    return hdr + dib + extra + palette + pixel_data


def test_bmp24_bottom_up_with_row_padding():
    # 3x2, stride 12 (9 bytes + 3 pad). Bottom row stored first.
    bottom = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90]) + b"\0\0\0"
    top = bytes([110, 120, 130, 140, 150, 160, 170, 180, 190]) + b"\0\0\0"
    blob = make_bmp(3, 2, 24, bottom + top)
    stats = bmp_lite.decode(blob)
    vals = list(range(10, 100, 10)) + list(range(110, 200, 10))
    assert (stats["width"], stats["height"], stats["channels"]) == (3, 2, 3)
    assert stats["mean_intensity"] == pytest.approx(
        np.mean(vals) / 255.0, abs=1e-12
    )


def test_bmp32_bgrx_ignores_pad_byte():
    px = bytes([100, 150, 200, 255] * 4)  # B=100 G=150 R=200, x=255
    blob = make_bmp(2, 2, 32, px)
    stats = bmp_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(
        (100 + 150 + 200) / 3 / 255.0, abs=1e-12
    )


def test_bmp8_palette():
    palette = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0]) + bytes(
        [30, 60, 90, 0]
    )
    # 2x2: indices [2,1] on top row, [0,0] on bottom; stride 4
    pixel = bytes([0, 0, 0, 0]) + bytes([2, 1, 0, 0])
    blob = make_bmp(2, 2, 8, pixel, palette=palette)
    stats = bmp_lite.decode(blob)
    exp = (30 + 60 + 90 + 255 * 3 + 0 + 0) / 12 / 255.0
    assert stats["mean_intensity"] == pytest.approx(exp, abs=1e-12)


def test_bmp1_and_bmp4_packing():
    # 1-bit, 10 px wide: MSB-first bit order, 2 colors
    palette = bytes([0, 0, 0, 0]) + bytes([255, 255, 255, 0])
    row = bytes([0b10000000, 0b01000000]) + b"\0\0"  # stride 4
    blob = make_bmp(10, 1, 1, row, palette=palette)
    stats = bmp_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(2 / 10, abs=1e-12)
    # 4-bit, width 3 (odd → low nibble of byte 2 is padding)
    pal4 = bytes([255, 255, 255, 0]) + bytes([0, 0, 0, 0])
    row4 = bytes([0x01, 0x10]) + b"\0\0"  # px: 0,1,1
    blob = make_bmp(3, 1, 4, row4, palette=pal4)
    stats = bmp_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(1 / 3, abs=1e-12)


def test_bmp16_555_and_565_bitfields():
    # one pixel, R=31 G=0 B=0 in 555 → 0x7C00
    px = struct.pack("<HH", 0x7C00, 0x0000)  # stride pad to 4
    blob = make_bmp(1, 1, 16, px)
    stats = bmp_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(1 / 3, abs=1e-9)
    # 565 via BITFIELDS: G=63 → full green only
    px = struct.pack("<HH", 0x07E0, 0)
    blob = make_bmp(1, 1, 16, px, compression=3,
                    masks=(0xF800, 0x07E0, 0x001F))
    stats = bmp_lite.decode(blob)
    assert stats["mean_intensity"] == pytest.approx(1 / 3, abs=1e-9)


def test_bmp_top_down_and_core_header():
    px = bytes([255, 255, 255]) + b"\0"  # 1x1 white, stride 4
    blob = make_bmp(1, 1, 24, px, top_down=True)
    assert bmp_lite.decode(blob)["mean_intensity"] == pytest.approx(1.0)
    # OS/2 core header: BGR triple palette, always full 2^bpp entries
    pal = bytes([255, 255, 255]) + bytes(255 * 3)  # entry 0 white
    row = bytes([0]) + b"\0\0\0"
    blob = make_bmp(1, 1, 8, row, palette=pal, core=True)
    assert bmp_lite.decode(blob)["mean_intensity"] == pytest.approx(1.0)


def test_bmp_rle8_all_opcodes():
    """Encoded runs, an absolute run (word-aligned), a delta skip, EOL
    and EOB — decoded indices hand-tracked against the spec."""
    palette = b"".join(bytes([v, v, v, 0]) for v in (0, 10, 20, 30))
    # 6x2 image, bottom row first in stream:
    # row0 (bottom): encoded 3x idx1, absolute [2,3,0] + pad, EOL
    # row1 (top): delta (+2,0), encoded 4x idx2, EOB
    rle = bytes([
        3, 1,
        0, 3, 2, 3, 0, 0,  # absolute: count 3 (odd → word pad)
        0, 0,              # EOL
        0, 2, 2, 0,        # delta: skip 2 cols (stay on row)
        4, 2,
        0, 1,              # EOB
    ])
    blob = make_bmp(6, 2, 8, rle, palette=palette, compression=1)
    stats = bmp_lite.decode(blob)
    # bottom row: 10,10,10,20,30,0 ; top row: 0,0,20,20,20,20
    vals = [10, 10, 10, 20, 30, 0, 0, 0, 20, 20, 20, 20]
    assert stats["mean_intensity"] == pytest.approx(
        np.mean(vals) / 255.0, abs=1e-12
    )


def test_bmp_rejects_and_quarantines():
    with pytest.raises(ValueError, match="signature"):
        bmp_lite.decode(b"PNG not a bmp at all........")
    px = bytes([0, 0, 0, 0])
    blob = make_bmp(1, 1, 24, px)
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        bmp_lite.decode(blob[:-2])
    with pytest.raises(ValueError, match="RLE4"):
        bmp_lite.decode(make_bmp(1, 1, 4, b"\0\x01", compression=2))
    # palette index beyond declared clrUsed
    pal = bytes([0, 0, 0, 0])  # 1 color only
    row = bytes([3]) + b"\0\0\0"
    with pytest.raises(ValueError, match="palette index"):
        bmp_lite.decode(make_bmp(1, 1, 8, row, palette=pal))
    # bfOffBits pointing INTO the header/palette must not decode
    # header bytes as pixels (r13 review)
    px2 = bytes([0, 0, 0, 0])
    blob2 = bytearray(make_bmp(1, 1, 24, px2))
    blob2[10:14] = struct.pack("<I", 2)
    with pytest.raises(ValueError, match="inside the header"):
        bmp_lite.decode(bytes(blob2))
    # RLE8 stream without EOB
    with pytest.raises(ValueError, match="end-of-bitmap"):
        bmp_lite.decode(
            make_bmp(2, 1, 8, bytes([2, 0]), palette=pal, compression=1)
        )


def test_media_routes_bmp():
    px = bytes([0, 0, 255]) + b"\0"  # one pure-red pixel
    blob = make_bmp(1, 1, 24, px)
    stats = media.real_decode(blob, "image/bmp")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (1, 1, 1)
    assert stats["mean_intensity"] == pytest.approx(1 / 3, abs=1e-12)


def test_bmp_roundtrip_fuzz_vs_numpy_reference():
    """150 seeded random 24-bit images: the decoder's mean equals a
    direct numpy mean of the generated pixels (padding and bottom-up
    row order exercised at every width)."""
    rng = np.random.default_rng(41)
    for trial in range(150):
        w = int(rng.integers(1, 17))
        h = int(rng.integers(1, 9))
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        stride = (w * 3 + 3) // 4 * 4
        rows = []
        for r in range(h - 1, -1, -1):  # bottom-up
            row = img[r].tobytes()
            rows.append(row + b"\0" * (stride - len(row)))
        blob = make_bmp(w, h, 24, b"".join(rows))
        stats = bmp_lite.decode(blob)
        assert stats["mean_intensity"] == pytest.approx(
            float(img.astype(np.float64).mean() / 255.0), abs=1e-12
        ), trial
