"""pnm_lite / tga_lite / ico_lite (r13): the long-tail image formats
— Netpbm, Targa, and the favicon container. Every expected mean is
hand-computed arithmetic; fuzz rounds check against direct numpy
means of the generated pixels."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pythondataingestionprocess_spark.multimodal import (
    ico_lite,
    media,
    pnm_lite,
    tga_lite,
)


# ---------------------------------------------------------------- PNM

def test_pnm_p6_with_comment_and_p5_16bit():
    p6 = b"P6\n# a comment\n3 2\n255\n" + bytes(range(18))
    st = pnm_lite.decode(p6)
    assert (st["width"], st["height"], st["channels"]) == (3, 2, 3)
    assert st["mean_intensity"] == pytest.approx(
        sum(range(18)) / 18 / 255, abs=1e-12
    )
    p5 = b"P5 2 1 65535\n" + struct.pack(">HH", 65535, 0)
    assert pnm_lite.decode(p5)["mean_intensity"] == pytest.approx(0.5)


def test_pnm_bitmap_inversion_and_ascii():
    # P4: packed MSB-first, 1 = BLACK → intensity 0
    p4 = b"P4\n10 1\n" + bytes([0b10000000, 0b01000000])
    assert pnm_lite.decode(p4)["mean_intensity"] == pytest.approx(0.8)
    p1 = b"P1 2 1 \n0 1"
    assert pnm_lite.decode(p1)["mean_intensity"] == pytest.approx(0.5)
    p2 = b"P2 2 2 100\n0 50 100 50"
    assert pnm_lite.decode(p2)["mean_intensity"] == pytest.approx(0.5)
    p3 = b"P3 1 1 10\n10 0 5"
    assert pnm_lite.decode(p3)["mean_intensity"] == pytest.approx(0.5)


def test_pnm_rejects():
    with pytest.raises(ValueError, match="magic"):
        pnm_lite.decode(b"P7 1 1 255 x")  # PAM unsupported
    with pytest.raises(ValueError, match="truncated"):
        pnm_lite.decode(b"P6 4 4 255\n" + bytes(10))
    with pytest.raises(ValueError, match="token"):
        pnm_lite.decode(b"P6 four 4 255\n")
    with pytest.raises(ValueError, match="maxval"):
        pnm_lite.decode(b"P5 1 1 70000\n\x00\x00")
    # r14 ADVICE: binary samples above maxval must quarantine like the
    # ASCII path (250 > 100 would have scaled to a 2.5 "luminance")
    with pytest.raises(ValueError, match="maxval"):
        pnm_lite.decode(b"P5 2 1 100\n" + bytes([250, 250]))
    with pytest.raises(ValueError, match="maxval"):
        pnm_lite.decode(b"P6 1 1 300\n" + struct.pack(">3H", 301, 0, 0))


def test_pnm_fuzz_vs_numpy():
    rng = np.random.default_rng(61)
    for trial in range(60):
        w, h = int(rng.integers(1, 24)), int(rng.integers(1, 16))
        ch = 3 if trial % 2 else 1
        img = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        magic = b"P6" if ch == 3 else b"P5"
        blob = magic + f" {w} {h} 255\n".encode() + img.tobytes()
        st = pnm_lite.decode(blob)
        assert st["mean_intensity"] == pytest.approx(
            img.astype(np.float64).mean() / 255, abs=1e-12
        ), trial


# ---------------------------------------------------------------- TGA

def _tga_hdr(img_type, w, h, bpp, cmap_type=0, cmap_len=0, cmap_bits=0,
             idlen=0):
    return struct.pack(
        "<BBBHHBHHHHBB", idlen, cmap_type, img_type, 0, cmap_len,
        cmap_bits, 0, 0, w, h, bpp, 0,
    )


def test_tga_truecolor_gray_and_16bit():
    blob = _tga_hdr(2, 2, 2, 24) + bytes([10, 20, 30] * 4)
    st = tga_lite.decode(blob)
    assert st["mean_intensity"] == pytest.approx(20 / 255, abs=1e-12)
    blob = _tga_hdr(3, 4, 1, 8) + bytes([0, 255, 0, 255])
    assert tga_lite.decode(blob)["mean_intensity"] == pytest.approx(0.5)
    # 16-bit 5-5-5: pure red pixel
    blob = _tga_hdr(2, 1, 1, 16) + struct.pack("<H", 0x7C00)
    assert tga_lite.decode(blob)["mean_intensity"] == pytest.approx(
        1 / 3, abs=1e-9
    )


def test_tga_rle_and_colormap():
    # RLE: run of 4 + raw packet of 2
    blob = _tga_hdr(10, 3, 2, 24) + bytes(
        [0x83, 10, 20, 30, 0x01, 40, 50, 60, 70, 80, 90]
    )
    st = tga_lite.decode(blob)
    vals = [10, 20, 30] * 4 + [40, 50, 60, 70, 80, 90]
    assert st["mean_intensity"] == pytest.approx(
        np.mean(vals) / 255, abs=1e-12
    )
    # color-mapped: 2 entries of 16-bit (white, black), first=0
    cm = struct.pack("<HH", 0x7FFF, 0)
    blob = _tga_hdr(1, 2, 1, 8, cmap_type=1, cmap_len=2, cmap_bits=16)
    blob += cm + bytes([0, 1])
    assert tga_lite.decode(blob)["mean_intensity"] == pytest.approx(
        0.5, abs=1e-9
    )


def test_tga_rejects_and_mime_only_routing():
    with pytest.raises(ValueError, match="image type"):
        tga_lite.decode(_tga_hdr(7, 1, 1, 24) + bytes(3))
    with pytest.raises(ValueError, match="truncated"):
        tga_lite.decode(_tga_hdr(2, 4, 4, 24) + bytes(10))
    with pytest.raises(ValueError, match="index out of range"):
        cm = struct.pack("<HH", 0, 0)
        blob = _tga_hdr(1, 1, 1, 8, cmap_type=1, cmap_len=2, cmap_bits=16)
        tga_lite.decode(blob + cm + bytes([5]))
    # router: explicit subtype decodes; a bare 'image' must NOT sniff
    blob = _tga_hdr(2, 1, 1, 24) + bytes([255, 255, 255])
    st = media.real_decode(blob, "image/x-tga")
    assert st["mean_intensity"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="unrecognized image"):
        media.real_decode(blob, "image")


# ---------------------------------------------------------------- ICO

def _ico(entries: list[tuple[int, int, bytes]], ftype=1) -> bytes:
    head = struct.pack("<HHH", 0, ftype, len(entries))
    dir_size = 6 + 16 * len(entries)
    off = dir_size
    dirents, blobs = b"", b""
    for w, h, img in entries:
        dirents += struct.pack(
            "<BBBBHHII", w % 256, h % 256, 0, 0, 1, 32, len(img), off
        )
        blobs += img
        off += len(img)
    return head + dirents + blobs


def _dib_entry(w, h, color) -> bytes:
    """Headerless 24bpp DIB with doubled height + AND mask."""
    stride = (w * 3 + 3) // 4 * 4
    row = bytes(color) * w + b"\0" * (stride - 3 * w)
    xor = row * h
    and_stride = (w + 31) // 32 * 4
    and_mask = bytes(and_stride * h)
    dib = struct.pack(
        "<IiihhIIiiII", 40, w, h * 2, 1, 24, 0, 0, 0, 0, 0, 0
    )
    return dib + xor + and_mask


def test_ico_dib_entry_and_largest_selection():
    small = _dib_entry(1, 1, (0, 0, 0))
    big = _dib_entry(4, 2, (255, 255, 255))
    blob = _ico([(1, 1, small), (4, 2, big)])
    st = ico_lite.decode(blob)
    assert (st["width"], st["height"], st["n_images"]) == (4, 2, 2)
    assert st["mean_intensity"] == pytest.approx(1.0)
    # router
    rs = media.real_decode(blob, "image/vnd.microsoft.icon")
    assert rs["n_frames"] == 2 and rs["mean_intensity"] == pytest.approx(1.0)


def test_ico_png_entry_and_cur():
    import zlib

    # minimal 1x1 gray-255 PNG via png_lite's supported shape
    def chunk(t, b):
        c = struct.pack(">I", len(b)) + t + b
        return c + struct.pack(">I", zlib.crc32(t + b))

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    idat = zlib.compress(b"\x00\xff")
    png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
    )
    blob = _ico([(1, 1, png)], ftype=2)  # CUR container
    st = ico_lite.decode(blob)
    assert st["mean_intensity"] == pytest.approx(1.0)
    assert st["n_images"] == 1


def test_ico_rejects():
    with pytest.raises(ValueError, match="directory"):
        ico_lite.decode(struct.pack("<HHH", 1, 1, 1) + bytes(16))
    with pytest.raises(ValueError, match="out of range"):
        blob = _ico([(1, 1, _dib_entry(1, 1, (0, 0, 0)))])
        ico_lite.decode(blob[:-4])
    with pytest.raises(ValueError, match="header size"):
        bad = struct.pack("<I", 124) + bytes(200)  # V5 DIB in ICO
        ico_lite.decode(_ico([(1, 1, bad)]))


def test_p1_packed_pixels_and_bad_tokens():
    """r13 review: plain PBM allows pixels packed WITHOUT whitespace;
    and a non-0/1 token must error, never flow into the mean."""
    assert pnm_lite.decode(b"P1\n4 1\n0110")["mean_intensity"] == (
        pytest.approx(0.5)
    )
    with pytest.raises(ValueError, match="pixel byte"):
        pnm_lite.decode(b"P1 2 2\n2 1 0 1")
    with pytest.raises(ValueError, match="exceeds maxval"):
        pnm_lite.decode(b"P2 2 1 100\n50 101")


@pytest.mark.slow
def test_tga_routes_through_decode_media_pipeline(spark):
    """r13 review: the subtype must SURVIVE decode_media — stripping
    to the major type there made the TGA route unreachable from the
    actual pipeline path (the unit test called real_decode directly
    and missed it)."""
    from pythondataingestionprocess_spark.multimodal.media import decode_media

    blob = _tga_hdr(2, 1, 1, 24) + bytes([255, 255, 255])
    df = spark.createDataFrame(
        [(1, "image/x-tga", bytearray(blob)),
         (2, "image/png", bytearray(b"\x89PNG junk"))],
        "id long, media_type string, content binary",
    )
    rows = {r["id"]: r for r in decode_media(df, use_fake=False).collect()}
    assert rows[1]["decode_status"] == "ok"
    assert rows[1]["mean_intensity"] == pytest.approx(1.0)
    assert rows[2]["decode_status"].startswith("quarantine:")
    # and the fake decoder still sees image-shaped rows (n_frames 1)
    fake = {r["id"]: r for r in decode_media(df, use_fake=True).collect()}
    assert fake[1]["n_frames"] == 1


def test_ico_bitfields_entry_decodes():
    """r13 review: BI_BITFIELDS DIB entries carry 12 mask bytes
    between header and pixels — the rebuilt bfOffBits must include
    them."""
    # 1x1 32-bit BITFIELDS icon, pure green pixel, doubled height
    dib = struct.pack(
        "<IiihhIIiiII", 40, 1, 2, 1, 32, 3, 0, 0, 0, 0, 0
    )
    masks = struct.pack("<III", 0xFF0000, 0x00FF00, 0x0000FF)
    xor = struct.pack("<I", 0x0000FF00)
    and_mask = bytes(4)
    blob = _ico([(1, 1, dib + masks + xor + and_mask)])
    st = ico_lite.decode(blob)
    assert st["mean_intensity"] == pytest.approx(1 / 3, abs=1e-9)
