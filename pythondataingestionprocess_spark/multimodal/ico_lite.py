"""Dependency-free ICO/CUR decoder: the favicon container. Each
directory entry is either an embedded PNG (routed to png_lite) or a
headerless DIB whose height field covers BOTH the XOR pixels and the
trailing 1-bit AND mask — rebuilt into a standard BMP (height halved,
bfOffBits past header+palette) and routed to bmp_lite; the AND-mask
bytes trail beyond what the row reader consumes. Stats describe the
LARGEST image in the directory; ``n_images`` carries the count.

Spec: the ICONDIR/ICONDIRENTRY layout of the Windows icon resource
format. Reference anchor: binary media ingestion is the engine-added
analog of the reference's binary statement ingestion
(pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

from pythondataingestionprocess_spark.multimodal import bmp_lite, png_lite


def decode(data: bytes) -> dict:
    if len(data) < 6:
        raise ValueError("not an ICO (too short)")
    reserved, ftype, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or ftype not in (1, 2) or count == 0:
        raise ValueError("not an ICO/CUR (bad directory)")
    best = None  # (area, offset, size, w, h)
    for i in range(count):
        off = 6 + 16 * i
        if off + 16 > len(data):
            raise ValueError("truncated ICONDIR")
        w, h, _nc, _r, _p, _b, size, img_off = struct.unpack_from(
            "<BBBBHHII", data, off
        )
        w, h = w or 256, h or 256
        if img_off + size > len(data):
            raise ValueError("ICO image out of range")
        if best is None or w * h > best[0]:
            best = (w * h, img_off, size, w, h)
    _, img_off, size, w, h = best
    img = data[img_off:img_off + size]
    if img[:8] == b"\x89PNG\r\n\x1a\n":
        st = png_lite.decode(img)
        return {"width": st["width"], "height": st["height"],
                "channels": st["channels"],
                "mean_intensity": st["mean_intensity"],
                "n_images": count}
    # BMP-in-ICO: a BITMAPINFOHEADER with DOUBLED height (XOR pixels
    # + AND mask) and no BITMAPFILEHEADER. Rebuild one: halve the
    # height, point bfOffBits past header+palette; the AND mask bytes
    # trail beyond what the decoder reads.
    if len(img) < 40:
        raise ValueError("truncated ICO DIB")
    (hdr_size,) = struct.unpack_from("<I", img, 0)
    if hdr_size != 40:
        raise ValueError(f"unsupported ICO DIB header size {hdr_size}")
    height2 = struct.unpack_from("<i", img, 8)[0]
    bpp = struct.unpack_from("<H", img, 14)[0]
    compression = struct.unpack_from("<I", img, 16)[0]
    n_colors = struct.unpack_from("<I", img, 32)[0]
    patched = bytearray(img)
    struct.pack_into("<i", patched, 8, height2 // 2)
    pal_bytes = (
        (n_colors or (1 << bpp)) * 4 if bpp <= 8 else 0
    )
    if compression == 3:
        # BI_BITFIELDS: the three channel masks sit between the
        # 40-byte header and the pixels (r13 review — omitting them
        # rejected every 16/32-bit BITFIELDS icon)
        pal_bytes += 12
    data_off = 14 + 40 + pal_bytes
    hdr = b"BM" + struct.pack("<IHHI", 14 + len(patched), 0, 0, data_off)
    st = bmp_lite.decode(hdr + bytes(patched))
    return {"width": st["width"], "height": st["height"],
            "channels": st["channels"],
            "mean_intensity": st["mean_intensity"], "n_images": count}


