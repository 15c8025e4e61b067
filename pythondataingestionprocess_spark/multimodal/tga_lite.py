"""Dependency-free TGA (Truevision Targa) decoder: types 1/2/3 and
their RLE twins 9/10/11; 8-bit gray, 15/16-bit (5-5-5) and 24/32-bit
BGR(A) truecolor, color-mapped with 15/16/24/32-bit palette entries.
TGA has NO magic bytes, so the media router only dispatches here on
an explicit image/x-tga (or tga/targa) MIME subtype — never by
sniffing.

``decode`` returns the png_lite stats contract (mean over color
samples, alpha excluded). Spec: Truevision "TGA File Format
Specification" 2.0 (1991). Reference anchor: binary media ingestion
is the engine-added analog of the reference's binary statement
ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

import numpy as np


def decode(data: bytes) -> dict:
    if len(data) < 18:
        raise ValueError("not a TGA (too short)")
    (idlen, cmap_type, img_type, cmap_first, cmap_len, cmap_bits,
     _x, _y, width, height, bpp, desc) = struct.unpack_from(
        "<BBBHHBHHHHBB", data, 0
    )
    if img_type not in (1, 2, 3, 9, 10, 11):
        raise ValueError(f"unsupported TGA image type {img_type}")
    if not width or not height:
        raise ValueError("bad TGA geometry")
    if width * height > 100_000_000:
        raise ValueError("TGA dimensions exceed the 100MP decode guard")
    pos = 18 + idlen
    cmap = None
    if cmap_type == 1:
        entry_bytes = (cmap_bits + 7) // 8
        need = cmap_len * entry_bytes
        if pos + need > len(data):
            raise ValueError("truncated TGA color map")
        cmap = (data[pos:pos + need], cmap_first, cmap_len, cmap_bits)
        pos += need
    px_bytes = (bpp + 7) // 8
    n_px = width * height
    if img_type >= 9:  # RLE
        out = bytearray()
        i = pos
        need = n_px * px_bytes
        while len(out) < need:
            if i >= len(data):
                raise ValueError("truncated TGA RLE stream")
            h = data[i]
            i += 1
            count = (h & 0x7F) + 1
            if h & 0x80:
                if i + px_bytes > len(data):
                    raise ValueError("truncated TGA RLE packet")
                out += data[i:i + px_bytes] * count
                i += px_bytes
            else:
                span = count * px_bytes
                if i + span > len(data):
                    raise ValueError("truncated TGA raw packet")
                out += data[i:i + span]
                i += span
        raw = bytes(out[:need])
        base_type = img_type - 8
    else:
        need = n_px * px_bytes
        if pos + need > len(data):
            raise ValueError("truncated TGA pixel data")
        raw = data[pos:pos + need]
        base_type = img_type

    def _mean_of(pixels: np.ndarray, bits: int) -> float:
        """pixels: (n, entry_bytes) uint8 rows, BGR(A) order."""
        if bits in (15, 16):
            v = pixels[:, 0].astype(np.uint16) | (
                pixels[:, 1].astype(np.uint16) << 8
            )
            acc = (
                ((v >> 10) & 0x1F) / 31.0
                + ((v >> 5) & 0x1F) / 31.0
                + (v & 0x1F) / 31.0
            )
            return float(acc.mean() / 3.0)
        if bits in (24, 32):
            return float(pixels[:, :3].astype(np.float64).mean() / 255.0)
        raise ValueError(f"unsupported TGA depth {bits}")

    if base_type == 3:  # grayscale
        if bpp != 8:
            raise ValueError(f"unsupported gray TGA depth {bpp}")
        mean = float(
            np.frombuffer(raw, np.uint8).astype(np.float64).mean() / 255.0
        )
        ch = 1
    elif base_type == 2:  # truecolor
        px = np.frombuffer(raw, np.uint8).reshape(n_px, px_bytes)
        mean = _mean_of(px, bpp)
        ch = 3
    else:  # color-mapped
        if cmap is None:
            raise ValueError("color-mapped TGA without a color map")
        if bpp != 8:
            raise ValueError(f"unsupported TGA index depth {bpp}")
        cm_raw, first, n_entries, cm_bits = cmap
        entry_bytes = (cm_bits + 7) // 8
        idx = np.frombuffer(raw, np.uint8).astype(np.int32) - first
        if idx.min(initial=0) < 0 or idx.max(initial=0) >= n_entries:
            raise ValueError("TGA palette index out of range")
        table = np.frombuffer(cm_raw, np.uint8).reshape(
            n_entries, entry_bytes
        )
        mean = _mean_of(table[idx], cm_bits)
        ch = 3
    return {"width": width, "height": height, "channels": ch,
            "mean_intensity": mean}


