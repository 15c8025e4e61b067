"""Dependency-free QOI decoder ("Quite OK Image", qoiformat.org
spec, 2022 — public domain single-page spec).

QOI is the modern lossless interchange format some ML pipelines use
for cheap image shipping: byte-aligned ops, no entropy coder at all,
so decode is pure integer logic. Ops: QOI_OP_RGB / RGBA (literal),
QOI_OP_INDEX (64-slot running hash table), QOI_OP_DIFF (2-bit channel
deltas), QOI_OP_LUMA (green-anchored deltas), QOI_OP_RUN (1-62 repeat
of the previous pixel). The stream ends with seven 0x00 bytes then
0x01.

``decode`` returns the png_lite stats contract (mean over R,G,B,
alpha excluded). Reference anchor: binary media ingestion is the
engine-added analog of the reference's binary statement ingestion
(pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

import numpy as np


def _hash(r: int, g: int, b: int, a: int) -> int:
    return (r * 3 + g * 5 + b * 7 + a * 11) % 64


def decode(data: bytes) -> dict:
    if len(data) < 22 or data[:4] != b"qoif":
        raise ValueError("not a QOI (bad magic)")
    width, height = struct.unpack_from(">II", data, 4)
    channels = data[12]
    colorspace = data[13]
    if channels not in (3, 4) or colorspace not in (0, 1):
        raise ValueError(
            f"bad QOI header (channels={channels}, colorspace={colorspace})"
        )
    if not width or not height:
        raise ValueError(f"bad QOI geometry {width}x{height}")
    if width * height > 25_000_000:
        # per-op Python loop (QOI has no vectorizable layout): bound
        # wall time per blob the same way the VP8L guard does
        raise ValueError("QOI dimensions exceed the 25MP decode guard")
    n = width * height
    out = np.empty((n, 4), dtype=np.uint8)
    index = [(0, 0, 0, 0)] * 64
    r, g, b, a = 0, 0, 0, 255
    pos = 14
    i = 0
    end = len(data) - 8  # stream terminator
    while i < n:
        if pos >= end:
            raise ValueError("QOI stream truncated")
        byte = data[pos]
        pos += 1
        if byte == 0xFE:  # QOI_OP_RGB
            if pos + 3 > end:  # operands must not straddle the marker
                raise ValueError("QOI stream truncated")
            r, g, b = data[pos], data[pos + 1], data[pos + 2]
            pos += 3
        elif byte == 0xFF:  # QOI_OP_RGBA
            if pos + 4 > end:
                raise ValueError("QOI stream truncated")
            r, g, b, a = data[pos], data[pos + 1], data[pos + 2], data[pos + 3]
            pos += 4
        else:
            tag = byte >> 6
            if tag == 0:  # QOI_OP_INDEX
                r, g, b, a = index[byte & 0x3F]
            elif tag == 1:  # QOI_OP_DIFF (deltas -2..1, bias 2)
                r = (r + ((byte >> 4) & 3) - 2) & 0xFF
                g = (g + ((byte >> 2) & 3) - 2) & 0xFF
                b = (b + (byte & 3) - 2) & 0xFF
            elif tag == 2:  # QOI_OP_LUMA
                if pos + 1 > end:
                    raise ValueError("QOI stream truncated")
                dg = (byte & 0x3F) - 32
                nxt = data[pos]
                pos += 1
                r = (r + dg - 8 + ((nxt >> 4) & 0xF)) & 0xFF
                b = (b + dg - 8 + (nxt & 0xF)) & 0xFF
                g = (g + dg) & 0xFF
            else:  # QOI_OP_RUN (1..62, bias -1)
                run = (byte & 0x3F) + 1
                if i + run > n:
                    raise ValueError("QOI run overflows the image")
                out[i:i + run] = (r, g, b, a)
                i += run
                continue
        index[_hash(r, g, b, a)] = (r, g, b, a)
        out[i] = (r, g, b, a)
        i += 1
    if data[end:end + 8] != b"\x00\x00\x00\x00\x00\x00\x00\x01":
        raise ValueError("QOI stream missing its end marker")
    mean = float(out[:, :3].astype(np.float64).mean() / 255.0)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "mean_intensity": mean,
    }
