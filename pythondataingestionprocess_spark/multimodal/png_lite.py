"""Dependency-free PNG decoder (stdlib zlib + struct).

Un-gates the IMAGE half of the multimodal decode stage: 8-bit
grayscale / gray+alpha / RGB / RGBA, non-interlaced PNGs — the format
every standard encoder emits by default — decode to (width, height,
channels, mean intensity) without PIL. All five scanline filter types
(None/Sub/Up/Average/Paeth) are implemented, so real-encoder output
(which picks filters per row) parses, not just filter-0 fixtures.

NOT handled (PIL territory, still preferred when importable): palette
(color type 3), bit depths other than 8, Adam7 interlace, ancillary
color-management chunks (ignored), and every non-PNG format — JPEG
needs a DCT pipeline no stdlib module provides.
"""

from __future__ import annotations

import struct
import zlib

SIGNATURE = b"\x89PNG\r\n\x1a\n"

_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color_type -> samples/pixel


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode(data: bytes) -> dict:
    """PNG bytes → {"width", "height", "channels", "mean_intensity"}.
    mean_intensity averages the COLOR samples (alpha excluded), 0-1.
    Raises ValueError on non-PNG input or unsupported variants."""
    if not data.startswith(SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(SIGNATURE)
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos : pos + 4]), data[
            pos + 4 : pos + 8
        ]
        body = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("no IHDR chunk")
    if bit_depth != 8 or color_type not in _CHANNELS or interlace:
        raise ValueError(
            f"unsupported PNG variant (depth={bit_depth}, "
            f"color={color_type}, interlace={interlace})"
        )
    ch = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    prev = bytearray(stride)
    total = 0
    n_color = 0
    color_ch = ch - 1 if color_type in (4, 6) else ch  # drop alpha
    for r in range(height):
        off = r * (stride + 1)
        ftype = raw[off]
        line = bytearray(raw[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                up_left = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], up_left)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad filter type {ftype}")
        for px in range(width):
            base = px * ch
            for s in range(color_ch):
                total += line[base + s]
                n_color += 1
        prev = line
    return {
        "width": width,
        "height": height,
        "channels": ch,
        "mean_intensity": (total / n_color / 255.0) if n_color else 0.0,
    }
