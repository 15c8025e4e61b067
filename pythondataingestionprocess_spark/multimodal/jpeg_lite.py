"""Stdlib JPEG header metadata (no pixel decode).

JFIF/EXIF JPEG is a sequence of ``FF xx`` marker segments; the frame
header (SOF0..SOF15, minus the DHT/DAC/RST markers sharing the range)
carries bit depth, dimensions, and component count — everything a
catalog/filter stage needs (resolution screens, aspect-ratio buckets,
grayscale-vs-color routing) without entropy-decoding a single MCU.
Pixel statistics still require a real codec (PIL route in
multimodal/media.py); this parser makes JPEG *metadata* real in this
container the same way png_lite makes PNG fully real.

At 100 TB the distinction matters: header metadata reads ~2 KB per
blob (and a reader that pushes down byte ranges never fetches the
payload), while decode touches every byte. A resolution filter that
runs on header metadata before the decode stage prunes the expensive
path for free.
"""

from __future__ import annotations

import struct

# SOF markers: C0-CF minus C4 (DHT), C8 (JPG extension), CC (DAC).
_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM: no length word
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}


def parse_header(content: bytes) -> dict:
    """Metadata from the marker stream: width, height, n_components
    (1=grayscale, 3=YCbCr, 4=CMYK), bit depth, progressive flag, and
    whether an EXIF APP1 segment is present. Raises ``ValueError`` on
    non-JPEG or truncated-before-SOF input (callers quarantine, the
    pdf_lite discipline — never guess)."""
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    has_exif = False
    i = 2
    n = len(content)
    while i + 1 < n:
        if content[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        i += 2
        if marker in _STANDALONE:
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if i + 2 > n:
            break
        (seg_len,) = struct.unpack(">H", content[i:i + 2])
        if seg_len < 2 or i + seg_len > n:
            raise ValueError(f"truncated segment 0x{marker:02x} at {i}")
        if marker == 0xE1 and content[i + 2:i + 8] == b"Exif\x00\x00":
            has_exif = True
        if marker in _SOF:
            precision, height, width, n_comp = struct.unpack(
                ">BHHB", content[i + 2:i + 8]
            )
            return {
                "width": width,
                "height": height,
                "n_components": n_comp,
                "bit_depth": precision,
                "progressive": marker in _PROGRESSIVE,
                "has_exif": has_exif,
            }
        if marker == 0xDA:  # SOS before SOF: malformed
            break
        i += seg_len
    raise ValueError("no SOF frame header found")
