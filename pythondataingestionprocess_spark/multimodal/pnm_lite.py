"""Dependency-free PNM (Netpbm) decoder: P1-P3 ASCII and P4-P6
binary portable bitmap/graymap/pixmap — the zero-compression
interchange format scientific and OCR corpora carry. 8- and 16-bit
(big-endian) sample depths, comment-tolerant header parsing, 100MP
geometry guard. P1/P4 invert (1 = black per the spec) so
mean_intensity stays a luminance like every other image decoder.

``decode`` returns the png_lite stats contract. Spec: the netpbm
pbm(5)/pgm(5)/ppm(5) format pages. Reference anchor: binary media
ingestion is the engine-added analog of the reference's binary
statement ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import numpy as np


def decode(data: bytes) -> dict:
    if len(data) < 2 or data[0:1] != b"P" or data[1:2] not in b"123456":
        raise ValueError("not a PNM (bad magic)")
    kind = data[1] - ord("0")
    pos = 2
    fields_needed = 2 if kind in (1, 4) else 3

    fields = []
    while len(fields) < fields_needed:
        # skip whitespace and comments
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            nl = data.find(b"\n", pos)
            if nl < 0:
                raise ValueError("unterminated PNM comment")
            pos = nl + 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        tok = data[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad PNM header token {tok!r}")
        fields.append(int(tok))
    if kind in (1, 4):
        width, height = fields
        maxval = 1
    else:
        width, height, maxval = fields
    if not width or not height or not maxval or maxval > 65535:
        raise ValueError("bad PNM geometry/maxval")
    if width * height > 100_000_000:
        raise ValueError("PNM dimensions exceed the 100MP decode guard")
    ch = 3 if kind in (3, 6) else 1
    if kind == 1:
        # plain PBM: the spec allows pixels packed WITHOUT whitespace
        # ('0110'), so tokenize per CHARACTER; anything that is not
        # 0/1/whitespace/comment is an error (r13 review — int('10')
        # used to flow into the mean as 10)
        need = width * height
        bits = []
        i = pos
        while i < len(data) and len(bits) < need:
            c = data[i:i + 1]
            if c in (b"0", b"1"):
                bits.append(c == b"1")
            elif c == b"#":
                nl = data.find(b"\n", i)
                i = len(data) if nl < 0 else nl
            elif not c.isspace():
                raise ValueError(f"bad P1 pixel byte {c!r}")
            i += 1
        if len(bits) < need:
            raise ValueError("truncated ASCII PNM")
        vals = 1.0 - np.array(bits, dtype=np.float64)  # 1 = black
        maxval = 1
    elif kind <= 3:  # ASCII gray / RGB
        toks = data[pos:].split()
        need = width * height * ch
        if len(toks) < need:
            raise ValueError("truncated ASCII PNM")
        try:
            ints = [int(t) for t in toks[:need]]
        except ValueError:
            raise ValueError("bad ASCII PNM sample token") from None
        if any(v < 0 or v > maxval for v in ints):
            raise ValueError("ASCII PNM sample exceeds maxval")
        vals = np.array(ints, dtype=np.float64)
    else:
        pos += 1  # single whitespace after header
        if kind == 4:  # packed bitmap, rows byte-aligned
            stride = (width + 7) // 8
            need = stride * height
            if len(data) - pos < need:
                raise ValueError("truncated P4 bitmap")
            rows = np.frombuffer(data, np.uint8, need, pos).reshape(
                height, stride
            )
            bits = np.unpackbits(rows, axis=1)[:, :width]
            vals = (1 - bits).astype(np.float64)  # 1 = black
            maxval = 1
        else:
            step = 1 if maxval < 256 else 2
            need = width * height * ch * step
            if len(data) - pos < need:
                raise ValueError("truncated binary PNM")
            dt = np.uint8 if step == 1 else ">u2"
            raw = np.frombuffer(data, dt, width * height * ch, pos)
            # mirror the ASCII-path maxval check: samples above maxval
            # would scale past the documented 0-1 luminance contract
            if int(raw.max()) > maxval:
                raise ValueError("binary PNM sample exceeds maxval")
            vals = raw.astype(np.float64)
    mean = float(vals.mean() / maxval)
    return {"width": width, "height": height, "channels": ch,
            "mean_intensity": mean}


