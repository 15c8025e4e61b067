"""Deterministic real-format media synthesis: doc ids → tiny valid
BMP / TIFF / WAV / MOV blobs whose decoded stats are CLOSED-FORM
functions of the id.

This is the bridge that lets the REAL decoders (bmp_lite, tiff_lite,
wav_lite, mp4_lite + the raw-video path) be driver-checked against a
SQL oracle: every byte of every blob derives from ``doc_id`` alone,
and each format is built so its decoded stats are integer arithmetic
a DuckDB query can replicate —

- BMP (``image/bmp``): RLE8-compressed, 256-entry grayscale palette,
  every pixel the same index c → mean_intensity = c/255, n_frames 1.
  The decoder must still walk the DIB header, expand encoded runs,
  honor EOL/EOB, and resolve the palette.
- TIFF (``image/tiff``): PackBits-compressed single-strip grayscale,
  every sample v → mean = v/255. Exercises the IFD walk, inline
  values, and RLE expansion.
- WAV (``audio/wav``): G.711 mu-law, every byte b → mean amplitude =
  ulaw(b)/32767 where ulaw() is the closed-form G.711 expansion the
  oracle restates in SQL integer math. Exercises the RIFF walk and
  the companding table.
- MOV (``video/quicktime``): uncompressed 'raw ' RGB24 track, 3
  frames of constant gray g → mean luma = g·(0.299+0.587+0.114)/255 =
  g/255 (to within 1e-13 — six-decimal rounding is exact because
  g/255·10^6 is never closer than 1/510 to a rounding boundary).
  Exercises the ISO-BMFF box walk, sample tables, and the raw-frame
  path.

Scale note: synthesis runs inside the same Arrow-batched mapInPandas
discipline as decode_media — per-row byte building, no driver
materialization; blobs are O(100) bytes so the stage is CPU-trivial.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = "id long, media_type string, content binary"


def bmp_rle8(width: int, height: int, color: int) -> bytes:
    """RLE8 BMP, grayscale palette, constant pixel index ``color``."""
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    rle = bytearray()
    for _ in range(height):
        rle += bytes([width, color, 0, 0])  # one run + EOL
    rle += bytes([0, 1])  # EOB
    dib = struct.pack(
        "<IiihhIIiiII", 40, width, height, 1, 8, 1,
        len(rle), 2835, 2835, 256, 0,
    )
    data_off = 14 + len(dib) + len(palette)
    hdr = b"BM" + struct.pack("<IHHI", data_off + len(rle), 0, 0, data_off)
    return hdr + dib + palette + bytes(rle)


def tiff_packbits_gray(width: int, height: int, value: int) -> bytes:
    """Single-strip PackBits grayscale TIFF (little-endian), every
    sample = ``value``."""
    n = width * height
    strip = bytearray()
    left = n
    while left > 0:
        run = min(left, 128)
        strip += bytes([257 - run, value])
        left -= run
    entries = [
        (256, 3, (width,)), (257, 3, (height,)), (258, 3, (8,)),
        (259, 3, (32773,)), (262, 3, (1,)), (277, 3, (1,)),
        (278, 4, (height,)), (279, 4, (len(strip),)),
    ]
    # IFD right after header; strip data after IFD (all values inline)
    n_tags = len(entries) + 1  # + StripOffsets
    ifd_size = 2 + 12 * n_tags + 4
    strip_off = 8 + ifd_size
    entries.append((273, 4, (strip_off,)))
    entries.sort(key=lambda e: e[0])
    ifd = struct.pack("<H", n_tags)
    for tid, typ, vals in entries:
        fmt = {3: "H", 4: "I"}[typ]
        raw = struct.pack("<" + fmt * len(vals), *vals)
        ifd += struct.pack("<HHI", tid, typ, len(vals)) + raw + b"\0" * (
            4 - len(raw)
        )
    ifd += struct.pack("<I", 0)
    return b"II*\x00" + struct.pack("<I", 8) + ifd + bytes(strip)


def wav_ulaw(n_samples: int, code: int) -> bytes:
    """Mono 8 kHz G.711 mu-law WAV, every sample byte = ``code``."""
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes([code]) * n_samples
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"fact" + struct.pack("<II", 4, n_samples)
        + b"data" + struct.pack("<I", len(data)) + data
        + (b"\0" if n_samples & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _fullbox(btype: bytes, body: bytes) -> bytes:
    return _box(btype, bytes(4) + body)


def mov_raw_rgb(width: int, height: int, gray: int, n_frames: int = 3) -> bytes:
    """QuickTime MOV with one 'raw ' RGB24 video track: ``n_frames``
    identical frames of constant gray. mdat precedes moov so the stco
    offset is known while building."""
    frame = bytes([gray]) * (width * height * 3)
    ftyp = _box(b"ftyp", b"qt  \x00\x00\x02\x00qt  ")
    mdat = _box(b"mdat", frame * n_frames)
    tkhd = _fullbox(
        b"tkhd", bytes(4 * 19) + struct.pack(">II", width << 16, height << 16)
    )
    hdlr = _fullbox(b"hdlr", bytes(4) + b"vide" + bytes(12) + b"r\x00")
    entry = (
        struct.pack(">I", 86) + b"raw " + bytes(74)
        + struct.pack(">H", 24) + bytes(2)  # depth 24 at entry+82
    )
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + entry)
    stsz = _fullbox(b"stsz", struct.pack(">II", len(frame), n_frames))
    stco = _fullbox(b"stco", struct.pack(">II", 1, len(ftyp) + 8))
    stbl = _box(b"stbl", stsd + stsz + stco)
    trak = _box(b"trak", tkhd + _box(b"mdia", hdlr + _box(b"minf", stbl)))
    mvhd = _fullbox(b"mvhd", struct.pack(">IIII", 0, 0, 600, 600) + bytes(80))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


# The id → parameter derivations. ONE definition, restated by the
# face's DuckDB oracle in SQL arithmetic — keep the two in sync
# (plans/llm_ops.py::_REAL_DECODE_ORACLE).
def blob_for(doc_id: int) -> tuple[str, bytes]:
    kind = doc_id % 4
    if kind == 0:
        return "image/bmp", bmp_rle8(
            3 + doc_id % 10, 2 + doc_id % 5, doc_id % 256
        )
    if kind == 1:
        return "image/tiff", tiff_packbits_gray(
            2 + doc_id % 9, 1 + doc_id % 6, (doc_id * 7) % 256
        )
    if kind == 2:
        return "audio/wav", wav_ulaw(20 + doc_id % 80, 16 + doc_id % 64)
    return "video/quicktime", mov_raw_rgb(
        2 + doc_id % 6, 1 + doc_id % 4, 30 + doc_id % 200
    )


def synthesize_blobs(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id) → (id, media_type, content): Arrow-batched construction of
    one real-format blob per row, deterministic in the id."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                mt, blob = blob_for(int(did))
                rows.append({"id": int(did), "media_type": mt,
                             "content": blob})
            yield pd.DataFrame(rows, columns=["id", "media_type", "content"])

    narrow = df.select(F.col(id_col).alias("id"))
    return narrow.mapInPandas(build, schema=BLOB_SCHEMA)
