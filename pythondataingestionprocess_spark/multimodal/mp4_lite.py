"""Stdlib MP4 / ISO BMFF (MPEG-4 Part 12) container metadata — no
frame decode.

An MP4 file is a tree of length-prefixed boxes; everything a video
catalog stage needs lives in ``moov``: presentation duration
(``mvhd``: timescale + duration), per-track media kind (``hdlr``:
'vide'/'soun'/...), visual dimensions (``tkhd``: 16.16 fixed point),
and the sample count (``stsz``/``stz2``). Parsing them is pure byte
walking — the codec payload in ``mdat`` is never touched, so this is
real in-container video *metadata* the way jpeg_lite is for JPEG;
actual frame decode stays PyAV/ffmpeg territory (stubbed, documented).

Scale: metadata boxes are KBs at the FRONT of a well-formed (faststart)
file; a reader that range-fetches ``moov`` catalogs a petabyte of video
without ever pulling payload bytes.
"""

from __future__ import annotations

import struct


def _iter_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) for the boxes in
    buf[start:end]; handles 64-bit largesize boxes."""
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", buf[i:i + 4])
        btype = buf[i + 4:i + 8]
        body = i + 8
        if size == 1:  # 64-bit largesize follows the type
            if body + 8 > end:
                raise ValueError(f"truncated largesize box at {i}")
            (size,) = struct.unpack(">Q", buf[body:body + 8])
            body += 8
        elif size == 0:  # box extends to end of enclosing scope
            size = end - i
        if size < 8 or i + size > end:
            raise ValueError(f"bad box size {size} at {i}")
        yield btype, body, i + size
        i += size


def _find(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _iter_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def _fullbox(buf: bytes, body: int) -> tuple[int, int]:
    """(version, first-field offset) of a FullBox body."""
    return buf[body], body + 4


def parse_meta(content: bytes) -> dict:
    """Container metadata: duration_sec, n_tracks, track_types (sorted
    handler fourccs), width/height of the first video track, n_samples
    of that track. Raises ``ValueError`` on non-BMFF or truncated
    input (quarantine discipline)."""
    top = list(_iter_boxes(content, 0, len(content)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("not an ISO-BMFF file (missing ftyp/moov)")
    moov_b, moov_e = next((b, e) for t, b, e in top if t == b"moov")

    mvhd = _find(content, moov_b, moov_e, b"mvhd")
    if mvhd is None:
        raise ValueError("moov without mvhd")
    ver, off = _fullbox(content, mvhd[0])
    if ver == 1:
        _, _, timescale, duration = struct.unpack(
            ">QQIQ", content[off:off + 28]
        )
    else:
        _, _, timescale, duration = struct.unpack(
            ">IIII", content[off:off + 16]
        )
    if timescale == 0:
        raise ValueError("mvhd timescale 0")

    track_types: list[str] = []
    width = height = n_samples = None
    for t, b, e in _iter_boxes(content, moov_b, moov_e):
        if t != b"trak":
            continue
        handler = "unkn"
        mdia = _find(content, b, e, b"mdia")
        if mdia is not None:
            hdlr = _find(content, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                _, off_h = _fullbox(content, hdlr[0])
                handler = content[off_h + 4:off_h + 8].decode(
                    "ascii", "replace"
                )
        track_types.append(handler)
        if handler == "vide" and width is None:
            tkhd = _find(content, b, e, b"tkhd")
            if tkhd is not None:
                ver_t, off_t = _fullbox(content, tkhd[0])
                # width/height are the LAST 8 bytes of tkhd (16.16)
                end_t = tkhd[1]
                w_fp, h_fp = struct.unpack(">II", content[end_t - 8:end_t])
                width, height = w_fp >> 16, h_fp >> 16
            if mdia is not None:
                minf = _find(content, mdia[0], mdia[1], b"minf")
                stbl = minf and _find(content, minf[0], minf[1], b"stbl")
                stsz = stbl and (
                    _find(content, stbl[0], stbl[1], b"stsz")
                    or _find(content, stbl[0], stbl[1], b"stz2")
                )
                if stsz:
                    # stsz: uint32 sample_size, uint32 sample_count;
                    # stz2: 24-bit reserved + uint8 field_size, uint32
                    # sample_count — the count sits at +4 either way
                    _, off_s = _fullbox(content, stsz[0])
                    _, n_samples = struct.unpack(
                        ">II", content[off_s:off_s + 8]
                    )
    return {
        "duration_sec": duration / timescale,
        "n_tracks": len(track_types),
        "track_types": sorted(track_types),
        "width": width,
        "height": height,
        "n_samples": n_samples,
    }
