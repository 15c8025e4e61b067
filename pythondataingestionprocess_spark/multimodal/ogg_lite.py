"""Ogg container METADATA (RFC 3533 page walk) with Opus (RFC 7845)
and Vorbis I identification headers — the compressed-audio family web
corpora carry alongside MP3/AAC. Real metadata — codec, channels,
sample rate, total samples from the terminal granule position — with
honestly-NULL amplitude stats: Opus/Vorbis sample decode is MDCT
codec territory (same documented gap class as MP3/AAC).

Reference anchor: binary media ingestion is the engine-added analog
of the reference's binary statement ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

_UNSET_GRANULE = 0xFFFFFFFFFFFFFFFF


def _pages(content: bytes):
    """Yield (serial, header_type, granule, payload) per RFC 3533;
    raises on structural corruption (quarantine, not a guess)."""
    pos = 0
    n = len(content)
    while pos < n:
        if content[pos:pos + 4] != b"OggS":
            raise ValueError(f"bad Ogg capture pattern at {pos}")
        if pos + 27 > n:
            raise ValueError("truncated Ogg page header")
        version = content[pos + 4]
        if version != 0:
            raise ValueError(f"unsupported Ogg version {version}")
        header_type = content[pos + 5]
        (granule,) = struct.unpack_from("<Q", content, pos + 6)
        (serial,) = struct.unpack_from("<I", content, pos + 14)
        nsegs = content[pos + 26]
        seg_end = pos + 27 + nsegs
        if seg_end > n:
            raise ValueError("truncated Ogg segment table")
        body = sum(content[pos + 27:seg_end])
        if seg_end + body > n:
            raise ValueError("truncated Ogg page body")
        yield serial, header_type, granule, content[seg_end:seg_end + body]
        pos = seg_end + body


def decode_meta(content: bytes) -> dict:
    """{'codec','channels','sample_rate','n_samples'} for the FIRST
    audio logical stream. n_samples derives from the stream's last
    non-unset granule position (Opus granules run at 48 kHz and are
    offset by pre-skip per RFC 7845 section 4; Vorbis granules are
    samples at the declared rate)."""
    if content[:4] != b"OggS":
        raise ValueError("not an Ogg (capture pattern)")
    codec = None
    serial = None
    channels = rate = None
    preskip = 0
    last_granule = None
    for ser, htype, granule, payload in _pages(content):
        if codec is None and (htype & 0x02):  # BOS page
            if payload[:8] == b"OpusHead":
                if len(payload) < 19:
                    raise ValueError("truncated OpusHead")
                codec = "opus"
                channels = payload[9]
                (preskip,) = struct.unpack_from("<H", payload, 10)
                # granule units are ALWAYS 48 kHz for Opus; the input
                # rate at offset 12 is informational only
                rate = 48000
                serial = ser
            elif payload[:7] == b"\x01vorbis":
                if len(payload) < 30:
                    raise ValueError("truncated Vorbis id header")
                codec = "vorbis"
                channels = payload[11]
                (rate,) = struct.unpack_from("<I", payload, 12)
                serial = ser
            # other BOS streams (theora/skeleton/...) are skipped; the
            # first recognized AUDIO stream wins
        if ser == serial and granule != _UNSET_GRANULE:
            last_granule = granule
    if codec is None:
        raise ValueError("Ogg without a recognized audio stream")
    if not channels or not rate:
        raise ValueError(f"bad {codec} id header (channels/rate)")
    n_samples = 0
    if last_granule is not None:
        n_samples = max(0, last_granule - (preskip if codec == "opus" else 0))
    return {
        "codec": codec,
        "channels": channels,
        "sample_rate": rate,
        "n_samples": n_samples,
    }
