"""ogg_lite (r14): Ogg Opus/Vorbis container metadata. Hand-built
RFC 3533 pages (no ogg tooling in the container — the mp4/heif
fixture discipline): BOS identification headers, multi-page granule
progression with -1 (unset) granules skipped, Opus pre-skip, page
walking across a multiplexed non-audio BOS stream, rejects, and the
media routing split (real metadata, NULL amplitude)."""

from __future__ import annotations

import struct

import pytest

from pythondataingestionprocess_spark.multimodal import media, ogg_lite


def _page(serial: int, payload: bytes, granule: int = 0,
          header_type: int = 0, seq: int = 0) -> bytes:
    segs = []
    remaining = len(payload)
    while remaining >= 255:
        segs.append(255)
        remaining -= 255
    segs.append(remaining)
    hdr = (
        b"OggS" + bytes([0, header_type])
        + struct.pack("<QII", granule & 0xFFFFFFFFFFFFFFFF, serial, seq)
        + struct.pack("<I", 0)  # crc unchecked (metadata walk)
        + bytes([len(segs)]) + bytes(segs)
    )
    return hdr + payload


def _opus_head(channels=2, preskip=312, input_rate=44100) -> bytes:
    return (
        b"OpusHead" + bytes([1, channels])
        + struct.pack("<HIhB", preskip, input_rate, 0, 0)
    )


def _vorbis_id(channels=2, rate=44100) -> bytes:
    return (
        b"\x01vorbis" + struct.pack("<IB", 0, channels)
        + struct.pack("<IiiiB", rate, 0, 128000, 0, (8 << 4) | 8)
        + b"\x01"
    )


def test_opus_metadata_with_preskip_and_unset_granules():
    blob = (
        _page(7, _opus_head(channels=1, preskip=312), header_type=2)
        + _page(7, b"OpusTags" + bytes(8), granule=-1 & (2**64 - 1), seq=1)
        + _page(7, bytes(100), granule=48000 + 312, seq=2)
        + _page(7, bytes(100), granule=96000 + 312, seq=3, header_type=4)
    )
    m = ogg_lite.decode_meta(blob)
    assert m["codec"] == "opus"
    assert (m["channels"], m["sample_rate"]) == (1, 48000)
    assert m["n_samples"] == 96000  # terminal granule minus pre-skip


def test_vorbis_metadata_and_multiplexed_skeleton_stream():
    blob = (
        _page(5, b"fishead\x00" + bytes(20), header_type=2)  # non-audio BOS
        + _page(9, _vorbis_id(channels=2, rate=22050), header_type=2)
        + _page(9, bytes(10), granule=44100, seq=1, header_type=4)
    )
    m = ogg_lite.decode_meta(blob)
    assert m["codec"] == "vorbis"
    assert (m["channels"], m["sample_rate"]) == (2, 22050)
    assert m["n_samples"] == 44100


def test_rejects():
    with pytest.raises(ValueError, match="capture pattern"):
        ogg_lite.decode_meta(b"RIFF" + bytes(30))
    page = _page(1, _opus_head(), header_type=2)
    with pytest.raises(ValueError, match="truncated Ogg page body"):
        ogg_lite.decode_meta(page[:-3])
    with pytest.raises(ValueError, match="recognized audio"):
        ogg_lite.decode_meta(_page(5, b"fishead\x00" + bytes(20),
                                   header_type=2))
    short = _page(1, b"OpusHead\x01", header_type=2)
    with pytest.raises(ValueError, match="truncated OpusHead"):
        ogg_lite.decode_meta(short)


def test_media_routes_ogg_audio_null_amplitude():
    blob = (
        _page(3, _opus_head(channels=2), header_type=2)
        + _page(3, bytes(10), granule=480312, seq=1, header_type=4)
    )
    st = media.real_decode(blob, "audio/ogg")
    # audio convention: width = rate, height = channels, n_frames =
    # samples, amplitude NULL for compressed codecs
    assert (st["width"], st["height"]) == (48000, 2)
    assert st["n_frames"] == 480000
    assert st["mean_intensity"] is None


def test_media_quarantines_vorbis_rate_above_int32():
    """Vorbis sample_rate is a raw uint32 ('<I' at offset 12); a rate
    past int32 must quarantine THIS row via ValueError, not escape
    into the batch-level astype('Int32') (r14 ADVICE)."""
    blob = (
        _page(9, _vorbis_id(channels=2, rate=2**31), header_type=2)
        + _page(9, bytes(10), granule=1000, seq=1, header_type=4)
    )
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(blob, "audio/ogg")
