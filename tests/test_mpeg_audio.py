"""MP3 / ADTS AAC frame-header metadata (multimodal/mpeg_audio_lite,
r12): exact frame walks give duration/rate/channels; ID3v2 prefixes
and ID3v1 tails are handled; Xing VBR headers are detected; anything
reserved, free-format, desynced, or truncated raises (fail closed).
Fixtures build frames from the ISO 11172-3 / 13818-7 bit layouts
independently of the module under test."""

from __future__ import annotations

import pytest

from pythondataingestionprocess_spark.multimodal import mpeg_audio_lite as ma


def _mp3_frame(kbps_idx: int = 9, sr_idx: int = 0, pad: int = 0,
               mono: bool = False, version_bits: int = 3,
               layer_bits: int = 1) -> bytes:
    """One MPEG frame with a dummy payload. Defaults: MPEG1 Layer III
    (version 11, layer 01), bitrate index 9 (128 kbps), 44100 Hz."""
    b1 = 0xE0 | (version_bits << 3) | (layer_bits << 1) | 1  # no CRC
    b2 = (kbps_idx << 4) | (sr_idx << 2) | (pad << 1)
    b3 = 0xC0 if mono else 0x00  # channel mode
    hdr = bytes([0xFF, b1, b2, b3])
    kbps = {9: 128, 10: 160, 14: 320}[kbps_idx]
    sr = {0: 44100, 1: 48000, 2: 32000}[sr_idx]
    frame_len = 144 * kbps * 1000 // sr + pad
    return hdr + bytes(frame_len - 4)


def _id3v2(payload_len: int = 100) -> bytes:
    # syncsafe size
    sz = payload_len
    return b"ID3\x04\x00\x00" + bytes(
        [(sz >> 21) & 0x7F, (sz >> 14) & 0x7F, (sz >> 7) & 0x7F, sz & 0x7F]
    ) + bytes(payload_len)


def test_mp3_cbr_walk_exact_duration():
    data = _mp3_frame() * 5
    meta = ma.parse_mp3(data)
    assert meta["codec"] == "mp3" and meta["mpeg_version"] == 1
    assert meta["sample_rate"] == 44100 and meta["channels"] == 2
    assert meta["n_frames"] == 5 and meta["n_samples"] == 5 * 1152
    assert meta["duration_sec"] == pytest.approx(5 * 1152 / 44100)
    assert meta["bitrate_kbps"] == 128 and meta["vbr"] is False


def test_mp3_padding_bit_changes_frame_length():
    """Padded frames are one byte longer — a walker ignoring the bit
    desyncs immediately."""
    data = _mp3_frame(pad=1) + _mp3_frame(pad=0) + _mp3_frame(pad=1)
    meta = ma.parse_mp3(data)
    assert meta["n_frames"] == 3


def test_mp3_id3v2_prefix_and_id3v1_tail():
    data = _id3v2(64) + _mp3_frame() * 3 + b"TAG" + bytes(125)
    meta = ma.parse_mp3(data)
    assert meta["has_id3"] is True and meta["n_frames"] == 3


def test_mp3_vbr_mixed_bitrates_flagged():
    data = _mp3_frame(kbps_idx=9) + _mp3_frame(kbps_idx=14)
    meta = ma.parse_mp3(data)
    assert meta["vbr"] is True and meta["bitrate_kbps"] is None
    assert meta["n_frames"] == 2


def test_mp3_xing_header_detected():
    """A Xing tag in the first frame declares the frame count; the
    walked count stays ground truth, the declaration is surfaced."""
    frame = bytearray(_mp3_frame())
    off = 36  # MPEG1 stereo: 32-byte side info + 4-byte header
    frame[off:off + 4] = b"Xing"
    frame[off + 4:off + 8] = (1).to_bytes(4, "big")   # FRAMES flag
    frame[off + 8:off + 12] = (7).to_bytes(4, "big")  # declared count
    meta = ma.parse_mp3(bytes(frame) + _mp3_frame() * 2)
    assert meta["vbr"] is True
    assert meta["declared_frames"] == 7
    assert meta["n_frames"] == 3  # walked, not declared


def test_mp3_free_format_raises():
    bad = bytearray(_mp3_frame())
    bad[2] = (0 << 4) | (0 << 2)  # bitrate index 0 = free format
    with pytest.raises(ValueError, match="free-format"):
        ma.parse_mp3(bytes(bad))


def test_mp3_truncated_final_frame_raises():
    data = _mp3_frame() * 2
    with pytest.raises(ValueError, match="truncated|trailing"):
        ma.parse_mp3(data[:-40])


def test_mp3_mid_file_garbage_raises():
    data = _mp3_frame() + bytes(10) + _mp3_frame()
    with pytest.raises(ValueError, match="desync|trailing"):
        ma.parse_mp3(data)


def _adts_frame(sr_idx: int = 4, channels: int = 2,
                payload: int = 100) -> bytes:
    frame_len = 7 + payload
    b = bytearray(7)
    b[0] = 0xFF
    b[1] = 0xF1  # MPEG-4, layer 00, no CRC
    b[2] = (1 << 6) | (sr_idx << 2) | ((channels >> 2) & 1)
    b[3] = ((channels & 3) << 6) | ((frame_len >> 11) & 3)
    b[4] = (frame_len >> 3) & 0xFF
    b[5] = ((frame_len & 7) << 5) | 0x1F
    b[6] = 0xFC
    return bytes(b) + bytes(payload)


def test_adts_walk():
    data = _adts_frame() * 4
    meta = ma.parse_adts(data)
    assert meta["codec"] == "aac"
    assert meta["sample_rate"] == 44100 and meta["channels"] == 2
    assert meta["n_frames"] == 4 and meta["n_samples"] == 4096
    assert meta["duration_sec"] == pytest.approx(4096 / 44100)


def test_adts_truncated_raises():
    with pytest.raises(ValueError, match="bad ADTS frame length"):
        ma.parse_adts((_adts_frame() * 2)[:-10])


def test_sniff_disambiguates():
    assert ma.sniff(_mp3_frame()) == "mp3"
    assert ma.sniff(_adts_frame()) == "aac"
    assert ma.sniff(_id3v2(4) + _mp3_frame()) == "mp3"
    assert ma.sniff(b"RIFF....WAVE") is None
    assert ma.sniff(b"") is None


def test_media_routes_compressed_audio():
    """real_decode: MP3/AAC get frame-walk metadata with NULL mean
    (the WAV convention: width = rate, height = channels, n_frames =
    samples); WAV still sample-decodes."""
    from pythondataingestionprocess_spark.multimodal import media

    stats = media.real_decode(_mp3_frame() * 3, "audio")
    assert (stats["width"], stats["height"]) == (44100, 2)
    assert stats["n_frames"] == 3 * 1152
    assert stats["mean_intensity"] is None
    stats = media.real_decode(_adts_frame() * 2, "audio")
    assert stats["n_frames"] == 2048 and stats["mean_intensity"] is None


def test_adts_multi_raw_data_blocks_counted():
    """r12 review: number_of_raw_data_blocks_in_frame means each frame
    carries (rdb+1)*1024 samples — ignoring it halves the duration."""
    frame = bytearray(_adts_frame())
    frame[6] |= 1  # rdb = 1 -> 2048 samples in this frame
    meta = ma.parse_adts(bytes(frame) * 3)
    assert meta["n_frames"] == 3 and meta["n_samples"] == 3 * 2048


def test_mp3_layer_change_mid_stream_raises():
    """r12 review: a Layer III + Layer I mix must fail closed, not
    report a duration computed from the first frame's spf."""
    l3 = _mp3_frame()  # 1152 samples
    # Layer I (layer bits 11), bitrate idx 9 = 288 kbps, 44100 Hz:
    # frame_len = (12*288000//44100 + 0) * 4
    b1 = 0xE0 | (3 << 3) | (3 << 1) | 1
    l1_len = (12 * 288000 // 44100) * 4
    l1 = bytes([0xFF, b1, (9 << 4) | (0 << 2), 0x00]) + bytes(l1_len - 4)
    with pytest.raises(ValueError, match="layer/version changed"):
        ma.parse_mp3(l3 + l1)


def test_mp3_id3v24_footer_flag_skipped():
    """r12 review: the v2.4 footer flag adds a 10-byte footer the
    syncsafe size excludes; a footered tag must still reach sync."""
    tag = bytearray(_id3v2(32))
    tag[5] |= 0x10  # footer flag
    data = bytes(tag) + b"3DI" + bytes(7) + _mp3_frame() * 2
    meta = ma.parse_mp3(data)
    assert meta["n_frames"] == 2 and meta["has_id3"] is True


def test_media_quarantine_guard_for_int32_sample_overflow(monkeypatch):
    """r12 review: a ~14 h stream's sample count overflows the int32
    n_frames column; real_decode must raise (→ one quarantine row)
    rather than let the overflow kill the whole Arrow batch."""
    from pythondataingestionprocess_spark.multimodal import media

    monkeypatch.setattr(
        ma, "parse_mp3", lambda c: {"n_samples": 2**31,
                                    "sample_rate": 44100, "channels": 2}
    )
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(_mp3_frame(), "audio")
