"""MPEG audio (MP3) and ADTS AAC frame-HEADER metadata — stdlib only.

The audio analogue of mp4_lite: compressed-audio SAMPLE decode is
genuinely codec territory (no PyAV/ffmpeg in this container), but the
frame headers are plain bit fields (ISO 11172-3 / 13818-3 §2.4.1 for
MPEG audio; 13818-7 §6.2 for ADTS), so duration, sample rate, channel
count, frame count, and CBR/VBR-ness are all REAL metadata, computed
by walking every frame:

- **MP3 / MPEG audio**: ID3v2 prefix skipped (syncsafe size), each
  frame's length derived from (version, layer, bitrate index, sample
  rate, padding), Xing/Info/VBRI headers detected for the VBR flag
  (and cross-checked against the walked frame count), ID3v1 ``TAG``
  tail accepted. Free-format bitrate (index 0), reserved values, a
  mid-file desync, or a truncated final frame raise ``ValueError`` —
  the caller quarantines instead of reporting a wrong duration (the
  pdf_lite fail-closed discipline).
- **ADTS AAC**: 0xFFF sync with layer '00', frame length from the
  13-bit header field, (number_of_raw_data_blocks + 1) x 1024 samples
  per frame.

At 100 TB this is the catalog/filter stage for audio: duration and
sample-rate screens run on header walks (cheap, sequential, no
decode); actual waveform features stay behind a real codec where one
exists.
"""

from __future__ import annotations

# bitrate tables in kbps, rows indexed 1..14 (index 0 = free-format,
# 15 = reserved — both raise); ISO 11172-3 table B.2 / 13818-3
_BR = {
    (1, 1): [32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448],
    (1, 2): [32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384],
    (1, 3): [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    (2, 1): [32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256],
    (2, 2): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    (2, 3): [8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
_SR = {1: [44100, 48000, 32000], 2: [22050, 24000, 16000],
       25: [11025, 12000, 8000]}
_ADTS_SR = [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
            16000, 12000, 11025, 8000, 7350]


def _id3v2_size(content: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none). The v2.4
    footer flag (0x10) adds a 10-byte '3DI' footer the syncsafe size
    EXCLUDES (r12 review: footered tags from common taggers landed on
    the footer bytes and quarantined valid files)."""
    if content[:3] != b"ID3" or len(content) < 10:
        return 0
    sz = 0
    for b in content[6:10]:
        if b & 0x80:
            raise ValueError("malformed ID3v2 syncsafe size")
        sz = (sz << 7) | b
    footer = 10 if content[5] & 0x10 else 0
    return 10 + sz + footer


def _mp3_frame(
    content: bytes, i: int
) -> tuple[int, int, int, int, int, int]:
    """(frame_len, sample_rate, samples_per_frame, channels, kbps,
    version) for the frame header at offset i; raises on anything
    reserved."""
    b1, b2, b3 = content[i + 1], content[i + 2], content[i + 3]
    ver_bits = (b1 >> 3) & 3
    if ver_bits == 1:
        raise ValueError("reserved MPEG version")
    version = {0: 25, 2: 2, 3: 1}[ver_bits]
    layer = {1: 3, 2: 2, 3: 1}.get((b1 >> 1) & 3)
    if layer is None:
        raise ValueError("reserved MPEG layer")
    br_idx = (b2 >> 4) & 0xF
    if br_idx == 0:
        raise ValueError("free-format bitrate (frame length unknowable)")
    if br_idx == 15:
        raise ValueError("reserved bitrate index")
    sr_idx = (b2 >> 2) & 3
    if sr_idx == 3:
        raise ValueError("reserved sample rate index")
    kbps = _BR[(1 if version == 1 else 2, layer)][br_idx - 1]
    sr = _SR[version][sr_idx]
    padding = (b2 >> 1) & 1
    channels = 1 if ((b3 >> 6) & 3) == 3 else 2
    if layer == 1:
        spf = 384
        frame_len = (12 * kbps * 1000 // sr + padding) * 4
    else:
        spf = 1152 if (layer == 2 or version == 1) else 576
        frame_len = spf // 8 * kbps * 1000 // sr + padding
    return frame_len, sr, spf, channels, kbps, version


def _xing_frames(content: bytes, i: int, version: int, channels: int):
    """Frame count from a Xing/Info/VBRI header in the first frame, or
    None. Xing sits after the side info; VBRI at a fixed +36."""
    if version == 1:
        off = 21 if channels == 1 else 36
    else:
        off = 13 if channels == 1 else 21
    tag = content[i + off:i + off + 4]
    if tag in (b"Xing", b"Info"):
        flags = int.from_bytes(content[i + off + 4:i + off + 8], "big")
        if flags & 1:
            return (
                int.from_bytes(content[i + off + 8:i + off + 12], "big"),
                tag == b"Xing",
            )
        return None, tag == b"Xing"
    if content[i + 36:i + 40] == b"VBRI":
        return (
            int.from_bytes(content[i + 50:i + 54], "big"),
            True,
        )
    return None, False


def parse_mp3(content: bytes) -> dict:
    """Walk every MPEG-audio frame; exact duration from the walk."""
    i = _id3v2_size(content)
    has_id3 = i > 0
    n = len(content)
    if i + 4 > n or content[i] != 0xFF or (content[i + 1] & 0xE0) != 0xE0:
        raise ValueError("no MPEG audio frame sync")
    _, sr, spf, channels, kbps0, version = _mp3_frame(content, i)
    declared, vbr_tag = _xing_frames(content, i, version, channels)
    frames = 0
    bitrates = set()
    while i < n:
        rest = n - i
        if rest < 4:
            raise ValueError("trailing bytes after last frame")
        if content[i:i + 3] == b"TAG" and rest == 128:
            break  # ID3v1 tail
        if content[i] != 0xFF or (content[i + 1] & 0xE0) != 0xE0:
            raise ValueError(f"frame desync at byte {i}")
        frame_len, f_sr, f_spf, f_ch, kbps, _ = _mp3_frame(content, i)
        if f_sr != sr:
            raise ValueError("sample rate changed mid-stream")
        # samples-per-frame or channel-mode changes get the SAME
        # fail-closed treatment as sample rate (r12 review: a mixed
        # Layer III / Layer I stream walked cleanly and reported a
        # silently wrong duration from the first frame's spf)
        if f_spf != spf:
            raise ValueError("layer/version changed mid-stream")
        if f_ch != channels:
            raise ValueError("channel mode changed mid-stream")
        if i + frame_len > n:
            raise ValueError("truncated final frame")
        bitrates.add(kbps)
        frames += 1
        i += frame_len
    # a Xing/Info frame is a metadata frame, not audio — but producers
    # disagree; report the WALKED count (ground truth) and flag VBR
    # from either the tag or observed bitrate variety
    vbr = vbr_tag or len(bitrates) > 1
    return {
        "codec": "mp3",
        "mpeg_version": version,
        "sample_rate": sr,
        "channels": channels,
        "n_frames": frames,
        "n_samples": frames * spf,
        "duration_sec": frames * spf / sr,
        "bitrate_kbps": None if len(bitrates) > 1 else kbps0,
        "vbr": vbr,
        "declared_frames": declared,
        "has_id3": has_id3,
    }


def parse_adts(content: bytes) -> dict:
    """Walk ADTS AAC frames (13818-7 §6.2): 0xFFF sync, 13-bit frame
    length including the 7/9-byte header, 1024 samples per frame."""
    i, n = 0, len(content)
    if n < 7 or content[0] != 0xFF or (content[1] & 0xF6) != 0xF0:
        raise ValueError("no ADTS sync")
    sr_idx = (content[2] >> 2) & 0xF
    if sr_idx >= len(_ADTS_SR):
        raise ValueError("reserved ADTS sampling frequency index")
    sr = _ADTS_SR[sr_idx]
    channels = ((content[2] & 1) << 2) | (content[3] >> 6)
    if channels == 0:
        raise ValueError("PCE-based channel config unsupported")
    frames = 0
    samples = 0
    while i < n:
        if n - i < 7:
            raise ValueError("truncated ADTS header")
        if content[i] != 0xFF or (content[i + 1] & 0xF6) != 0xF0:
            raise ValueError(f"ADTS desync at byte {i}")
        if ((content[i + 2] >> 2) & 0xF) != sr_idx:
            raise ValueError("sample rate changed mid-stream")
        frame_len = (
            ((content[i + 3] & 3) << 11)
            | (content[i + 4] << 3)
            | (content[i + 5] >> 5)
        )
        if frame_len < 7 or i + frame_len > n:
            raise ValueError("bad ADTS frame length")
        # number_of_raw_data_blocks_in_frame (byte 6 low 2 bits): each
        # frame carries (rdb + 1) x 1024 samples — ignoring it halves
        # reported duration on multi-RDB files (r12 review)
        samples += (1 + (content[i + 6] & 3)) * 1024
        frames += 1
        i += frame_len
    return {
        "codec": "aac",
        "sample_rate": sr,
        "channels": channels,
        "n_frames": frames,
        "n_samples": samples,
        "duration_sec": samples / sr,
        "vbr": None,  # ADTS carries no CBR/VBR declaration
        "has_id3": False,
    }


def sniff(content: bytes) -> str | None:
    """'mp3' / 'aac' / None from magic bytes — ADTS first (its sync is
    a strict subset of the MPEG-audio sync with layer bits 00)."""
    if len(content) >= 4 and content[0] == 0xFF:
        if (content[1] & 0xF6) == 0xF0:
            return "aac"
        if (content[1] & 0xE0) == 0xE0 and ((content[1] >> 1) & 3) != 0:
            return "mp3"
    if content[:3] == b"ID3":
        return "mp3"
    return None
