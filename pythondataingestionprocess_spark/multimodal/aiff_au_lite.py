"""Dependency-free AIFF / AIFF-C and Sun AU (.snd) audio decode.

The classic Mac and Unix audio containers round out the WAV/FLAC/MPEG
coverage: both are chunked big-endian formats whose payloads are raw
PCM or the G.711 companding laws wav_lite already tables. Handled —
AIFF/AIFC: COMM (channels, frames, sample size, 80-bit extended-float
sample rate) + SSND, compression NONE / twos / sowt (little-endian
PCM) / ulaw / ULAW / alaw / ALAW / fl32 / FL32 / fl64 / FL64; AU:
encodings 1 (mu-law), 2-5 (8/16/24/32-bit linear), 6/7 (float),
27 (A-law). Unknown compressors (ima4, MACE, GSM) quarantine loudly.

Stats contract matches wav_lite.decode: sample_rate, channels,
n_samples (per channel), mean_abs_amplitude 0-1, codec.

The stdlib ``aifc``/``sunau`` modules are NOT used here (both are
deprecated); tests cross-check against them as independent readers.

Spec: Apple "Audio Interchange File Format AIFF-C" (1991); Sun/NeXT
.au header layout (the ``audio/basic`` MIME type). Reference anchor:
binary media ingestion is the engine-added analog of the reference's
binary statement ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

from pythondataingestionprocess_spark.multimodal import wav_lite


def _ext80_to_float(b: bytes) -> float:
    """80-bit IEEE 754 extended float (the COMM sampleRate field):
    1 sign + 15 exponent (bias 16383) + 64 mantissa with explicit
    integer bit."""
    if len(b) != 10:
        raise ValueError("bad 80-bit float field")
    (se,) = struct.unpack(">H", b[:2])
    (mant,) = struct.unpack(">Q", b[2:])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mant == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite sample rate")
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def decode_aiff(content: bytes) -> dict:
    """AIFF / AIFF-C bytes → wav_lite stats dict. ValueError on junk,
    truncation, or an unsupported compressor (quarantine)."""
    if len(content) < 12 or content[:4] != b"FORM":
        raise ValueError("not an AIFF (missing FORM)")
    form_type = content[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError(f"not an AIFF form: {form_type!r}")
    pos = 12
    comm = None
    ssnd = None
    while pos + 8 <= len(content):
        cid = content[pos:pos + 4]
        (size,) = struct.unpack_from(">I", content, pos + 4)
        body = content[pos + 8:pos + 8 + size]
        if len(body) < size:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if comm is None or ssnd is None:
        raise ValueError("missing COMM or SSND chunk")
    if len(comm) < 18:
        raise ValueError("COMM chunk too short")
    channels, n_frames, bits = struct.unpack_from(">HIH", comm, 0)
    rate = _ext80_to_float(comm[8:18])
    compression = b"NONE"
    if form_type == b"AIFC":
        if len(comm) < 22:
            raise ValueError("AIFC COMM without compression type")
        compression = comm[18:22]
    if channels == 0 or rate <= 0:
        raise ValueError("zero channels or sample rate")
    if len(ssnd) < 8:
        raise ValueError("SSND chunk too short")
    offset, _blk = struct.unpack_from(">II", ssnd, 0)
    data = ssnd[8 + offset:]

    comp = compression.decode("latin-1").strip().lower()
    if comp in ("none", "twos", "sowt"):
        kind, sample_bytes = "pcm", (bits + 7) // 8
    elif comp in ("ulaw", "alaw"):
        kind, sample_bytes = comp, 1
    elif comp in ("fl32", "fl64"):
        kind, sample_bytes = "float", 4 if comp == "fl32" else 8
    else:
        raise ValueError(f"unsupported AIFC compressor {compression!r}")
    # stats cover EXACTLY the declared frames: block-aligned or padded
    # SSND tails must not skew the amplitude (review finding — the
    # same discipline as wav_lite's fact-count trim)
    needed = n_frames * channels * sample_bytes
    if len(data) < needed:
        raise ValueError(
            f"SSND holds {len(data)} bytes, COMM declares {needed}"
        )
    data = data[:needed]
    if kind == "pcm":
        byteorder = "<" if comp == "sowt" else ">"
        mean, total = wav_lite.int_pcm_stats(data, bits, byteorder)
        codec = "pcm"
    elif kind == "float":
        mean, total = wav_lite.float_stats(data, sample_bytes * 8, ">")
        codec = "float"
    else:
        mean, total = wav_lite.g711_stats(data, kind)
        codec = kind
    return {
        "sample_rate": int(round(rate)),
        "channels": channels,
        "n_samples": n_frames,
        "mean_abs_amplitude": mean,
        "codec": codec,
    }


# AU encoding ids → (kind, bits)
_AU_ENCODINGS = {
    1: ("ulaw", 8), 2: ("pcm", 8), 3: ("pcm", 16), 4: ("pcm", 24),
    5: ("pcm", 32), 6: ("float", 32), 7: ("float", 64), 27: ("alaw", 8),
}


def decode_au(content: bytes) -> dict:
    """Sun/NeXT .au bytes → wav_lite stats dict."""
    if len(content) < 24 or content[:4] != b".snd":
        raise ValueError("not an AU file (missing .snd)")
    _, data_off, data_size, encoding, rate, channels = struct.unpack_from(
        ">IIIIII", content, 0
    )
    if data_off < 24 or data_off > len(content):
        raise ValueError(f"bad AU data offset {data_off}")
    if channels == 0 or rate == 0:
        raise ValueError("zero channels or sample rate")
    enc = _AU_ENCODINGS.get(encoding)
    if enc is None:
        raise ValueError(f"unsupported AU encoding {encoding}")
    kind, bits = enc
    end = len(content)
    if data_size != 0xFFFFFFFF:  # (unknown-size marker)
        if data_off + data_size > len(content):
            raise ValueError("truncated AU data")
        end = data_off + data_size
    data = content[data_off:end]
    if kind == "pcm":
        mean, total = wav_lite.int_pcm_stats(data, bits, ">")
        codec = "pcm"
    elif kind == "float":
        mean, total = wav_lite.float_stats(data, bits, ">")
        codec = "float"
    else:
        mean, total = wav_lite.g711_stats(data, kind)
        codec = kind
    return {
        "sample_rate": rate,
        "channels": channels,
        "n_samples": total // channels,
        "mean_abs_amplitude": mean,
        "codec": codec,
    }
