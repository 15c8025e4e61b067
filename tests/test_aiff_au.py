"""aiff_au_lite (r13): AIFF/AIFF-C and Sun AU decode, cross-checked
against the stdlib ``aifc`` and ``sunau`` readers (deprecated —
imported HERE only, never by engine code) as independent writers:
fixtures are produced by the stdlib WRITERS, so container layout
(chunk order, COMM extended-float rate, AU header) comes from an
implementation the module never sees."""

from __future__ import annotations

import io
import struct
import warnings

import numpy as np
import pytest

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    aifc = pytest.importorskip("aifc")
    sunau = pytest.importorskip("sunau")
    audioop = pytest.importorskip("audioop")

from pythondataingestionprocess_spark.multimodal import aiff_au_lite, media


class _KeepOpen(io.BytesIO):
    """aifc/sunau close() the underlying file after patching sizes —
    keep the buffer readable."""

    def close(self):  # noqa: D102
        pass


def _aiff_bytes(sig: np.ndarray, *, channels=1, rate=8000, comp=None):
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = aifc.open(buf, "wb")
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        if comp is not None:
            w.setcomptype(*comp)
        w.writeframes(sig.tobytes())
        w.close()
    return buf.getvalue()


def test_aiff_pcm16_vs_stdlib_writer():
    sig = np.array(
        [int(15000 * np.sin(i / 8)) for i in range(400)], dtype=">i2"
    )
    blob = _aiff_bytes(sig, rate=22050)
    meta = aiff_au_lite.decode_aiff(blob)
    assert meta["codec"] == "pcm" and meta["sample_rate"] == 22050
    assert meta["n_samples"] == 400 and meta["channels"] == 1
    assert meta["mean_abs_amplitude"] == pytest.approx(
        np.abs(sig.astype(np.int32)).mean() / 32767.0, abs=1e-12
    )


def test_aifc_ulaw_and_sowt_vs_stdlib_writer():
    sig = np.array(
        [int(11000 * np.sin(i / 5)) for i in range(300)], dtype=">i2"
    )
    blob = _aiff_bytes(sig, comp=(b"ulaw", b"ITU G.711 u-law"))
    meta = aiff_au_lite.decode_aiff(blob)
    assert meta["codec"] == "ulaw"
    # oracle: stdlib aifc reads its own file back (decoding via
    # audioop) — byte-identical sample stream
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        r = aifc.open(io.BytesIO(blob), "rb")
        frames = r.readframes(r.getnframes())
    exact = np.frombuffer(frames, dtype="<i2").astype(np.int32)
    # aifc returns native little-endian via audioop.ulaw2lin
    assert meta["mean_abs_amplitude"] == pytest.approx(
        np.abs(exact).mean() / 32767.0, abs=1e-12
    )
    # sowt = little-endian PCM
    blob = _aiff_bytes(sig, comp=(b"sowt", b""))
    meta = aiff_au_lite.decode_aiff(blob)
    assert meta["codec"] == "pcm"
    # stdlib writes the PAYLOAD byteswapped for sowt
    exact = sig.astype(np.int32)
    assert meta["mean_abs_amplitude"] == pytest.approx(
        np.abs(exact).mean() / 32767.0, abs=1e-12
    )


def test_aiff_stereo_and_extended_rate():
    sig = np.array([1000, -2000] * 120, dtype=">i2")  # interleaved L/R
    blob = _aiff_bytes(sig, channels=2, rate=44100)
    meta = aiff_au_lite.decode_aiff(blob)
    assert meta["channels"] == 2 and meta["sample_rate"] == 44100
    assert meta["n_samples"] == 120
    assert meta["mean_abs_amplitude"] == pytest.approx(
        1500 / 32767.0, abs=1e-9
    )


def test_ext80_parse_known_values():
    # 44100 = 0x400E AC44 0000 0000 0000 (classic constant)
    assert aiff_au_lite._ext80_to_float(
        bytes.fromhex("400eac4400000000" + "0000")
    ) == 44100.0
    assert aiff_au_lite._ext80_to_float(
        struct.pack(">HQ", 16383, 1 << 63)
    ) == 1.0
    with pytest.raises(ValueError, match="non-finite"):
        aiff_au_lite._ext80_to_float(struct.pack(">HQ", 0x7FFF, 0))


def test_aiff_rejects():
    with pytest.raises(ValueError, match="FORM"):
        aiff_au_lite.decode_aiff(b"RIFFxxxxWAVE")
    with pytest.raises(ValueError, match="form"):
        aiff_au_lite.decode_aiff(b"FORM\x00\x00\x00\x04JUNK")
    sig = np.zeros(10, dtype=">i2")
    blob = _aiff_bytes(sig)
    with pytest.raises(ValueError, match="truncated"):
        aiff_au_lite.decode_aiff(blob[:-4])
    # unknown compressor quarantines loudly
    blob = bytearray(_aiff_bytes(sig, comp=(b"ulaw", b"x")))
    blob[blob.index(b"ulaw"):blob.index(b"ulaw") + 4] = b"ima4"
    with pytest.raises(ValueError, match="compressor"):
        aiff_au_lite.decode_aiff(bytes(blob))


def test_au_pcm_and_ulaw_vs_stdlib_writer():
    sig = np.array(
        [int(9000 * np.sin(i / 7)) for i in range(256)], dtype=">i2"
    )
    buf = _KeepOpen()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = sunau.open(buf, "wb")
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.setcomptype("NONE", "")  # sunau DEFAULTS to ULAW transcoding
        w.writeframes(sig.tobytes())
        w.close()
    meta = aiff_au_lite.decode_au(buf.getvalue())
    assert meta["codec"] == "pcm" and meta["sample_rate"] == 16000
    assert meta["n_samples"] == 256
    assert meta["mean_abs_amplitude"] == pytest.approx(
        np.abs(sig.astype(np.int32)).mean() / 32767.0, abs=1e-12
    )
    # hand-built mu-law AU (sunau writes ulaw via 'ULAW' comptype too,
    # but building directly also pins the header layout)
    ul = audioop.lin2ulaw(sig.astype("<i2").tobytes(), 2)
    hdr = b".snd" + struct.pack(">IIIII", 24, len(ul), 1, 8000, 1)
    meta = aiff_au_lite.decode_au(hdr + ul)
    exact = np.frombuffer(audioop.ulaw2lin(ul, 2), dtype="<i2")
    assert meta["codec"] == "ulaw"
    assert meta["mean_abs_amplitude"] == pytest.approx(
        np.abs(exact.astype(np.int32)).mean() / 32767.0, abs=1e-12
    )


def test_aiff_stats_cover_only_declared_frames():
    """r13 review: SSND padding/block-align tails beyond the COMM
    frame count must not skew the amplitude stat."""
    sig = np.array([100], dtype=">i2")
    blob = bytearray(_aiff_bytes(sig))
    # append 3 loud undeclared samples inside SSND and patch sizes
    ssnd_at = bytes(blob).index(b"SSND")
    (ssnd_size,) = struct.unpack_from(">I", blob, ssnd_at + 4)
    extra = np.array([30000, 30000, 30000], dtype=">i2").tobytes()
    insert_at = ssnd_at + 8 + ssnd_size
    blob[insert_at:insert_at] = extra
    struct.pack_into(">I", blob, ssnd_at + 4, ssnd_size + len(extra))
    struct.pack_into(">I", blob, 4, len(blob) - 8)  # FORM size
    meta = aiff_au_lite.decode_aiff(bytes(blob))
    assert meta["n_samples"] == 1
    assert meta["mean_abs_amplitude"] == pytest.approx(
        100 / 32767.0, abs=1e-12
    )


def test_audio_int32_overflow_quarantines_per_row():
    """r13 review: attacker-controlled rate/channels (AU uint32
    header, AIFF 80-bit float rate) must quarantine in real_decode,
    not die batch-wide in the Int32 cast."""
    data = np.array([1000], dtype=">i2").tobytes()
    big_rate = b".snd" + struct.pack(
        ">IIIII", 24, len(data), 3, 3_000_000_000, 1
    ) + data
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(big_rate, "audio/basic")
    big_ch = b".snd" + struct.pack(
        ">IIIII", 24, len(data), 3, 8000, 2_500_000_000
    ) + data
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(big_ch, "audio/basic")


def test_au_unknown_size_marker_and_rejects():
    data = np.array([1000, -1000], dtype=">i2").tobytes()
    hdr = b".snd" + struct.pack(">IIIII", 24, 0xFFFFFFFF, 3, 8000, 1)
    meta = aiff_au_lite.decode_au(hdr + data)
    assert meta["n_samples"] == 2
    with pytest.raises(ValueError, match=r"\.snd"):
        aiff_au_lite.decode_au(b"FORMxxxxAIFFxxxxxxxxxxxx")
    with pytest.raises(ValueError, match="encoding"):
        bad = b".snd" + struct.pack(">IIIII", 24, 4, 23, 8000, 1) + data
        aiff_au_lite.decode_au(bad)  # 23 = G.721 ADPCM, unsupported
    with pytest.raises(ValueError, match="truncated"):
        bad = b".snd" + struct.pack(">IIIII", 24, 99, 3, 8000, 1) + data
        aiff_au_lite.decode_au(bad)


def test_media_routes_aiff_and_au():
    sig = np.array([8000] * 50, dtype=">i2")
    blob = _aiff_bytes(sig, rate=8000)
    stats = media.real_decode(blob, "audio/aiff")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (
        8000, 1, 50
    )
    assert stats["mean_intensity"] == pytest.approx(8000 / 32767.0)
    au = b".snd" + struct.pack(">IIIII", 24, 100, 3, 8000, 1) + sig.tobytes()
    stats = media.real_decode(au, "audio/basic")
    assert stats["n_frames"] == 50
    assert stats["mean_intensity"] == pytest.approx(8000 / 32767.0)
