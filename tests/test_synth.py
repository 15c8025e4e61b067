"""multimodal/synth.py (r13): deterministic real-format blob
synthesis whose decoded stats are closed forms of the id — the basis
of the fully oracle-checked `multimodal_real_decode_roundtrip` face.
The tests replicate the closed forms INDEPENDENTLY (including the
G.711 expansion via audioop) and check the real decoders match them
for every kind over a contiguous id range."""

from __future__ import annotations

import struct
import warnings

import pytest

with warnings.catch_warnings():
    warnings.simplefilter("ignore", DeprecationWarning)
    audioop = pytest.importorskip("audioop")

from pythondataingestionprocess_spark.multimodal import media, synth


def _expected(doc_id: int) -> dict:
    kind = doc_id % 4
    if kind == 0:
        w, h, c = 3 + doc_id % 10, 2 + doc_id % 5, doc_id % 256
        return {"mt": "image/bmp", "w": w, "h": h, "frames": 1,
                "mean": c / 255.0}
    if kind == 1:
        w, h, v = 2 + doc_id % 9, 1 + doc_id % 6, (doc_id * 7) % 256
        return {"mt": "image/tiff", "w": w, "h": h, "frames": 1,
                "mean": v / 255.0}
    if kind == 2:
        n, b = 20 + doc_id % 80, 16 + doc_id % 64
        (amp,) = struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))
        return {"mt": "audio/wav", "w": 8000, "h": 1, "frames": n,
                "mean": abs(amp) / 32767.0}
    w, h, g = 2 + doc_id % 6, 1 + doc_id % 4, 30 + doc_id % 200
    return {"mt": "video/quicktime", "w": w, "h": h, "frames": 3,
            "mean": g / 255.0}


def test_every_kind_decodes_to_its_closed_form():
    for doc_id in range(0, 160):
        mt, blob = synth.blob_for(doc_id)
        exp = _expected(doc_id)
        assert mt == exp["mt"], doc_id
        stats = media.real_decode(blob, mt)
        assert (stats["width"], stats["height"], stats["n_frames"]) == (
            exp["w"], exp["h"], exp["frames"]
        ), doc_id
        # the face compares at micro precision; assert tighter here
        assert stats["mean_intensity"] == pytest.approx(
            exp["mean"], abs=1e-9
        ), doc_id


def test_blobs_are_deterministic():
    for doc_id in (0, 1, 2, 3, 77, 12345):
        assert synth.blob_for(doc_id) == synth.blob_for(doc_id)


def test_micro_rounding_margin():
    """The face's 1e6 rounding is exact because every branch's
    mean·10^6 sits on a rational grid with odd denominator: verify the
    worst-case distance from a .5 boundary across ALL parameter values
    is orders of magnitude above the decoders' float noise."""
    worst = 1.0
    for c in range(256):  # /255 branches
        frac = (c * 1000000 / 255) % 1.0
        worst = min(worst, abs(frac - 0.5))
    for b in range(16, 80):  # mu-law branch
        (amp,) = struct.unpack("<h", audioop.ulaw2lin(bytes([b]), 2))
        frac = (abs(amp) * 1000000 / 32767) % 1.0
        worst = min(worst, abs(frac - 0.5))
    assert worst > 1e-4  # float noise is < 1e-6
