"""Measure real-decoder throughput per format (r13): blobs/sec and
MB/sec for each decoder the multimodal layer ships, over synthetic
but REAL-format payloads sized like web-crawl media.

Two measurements per format:
- small: the synth.py face-sized blobs (~0.1-1 KB) — per-blob
  overhead dominated;
- large: a single payload scaled to ~1 MB of pixel/sample data —
  steady-state bytes/sec of the inner loops.

Usage: python scripts/media_decode_probe.py [n_small]
Prints one JSON line per format; paste the table into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pythondataingestionprocess_spark.multimodal import (  # noqa: E402
    media,
    synth,
)

N_SMALL = int(sys.argv[1]) if len(sys.argv) > 1 else 2000


def _large_blobs() -> dict[str, bytes]:
    rng = np.random.default_rng(7)
    out = {}
    # BMP: 640x520x3 ≈ 1.0 MB raw 24-bit
    img = rng.integers(0, 256, (520, 640, 3)).astype(np.uint8)
    stride = (640 * 3 + 3) // 4 * 4
    rows = b"".join(
        img[r].tobytes() + b"\0" * (stride - 640 * 3)
        for r in range(519, -1, -1)
    )
    import struct

    dib = struct.pack(
        "<IiihhIIiiII", 40, 640, 520, 1, 24, 0, len(rows), 2835, 2835, 0, 0
    )
    out["bmp_24bit"] = (
        b"BM" + struct.pack("<IHHI", 54 + len(rows), 0, 0, 54) + dib + rows
    )
    # TIFF PackBits: 1024x1024 gray with run-heavy rows ≈ 1 MB decoded
    row = (b"\x00" * 512 + bytes(rng.integers(0, 256, 512).tolist()))
    from tests.test_tiff_decode import make_tiff, packbits_encode

    strips = [packbits_encode(row * 8) for _ in range(128)]
    out["tiff_packbits"] = make_tiff(
        1024, 1024, strips, compression=32773, rows_per_strip=8
    )
    # TIFF LZW: same geometry, compressible content
    from tests.test_tiff_decode import lzw_encode

    strips = [lzw_encode(row * 8) for _ in range(128)]
    out["tiff_lzw"] = make_tiff(
        1024, 1024, strips, compression=5, rows_per_strip=8
    )
    # WAV IMA ADPCM: ~4 min mono 8 kHz ≈ 1 MB decoded (0.25 MB file)
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        import audioop

    sig = (8000 * np.sin(np.arange(500_000) / 9)).astype("<i2")
    from tests.test_wav_codecs import _swap_nibbles, make_wav

    import struct as _s

    frames_per_block = 2041  # block_align 1024: 4 hdr + 1020 code bytes
    blocks = []
    for base in range(0, len(sig), frames_per_block):
        part = sig[base:base + frames_per_block]
        frag, _ = audioop.lin2adpcm(part[1:].tobytes(), 2, (int(part[0]), 0))
        sw = _swap_nibbles(frag)
        sw += b"\0" * (1020 - len(sw))
        blocks.append(_s.pack("<hBB", int(part[0]), 0, 0) + sw)
    out["wav_ima_adpcm"] = make_wav(
        0x11, 1, 8000, 4, 1024, b"".join(blocks), fact=len(sig)
    )
    # WAV G.711: 1 MB of mu-law bytes
    ul = audioop.lin2ulaw(sig.tobytes(), 2)
    out["wav_ulaw"] = make_wav(7, 1, 8000, 8, 1, ul + ul)
    # WebP VP8L: 512x512 (0.26MP) few-color image with LZ77+cache —
    # measures the per-symbol Python entropy loop the 10MP guard
    # bounds
    from tests.test_webp_decode import _rand_argb, encode_vp8l

    img = _rand_argb(rng, 512, 512, distinct=7)
    out["webp_vp8l"] = encode_vp8l(img, lz77=True, cache_bits=6)
    # WebP VP8 lossy (r14): QVGA keyframe through the full intra
    # decoder (bool decoder + tokens + iDCT + prediction + loop
    # filter) — the per-MB Python loop the 2MP guard bounds.
    # Encoded by the system libwebp when present (realistic token
    # density), else by the test-side encoder.
    from tests import libwebp_ref as _lref

    _lib = _lref.load()
    if _lib is not None:
        yy, xx = np.mgrid[0:240, 0:320]
        photo = np.stack([
            128 + 60 * np.sin(yy / 9) * np.cos(xx / 13),
            120 + 50 * np.cos(yy / 17 + 1) * np.sin(xx / 7),
            100 + 80 * np.sin((xx + yy) / 21),
        ], axis=2).clip(0, 255).astype(np.uint8)
        out["webp_vp8_lossy"] = _lref.encode_rgb(_lib, photo, 60)
    else:
        from tests.vp8_enc import encode_keyframe, wrap_webp
        from pythondataingestionprocess_spark.multimodal.vp8_lite import (
            B_PRED,
        )

        mbs = []
        for i in range(20 * 15):
            lv = lambda: [int(rng.integers(-20, 21)) if rng.integers(0, 3) == 0
                          else 0 for _ in range(16)]
            mbs.append({"ymode": B_PRED, "uv": int(rng.integers(0, 4)),
                        "sub": [int(rng.integers(0, 10)) for _ in range(16)],
                        "y": [lv() for _ in range(16)],
                        "u": [lv() for _ in range(4)],
                        "v": [lv() for _ in range(4)]})
        out["webp_vp8_lossy"] = wrap_webp(
            encode_keyframe(320, 240, mbs, filter_level=30)
        )
    return out


def main() -> None:
    # small-blob sweep through the face's synthesis (round-robin
    # bmp/tiff/wav/mov)
    blobs = [synth.blob_for(i) for i in range(N_SMALL)]
    t0 = time.perf_counter()
    for mt, blob in blobs:
        media.real_decode(blob, mt)
    small_wall = time.perf_counter() - t0
    total_bytes = sum(len(b) for _, b in blobs)
    print(json.dumps({
        "probe": "small_face_blobs", "n": N_SMALL,
        "blobs_per_sec": round(N_SMALL / small_wall, 1),
        "mb_per_sec": round(total_bytes / small_wall / 1e6, 2),
    }))

    for name, blob in _large_blobs().items():
        mt = (
            "image" if name.startswith(("bmp", "tiff", "webp")) else "audio"
        )
        # warm + 3 reps, report best (steady-state)
        media.real_decode(blob, mt)
        best = min(
            (lambda t0: (media.real_decode(blob, mt), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        print(json.dumps({
            "probe": name, "file_mb": round(len(blob) / 1e6, 2),
            "wall_sec": round(best, 3),
            "file_mb_per_sec": round(len(blob) / 1e6 / best, 1),
        }))

    # MS ADPCM lane-vs-scalar (r13 VERDICT item 8): blocks are
    # independent, so the r14 decoder runs all blocks as int64 numpy
    # lanes (scalar within the code loop) with a 2**46 idelta guard
    # falling back to the Python-int path. Codes drawn from the
    # small-magnitude classes (adapt 230/409) so idelta stays in its
    # realistic floor regime and the LANE path is what's measured.
    import struct as _s2

    from pythondataingestionprocess_spark.multimodal import wav_lite

    rng2 = np.random.default_rng(11)
    code_vals = np.array([0, 1, 2, 3, 12, 13, 14, 15], dtype=np.uint8)
    n_blocks, block_align = 246, 1024
    blocks_ms = []
    for _ in range(n_blocks):
        nibs = rng2.choice(code_vals, (block_align - 7) * 2)
        packed = (nibs[0::2] << 4 | nibs[1::2]).astype(np.uint8).tobytes()
        blocks_ms.append(
            bytes([int(rng2.integers(0, 7))])
            + _s2.pack("<hhh", int(rng2.integers(16, 2000)),
                       int(rng2.integers(-20000, 20000)),
                       int(rng2.integers(-20000, 20000)))
            + packed
        )
    ms_data = b"".join(blocks_ms)
    decoded_mb = n_blocks * ((block_align - 7) * 2 + 2) * 2 / 1e6
    for fn, label in ((wav_lite._decode_ms, "lane"),
                      (wav_lite._decode_ms_scalar, "scalar")):
        fn(ms_data, 1, block_align, None)
        best = min(
            (lambda t0: (fn(ms_data, 1, block_align, None),
                         time.perf_counter() - t0)[1])(time.perf_counter())
            for _ in range(3)
        )
        print(json.dumps({
            "probe": f"wav_ms_adpcm_{label}",
            "file_mb": round(len(ms_data) / 1e6, 2),
            "decoded_mb": round(decoded_mb, 2),
            "wall_sec": round(best, 3),
            "file_mb_per_sec": round(len(ms_data) / 1e6 / best, 1),
        }))


if __name__ == "__main__":
    main()
