"""GIF decode (multimodal/gif_lite, r12): LZW with growing code
widths, the KwKwK case, clear codes, interlace reordering, local
palettes, animation frame counts, and fail-closed malformed input.
The fixture side implements the GIF89a spec's LZW ENCODER and file
layout independently of the module under test; expectations are
analytic (solid color → std 0; two-tone checkerboard → exact std)."""

from __future__ import annotations

import struct

import pytest

from pythondataingestionprocess_spark.multimodal import gif_lite


class _LzwEncoder:
    """Spec Appendix-F LZW encoder, LSB-first packing."""

    def __init__(self, min_code_size: int):
        self.min = min_code_size
        self.clear = 1 << min_code_size
        self.end = self.clear + 1
        self.out = bytearray()
        self.acc = 0
        self.acc_n = 0

    def _emit(self, code: int, width: int) -> None:
        self.acc |= code << self.acc_n
        self.acc_n += width
        while self.acc_n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.acc_n -= 8

    def encode(self, pixels: bytes) -> bytes:
        width = self.min + 1
        table = {bytes([c]): c for c in range(self.clear)}
        next_code = self.end + 1
        self._emit(self.clear, width)
        w = b""
        for px in pixels:
            wk = w + bytes([px])
            if wk in table:
                w = wk
                continue
            self._emit(table[w], width)
            if next_code < 4096:  # spec frozen-dictionary cap
                table[wk] = next_code
                next_code += 1
                # late-change growth, matching real encoders (giflib):
                # the emitted-code width bumps only after entry
                # 2^width exists (r12 review: the earlier early-change
                # rule here mirrored the decoder's matching bug and
                # masked it)
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            w = bytes([px])
        self.next_code = next_code
        if w:
            self._emit(table[w], width)
        self._emit(self.end, width)
        if self.acc_n:
            self.out.append(self.acc & 0xFF)
        return bytes(self.out)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


# a 4-color global palette: black, white, mid-gray, red
PALETTE = bytes([0, 0, 0, 255, 255, 255, 128, 128, 128, 255, 0, 0])
LUMA = [0, 255, 128, (255 * 299) // 1000]  # ITU-R 601 of each entry


def _gif(w: int, h: int, frames: list[tuple[bytes, int]],
         version: bytes = b"GIF89a", extensions: bytes = b"",
         min_code: int = 2) -> bytes:
    """frames = [(pixel indexes, image-descriptor flags), ...]."""
    out = bytearray(version)
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | 0x01, 0, 0])  # global table, 4 entries (2<<1)
    out += PALETTE
    out += extensions
    for pixels, iflags in frames:
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + bytes([iflags])
        enc = _LzwEncoder(min_code)
        out += bytes([min_code]) + _sub_blocks(enc.encode(pixels))
    out += b"\x3b"
    return bytes(out)


def test_solid_color_frame():
    jpg = _gif(4, 4, [(bytes([2] * 16), 0)])  # all mid-gray
    got = gif_lite.decode(jpg)
    assert (got["width"], got["height"], got["n_frames"]) == (4, 4, 1)
    assert got["mean_intensity"] == pytest.approx(128 / 255)
    assert got["std_intensity"] == pytest.approx(0.0)


def test_checkerboard_exact_std():
    px = bytes((x + y) % 2 for y in range(4) for x in range(4))
    got = gif_lite.decode(_gif(4, 4, [(px, 0)]))
    # half 0, half 255: mean 127.5, std 127.5
    assert got["mean_intensity"] == pytest.approx(127.5 / 255)
    assert got["std_intensity"] == pytest.approx(127.5 / 255)


def test_code_width_growth_and_kwkwk():
    """A long repetitive run drives the dictionary past the 9-entry
    first-width boundary AND hits the KwKwK (code == next_code) case;
    any width-growth or KwKwK bug corrupts the tail of the run."""
    px = bytes(([0, 1] * 40) + [1] * 60 + [2] * 28)  # 168 px = 12x14
    got = gif_lite.decode(_gif(12, 14, [(px, 0)]))
    expect_mean = (40 * 0 + 100 * 255 + 28 * 128) / 168
    assert got["mean_intensity"] == pytest.approx(expect_mean / 255)


def test_interlaced_frame_same_stats_and_positionally_correct():
    """Interlace permutes rows, so whole-frame stats are invariant —
    pin the PERMUTATION itself via _deinterlace on a row gradient."""
    rows = [bytes([r % 4] * 4) for r in range(8)]
    display = b"".join(rows)
    # storage order = 4-pass: rows 0, 4, 2, 6, 1, 3, 5, 7
    stored = b"".join(rows[r] for r in (0, 4, 2, 6, 1, 3, 5, 7))
    assert gif_lite._deinterlace(bytearray(stored), 4, 8) == display
    got = gif_lite.decode(_gif(4, 8, [(display, 0)]))
    inter = gif_lite.decode(_gif(4, 8, [(stored, 0x40)]))
    assert inter["mean_intensity"] == pytest.approx(got["mean_intensity"])


def test_animated_counts_frames_stats_from_first():
    f1 = bytes([1] * 16)  # white
    f2 = bytes([0] * 16)  # black
    gce = b"\x21\xf9" + _sub_blocks(b"\x00\x00\x00\x00")
    got = gif_lite.decode(_gif(4, 4, [(f1, 0), (f2, 0)], extensions=gce))
    assert got["n_frames"] == 2
    assert got["mean_intensity"] == pytest.approx(1.0)


def test_gif87a_and_extension_skipping():
    comment = b"\x21\xfe" + _sub_blocks(b"hello")
    got = gif_lite.decode(
        _gif(4, 4, [(bytes(16), 0)], version=b"GIF87a", extensions=comment)
    )
    assert got["mean_intensity"] == pytest.approx(0.0)


def test_malformed_inputs_fail_closed():
    good = _gif(4, 4, [(bytes([2] * 16), 0)])
    with pytest.raises(ValueError, match="signature"):
        gif_lite.decode(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError, match="trailer|sub-block|LZW"):
        gif_lite.decode(good[:-6])  # truncated mid-data
    # pixel index beyond the palette: a wider code size makes index 5
    # a legitimate LZW root, but the palette has only 4 entries
    bad_px = bytes([5] * 16)
    with pytest.raises(ValueError, match="beyond palette"):
        gif_lite.decode(_gif(4, 4, [(bad_px, 0)], min_code=3))
    # LZW pixel-count mismatch: frame says 4x4 but stream has 15 px
    with pytest.raises(ValueError, match="LZW emitted"):
        gif_lite.decode(_gif(4, 4, [(bytes(15), 0)]))


def test_media_routes_gif():
    from pythondataingestionprocess_spark.multimodal import media

    stats = media.real_decode(_gif(4, 4, [(bytes([2] * 16), 0)]), "image")
    assert (stats["width"], stats["height"], stats["n_frames"]) == (4, 4, 1)
    assert stats["mean_intensity"] == pytest.approx(128 / 255)


def test_real_world_canonical_one_pixel_gif():
    """Cross-check against ciphertext this test suite did NOT produce:
    the ubiquitous 43-byte 1x1 transparent-pixel GIF89a served across
    the web for decades (public canonical bytes) — a real encoder's
    output, guarding against encoder/decoder self-consistency bugs."""
    onepx = bytes.fromhex(
        "474946383961010001008000000000"
        "00ffffff21f90401000000002c00000000010001000002024401003b"
    )
    got = gif_lite.decode(onepx)
    assert (got["width"], got["height"], got["n_frames"]) == (1, 1, 1)
    assert got["mean_intensity"] == 0.0  # palette index 0 = black


def test_lzw_roundtrip_fuzz():
    """120 seeded random frames across palette sizes, dimensions, and
    pixel distributions (incl. long runs that force width growth and
    dictionary churn past 9->10->11 bits): encode with the from-spec
    fixture encoder, decode with the module, compare indexes exactly
    via the stats (mean over known palette) and directly via
    _lzw_decode."""
    import random

    for seed in range(120):
        rng = random.Random(seed)
        ncolors_bits = rng.choice([1, 2, 3])  # 2/4/8 root colors
        ncolors = 1 << ncolors_bits
        w = rng.randint(1, 40)
        h = rng.randint(1, 40)
        if rng.random() < 0.5:
            px = bytes(rng.randrange(ncolors) for _ in range(w * h))
        else:  # run-heavy: stresses dictionary growth + KwKwK
            out = []
            while len(out) < w * h:
                out += [rng.randrange(ncolors)] * rng.randint(1, 30)
            px = bytes(out[: w * h])
        enc = _LzwEncoder(max(2, ncolors_bits))
        got = gif_lite._lzw_decode(max(2, ncolors_bits), enc.encode(px),
                                   len(px))
        assert bytes(got) == px, (seed, w, h, ncolors)


def test_lzw_frozen_dictionary_past_4096_stays_in_sync():
    """r12 ADVICE: the decoder freezes its dictionary at the spec's
    4096-entry cap (codes max out at 12 bits, so later entries are
    unreachable — appending them only grows memory without bound).
    Drive a stream diverse enough to FILL the dictionary and keep
    going: a frozen-dictionary encoder and the decoder must agree on
    every code after the cap (an off-by-one freeze point on either
    side diverges immediately)."""
    import random

    rng = random.Random(4096)
    px = bytes(rng.randrange(8) for _ in range(40_000))
    enc = _LzwEncoder(3)
    stream = enc.encode(px)
    assert enc.next_code == 4096, enc.next_code  # cap actually reached
    got = gif_lite._lzw_decode(3, stream, len(px))
    assert bytes(got) == px


def test_real_encoder_multicode_gif_embedded():
    """r12 review finding 1: the original width-growth rule was the
    early-change (TIFF) variant, mirrored by this file's fixture
    encoder — so the suite was green while every real-encoder GIF
    failed. Pin a REAL encoder's multi-code stream (a stock Python
    distribution icon, 78 bytes) so the late-change rule can never
    silently regress behind a self-consistent fixture again."""
    real = bytes.fromhex(
        "4749463839610b000b00f10300ffffff7f7f7f000000c0c0c021f904050000"
        "03002c000000000b000b0000021f9c8f16cbac0023080f8a48478817e62d84"
        "e154011da97158297d4d93c44301003b"
    )
    got = gif_lite.decode(real)
    assert (got["width"], got["height"], got["n_frames"]) == (11, 11, 1)
    assert got["mean_intensity"] == pytest.approx(0.711, abs=5e-3)


def test_partial_first_frame_composites_over_background():
    """r12 review finding 6: a first frame smaller than the logical
    screen must report CANVAS stats (background color fills the rest),
    matching what a full rasterizer reports for the same file."""
    # 8x8 screen, 4x4 frame at (2,2), frame all white, background
    # index = 2 (mid-gray 128)
    frame_px = bytes([1] * 16)
    gif = bytearray(_gif(8, 8, [(frame_px, 0)]))
    gif[11] = 2  # background color index in the LSD
    # rewrite the image descriptor to 4x4 at (2,2)
    desc = gif.index(b"\x2c")
    gif[desc + 1:desc + 9] = struct.pack("<HHHH", 2, 2, 4, 4)
    # re-encode the LZW data for 16 pixels (descriptor change only
    # affects geometry; the old stream must be replaced). desc+10 =
    # through the iflags byte.
    enc = _LzwEncoder(2)
    new_data = bytes([2]) + _sub_blocks(enc.encode(frame_px))
    gif = bytes(gif[:desc + 10]) + new_data + b"\x3b"
    got = gif_lite.decode(gif)
    expect_mean = (16 * 255 + 48 * 128) / 64 / 255
    assert got["mean_intensity"] == pytest.approx(expect_mean)
    # frame exceeding the screen fails closed
    over = bytearray(gif)
    over[desc + 1:desc + 9] = struct.pack("<HHHH", 6, 6, 4, 4)
    with pytest.raises(ValueError, match="exceeds the logical screen"):
        gif_lite.decode(bytes(over))


def test_decompression_bomb_guard():
    """r12 review finding 3: a few-KB GIF declaring a huge frame must
    quarantine BEFORE the LZW expansion allocates gigabytes."""
    gif = bytearray(_gif(4, 4, [(bytes(16), 0)]))
    # claim a 65535x65535 screen AND frame
    gif[6:10] = struct.pack("<HH", 65535, 65535)
    desc = gif.index(b"\x2c")
    gif[desc + 1:desc + 9] = struct.pack("<HHHH", 0, 0, 65535, 65535)
    with pytest.raises(ValueError, match="decompression bomb"):
        gif_lite.decode(bytes(gif))
