"""FLAC sample decode (multimodal/flac_lite, r12): bit-exact
reconstruction through constant/verbatim/fixed predictors, Rice
residuals (incl. escape partitions and partition orders), stereo
decorrelation modes, wasted bits, CRC verification, and fail-closed
malformed input. The fixture implements the xiph spec's ENCODER side
independently; the CRC cores are pinned against their public check
values first, so both sides' CRCs are anchored to the standard, not
to each other."""

from __future__ import annotations

import pytest

from pythondataingestionprocess_spark.multimodal import flac_lite


class _W:
    """MSB-first bit writer."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, v: int, bits: int) -> None:
        for k in range(bits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def put_signed(self, v: int, bits: int) -> None:
        self.put(v & ((1 << bits) - 1), bits)

    def align(self) -> None:
        if self.n:
            self.put(0, 8 - self.n)


def _streaminfo(rate: int, channels: int, bps: int, total: int) -> bytes:
    w = _W()
    w.put(16, 16)      # min block size
    w.put(65535, 16)   # max block size
    w.put(0, 24)
    w.put(0, 24)
    w.put(rate, 20)
    w.put(channels - 1, 3)
    w.put(bps - 1, 5)
    w.put(total, 36)
    body = bytes(w.out) + bytes(16)  # zero MD5
    return b"fLaC" + bytes([0x80]) + len(body).to_bytes(3, "big") + body


def _rice(w: _W, residuals: list[int], param: int, porder: int = 0,
          order: int = 0, escape_raw: int | None = None) -> None:
    """Residual coding method 0 (4-bit Rice params)."""
    w.put(0, 2)        # method: rice
    w.put(porder, 4)
    nparts = 1 << porder
    n = len(residuals) + order
    pos = 0
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        chunk = residuals[pos:pos + cnt]
        pos += cnt
        if escape_raw is not None:
            w.put(15, 4)  # escape
            w.put(escape_raw, 5)
            for r in chunk:
                w.put_signed(r, escape_raw)
            continue
        w.put(param, 4)
        for r in chunk:
            u = (r << 1) ^ (r >> 63) if r >= 0 else ((-r) << 1) - 1
            q = u >> param
            w.put(1, q + 1)  # q zeros then a 1... see below
    # NOTE: unary in FLAC is q ZEROS terminated by a 1; _W.put(1, q+1)
    # writes q zeros then 1 because the value 1 in q+1 bits IS that.
            if param:
                w.put(u & ((1 << param) - 1), param)


def _subframe_constant(w: _W, value: int, bps: int) -> None:
    w.put(0, 1)
    w.put(0, 6)
    w.put(0, 1)  # no wasted bits
    w.put_signed(value, bps)


def _subframe_verbatim(w: _W, samples: list[int], bps: int) -> None:
    w.put(0, 1)
    w.put(1, 6)
    w.put(0, 1)
    for s in samples:
        w.put_signed(s, bps)


_FIXED = {1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _subframe_fixed(w: _W, samples: list[int], order: int, bps: int,
                    param: int = 4, porder: int = 0,
                    escape_raw: int | None = None,
                    wasted: int = 0) -> None:
    w.put(0, 1)
    w.put(8 + order, 6)
    if wasted:
        w.put(1, 1)
        w.put(1, wasted)  # unary: (wasted-1) zeros then 1
        samples = [s >> wasted for s in samples]
        bps -= wasted
    else:
        w.put(0, 1)
    for s in samples[:order]:
        w.put_signed(s, bps)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(_FIXED[order]))
        res.append(samples[i] - pred)
    _rice(w, res, param, porder, order, escape_raw)


def _frame(streaminfo_rate: int, channels_code: int, block: int,
           build_subframes, frame_no: int = 0) -> bytes:
    """Frame with bs_code 6/7 (explicit block size), sr/ss from
    STREAMINFO."""
    w = _W()
    w.put(0b11111111111110, 14)
    w.put(0, 1)
    w.put(0, 1)  # fixed blocksize strategy
    w.put(6 if block <= 256 else 7, 4)
    w.put(0, 4)  # sample rate: from STREAMINFO
    w.put(channels_code, 4)
    w.put(0, 3)  # sample size: from STREAMINFO
    w.put(0, 1)
    assert frame_no < 0x80
    w.put(frame_no, 8)  # UTF-8 single byte
    if block <= 256:
        w.put(block - 1, 8)
    else:
        w.put(block - 1, 16)
    header = bytes(w.out)
    assert w.n == 0
    header += bytes([flac_lite._crc8(header)])
    body = _W()
    build_subframes(body)
    body.align()
    frame = header + bytes(body.out)
    return frame + flac_lite._crc16(frame).to_bytes(2, "big")


def test_crc_cores_match_public_check_values():
    """Anchor BOTH sides' CRCs to the standard check values so the
    roundtrip tests cannot be self-consistently wrong."""
    assert flac_lite._crc8(b"123456789") == 0xF4
    assert flac_lite._crc16(b"123456789") == 0xFEE8


def test_constant_mono():
    data = _streaminfo(8000, 1, 16, 64) + _frame(
        8000, 0, 64, lambda w: _subframe_constant(w, -1000, 16)
    )
    got = flac_lite.decode(data)
    assert got["sample_rate"] == 8000 and got["channels"] == 1
    assert got["n_samples"] == 64
    assert got["mean_abs_amplitude"] == pytest.approx(1000 / 32767)


def test_verbatim_exact():
    samples = [0, 100, -100, 32767, -32768, 5, -5, 0]
    data = _streaminfo(8000, 1, 16, 8) + _frame(
        8000, 0, 8, lambda w: _subframe_verbatim(w, samples, 16)
    )
    got = flac_lite.decode(data)
    expect = sum(abs(s) for s in samples) / 8 / 32767
    assert got["mean_abs_amplitude"] == pytest.approx(expect)


def test_fixed_orders_reconstruct_exactly():
    """Orders 1-4 over a cubic-ish ramp: the encoder derives residuals
    from the spec predictors, the decoder must invert them exactly."""
    samples = [((i * i * i) % 401) - 200 for i in range(32)]
    for order in (1, 2, 3, 4):
        data = _streaminfo(16000, 1, 16, 32) + _frame(
            16000, 0, 32,
            lambda w, o=order: _subframe_fixed(w, samples, o, 16, param=6),
        )
        got = flac_lite.decode(data)
        expect = sum(abs(s) for s in samples) / 32 / 32767
        assert got["mean_abs_amplitude"] == pytest.approx(expect), order


def test_rice_partitions_and_escape():
    samples = list(range(-16, 16))
    data = _streaminfo(8000, 1, 16, 32) + _frame(
        8000, 0, 32,
        lambda w: _subframe_fixed(w, samples, 1, 16, porder=1),
    )
    got = flac_lite.decode(data)
    expect = sum(abs(s) for s in samples) / 32 / 32767
    assert got["mean_abs_amplitude"] == pytest.approx(expect)
    # escape partitions: residuals stored raw at a stated width
    data = _streaminfo(8000, 1, 16, 32) + _frame(
        8000, 0, 32,
        lambda w: _subframe_fixed(w, samples, 1, 16, escape_raw=12),
    )
    got = flac_lite.decode(data)
    assert got["mean_abs_amplitude"] == pytest.approx(expect)


def test_wasted_bits_rescale():
    samples = [s << 3 for s in (-64, 64, -128, 128, 0, 32, -32, 8)]
    data = _streaminfo(8000, 1, 16, 8) + _frame(
        8000, 0, 8,
        lambda w: _subframe_fixed(w, samples, 1, 16, param=6, wasted=3),
    )
    got = flac_lite.decode(data)
    expect = sum(abs(s) for s in samples) / 8 / 32767
    assert got["mean_abs_amplitude"] == pytest.approx(expect)


def test_stereo_decorrelation_modes():
    left = [100, -50, 300, 0, -200, 75, 12, -1]
    right = [90, -60, 250, 10, -180, 70, 10, -3]
    expect = (sum(abs(s) for s in left) + sum(abs(s) for s in right)) / 16 / 32767

    def build_ls(w):  # left/side: side = left - right
        _subframe_verbatim(w, left, 16)
        _subframe_verbatim(w, [l - r for l, r in zip(left, right)], 17)

    def build_rs(w):  # right/side: side = left - right
        _subframe_verbatim(w, [l - r for l, r in zip(left, right)], 17)
        _subframe_verbatim(w, right, 16)

    def build_ms(w):  # mid = (l+r)>>1, side = l-r
        _subframe_verbatim(w, [(l + r) >> 1 for l, r in zip(left, right)], 16)
        _subframe_verbatim(w, [l - r for l, r in zip(left, right)], 17)

    for code, build in ((8, build_ls), (9, build_rs), (10, build_ms)):
        data = _streaminfo(8000, 2, 16, 8) + _frame(8000, code, 8, build)
        got = flac_lite.decode(data)
        assert got["channels"] == 2
        assert got["mean_abs_amplitude"] == pytest.approx(expect), code


def test_multi_frame_accumulates_and_total_checked():
    f1 = _frame(8000, 0, 16, lambda w: _subframe_constant(w, 100, 16),
                frame_no=0)
    f2 = _frame(8000, 0, 16, lambda w: _subframe_constant(w, 300, 16),
                frame_no=1)
    data = _streaminfo(8000, 1, 16, 32) + f1 + f2
    got = flac_lite.decode(data)
    assert got["n_samples"] == 32
    assert got["duration_sec"] == pytest.approx(32 / 8000)
    assert got["mean_abs_amplitude"] == pytest.approx(200 / 32767)
    # STREAMINFO total mismatch fails closed
    bad = _streaminfo(8000, 1, 16, 48) + f1 + f2
    with pytest.raises(ValueError, match="declares"):
        flac_lite.decode(bad)


def test_corruption_fails_closed():
    data = _streaminfo(8000, 1, 16, 64) + _frame(
        8000, 0, 64, lambda w: _subframe_constant(w, -1000, 16)
    )
    # flip a bit in the constant VALUE bytes (the frame's last bytes
    # before the 2-byte CRC-16): decodes structurally, CRC-16 catches
    corrupt = bytearray(data)
    corrupt[-3] ^= 0x40
    with pytest.raises(ValueError, match="CRC-16"):
        flac_lite.decode(bytes(corrupt))
    # flip a header bit: CRC-8 must catch it
    hdr = bytearray(data)
    hdr_off = len(_streaminfo(8000, 1, 16, 64))
    hdr[hdr_off + 2] ^= 0x10
    # a flipped header bit changes a size/rate code: caught by CRC-8
    # when the header still parses, or earlier by structure/truncation
    with pytest.raises(ValueError,
                       match="CRC|reserved|sync|sample rate|truncated"):
        flac_lite.decode(bytes(hdr))
    with pytest.raises(ValueError, match="truncated|sync"):
        flac_lite.decode(data[:-8])
    with pytest.raises(ValueError, match="magic"):
        flac_lite.decode(b"NOPE" + data[4:])


def test_media_routes_flac():
    from pythondataingestionprocess_spark.multimodal import media

    data = _streaminfo(44100, 1, 16, 64) + _frame(
        44100, 0, 64, lambda w: _subframe_constant(w, 16384, 16)
    )
    stats = media.real_decode(data, "audio")
    assert (stats["width"], stats["height"]) == (44100, 1)
    assert stats["n_frames"] == 64
    assert stats["mean_intensity"] == pytest.approx(16384 / 32767)


def _subframe_lpc(w: _W, samples: list[int], coefs: list[int],
                  shift: int, prec: int, bps: int, param: int = 6) -> None:
    order = len(coefs)
    w.put(0, 1)
    w.put(31 + order, 6)
    w.put(0, 1)  # no wasted bits
    for s in samples[:order]:
        w.put_signed(s, bps)
    w.put(prec - 1, 4)
    w.put_signed(shift, 5)
    for c in coefs:
        w.put_signed(c, prec)
    res = []
    for i in range(order, len(samples)):
        pred = sum(c * samples[i - 1 - j] for j, c in enumerate(coefs))
        res.append(samples[i] - (pred >> shift))
    _rice(w, res, param, 0, order)


def test_lpc_subframe_reconstructs_exactly():
    """Order-3 LPC with an arithmetic-shift quantized predictor: the
    decoder must apply coefficients, shift, and residuals bit-exactly
    (the >> is FLOOR division on negatives — a // or int() drift
    would show on the negative samples)."""
    import math

    samples = [int(2000 * math.sin(i / 3)) for i in range(48)]
    coefs = [3, -2, 1]
    data = _streaminfo(8000, 1, 16, 48) + _frame(
        8000, 0, 48,
        lambda w: _subframe_lpc(w, samples, coefs, shift=1, prec=5, bps=16),
    )
    got = flac_lite.decode(data)
    expect = sum(abs(s) for s in samples) / 48 / 32767
    assert got["mean_abs_amplitude"] == pytest.approx(expect)


def test_fixed_roundtrip_fuzz():
    """100 seeded random signals through every fixed order and varied
    Rice params / partition orders — exact reconstruction each time."""
    import random

    for seed in range(100):
        rng = random.Random(seed)
        n = rng.choice([16, 32, 64])
        amp = rng.choice([50, 1000, 30000])
        samples = [rng.randint(-amp, amp) for _ in range(n)]
        order = rng.randint(0, 4) or 1
        param = rng.randint(2, 14)
        porder = rng.choice([0, 0, 1, 2])
        if (n >> porder) <= order:
            porder = 0
        data = _streaminfo(8000, 1, 16, n) + _frame(
            8000, 0, n,
            lambda w: _subframe_fixed(w, samples, order, 16,
                                      param=param, porder=porder),
        )
        got = flac_lite.decode(data)
        expect = sum(abs(s) for s in samples) / n / 32767
        assert got["mean_abs_amplitude"] == pytest.approx(expect), seed


def test_reserved_sample_size_code_fails_closed():
    """r12 review finding 4: ss_code 0b011 is reserved — decoding it
    at the STREAMINFO width silently accepts a spec-invalid stream."""
    data = _streaminfo(8000, 1, 16, 64) + _frame(
        8000, 0, 64, lambda w: _subframe_constant(w, -1000, 16)
    )
    hdr_off = len(_streaminfo(8000, 1, 16, 64))
    bad = bytearray(data)
    # frame header byte 3: ch_code(4) | ss_code(3) | reserved(1):
    # set ss_code to 3 and re-CRC the header so only the reserved
    # check can reject it
    bad[hdr_off + 3] = (0 << 4) | (3 << 1)
    hdr_len = 6  # sync..blocksize byte for this fixture's layout
    bad[hdr_off + hdr_len] = flac_lite._crc8(
        bytes(bad[hdr_off:hdr_off + hdr_len])
    )
    with pytest.raises(ValueError, match="reserved sample size"):
        flac_lite.decode(bytes(bad))


def test_frame_sample_rate_mismatch_fails_closed():
    """r12 review finding 5: a frame sr_code contradicting STREAMINFO
    must raise (it would silently mis-report duration); _SAMPLE_RATES
    is the cross-check table."""
    data = _streaminfo(8000, 1, 16, 64) + _frame(
        8000, 0, 64, lambda w: _subframe_constant(w, -1000, 16)
    )
    hdr_off = len(_streaminfo(8000, 1, 16, 64))
    bad = bytearray(data)
    # frame header byte 2: bs_code(4) | sr_code(4) — set sr_code 9
    # (44100 != STREAMINFO's 8000) and re-CRC
    bad[hdr_off + 2] = (bad[hdr_off + 2] & 0xF0) | 9
    hdr_len = 6
    bad[hdr_off + hdr_len] = flac_lite._crc8(
        bytes(bad[hdr_off:hdr_off + hdr_len])
    )
    with pytest.raises(ValueError, match="differs from STREAMINFO"):
        flac_lite.decode(bytes(bad))


def test_frame_sample_size_mismatch_fails_closed():
    """r12 ADVICE: a frame ss_code resolving to a VALID bps that
    differs from STREAMINFO must raise like the rate/channel checks —
    mean_abs_amplitude is normalized by STREAMINFO bps, so accepting
    the frame would silently mis-scale the stats."""
    data = _streaminfo(8000, 1, 16, 64) + _frame(
        8000, 0, 64, lambda w: _subframe_constant(w, -1000, 16)
    )
    hdr_off = len(_streaminfo(8000, 1, 16, 64))
    bad = bytearray(data)
    # frame header byte 3: ch_code(4) | ss_code(3) | reserved(1) —
    # ss_code 1 = 8 bps, valid but != STREAMINFO's 16; re-CRC so only
    # the bps cross-check can reject it
    bad[hdr_off + 3] = (0 << 4) | (1 << 1)
    hdr_len = 6
    bad[hdr_off + hdr_len] = flac_lite._crc8(
        bytes(bad[hdr_off:hdr_off + hdr_len])
    )
    with pytest.raises(ValueError, match="sample size differs from STREAMINFO"):
        flac_lite.decode(bytes(bad))


def test_media_flac_int32_guard(monkeypatch):
    """r12 review finding 2: the FLAC branch needs the same int32
    n_frames guard as the MPEG branch."""
    from pythondataingestionprocess_spark.multimodal import media

    monkeypatch.setattr(
        flac_lite, "decode",
        lambda c: {"n_samples": 2**31, "sample_rate": 44100,
                   "channels": 2, "mean_abs_amplitude": 0.5},
    )
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(b"fLaC....", "audio")
