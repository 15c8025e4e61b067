"""Stdlib FLAC decode — real SAMPLES, not just metadata.

FLAC is the mainstream lossless audio codec, and unlike MP3/AAC its
decode is pure integer arithmetic (the xiph.org format spec): Rice-
coded prediction residuals plus fixed or LPC integer predictors, bit-
exact by construction. That upgrades compressed-audio support from
frame-header metadata (mpeg_audio_lite) to the same full-sample stats
the PCM WAV path reports.

Scope: STREAMINFO + frames with CONSTANT / VERBATIM / FIXED(0-4) /
LPC(1-32) subframes, all four channel assignments (independent,
left/side, right/side, mid/side), Rice and Rice2 residual methods
with escape partitions, wasted bits, both blocking strategies. Every
frame header's CRC-8 and every frame's CRC-16 are VERIFIED — a
corrupt or truncated stream raises ``ValueError`` (fail closed, the
pdf_lite discipline) rather than averaging garbage samples.

At 100 TB: STREAMINFO alone answers catalog filters (rate, channels,
total samples) from the first ~50 bytes; the sample decode walks
every byte and belongs behind mapInPandas like the other decoders.
"""

from __future__ import annotations

_FIXED_COEFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_BLOCK_SIZES = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_RATES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}

_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def _crc8(data: bytes) -> int:
    """CRC-8, polynomial 0x07, init 0 (check('123456789') = 0xF4)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    """CRC-16, polynomial 0x8005, init 0 (check('123456789') = 0xFEE8)."""
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.byte = pos
        self.bit = 0

    def read(self, n: int) -> int:
        v = 0
        for _ in range(n):
            if self.byte >= len(self.d):
                raise ValueError("truncated FLAC bitstream")
            v = (v << 1) | ((self.d[self.byte] >> (7 - self.bit)) & 1)
            self.bit += 1
            if self.bit == 8:
                self.bit = 0
                self.byte += 1
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if n and v >= (1 << (n - 1)) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("runaway unary code")
        return q

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.byte += 1


def _utf8_number(bits: _Bits) -> int:
    """FLAC's UTF-8-style coded frame/sample number (up to 36 bits /
    7 bytes)."""
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    mask = 0x40
    while b0 & mask:
        n += 1
        mask >>= 1
    if n < 1 or n > 6:
        raise ValueError("malformed UTF-8-coded frame number")
    v = b0 & (mask - 1)
    for _ in range(n):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("malformed UTF-8-coded frame number")
        v = (v << 6) | (c & 0x3F)
    return v


def _residual(bits: _Bits, n: int, order: int) -> list[int]:
    """Rice/Rice2-coded residual (zigzag), with escape partitions."""
    method = bits.read(2)
    if method > 1:
        raise ValueError(f"reserved residual method {method}")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    porder = bits.read(4)
    nparts = 1 << porder
    if n % nparts:
        raise ValueError("block size not divisible by partition count")
    out: list[int] = []
    for p in range(nparts):
        cnt = n // nparts - (order if p == 0 else 0)
        if cnt < 0:
            raise ValueError("predictor order exceeds first partition")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(cnt):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(cnt):
                q = bits.unary()
                v = (q << param) | (bits.read(param) if param else 0)
                out.append((v >> 1) ^ -(v & 1))  # zigzag
    return out


def _subframe(bits: _Bits, n: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("subframe padding bit set")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.unary()
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("wasted bits exceed sample size")

    if ftype == 0:  # CONSTANT
        samples = [bits.read_signed(eff)] * n
    elif ftype == 1:  # VERBATIM
        samples = [bits.read_signed(eff) for _ in range(n)]
    elif 8 <= ftype <= 12:  # FIXED, order 0-4
        order = ftype - 8
        samples = [bits.read_signed(eff) for _ in range(order)]
        res = _residual(bits, n, order)
        coefs = _FIXED_COEFS[order]
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append(pred + r)
    elif ftype >= 32:  # LPC, order 1-32
        order = ftype - 31
        samples = [bits.read_signed(eff) for _ in range(order)]
        prec = bits.read(4)
        if prec == 15:
            raise ValueError("invalid LPC precision")
        prec += 1
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("negative LPC shift")
        coefs = [bits.read_signed(prec) for _ in range(order)]
        res = _residual(bits, n, order)
        for r in res:
            pred = sum(c * samples[-1 - j] for j, c in enumerate(coefs))
            samples.append((pred >> shift) + r)
    else:
        raise ValueError(f"reserved subframe type {ftype}")
    if wasted:
        samples = [s << wasted for s in samples]
    return samples


def _streaminfo(data: bytes) -> tuple[dict, int]:
    if data[:4] != b"fLaC":
        raise ValueError("not a FLAC stream (bad magic)")
    i = 4
    info = None
    while True:
        if i + 4 > len(data):
            raise ValueError("truncated metadata block header")
        last = data[i] & 0x80
        btype = data[i] & 0x7F
        blen = int.from_bytes(data[i + 1:i + 4], "big")
        i += 4
        if i + blen > len(data):
            raise ValueError("truncated metadata block")
        if btype == 0:
            if blen < 34:
                raise ValueError("short STREAMINFO")
            b = _Bits(data, i)
            b.read(16)  # min block size
            b.read(16)  # max block size
            b.read(24)
            b.read(24)
            rate = b.read(20)
            channels = b.read(3) + 1
            bps = b.read(5) + 1
            total = b.read(36)
            if rate == 0:
                raise ValueError("STREAMINFO sample rate 0")
            info = {
                "sample_rate": rate,
                "channels": channels,
                "bps": bps,
                "total_samples": total,
            }
        i += blen
        if last:
            break
    if info is None:
        raise ValueError("no STREAMINFO block")
    return info, i


def decode(content: bytes) -> dict:
    """Decode every frame; returns ``{sample_rate, channels, bps,
    n_samples, duration_sec, mean_abs_amplitude}`` with the amplitude
    normalized to [0, 1] over all channels (the WAV stats contract).
    CRC-8 (frame headers) and CRC-16 (frames) verified; any mismatch
    or malformed structure raises ``ValueError``."""
    info, i = _streaminfo(content)
    n = len(content)
    total_abs = 0
    n_samples = 0  # inter-channel samples (per WAV frame convention)
    full = (1 << (info["bps"] - 1)) - 1 or 1
    while i < n:
        frame_start = i
        bits = _Bits(content, i)
        sync = bits.read(14)
        if sync != 0b11111111111110:
            raise ValueError(f"bad frame sync at byte {i}")
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("reserved frame-header bit set")
        _utf8_number(bits)
        if bs_code == 0:
            raise ValueError("reserved block size code")
        elif bs_code == 6:
            block = bits.read(8) + 1
        elif bs_code == 7:
            block = bits.read(16) + 1
        else:
            block = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            frame_rate = bits.read(8) * 1000
        elif sr_code == 13:
            frame_rate = bits.read(16)
        elif sr_code == 14:
            frame_rate = bits.read(16) * 10
        elif sr_code == 15:
            raise ValueError("invalid sample rate code")
        elif sr_code == 0:
            frame_rate = info["sample_rate"]
        else:
            frame_rate = _SAMPLE_RATES[sr_code]
        if frame_rate != info["sample_rate"]:
            # a frame contradicting STREAMINFO would silently report
            # the wrong duration — fail closed (r12 review; also makes
            # _SAMPLE_RATES a used cross-check, not dead weight)
            raise ValueError("frame sample rate differs from STREAMINFO")
        header_end = bits.byte
        if bits.bit:
            raise ValueError("frame header not byte-aligned")
        crc8 = bits.read(8)
        if _crc8(content[frame_start:header_end]) != crc8:
            raise ValueError("frame header CRC-8 mismatch")
        if ss_code == 0:
            bps = info["bps"]
        elif ss_code in _SAMPLE_SIZES:
            bps = _SAMPLE_SIZES[ss_code]
        else:
            raise ValueError(f"reserved sample size code {ss_code}")
        if bps != info["bps"]:
            # mean_abs_amplitude is normalized by STREAMINFO bps, so a
            # frame coded at a different resolution would silently
            # mis-scale the stats — fail closed, matching the sample
            # rate / channel strictness above (r12 ADVICE)
            raise ValueError("frame sample size differs from STREAMINFO")

        if ch_code < 8:
            nch = ch_code + 1
            chans = [_subframe(bits, block, bps) for _ in range(nch)]
        elif ch_code in (8, 9, 10):
            nch = 2
            # the SIDE channel carries one extra bit
            if ch_code == 8:  # left/side
                left = _subframe(bits, block, bps)
                side = _subframe(bits, block, bps + 1)
                chans = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _subframe(bits, block, bps + 1)
                right = _subframe(bits, block, bps)
                chans = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _subframe(bits, block, bps)
                side = _subframe(bits, block, bps + 1)
                chans = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    chans[0].append((m + s) >> 1)
                    chans[1].append((m - s) >> 1)
        else:
            raise ValueError(f"reserved channel assignment {ch_code}")
        if nch != info["channels"]:
            raise ValueError("frame channel count differs from STREAMINFO")

        bits.align()
        crc16 = bits.read(16)
        if _crc16(content[frame_start:bits.byte - 2]) != crc16:
            raise ValueError("frame CRC-16 mismatch")
        i = bits.byte

        for ch in chans:
            for s in ch:
                total_abs += abs(s)
        n_samples += block

    if n_samples == 0:
        raise ValueError("FLAC stream has no audio frames")
    if info["total_samples"] and n_samples != info["total_samples"]:
        raise ValueError(
            f"decoded {n_samples} samples, STREAMINFO declares "
            f"{info['total_samples']}"
        )
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bps": info["bps"],
        "n_samples": n_samples,
        "duration_sec": n_samples / info["sample_rate"],
        "mean_abs_amplitude": total_abs
        / (n_samples * info["channels"])
        / full,
    }
