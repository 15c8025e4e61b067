"""Stdlib+numpy JPEG: header metadata AND baseline pixel decode.

JFIF/EXIF JPEG is a sequence of ``FF xx`` marker segments; the frame
header (SOF0..SOF15, minus the DHT/DAC/RST markers sharing the range)
carries bit depth, dimensions, and component count — everything a
catalog/filter stage needs (resolution screens, aspect-ratio buckets,
grayscale-vs-color routing) without entropy-decoding a single MCU.

Since r10 ``decode`` also pixel-decodes BASELINE sequential JPEGs
(the dominant wire format) with nothing beyond numpy: Huffman entropy
decode, dequantization, 2-D IDCT, restart markers, any sampling
factors. Intensity stats come from the luma plane alone — chroma
blocks are entropy-decoded only to keep the bitstream in sync.
Progressive/arithmetic/12-bit streams raise and callers keep
header-only metadata (media.real_decode), or route to PIL when it is
importable.

At 100 TB the header/decode distinction matters: header metadata
reads ~2 KB per blob (and a reader that pushes down byte ranges never
fetches the payload), while decode touches every byte. A resolution
filter that runs on header metadata before the decode stage prunes
the expensive path for free — and the decode stage itself is a Python
kernel, so at cluster scale it belongs behind mapInPandas with PIL
preferred when present.
"""

from __future__ import annotations

import struct

# SOF markers: C0-CF minus C4 (DHT), C8 (JPG extension), CC (DAC).
_SOF = {
    0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF,
}
_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM: no length word
_PROGRESSIVE = {0xC2, 0xC6, 0xCA, 0xCE}


def parse_header(content: bytes) -> dict:
    """Metadata from the marker stream: width, height, n_components
    (1=grayscale, 3=YCbCr, 4=CMYK), bit depth, progressive flag, and
    whether an EXIF APP1 segment is present. Raises ``ValueError`` on
    non-JPEG or truncated-before-SOF input (callers quarantine, the
    pdf_lite discipline — never guess)."""
    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    has_exif = False
    i = 2
    n = len(content)
    while i + 1 < n:
        if content[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = content[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        i += 2
        if marker in _STANDALONE:
            continue
        if marker == 0xD9:  # EOI before any SOF
            break
        if i + 2 > n:
            break
        (seg_len,) = struct.unpack(">H", content[i:i + 2])
        if seg_len < 2 or i + seg_len > n:
            raise ValueError(f"truncated segment 0x{marker:02x} at {i}")
        if marker == 0xE1 and content[i + 2:i + 8] == b"Exif\x00\x00":
            has_exif = True
        if marker in _SOF:
            precision, height, width, n_comp = struct.unpack(
                ">BHHB", content[i + 2:i + 8]
            )
            return {
                "width": width,
                "height": height,
                "n_components": n_comp,
                "bit_depth": precision,
                "progressive": marker in _PROGRESSIVE,
                "has_exif": has_exif,
            }
        if marker == 0xDA:  # SOS before SOF: malformed
            break
        i += seg_len
    raise ValueError("no SOF frame header found")


# --- baseline pixel decode (r10) ---------------------------------------
#
# Baseline sequential DCT decode (ITU-T T.81 §F.2) in numpy — Huffman
# entropy decode, dequantization, 2-D IDCT, MCU reassembly. Scope:
# SOF0/SOF1 (baseline / extended sequential, Huffman, 8-bit),
# grayscale and YCbCr with any sampling factors, restart intervals.
# Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical
# modes raise ValueError — callers fall back to header-only metadata
# (media.real_decode) or quarantine. Only the LUMA plane is
# dequantized/IDCT'd: intensity stats need Y alone, but chroma blocks
# are still entropy-decoded to keep the bitstream in sync.

_ZZ = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


def _idct_basis():
    import numpy as np

    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    c[0, :] /= np.sqrt(2.0)
    return c  # C[u, x]; spatial = C.T @ coeff @ C


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """Canonical Huffman: {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _Bits:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RST markers are consumed by sync_restart()."""

    def __init__(self, data: bytes, pos: int):
        self.d = data
        self.i = pos
        self.cur = 0
        self.n = 0

    def _fill(self) -> None:
        if self.i >= len(self.d):
            raise ValueError("truncated entropy stream")
        b = self.d[self.i]
        self.i += 1
        if b == 0xFF:
            nxt = self.d[self.i] if self.i < len(self.d) else -1
            if nxt == 0x00:
                self.i += 1
            else:
                raise ValueError(
                    f"unexpected marker 0xff{nxt:02x} in entropy stream"
                )
        self.cur = b
        self.n = 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.cur >> self.n) & 1

    def read(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self, seq: int) -> None:
        """Byte-align and consume the expected RSTn marker."""
        self.n = 0
        while self.i + 1 < len(self.d) and self.d[self.i] == 0xFF and (
            self.d[self.i + 1] == 0xFF
        ):
            self.i += 1  # fill bytes
        if not (
            self.i + 1 < len(self.d)
            and self.d[self.i] == 0xFF
            and self.d[self.i + 1] == 0xD0 + (seq & 7)
        ):
            raise ValueError(f"missing RST{seq & 7} marker")
        self.i += 2


def _decode_huff(bits: _Bits, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | bits.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if size and v < (1 << (size - 1)) else v


def decode(content: bytes) -> dict:
    """Pixel-decode a baseline JPEG: ``{width, height, n_components,
    mean_intensity, std_intensity}`` with the stats taken over the
    LUMA plane's true image area, scaled to [0, 1] (the Y channel IS
    the intensity; chroma never moves it). Raises ``ValueError`` on
    progressive/arithmetic/12-bit streams and on malformed entropy
    data — callers keep header metadata and NULL stats instead."""
    import numpy as np

    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    i, n = 2, len(content)
    while i + 1 < n:
        if content[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = content[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        i += 2
        if marker in _STANDALONE or marker == 0xD9:
            continue
        (seg_len,) = struct.unpack(">H", content[i:i + 2])
        if seg_len < 2 or i + seg_len > n:
            raise ValueError(f"truncated segment 0x{marker:02x} at {i}")
        seg = content[i + 2:i + seg_len]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                j += 1
                if prec:
                    vals = [
                        struct.unpack(">H", seg[j + 2 * z:j + 2 * z + 2])[0]
                        for z in range(64)
                    ]
                    j += 128
                else:
                    vals = list(seg[j:j + 64])
                    j += 64
                qt[tid] = vals
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                bits_counts = list(seg[j + 1:j + 17])
                nv = sum(bits_counts)
                huff[(cls, tid)] = _build_huffman(
                    bits_counts, seg[j + 17:j + 17 + nv]
                )
                j += 17 + nv
        elif marker in _SOF:
            if marker not in (0xC0, 0xC1):
                raise ValueError(
                    f"unsupported JPEG mode (SOF{marker - 0xC0})"
                )
            precision, height, width, n_comp = struct.unpack(
                ">BHHB", seg[:6]
            )
            if precision != 8:
                raise ValueError(f"unsupported precision {precision}")
            comps = []
            for ci in range(n_comp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq}
                )
            sof = (width, height, comps)
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = {}
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci:3 + 2 * ci]
                scan[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                np, content, i + seg_len, sof, scan, qt, huff, restart
            )
        i += seg_len
    raise ValueError("no SOS scan found")


def _decode_scan(np, data, pos, sof, scan, qt, huff, restart):
    width, height, comps = sof
    if not comps or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("bad sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    luma = comps[0]
    lq = np.array(qt[luma["tq"]], dtype=np.float64)
    basis = _idct_basis()
    inv_zz = np.array(_ZZ)
    # luma plane in 8px blocks (padded to MCU grid)
    yplane = np.zeros((mcuy * luma["v"] * 8, mcux * luma["h"] * 8))

    bits = _Bits(data, pos)
    pred = {c["id"]: 0 for c in comps}
    rst_seq = 0
    for m in range(mcux * mcuy):
        if restart and m and m % restart == 0:
            bits.sync_restart(rst_seq)
            rst_seq += 1
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_t, ac_t = (
                huff.get((0, scan[c["id"]][0])),
                huff.get((1, scan[c["id"]][1])),
            )
            if dc_t is None or ac_t is None:
                raise ValueError("missing Huffman table for scan")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64)
                    size = _decode_huff(bits, dc_t)
                    if size > 11:
                        raise ValueError("bad DC size")
                    diff = _extend(bits.read(size), size)
                    pred[c["id"]] += diff
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = _decode_huff(bits, ac_t)
                        run, size = rs >> 4, rs & 0xF
                        if size == 0:
                            if run == 15:  # ZRL
                                k += 16
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("AC run past block end")
                        zz[k] = _extend(bits.read(size), size)
                        k += 1
                    if c is luma:
                        coeff = np.zeros(64)
                        coeff[inv_zz] = zz * lq[np.arange(64)]
                        block = basis.T @ coeff.reshape(8, 8) @ basis
                        py = (my * c["v"] + by) * 8
                        px = (mx * c["h"] + bx) * 8
                        yplane[py:py + 8, px:px + 8] = block
    # crop the luma plane to the true image area (component size)
    lw = (width * luma["h"] + hmax - 1) // hmax
    lh = (height * luma["v"] + vmax - 1) // vmax
    vis = np.clip(yplane[:lh, :lw] + 128.0, 0, 255)
    # std is the AC-path witness: a DC-only image has std exactly 0,
    # and any mis-decoded AC coefficient moves it (the mean cannot —
    # every AC basis function integrates to zero over the block)
    return {
        "width": width,
        "height": height,
        "n_components": len(comps),
        "mean_intensity": float(vis.mean() / 255.0),
        "std_intensity": float(vis.std() / 255.0),
    }
