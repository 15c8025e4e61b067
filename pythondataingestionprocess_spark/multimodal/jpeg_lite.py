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

Since r12 PROGRESSIVE (SOF2) streams pixel-decode too — the r11
VERDICT listed them container-bound, but progressive mode is pure
entropy coding (T.81 §G), no codec library involved: DC
first/refinement scans, AC spectral-selection bands with EOB runs, AC
successive-approximation refinement (correction bits), restart
intervals, with coefficients accumulated across scans and one
dequant+IDCT at EOI. Luma-only like the baseline path — and
progressive AC scans are single-component by spec, so chroma scans
skip at BYTE level (no entropy work at all), an economy baseline's
interleaved MCUs can't have. Arithmetic/12-bit/hierarchical still
raise and callers keep header-only metadata (media.real_decode), or
route to PIL when it is importable.

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
    """Pixel-decode a baseline or progressive JPEG: ``{width, height,
    n_components, mean_intensity, std_intensity}`` with the stats
    taken over the LUMA plane's true image area, scaled to [0, 1]
    (the Y channel IS the intensity; chroma never moves it). Raises
    ``ValueError`` on arithmetic/12-bit/hierarchical streams and on
    malformed entropy data — callers keep header metadata and NULL
    stats instead."""
    import numpy as np

    if len(content) < 4 or content[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qt: dict[int, list[int]] = {}
    huff: dict[tuple[int, int], dict] = {}
    sof = None
    restart = 0
    progressive = False
    state = None  # progressive coefficient accumulator
    i, n = 2, len(content)
    while i + 1 < n:
        if content[i] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {i}")
        marker = content[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        i += 2
        if marker == 0xD9 and state is not None:  # EOI: all scans in
            return _prog_finalize(np, sof, state, qt)
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
            if marker not in (0xC0, 0xC1, 0xC2):
                raise ValueError(
                    f"unsupported JPEG mode (SOF{marker - 0xC0})"
                )
            progressive = marker == 0xC2
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
            if len(seg) < 1 or len(seg) < 4 + 2 * seg[0]:
                # must raise ValueError, not IndexError — callers'
                # header-metadata fallback catches only the former
                # (r12 review)
                raise ValueError("truncated SOS header")
            ns = seg[0]
            scomp = []
            for ci in range(ns):
                cid, tt = seg[1 + 2 * ci:3 + 2 * ci]
                scomp.append((cid, tt >> 4, tt & 0xF))
            if not progressive:
                scan = {cid: (d, a) for cid, d, a in scomp}
                return _decode_scan(
                    np, content, i + seg_len, sof, scan, qt, huff, restart
                )
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            if state is None:
                state = _prog_state(np, sof)
            i = _progressive_scan(
                np, content, i + seg_len, sof, scomp,
                (ss, se, ahal >> 4, ahal & 0xF), huff, restart, state,
            )
            continue
        i += seg_len
    if state is not None:
        raise ValueError("truncated progressive stream (no EOI)")
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
    if luma["tq"] not in qt:
        raise ValueError("missing quantization table for luma")
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


# --- progressive pixel decode (r12, T.81 §G) ----------------------------
#
# Coefficients accumulate across scans into a per-block array (ZIGZAG
# order, matching the bitstream), then dequant+IDCT once at EOI. Only
# the luma component's coefficients are STORED; scans that do not
# include luma are skipped at byte level (scans are independent entropy
# segments — nothing downstream consumes chroma bits), and interleaved
# scans that do include luma entropy-decode every member to stay in
# sync, exactly like the baseline path.


def _comp_blocks(sof, c) -> tuple[int, int]:
    """Non-interleaved block grid of one component: ceil over the
    COMPONENT's own sample dimensions (§A.2.2 — not padded to MCUs)."""
    width, height, comps = sof
    hmax = max(x["h"] for x in comps)
    vmax = max(x["v"] for x in comps)
    cw = -(-width * c["h"] // hmax)
    ch = -(-height * c["v"] // vmax)
    return -(-ch // 8), -(-cw // 8)


def _prog_state(np, sof):
    """Luma coefficient accumulator on the MCU-padded block grid (the
    interleaved-scan geometry; non-interleaved scans index inside it)."""
    width, height, comps = sof
    if not comps or any(c["h"] < 1 or c["v"] < 1 for c in comps):
        raise ValueError("bad sampling factors")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    luma = comps[0]
    return {
        "coef": np.zeros(
            (mcuy * luma["v"], mcux * luma["h"], 64), dtype=np.int64
        ),
        "mcux": mcux,
        "mcuy": mcuy,
    }


def _next_marker_pos(data: bytes, pos: int) -> int:
    """Byte offset of the next real marker after entropy data: skips
    0xFF00 stuffing and stray RSTn; raises on truncation."""
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] not in (0x00, 0xFF):
            if 0xD0 <= data[pos + 1] <= 0xD7:
                pos += 2
                continue
            return pos
        pos += 1
    raise ValueError("truncated after progressive scan")


def _progressive_scan(np, data, pos, sof, scomp, band, huff, restart, state):
    """Decode one progressive SOS segment into the accumulator and
    return the byte offset of the next marker."""
    ss, se, ah, al = band
    width, height, comps = sof
    byid = {c["id"]: c for c in comps}
    luma = comps[0]
    if luma["id"] not in {cid for cid, _, _ in scomp}:
        return _next_marker_pos(data, pos)  # chroma-only scan: skip
    coef = state["coef"]

    if ss == 0:  # DC scan (the only kind that may interleave)
        if se != 0:
            raise ValueError("DC scan with nonzero spectral end")
        dc_tables = {}
        for cid, dt, _ in scomp:
            if ah == 0:
                t = huff.get((0, dt))
                if t is None:
                    raise ValueError("missing DC Huffman table for scan")
                dc_tables[cid] = t
        bits = _Bits(data, pos)
        pred = {cid: 0 for cid, _, _ in scomp}
        rst_seq = 0

        def dc_unit(cid, gy, gx):
            if ah == 0:
                size = _decode_huff(bits, dc_tables[cid])
                if size > 11:
                    raise ValueError("bad DC size")
                pred[cid] += _extend(bits.read(size), size)
                if cid == luma["id"]:
                    coef[gy, gx, 0] = pred[cid] << al
            else:
                bit = bits.bit()
                if cid == luma["id"]:
                    coef[gy, gx, 0] |= bit << al

        if len(scomp) == 1:
            cid = scomp[0][0]
            c = byid[cid]
            bh_, bw_ = _comp_blocks(sof, c)
            for u in range(bh_ * bw_):
                if restart and u and u % restart == 0:
                    bits.sync_restart(rst_seq)
                    rst_seq += 1
                    pred = {cid: 0}
                dc_unit(cid, *divmod(u, bw_))
        else:
            mcux, mcuy = state["mcux"], state["mcuy"]
            for m in range(mcux * mcuy):
                if restart and m and m % restart == 0:
                    bits.sync_restart(rst_seq)
                    rst_seq += 1
                    pred = {cid: 0 for cid, _, _ in scomp}
                my, mx = divmod(m, mcux)
                for cid, _, _ in scomp:
                    c = byid[cid]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            dc_unit(cid, my * c["v"] + by, mx * c["h"] + bx)
        return _next_marker_pos(data, bits.i)

    # AC scan: single-component by spec (§G.1.1.1.1), luma by the
    # skip above; block order is the component's own raster.
    if len(scomp) != 1:
        raise ValueError("progressive AC scan must be single-component")
    ac_t = huff.get((1, scomp[0][2]))
    if ac_t is None:
        raise ValueError("missing AC Huffman table for scan")
    bh_, bw_ = _comp_blocks(sof, luma)
    bits = _Bits(data, pos)
    eobrun = 0
    rst_seq = 0
    for u in range(bh_ * bw_):
        if restart and u and u % restart == 0:
            bits.sync_restart(rst_seq)
            rst_seq += 1
            eobrun = 0
        by, bx = divmod(u, bw_)
        blk = coef[by, bx]
        if ah == 0:
            eobrun = _ac_first(bits, ac_t, blk, ss, se, al, eobrun)
        else:
            eobrun = _ac_refine(bits, ac_t, blk, ss, se, al, eobrun)
    return _next_marker_pos(data, bits.i)


def _ac_first(bits, ac_t, blk, ss, se, al, eobrun) -> int:
    """First AC scan of a band (§G.1.2.2): coefficients at magnitude
    << al, EOBn symbols carry a run of all-zero-band blocks."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(bits, ac_t)
        run, size = rs >> 4, rs & 0xF
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            # EOBn: (1 << run) + extra blocks INCLUDING this one
            return (1 << run) - 1 + (bits.read(run) if run else 0)
        k += run
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(bits.read(size), size) << al
        k += 1
    return 0


def _ac_refine(bits, ac_t, blk, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (§G.1.2.3): nonzero-
    history coefficients take one correction bit each; zero-history
    positions consume the run length and may gain a ±1<<al value."""
    p1 = 1 << al
    k = ss
    if not eobrun:
        while k <= se:
            rs = _decode_huff(bits, ac_t)
            run, size = rs >> 4, rs & 0xF
            val = 0
            if size == 0:
                if run != 15:
                    eobrun = (1 << run) + (bits.read(run) if run else 0)
                    break  # correction bits for the rest ride the EOB path
                # run == 15: ZRL — skip 16 zero-history positions
            else:
                if size != 1:
                    raise ValueError("bad refinement magnitude size")
                val = p1 if bits.bit() else -p1
            while k <= se:
                v = int(blk[k])
                if v:
                    if bits.bit() and not (v & p1):
                        blk[k] = v + (p1 if v > 0 else -p1)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun:
        while k <= se:  # correction bits for remaining nonzero history
            v = int(blk[k])
            if v and bits.bit() and not (v & p1):
                blk[k] = v + (p1 if v > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_finalize(np, sof, state, qt):
    """Dequantize + IDCT the accumulated luma coefficients, stats over
    the true image area (same contract as the baseline path)."""
    width, height, comps = sof
    luma = comps[0]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if luma["tq"] not in qt:
        raise ValueError("missing quantization table for luma")
    lq = np.asarray(qt[luma["tq"]], dtype=np.float64)
    zz = np.asarray(_ZZ)
    basis = _idct_basis()
    lw = (width * luma["h"] + hmax - 1) // hmax
    lh = (height * luma["v"] + vmax - 1) // vmax
    coef = state["coef"]
    bx = coef.shape[1]
    # strip-wise dequant+IDCT, one BLOCK ROW at a time: peak transient
    # memory is one 8-pixel strip, not five full-image float64 planes
    # (r12 review — a 50 MP progressive photo would otherwise allocate
    # ~1.6 GB in one shot inside an executor Python worker)
    cnt = 0
    s = 0.0
    sq = 0.0
    for r in range(coef.shape[0]):
        top = r * 8
        if top >= lh:
            break
        row = coef[r].astype(np.float64) * lq  # (bx, 64) zigzag
        nat = np.zeros_like(row)
        nat[:, zz] = row
        blocks = nat.reshape(bx, 8, 8)
        spatial = np.einsum("ui,xuv,vj->xij", basis, blocks, basis)
        strip = spatial.transpose(1, 0, 2).reshape(8, bx * 8)
        vis = np.clip(strip[: lh - top, :lw] + 128.0, 0, 255)
        cnt += vis.size
        s += float(vis.sum())
        sq += float((vis * vis).sum())
    mean = s / cnt
    var = max(sq / cnt - mean * mean, 0.0)
    return {
        "width": width,
        "height": height,
        "n_components": len(comps),
        "mean_intensity": mean / 255.0,
        "std_intensity": float(np.sqrt(var)) / 255.0,
    }


def count_frames(content: bytes) -> int:
    """Number of complete top-level JPEG images in a concatenated
    (raw MJPEG) stream. Walks the real marker structure: APPn/COM and
    every other length-prefixed segment is skipped by its declared
    length — so an EXIF thumbnail (a full JPEG embedded in an APP1
    payload) is skipped wholesale and never counted (r13 review: a
    naive SOI-signature count doubles on camera streams, because
    marker-segment payloads are NOT byte-stuffed the way entropy data
    is). After SOS, entropy data scans to the next non-RST marker; EOI
    closes a frame. Raises ``ValueError`` on malformed top-level
    structure — an unknowable count must quarantine, never guess."""
    i, n = 0, len(content)
    frames = 0
    while i < n:
        if content[i:i + 2] != b"\xff\xd8":
            raise ValueError(f"expected SOI at byte {i}")
        i += 2
        while True:
            while i + 1 < n and content[i] == 0xFF and content[i + 1] == 0xFF:
                i += 1  # legal fill bytes before a marker
            if i + 1 >= n or content[i] != 0xFF:
                raise ValueError(f"expected marker at byte {i}")
            marker = content[i + 1]
            i += 2
            if marker == 0xD9:  # EOI
                frames += 1
                # inter-frame ZERO padding only (AVI MJPG chunks pad
                # to even sizes with 0x00); 0xFF padding here would be
                # ambiguous with a truncated marker — stays an error
                while i < n and content[i] == 0:
                    i += 1
                break
            if marker in _STANDALONE:
                continue
            if i + 2 > n:
                raise ValueError("truncated segment header")
            (seg,) = struct.unpack(">H", content[i:i + 2])
            if seg < 2:
                raise ValueError("bad segment length")
            i += seg
            if marker == 0xDA:  # SOS: entropy data follows the header
                i = _next_marker_pos(content, i)
    return frames
