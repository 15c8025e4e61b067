"""HEIF / AVIF still-image container METADATA (ISO/IEC 23008-12 box
structure; AVIF per the AOMedia AVIF spec reuses it verbatim with
'av01' items). Real box-walk metadata — primary-item dimensions via
pitm → ipma → ispe, item counts from iinf — with honestly-NULL pixel
stats: the payloads are AV1/HEVC intra frames, codecs this engine
does not decode (documented gap class, same tier as MP3/AAC sample
decode). Box iteration reuses mp4_lite's ISO-BMFF walker — HEIF IS
ISO-BMFF.

Reference anchor: binary media ingestion is the engine-added analog
of the reference's binary statement ingestion (pdf_to_xlsx.py:27-30).
"""

from __future__ import annotations

import struct

from pythondataingestionprocess_spark.multimodal.mp4_lite import (
    _find,
    _fullbox,
    _iter_boxes,
)

# brands that mark a HEIF-structured file (stills and sequences)
_BRANDS = {
    b"avif", b"avis", b"heic", b"heix", b"hevc", b"mif1", b"msf1",
}


def is_heif(content: bytes) -> bool:
    """ftyp sniff: major or compatible brand in the HEIF family."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        return False
    (size,) = struct.unpack(">I", content[:4])
    if size < 16 or size > len(content):
        return False
    if content[8:12] in _BRANDS:
        return True
    # compatible brands follow major_brand + minor_version
    for off in range(16, size, 4):
        if content[off:off + 4] in _BRANDS:
            return True
    return False


def _parse_ispe(buf: bytes, body: int) -> tuple[int, int]:
    _, off = _fullbox(buf, body)
    w, h = struct.unpack_from(">II", buf, off)
    return w, h


def parse_meta(content: bytes) -> dict:
    """{'width','height','n_items','codec'} for the PRIMARY item.

    Dimensions resolve pitm → ipma (property associations) → the
    associated 'ispe' in ipco; files without usable associations fall
    back to the largest ispe (thumbnail properties are smaller by
    construction). Raises ValueError on files without a meta/ispe —
    quarantine, not a guess."""
    if not is_heif(content):
        raise ValueError("not a HEIF/AVIF (ftyp brand)")
    meta = _find(content, 0, len(content), b"meta")
    if meta is None:
        raise ValueError("HEIF without meta box")
    _, mbody = _fullbox(content, meta[0])
    mend = meta[1]

    primary = None
    pitm = _find(content, mbody, mend, b"pitm")
    if pitm is not None:
        ver, off = _fullbox(content, pitm[0])
        primary = (
            struct.unpack_from(">I", content, off)[0]
            if ver else struct.unpack_from(">H", content, off)[0]
        )

    n_items = 0
    codec = None
    iinf = _find(content, mbody, mend, b"iinf")
    if iinf is not None:
        ver, off = _fullbox(content, iinf[0])
        n_items = (
            struct.unpack_from(">I", content, off)[0]
            if ver else struct.unpack_from(">H", content, off)[0]
        )
        # infe item_type of the primary (or first coded) item
        for t, b, e in _iter_boxes(content, off + (4 if ver else 2), iinf[1]):
            if t != b"infe":
                continue
            iver, ioff = _fullbox(content, b)
            if iver >= 2:
                # infe v2: 16-bit item_ID; v3+: 32-bit item_ID, so
                # item_type shifts 2 bytes right (ISO 14496-12 §8.11.6
                # — r14 ADVICE: v3 read 2 bytes early made codec and
                # the primary-item match garbage)
                if iver == 2:
                    item_id = struct.unpack_from(">H", content, ioff)[0]
                    item_type = content[ioff + 4:ioff + 8]
                else:
                    item_id = struct.unpack_from(">I", content, ioff)[0]
                    item_type = content[ioff + 6:ioff + 10]
                if item_type in (b"av01", b"hvc1", b"grid") and (
                    codec is None or item_id == primary
                ):
                    codec = item_type.decode("ascii", "replace")

    # properties: ipco children in order (1-indexed for ipma)
    iprp = _find(content, mbody, mend, b"iprp")
    if iprp is None:
        raise ValueError("HEIF without iprp box")
    ipco = _find(content, iprp[0], iprp[1], b"ipco")
    if ipco is None:
        raise ValueError("HEIF without ipco box")
    props = list(_iter_boxes(content, ipco[0], ipco[1]))
    ispes = {
        i + 1: _parse_ispe(content, b)
        for i, (t, b, e) in enumerate(props)
        if t == b"ispe"
    }
    if not ispes:
        raise ValueError("HEIF without ispe (no declared dimensions)")

    dims = None
    ipma = _find(content, iprp[0], iprp[1], b"ipma")
    if ipma is not None and primary is not None:
        ver, off = _fullbox(content, ipma[0])
        flags = int.from_bytes(content[ipma[0] + 1:ipma[0] + 4], "big")
        (entry_count,) = struct.unpack_from(">I", content, off)
        off += 4
        wide = 2 if (flags & 1) else 1
        for _ in range(entry_count):
            if ver == 0:
                (item_id,) = struct.unpack_from(">H", content, off)
                off += 2
            else:
                (item_id,) = struct.unpack_from(">I", content, off)
                off += 4
            assoc_count = content[off]
            off += 1
            for _ in range(assoc_count):
                if wide == 2:
                    (v,) = struct.unpack_from(">H", content, off)
                    idx = v & 0x7FFF
                    off += 2
                else:
                    idx = content[off] & 0x7F
                    off += 1
                if item_id == primary and idx in ispes and dims is None:
                    dims = ispes[idx]
    if dims is None:
        # no usable association: the largest declared extent (alpha /
        # thumbnail aux items are never larger than the master)
        dims = max(ispes.values(), key=lambda wh: wh[0] * wh[1])

    return {
        "width": dims[0],
        "height": dims[1],
        "n_items": n_items or len(ispes),
        "codec": codec,
    }
