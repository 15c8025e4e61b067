"""heif_lite (r14): HEIF/AVIF container metadata. Hand-built
ISO/IEC 23008-12 box fixtures (no HEIF encoder in the container —
same fixture discipline as the mp4/jpeg header tests): ftyp brands,
pitm→ipma→ispe primary-item dimension resolution including the
thumbnail distractor and the flags&1 wide-index ipma form, largest-
ispe fallback, reject paths, and the media routing split (real
metadata, honestly NULL stats)."""

from __future__ import annotations

import struct

import pytest

from pythondataingestionprocess_spark.multimodal import heif_lite, media


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + btype + body


def _full(btype: bytes, body: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _box(btype, bytes([version]) + flags.to_bytes(3, "big") + body)


def _ispe(w: int, h: int) -> bytes:
    return _full(b"ispe", struct.pack(">II", w, h))


def _infe(item_id: int, item_type: bytes) -> bytes:
    return _full(
        b"infe", struct.pack(">HH", item_id, 0) + item_type + b"\x00",
        version=2,
    )


def _avif(primary=1, items=None, props=None, assocs=None, wide=False,
          brand=b"avif", with_pitm=True, with_ipma=True) -> bytes:
    """items: [(id, type)]; props: list of prop boxes (1-indexed);
    assocs: {item_id: [prop_idx]}."""
    items = items or [(1, b"av01")]
    props = props if props is not None else [_ispe(320, 200)]
    assocs = assocs if assocs is not None else {1: [1]}
    ftyp = _box(b"ftyp", brand + b"\x00\x00\x00\x00" + b"mif1" + brand)
    parts = b""
    parts += _full(b"hdlr", bytes(4) + b"pict" + bytes(12))
    if with_pitm:
        parts += _full(b"pitm", struct.pack(">H", primary))
    iinf_body = struct.pack(">H", len(items)) + b"".join(
        _infe(i, t) for i, t in items
    )
    parts += _full(b"iinf", iinf_body)
    ipco = _box(b"ipco", b"".join(props))
    ipma_entries = b""
    for item_id, idxs in assocs.items():
        ipma_entries += struct.pack(">H", item_id) + bytes([len(idxs)])
        for idx in idxs:
            ipma_entries += (
                struct.pack(">H", idx) if wide else bytes([idx])
            )
    ipma = _full(
        b"ipma", struct.pack(">I", len(assocs)) + ipma_entries,
        flags=1 if wide else 0,
    )
    iprp = _box(b"iprp", ipco + (ipma if with_ipma else b""))
    meta = _full(b"meta", parts + iprp)
    return ftyp + meta


def test_primary_item_dimensions_via_ipma():
    """The primary item's ispe wins even when a LARGER thumbnail-ish
    ispe sits first in ipco (association beats position)."""
    blob = _avif(
        primary=2,
        items=[(1, b"av01"), (2, b"av01")],
        props=[_ispe(160, 90), _ispe(1920, 1080)],
        assocs={1: [1], 2: [2]},
    )
    m = heif_lite.parse_meta(blob)
    assert (m["width"], m["height"]) == (1920, 1080)
    assert m["n_items"] == 2 and m["codec"] == "av01"


def test_wide_ipma_indexes_and_heic_brand():
    blob = _avif(
        brand=b"heic",
        items=[(1, b"hvc1")],
        props=[_ispe(640, 480)],
        assocs={1: [1]},
        wide=True,
    )
    m = heif_lite.parse_meta(blob)
    assert (m["width"], m["height"]) == (640, 480)
    assert m["codec"] == "hvc1"


def test_largest_ispe_fallback_without_ipma():
    blob = _avif(
        props=[_ispe(64, 64), _ispe(800, 600)],
        with_ipma=False,
    )
    m = heif_lite.parse_meta(blob)
    assert (m["width"], m["height"]) == (800, 600)


def test_rejects():
    assert not heif_lite.is_heif(b"\x89PNG\r\n\x1a\n" + bytes(8))
    # mp4 brand is NOT a HEIF
    mp4 = _box(b"ftyp", b"isom\x00\x00\x00\x00isom")
    assert not heif_lite.is_heif(mp4 + bytes(8))
    with pytest.raises(ValueError, match="brand"):
        heif_lite.parse_meta(mp4)
    ftyp_only = _box(b"ftyp", b"avif\x00\x00\x00\x00mif1")
    with pytest.raises(ValueError, match="meta box"):
        heif_lite.parse_meta(ftyp_only)
    # meta without any ispe
    no_ispe = _avif(props=[], assocs={})
    with pytest.raises(ValueError, match="ispe"):
        heif_lite.parse_meta(no_ispe)


def test_media_routes_avif_with_null_stats():
    blob = _avif()
    st = media.real_decode(blob, "image/avif")
    assert (st["width"], st["height"], st["n_frames"]) == (320, 200, 1)
    assert st["mean_intensity"] is None
    # compatible-brand form (major mif1, avif in compatibles)
    blob2 = _avif(brand=b"avif")
    assert heif_lite.is_heif(blob2)


def _infe_v3(item_id: int, item_type: bytes) -> bytes:
    """infe version 3: 32-bit item_ID (ISO 14496-12 §8.11.6), so
    item_type sits at +6 after the 16-bit protection index."""
    return _full(
        b"infe", struct.pack(">IH", item_id, 0) + item_type + b"\x00",
        version=3,
    )


def test_infe_v3_32bit_item_id_codec(monkeypatch):
    """infe v3 carries a 32-bit item_ID; reading it as 16-bit shifted
    item_type 2 bytes early and garbled the codec (r14 ADVICE)."""
    # rebuild the fixture with a v3 infe for the primary item
    items_body = struct.pack(">H", 1) + _infe_v3(1, b"av01")
    ftyp = _box(b"ftyp", b"avif\x00\x00\x00\x00mif1avif")
    parts = _full(b"hdlr", bytes(4) + b"pict" + bytes(12))
    parts += _full(b"pitm", struct.pack(">H", 1))
    parts += _full(b"iinf", items_body)
    ipco = _box(b"ipco", _ispe(320, 200))
    ipma = _full(
        b"ipma",
        struct.pack(">I", 1) + struct.pack(">H", 1) + bytes([1, 1]),
    )
    blob = ftyp + _full(b"meta", parts + _box(b"iprp", ipco + ipma))
    m = heif_lite.parse_meta(blob)
    assert m["codec"] == "av01"
    assert (m["width"], m["height"]) == (320, 200)


def test_media_quarantines_ispe_above_int32():
    """ispe dimensions are raw uint32s; width >= 2^31 must quarantine
    the row via ValueError, not kill the Arrow batch astype('Int32')
    (r14 ADVICE)."""
    blob = _avif(props=[_ispe(2**31, 16)])
    with pytest.raises(ValueError, match="int32"):
        media.real_decode(blob, "image/avif")
