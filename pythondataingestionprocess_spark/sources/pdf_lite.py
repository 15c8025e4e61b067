"""Dependency-free PDF text extraction (stdlib zlib + byte parsing).

Narrow by design: enough of ISO 32000 to pull TEXT out of
standard-encoded PDFs — the statement-shaped documents the reference
feeds PyMuPDF (pdf_to_xlsx.py:27-30). Handles content streams stored
raw or FlateDecode-compressed, literal `(…)` strings (escapes, octal,
nesting), hex `<…>` strings, and the text-showing operators
Tj / ' / " / TJ, with Td/TD/T*/ET treated as line breaks (matching
how a line-oriented statement lays out one Td+Tj per row).

NOT handled (out of scope, PyMuPDF territory): CID/Type0 composite
fonts (bytes are glyph ids, not characters — extraction yields
garbage, same as any encoding-unaware extractor), encrypted PDFs,
object streams (/ObjStm), positional reading order (streams are
emitted in file order). ``extract_pdf_text`` therefore PREFERS
PyMuPDF when importable and falls back here, so simple text PDFs
work in this container and full-fidelity returns wherever fitz
exists.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"stream\r?\n(.*?)endstream", re.S)
_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal(buf: bytes, i: int) -> tuple[bytes, int]:
    """Parse a `(...)` literal starting AT the '('; returns (bytes,
    index past the ')')."""
    out = bytearray()
    depth = 1
    i += 1
    n = len(buf)
    while i < n and depth:
        c = buf[i]
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            e = buf[i]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                i += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = bytearray()
                while i < n and len(oct_digits) < 3 and 0x30 <= buf[i] <= 0x37:
                    oct_digits.append(buf[i])
                    i += 1
                out.append(int(oct_digits.decode(), 8) & 0xFF)
            elif e in (0x0A, 0x0D):  # line continuation
                i += 1
                if e == 0x0D and i < n and buf[i] == 0x0A:
                    i += 1
            else:
                out.append(e)
                i += 1
        else:
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if not depth:
                    i += 1
                    break
            out.append(c)
            i += 1
    return bytes(out), i


def _text_from_content(buf: bytes) -> str:
    """Walk a content stream's tokens; emit shown strings, newlines on
    text-positioning operators."""
    out: list[str] = []
    pending: list[bytes] = []
    i, n = 0, len(buf)
    while i < n:
        c = buf[i]
        if c in _WS:
            i += 1
        elif c == 0x25:  # % comment
            j = buf.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c == 0x28:  # ( literal string
            s, i = _parse_literal(buf, i)
            pending.append(s)
        elif c == 0x3C:  # < hex string or << dict
            if i + 1 < n and buf[i + 1] == 0x3C:
                i += 2
            else:
                j = buf.find(b">", i)
                j = n if j < 0 else j
                hexs = re.sub(rb"[^0-9A-Fa-f]", b"", buf[i + 1 : j])
                if len(hexs) % 2:
                    hexs += b"0"
                pending.append(bytes.fromhex(hexs.decode()))
                i = j + 1
        elif c in b"[]{}":
            i += 1
        elif c == 0x2F:  # /Name
            i += 1
            while i < n and buf[i] not in _WS and buf[i] not in _DELIM:
                i += 1
        else:  # operator or number token
            j = i
            while j < n and buf[j] not in _WS and buf[j] not in _DELIM:
                j += 1
            tok = buf[i:j]
            i = j if j > i else i + 1
            if tok in (b"Tj", b"'", b'"', b"TJ"):
                out.append("".join(s.decode("latin-1") for s in pending))
                pending = []
            elif tok in (b"Td", b"TD", b"T*", b"ET"):
                out.append("\n")
                pending = []
            elif tok and not re.fullmatch(rb"[-+.0-9]+", tok):
                pending = []  # strings consumed by a non-showing op
    return "".join(out)


def extract_text(data: bytes) -> str:
    """All text from a PDF's content streams, in file order."""
    pages: list[str] = []
    for m in _STREAM_RE.finditer(data):
        raw = m.group(1)
        try:
            payload = zlib.decompress(raw)
        except zlib.error:
            payload = raw
        if b"BT" in payload and (
            b"Tj" in payload or b"TJ" in payload or b"'" in payload
        ):
            pages.append(_text_from_content(payload))
    return "\n".join(pages)
