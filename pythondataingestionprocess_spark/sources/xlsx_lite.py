"""Dependency-free .xlsx codec (stdlib zipfile + ElementTree).

The container ships no openpyxl, which kept the workbook source/sink
(SURVEY S2/S3/S7) import-gated through round 5 — but XLSX is only a
ZIP of small XML parts, and the subset the reference exercises
(pandas/openpyxl reads at import_files_to_postgre.py:245-261: cell
values, sheet names, hyperlink targets; two-sheet writes at
pdf_to_xlsx.py:126-128) needs no library at all. This module
implements exactly that subset:

READ: sheet name → cell grid (as strings, matching the engine's
schema-on-read string contract) + per-cell hyperlink targets.
Handles shared strings (plain and rich-text runs), inline strings,
numbers, booleans, sparse rows/cells, and per-sheet relationship
files for external hyperlink targets.

WRITE: multi-sheet workbooks with inline strings / numeric cells and
optional external hyperlinks — enough for the statement sink's
two-sheet output and for generating test fixtures.

Driver-side by design, like the openpyxl path it replaces: workbooks
are small (SURVEY's S2 shape is many small files); at volume, wrap
``read_sheets`` in a ``binaryFile`` + ``mapInPandas`` decode exactly
like the multimodal plumbing. NOT implemented (out of the reference's
footprint): styles/number formats (dates arrive as raw serial
strings — F18 ``excel_serial_to_date`` handles them downstream),
formula evaluation (the cached <v> value is read, matching
``data_only=True``), merged cells, charts.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape, quoteattr

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _col_index(ref: str) -> int:
    """'A'→0, 'Z'→25, 'AA'→26 …"""
    m = _CELL_REF.match(ref)
    letters = m.group(1) if m else ref
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _col_letters(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _text_of(el) -> str:
    """Concatenated <t> text under a shared-string / inline-string
    item (plain <si><t> or rich-text <si><r><t> runs)."""
    return "".join(
        t.text or "" for t in el.iter() if _local(t.tag) == "t"
    )


def read_sheets(path: str) -> dict[str, dict]:
    """Parse every worksheet: name → {"rows": [[str|None, ...], ...],
    "hyperlinks": {(row0, col0): url}} with row0/col0 0-based over the
    returned grid (header row included at index 0)."""
    out: dict[str, dict] = {}
    with zipfile.ZipFile(path) as z:
        # workbook sheet list: name + relationship id
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = []  # (name, rId)
        for el in wb.iter():
            if _local(el.tag) == "sheet":
                rid = next(
                    v for k, v in el.attrib.items() if _local(k) == "id"
                )
                sheets.append((el.attrib["name"], rid))
        # workbook rels: rId -> worksheet part path
        wb_rels = {
            r.attrib["Id"]: r.attrib["Target"]
            for r in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")).iter()
            if _local(r.tag) == "Relationship"
        }
        # shared strings (optional part)
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                _text_of(si) for si in sst.iter() if _local(si.tag) == "si"
            ]

        for name, rid in sheets:
            target = wb_rels[rid]
            part = target if target.startswith("xl/") else f"xl/{target}"
            ws = ET.fromstring(z.read(part))
            # sheet rels (hyperlink targets live here, not inline)
            rels_part = part.replace("worksheets/", "worksheets/_rels/") + ".rels"
            sheet_rels: dict[str, str] = {}
            if rels_part in z.namelist():
                sheet_rels = {
                    r.attrib["Id"]: r.attrib["Target"]
                    for r in ET.fromstring(z.read(rels_part)).iter()
                    if _local(r.tag) == "Relationship"
                }

            grid: dict[int, dict[int, str]] = {}
            max_col = -1
            # ECMA-376 makes the r attribute OPTIONAL on both <row>
            # and <c> (position = previous + 1) — streaming writers
            # omit it; the old attrib['r'] crashed on such rows and an
            # r-less cell landed at column -1 and silently vanished
            # from the grid (r13 review)
            prev_row = -1
            for row in ws.iter():
                if _local(row.tag) != "row":
                    continue
                r_attr = row.attrib.get("r")
                r_idx = int(r_attr) - 1 if r_attr else prev_row + 1
                prev_row = r_idx
                cells: dict[int, str] = {}
                prev_col = -1
                for c in row:
                    if _local(c.tag) != "c":
                        continue
                    ref = c.attrib.get("r", "")
                    col = _col_index(ref) if ref else prev_col + 1
                    prev_col = col
                    ctype = c.attrib.get("t", "n")
                    value: str | None = None
                    if ctype == "inlineStr":
                        value = _text_of(c)
                    else:
                        v = next(
                            (ch for ch in c if _local(ch.tag) == "v"), None
                        )
                        if v is not None and v.text is not None:
                            value = (
                                shared[int(v.text)]
                                if ctype == "s"
                                else v.text
                            )
                    if value is not None:
                        cells[col] = value
                        max_col = max(max_col, col)
                if cells:
                    grid[r_idx] = cells

            n_rows = (max(grid) + 1) if grid else 0
            rows = [
                [grid.get(r, {}).get(c) for c in range(max_col + 1)]
                for r in range(n_rows)
            ]

            links: dict[tuple[int, int], str] = {}
            for h in ws.iter():
                if _local(h.tag) != "hyperlink":
                    continue
                ref = h.attrib.get("ref", "")
                m = _CELL_REF.match(ref)
                if not m:
                    continue
                pos = (int(m.group(2)) - 1, _col_index(ref))
                rid_attr = next(
                    (v for k, v in h.attrib.items() if _local(k) == "id"),
                    None,
                )
                if rid_attr and rid_attr in sheet_rels:
                    links[pos] = sheet_rels[rid_attr]
                elif "location" in h.attrib:
                    links[pos] = h.attrib["location"]
            out[name] = {"rows": rows, "hyperlinks": links}
    return out


def write_workbook(
    path: str,
    sheets: list[tuple[str, list[list]]],
    hyperlinks: dict[str, dict[tuple[int, int], str]] | None = None,
) -> None:
    """Write a multi-sheet workbook. ``sheets`` = [(name, rows)] with
    rows[0] conventionally the header; cell values: None (skipped),
    int/float (numeric cells), anything else as inline string.
    ``hyperlinks``: sheet name → {(row0, col0): url}, attached as
    EXTERNAL targets on those cells (the S3 side-channel shape)."""
    hyperlinks = hyperlinks or {}
    ct = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>',
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">',
        '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>',
        '<Default Extension="xml" ContentType="application/xml"/>',
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>',
    ]
    for i in range(len(sheets)):
        ct.append(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        )
    ct.append("</Types>")

    root_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )

    # quoteattr, not escape: sax escape() leaves double quotes alone,
    # so a sheet name containing one produced malformed XML that no
    # reader (including read_sheets) could open (r13 review)
    wb_sheets = "".join(
        f'<sheet name={quoteattr(name)} sheetId="{i + 1}" r:id="rId{i + 1}"/>'
        for i, (name, _) in enumerate(sheets)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        + "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(sheets))
        )
        + "</Relationships>"
    )

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "".join(ct))
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (name, rows) in enumerate(sheets):
            links = hyperlinks.get(name, {})
            body = ["<sheetData>"]
            for r, row in enumerate(rows):
                cells = []
                for c, v in enumerate(row):
                    if v is None:
                        continue
                    ref = f"{_col_letters(c)}{r + 1}"
                    if isinstance(v, bool):
                        cells.append(
                            f'<c r="{ref}" t="b"><v>{int(v)}</v></c>'
                        )
                    elif isinstance(v, (int, float)):
                        cells.append(f'<c r="{ref}"><v>{v!r}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                            f"{escape(str(v))}</t></is></c>"
                        )
                if cells:
                    body.append(f'<row r="{r + 1}">{"".join(cells)}</row>')
            body.append("</sheetData>")
            rels = []
            if links:
                body.append("<hyperlinks>")
                for j, ((r, c), url) in enumerate(sorted(links.items())):
                    rid = f"rIdHl{j + 1}"
                    body.append(
                        f'<hyperlink ref="{_col_letters(c)}{r + 1}" r:id="{rid}"/>'
                    )
                    rels.append(
                        f'<Relationship Id="{rid}" '
                        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" '
                        # quoteattr: URLs legally contain double quotes
                        f'Target={quoteattr(url)} TargetMode="External"/>'
                    )
                body.append("</hyperlinks>")
            sheet_xml = (
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
                'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
                + "".join(body)
                + "</worksheet>"
            )
            z.writestr(f"xl/worksheets/sheet{i + 1}.xml", sheet_xml)
            if rels:
                z.writestr(
                    f"xl/worksheets/_rels/sheet{i + 1}.xml.rels",
                    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
                    + "".join(rels)
                    + "</Relationships>",
                )
