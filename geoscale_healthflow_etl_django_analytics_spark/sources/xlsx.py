"""S2 — pure-stdlib .xlsx parser (no openpyxl in this container).

An .xlsx file is a ZIP of XML parts (ECMA-376 / ISO 29500, public
spec): ``xl/workbook.xml`` lists sheets, ``xl/_rels/workbook.xml.rels``
maps them to worksheet parts, ``xl/sharedStrings.xml`` interns string
cells, and each ``xl/worksheets/sheetN.xml`` holds ``<row><c r="A1"
t="s"><v>...`` cells. This module parses exactly that subset —
enough to replay the reference's upload path
(health_center_lab__data_upload_views.py:72-73, pd.read_excel), which
reads header-row spreadsheets of scalar cells.

Scale stance: one uploaded workbook parses at the driver (bounded,
same as the reference's HTTP upload). A LAKE of workbooks parses
distributed via :func:`read_excel_many` — ``binaryFile`` scan +
``mapInPandas``, one Python worker per file batch, so 10^6 small
.xlsx files never serialize through the driver.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 (base-26 letters of the cell ref)."""
    m = _CELL_REF.match(ref)
    idx = 0
    for ch in (m.group(1) if m else "A"):
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    if "xl/sharedStrings.xml" not in zf.namelist():
        return []
    root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    out = []
    for si in root.findall("{*}si"):
        # plain <t> or rich-text runs <r><t>; concatenate all <t> text
        out.append("".join(t.text or "" for t in si.iter() if t.tag.endswith("}t")))
    return out


def _first_sheet_part(zf: zipfile.ZipFile) -> str:
    """Resolve the first sheet in workbook order via the rels part."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = wb.find("{*}sheets")
    first = sheets[0] if sheets is not None and len(sheets) else None
    rid = None
    if first is not None:
        for k, v in first.attrib.items():
            if k.endswith("}id"):
                rid = v
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    for rel in rels:
        if rid is None or rel.get("Id") == rid:
            target = rel.get("Target", "worksheets/sheet1.xml")
            return target if target.startswith("xl/") else f"xl/{target}"
    return "xl/worksheets/sheet1.xml"


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(
            t_el.text or "" for t_el in c.iter() if t_el.tag.endswith("}t")
        )
    v = c.find("{*}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    try:
        return float(v.text)
    except ValueError:
        return v.text


_WB_XML = (
    '<?xml version="1.0"?>'
    '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
    '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
)

_RELS_XML = (
    '<?xml version="1.0"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" '
    'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
    'Target="worksheets/sheet1.xml"/></Relationships>'
)


def _col_letter(i: int) -> str:
    out = ""
    i += 1
    while i:
        i, rem = divmod(i - 1, 26)
        out = chr(65 + rem) + out
    return out


def write_xlsx_bytes(header: list[str], rows: list[list]) -> bytes:
    """Inverse of :func:`parse_xlsx_bytes` — a minimal ECMA-376 writer
    (workbook + rels + sharedStrings + one worksheet). Used to
    round-trip the parser and to generate deterministic upload
    fixtures for the registered S2 end-to-end query; None cells are
    omitted, bools/numbers/strings use the standard cell types."""
    strings: list[str] = []

    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r + 1}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        if v not in strings:
            strings.append(v)
        return f'<c r="{ref}" t="s"><v>{strings.index(v)}</v></c>'

    from xml.sax.saxutils import escape

    body_rows = []
    for ri, row in enumerate([list(header)] + [list(r) for r in rows]):
        cells = "".join(cell(ri, ci, v) for ci, v in enumerate(row))
        body_rows.append(f'<row r="{ri + 1}">{cells}</row>')
    sheet = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body_rows)}</sheetData></worksheet>"
    )
    # shared strings hold ALL text cell content, so escaping here
    # covers every user value ('&', '<' would otherwise produce sst
    # XML that ElementTree rejects on round-trip)
    sst = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        + "".join(f"<si><t>{escape(s)}</t></si>" for s in strings)
        + "</sst>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("xl/workbook.xml", _WB_XML)
        zf.writestr("xl/_rels/workbook.xml.rels", _RELS_XML)
        zf.writestr("xl/sharedStrings.xml", sst)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
    return buf.getvalue()


def parse_xlsx_bytes(data: bytes) -> tuple[list[str], list[list]]:
    """(header, data_rows) from .xlsx bytes. Header = first row as
    strings; numeric cells become float (pandas-read_excel-like),
    shared/inline strings str, booleans bool, absent cells None."""
    zf = zipfile.ZipFile(io.BytesIO(data))
    shared = _shared_strings(zf)
    sheet = ET.fromstring(zf.read(_first_sheet_part(zf)))
    raw_rows: list[dict[int, object]] = []
    for row in sheet.iter():
        if not row.tag.endswith("}row"):
            continue
        cells: dict[int, object] = {}
        for c in row.findall("{*}c"):
            cells[_col_index(c.get("r", "A1"))] = _cell_value(c, shared)
        raw_rows.append(cells)
    if not raw_rows:
        return [], []
    width = max(max(r, default=-1) for r in raw_rows) + 1
    dense = [[r.get(i) for i in range(width)] for r in raw_rows]
    header = ["" if v is None else str(v) for v in dense[0]]
    return header, dense[1:]
