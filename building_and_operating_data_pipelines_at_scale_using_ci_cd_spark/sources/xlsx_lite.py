"""Minimal pure-stdlib XLSX codec (ECMA-376 SpreadsheetML subset).

The container ships no openpyxl/xlrd, which left the S7 excel branch
(reference spark.json:19 enumerates ``excel`` as a fileFormat) as
gated-but-never-executed code. An .xlsx file is a zip of XML parts, and
the subset the dialect needs — one sheet, a header row, string and
numeric cells — is small enough to implement directly:

  - writer emits inline strings (``t="inlineStr"``), so no
    sharedStrings table is needed;
  - reader handles inline strings, shared strings (what openpyxl/pandas
    emit), numbers, and booleans, so files from mainstream producers
    round-trip too.

This is deliberately NOT a general xlsx library: no styles, formulas,
multiple sheets, or dates — the engine treats excel as a small
interchange format (the sink enforces a row cap for the same reason).
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets>
</workbook>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _col_ref(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(value))}</t></is></c>'


def write_xlsx(path: str, columns: list[str], rows: list[tuple]) -> None:
    """Write one sheet with a header row; strings inline, numbers native."""
    body = []
    header = "".join(_cell_xml(f"{_col_ref(i)}1", c) for i, c in enumerate(columns))
    body.append(f'<row r="1">{header}</row>')
    for r, row in enumerate(rows, start=2):
        cells = "".join(_cell_xml(f"{_col_ref(i)}{r}", v) for i, v in enumerate(row))
        body.append(f'<row r="{r}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(body)}</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _RELS)
        z.writestr("xl/workbook.xml", _WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def _cell_value(cell, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        texts = [el.text or "" for el in cell.iter(f"{_NS}t")]
        return "".join(texts)
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return v.text == "1"
    if t == "str":
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_xlsx(path: str, header: bool = True) -> tuple[list[str], list[list]]:
    """Read sheet1 → (column names, row lists). Gaps (sparse cells) are
    filled with None using each cell's A1 reference."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{_NS}si"):
                shared.append("".join(el.text or "" for el in si.iter(f"{_NS}t")))
        sheet_name = next(
            n for n in z.namelist() if re.fullmatch(r"xl/worksheets/sheet1?\.xml", n)
        )
        root = ET.fromstring(z.read(sheet_name))
    raw_rows: list[dict[int, object]] = []
    width = 0
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for i, cell in enumerate(row.iter(f"{_NS}c")):
            ref = cell.get("r", "")
            letters = "".join(ch for ch in ref if ch.isalpha())
            col = 0
            for ch in letters:
                col = col * 26 + (ord(ch) - ord("A") + 1)
            col = col - 1 if letters else i
            cells[col] = _cell_value(cell, shared)
        if cells:
            width = max(width, max(cells) + 1)
        raw_rows.append(cells)
    dense = [[cells.get(i) for i in range(width)] for cells in raw_rows]
    if header and dense:
        cols = [str(c) if c is not None else f"col{i}" for i, c in enumerate(dense[0])]
        return cols, dense[1:]
    return [f"col{i}" for i in range(width)], dense
