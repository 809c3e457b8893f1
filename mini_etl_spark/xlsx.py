"""Minimal pure-stdlib XLSX codec — un-gates the Excel source/sink.

The reference reads/writes Excel through pandas+openpyxl
(``mini_etl/components/extractors.py:151-220``, ``loaders.py:381-450``);
this environment has no Excel engine, so the reference's surface would stay
NotImplementedError-gated forever. XLSX is just a ZIP of small XML parts
(ECMA-376 / ISO 29500 SpreadsheetML, a public standard), so a dependency-free
codec covering the ETL-relevant subset is ~200 lines:

- **write**: one sheet per call, header row + rows; numbers / booleans /
  strings (inline, so no sharedStrings part) / None / datetimes (written as
  ISO-8601 text — lossless and engine-agnostic, no 1900-epoch serials).
- **read**: any sheet by index or name; inline strings, sharedStrings
  (files produced by openpyxl/Excel use them), numbers (int when integral),
  booleans, blanks; first row is the header, missing cells are None.

Excel is inherently a driver-local, small-data format (the reference fully
buffered too) — this codec is deliberately not distributed; the Spark side
hands it a pandas frame. Scale guidance: anything large goes to parquet.
"""

from __future__ import annotations

import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import pandas as pd

__all__ = ["read_xlsx", "write_xlsx"]

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_letter(idx: int) -> str:
    """0-based column index → A1-style letters."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _col_index(letters: str) -> int:
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------

_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value: Any) -> str:
    if value is None or (isinstance(value, float) and value != value):  # NaN
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    if isinstance(value, pd.Timestamp):
        value = value.isoformat(sep=" ")
    text = escape(str(value))
    space = ' xml:space="preserve"' if text != text.strip() else ""
    return f'<c r="{ref}" t="inlineStr"><is><t{space}>{text}</t></is></c>'


def write_xlsx(pdf: pd.DataFrame, path: str, sheet_name: str = "Sheet1") -> None:
    """Write a pandas frame as a single-sheet .xlsx (header + data rows)."""
    rows_xml: list[str] = []
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(pdf.columns)
    )
    rows_xml.append(f'<row r="1">{header}</row>')
    for i, row in enumerate(pdf.itertuples(index=False, name=None), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v) for j, v in enumerate(row)
        )
        rows_xml.append(f'<row r="{i}">{cells}</row>')
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{''.join(rows_xml)}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES)
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", _WORKBOOK_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)


# ---------------------------------------------------------------------------
# Reader
# ---------------------------------------------------------------------------

def _sheet_part(zf: zipfile.ZipFile, sheet_name: Any) -> str:
    """Resolve a sheet index/name to its worksheet part path via the
    workbook + its relationships (sheet order in workbook.xml is the
    user-visible order; rIds map to physical parts)."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{_REL_NS}Relationship")
    }
    r_attr = (
        "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
    )
    sheets = [
        (s.get("name"), rid_to_target[s.get(r_attr)])
        for s in wb.iter(f"{_NS}sheet")
    ]
    if isinstance(sheet_name, int):
        if sheet_name >= len(sheets):
            raise ValueError(f"read_xlsx: no sheet index {sheet_name}")
        target = sheets[sheet_name][1]
    else:
        matches = [t for n, t in sheets if n == sheet_name]
        if not matches:
            raise ValueError(
                f"read_xlsx: no sheet named {sheet_name!r} "
                f"(has {[n for n, _ in sheets]})"
            )
        target = matches[0]
    return target if target.startswith("xl/") else f"xl/{target}"


def _cell_value(cell: ET.Element, shared: list[str]) -> Any:
    t = cell.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in cell.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t == "str":  # cached formula result
        return v.text
    num = float(v.text)
    return int(num) if num.is_integer() and abs(num) < 2**53 else num


def read_xlsx(path: str, sheet_name: Any = 0) -> pd.DataFrame:
    """Read one sheet of a .xlsx into pandas; first row is the header."""
    with zipfile.ZipFile(path) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(el.text or "" for el in si.iter(f"{_NS}t"))
                for si in root.iter(f"{_NS}si")
            ]
        sheet = ET.fromstring(zf.read(_sheet_part(zf, sheet_name)))
        grid: dict[int, dict[int, Any]] = {}
        max_col = -1
        for row in sheet.iter(f"{_NS}row"):
            r_idx = int(row.get("r", len(grid) + 1)) - 1
            for cell in row.iter(f"{_NS}c"):
                ref = cell.get("r")
                if ref:
                    m = _CELL_REF.match(ref)
                    c_idx = _col_index(m.group(1))
                else:  # ref-less cells are sequential
                    c_idx = len(grid.get(r_idx, {}))
                val = _cell_value(cell, shared)
                if val is not None:
                    grid.setdefault(r_idx, {})[c_idx] = val
                    max_col = max(max_col, c_idx)
    if not grid:
        return pd.DataFrame()
    header_row = grid.get(min(grid), {})
    columns = [
        str(header_row.get(c, f"Unnamed: {c}")) for c in range(max_col + 1)
    ]
    data_rows = sorted(k for k in grid if k != min(grid))
    data = [
        [grid[r].get(c) for c in range(max_col + 1)] for r in data_rows
    ]
    return pd.DataFrame(data, columns=columns)
