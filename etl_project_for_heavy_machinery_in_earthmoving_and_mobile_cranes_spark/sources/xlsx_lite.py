"""Minimal stdlib xlsx reader (zipfile + ElementTree) — fallback for
the S1/S2 ingestion edge when openpyxl isn't installed.

Handles the cell types that occur in customs extracts: inline strings,
shared strings, and numbers.  Driver-side by design: xlsx inputs are
small batch extracts (10³ rows); bulk data arrives as Parquet/CSV.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
_COL_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A'→0, 'AA'→26 …"""
    letters = _COL_RE.match(ref).group(1)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def read_xlsx_rows(path: str, sheet: int = 1) -> list[list]:
    """Return the sheet as a list of rows (list of cell values; None for
    empty).  Numbers come back as float/int, strings as str."""
    z = zipfile.ZipFile(path)
    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        root = ET.parse(z.open("xl/sharedStrings.xml")).getroot()
        for si in root.findall("m:si", _NS):
            shared.append("".join(t.text or "" for t in si.findall(".//m:t", _NS)))

    root = ET.parse(z.open(f"xl/worksheets/sheet{sheet}.xml")).getroot()
    out: list[list] = []
    width = 0
    for row in root.findall(".//m:sheetData/m:row", _NS):
        cells: dict[int, object] = {}
        for c in row.findall("m:c", _NS):
            ref = c.get("r")
            i = _col_index(ref) if ref else len(cells)
            t = c.get("t", "n")
            if t == "inlineStr":
                el = c.find("m:is", _NS)
                v = "".join(x.text or "" for x in el.findall(".//m:t", _NS)) if el is not None else None
                v = v if v != "" else None
            else:
                vel = c.find("m:v", _NS)
                raw = vel.text if vel is not None else None
                if raw is None:
                    v = None
                elif t == "s":
                    v = shared[int(raw)]
                elif t == "str":
                    v = raw
                elif t == "b":
                    v = raw == "1"
                else:  # numeric
                    f = float(raw)
                    v = int(f) if f.is_integer() and abs(f) < 2**53 else f
            cells[i] = v
            width = max(width, i + 1)
        out.append([cells.get(i) for i in range(width)])
    # normalize ragged rows to full width
    return [r + [None] * (width - len(r)) for r in out]


def read_xlsx_records(path: str, sheet: int = 1) -> list[dict]:
    """Rows as dicts keyed by the header row."""
    rows = read_xlsx_rows(path, sheet)
    if not rows:
        return []
    header = [str(h) if h is not None else f"col_{i}" for i, h in enumerate(rows[0])]
    return [dict(zip(header, r)) for r in rows[1:]]
