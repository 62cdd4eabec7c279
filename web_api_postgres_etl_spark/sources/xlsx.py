"""S8 input parity — minimal xlsx (SpreadsheetML) reader, stdlib-only.

The reference ships its Jalali date dimension as an xlsx artifact
(full-dimdate-pb.xlsx, consumed by Power BI). This container has no
openpyxl/pandas-excel, but xlsx is just a zip of XML: workbook.xml
names the sheets, workbook.xml.rels maps them to worksheet parts,
sharedStrings.xml interns string cells. This reader parses that —
enough to load the reference artifact and prove the GENERATED dimension
(sources.dim_date) equals it row-for-row (tests/test_xlsx_dim.py).

Driver-side by design: a date dimension is tiny (~40k rows). For a
large xlsx the right move is convert-to-parquet once, not a
distributed xlsx codec.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame, SparkSession

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_R = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)


def _col_index(cell_ref: str) -> int:
    """'E4' → 4 (0-based column index) — rows can be sparse, cells
    carry their own column letters."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _sheet_part(z: zipfile.ZipFile, sheet: str | None) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    targets = {
        rel.get("Id"): rel.get("Target")
        for rel in rels
        if rel.get("Target", "").startswith("worksheets/")
    }
    sheets = wb.find(_M + "sheets")
    chosen = None
    for s in sheets:
        if sheet is None or s.get("name") == sheet:
            chosen = s
            if sheet is not None:
                break
            break  # no name given: first sheet
    if chosen is None:
        names = [s.get("name") for s in sheets]
        raise ValueError(f"sheet {sheet!r} not found; workbook has {names}")
    return "xl/" + targets[chosen.get(_R + "id")]


def read_xlsx_rows(
    path: str, sheet: str | None = None
) -> tuple[list[str], list[list[str | None]]]:
    """(headers, rows) — every cell as its display string (numbers keep
    their literal form; the caller casts). First row = headers."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(_M + "t")) for si in root
            ]
        sheet_xml = ET.fromstring(z.read(_sheet_part(z, sheet)))
        data = sheet_xml.find(_M + "sheetData")
        out: list[list[str | None]] = []
        width = 0
        for row in data:
            cells: dict[int, str | None] = {}
            for c in row:
                ref = c.get("r")
                idx = _col_index(ref) if ref else len(cells)
                ctype = c.get("t")
                if ctype == "inlineStr":
                    is_el = c.find(_M + "is")
                    val = (
                        "".join(t.text or "" for t in is_el.iter(_M + "t"))
                        if is_el is not None
                        else None
                    )
                else:
                    v = c.find(_M + "v")
                    if v is None:
                        val = None
                    elif ctype == "s":
                        val = shared[int(v.text)]
                    else:
                        val = v.text
                cells[idx] = val
            width = max(width, max(cells, default=-1) + 1)
            out.append(cells)
    dense = [
        [r.get(i) for i in range(width)] for r in out
    ]
    headers = [h if h is not None else f"_c{i}" for i, h in enumerate(dense[0])]
    # de-duplicate repeated header names positionally (the reference
    # artifact has 'Miladi' twice)
    seen: dict[str, int] = {}
    uniq = []
    for h in headers:
        n = seen.get(h, 0)
        seen[h] = n + 1
        uniq.append(h if n == 0 else f"{h}_{n}")
    return uniq, dense[1:]


def read_xlsx(
    spark: SparkSession, path: str, sheet: str | None = None
) -> DataFrame:
    """xlsx sheet → DataFrame of strings (header row = column names)."""
    headers, rows = read_xlsx_rows(path, sheet)
    schema = ", ".join(f"`{h}` string" for h in headers)
    return spark.createDataFrame(rows, schema)
