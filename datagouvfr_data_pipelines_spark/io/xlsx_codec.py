"""Minimal pure-stdlib XLSX codec (zipfile + ElementTree).

XLSX is a zip of OOXML parts; the subset these pipelines need — stringly
tabular sheets, the engine's defensive-ingest posture — fits in a small
reader/writer with no third-party dependency, which un-gates the Excel
rows (S4/S21) in containers without openpyxl. The writer emits inline
strings only (no sharedStrings table) which every consumer (Excel,
LibreOffice, pandas/openpyxl) reads fine; the reader additionally handles
sharedStrings, inline strings, and plain numeric cells so it can read
files produced by real spreadsheet tools.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_CELL_REF = re.compile(r"([A-Z]+)([0-9]+)")


def _col_index(ref: str) -> int:
    """'A'->0, 'Z'->25, 'AA'->26 ..."""
    n = 0
    for ch in ref:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _col_name(idx: int) -> str:
    name = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        name = chr(65 + rem) + name
    return name


def read_xlsx(content: bytes, sheet: int | str = 0) -> list[list[str]]:
    """Parse one sheet into rows of strings ('' for gaps). ``sheet`` is a
    0-based index or a sheet name."""
    zf = zipfile.ZipFile(io.BytesIO(content))

    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [
        (s.get("name"), s.get(
            "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
        ))
        for s in wb.find("{*}sheets")
    ]
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rel_target = {r.get("Id"): r.get("Target") for r in rels}
    if isinstance(sheet, str):
        matches = [rid for name, rid in sheets if name == sheet]
        if not matches:
            raise KeyError(f"no sheet named {sheet!r}; have {[n for n, _ in sheets]}")
        rid = matches[0]
    else:
        rid = sheets[sheet][1]
    target = rel_target[rid]
    part = "xl/" + target.lstrip("/") if not target.startswith("xl/") else target

    shared: list[str] = []
    if "xl/sharedStrings.xml" in zf.namelist():
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in ss:
            shared.append("".join(t.text or "" for t in si.iter() if t.tag.endswith("}t")))

    rows: list[list[str]] = []
    ws = ET.fromstring(zf.read(part))
    for row in ws.find("{*}sheetData"):
        out: list[str] = []
        for cell in row:
            ref = cell.get("r") or ""
            m = _CELL_REF.match(ref)
            col = _col_index(m.group(1)) if m else len(out)
            while len(out) < col:
                out.append("")
            ctype = cell.get("t", "n")
            if ctype == "inlineStr":
                is_el = cell.find("{*}is")
                val = "".join(
                    t.text or "" for t in (is_el.iter() if is_el is not None else [])
                    if t.tag.endswith("}t")
                )
            else:
                v = cell.find("{*}v")
                raw = v.text if v is not None and v.text is not None else ""
                val = shared[int(raw)] if ctype == "s" and raw != "" else raw
            out.append(val)
        rows.append(out)
    width = max((len(r) for r in rows), default=0)
    return [r + [""] * (width - len(r)) for r in rows]


def write_xlsx(sheets: dict[str, list[list]], path: str) -> None:
    """Write sheets of (stringified) rows as a valid minimal XLSX."""
    names = list(sheets)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
            'package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            f"{overrides}</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            'relationships"><Relationship Id="rId1" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>',
        )
        sheet_decls = "".join(
            f'<sheet name="{escape(n, {chr(34): "&quot;"})}" '
            f'sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, n in enumerate(names)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/'
            'main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
            f'relationships"><sheets>{sheet_decls}</sheets></workbook>',
        )
        sheet_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(len(names))
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/'
            f'relationships">{sheet_rels}</Relationships>',
        )
        for i, name in enumerate(names):
            body = []
            for ri, row in enumerate(sheets[name], start=1):
                cells = "".join(
                    f'<c r="{_col_name(ci)}{ri}" t="inlineStr"><is><t xml:space='
                    f'"preserve">{escape("" if v is None else str(v))}</t></is></c>'
                    for ci, v in enumerate(row)
                )
                body.append(f'<row r="{ri}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/'
                f'2006/main"><sheetData>{"".join(body)}</sheetData></worksheet>',
            )
