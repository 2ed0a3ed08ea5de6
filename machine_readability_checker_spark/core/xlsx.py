"""Minimal stdlib XLSX (OOXML SpreadsheetML, ECMA-376) reader and writer.

The container has neither openpyxl nor xlrd, so the engine carries its own
zipfile+ElementTree reader for exactly the facets the reference consumes:

- per-sheet cell grids                  (reference ``loader.py:193-201``)
- merged-cell ranges                    (reference ``level1_checker.py:579-583``)
- hidden row/column dimensions          (reference ``level1_checker.py:491-493``)
- font/fill styling flags per cell      (reference ``level1_checker.py:639-668``)
- drawing/object part detection         (reference ``level1_checker.py:82-90``)

The writer exists for the deterministic fixture corpus (FIXTURES.md) and
round-trip tests; it emits only features the reader understands.

A deliberately small, dependency-free reader is also the right call for the
100 TB deployment: the kernel only ships stdlib, and parsing cost stays
bounded by the facets we actually use.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

NS_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
NS_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"

_M = "{%s}" % NS_MAIN
_R = "{%s}" % NS_REL

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _ref_to_rc(ref: str) -> Tuple[int, int]:
    """'B3' -> (row0, col0) zero-based."""
    m = _CELL_REF_RE.match(ref)
    if not m:
        return (0, 0)
    col_s, row_s = m.groups()
    col = 0
    for ch in col_s:
        col = col * 26 + (ord(ch) - ord("A")) + 1
    return (int(row_s) - 1, col - 1)


def _rc_to_ref(row0: int, col0: int) -> str:
    n = col0 + 1
    out = ""
    while n > 0:
        n, r = divmod(n - 1, 26)
        out = chr(65 + r) + out
    return f"{out}{row0 + 1}"


@dataclass
class XlsxSheet:
    name: str
    rows: List[List[Any]] = field(default_factory=list)  # dense grid
    merged: List[Tuple[int, int, int, int]] = field(default_factory=list)
    # merged entries are (r0, c0, r1, c1) zero-based inclusive
    hidden_rows: List[int] = field(default_factory=list)   # zero-based
    hidden_cols: List[int] = field(default_factory=list)   # zero-based
    # (row0, col0, flag) where flag ∈ {bold,italic,underline,font_color,
    #  fill,font_size:<sz>}
    format_flags: List[Tuple[int, int, str]] = field(default_factory=list)


@dataclass
class XlsxWorkbook:
    sheets: List[XlsxSheet] = field(default_factory=list)
    drawing_parts: List[str] = field(default_factory=list)  # part names with anchors

    def sheet_names(self) -> List[str]:
        return [s.name for s in self.sheets]


# --------------------------------------------------------------- reader


def _parse_shared_strings(data: bytes) -> List[str]:
    out: List[str] = []
    root = ET.fromstring(data)
    for si in root.findall(f"{_M}si"):
        text = "".join(t.text or "" for t in si.iter(f"{_M}t"))
        out.append(text)
    return out


def _parse_styles(data: bytes):
    """Return per-cellXf style flags relevant to format-semantics checks."""
    root = ET.fromstring(data)
    fonts = []
    fonts_el = root.find(f"{_M}fonts")
    if fonts_el is not None:
        for f in fonts_el.findall(f"{_M}font"):
            sz_el = f.find(f"{_M}sz")
            color_el = f.find(f"{_M}color")
            fonts.append(
                {
                    "bold": f.find(f"{_M}b") is not None,
                    "italic": f.find(f"{_M}i") is not None,
                    "underline": f.find(f"{_M}u") is not None,
                    "size": float(sz_el.get("val")) if sz_el is not None and sz_el.get("val") else None,
                    "color": (color_el.get("rgb") or "").upper() if color_el is not None else "",
                }
            )
    fills = []
    fills_el = root.find(f"{_M}fills")
    if fills_el is not None:
        for f in fills_el.findall(f"{_M}fill"):
            pf = f.find(f"{_M}patternFill")
            fg = pf.find(f"{_M}fgColor") if pf is not None else None
            fills.append(
                {
                    "pattern": pf.get("patternType") if pf is not None else None,
                    "fg": (fg.get("rgb") or "").upper() if fg is not None else "",
                }
            )
    xfs = []
    xfs_el = root.find(f"{_M}cellXfs")
    if xfs_el is not None:
        for xf in xfs_el.findall(f"{_M}xf"):
            xfs.append(
                {
                    "font": int(xf.get("fontId") or 0),
                    "fill": int(xf.get("fillId") or 0),
                }
            )
    return fonts, fills, xfs


def _style_flags(xf_idx, fonts, fills, xfs) -> List[str]:
    """Flags matching the reference's per-cell decoration rules
    (fill outside {none,white,black}, non-black font color, bold, italic,
    underline, size outside [9,13])."""
    flags: List[str] = []
    if xf_idx is None or xf_idx >= len(xfs):
        return flags
    xf = xfs[xf_idx]
    fill = fills[xf["fill"]] if xf["fill"] < len(fills) else None
    if fill and fill["pattern"] not in (None, "none"):
        if fill["fg"] not in ("", "00000000", "FFFFFFFF", "FF000000"):
            flags.append("fill")
    font = fonts[xf["font"]] if xf["font"] < len(fonts) else None
    if font:
        if font["color"] not in ("", "00000000", "FF000000"):
            flags.append("font_color")
        if font["bold"]:
            flags.append("bold")
        if font["italic"]:
            flags.append("italic")
        if font["underline"]:
            flags.append("underline")
        if font["size"] is not None and (font["size"] < 9 or font["size"] > 13):
            flags.append(f"font_size:{font['size']:g}")
    return flags


def _parse_cell_value(c: ET.Element, shared: List[str]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_M}is")
        if is_el is None:
            return None
        return "".join(x.text or "" for x in is_el.iter(f"{_M}t"))
    v_el = c.find(f"{_M}v")
    if v_el is None or v_el.text is None:
        return None
    raw = v_el.text
    if t == "s":
        idx = int(raw)
        return shared[idx] if 0 <= idx < len(shared) else None
    if t == "str":
        return raw
    if t == "b":
        return bool(int(raw))
    # numeric
    if any(ch in raw for ch in ".eE"):
        try:
            return float(raw)
        except ValueError:
            return raw
    try:
        return int(raw)
    except ValueError:
        return raw


def read_xlsx(content: bytes) -> XlsxWorkbook:
    """Parse xlsx bytes into grids + side-channel metadata."""
    wb = XlsxWorkbook()
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = set(z.namelist())
        shared: List[str] = []
        if "xl/sharedStrings.xml" in names:
            shared = _parse_shared_strings(z.read("xl/sharedStrings.xml"))
        fonts: list = []
        fills: list = []
        xfs: list = []
        if "xl/styles.xml" in names:
            fonts, fills, xfs = _parse_styles(z.read("xl/styles.xml"))

        # sheet name -> target part, in workbook order
        sheet_targets: List[Tuple[str, str]] = []
        if "xl/workbook.xml" in names:
            wb_root = ET.fromstring(z.read("xl/workbook.xml"))
            rels: Dict[str, str] = {}
            if "xl/_rels/workbook.xml.rels" in names:
                rel_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
                for rel in rel_root.iter(f"{{{NS_PKGREL}}}Relationship"):
                    tgt = rel.get("Target") or ""
                    if tgt.startswith("/"):
                        tgt = tgt[1:]
                    elif not tgt.startswith("xl/"):
                        tgt = "xl/" + tgt
                    rels[rel.get("Id") or ""] = tgt
            sheets_el = wb_root.find(f"{_M}sheets")
            if sheets_el is not None:
                for i, sh in enumerate(sheets_el.findall(f"{_M}sheet")):
                    rid = sh.get(f"{_R}id") or ""
                    target = rels.get(rid, f"xl/worksheets/sheet{i + 1}.xml")
                    sheet_targets.append((sh.get("name") or f"Sheet{i + 1}", target))
        else:  # degenerate package: fall back to lexicographic sheet parts
            parts = sorted(n for n in names if n.startswith("xl/worksheets/"))
            sheet_targets = [(f"Sheet{i + 1}", p) for i, p in enumerate(parts)]

        for sheet_name, target in sheet_targets:
            sheet = XlsxSheet(name=sheet_name)
            if target not in names:
                wb.sheets.append(sheet)
                continue
            root = ET.fromstring(z.read(target))

            cols_el = root.find(f"{_M}cols")
            if cols_el is not None:
                for col in cols_el.findall(f"{_M}col"):
                    if col.get("hidden") in ("1", "true"):
                        lo = int(col.get("min") or 1) - 1
                        hi = int(col.get("max") or lo + 1) - 1
                        sheet.hidden_cols.extend(range(lo, hi + 1))

            cells: Dict[Tuple[int, int], Any] = {}
            max_r = -1
            max_c = -1
            data_el = root.find(f"{_M}sheetData")
            if data_el is not None:
                implicit_r = 0
                for row_el in data_el.findall(f"{_M}row"):
                    r = int(row_el.get("r")) - 1 if row_el.get("r") else implicit_r
                    implicit_r = r + 1
                    if row_el.get("hidden") in ("1", "true"):
                        sheet.hidden_rows.append(r)
                    implicit_c = 0
                    for c_el in row_el.findall(f"{_M}c"):
                        ref = c_el.get("r")
                        if ref:
                            rr, cc = _ref_to_rc(ref)
                        else:
                            rr, cc = r, implicit_c
                        implicit_c = cc + 1
                        val = _parse_cell_value(c_el, shared)
                        if val is not None:
                            cells[(rr, cc)] = val
                            max_r = max(max_r, rr)
                            max_c = max(max_c, cc)
                        s_attr = c_el.get("s")
                        if s_attr is not None:
                            for flag in _style_flags(int(s_attr), fonts, fills, xfs):
                                sheet.format_flags.append((rr, cc, flag))

            if max_r >= 0:
                grid: List[List[Any]] = [
                    [None] * (max_c + 1) for _ in range(max_r + 1)
                ]
                for (rr, cc), val in cells.items():
                    grid[rr][cc] = val
                sheet.rows = grid

            merge_el = root.find(f"{_M}mergeCells")
            if merge_el is not None:
                for mc in merge_el.findall(f"{_M}mergeCell"):
                    ref = mc.get("ref") or ""
                    if ":" in ref:
                        a, b = ref.split(":", 1)
                        r0, c0 = _ref_to_rc(a)
                        r1, c1 = _ref_to_rc(b)
                        sheet.merged.append((r0, c0, r1, c1))

            wb.sheets.append(sheet)

        # drawing/object detection — same anchor markers the reference greps
        for name in sorted(names):
            if name.startswith("xl/drawings/") and name.endswith(".xml"):
                xml = z.read(name)
                if b"<xdr:twoCellAnchor" in xml or b"<xdr:oneCellAnchor" in xml:
                    wb.drawing_parts.append(name)

    return wb


# --------------------------------------------------------------- writer


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


def write_xlsx(
    sheets: List[Dict[str, Any]],
    with_drawing: bool = False,
) -> bytes:
    """Serialize sheets into a minimal xlsx package.

    Each sheet dict: ``{"name": str, "rows": [[cell,...],...],
    "merged": [(r0,c0,r1,c1)], "hidden_rows": [...], "hidden_cols": [...],
    "styled": [(r0,c0,style_name)]}`` where style_name ∈
    {bold, italic, underline, red_font, yellow_fill, tiny, huge}.
    """
    style_order = ["bold", "italic", "underline", "red_font", "yellow_fill", "tiny", "huge"]
    style_to_xf = {name: i + 1 for i, name in enumerate(style_order)}

    fonts_xml = (
        '<font><sz val="11"/><name val="Calibri"/></font>'          # 0 default
        '<font><b/><sz val="11"/><name val="Calibri"/></font>'      # 1 bold
        '<font><i/><sz val="11"/><name val="Calibri"/></font>'      # 2 italic
        '<font><u/><sz val="11"/><name val="Calibri"/></font>'      # 3 underline
        '<font><sz val="11"/><color rgb="FFFF0000"/><name val="Calibri"/></font>'  # 4 red
        '<font><sz val="8"/><name val="Calibri"/></font>'           # 5 tiny
        '<font><sz val="14"/><name val="Calibri"/></font>'          # 6 huge
    )
    fills_xml = (
        '<fill><patternFill patternType="none"/></fill>'            # 0
        '<fill><patternFill patternType="gray125"/></fill>'         # 1
        '<fill><patternFill patternType="solid"><fgColor rgb="FFFFFF00"/>'
        "<bgColor indexed=\"64\"/></patternFill></fill>"            # 2 yellow
    )
    font_for_style = {
        "bold": 1, "italic": 2, "underline": 3, "red_font": 4,
        "yellow_fill": 0, "tiny": 5, "huge": 6,
    }
    fill_for_style = {s: (2 if s == "yellow_fill" else 0) for s in style_order}
    xfs_xml = '<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>'
    for s in style_order:
        xfs_xml += (
            f'<xf numFmtId="0" fontId="{font_for_style[s]}" '
            f'fillId="{fill_for_style[s]}" borderId="0" applyFont="1" applyFill="1"/>'
        )
    styles = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<styleSheet xmlns="{NS_MAIN}">'
        f'<fonts count="7">{fonts_xml}</fonts>'
        f'<fills count="3">{fills_xml}</fills>'
        '<borders count="1"><border/></borders>'
        '<cellStyleXfs count="1"><xf/></cellStyleXfs>'
        f'<cellXfs count="{1 + len(style_order)}">{xfs_xml}</cellXfs>'
        "</styleSheet>"
    )

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as _zf:

        class _FixedClockZip:
            """Bare writestr stamps entries with wall-clock time at
            2-second DOS granularity — two same-seed corpora generated
            across a boundary then differ byte-for-byte (the
            test_generator_determinism flake).  Pin every entry."""

            def writestr(self, name: str, data) -> None:
                zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
                zi.compress_type = zipfile.ZIP_DEFLATED
                _zf.writestr(zi, data)

        z = _FixedClockZip()
        n = len(sheets)
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.'
            'spreadsheetml.worksheet+xml"/>'
            for i in range(n)
        )
        drawing_override = (
            '<Override PartName="/xl/drawings/drawing1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.drawing+xml"/>'
            if with_drawing
            else ""
        )
        z.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-'
            'package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            '<Override PartName="/xl/styles.xml" ContentType="application/vnd.'
            'openxmlformats-officedocument.spreadsheetml.styles+xml"/>'
            f"{overrides}{drawing_override}</Types>",
        )
        z.writestr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{NS_PKGREL}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        sheets_xml = "".join(
            f'<sheet name="{_esc(s["name"])}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, s in enumerate(sheets)
        )
        z.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{NS_MAIN}" xmlns:r="{NS_REL}">'
            f"<sheets>{sheets_xml}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        rels += (
            f'<Relationship Id="rId{n + 1}" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        )
        z.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{NS_PKGREL}">{rels}</Relationships>',
        )
        z.writestr("xl/styles.xml", styles)

        for i, s in enumerate(sheets):
            styled = {(r, c): st for (r, c, st) in s.get("styled", [])}
            hidden_rows = set(s.get("hidden_rows", []))
            hidden_cols = sorted(set(s.get("hidden_cols", [])))
            rows_xml = []
            for r, row in enumerate(s["rows"]):
                cells_xml = []
                for c, val in enumerate(row):
                    if val is None and (r, c) not in styled:
                        continue
                    ref = _rc_to_ref(r, c)
                    s_attr = (
                        f' s="{style_to_xf[styled[(r, c)]]}"' if (r, c) in styled else ""
                    )
                    if val is None:
                        cells_xml.append(f'<c r="{ref}"{s_attr}/>')
                    elif isinstance(val, bool):
                        cells_xml.append(f'<c r="{ref}" t="b"{s_attr}><v>{int(val)}</v></c>')
                    elif isinstance(val, (int, float)):
                        cells_xml.append(f'<c r="{ref}"{s_attr}><v>{val!r}</v></c>')
                    else:
                        cells_xml.append(
                            f'<c r="{ref}" t="inlineStr"{s_attr}>'
                            f"<is><t xml:space=\"preserve\">{_esc(str(val))}</t></is></c>"
                        )
                h = ' hidden="1"' if r in hidden_rows else ""
                rows_xml.append(f'<row r="{r + 1}"{h}>{"".join(cells_xml)}</row>')
            cols_xml = ""
            if hidden_cols:
                cols_xml = "<cols>" + "".join(
                    f'<col min="{c + 1}" max="{c + 1}" hidden="1"/>' for c in hidden_cols
                ) + "</cols>"
            merges = s.get("merged", [])
            merge_xml = ""
            if merges:
                merge_xml = f'<mergeCells count="{len(merges)}">' + "".join(
                    f'<mergeCell ref="{_rc_to_ref(r0, c0)}:{_rc_to_ref(r1, c1)}"/>'
                    for (r0, c0, r1, c1) in merges
                ) + "</mergeCells>"
            z.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{NS_MAIN}">{cols_xml}'
                f'<sheetData>{"".join(rows_xml)}</sheetData>{merge_xml}</worksheet>',
            )

        if with_drawing:
            z.writestr(
                "xl/drawings/drawing1.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<xdr:wsDr xmlns:xdr="http://schemas.openxmlformats.org/'
                'drawingml/2006/spreadsheetDrawing" xmlns:a="http://schemas.'
                'openxmlformats.org/drawingml/2006/main">'
                "<xdr:twoCellAnchor><xdr:from><xdr:col>1</xdr:col><xdr:colOff>0"
                "</xdr:colOff><xdr:row>1</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:from>"
                "<xdr:to><xdr:col>3</xdr:col><xdr:colOff>0</xdr:colOff><xdr:row>3"
                "</xdr:row><xdr:rowOff>0</xdr:rowOff></xdr:to>"
                "<xdr:sp><xdr:txBody><a:p><a:r><a:t>shape</a:t></a:r></a:p>"
                "</xdr:txBody></xdr:sp><xdr:clientData/></xdr:twoCellAnchor></xdr:wsDr>",
            )

    return buf.getvalue()
