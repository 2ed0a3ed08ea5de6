"""Excel Binary Workbook (.xlsb) reader + fixture writer, stdlib-only.

XLSB is the OOXML package layout of xlsx with the XML sheet parts
replaced by BIFF12 binary parts ([MS-XLSB]): every record is a 1-2 byte
7-bit-varint record id + a 1-4 byte 7-bit-varint length + payload.
Excel writes it for very large workbooks because it loads faster than
XML — which is exactly the population a corpus crawl meets it in, so
the grid lane should not quarantine it.

Scope mirrors what the grid checks consume (the same side-channel the
xlsx/xls readers fill): cell values (RK/real/bool/error/inline/shared
strings), sheet names in workbook order via the rels part, merged
ranges, hidden rows (BrtRowHdr.fDyZero) and columns (BrtColInfo
ranges), and per-cell style flags resolved through styles.bin
(fonts/fills/cellXfs) with the SAME flag semantics as the xlsx lane
(``xlsx._style_flags`` is reused, so one rule set governs both
formats).  Drawing parts stay XML inside xlsb packages, so media
detection reuses the xlsx anchor scan unchanged.

Record ids and structure layouts follow the published [MS-XLSB] spec
(§2.1.7.50 record enumeration; §2.4.x per-record layouts; §2.5.122
RkNumber; §2.5.52 BrtColor).  The writer emits the same records so
reader/writer round-trips pin the byte layouts, and hand-built record
tests pin the reader against the spec rather than against the writer.

Reference parity note: the reference repo handles xls/xlsx only
(loader.py extension gate); xlsb extends the same grid lane to the
binary sibling format — new capability, no reference analog.
"""

from __future__ import annotations

import io
import struct
import zipfile
from typing import Any, Dict, Iterator, List, Optional, Tuple

from .xlsx import XlsxSheet, XlsxWorkbook, _style_flags

# ------------------------------------------------- record ids (MS-XLSB)

BRT_ROW_HDR = 0
BRT_CELL_BLANK = 1
BRT_CELL_RK = 2
BRT_CELL_ERROR = 3
BRT_CELL_BOOL = 4
BRT_CELL_REAL = 5
BRT_CELL_ST = 6
BRT_CELL_ISST = 7
BRT_FMLA_STRING = 8
BRT_FMLA_NUM = 9
BRT_FMLA_BOOL = 10
BRT_FMLA_ERROR = 11
BRT_SST_ITEM = 19
BRT_FONT = 43
BRT_FILL = 45
BRT_XF = 47
BRT_COL_INFO = 60
BRT_BEGIN_SHEET = 129
BRT_END_SHEET = 130
BRT_BEGIN_BOOK = 131
BRT_END_BOOK = 132
BRT_BEGIN_BUNDLE_SHS = 143
BRT_END_BUNDLE_SHS = 144
BRT_WS_DIM = 148
BRT_BEGIN_SHEET_DATA = 145
BRT_END_SHEET_DATA = 146
BRT_BUNDLE_SH = 156
BRT_BEGIN_SST = 159
BRT_END_SST = 160
BRT_MERGE_CELL = 176
BRT_BEGIN_MERGE_CELLS = 177
BRT_END_MERGE_CELLS = 178
BRT_BEGIN_STYLE_SHEET = 278
BRT_END_STYLE_SHEET = 279
BRT_BEGIN_FILLS = 603
BRT_END_FILLS = 604
BRT_BEGIN_FONTS = 611
BRT_END_FONTS = 612
BRT_BEGIN_CELL_XFS = 617
BRT_END_CELL_XFS = 618
BRT_BEGIN_CELL_STYLE_XFS = 626
BRT_END_CELL_STYLE_XFS = 627

#: BIFF12 error codes → Excel literals (ST_CellErr mapping)
_ERRORS = {
    0x00: "#NULL!", 0x07: "#DIV/0!", 0x0F: "#VALUE!", 0x17: "#REF!",
    0x1D: "#NAME?", 0x24: "#NUM!", 0x2A: "#N/A",
}

#: decompression cap per part — zip-bomb guard (a 100 MB sheet part is
#: already far beyond any fixture or sane crawl grid)
MAX_PART_BYTES = 100 * 1024 * 1024


# ------------------------------------------------------- record framing


def iter_records(data: bytes) -> Iterator[Tuple[int, bytes]]:
    """(record_id, payload) stream; truncated tails end iteration
    rather than raising (quarantine decisions happen above)."""
    i, n = 0, len(data)
    while i < n:
        b0 = data[i]
        i += 1
        if b0 & 0x80:
            if i >= n:
                return
            b1 = data[i]
            i += 1
            rid = (b0 & 0x7F) | ((b1 & 0x7F) << 7)
        else:
            rid = b0
        size = 0
        shift = 0
        for _ in range(4):
            if i >= n:
                return
            b = data[i]
            i += 1
            size |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if i + size > n:
            return
        yield rid, data[i:i + size]
        i += size


def _rec(rid: int, payload: bytes) -> bytes:
    """Serialize one record (writer side of the same framing)."""
    out = bytearray()
    if rid < 0x80:
        out.append(rid)
    else:
        out.append((rid & 0x7F) | 0x80)
        out.append((rid >> 7) & 0x7F)
    size = len(payload)
    while True:
        b = size & 0x7F
        size >>= 7
        if size:
            out.append(b | 0x80)
        else:
            out.append(b)
            break
    out.extend(payload)
    return bytes(out)


def _wide_str(payload: bytes, off: int) -> Tuple[Optional[str], int]:
    """XLWideString / XLNullableWideString at ``off`` → (text, next)."""
    if off + 4 > len(payload):
        return None, len(payload)
    cch = struct.unpack_from("<I", payload, off)[0]
    off += 4
    if cch == 0xFFFFFFFF:  # nullable: absent
        return None, off
    nbytes = cch * 2
    if off + nbytes > len(payload):
        return None, len(payload)
    return payload[off:off + nbytes].decode("utf-16-le", "replace"), off + nbytes


def _pack_str(s: str) -> bytes:
    enc = s.encode("utf-16-le")
    return struct.pack("<I", len(enc) // 2) + enc


def _rk_value(rk: int) -> Any:
    """RkNumber ([MS-XLSB] 2.5.122): bit0 fX100, bit1 fInt, 30-bit num."""
    f_x100 = rk & 1
    f_int = rk & 2
    if f_int:
        v: Any = rk >> 2
        if v & 0x20000000:  # sign-extend 30 bits
            v -= 0x40000000
    else:
        v = struct.unpack("<d", struct.pack("<Q", (rk & 0xFFFFFFFC) << 32))[0]
    if f_x100:
        v = v / 100
        if isinstance(v, float) and v.is_integer():
            v = int(v)
    return v


def _color_rgb(payload: bytes, off: int) -> str:
    """BrtColor (8 bytes, [MS-XLSB] 2.5.52) → 'AARRGGBB' when the RGB
    is declared valid, else '' (auto/theme — the no-flag default)."""
    if off + 8 > len(payload):
        return ""
    if not (payload[off] & 1):  # fValidRGB
        return ""
    r, g, b, a = payload[off + 4:off + 8]
    return f"{a:02X}{r:02X}{g:02X}{b:02X}"


# -------------------------------------------------------------- reader


def _parse_sst(data: bytes) -> List[str]:
    out: List[str] = []
    for rid, payload in iter_records(data):
        if rid == BRT_SST_ITEM and payload:
            # richStr: flags byte, then the string; rich runs trail
            s, _ = _wide_str(payload, 1)
            out.append(s or "")
    return out


def _parse_styles_bin(data: bytes):
    """fonts/fills/cellXfs in the dict shapes ``xlsx._style_flags``
    consumes — one flag rule set across xlsx and xlsb."""
    fonts: List[dict] = []
    fills: List[dict] = []
    xfs: List[dict] = []
    section = None
    for rid, payload in iter_records(data):
        if rid == BRT_BEGIN_FONTS:
            section = "fonts"
        elif rid == BRT_BEGIN_FILLS:
            section = "fills"
        elif rid == BRT_BEGIN_CELL_XFS:
            section = "cellxfs"
        elif rid == BRT_BEGIN_CELL_STYLE_XFS:
            section = "stylexfs"  # master XFs — not cell-addressable
        elif rid in (BRT_END_FONTS, BRT_END_FILLS, BRT_END_CELL_XFS,
                     BRT_END_CELL_STYLE_XFS):
            section = None
        elif rid == BRT_FONT and section == "fonts" and len(payload) >= 21:
            dy, grbit, bls = struct.unpack_from("<HHH", payload, 0)
            uls = payload[8]
            fonts.append(
                {
                    "bold": bls >= 700,
                    "italic": bool(grbit & 0x0002),
                    "underline": uls != 0,
                    "size": dy / 20 if dy else None,
                    "color": _color_rgb(payload, 12),
                }
            )
        elif rid == BRT_FILL and section == "fills" and len(payload) >= 20:
            fls = struct.unpack_from("<I", payload, 0)[0]
            fills.append(
                {
                    # flag semantics only need none-vs-patterned + fg
                    "pattern": "none" if fls == 0 else f"fls{fls}",
                    "fg": _color_rgb(payload, 4),
                }
            )
        elif rid == BRT_XF and section == "cellxfs" and len(payload) >= 8:
            _, _, ifnt, ifill = struct.unpack_from("<HHHH", payload, 0)
            xfs.append({"font": ifnt, "fill": ifill})
    return fonts, fills, xfs


def _cell_header(payload: bytes) -> Tuple[int, int]:
    """Cell structure prefix ([MS-XLSB] 2.5.9): column (4), iStyleRef
    (24-bit) + flags byte → (col, style_index)."""
    col = struct.unpack_from("<I", payload, 0)[0]
    style = payload[4] | (payload[5] << 8) | (payload[6] << 16)
    return col, style


def _parse_sheet_bin(
    data: bytes, shared: List[str], styles, sheet: XlsxSheet
) -> None:
    fonts, fills, xfs = styles
    cells: Dict[Tuple[int, int], Any] = {}
    max_r = max_c = -1
    row = 0
    for rid, payload in iter_records(data):
        if rid == BRT_ROW_HDR and len(payload) >= 12:
            row = struct.unpack_from("<I", payload, 0)[0]
            if payload[11] & 0x10:  # fDyZero — zero-height = hidden
                sheet.hidden_rows.append(row)
            continue
        if rid == BRT_COL_INFO and len(payload) >= 17:
            c0, c1 = struct.unpack_from("<II", payload, 0)
            if payload[16] & 0x01:  # fHidden
                sheet.hidden_cols.extend(range(c0, min(c1, c0 + 16383) + 1))
            continue
        if rid == BRT_MERGE_CELL and len(payload) >= 16:
            r0, r1, c0, c1 = struct.unpack_from("<IIII", payload, 0)
            sheet.merged.append((r0, c0, r1, c1))
            continue
        if rid not in (
            BRT_CELL_BLANK, BRT_CELL_RK, BRT_CELL_ERROR, BRT_CELL_BOOL,
            BRT_CELL_REAL, BRT_CELL_ST, BRT_CELL_ISST, BRT_FMLA_STRING,
            BRT_FMLA_NUM, BRT_FMLA_BOOL, BRT_FMLA_ERROR,
        ) or len(payload) < 8:
            continue
        col, style = _cell_header(payload)
        val: Any = None
        if rid == BRT_CELL_RK and len(payload) >= 12:
            val = _rk_value(struct.unpack_from("<I", payload, 8)[0])
        elif rid in (BRT_CELL_REAL, BRT_FMLA_NUM) and len(payload) >= 16:
            val = struct.unpack_from("<d", payload, 8)[0]
        elif rid in (BRT_CELL_BOOL, BRT_FMLA_BOOL) and len(payload) >= 9:
            val = bool(payload[8])
        elif rid in (BRT_CELL_ERROR, BRT_FMLA_ERROR) and len(payload) >= 9:
            val = _ERRORS.get(payload[8], "#ERR!")
        elif rid in (BRT_CELL_ST, BRT_FMLA_STRING):
            val, _ = _wide_str(payload, 8)
        elif rid == BRT_CELL_ISST and len(payload) >= 12:
            isst = struct.unpack_from("<I", payload, 8)[0]
            if 0 <= isst < len(shared):
                val = shared[isst]
        if val is not None:
            cells[(row, col)] = val
            max_r = max(max_r, row)
            max_c = max(max_c, col)
        for flag in _style_flags(style, fonts, fills, xfs):
            sheet.format_flags.append((row, col, flag))
    if max_r >= 0:
        grid: List[List[Any]] = [[None] * (max_c + 1) for _ in range(max_r + 1)]
        for (rr, cc), v in cells.items():
            grid[rr][cc] = v
        sheet.rows = grid


def read_xlsb(content: bytes) -> XlsxWorkbook:
    """Parse xlsb bytes into the shared workbook model (grids +
    merged/hidden/format side-channel + drawing part names)."""
    import xml.etree.ElementTree as ET

    from .xlsx import NS_PKGREL

    wb = XlsxWorkbook()
    with zipfile.ZipFile(io.BytesIO(content)) as z:
        names = set(z.namelist())

        def part(name: str) -> bytes:
            info = z.getinfo(name)
            if info.file_size > MAX_PART_BYTES:
                raise ValueError(f"part {name} exceeds size cap")
            return z.read(name)

        shared: List[str] = []
        if "xl/sharedStrings.bin" in names:
            shared = _parse_sst(part("xl/sharedStrings.bin"))
        styles: tuple = ([], [], [])
        if "xl/styles.bin" in names:
            styles = _parse_styles_bin(part("xl/styles.bin"))

        # sheet order + names from workbook.bin; targets via rels XML
        rels: Dict[str, str] = {}
        if "xl/_rels/workbook.bin.rels" in names:
            rel_root = ET.fromstring(part("xl/_rels/workbook.bin.rels"))
            for rel in rel_root.iter(f"{{{NS_PKGREL}}}Relationship"):
                tgt = rel.get("Target") or ""
                if tgt.startswith("/"):
                    tgt = tgt[1:]
                elif not tgt.startswith("xl/"):
                    tgt = "xl/" + tgt
                rels[rel.get("Id") or ""] = tgt
        sheet_targets: List[Tuple[str, str]] = []
        if "xl/workbook.bin" in names:
            idx = 0
            for rid, payload in iter_records(part("xl/workbook.bin")):
                if rid != BRT_BUNDLE_SH or len(payload) < 8:
                    continue
                idx += 1
                rel_id, off = _wide_str(payload, 8)
                name, _ = _wide_str(payload, off)
                target = rels.get(
                    rel_id or "", f"xl/worksheets/sheet{idx}.bin"
                )
                sheet_targets.append((name or f"Sheet{idx}", target))
        else:  # degenerate package: lexicographic sheet parts
            parts = sorted(
                n for n in names
                if n.startswith("xl/worksheets/") and n.endswith(".bin")
            )
            sheet_targets = [(f"Sheet{i + 1}", p) for i, p in enumerate(parts)]

        for sheet_name, target in sheet_targets:
            sheet = XlsxSheet(name=sheet_name)
            if target in names:
                _parse_sheet_bin(part(target), shared, styles, sheet)
            wb.sheets.append(sheet)

        # drawings remain XML parts inside xlsb — same anchor scan
        for name in sorted(names):
            if name.startswith("xl/drawings/") and name.endswith(".xml"):
                xml = z.read(name)
                if b"<xdr:twoCellAnchor" in xml or b"<xdr:oneCellAnchor" in xml:
                    wb.drawing_parts.append(name)

    return wb


# -------------------------------------------------------------- writer


def _color_bytes(rgb: str) -> bytes:
    """'AARRGGBB' → BrtColor with fValidRGB; '' → auto (no valid RGB)."""
    if not rgb:
        return bytes([0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0xFF])
    a = int(rgb[0:2], 16)
    r = int(rgb[2:4], 16)
    g = int(rgb[4:6], 16)
    b = int(rgb[6:8], 16)
    return bytes([0x01, 0x00, 0x00, 0x00, r, g, b, a])


def _font_rec(size20: int, bold: bool, italic: bool, underline: bool,
              color: str) -> bytes:
    return _rec(
        BRT_FONT,
        struct.pack(
            "<HHHH", size20, 0x0002 if italic else 0, 700 if bold else 400, 0
        )
        + bytes([1 if underline else 0, 0, 0, 0])
        + _color_bytes(color)
        + bytes([0])
        + _pack_str("Calibri"),
    )


def _fill_rec(fls: int, fg: str) -> bytes:
    return _rec(
        BRT_FILL,
        struct.pack("<I", fls) + _color_bytes(fg) + _color_bytes("")
        + struct.pack("<I", 0),
    )


_STYLE_ORDER = [
    "bold", "italic", "underline", "red_font", "yellow_fill", "tiny", "huge"
]


def _styles_bin() -> bytes:
    """styles.bin mirroring write_xlsx's seven named styles so grid
    fixtures translate 1:1 between the two writers."""
    fonts = [
        _font_rec(220, False, False, False, ""),          # 0 default 11pt
        _font_rec(220, True, False, False, ""),           # 1 bold
        _font_rec(220, False, True, False, ""),           # 2 italic
        _font_rec(220, False, False, True, ""),           # 3 underline
        _font_rec(220, False, False, False, "FFFF0000"),  # 4 red
        _font_rec(160, False, False, False, ""),          # 5 tiny 8pt
        _font_rec(280, False, False, False, ""),          # 6 huge 14pt
    ]
    fills = [
        _fill_rec(0, ""),            # 0 none
        _fill_rec(17, ""),           # 1 gray125
        _fill_rec(1, "FFFFFF00"),    # 2 yellow solid
    ]
    font_for = {"bold": 1, "italic": 2, "underline": 3, "red_font": 4,
                "yellow_fill": 0, "tiny": 5, "huge": 6}
    xfs = [struct.pack("<HHHHHBBH", 0xFFFF, 0, 0, 0, 0, 0, 0, 0)]
    for s in _STYLE_ORDER:
        xfs.append(
            struct.pack(
                "<HHHHHBBH", 0, 0, font_for[s],
                2 if s == "yellow_fill" else 0, 0, 0, 0, 0,
            )
        )
    out = bytearray()
    out += _rec(BRT_BEGIN_STYLE_SHEET, b"")
    out += _rec(BRT_BEGIN_FONTS, struct.pack("<I", len(fonts)))
    for f in fonts:
        out += f
    out += _rec(BRT_END_FONTS, b"")
    out += _rec(BRT_BEGIN_FILLS, struct.pack("<I", len(fills)))
    for f in fills:
        out += f
    out += _rec(BRT_END_FILLS, b"")
    out += _rec(BRT_BEGIN_CELL_XFS, struct.pack("<I", len(xfs)))
    for x in xfs:
        out += _rec(BRT_XF, x)
    out += _rec(BRT_END_CELL_XFS, b"")
    out += _rec(BRT_END_STYLE_SHEET, b"")
    return bytes(out)


def _cell_prefix(col: int, style: int) -> bytes:
    return struct.pack("<I", col) + bytes(
        [style & 0xFF, (style >> 8) & 0xFF, (style >> 16) & 0xFF, 0]
    )


def write_xlsb(
    sheets: List[Dict[str, Any]],
    with_drawing: bool = False,
) -> bytes:
    """Serialize sheets into a minimal xlsb package (fixture writer;
    same sheet-dict shape as ``write_xlsx``: name/rows/merged/
    hidden_rows/hidden_cols/styled).  Strings round-robin between the
    shared-string table and inline BrtCellSt records so both read
    paths stay exercised; ints ride RK records when they fit 30 bits,
    floats ride BrtCellReal."""
    style_to_xf = {name: i + 1 for i, name in enumerate(_STYLE_ORDER)}

    sst: List[str] = []
    sst_index: Dict[str, int] = {}
    sheet_bins: List[bytes] = []
    str_counter = 0
    for spec in sheets:
        body = bytearray()
        body += _rec(BRT_BEGIN_SHEET, b"")
        hidden_cols = sorted(set(spec.get("hidden_cols") or []))
        for c in hidden_cols:
            body += _rec(
                BRT_COL_INFO,
                struct.pack("<IIII", c, c, 2340, 0) + bytes([0x01, 0]),
            )
        body += _rec(BRT_BEGIN_SHEET_DATA, b"")
        styled = {
            (r, c): style_to_xf[s]
            for r, c, s in (spec.get("styled") or [])
            if s in style_to_xf
        }
        hidden_rows = set(spec.get("hidden_rows") or [])
        rows = spec.get("rows") or []
        for r, row in enumerate(rows):
            flags_b = 0x10 if r in hidden_rows else 0
            body += _rec(
                BRT_ROW_HDR,
                struct.pack("<IIH", r, 0, 300)
                + bytes([0, flags_b])
                + struct.pack("<I", 0),
            )
            for c, val in enumerate(row):
                style = styled.get((r, c), 0)
                pre = _cell_prefix(c, style)
                if val is None:
                    if style:
                        body += _rec(BRT_CELL_BLANK, pre)
                    continue
                if isinstance(val, bool):
                    body += _rec(BRT_CELL_BOOL, pre + bytes([1 if val else 0]))
                elif isinstance(val, int) and -(2**29) <= val < 2**29:
                    rk = (val & 0x3FFFFFFF) << 2 | 2
                    body += _rec(BRT_CELL_RK, pre + struct.pack("<I", rk))
                elif isinstance(val, (int, float)):
                    body += _rec(
                        BRT_CELL_REAL, pre + struct.pack("<d", float(val))
                    )
                else:
                    s = str(val)
                    str_counter += 1
                    if str_counter % 3 == 0:  # exercise the inline path
                        body += _rec(BRT_CELL_ST, pre + _pack_str(s))
                    else:
                        if s not in sst_index:
                            sst_index[s] = len(sst)
                            sst.append(s)
                        body += _rec(
                            BRT_CELL_ISST,
                            pre + struct.pack("<I", sst_index[s]),
                        )
        body += _rec(BRT_END_SHEET_DATA, b"")
        merged = spec.get("merged") or []
        if merged:
            body += _rec(
                BRT_BEGIN_MERGE_CELLS, struct.pack("<I", len(merged))
            )
            for r0, c0, r1, c1 in merged:
                body += _rec(
                    BRT_MERGE_CELL, struct.pack("<IIII", r0, r1, c0, c1)
                )
            body += _rec(BRT_END_MERGE_CELLS, b"")
        body += _rec(BRT_END_SHEET, b"")
        sheet_bins.append(bytes(body))

    sst_bin = bytearray()
    sst_bin += _rec(BRT_BEGIN_SST, struct.pack("<II", len(sst), len(sst)))
    for s in sst:
        sst_bin += _rec(BRT_SST_ITEM, bytes([0]) + _pack_str(s))
    sst_bin += _rec(BRT_END_SST, b"")

    wb_bin = bytearray()
    wb_bin += _rec(BRT_BEGIN_BOOK, b"")
    wb_bin += _rec(BRT_BEGIN_BUNDLE_SHS, b"")
    for i, spec in enumerate(sheets):
        wb_bin += _rec(
            BRT_BUNDLE_SH,
            struct.pack("<II", 0, i + 1)
            + _pack_str(f"rId{i + 1}")
            + _pack_str(spec.get("name") or f"Sheet{i + 1}"),
        )
    wb_bin += _rec(BRT_END_BUNDLE_SHS, b"")
    wb_bin += _rec(BRT_END_BOOK, b"")

    from .xlsx import NS_PKGREL

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:

        def wr(name: str, data) -> None:
            zi = zipfile.ZipInfo(name, date_time=(2020, 1, 1, 0, 0, 0))
            zi.compress_type = zipfile.ZIP_DEFLATED
            zf.writestr(zi, data)

        n = len(sheets)
        bin_ct = "application/vnd.ms-excel.{}"
        overrides = "".join(
            f'<Override PartName="/xl/worksheets/sheet{i + 1}.bin" '
            f'ContentType="{bin_ct.format("sheet.binary.macroEnabled.worksheet")}"/>'
            for i in range(n)
        )
        drawing_override = (
            '<Override PartName="/xl/drawings/drawing1.xml" ContentType='
            '"application/vnd.openxmlformats-officedocument.drawing+xml"/>'
            if with_drawing
            else ""
        )
        wr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
            'content-types">'
            '<Default Extension="rels" ContentType="application/vnd.'
            'openxmlformats-package.relationships+xml"/>'
            '<Default Extension="bin" ContentType="application/vnd.ms-excel.'
            'sheet.binary.macroEnabled.main"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            f"{overrides}{drawing_override}</Types>",
        )
        wr(
            "_rels/.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{NS_PKGREL}">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
            'officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.bin"/>'
            "</Relationships>",
        )
        sheet_rels = "".join(
            f'<Relationship Id="rId{i + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.bin"/>'
            for i in range(n)
        )
        extra = (
            f'<Relationship Id="rId{n + 1}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/'
            'sharedStrings" Target="sharedStrings.bin"/>'
            f'<Relationship Id="rId{n + 2}" Type="http://schemas.'
            'openxmlformats.org/officeDocument/2006/relationships/styles" '
            'Target="styles.bin"/>'
        )
        wr(
            "xl/_rels/workbook.bin.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<Relationships xmlns="{NS_PKGREL}">{sheet_rels}{extra}'
            "</Relationships>",
        )
        wr("xl/workbook.bin", bytes(wb_bin))
        wr("xl/sharedStrings.bin", bytes(sst_bin))
        wr("xl/styles.bin", _styles_bin())
        for i, sb in enumerate(sheet_bins):
            wr(f"xl/worksheets/sheet{i + 1}.bin", sb)
        if with_drawing:
            wr(
                "xl/drawings/drawing1.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<xdr:wsDr xmlns:xdr="http://schemas.openxmlformats.org/'
                'drawingml/2006/spreadsheetDrawing">'
                "<xdr:oneCellAnchor><xdr:from><xdr:col>1</xdr:col>"
                "<xdr:colOff>0</xdr:colOff><xdr:row>1</xdr:row>"
                "<xdr:rowOff>0</xdr:rowOff></xdr:from>"
                '<xdr:ext cx="914400" cy="914400"/>'
                "<xdr:clientData/></xdr:oneCellAnchor></xdr:wsDr>",
            )
    return buf.getvalue()
