"""Minimal stdlib BIFF8 (.xls) reader + writer over the CFB container.

Replaces the xlrd dependency (absent in this container) for exactly the
facets the reference consumes on the legacy-Excel path:

- per-sheet cell grids                      (reference ``loader.py:180-192``)
- merged ranges (r0, r1, c0, c1 exclusive)  (``level1_checker.py:186-208``)
- hidden rows (height==0) / cols (width==0) (``level1_checker.py:424-456``)
- font/fill flags per cell (XF/FONT)        (``level1_checker.py:211-259``)

Reader handles: BOF/EOF, BOUNDSHEET, SST(+CONTINUE)/LABELSST, LABEL,
NUMBER, RK, MULRK, BLANK/MULBLANK, BOOLERR, ROW, COLINFO, MERGEDCELLS,
FONT, XF.  The writer emits LABEL/NUMBER/BOOLERR cells (no SST), which the
reader also accepts — used for the deterministic fixture corpus.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

from .cfb import read_stream, write_single_stream
from .xlsx import XlsxSheet, XlsxWorkbook

R_BOF = 0x0809
R_EOF = 0x000A
R_BOUNDSHEET = 0x0085
R_SST = 0x00FC
R_CONTINUE = 0x003C
R_LABELSST = 0x00FD
R_LABEL = 0x0204
R_NUMBER = 0x0203
R_RK = 0x027E
R_MULRK = 0x00BD
R_BLANK = 0x0201
R_MULBLANK = 0x00BE
R_BOOLERR = 0x0205
R_ROW = 0x0208
R_COLINFO = 0x007D
R_MERGEDCELLS = 0x00E5
R_FONT = 0x0031
R_XF = 0x00E0
R_DIMENSIONS = 0x0200
R_WINDOW2 = 0x023E
R_INDEX = 0x020B


def _records(stream: bytes, start: int = 0):
    pos = start
    n = len(stream)
    while pos + 4 <= n:
        rec, ln = struct.unpack_from("<HH", stream, pos)
        data = stream[pos + 4 : pos + 4 + ln]
        yield pos, rec, data
        pos += 4 + ln
        if rec == R_EOF and start != 0:
            return


def _read_unicode(data: bytes, pos: int, short_len: bool) -> Tuple[str, int]:
    """BIFF8 unicode string: (short) u8/u16 length + grbit + chars."""
    if short_len:
        cch = data[pos]
        pos += 1
    else:
        cch = struct.unpack_from("<H", data, pos)[0]
        pos += 2
    grbit = data[pos]
    pos += 1
    rich = fmt_runs = 0
    if grbit & 0x08:
        rich = struct.unpack_from("<H", data, pos)[0]
        pos += 2
    ext = 0
    if grbit & 0x04:
        ext = struct.unpack_from("<I", data, pos)[0]
        pos += 4
    if grbit & 0x01:
        s = data[pos : pos + 2 * cch].decode("utf-16le", "replace")
        pos += 2 * cch
    else:
        s = data[pos : pos + cch].decode("latin-1", "replace")
        pos += cch
    pos += rich * 4 + ext
    return s, pos


def _rk_value(rk: int):
    cents = rk & 0x01
    is_int = rk & 0x02
    if is_int:
        v = rk >> 2
        if v & 0x20000000:  # sign extend 30-bit
            v -= 0x40000000
        val: Any = v
    else:
        # RK floats are the high 32 bits of an IEEE double (low half zero)
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    if cents:
        val = val / 100
    # integral doubles become int, exactly like the NUMBER-record path —
    # the same sheet value must render identically regardless of which
    # record type the producing writer chose
    if isinstance(val, float) and val.is_integer() and abs(val) < 1e15:
        val = int(val)
    return val


def read_xls(content: bytes) -> XlsxWorkbook:
    """Parse .xls bytes into the same workbook shape the xlsx reader
    produces (grids + merged + hidden dims + format flags)."""
    stream = read_stream(content, "Workbook") or read_stream(content, "Book")
    if stream is None:
        raise ValueError("no Workbook stream in CFB container")

    wb = XlsxWorkbook()
    sheets_meta: List[Tuple[str, int]] = []
    sst: List[str] = []
    fonts: List[Dict[str, Any]] = []
    xfs: List[Dict[str, int]] = []

    # --- globals substream
    pending_sst: Optional[bytes] = None
    for pos, rec, data in _records(stream):
        if rec == R_BOF and pos > 0:
            break  # first worksheet BOF
        if rec == R_BOUNDSHEET:
            bof = struct.unpack_from("<I", data, 0)[0]
            name, _ = _read_unicode(data, 6, short_len=True)
            sheets_meta.append((name, bof))
        elif rec == R_SST:
            pending_sst = data
        elif rec == R_CONTINUE and pending_sst is not None:
            # naive continue concat (no split-string boundary support —
            # our writer never emits SST; external simple files only)
            pending_sst += data[1:] if data else b""
        elif rec == R_FONT:
            height, flags, colour, weight = struct.unpack_from("<HHHH", data, 0)
            underline = data[10]
            fonts.append(
                {
                    "height": height,
                    "italic": bool(flags & 0x02),
                    "colour": colour,
                    "bold": weight >= 0x2BC,
                    "underline": underline,
                }
            )
        elif rec == R_XF:
            font_idx = struct.unpack_from("<H", data, 0)[0]
            fill_u32 = struct.unpack_from("<I", data, 14)[0]
            icv = struct.unpack_from("<H", data, 18)[0]
            xfs.append(
                {
                    "font": font_idx,
                    "pattern": (fill_u32 >> 26) & 0x3F,
                    "icv_fore": icv & 0x7F,
                }
            )
    if pending_sst is not None:
        total, unique = struct.unpack_from("<II", pending_sst, 0)
        p = 8
        for _ in range(unique):
            if p >= len(pending_sst):
                break
            s, p = _read_unicode(pending_sst, p, short_len=False)
            sst.append(s)

    # BIFF fonts skip index 4 (historical quirk): font index ≥ 4 shifts by 1
    def font_at(idx: int) -> Optional[Dict[str, Any]]:
        if idx >= 4:
            idx -= 1
        return fonts[idx] if 0 <= idx < len(fonts) else None

    # --- worksheet substreams
    for name, bof in sheets_meta:
        sheet = XlsxSheet(name=name)
        cells: Dict[Tuple[int, int], Any] = {}
        cell_xf: Dict[Tuple[int, int], int] = {}
        max_r = max_c = -1

        def put(r: int, c: int, v: Any, xf: int):
            nonlocal max_r, max_c
            if v is not None:
                cells[(r, c)] = v
                max_r = max(max_r, r)
                max_c = max(max_c, c)
            if xf:
                cell_xf[(r, c)] = xf

        for _pos, rec, data in _records(stream, bof):
            if rec == R_EOF:
                break
            if rec == R_LABEL:
                r, c, xf = struct.unpack_from("<HHH", data, 0)
                s, _ = _read_unicode(data, 6, short_len=False)
                put(r, c, s, xf)
            elif rec == R_LABELSST:
                r, c, xf, isst = struct.unpack_from("<HHHI", data, 0)
                put(r, c, sst[isst] if isst < len(sst) else None, xf)
            elif rec == R_NUMBER:
                r, c, xf = struct.unpack_from("<HHH", data, 0)
                (v,) = struct.unpack_from("<d", data, 6)
                put(r, c, int(v) if float(v).is_integer() and abs(v) < 1e15 else v, xf)
            elif rec == R_RK:
                r, c, xf = struct.unpack_from("<HHH", data, 0)
                (rk,) = struct.unpack_from("<I", data, 6)
                put(r, c, _rk_value(rk), xf)
            elif rec == R_MULRK:
                r, c0 = struct.unpack_from("<HH", data, 0)
                n_cells = (len(data) - 6) // 6
                for i in range(n_cells):
                    xf, rk = struct.unpack_from("<HI", data, 4 + 6 * i)
                    put(r, c0 + i, _rk_value(rk), xf)
            elif rec == R_BOOLERR:
                r, c, xf = struct.unpack_from("<HHH", data, 0)
                val, is_err = data[6], data[7]
                put(r, c, None if is_err else bool(val), xf)
            elif rec == R_BLANK:
                r, c, xf = struct.unpack_from("<HHH", data, 0)
                put(r, c, None, xf)
            elif rec == R_MULBLANK:
                r, c0 = struct.unpack_from("<HH", data, 0)
                n_cells = (len(data) - 6) // 2
                for i in range(n_cells):
                    (xf,) = struct.unpack_from("<H", data, 4 + 2 * i)
                    put(r, c0 + i, None, xf)
            elif rec == R_ROW:
                r, _cmin, _cmax, height = struct.unpack_from("<HHHH", data, 0)
                flags = struct.unpack_from("<H", data, 12)[0]
                if (height & 0x7FFF) == 0 or flags & 0x0020:
                    sheet.hidden_rows.append(r)
            elif rec == R_COLINFO:
                c0, c1, width, _xf, flags = struct.unpack_from("<HHHHH", data, 0)
                # real Excel hides a column by setting fHidden (0x0001)
                # and KEEPS the stored width for unhide — width==0 alone
                # misses those (the ROW handler above checks both, too)
                if width == 0 or flags & 0x0001:
                    sheet.hidden_cols.extend(range(c0, min(c1, 255) + 1))
            elif rec == R_MERGEDCELLS:
                (cnt,) = struct.unpack_from("<H", data, 0)
                for i in range(cnt):
                    r0, r1, cc0, cc1 = struct.unpack_from("<HHHH", data, 2 + 8 * i)
                    sheet.merged.append((r0, cc0, r1, cc1))

        if max_r >= 0:
            grid: List[List[Any]] = [[None] * (max_c + 1) for _ in range(max_r + 1)]
            for (r, c), v in cells.items():
                if v is not None:
                    grid[r][c] = v
            sheet.rows = grid

        # format flags from XF/FONT (metrics lane; the reference's format
        # check early-returns for .xls — level1_checker.py:598)
        for (r, c), xf_idx in cell_xf.items():
            if xf_idx >= len(xfs):
                continue
            xf = xfs[xf_idx]
            font = font_at(xf["font"])
            if font:
                if font["bold"]:
                    sheet.format_flags.append((r, c, "bold"))
                if font["italic"]:
                    sheet.format_flags.append((r, c, "italic"))
                if font["underline"]:
                    sheet.format_flags.append((r, c, "underline"))
                if font["colour"] not in (0, 1, 7, 8, 0x7FFF):
                    sheet.format_flags.append((r, c, "font_color"))
            if xf["pattern"] not in (0,) and xf["icv_fore"] not in (64, 0):
                sheet.format_flags.append((r, c, "fill"))

        wb.sheets.append(sheet)
    return wb


# ---------------------------------------------------------------- writer


def _rec(rec: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rec, len(payload)) + payload


def _uni16(s: str) -> bytes:
    enc = s.encode("utf-16le")
    return struct.pack("<HB", len(s), 0x01) + enc


def _uni8(s: str) -> bytes:
    enc = s.encode("utf-16le")
    return struct.pack("<BB", len(s), 0x01) + enc


def write_xls(sheets: List[Dict[str, Any]]) -> bytes:
    """Serialize sheets into a minimal BIFF8 .xls (CFB container).

    Sheet dict: {"name", "rows", "merged": [(r0,c0,r1,c1) inclusive],
    "hidden_rows": [...], "hidden_cols": [...],
    "styled": [(r, c, style)]} with style ∈ {bold, italic, underline,
    red_font, yellow_fill}."""
    style_order = ["bold", "italic", "underline", "red_font", "yellow_fill"]
    style_xf = {s: 16 + 1 + i for i, s in enumerate(style_order)}
    # fonts: 0 default, 1 bold, 2 italic, 3 underline, (skip idx4) 5 red
    def font_rec(weight=0x190, flags=0, colour=0x7FFF, underline=0) -> bytes:
        payload = struct.pack(
            "<HHHHHBBBB", 200, flags, colour, weight, 0, underline, 0, 0, 0
        ) + _uni8("Arial")
        return _rec(R_FONT, payload)

    fonts = (
        font_rec()
        + font_rec(weight=0x2BC)
        + font_rec(flags=0x02)
        + font_rec(underline=1)
        + font_rec(colour=0x0A)  # red
    )

    def xf_rec(font_idx: int, pattern: int = 0, icv_fore: int = 64) -> bytes:
        fill_u32 = (pattern & 0x3F) << 26
        icv = (icv_fore & 0x7F) | (65 << 7)
        payload = struct.pack(
            "<HHHBBBBIIH", font_idx, 0, 0xFFF5, 0x20, 0, 0, 0, 0, fill_u32, icv
        )
        return _rec(R_XF, payload)

    # BIFF expects ≥16 style XFs before cell XFs
    xf_font = {"bold": 1, "italic": 2, "underline": 3, "red_font": 5, "yellow_fill": 0}
    xfs = b""
    for _ in range(16):
        xfs += xf_rec(0)
    xfs += xf_rec(0)  # default cell XF (index 16)
    for s in style_order:
        if s == "yellow_fill":
            xfs += xf_rec(0, pattern=1, icv_fore=13)
        else:
            xfs += xf_rec(xf_font[s])

    sheet_streams: List[bytes] = []
    for sh in sheets:
        body = b""
        rows = sh.get("rows", [])
        styled = {(r, c): st for (r, c, st) in sh.get("styled", [])}
        hidden_rows = set(sh.get("hidden_rows", []))
        n_rows = len(rows)
        n_cols = max((len(r) for r in rows), default=0)
        body += _rec(
            R_DIMENSIONS,
            struct.pack("<IIHHH", 0, max(n_rows, 1), 0, max(n_cols, 1), 0),
        )
        for r in sorted(set(range(n_rows)) | hidden_rows):
            height = 0 if r in hidden_rows else 255
            flags = 0x0020 if r in hidden_rows else 0
            body += _rec(
                R_ROW,
                struct.pack("<HHHHHHH", r, 0, n_cols, height, 0, 0, flags)
                + struct.pack("<H", 0),
            )
        for c in sorted(set(sh.get("hidden_cols", []))):
            body += _rec(
                R_COLINFO, struct.pack("<HHHHHH", c, c, 0, 16, 0x0001, 0)
            )
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                xf = style_xf.get(styled.get((r, c), ""), 16)
                if v is None:
                    if (r, c) in styled:
                        body += _rec(R_BLANK, struct.pack("<HHH", r, c, xf))
                    continue
                if isinstance(v, bool):
                    body += _rec(
                        R_BOOLERR, struct.pack("<HHHBB", r, c, xf, int(v), 0)
                    )
                elif isinstance(v, (int, float)):
                    body += _rec(
                        R_NUMBER, struct.pack("<HHHd", r, c, xf, float(v))
                    )
                else:
                    body += _rec(
                        R_LABEL, struct.pack("<HHH", r, c, xf) + _uni16(str(v))
                    )
        merged = sh.get("merged", [])
        if merged:
            payload = struct.pack("<H", len(merged))
            for (r0, c0, r1, c1) in merged:
                payload += struct.pack("<HHHH", r0, r1, c0, c1)
            body += _rec(R_MERGEDCELLS, payload)
        body += _rec(R_WINDOW2, struct.pack("<HHHIHH", 0x06B6, 0, 0, 0x40, 0, 0))
        bof = _rec(R_BOF, struct.pack("<HHHHII", 0x0600, 0x0010, 0x0DBB, 0x07CC, 0, 0x0600))
        sheet_streams.append(bof + body + _rec(R_EOF, b""))

    # assemble globals with boundsheet offsets (two-pass)
    def globals_stream(offsets: List[int]) -> bytes:
        g = _rec(R_BOF, struct.pack("<HHHHII", 0x0600, 0x0005, 0x0DBB, 0x07CC, 0, 0x0600))
        g += fonts + xfs
        for (sh, off) in zip(sheets, offsets):
            g += _rec(
                R_BOUNDSHEET,
                struct.pack("<IBB", off, 0, 0) + _uni8(sh["name"])[0:1]
                + _uni8(sh["name"])[1:],
            )
        g += _rec(R_EOF, b"")
        return g

    offsets = [0] * len(sheets)
    g = globals_stream(offsets)
    # fixed-size BOUNDSHEET records → offsets stable across passes
    pos = len(g)
    for i, ss in enumerate(sheet_streams):
        offsets[i] = pos
        pos += len(ss)
    g = globals_stream(offsets)
    stream = g + b"".join(sheet_streams)
    return write_single_stream("Workbook", stream)
