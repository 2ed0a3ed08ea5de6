"""Document-bytes → normalized grid parsing (ingest core).

One entry point, ``parse_document(fmt, content)``, dispatching on format the
way the reference dispatches on file extension (``loader.py:157-201``,
``ALLOWED_EXTENSIONS`` gate at ``loader.py:15,157-159``):

- csv  : pandas ``read_csv(header=None)`` with UTF-8 → Shift-JIS fallback
         (reference ``loader.py:164-179``); one pseudo-sheet named "CSV".
- xlsx : stdlib OOXML reader (``core/xlsx.py``) with side-channel metadata
         (merges, hidden dims, style flags, drawings).
- xls  : import-gated on xlrd; the sandbox has no xlrd, so parsing records
         a parse error and degrades exactly like the reference degrades
         workbook-less paths (``app.py:156-159``).
- html : stdlib parser lane (``core/html.py``).
"""

from __future__ import annotations

import io
from dataclasses import dataclass, field
from typing import Any, List, Optional

import pandas as pd

from .xlsx import XlsxWorkbook, read_xlsx

ALLOWED_FORMATS = {
    "csv", "xlsx", "xls", "html", "pdf", "docx", "pptx", "rtf", "ods",
    "odt", "epub", "md", "ipynb", "srt", "vtt", "tex", "doc", "wiki",
    "hocr", "ppt", "eml", "tsv", "rst", "adoc", "org", "txt", "xlsb",
}
GRID_FORMATS = {"csv", "xlsx", "xls", "ods", "tsv", "xlsb"}


@dataclass
class SheetGrid:
    name: str
    rows: List[List[Any]]  # dense row-major grid; None/NaN = empty cell


@dataclass
class ParsedDoc:
    fmt: str
    sheets: List[SheetGrid] = field(default_factory=list)
    workbook: Optional[XlsxWorkbook] = None  # xlsx side-channel; None otherwise
    encoding: Optional[str] = None           # csv: utf-8 | shift_jis
    raw_text: Optional[str] = None           # csv: decoded raw text (for F11)
    parse_error: Optional[str] = None

    def sheet_names(self) -> List[str]:
        return [s.name for s in self.sheets]


def _df_to_rows(df: pd.DataFrame) -> List[List[Any]]:
    # Keep pandas-inferred cell types (str / int / float / NaN) — the
    # reference's checks are defined over exactly those dynamic types.
    return df.values.tolist()


def _sniff_delimiter(text: str) -> str:
    """European/exported tabular files arrive semicolon-, tab- or
    pipe-separated under a .csv extension.  PARITY GUARD: the comma
    path must stay bit-identical to the reference (pandas default), so
    an alternative delimiter is chosen ONLY when the sample contains
    NO commas at all — any comma keeps the reference behavior.  Among
    the alternatives the most frequent wins (count over the first 10
    lines, quoted regions excluded)."""
    lines = text.split("\n")[:10]
    counts = {",": 0, ";": 0, "\t": 0, "|": 0}
    for line in lines:
        in_q = False
        for ch in line:
            if ch == '"':
                in_q = not in_q
            elif not in_q and ch in counts:
                counts[ch] += 1
    if counts[","] > 0:
        return ","
    best = max((";", "\t", "|"), key=lambda d: counts[d])
    return best if counts[best] > 0 else ","


def parse_csv(content: bytes, fmt: str = "csv") -> ParsedDoc:
    doc = ParsedDoc(fmt=fmt)
    text: Optional[str] = None
    try:
        text = content.decode("utf-8")
        doc.encoding = "utf-8"
    except UnicodeDecodeError:
        try:
            text = content.decode("shift_jis")
            doc.encoding = "shift_jis"
        except UnicodeDecodeError:
            doc.parse_error = "csv decode failed (utf-8, shift_jis)"
            return doc
    doc.raw_text = text
    sep = "\t" if fmt == "tsv" else _sniff_delimiter(text)
    try:
        df = pd.read_csv(
            io.StringIO(text), header=None, skip_blank_lines=False,
            sep=sep,
        )
    except pd.errors.EmptyDataError:
        doc.parse_error = "empty csv"
        return doc
    except Exception as e:  # malformed csv
        doc.parse_error = f"csv parse failed: {e}"
        return doc
    doc.sheets = [SheetGrid(name="CSV", rows=_df_to_rows(df))]
    return doc


def parse_xlsx(content: bytes) -> ParsedDoc:
    doc = ParsedDoc(fmt="xlsx")
    try:
        wb = read_xlsx(content)
    except Exception as e:
        doc.parse_error = f"xlsx parse failed: {e}"
        return doc
    doc.workbook = wb
    doc.sheets = [SheetGrid(name=s.name, rows=s.rows) for s in wb.sheets]
    return doc


def parse_xlsb(content: bytes) -> ParsedDoc:
    """Excel Binary Workbook via the stdlib BIFF12 reader
    (``core/xlsb.py``) — emits the same workbook model as the xlsx
    lane, so every grid check (merged/hidden/format/media) runs
    unchanged on the binary sibling format."""
    doc = ParsedDoc(fmt="xlsb")
    try:
        from .xlsb import read_xlsb

        wb = read_xlsb(content)
        doc.workbook = wb
        doc.sheets = [SheetGrid(name=s.name, rows=s.rows) for s in wb.sheets]
    except Exception as e:
        doc.parse_error = f"xlsb parse failed: {e}"
    return doc


def parse_xls(content: bytes) -> ParsedDoc:
    """Legacy Excel via the stdlib BIFF8 reader (``core/xls.py``).

    Always the stdlib reader, even when xlrd is importable: an optional
    xlrd fast path would not populate the workbook side-channel (merged
    ranges, hidden dims, format flags) and returns '' where this reader
    returns None for blank cells — the same document would then produce
    different rule results depending on which libraries happen to be on
    the cluster, breaking the one-implementation determinism contract."""
    doc = ParsedDoc(fmt="xls")
    try:
        from .xls import read_xls

        wb8 = read_xls(content)
        doc.workbook = wb8
        doc.sheets = [SheetGrid(name=s.name, rows=s.rows) for s in wb8.sheets]
    except Exception as e:
        doc.parse_error = f"xls parse failed: {e}"
    return doc


# gzip transparent-ingest guard: crawl corpora ship members gzipped
# (doc.html.gz with fmt "html"); a decompression bomb must quarantine,
# never OOM an executor.  Tests shrink the cap to exercise the guard.
GZIP_MAGIC = b"\x1f\x8b"
MAX_GUNZIP_BYTES = 256 << 20


def parse_document(
    fmt: str, content: bytes, charset_hint: str = "",
    html_context: bool = False,
) -> ParsedDoc:
    fmt = fmt.lower().lstrip(".")
    if fmt not in ALLOWED_FORMATS:
        # extension gate — unsupported formats quarantine, never throw
        return ParsedDoc(fmt=fmt, parse_error=f"unsupported format: {fmt}")
    if content[:2] == GZIP_MAGIC:
        # transparent member decompression before format dispatch
        # (gzip magic cannot collide: none of the supported formats
        # starts 1f 8b)
        import zlib

        d = zlib.decompressobj(wbits=31)
        try:
            content = d.decompress(content, MAX_GUNZIP_BYTES)
            if d.unconsumed_tail:
                return ParsedDoc(
                    fmt=fmt,
                    parse_error=(
                        "gzip member exceeds decompression cap "
                        f"({MAX_GUNZIP_BYTES} bytes) — bomb guard"
                    ),
                )
            content += d.flush()
        except zlib.error as e:
            return ParsedDoc(fmt=fmt, parse_error=f"gzip decompress failed: {e}")
    if fmt in ("csv", "tsv"):
        return parse_csv(content, fmt)
    if fmt == "xlsx":
        return parse_xlsx(content)
    if fmt == "xlsb":
        return parse_xlsb(content)
    if fmt == "xls":
        return parse_xls(content)
    if fmt == "pdf":
        from .pdf import extract_pdf_spans

        doc = ParsedDoc(fmt="pdf")
        spans, err = extract_pdf_spans(content)
        doc.parse_error = err
        doc.layout_spans = spans  # type: ignore[attr-defined]
        return doc
    if fmt == "docx":
        from .docx import parse_docx

        return parse_docx(content)
    if fmt == "doc":
        from .doc import parse_doc

        return parse_doc(content)
    if fmt == "pptx":
        from .pptx import parse_pptx

        return parse_pptx(content)
    if fmt == "rtf":
        from .rtf import parse_rtf

        return parse_rtf(content)
    if fmt == "ods":
        from .odf import parse_ods

        return parse_ods(content)
    if fmt == "odt":
        from .odf import parse_odt

        return parse_odt(content)
    if fmt == "epub":
        from .epub import parse_epub

        return parse_epub(content)
    if fmt == "md":
        from .markdown import parse_markdown

        return parse_markdown(content)
    if fmt == "ipynb":
        from .ipynb import parse_ipynb

        return parse_ipynb(content)
    if fmt in ("srt", "vtt"):
        from .subtitles import parse_subtitles

        return parse_subtitles(content, fmt)
    if fmt == "tex":
        from .latex import parse_latex

        return parse_latex(content)
    if fmt == "wiki":
        from .wikitext import parse_wikitext

        return parse_wikitext(content)
    if fmt == "hocr":
        from .hocr import parse_hocr

        return parse_hocr(content)
    if fmt == "ppt":
        from .ppt import parse_ppt

        return parse_ppt(content)
    if fmt == "eml":
        from .eml import parse_eml

        return parse_eml(content)
    if fmt == "rst":
        from .rst import parse_rst

        return parse_rst(content)
    if fmt == "adoc":
        from .adoc import parse_adoc

        return parse_adoc(content)
    if fmt == "org":
        from .org import parse_org

        return parse_org(content)
    if fmt == "txt":
        from .fwtext import parse_txt

        return parse_txt(content)
    from .html import parse_html  # local import to keep grid lane light

    return parse_html(content, charset_hint, context=html_context)
