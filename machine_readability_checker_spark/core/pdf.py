"""PDF-lite layout lane: stdlib text-object parser + layout analysis.

No PDF library ships in this container, so the engine carries a minimal
reader for the uncompressed subset of PDF (ISO 32000) that its own fixture
writer emits — enough to exercise the north-star layout pipeline honestly:

1. tokenize content streams' text objects (BT…ET with Tf/Td/TD/Tm/Tj/TJ/'),
   collecting positioned text runs (x, y, size, text);
2. **line clustering**: group runs whose baselines agree within a
   tolerance (the y-cluster analog of the reference's row zones);
3. **reading-order sort**: lines top-to-bottom (PDF y grows upward),
   runs within a line left-to-right;
4. **heading detection**: font size well above the body median;
5. **table detection via x-alignment**: maximal runs of ≥2 consecutive
   multi-run lines sharing ≥2 x-positions become table blocks — each line
   a ``cell`` span with tab-joined fields (mirroring the grid lane's row
   rendering); everything else becomes ``line`` prose spans;
6. image XObjects surface as ``media`` spans (``pdf/objN`` refs).

Real-world PDFs compress essentially every content stream with Flate
(zlib, RFC 1950) — this lane inflates ``/FlateDecode`` streams (with
PNG/TIFF predictor un-filtering per ``/DecodeParms``) and object
streams (``/Type /ObjStm``), resolves indirect ``/Length`` references,
and decodes both literal ``(...)`` and hex ``<...>`` strings (simple
single-byte fonts).  What still quarantines, deliberately: encrypted
documents (``/Encrypt``) and CID/Type0 composite fonts, whose 2-byte
glyph indices need the font's CMap to map to text — emitting mojibake
would silently corrupt the training corpus, so those degrade to a
parse-error row like every other quarantined lane.
"""

from __future__ import annotations

import re
import zlib
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

Y_LINE_TOLERANCE = 2.0
HEADING_SIZE_FACTOR = 1.3
X_ALIGN_TOLERANCE = 1.0
MIN_TABLE_ROWS = 2
MIN_SHARED_COLS = 2

_OBJ_HEAD_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")
_STREAM_KW_RE = re.compile(rb"stream(\r\n|\n|\r)")
_ENDSTREAM_RE = re.compile(rb"(?:\r\n|\r|\n)?endstream")
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image")
_OBJSTM_RE = re.compile(rb"/Type\s*/ObjStm")
_LENGTH_RE = re.compile(rb"/Length\s+(\d+)(\s+(\d+)\s+R)?")
_FILTER_RE = re.compile(rb"/Filter\s*(/\w+|\[[^\]]*\])")
_NAME_RE = re.compile(rb"/(\w+)")
_PREDICTOR_RE = re.compile(rb"/Predictor\s+(\d+)")
_COLUMNS_RE = re.compile(rb"/Columns\s+(\d+)")
_COLORS_RE = re.compile(rb"/Colors\s+(\d+)")
_BPC_RE = re.compile(rb"/BitsPerComponent\s+(\d+)")
_TYPE0_RE = re.compile(rb"/Subtype\s*/Type0\b")
_ENCRYPT_RE = re.compile(rb"/Encrypt\s+\d+\s+\d+\s+R")
# cheap numeric objects (for resolving indirect /Length references)
_NUM_OBJ_RE = re.compile(rb"(\d+)\s+\d+\s+obj\s*(\d+)\s*endobj")


def _png_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    """Undo PNG row predictors (filter byte + filtered row per row).

    Flate producers (notably xref/object streams) pre-filter rows so
    runs of similar bytes compress better; decoding must invert it.
    """
    bpp = max(1, (colors * bpc + 7) // 8)
    row_len = (columns * colors * bpc + 7) // 8
    stride = row_len + 1
    if row_len <= 0 or len(data) % stride:
        raise ValueError("predictor row geometry mismatch")
    out = bytearray()
    prev = bytearray(row_len)
    for r in range(0, len(data), stride):
        ftype = data[r]
        row = bytearray(data[r + 1 : r + stride])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, row_len):
                row[i] = (row[i] + row[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(row_len):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_len):
                left = row[i - bpp] if i >= bpp else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_len):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[i] = (row[i] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out += row
        prev = row
    return bytes(out)


def _tiff_unpredict(data: bytes, columns: int, colors: int, bpc: int) -> bytes:
    if bpc != 8:
        raise ValueError("TIFF predictor only supported at 8 bpc")
    row_len = columns * colors
    out = bytearray(data)
    for r in range(0, len(out) - row_len + 1, row_len):
        for i in range(colors, row_len):
            out[r + i] = (out[r + i] + out[r + i - colors]) & 0xFF
    return bytes(out)


def _filters(dict_bytes: bytes) -> List[bytes]:
    m = _FILTER_RE.search(dict_bytes)
    if not m:
        return []
    return _NAME_RE.findall(m.group(1))


def _decode_stream(dict_bytes: bytes, raw: bytes) -> bytes:
    """Apply the dict's filter chain to raw stream bytes.

    Supports the no-filter and FlateDecode cases (with PNG/TIFF
    predictors) that cover real-world text content and object streams;
    anything else raises ValueError for the caller to skip/quarantine.
    """
    for name in _filters(dict_bytes):
        if name == b"FlateDecode":
            data = zlib.decompress(raw)
            pm = _PREDICTOR_RE.search(dict_bytes)
            pred = int(pm.group(1)) if pm else 1
            if pred > 1:
                cm = _COLUMNS_RE.search(dict_bytes)
                columns = int(cm.group(1)) if cm else 1
                km = _COLORS_RE.search(dict_bytes)
                colors = int(km.group(1)) if km else 1
                bm = _BPC_RE.search(dict_bytes)
                bpc = int(bm.group(1)) if bm else 8
                if pred >= 10:
                    data = _png_unpredict(data, columns, colors, bpc)
                elif pred == 2:
                    data = _tiff_unpredict(data, columns, colors, bpc)
                else:
                    raise ValueError(f"unsupported predictor {pred}")
            raw = data
        else:
            raise ValueError(f"unsupported stream filter /{name.decode()}")
    return raw


def _iter_stream_objects(content: bytes):
    """Yield (obj_num, dict_bytes, raw_stream_or_None) for every
    indirect object, slicing stream data by /Length (indirect refs
    resolved against plain numeric objects) so compressed bytes that
    happen to contain ``endstream``/``endobj`` can't truncate the scan.
    """
    lengths = {
        int(m.group(1)): int(m.group(2))
        for m in _NUM_OBJ_RE.finditer(content)
    }
    pos = 0
    n = len(content)
    while pos < n:
        hm = _OBJ_HEAD_RE.search(content, pos)
        if hm is None:
            break
        obj_num = int(hm.group(1))
        body_start = hm.end()
        sm = _STREAM_KW_RE.search(content, body_start)
        em = content.find(b"endobj", body_start)
        if sm is None or (em != -1 and em < sm.start()):
            # plain (non-stream) object
            dict_bytes = content[body_start : em if em != -1 else n]
            yield obj_num, dict_bytes, None
            pos = (em + 6) if em != -1 else n
            continue
        dict_bytes = content[body_start : sm.start()]
        data_start = sm.end()
        length = None
        lm = _LENGTH_RE.search(dict_bytes)
        if lm:
            length = (
                lengths.get(int(lm.group(1)))
                if lm.group(2)  # "<num> <gen> R" indirect reference
                else int(lm.group(1))
            )
        if length is not None and data_start + length <= n:
            raw = content[data_start : data_start + length]
            tail = _ENDSTREAM_RE.match(content, data_start + length)
            if tail is None:  # /Length lied; fall back to a scan
                raw = None
        else:
            raw = None
        if raw is None:
            end = content.find(b"endstream", data_start)
            if end == -1:
                break
            raw = content[data_start:end]
            if raw.endswith(b"\r\n"):
                raw = raw[:-2]
            elif raw.endswith(b"\n") or raw.endswith(b"\r"):
                raw = raw[:-1]
        yield obj_num, dict_bytes, raw
        em = content.find(b"endobj", data_start + len(raw))
        pos = (em + 6) if em != -1 else data_start + len(raw)


@dataclass
class TextRun:
    x: float
    y: float
    size: float
    text: str


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        ch = s[i]
        if ch == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            mapping = {"n": "\n", "r": "\r", "t": "\t", "b": "\b",
                       "f": "\f", "(": "(", ")": ")", "\\": "\\"}
            if nxt in mapping:
                out.append(mapping[nxt])
                i += 2
                continue
            if nxt.isdigit():  # octal escape
                oct_digits = s[i + 1 : i + 4]
                n = 0
                j = 0
                while j < len(oct_digits) and oct_digits[j].isdigit():
                    n = n * 8 + int(oct_digits[j])
                    j += 1
                out.append(chr(n))
                i += 1 + j
                continue
        out.append(ch)
        i += 1
    return "".join(out)


_TOKEN_RE = re.compile(
    r"\((?:\\.|[^\\()])*\)"      # literal string
    r"|<[0-9A-Fa-f\s]*>"         # hex string (simple 1-byte fonts)
    r"|\[(?:\\.|[^\]])*\]"       # array (TJ)
    r"|/[A-Za-z0-9]+"            # name
    r"|-?\d+(?:\.\d+)?"          # number
    r"|[A-Za-z'\"*]+",           # operator
    re.DOTALL,
)

_STR_IN_ARRAY_RE = re.compile(
    r"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>", re.DOTALL
)


def _hex_to_text(tok: str) -> str:
    """``<48 65 6c>`` → ``Hel`` — hex strings decode bytewise for simple
    (single-byte) fonts; an odd trailing digit is zero-padded per spec.
    (Composite/CID fonts never reach here: the document quarantines.)"""
    digits = re.sub(r"\s", "", tok[1:-1])
    if len(digits) % 2:
        digits += "0"
    return bytes.fromhex(digits).decode("latin-1")


def _string_token_text(tok: str) -> str:
    if tok.startswith("("):
        return _unescape(tok[1:-1])
    if tok.startswith("<"):
        return _hex_to_text(tok)
    return ""


def parse_text_runs(content: str) -> List[TextRun]:
    """Execute the text-positioning subset of a content stream."""
    runs: List[TextRun] = []
    x = y = 0.0
    lx = ly = 0.0  # line start (Td is relative to it)
    size = 12.0
    leading = 12.0
    stack: List[str] = []
    for m in _TOKEN_RE.finditer(content):
        tok = m.group(0)
        if tok[0] in "([/<" or tok[0].isdigit() or tok[0] == "-":
            stack.append(tok)
            continue
        op = tok
        if op == "BT":
            x = y = lx = ly = 0.0
            stack.clear()
        elif op == "Tf" and len(stack) >= 2:
            try:
                size = float(stack[-1])
            except ValueError:
                pass
            stack.clear()
        elif op in ("Td", "TD") and len(stack) >= 2:
            try:
                tx, ty = float(stack[-2]), float(stack[-1])
                lx, ly = lx + tx, ly + ty
                x, y = lx, ly
                if op == "TD":
                    leading = -ty
            except ValueError:
                pass
            stack.clear()
        elif op == "Tm" and len(stack) >= 6:
            try:
                lx, ly = float(stack[-2]), float(stack[-1])
                x, y = lx, ly
            except ValueError:
                pass
            stack.clear()
        elif op == "T*":
            ly -= leading
            x, y = lx, ly
            stack.clear()
        elif op == "TL" and stack:
            try:
                leading = float(stack[-1])
            except ValueError:
                pass
            stack.clear()
        elif op == "Tj" and stack:
            text = _string_token_text(stack[-1])
            if text:
                runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "'" and stack:
            ly -= leading
            x, y = lx, ly
            text = _string_token_text(stack[-1])
            if text:
                runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "TJ" and stack:
            arr = stack[-1]
            if arr.startswith("["):
                parts = [
                    _string_token_text(s)
                    for s in _STR_IN_ARRAY_RE.findall(arr)
                ]
                text = "".join(parts)
                if text:
                    runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "ET":
            stack.clear()
        else:
            stack.clear()
    return runs


def cluster_lines(runs: List[TextRun]) -> List[List[TextRun]]:
    """Group runs into baseline lines (y within tolerance), reading order:
    top-to-bottom, then left-to-right within each line."""
    if not runs:
        return []
    by_y = sorted(runs, key=lambda r: (-r.y, r.x))
    lines: List[List[TextRun]] = [[by_y[0]]]
    for r in by_y[1:]:
        if abs(lines[-1][0].y - r.y) <= Y_LINE_TOLERANCE:
            lines[-1].append(r)
        else:
            lines.append([r])
    for line in lines:
        line.sort(key=lambda r: r.x)
    return lines


def _x_signature(line: List[TextRun]) -> List[float]:
    return [round(r.x / X_ALIGN_TOLERANCE) * X_ALIGN_TOLERANCE for r in line]


def _shared_cols(a: List[float], b: List[float]) -> int:
    return len(set(a) & set(b))


def table_blocks(lines: List[List[TextRun]]) -> List[Tuple[int, int]]:
    """Maximal runs of ≥MIN_TABLE_ROWS consecutive multi-run lines whose
    x-signatures share ≥MIN_SHARED_COLS columns → (start, end) inclusive
    line-index ranges.  Shared by the span lane (``cell`` marking) and
    the grid lane (``extract_pdf_tables``), so both always agree on what
    is a table."""
    blocks: List[Tuple[int, int]] = []
    i = 0
    while i < len(lines):
        if len(lines[i]) < 2:
            i += 1
            continue
        j = i
        sig = _x_signature(lines[i])
        while (
            j + 1 < len(lines)
            and len(lines[j + 1]) >= 2
            and _shared_cols(sig, _x_signature(lines[j + 1])) >= MIN_SHARED_COLS
        ):
            j += 1
        if j - i + 1 >= MIN_TABLE_ROWS:
            blocks.append((i, j))
        i = j + 1
    return blocks


def densify_block(block: List[List[TextRun]]) -> List[List[str]]:
    """A table block's lines → a dense rows×cols grid.

    Columns are the sorted union of rounded x-positions across the
    block; each run lands in its column's slot (two runs colliding on a
    slot join with a space, like overlapping draw order).  A line that
    lacks a run at some column gets ``""`` there — the printed-page
    analog of an unmerged spreadsheet range, so blank-cell and
    merged-cell rules see PDF tables exactly like xlsx ones."""
    col_xs = sorted({x for line in block for x in _x_signature(line)})
    col_idx = {x: i for i, x in enumerate(col_xs)}
    grid: List[List[str]] = []
    for line in block:
        row = [""] * len(col_xs)
        for r, x in zip(line, _x_signature(line)):
            c = col_idx[x]
            row[c] = (row[c] + " " + r.text).strip() if row[c] else r.text
        grid.append(row)
    return grid


def analyze_layout(runs: List[TextRun]) -> List[Tuple[str, str, str]]:
    """lines → ordered (kind, text, media_ref) triples with heading and
    x-alignment table detection."""
    lines = cluster_lines(runs)
    if not lines:
        return []
    sizes = sorted(r.size for line in lines for r in line)
    median_size = sizes[len(sizes) // 2]

    # mark table membership: consecutive multi-run lines sharing columns
    is_table = [False] * len(lines)
    for i, j in table_blocks(lines):
        for k in range(i, j + 1):
            is_table[k] = True

    out: List[Tuple[str, str, str]] = []
    for idx, line in enumerate(lines):
        if is_table[idx]:
            out.append(("cell", "\t".join(r.text for r in line), ""))
        else:
            text = " ".join(r.text for r in line)
            max_size = max(r.size for r in line)
            if max_size >= median_size * HEADING_SIZE_FACTOR:
                out.append(("heading", text, ""))
            else:
                out.append(("line", text, ""))
    return out


def _collect_text_streams(
    content: bytes,
) -> Tuple[List[bytes], List[str], Optional[str]]:
    """Walk a PDF's stream objects and return (decoded text content
    streams, media refs, parse_error) — the shared front half of the
    span and table lanes, so both apply identical quarantine gates."""
    if not content.startswith(b"%PDF"):
        return [], [], "not a pdf"
    if _ENCRYPT_RE.search(content):
        return [], [], "encrypted pdf (/Encrypt) not supported"

    media: List[str] = []
    objstm_bodies: List[bytes] = []
    text_streams: List[bytes] = []
    for obj_num, dict_bytes, raw in _iter_stream_objects(content):
        if raw is None:
            continue
        if _IMAGE_RE.search(dict_bytes):
            media.append(f"pdf/obj{obj_num}")
            continue
        is_objstm = bool(_OBJSTM_RE.search(dict_bytes))
        try:
            data = _decode_stream(dict_bytes, raw)
        except zlib.error as e:
            return [], [], f"flate inflate failed: {e}"
        except ValueError:
            # unsupported filter (DCT image data, JBIG2, ...): not a
            # text content stream — skip, like any non-text stream
            continue
        if is_objstm:
            objstm_bodies.append(data)
            continue
        if b"BT" not in data or b"ET" not in data:
            continue
        text_streams.append(data)

    # composite-font gate: Type0 declarations may hide inside ObjStm
    font_scan = b"".join([content] + objstm_bodies)
    if _TYPE0_RE.search(font_scan) and text_streams:
        return [], [], "CID/Type0 composite fonts not supported (CMap needed)"
    return text_streams, media, None


def extract_pdf_spans(content: bytes) -> Tuple[List[Tuple[str, str, str]], Optional[str]]:
    """PDF bytes → (ordered (kind,text,media_ref) triples, parse_error).

    Flate-compressed content streams inflate in place; object streams
    (/Type /ObjStm) inflate so font/encryption declarations hidden in
    them still gate the document.  Encrypted PDFs and CID/Type0 fonts
    quarantine (decoding them without keys/CMaps would emit garbage)."""
    text_streams, media, err = _collect_text_streams(content)
    if err is not None:
        return [], err

    spans: List[Tuple[str, str, str]] = []
    for data in text_streams:
        try:
            runs = parse_text_runs(data.decode("latin-1"))
        except Exception as e:
            return [], f"content stream parse failed: {e}"
        spans.extend(analyze_layout(runs))
    for ref in media:
        spans.append(("media", "", ref))
    if not text_streams and not media:
        return [], "no text content streams found"
    return spans, None


def extract_pdf_tables(
    content: bytes,
) -> Tuple[List[List[List[str]]], Optional[str]]:
    """PDF bytes → (dense table grids in reading order, parse_error).

    Runs the same quarantine gates and x-alignment block detection as
    ``extract_pdf_spans`` (shared helpers, so span and grid lanes can
    never disagree about what is a table), then densifies each block
    against the union of its column x-positions — a line missing a run
    at some column yields ``""`` (the merged/blank-cell analog), ready
    for the machine-readability rule battery."""
    text_streams, _media, err = _collect_text_streams(content)
    if err is not None:
        return [], err
    if not text_streams:
        return [], "no text content streams found"

    grids: List[List[List[str]]] = []
    for data in text_streams:
        try:
            runs = parse_text_runs(data.decode("latin-1"))
        except Exception as e:
            return [], f"content stream parse failed: {e}"
        lines = cluster_lines(runs)
        for i, j in table_blocks(lines):
            grids.append(densify_block(lines[i : j + 1]))
    return grids, None


# --------------------------------------------------------------- writer


def _png_predict_encode(data: bytes, columns: int, ftype: int = 2) -> bytes:
    """PNG-filter rows (Up by default) for predictor test fixtures —
    the exact inverse of ``_png_unpredict`` at colors=1, bpc=8."""
    if len(data) % columns:
        data = data + b"\x00" * (columns - len(data) % columns)
    out = bytearray()
    prev = bytearray(columns)
    for r in range(0, len(data), columns):
        row = bytearray(data[r : r + columns])
        out.append(ftype)
        if ftype == 0:
            out += row
        elif ftype == 2:  # Up
            out += bytes((row[i] - prev[i]) & 0xFF for i in range(columns))
        else:
            raise ValueError("fixture encoder supports filters 0 and 2")
        prev = row
    return bytes(out)


def write_pdf(
    items: List[Dict[str, Any]],
    compress: bool = False,
    predictor_columns: Optional[int] = None,
    hex_strings: bool = False,
    indirect_length: bool = False,
) -> bytes:
    """Serialize a minimal single-page PDF with absolutely positioned text
    and optional image XObjects.

    Each item: {"text": str, "x": n, "y": n, "size": n} or
    {"image": True}.  Output is ASCII-safe when uncompressed (non-ASCII
    escaped as octal latin-1; fixture texts stay ASCII).

    ``compress=True`` Flate-compresses the content stream (the
    real-world layout — virtually every production PDF does this);
    ``predictor_columns`` additionally applies a PNG Up row predictor;
    ``hex_strings=True`` emits text as ``<hex> Tj`` tokens;
    ``indirect_length=True`` writes ``/Length N 0 R`` via a separate
    numeric object, as real writers that stream output do."""
    parts: List[str] = []
    images = 0
    for it in items:
        if it.get("image"):
            images += 1
            continue
        raw = str(it["text"])
        if hex_strings:
            lit = "<" + raw.encode("latin-1", "replace").hex() + ">"
        else:
            text = raw.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
            lit = f"({text})"
        parts.append(
            f"BT /F1 {it.get('size', 12)} Tf {it['x']} {it['y']} Td {lit} Tj ET"
        )
    stream = "\n".join(parts).encode("latin-1", "replace")

    filter_entry = b""
    if compress:
        if predictor_columns:
            stream = zlib.compress(
                _png_predict_encode(stream, predictor_columns)
            )
            filter_entry = (
                b" /Filter /FlateDecode /DecodeParms << /Predictor 12 "
                b"/Columns %d >>" % predictor_columns
            )
        else:
            stream = zlib.compress(stream)
            filter_entry = b" /Filter /FlateDecode"

    objs: List[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    n_fixed = 5  # catalog, pages, page, contents, font
    length_ref = n_fixed + images + 1 if indirect_length else None
    length_entry = (
        b"/Length %d 0 R" % length_ref
        if length_ref
        else b"/Length %d" % len(stream)
    )
    objs.append(
        b"<< " + length_entry + filter_entry + b" >>\nstream\n"
        + stream + b"\nendstream"
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for _ in range(images):
        pixel = b"\x7f"
        objs.append(
            b"<< /Subtype /Image /Width 1 /Height 1 /ColorSpace /DeviceGray "
            b"/BitsPerComponent 8 /Length 1 >>\nstream\n" + pixel + b"\nendstream"
        )
    if indirect_length:
        objs.append(b"%d" % len(stream))

    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_pos = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_pos)
    )
    return bytes(out)
