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

Real-world PDFs (Flate streams, CID fonts) need a real decoder — the
parser raises a parse error for compressed streams and the kernel
quarantines the document, same as every other degraded lane.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

Y_LINE_TOLERANCE = 2.0
HEADING_SIZE_FACTOR = 1.3
X_ALIGN_TOLERANCE = 1.0
MIN_TABLE_ROWS = 2
MIN_SHARED_COLS = 2

_STREAM_RE = re.compile(rb"(\d+)\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_CONTENT_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
_IMAGE_RE = re.compile(rb"/Subtype\s*/Image")
_FLATE_RE = re.compile(rb"/Filter\s*/?\s*(?:\[)?\s*/FlateDecode")


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
    r"|\[(?:\\.|[^\]])*\]"       # array (TJ)
    r"|/[A-Za-z0-9]+"            # name
    r"|-?\d+(?:\.\d+)?"          # number
    r"|[A-Za-z'\"*]+",           # operator
    re.DOTALL,
)

_STR_IN_ARRAY_RE = re.compile(r"\((?:\\.|[^\\()])*\)", re.DOTALL)


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
        if tok[0] in "([/" or tok[0].isdigit() or tok[0] == "-":
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
            lit = stack[-1]
            if lit.startswith("("):
                text = _unescape(lit[1:-1])
                if text:
                    runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "'" and stack:
            ly -= leading
            x, y = lx, ly
            lit = stack[-1]
            if lit.startswith("("):
                text = _unescape(lit[1:-1])
                if text:
                    runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "TJ" and stack:
            arr = stack[-1]
            if arr.startswith("["):
                parts = [
                    _unescape(s[1:-1]) for s in _STR_IN_ARRAY_RE.findall(arr)
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
            for k in range(i, j + 1):
                is_table[k] = True
        i = j + 1

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


def extract_pdf_spans(content: bytes) -> Tuple[List[Tuple[str, str, str]], Optional[str]]:
    """PDF bytes → (ordered (kind,text,media_ref) triples, parse_error)."""
    if not content.startswith(b"%PDF"):
        return [], "not a pdf"
    spans: List[Tuple[str, str, str]] = []
    media: List[str] = []
    saw_stream = False
    for m in _STREAM_RE.finditer(content):
        obj_num = int(m.group(1))
        body = m.group(2)
        if _IMAGE_RE.search(body):
            media.append(f"pdf/obj{obj_num}")
            continue
        sm = _CONTENT_RE.search(body)
        if sm is None:
            continue
        if _FLATE_RE.search(body[: sm.start()]):
            return [], "compressed content stream (no Flate decoder in this build)"
        data = sm.group(1)
        if b"BT" not in data:
            continue
        saw_stream = True
        try:
            runs = parse_text_runs(data.decode("latin-1"))
        except Exception as e:
            return [], f"content stream parse failed: {e}"
        spans.extend(analyze_layout(runs))
    for ref in media:
        spans.append(("media", "", ref))
    if not saw_stream and not media:
        return [], "no text content streams found"
    return spans, None


# --------------------------------------------------------------- writer


def write_pdf(items: List[Dict[str, Any]]) -> bytes:
    """Serialize a minimal single-page PDF with absolutely positioned text
    and optional image XObjects.

    Each item: {"text": str, "x": n, "y": n, "size": n} or
    {"image": True}.  Output is uncompressed, ASCII-safe (non-ASCII
    escaped as octal latin-1; fixture texts stay ASCII)."""
    parts: List[str] = []
    images = 0
    for it in items:
        if it.get("image"):
            images += 1
            continue
        text = str(it["text"]).replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        parts.append(
            f"BT /F1 {it.get('size', 12)} Tf {it['x']} {it['y']} Td ({text}) Tj ET"
        )
    stream = "\n".join(parts).encode("latin-1", "replace")

    objs: List[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"
    )
    objs.append(
        b"<< /Length %d >>\nstream\n%s\nendstream" % (len(stream), stream)
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for _ in range(images):
        pixel = b"\x7f"
        objs.append(
            b"<< /Subtype /Image /Width 1 /Height 1 /ColorSpace /DeviceGray "
            b"/BitsPerComponent 8 /Length 1 >>\nstream\n" + pixel + b"\nendstream"
        )

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
