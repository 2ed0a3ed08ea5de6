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

Real-world PDFs compress essentially every content stream — this lane
decodes the full text-bearing filter matrix: ``/FlateDecode`` and
``/LZWDecode`` (both with PNG/TIFF predictor un-filtering per
``/DecodeParms``), ``/ASCIIHexDecode``, ``/ASCII85Decode``,
``/RunLengthDecode``, and chains of them; it splits object streams
(``/Type /ObjStm``) into their member objects, resolves indirect
``/Length`` references, and decodes both literal ``(...)`` and hex
``<...>`` strings.  CID/Type0 composite fonts (every CJK/Unicode
producer) decode through their embedded ``/ToUnicode`` CMap, resolved
per page (``/Resources`` → ``/Font`` → font object → CMap stream,
bfchar/bfrange/codespacerange).  What still quarantines, deliberately:
encrypted documents (``/Encrypt``), Type0 fonts *without* a parseable
ToUnicode, and CID codes outside the CMap — emitting mojibake would
silently corrupt the training corpus, so those degrade to a
parse-error row like every other quarantined lane.
"""

from __future__ import annotations

import base64
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
_EARLY_RE = re.compile(rb"/EarlyChange\s+(\d+)")
_PAGE_TYPE_RE = re.compile(rb"/Type\s*/Page\b(?!s)")
_TOUNICODE_RE = re.compile(rb"/ToUnicode\s+(\d+)\s+\d+\s+R")
_OBJSTM_N_RE = re.compile(rb"/N\s+(\d+)")
_OBJSTM_FIRST_RE = re.compile(rb"/First\s+(\d+)")
_FONT_RES_RE = re.compile(rb"/(\w+)\s+(\d+)\s+\d+\s+R")
_REF_RE = re.compile(rb"(\d+)\s+\d+\s+R")
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


def _apply_predictor(dict_bytes: bytes, data: bytes) -> bytes:
    """Undo the /DecodeParms row predictor (shared by Flate and LZW —
    ISO 32000 defines /Predictor identically for both)."""
    pm = _PREDICTOR_RE.search(dict_bytes)
    pred = int(pm.group(1)) if pm else 1
    if pred <= 1:
        return data
    cm = _COLUMNS_RE.search(dict_bytes)
    columns = int(cm.group(1)) if cm else 1
    km = _COLORS_RE.search(dict_bytes)
    colors = int(km.group(1)) if km else 1
    bm = _BPC_RE.search(dict_bytes)
    bpc = int(bm.group(1)) if bm else 8
    if pred >= 10:
        return _png_unpredict(data, columns, colors, bpc)
    if pred == 2:
        return _tiff_unpredict(data, columns, colors, bpc)
    raise ValueError(f"unsupported predictor {pred}")


def _rle_decode(data: bytes) -> bytes:
    """/RunLengthDecode: length byte L → copy L+1 literal bytes (L<128)
    or repeat the next byte 257−L times (L>128); 128 is EOD."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        length = data[i]
        if length == 128:
            break
        if length < 128:
            if i + 2 + length > n:
                raise ValueError("truncated RunLength literal")
            out += data[i + 1 : i + 2 + length]
            i += 2 + length
        else:
            if i + 1 >= n:
                raise ValueError("truncated RunLength repeat")
            out += data[i + 1 : i + 2] * (257 - length)
            i += 2
    return bytes(out)


def _lzw_decode(data: bytes, early: int = 1) -> bytes:
    """/LZWDecode (ISO 32000 §7.4.4): MSB-first variable-width codes
    starting at 9 bits; 256 clears the table, 257 is EOD; the width
    bump happens ``early`` codes before the table fills (PDF default
    /EarlyChange 1)."""
    out = bytearray()
    table: List[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    prev: Optional[bytes] = None
    width = 9
    buf = nbits = 0
    for byte in data:
        buf = (buf << 8) | byte
        nbits += 8
        while nbits >= width:
            code = (buf >> (nbits - width)) & ((1 << width) - 1)
            nbits -= width
            if code == 256:
                del table[258:]
                width = 9
                prev = None
                continue
            if code == 257:
                return bytes(out)
            if prev is None:
                if code >= len(table):
                    raise ValueError("LZW code before table entry exists")
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                if len(table) < 4096:
                    table.append(prev + entry[:1])
            elif code == len(table) and len(table) < 4096:
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("LZW code beyond next table slot")
            out += entry
            prev = entry
            if len(table) + early - 1 >= (1 << width) - 1 and width < 12:
                width += 1
    return bytes(out)


def _decode_stream(dict_bytes: bytes, raw: bytes) -> bytes:
    """Apply the dict's filter chain (in array order) to raw stream
    bytes.

    Supports the text-bearing real-world filters — FlateDecode and
    LZWDecode (both with PNG/TIFF /DecodeParms predictors),
    ASCIIHexDecode, ASCII85Decode, RunLengthDecode, and chains of them
    (e.g. ``[/ASCII85Decode /FlateDecode]``).  Image-only codecs
    (DCTDecode, JBIG2, CCITT, JPX) raise ValueError for the caller to
    skip — they never carry text.
    """
    for name in _filters(dict_bytes):
        if name == b"FlateDecode":
            raw = _apply_predictor(dict_bytes, zlib.decompress(raw))
        elif name == b"LZWDecode":
            em = _EARLY_RE.search(dict_bytes)
            early = int(em.group(1)) if em else 1
            raw = _apply_predictor(dict_bytes, _lzw_decode(raw, early))
        elif name == b"ASCIIHexDecode":
            body = raw.split(b">", 1)[0]
            digits = re.sub(rb"\s", b"", body)
            if len(digits) % 2:
                digits += b"0"
            raw = bytes.fromhex(digits.decode("ascii"))
        elif name == b"ASCII85Decode":
            body = re.sub(rb"\s", b"", raw)
            if body.startswith(b"<~"):
                body = body[2:]
            if body.endswith(b"~>"):
                body = body[:-2]
            raw = base64.a85decode(body)
        elif name == b"RunLengthDecode":
            raw = _rle_decode(raw)
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


# ---------------------------------------------------- composite fonts

_CSR_SECT_RE = re.compile(rb"begincodespacerange(.*?)endcodespacerange", re.S)
_BFCHAR_SECT_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_SECT_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXSTR_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>")
_BFRANGE_TOK_RE = re.compile(rb"<[0-9A-Fa-f\s]*>|\[[^\]]*\]")

_MAX_BFRANGE_SPAN = 1 << 16  # sanity bound on materialized range size


def _hex_bytes(tok: bytes) -> bytes:
    digits = re.sub(rb"\s", b"", tok).strip(b"<>")
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii"))


def _utf16be(bs: bytes) -> str:
    return bs.decode("utf-16-be")


class ToUnicodeCMap:
    """A parsed /ToUnicode CMap: codespace ranges (so multi-byte codes
    segment correctly) plus a code→text mapping from bfchar/bfrange
    sections.  ``decode`` raises ValueError on any code outside the
    mapping — the document quarantines rather than emit mojibake."""

    __slots__ = ("ranges", "mapping")

    def __init__(
        self,
        ranges: List[Tuple[bytes, bytes]],
        mapping: Dict[bytes, str],
    ) -> None:
        # shortest codespace ranges first: ISO 32000 matches the
        # shortest range that covers the next bytes
        self.ranges = sorted(ranges, key=lambda r: len(r[0]))
        self.mapping = mapping

    def decode(self, bs: bytes) -> str:
        out: List[str] = []
        i, n = 0, len(bs)
        while i < n:
            for lo, hi in self.ranges:
                ln = len(lo)
                code = bs[i : i + ln]
                if len(code) == ln and lo <= code <= hi:
                    try:
                        out.append(self.mapping[code])
                    except KeyError:
                        raise ValueError(
                            f"Type0 code <{code.hex()}> not in ToUnicode CMap"
                        ) from None
                    i += ln
                    break
            else:
                raise ValueError(
                    f"byte sequence at {i} outside CMap codespace"
                )
        return "".join(out)


def parse_tounicode(data: bytes) -> ToUnicodeCMap:
    """Parse a /ToUnicode CMap stream (Adobe CMap syntax subset:
    codespacerange + bfchar + bfrange, the sections ISO 32000 §9.10.3
    requires of ToUnicode CMaps).  bfrange destinations may be a start
    hex string (incremented per code) or an array of hex strings."""
    ranges: List[Tuple[bytes, bytes]] = []
    for sect in _CSR_SECT_RE.finditer(data):
        toks = _HEXSTR_RE.findall(sect.group(1))
        for k in range(0, len(toks) - 1, 2):
            lo, hi = _hex_bytes(toks[k]), _hex_bytes(toks[k + 1])
            if len(lo) == len(hi) and lo <= hi:
                ranges.append((lo, hi))
    mapping: Dict[bytes, str] = {}
    for sect in _BFCHAR_SECT_RE.finditer(data):
        toks = _HEXSTR_RE.findall(sect.group(1))
        for k in range(0, len(toks) - 1, 2):
            mapping[_hex_bytes(toks[k])] = _utf16be(_hex_bytes(toks[k + 1]))
    for sect in _BFRANGE_SECT_RE.finditer(data):
        toks = _BFRANGE_TOK_RE.findall(sect.group(1))
        for k in range(0, len(toks) - 2, 3):
            lo = _hex_bytes(toks[k])
            hi = _hex_bytes(toks[k + 1])
            dst = toks[k + 2]
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            if hi_i - lo_i >= _MAX_BFRANGE_SPAN:
                raise ValueError("bfrange span too large")
            if dst.startswith(b"["):
                dsts = [_hex_bytes(t) for t in _HEXSTR_RE.findall(dst)]
                for off, db in enumerate(dsts):
                    if lo_i + off > hi_i:
                        break
                    mapping[
                        (lo_i + off).to_bytes(len(lo), "big")
                    ] = _utf16be(db)
            else:
                db = _hex_bytes(dst)
                base = int.from_bytes(db, "big")
                for off in range(hi_i - lo_i + 1):
                    mapping[(lo_i + off).to_bytes(len(lo), "big")] = _utf16be(
                        (base + off).to_bytes(len(db), "big")
                    )
    if not ranges:
        # degenerate but seen in the wild: infer the code length from
        # the mapped keys (uniform), else default to 2-byte CIDs
        lens = {len(k) for k in mapping} or {2}
        for ln in lens:
            ranges.append((b"\x00" * ln, b"\xff" * ln))
    return ToUnicodeCMap(ranges, mapping)


def _split_objstm(dict_bytes: bytes, data: bytes) -> Dict[int, bytes]:
    """An inflated /ObjStm body → {obj_num: object bytes}.  The first
    /First bytes are ``num offset`` integer pairs; objects follow in
    offset order (streams are not permitted inside ObjStm, so every
    entry is a plain dict/value)."""
    nm = _OBJSTM_N_RE.search(dict_bytes)
    fm = _OBJSTM_FIRST_RE.search(dict_bytes)
    if not nm or not fm:
        return {}
    n, first = int(nm.group(1)), int(fm.group(1))
    head = data[:first].split()
    out: Dict[int, bytes] = {}
    try:
        nums = [int(x) for x in head[0::2]][:n]
        offs = [int(x) for x in head[1::2]][:n]
    except ValueError:
        return {}
    for k, (num, off) in enumerate(zip(nums, offs)):
        end = first + offs[k + 1] if k + 1 < len(offs) else len(data)
        out[num] = data[first + off : end]
    return out


def _balanced_dict(buf: bytes, start: int) -> Optional[bytes]:
    """``buf[start:]`` starts at ``<<`` → the balanced ``<< ... >>``
    slice (nesting-aware), else None."""
    if buf[start : start + 2] != b"<<":
        return None
    depth = 0
    i = start
    n = len(buf)
    while i < n - 1:
        pair = buf[i : i + 2]
        if pair == b"<<":
            depth += 1
            i += 2
        elif pair == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return buf[start:i]
        else:
            i += 1
    return None


def _dict_value(
    dict_bytes: bytes, key: bytes, objects: Dict[int, bytes]
) -> Optional[bytes]:
    """The value of ``/Key`` in a dict: an inline ``<<...>>`` slice, an
    ``[...]`` slice, or the referenced object's bytes for ``N 0 R``."""
    m = re.search(rb"/" + key + rb"\b", dict_bytes)
    if not m:
        return None
    i = m.end()
    n = len(dict_bytes)
    while i < n and dict_bytes[i : i + 1] in b" \t\r\n":
        i += 1
    if dict_bytes[i : i + 2] == b"<<":
        return _balanced_dict(dict_bytes, i)
    if dict_bytes[i : i + 1] == b"[":
        end = dict_bytes.find(b"]", i)
        return dict_bytes[i : end + 1] if end != -1 else None
    rm = _REF_RE.match(dict_bytes, i)
    if rm:
        return objects.get(int(rm.group(1)))
    return None


def _page_font_maps(
    objects: Dict[int, bytes],
    raw_streams: Dict[int, Tuple[bytes, bytes]],
) -> Tuple[Dict[int, Dict[str, Optional[ToUnicodeCMap]]], Optional[str]]:
    """Resolve each page's /Resources /Font table.

    Returns ({content_obj_num: {font_name: ToUnicodeCMap | None}},
    error).  A simple (non-Type0) font maps to None (decode latin-1 as
    before); a Type0 font maps to its parsed ToUnicode CMap.  A Type0
    font without a parseable ToUnicode anywhere in the document is a
    quarantine — its 2-byte glyph indices cannot be mapped to text."""
    font_cache: Dict[int, Optional[ToUnicodeCMap]] = {}

    def resolve_font(ref: int) -> Optional[ToUnicodeCMap]:
        if ref in font_cache:
            return font_cache[ref]
        fdict = objects.get(ref)
        if fdict is None and ref in raw_streams:
            fdict = raw_streams[ref][0]
        cmap: Optional[ToUnicodeCMap] = None
        if fdict is not None and _TYPE0_RE.search(fdict):
            tm = _TOUNICODE_RE.search(fdict)
            if not tm:
                raise ValueError(
                    "CID/Type0 composite font without ToUnicode CMap"
                )
            tu_ref = int(tm.group(1))
            if tu_ref not in raw_streams:
                raise ValueError("ToUnicode CMap stream missing")
            tdict, traw = raw_streams[tu_ref]
            cmap = parse_tounicode(_decode_stream(tdict, traw))
        font_cache[ref] = cmap
        return cmap

    maps: Dict[int, Dict[str, Optional[ToUnicodeCMap]]] = {}
    try:
        for num, body in list(objects.items()):
            if not _PAGE_TYPE_RE.search(body):
                continue
            cm_ = re.search(rb"/Contents\s*(\[[^\]]*\]|\d+\s+\d+\s+R)", body)
            content_refs = (
                [int(r) for r in _REF_RE.findall(cm_.group(1))] if cm_ else []
            )
            res = _dict_value(body, b"Resources", objects)
            fonts: Dict[str, Optional[ToUnicodeCMap]] = {}
            if res is not None:
                fdict = _dict_value(res, b"Font", objects)
                if fdict is not None:
                    for fm in _FONT_RES_RE.finditer(fdict):
                        fonts[fm.group(1).decode("ascii")] = resolve_font(
                            int(fm.group(2))
                        )
            for ref in content_refs:
                maps[ref] = fonts
    except ValueError as e:
        return {}, str(e)
    return maps, None


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

# TJ array members: strings AND kerning offsets (thousandths of an em).
# Producers justify text with negative offsets instead of space glyphs;
# an offset at or past the threshold renders as a word gap.
_TJ_TOK_RE = re.compile(
    r"\((?:\\.|[^\\()])*\)|<[0-9A-Fa-f\s]*>|-?\d+(?:\.\d+)?", re.DOTALL
)
TJ_WORD_GAP = 180.0  # milli-em; kerning is typically <100, a space ≥250


def _hex_to_text(tok: str) -> str:
    """``<48 65 6c>`` → ``Hel`` — hex strings decode bytewise for simple
    (single-byte) fonts; an odd trailing digit is zero-padded per spec."""
    digits = re.sub(r"\s", "", tok[1:-1])
    if len(digits) % 2:
        digits += "0"
    return bytes.fromhex(digits).decode("latin-1")


def _string_token_text(
    tok: str, cmap: Optional[ToUnicodeCMap] = None
) -> str:
    """A string token → text.  Simple fonts decode bytewise (latin-1 is
    byte-transparent); a composite font's string is a CID code sequence
    mapped through its ToUnicode CMap (hex and literal strings alike —
    both are byte strings per ISO 32000 §7.3.4)."""
    if tok.startswith("("):
        s = _unescape(tok[1:-1])
        if cmap is None:
            return s
        return cmap.decode(s.encode("latin-1"))
    if tok.startswith("<"):
        if cmap is None:
            return _hex_to_text(tok)
        return cmap.decode(_hex_bytes(tok.encode("ascii")))
    return ""


def parse_text_runs(
    content: str,
    fonts: _StreamFonts = None,
    strict: bool = False,
) -> List[TextRun]:
    """Execute the text-positioning subset of a content stream.

    ``fonts`` maps resource names (``F1``) to None (simple font,
    latin-1 bytes) or a ToUnicodeCMap (composite font).  ``strict``
    (set for documents that declare composite fonts) makes an
    unresolvable ``Tf`` name an error instead of a latin-1 fallback —
    guessing the encoding there could emit mojibake."""
    cur_cmap: Optional[ToUnicodeCMap] = None
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
            name_tok = stack[-2]
            if name_tok.startswith("/"):
                fname = name_tok[1:]
                if fonts is not None and fname in fonts:
                    cur_cmap = fonts[fname]
                elif strict:
                    raise ValueError(
                        f"font /{fname} not resolvable in a composite-font "
                        "document"
                    )
                else:
                    cur_cmap = None
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
            text = _string_token_text(stack[-1], cur_cmap)
            if text:
                runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "'" and stack:
            ly -= leading
            x, y = lx, ly
            text = _string_token_text(stack[-1], cur_cmap)
            if text:
                runs.append(TextRun(x, y, size, text))
            stack.clear()
        elif op == "TJ" and stack:
            arr = stack[-1]
            if arr.startswith("["):
                parts: List[str] = []
                for tok in _TJ_TOK_RE.findall(arr):
                    if tok.startswith("(") or tok.startswith("<"):
                        parts.append(_string_token_text(tok, cur_cmap))
                    else:
                        # Kerning offset (milli-em, SUBTRACTED from the
                        # advance): a negative value at or past the
                        # threshold renders as a word gap — emit a space
                        # unless one already bounds the seam.
                        try:
                            adj = float(tok)
                        except ValueError:
                            continue
                        if adj <= -TJ_WORD_GAP and parts and parts[-1] \
                                and not parts[-1].endswith(" "):
                            parts.append(" ")
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


MIN_COLUMN_GAP = 18.0
MIN_COLUMN_LINES = 3
MIN_COLUMN_WIDTH = 60.0
MIN_COLUMN_FILL = 0.55
MAX_COLUMN_DEPTH = 3
#: single-fill splits additionally require the sides' line counts to be
#: balanced: a genuine two-column band has comparable counts, while a
#: wide table's overhanging column or margin notes put a few sparse
#: lines against a full prose side (found by the round-5 PDF layout QA
#: probe — tearing those off reads the page out of order)
COLUMN_BALANCE = 0.5


def _run_width(r: TextRun) -> float:
    """Estimated advance width: ~0.5 em per latin glyph, ~1 em per CJK
    glyph (no font metrics ship in a content stream; this is the
    standard average-width approximation)."""
    return r.size * sum(1.0 if ord(c) > 0xFF else 0.5 for c in r.text)


def _valleys(lines: List[List[TextRun]]) -> List[Tuple[float, float]]:
    """Maximal vertical whitespace gaps ≥ MIN_COLUMN_GAP strictly inside
    the text extent, widest first — column-split candidates."""
    intervals = sorted(
        (r.x, r.x + _run_width(r)) for line in lines for r in line
    )
    if not intervals:
        return []
    gaps: List[Tuple[float, float]] = []
    cover_end = intervals[0][1]
    for lo, hi in intervals[1:]:
        if lo > cover_end + MIN_COLUMN_GAP:
            gaps.append((cover_end, lo))
        cover_end = max(cover_end, hi)
    gaps.sort(key=lambda g: g[1] - g[0], reverse=True)
    return gaps


def _split_line(
    line: List[TextRun], lo: float, hi: float
) -> Tuple[List[TextRun], List[TextRun], bool]:
    """Partition a line's runs against a valley → (left runs, right
    runs, crosses) where crosses means some run overlaps the valley
    itself (a full-width title/footer — a hard band separator)."""
    left: List[TextRun] = []
    right: List[TextRun] = []
    crosses = False
    for r in line:
        a, b = r.x, r.x + _run_width(r)
        if a < hi and b > lo:
            crosses = True
        elif b <= lo:
            left.append(r)
        else:
            right.append(r)
    return left, right, crosses


def _fill_ok(lines_side: List[List[TextRun]], x0: float, x1: float) -> bool:
    """True when a side reads as genuine column text: the extent is at
    least a column wide and the median line fills most of it.  Table
    cells are short relative to their column pitch, so table sides
    fail this — the discriminator that keeps x-aligned tables from
    being torn into fake columns (their rows, like aligned column
    baselines, have runs on both sides of every internal gap)."""
    extent = x1 - x0
    if extent < MIN_COLUMN_WIDTH or not lines_side:
        return False
    ratios = sorted(
        sum(_run_width(r) for r in line) / extent for line in lines_side
    )
    return ratios[len(ratios) // 2] >= MIN_COLUMN_FILL


def order_columns(
    lines: List[List[TextRun]], _depth: int = 0
) -> List[List[TextRun]]:
    """Multi-column reading order (recursive XY-cut over whitespace
    valleys).

    Globally y-clustered lines interleave columns line-by-line — a
    two-column page reads as alternating half-lines without this.
    Lines whose runs overlap a valley (title, footer) are horizontal
    band separators; each band between them splits independently, so a
    spanning title above two columns reads title → left column → right
    column.  A band splits only when both sides carry
    ≥ MIN_COLUMN_LINES lines AND pass the ``_fill_ok`` column-text
    test; aligned-baseline lines are torn into their per-column halves
    and each side recurses, so 3+ column layouts resolve while
    x-aligned tables (short cells, low fill) stay row-major."""
    # a single paired baseline carries a line on BOTH sides, so the
    # cheap exit is per-side, not per-baseline
    if _depth >= MAX_COLUMN_DEPTH or len(lines) < MIN_COLUMN_LINES:
        return lines
    for lo, hi in _valleys(lines):
        splits = [_split_line(line, lo, hi) for line in lines]
        out: List[List[TextRun]] = []
        changed = False
        i = 0
        n = len(lines)
        while i < n:
            if splits[i][2]:  # crossing line: band separator
                out.append(lines[i])
                i += 1
                continue
            j = i
            while j < n and not splits[j][2]:
                j += 1
            band = lines[i:j]
            lefts = [s[0] for s in splits[i:j] if s[0]]
            rights = [s[1] for s in splits[i:j] if s[1]]
            min_x = min((r.x for line in band for r in line), default=lo)
            max_x = max(
                (r.x + _run_width(r) for line in band for r in line),
                default=hi,
            )
            fill_l = _fill_ok(lefts, min_x, lo)
            fill_r = _fill_ok(rights, hi, max_x)
            # both sides read as column text → split; one side does and
            # the baselines are NOT perfectly row-paired → split (a
            # genuine table pairs every row), but ONLY when the sides'
            # line counts are balanced (COLUMN_BALANCE) — otherwise a
            # page of prose tears off any sparse overhang (a wide
            # table's last column, margin notes) into a fake second
            # column and reads it out of order; perfectly-paired mixed
            # content stays row-major — the conservative reading for a
            # machine-readability checker whose primary object is tables
            paired = all(s[0] and s[1] for s in splits[i:j])
            balanced = (
                min(len(lefts), len(rights))
                >= COLUMN_BALANCE * max(len(lefts), len(rights))
            )
            # a real column also OCCUPIES column width even when its
            # fill is ragged; a wide table's overhanging cells span
            # only their own glyphs (round-5 layout-QA finding #2)
            wide_l = (lo - min_x) >= MIN_COLUMN_WIDTH and bool(lefts)
            wide_r = (max_x - hi) >= MIN_COLUMN_WIDTH and bool(rights)
            if (
                len(lefts) >= MIN_COLUMN_LINES
                and len(rights) >= MIN_COLUMN_LINES
                and (
                    (fill_l and fill_r)
                    or (
                        (fill_l or fill_r)
                        and wide_l
                        and wide_r
                        and not paired
                        and balanced
                    )
                )
            ):
                out.extend(order_columns(lefts, _depth + 1))
                out.extend(order_columns(rights, _depth + 1))
                changed = True
            else:
                out.extend(band)
            i = j
        if changed:
            return out

    # No usable valley over the whole set: full-width lines (title,
    # footer) plug the gap in the global coverage.  Cut horizontally on
    # them and recurse per band — the other half of a classic XY-cut.
    all_runs = [r for line in lines for r in line]
    min_x = min(r.x for r in all_runs)
    max_x = max(r.x + _run_width(r) for r in all_runs)
    page_w = max_x - min_x
    if page_w <= 0:
        return lines
    mid = min_x + page_w / 2.0
    is_wide = [
        any(r.x < mid < r.x + _run_width(r) for r in line)
        for line in lines
    ]
    if not any(is_wide) or all(is_wide):
        return lines
    out2: List[List[TextRun]] = []
    changed2 = False
    i = 0
    n = len(lines)
    while i < n:
        if is_wide[i]:
            out2.append(lines[i])
            i += 1
            continue
        j = i
        while j < n and not is_wide[j]:
            j += 1
        band = lines[i:j]
        reordered = order_columns(band, _depth + 1)
        if reordered != band:
            changed2 = True
        out2.extend(reordered)
        i = j
    return out2 if changed2 else lines


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
    x-alignment table detection; multi-column pages reorder
    column-major first (``order_columns``)."""
    lines = order_columns(cluster_lines(runs))
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


_StreamFonts = Optional[Dict[str, Optional["ToUnicodeCMap"]]]


def _collect_text_streams(
    content: bytes,
) -> Tuple[List[Tuple[bytes, _StreamFonts, bool]], List[str], Optional[str]]:
    """Walk a PDF's objects and return (decoded text content streams
    with their page font tables, media refs, parse_error) — the shared
    front half of the span and table lanes, so both apply identical
    quarantine gates.

    Composite (Type0/CID) fonts resolve through their embedded
    /ToUnicode CMap (page /Resources → /Font → font object → CMap
    stream, with objects hidden inside /ObjStm object streams split out
    and resolvable).  A Type0 font *without* a parseable ToUnicode
    anywhere in the document still quarantines — its 2-byte glyph
    indices cannot be mapped to text, and emitting mojibake would
    silently corrupt the corpus.  Each returned triple is
    (stream bytes, font table or None, strict) where strict means the
    document declares composite fonts, so an unresolvable /Fx reference
    at parse time is an error instead of a latin-1 fallback."""
    if not content.startswith(b"%PDF"):
        return [], [], "not a pdf"
    if _ENCRYPT_RE.search(content):
        return [], [], "encrypted pdf (/Encrypt) not supported"

    media: List[str] = []
    objects: Dict[int, bytes] = {}
    raw_streams: Dict[int, Tuple[bytes, bytes]] = {}
    text_nums: List[int] = []
    decoded: Dict[int, bytes] = {}
    for obj_num, dict_bytes, raw in _iter_stream_objects(content):
        if raw is None:
            objects.setdefault(obj_num, dict_bytes)
            continue
        raw_streams[obj_num] = (dict_bytes, raw)
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
            for num, body in _split_objstm(dict_bytes, data).items():
                objects.setdefault(num, body)
            continue
        if b"BT" not in data or b"ET" not in data:
            continue
        text_nums.append(obj_num)
        decoded[obj_num] = data

    has_type0 = any(
        _TYPE0_RE.search(body) for body in objects.values()
    ) or any(_TYPE0_RE.search(d) for d, _ in raw_streams.values())
    if not has_type0:
        return [(decoded[n], None, False) for n in text_nums], media, None

    # composite-font document: every Type0 declaration must carry a
    # parseable ToUnicode, whether referenced or not (an unreferenced
    # one means our page/resource walk may have missed a use)
    maps, err = _page_font_maps(objects, raw_streams)
    if err is not None:
        return [], [], err
    try:
        for body in list(objects.values()) + [
            d for d, _ in raw_streams.values()
        ]:
            if _TYPE0_RE.search(body) and b"/Font" in body:
                tm = _TOUNICODE_RE.search(body)
                if not tm:
                    raise ValueError(
                        "CID/Type0 composite font without ToUnicode CMap"
                    )
                tu = raw_streams.get(int(tm.group(1)))
                if tu is None:
                    raise ValueError("ToUnicode CMap stream missing")
                parse_tounicode(_decode_stream(tu[0], tu[1]))
    except (ValueError, zlib.error) as e:
        return [], [], str(e)

    merged: Dict[str, Optional[ToUnicodeCMap]] = {}
    for fonts in maps.values():
        merged.update(fonts)
    out = [
        (decoded[n], maps.get(n, merged), True) for n in text_nums
    ]
    return out, media, None


def extract_pdf_spans(content: bytes) -> Tuple[List[Tuple[str, str, str]], Optional[str]]:
    """PDF bytes → (ordered (kind,text,media_ref) triples, parse_error).

    Flate/LZW/ASCII-compressed content streams decode in place; object
    streams (/Type /ObjStm) split so declarations hidden in them still
    resolve.  CID/Type0 composite fonts decode through their embedded
    /ToUnicode CMap; encrypted PDFs and Type0 fonts *without* a
    ToUnicode quarantine (decoding those without keys/CMaps would emit
    garbage)."""
    text_streams, media, err = _collect_text_streams(content)
    if err is not None:
        return [], err

    spans: List[Tuple[str, str, str]] = []
    for data, fonts, strict in text_streams:
        try:
            runs = parse_text_runs(data.decode("latin-1"), fonts, strict)
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
    for data, fonts, strict in text_streams:
        try:
            runs = parse_text_runs(data.decode("latin-1"), fonts, strict)
        except Exception as e:
            return [], f"content stream parse failed: {e}"
        lines = order_columns(cluster_lines(runs))
        for i, j in table_blocks(lines):
            grids.append(densify_block(lines[i : j + 1]))
    return grids, None


# --------------------------------------------------------------- writer


def _escape_lit(s: str) -> str:
    """Escape a latin-1 string for a PDF literal ``( )`` token."""
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def _latin1_ok(s: str) -> bool:
    try:
        s.encode("latin-1")
        return True
    except UnicodeEncodeError:
        return False


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


def _rle_encode(data: bytes) -> bytes:
    """Fixture RunLength encoder: repeat-runs of ≥3 become (257−n, byte),
    everything else literal chunks — exercises both decode branches."""
    out = bytearray()
    i, n = 0, len(data)
    lit_start = i
    while i < n:
        j = i
        while j < n and data[j] == data[i] and j - i < 127:
            j += 1
        if j - i >= 3:
            if lit_start < i:
                _rle_flush_literals(out, data, lit_start, i)
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            lit_start = i
        else:
            i = j
    if lit_start < n:
        _rle_flush_literals(out, data, lit_start, n)
    out.append(128)
    return bytes(out)


def _rle_flush_literals(out: bytearray, data: bytes, lo: int, hi: int) -> None:
    for k in range(lo, hi, 128):
        chunk = data[k : min(k + 128, hi)]
        out.append(len(chunk) - 1)
        out += chunk


def _lzw_encode(data: bytes, early: int = 1) -> bytes:
    """Fixture LZW encoder — the exact inverse of ``_lzw_decode``
    (clear code first, MSB-first variable width, early width change)."""
    out = bytearray()
    buf = nbits = 0
    width = 9

    def emit(code: int) -> None:
        nonlocal buf, nbits
        buf = (buf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((buf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(256)
    table: Dict[bytes, int] = {bytes([i]): i for i in range(256)}
    next_code = 258
    w = b""
    for byte in data:
        wc = w + bytes([byte])
        if wc in table:
            w = wc
            continue
        emit(table[w])
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code + early - 1 >= (1 << width) and width < 12:
                width += 1
        else:  # table full: spec requires a Clear code and a fresh table
            emit(256)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w])
    emit(257)
    if nbits:
        out.append((buf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _encode_filters(stream: bytes, names: List[str]) -> bytes:
    """Apply a fixture filter chain in ENCODE order (the reverse of the
    /Filter array's decode order)."""
    for name in reversed(names):
        if name == "FlateDecode":
            stream = zlib.compress(stream)
        elif name == "LZWDecode":
            stream = _lzw_encode(stream)
        elif name == "ASCIIHexDecode":
            stream = stream.hex().encode("ascii") + b">"
        elif name == "ASCII85Decode":
            stream = base64.a85encode(stream) + b"~>"
        elif name == "RunLengthDecode":
            stream = _rle_encode(stream)
        else:
            raise ValueError(f"fixture encoder: unknown filter {name}")
    return stream


def _build_tounicode(chars: List[str]) -> bytes:
    """A sorted char list (code = index+1) → ToUnicode CMap bytes, with
    consecutive-codepoint runs as bfrange entries and the rest as
    bfchar — so fixtures exercise both mapping section kinds."""
    bfranges: List[Tuple[int, int, int]] = []
    bfchars: List[Tuple[int, str]] = []
    i = 0
    while i < len(chars):
        j = i
        while (
            j + 1 < len(chars)
            and ord(chars[j]) < 0xFFFF
            and ord(chars[j + 1]) == ord(chars[j]) + 1
        ):
            j += 1
        if j > i:
            bfranges.append((i + 1, j + 1, ord(chars[i])))
        else:
            bfchars.append((i + 1, chars[i]))
        i = j + 1
    parts = [
        "/CIDInit /ProcSet findresource begin",
        "12 dict begin",
        "begincmap",
        "/CMapName /Fixture-UTF16 def",
        "/CMapType 2 def",
        "1 begincodespacerange",
        "<0000> <FFFF>",
        "endcodespacerange",
    ]
    for k in range(0, len(bfchars), 100):
        chunk = bfchars[k : k + 100]
        parts.append(f"{len(chunk)} beginbfchar")
        for code, ch in chunk:
            dst = ch.encode("utf-16-be").hex()
            parts.append(f"<{code:04x}> <{dst}>")
        parts.append("endbfchar")
    for k in range(0, len(bfranges), 100):
        chunk = bfranges[k : k + 100]
        parts.append(f"{len(chunk)} beginbfrange")
        for lo, hi, dst in chunk:
            parts.append(f"<{lo:04x}> <{hi:04x}> <{dst:04x}>")
        parts.append("endbfrange")
    parts += [
        "endcmap",
        "CMapName currentdict /CMap defineresource pop",
        "end",
        "end",
    ]
    return "\n".join(parts).encode("ascii")


def write_pdf(
    items: List[Dict[str, Any]],
    compress: bool = False,
    predictor_columns: Optional[int] = None,
    hex_strings: bool = False,
    indirect_length: bool = False,
    content_filters: Optional[List[str]] = None,
) -> bytes:
    """Serialize a minimal single-page PDF with absolutely positioned text
    and optional image XObjects.

    Each item: {"text": str, "x": n, "y": n, "size": n} or
    {"image": True}.  Any item whose text does not fit latin-1 renders
    through a Type0 composite font (/F2, Identity-H layout) with an
    embedded /ToUnicode CMap — CIDs assigned per distinct character,
    text emitted as 2-byte-code hex strings, exactly the structure real
    CJK/Unicode producers write.

    ``compress=True`` Flate-compresses the content stream (the
    real-world layout — virtually every production PDF does this);
    ``predictor_columns`` additionally applies a PNG Up row predictor;
    ``hex_strings=True`` emits latin-1 text as ``<hex> Tj`` tokens;
    ``indirect_length=True`` writes ``/Length N 0 R`` via a separate
    numeric object, as real writers that stream output do;
    ``content_filters`` overrides ``compress`` with an explicit decode
    chain for the content stream (e.g. ``["ASCII85Decode",
    "FlateDecode"]``)."""
    uni_chars = sorted(
        {
            ch
            for it in items
            if not it.get("image") and not _latin1_ok(str(it["text"]))
            for ch in str(it["text"])
        }
    )
    codes = {ch: i + 1 for i, ch in enumerate(uni_chars)}

    parts: List[str] = []
    images = 0
    for it in items:
        if it.get("image"):
            images += 1
            continue
        raw = str(it["text"])
        if not _latin1_ok(raw):
            cid_hex = "".join(f"{codes[ch]:04x}" for ch in raw)
            parts.append(
                f"BT /F2 {it.get('size', 12)} Tf {it['x']} {it['y']} Td "
                f"<{cid_hex}> Tj ET"
            )
            continue
        if it.get("tj"):
            # Justified-producer layout: words as TJ array members with
            # −250 milli-em gaps instead of space glyphs, plus a small
            # intra-word kern (−15) that must NOT read as a gap.
            arr: List[str] = []
            for wi, word in enumerate(raw.split(" ")):
                if wi:
                    arr.append("-250")
                if len(word) > 3:
                    head, tail = word[:2], word[2:]
                    arr.append(f"({_escape_lit(head)}) -15 ({_escape_lit(tail)})")
                elif word:
                    arr.append(f"({_escape_lit(word)})")
            parts.append(
                f"BT /F1 {it.get('size', 12)} Tf {it['x']} {it['y']} Td "
                f"[{' '.join(arr)}] TJ ET"
            )
            continue
        if hex_strings:
            lit = "<" + raw.encode("latin-1").hex() + ">"
        else:
            lit = f"({_escape_lit(raw)})"
        parts.append(
            f"BT /F1 {it.get('size', 12)} Tf {it['x']} {it['y']} Td {lit} Tj ET"
        )
    stream = "\n".join(parts).encode("latin-1")

    filter_entry = b""
    if content_filters:
        stream = _encode_filters(stream, content_filters)
        filter_entry = (
            b" /Filter [" +
            b" ".join(b"/" + n.encode("ascii") for n in content_filters) +
            b"]"
        )
    elif compress:
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

    font_res = b"/F1 5 0 R"
    if uni_chars:
        font_res += b" /F2 6 0 R"
    objs: List[bytes] = []
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    objs.append(
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << " + font_res + b" >> >> >>"
    )
    n_fixed = 5 + (3 if uni_chars else 0)
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
    if uni_chars:
        objs.append(
            b"<< /Type /Font /Subtype /Type0 /BaseFont /Fixture "
            b"/Encoding /Identity-H /DescendantFonts [7 0 R] "
            b"/ToUnicode 8 0 R >>"
        )
        objs.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /Fixture "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> >>"
        )
        cmap = _build_tounicode(uni_chars)
        tu_filter = b""
        if compress or content_filters:
            cmap = zlib.compress(cmap)
            tu_filter = b" /Filter /FlateDecode"
        objs.append(
            b"<< /Length %d" % len(cmap) + tu_filter + b" >>\nstream\n"
            + cmap + b"\nendstream"
        )
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
