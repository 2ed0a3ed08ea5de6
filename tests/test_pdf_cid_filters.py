"""CID/Type0 composite-font decoding + the full text-bearing stream
filter matrix.

Covers:
- LZW / RunLength fixture-codec round trips, including the 4096-entry
  table-full Clear-code path and both RLE branches;
- every filter and representative chains extract span-identically to
  the uncompressed twin;
- ToUnicode CMap parsing: bfchar, bfrange (increment + array dst),
  multi-char (ligature) destinations, non-BMP surrogate pairs, mixed
  1-/2-byte codespace segmentation;
- quarantine honesty: Type0 without ToUnicode, CID code outside the
  CMap, bytes outside every codespace range — never mojibake;
- ObjStm member splitting (page/font dicts hidden in object streams
  still resolve);
- the fixture family ``fam_pdf_cjk`` decodes across all its filter
  variants.
"""

from __future__ import annotations

import random
import zlib

import pytest

from machine_readability_checker_spark.core.pdf import (
    ToUnicodeCMap,
    _lzw_decode,
    _lzw_encode,
    _rle_decode,
    _rle_encode,
    _split_objstm,
    extract_pdf_spans,
    parse_tounicode,
    write_pdf,
)


# ------------------------------------------------------------- codecs


@pytest.mark.parametrize("blob", [
    b"",
    b"a",
    b"abababab" * 80,
    bytes(range(256)) * 12,
    b"x" * 20000,
])
def test_lzw_round_trip(blob):
    assert _lzw_decode(_lzw_encode(blob)) == blob


def test_lzw_table_full_clear():
    """>4096 distinct phrases force the encoder's Clear-code reset and
    the decoder's table-growth cap — random bytes get there fastest."""
    rng = random.Random(0)
    blob = bytes(rng.randrange(256) for _ in range(20000))
    assert _lzw_decode(_lzw_encode(blob)) == blob


@pytest.mark.parametrize("blob", [
    b"", b"abc", b"aaaaaaaa", b"ab" * 300, b"a" * 1000 + b"xyz",
])
def test_rle_round_trip(blob):
    assert _rle_decode(_rle_encode(blob)) == blob


# ------------------------------------------------- filter-chain parity


_ITEMS = [
    {"text": "Chained Filters Report", "x": 72, "y": 760, "size": 20},
    {"text": "body line one of the page", "x": 72, "y": 720, "size": 11},
    {"text": "body line two of the page", "x": 72, "y": 705, "size": 11},
]


@pytest.mark.parametrize("filters", [
    ["ASCIIHexDecode"],
    ["ASCII85Decode"],
    ["RunLengthDecode"],
    ["LZWDecode"],
    ["ASCII85Decode", "FlateDecode"],
    ["ASCIIHexDecode", "LZWDecode"],
    ["ASCII85Decode", "RunLengthDecode"],
])
def test_filter_chains_extract_identically(filters):
    base, err0 = extract_pdf_spans(write_pdf(_ITEMS))
    assert err0 is None
    spans, err = extract_pdf_spans(write_pdf(_ITEMS, content_filters=filters))
    assert err is None, (filters, err)
    assert spans == base, filters


# --------------------------------------------------- ToUnicode parsing


def test_parse_tounicode_bfchar_and_bfrange():
    cmap = parse_tounicode(b"""
    1 begincodespacerange
    <0000> <FFFF>
    endcodespacerange
    2 beginbfchar
    <0001> <65E5>
    <0002> <672C>
    endbfchar
    1 beginbfrange
    <0010> <0012> <3042>
    endbfrange
    """)
    assert cmap.decode(bytes.fromhex("00010002")) == "日本"
    assert cmap.decode(bytes.fromhex("001000110012")) == "あぃい"


def test_parse_tounicode_array_dst_and_ligature():
    cmap = parse_tounicode(b"""
    1 begincodespacerange
    <00> <FF>
    endcodespacerange
    1 beginbfrange
    <20> <21> [<006600660069> <0041>]
    endbfrange
    """)
    # one CID maps to the three-char ligature expansion "ffi"
    assert cmap.decode(b"\x20\x21") == "ffiA"


def test_parse_tounicode_non_bmp_surrogates():
    # U+1F600 as a UTF-16BE surrogate pair in a bfchar destination
    cmap = parse_tounicode(b"""
    1 begincodespacerange
    <0000> <FFFF>
    endcodespacerange
    1 beginbfchar
    <0003> <D83DDE00>
    endbfchar
    """)
    assert cmap.decode(b"\x00\x03") == "\U0001f600"


def test_mixed_codespace_segmentation():
    """1-byte and 2-byte codespace ranges segment correctly: the
    shortest covering range wins per ISO 32000."""
    cmap = ToUnicodeCMap(
        ranges=[(b"\x00", b"\x7f"), (b"\x80\x00", b"\xff\xff")],
        mapping={b"\x41": "A", b"\x80\x01": "あ"},
    )
    assert cmap.decode(b"\x41\x80\x01\x41") == "AあA"


def test_unmapped_code_raises():
    cmap = parse_tounicode(
        b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
        b"1 beginbfchar <0001> <0041> endbfchar"
    )
    with pytest.raises(ValueError, match="not in ToUnicode"):
        cmap.decode(b"\x00\x09")


def test_out_of_codespace_raises():
    cmap = ToUnicodeCMap(
        ranges=[(b"\x00\x00", b"\x7f\xff")],
        mapping={b"\x00\x01": "A"},
    )
    with pytest.raises(ValueError, match="outside CMap codespace"):
        cmap.decode(b"\x90\x00")


# ------------------------------------------------- end-to-end CJK PDFs


_CJK_ITEMS = [
    {"text": "Annual Report", "x": 72, "y": 760, "size": 20},
    {"text": "日本語のテキスト行です。",
     "x": 72, "y": 720, "size": 11},
    {"text": "Mixed ascii and 漢字 here", "x": 72, "y": 700, "size": 11},
    {"text": "plain ascii line", "x": 72, "y": 680, "size": 11},
]


@pytest.mark.parametrize("kw", [
    {},
    {"compress": True},
    {"content_filters": ["ASCII85Decode", "FlateDecode"]},
    {"content_filters": ["LZWDecode"]},
    {"indirect_length": True, "compress": True},
])
def test_cjk_type0_round_trip(kw):
    spans, err = extract_pdf_spans(write_pdf(_CJK_ITEMS, **kw))
    assert err is None, (kw, err)
    texts = [t for _, t, _ in spans]
    assert _CJK_ITEMS[1]["text"] in texts
    assert _CJK_ITEMS[2]["text"] in texts
    assert "plain ascii line" in texts
    assert [k for k, _, _ in spans][0] == "heading"


def test_cjk_table_block_densifies():
    from machine_readability_checker_spark.core.pdf import extract_pdf_tables

    rows = [("項目", "第一", "第二"),
            ("売上", "10", "20"),
            ("利益", "5", "7")]
    items = []
    y = 700
    for row in rows:
        for x, c in zip((72, 200, 330), row):
            items.append({"text": c, "x": x, "y": y})
        y -= 20
    grids, err = extract_pdf_tables(write_pdf(items, compress=True))
    assert err is None
    assert grids == [[list(r) for r in rows]]


def test_type0_without_tounicode_quarantines():
    good = write_pdf([{"text": "hello", "x": 72, "y": 700}], compress=True)
    bad = good.replace(b"/Subtype /Type1", b"/Subtype /Type0")
    spans, err = extract_pdf_spans(bad)
    assert spans == [] and "Type0" in err


def test_cid_code_outside_cmap_quarantines():
    """Patch an unmapped CID into the content stream — the document
    must quarantine, never emit a wrong character."""
    pdf = write_pdf(
        [{"text": "日", "x": 72, "y": 700}]  # one CJK char → code 0001
    )
    assert b"<0001> Tj" in pdf
    bad = pdf.replace(b"<0001> Tj", b"<0009> Tj")
    spans, err = extract_pdf_spans(bad)
    assert spans == [] and "not in ToUnicode" in err


def test_split_objstm():
    a, b = b"<< /A 1 >>", b"<< /B 2 >>"
    head = b"7 0 11 %d " % (len(a) + 1)
    data = head + a + b" " + b
    dict_bytes = b"<< /Type /ObjStm /N 2 /First %d >>" % len(head)
    out = _split_objstm(dict_bytes, data)
    assert set(out) == {7, 11}
    assert out[7].strip() == a
    assert out[11].strip() == b


def test_objstm_hosted_page_and_font_resolve():
    """Move the page + font dicts into a Flate ObjStm: the CJK document
    must still extract (objects hidden in object streams resolve)."""
    pdf = write_pdf(_CJK_ITEMS, compress=True)
    # relocate object 3 (page) and object 6 (Type0 font) into an ObjStm
    import re as _re

    def grab(num):
        m = _re.search(
            rb"%d 0 obj\n(.*?)\nendobj\n" % num, pdf, _re.S
        )
        return m.group(0), m.group(1)

    whole3, body3 = grab(3)
    whole6, body6 = grab(6)
    moved = pdf.replace(whole3, b"").replace(whole6, b"")
    # the relocated font becomes object 11; repoint the page resources
    body3 = body3.replace(b"/F2 6 0 R", b"/F2 11 0 R")
    head = b"3 0 11 %d " % (len(body3) + 1)
    first = len(head)
    payload = head + body3 + b" " + body6
    comp = zlib.compress(payload)
    objstm = (
        b"10 0 obj\n<< /Type /ObjStm /N 2 /First %d /Filter /FlateDecode "
        b"/Length %d >>\nstream\n" % (first, len(comp))
    ) + comp + b"\nendstream\nendobj\n"
    moved = moved.replace(b"xref\n", objstm + b"xref\n", 1)
    spans, err = extract_pdf_spans(moved)
    assert err is None, err
    texts = [t for _, t, _ in spans]
    assert _CJK_ITEMS[1]["text"] in texts


def test_fam_pdf_cjk_all_variants_extract():
    import numpy as np

    from machine_readability_checker_spark.sources.fixtures import fam_pdf_cjk

    for i in range(8):  # two full filter-variant cycles
        d = fam_pdf_cjk(np.random.RandomState(i), i)
        spans, err = extract_pdf_spans(bytes(d["content"]))
        assert err is None, (i, err)
        kinds = [k for k, _, _ in spans]
        assert kinds[0] == "heading"
        assert "cell" in kinds  # the CJK table block
        texts = "".join(t for _, t, _ in spans)
        assert "年次報告書" in texts  # 年次報告書


def test_driver_cjk_variant_pins():
    """The constructive pin behind the ``pdf_cjk_extract`` oracle
    literals: the single-node core reproduces _CJK_VARIANT_SPANS for
    every variant under every filter mode in the cycle."""
    import __spark_entry__ as entry

    for v, expected in entry._CJK_VARIANT_SPANS.items():
        for kw in entry._CJK_FILTER_CYCLE:
            blob = write_pdf(entry._cjk_variant_items(v), **kw)
            spans, err = extract_pdf_spans(blob)
            assert err is None, (v, kw, err)
            assert [(k, t) for k, t, _ in spans] == expected, (v, kw)
