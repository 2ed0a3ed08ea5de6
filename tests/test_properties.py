"""Property-based invariants (hypothesis) — SURVEY.md §5 lane 3.

Random grids → structural invariants of the zone splitter and span
emitter; A1 round-trip; generator determinism.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from machine_readability_checker_spark.core import cells as C
from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.zones import (
    extract_zones,
    is_empty_cell,
)
from machine_readability_checker_spark.sources.fixtures import gen_corpus

cell = st.one_of(
    st.none(),
    st.integers(-1000, 1000),
    st.floats(allow_nan=True, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x3050),
        max_size=8,
    ),
)
grid = st.lists(
    st.lists(cell, min_size=1, max_size=6), min_size=0, max_size=12
)


@given(grid, st.integers(0, 4), st.integers(0, 4))
@settings(max_examples=150, deadline=None)
def test_zone_partition_invariants(rows, hs, he):
    n_rows = len(rows)
    ctx = extract_zones(rows, "s", header_start_row=hs, header_end_row=he)
    if not ctx.valid:
        assert ctx.data_rows == []
        return
    # zones are disjoint and ordered: upper < header <= data <= total
    upper_idx = [i for i, _ in ctx.upper_rows]
    assert all(i < min(ctx.column_rows) for i in upper_idx)
    assert all(i > ctx.data_end for i, _ in ctx.lower_rows)
    # every non-empty row is covered by exactly one zone
    covered = set(upper_idx) | set(ctx.column_rows) | {
        i for i, _ in ctx.lower_rows
    }
    if ctx.data_rows:
        covered |= set(
            range(ctx.data_start, ctx.data_start + len(ctx.data_rows))
        )
    for i, row in enumerate(rows):
        if any(not is_empty_cell(v) for v in row):
            assert i in covered, f"non-empty row {i} uncovered"
    # columns always as wide as the grid
    if ctx.data_rows:
        assert len(ctx.columns) == ctx.n_cols


@given(grid)
@settings(max_examples=80, deadline=None)
def test_span_offsets_and_idempotence(rows):
    csv_text = "\n".join(
        ",".join("" if is_empty_cell(v) else str(v).replace(",", " ") for v in row)
        for row in rows
    )
    content = csv_text.encode("utf-8")
    r1 = extract_document("d", "csv", content)
    r2 = extract_document("d", "csv", content)
    assert r1["spans"] == r2["spans"]  # deterministic / idempotent
    offs = [s["offset"] for s in r1["spans"]]
    assert offs == list(range(len(offs)))  # strictly increasing from 0
    for s in r1["spans"]:
        assert s["kind"] in {
            "annotation_upper", "header", "cell", "annotation_lower", "media"
        }


@given(st.integers(1, 20000))
@settings(max_examples=200, deadline=None)
def test_a1_roundtrip(n):
    assert C.col_to_num(C.col_letter(n)) == n


@given(st.text(max_size=12))
@settings(max_examples=100, deadline=None)
def test_sort_key_total(s):
    # never raises, always comparable
    k = C.a1_sort_key(s)
    assert isinstance(k, tuple) and len(k) == 2


def test_generator_determinism():
    a = gen_corpus(25)
    b = gen_corpus(25)
    assert list(a["doc_id"]) == list(b["doc_id"])
    assert all(bytes(x) == bytes(y) for x, y in zip(a["content"], b["content"]))
    c = gen_corpus(25, seed=43)
    assert any(bytes(x) != bytes(y) for x, y in zip(a["content"], c["content"]))


# --- codec properties (real multimodal decode paths) ---------------------


@given(
    st.integers(1, 3).map(lambda c: 1 if c < 3 else 3),
    st.integers(1, 40),
    st.integers(1, 40),
    st.integers(0),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_roundtrip_error_bounded(channels, w, h, seed):
    """Any image (any non-8-multiple size, any channel mode) must
    round-trip through encode_jpeg/decode_jpeg with matching geometry;
    on smooth content the error stays within the q90 quantization
    envelope, and no input may raise."""
    import numpy as np

    from machine_readability_checker_spark.core.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    rng = np.random.RandomState(seed % (2**31))
    base = rng.randint(30, 220, size=(1, 1, channels))
    yy, xx = np.mgrid[0:h, 0:w]
    smooth = base + 15 * np.sin(xx[..., None] / 5) + 10 * np.cos(yy[..., None] / 7)
    img = np.clip(smooth, 0, 255).astype(np.uint8)
    W, H, C, px = decode_jpeg(
        encode_jpeg(w, h, channels, img.tobytes(), quality=90)
    )
    assert (W, H, C) == (w, h, channels)
    out = np.frombuffer(px, np.uint8).reshape(h, w, channels)
    assert float(np.mean(np.abs(out.astype(int) - img.astype(int)))) < 4.0


@given(
    st.sampled_from([8, 16, 24, 32]),
    st.integers(1, 3),
    st.integers(0, 200),
    st.integers(0),
)
@settings(max_examples=40, deadline=None)
def test_wav_roundtrip_lossless(bits, channels, n_frames, seed):
    """PCM WAV is lossless: encode→decode returns the exact frame bytes
    for every depth/channel/frame-count combination, and samples_float
    stays within [-1, 1]."""
    import numpy as np

    from machine_readability_checker_spark.core.wav import (
        decode_wav,
        encode_wav,
        samples_float,
    )

    rng = np.random.RandomState(seed % (2**31))
    n_bytes = n_frames * channels * (bits // 8)
    frames = rng.bytes(n_bytes)
    a = decode_wav(encode_wav(8000, channels, bits, frames))
    assert a.frames == frames
    assert a.n_frames == n_frames and a.channels == channels
    x = samples_float(a)
    assert x.shape == (n_frames, channels)
    if x.size:
        assert float(np.max(np.abs(x))) <= 1.0


@given(st.integers(0, 6), st.integers(1, 4), st.integers(0))
@settings(max_examples=25, deadline=None)
def test_avi_container_preserves_frames(n_frames, every_k, seed):
    """The AVI container is byte-transparent for its frames, whatever
    their content, and fps/duration metadata round-trips."""
    import numpy as np

    from machine_readability_checker_spark.core.avi import (
        decode_avi,
        encode_avi,
    )

    rng = np.random.RandomState(seed % (2**31))
    frames = [rng.bytes(int(rng.randint(0, 400))) for _ in range(n_frames)]
    v = decode_avi(encode_avi(64, 48, 12.5, frames))
    assert v.frames == frames
    assert (v.width, v.height) == (64, 48)
    assert abs(v.fps - 12.5) < 1e-6


@given(st.text(max_size=400))
@settings(max_examples=100, deadline=None)
def test_markdown_never_raises_and_spans_well_formed(text):
    """Any unicode input parses: no exception escapes, every span is a
    (kind, text, media_ref) triple with a known kind, and text spans
    are non-empty after cleanup."""
    from machine_readability_checker_spark.core.markdown import (
        extract_md_spans,
        extract_md_tables,
    )

    spans, err = extract_md_spans(text.encode("utf-8"))
    assert err is None
    for kind, body, ref in spans:
        assert kind in {"title", "heading", "main", "code", "media"}
        if kind != "media":
            assert ref == ""
        if kind in ("title", "heading", "main"):
            assert body != ""
    for grid in extract_md_tables(text.encode("utf-8")):
        assert grid and all(len(r) == len(grid[0]) for r in grid)


@given(
    st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_characters="|\\\r\n\x00",
                    blacklist_categories=("Cs",),
                ),
                max_size=8,
            ),
            min_size=2,
            max_size=4,
        ),
        min_size=1,
        max_size=5,
    )
)
@settings(max_examples=60, deadline=None)
def test_markdown_pipe_table_roundtrip(rows):
    """A rendered pipe table parses back to the same dense grid (cells
    ASCII-trimmed and inline-cleaned, width = header width)."""
    from machine_readability_checker_spark.core.markdown import (
        _inline,
        extract_md_tables,
    )

    w = len(rows[0])
    rows = [(r + [""] * w)[:w] for r in rows]
    md = "| " + " | ".join(rows[0]) + " |\n"
    md += "|" + "---|" * w + "\n"
    for r in rows[1:]:
        md += "| " + " | ".join(r) + " |\n"
    grids = extract_md_tables(md.encode("utf-8"))
    want = [[_inline(c)[0] for c in r] for r in rows]
    assert grids == [want]


# ------------------------- session-G lanes: doc / ppt / wiki / hocr


_para_text = st.text(
    alphabet=st.characters(
        min_codepoint=32, max_codepoint=0x3050,
        exclude_characters="\x7f",
    ),
    min_size=1, max_size=60,
).map(lambda s: " ".join(s.split())).filter(bool)


@given(
    st.lists(
        st.one_of(
            _para_text.map(lambda t: ("para", t)),
            st.tuples(st.integers(1, 9), _para_text).map(
                lambda x: ("heading", x[0], x[1])
            ),
            st.lists(
                st.lists(
                    st.text(
                        alphabet=st.characters(
                            min_codepoint=32, max_codepoint=0x2FFF,
                            exclude_characters="\t\x7f",
                        ),
                        max_size=10,
                    ).map(lambda s: " ".join(s.split())),
                    min_size=1, max_size=3,
                ),
                min_size=1, max_size=3,
            ).map(lambda rows: ("table", rows)),
        ),
        min_size=1, max_size=6,
    ),
    st.integers(0, 30),
)
@settings(max_examples=60, deadline=None)
def test_doc_writer_reader_roundtrip_property(blocks, split):
    """Arbitrary block mixes survive the .doc piece-table round trip:
    no parse error, paragraph/heading texts come back whitespace-
    normalized, every table row surfaces as a line span."""
    from machine_readability_checker_spark.core.doc import (
        extract_doc_spans,
        write_doc,
    )

    data = write_doc(blocks, piece_split=split or None)
    spans, err = extract_doc_spans(data)
    assert err is None
    got_lines = [s for s in spans if s[0] == "line"]
    want_rows = [
        row for b in blocks if b[0] == "table" for row in b[1]
    ]
    assert len(got_lines) == len(want_rows)
    for (_k, text, _m), row in zip(got_lines, want_rows):
        # strategy cells are pre-normalized, so they round-trip verbatim
        assert text.split("\t") == [" ".join(c.split()) for c in row]


@given(
    st.lists(
        st.lists(
            st.tuples(
                st.sampled_from(["title", "body", "notes", "other"]),
                _para_text,
            ),
            min_size=1, max_size=4,
        ),
        min_size=1, max_size=3,
    )
)
@settings(max_examples=60, deadline=None)
def test_ppt_writer_reader_roundtrip_property(slides):
    """Arbitrary decks survive the record-tree round trip: no parse
    error, every text item's CR-paragraphs come back in order."""
    from machine_readability_checker_spark.core.ppt import (
        extract_ppt_spans,
        write_ppt,
    )

    spans, err = extract_ppt_spans(write_ppt(slides))
    assert err is None
    want = [
        " ".join(p.split())
        for slide in slides
        for _k, t in slide
        for p in t.replace("\x0b", " ").split("\r")
        if " ".join(p.split())
    ]
    assert [s[1] for s in spans] == want


@given(st.text(max_size=400))
@settings(max_examples=120, deadline=None)
def test_wikitext_never_raises(text):
    """Hostile wikitext (unbalanced braces/brackets/tables/tags) must
    parse to SOME span list without error — the quarantine contract."""
    from machine_readability_checker_spark.core.wikitext import (
        extract_wiki_spans,
        extract_wiki_tables,
    )

    spans, err = extract_wiki_spans(text.encode("utf-8"))
    assert err is None or isinstance(err, str)
    if err is None:
        for kind, t, m in spans:
            assert isinstance(t, str) and isinstance(m, str)
    extract_wiki_tables(text.encode("utf-8"))


@given(st.binary(max_size=300))
@settings(max_examples=100, deadline=None)
def test_doc_ppt_hocr_quarantine_never_raise(data):
    """Arbitrary bytes must quarantine, never raise, in every
    session-G parser."""
    from machine_readability_checker_spark.core.doc import extract_doc_spans
    from machine_readability_checker_spark.core.hocr import (
        extract_hocr_spans,
    )
    from machine_readability_checker_spark.core.ppt import extract_ppt_spans

    for fn in (extract_doc_spans, extract_ppt_spans, extract_hocr_spans):
        spans, err = fn(data)
        assert isinstance(spans, list)


@given(st.binary(max_size=400), st.sampled_from(
    sorted(__import__(
        "machine_readability_checker_spark.core.grid",
        fromlist=["ALLOWED_FORMATS"],
    ).ALLOWED_FORMATS)
))
@settings(max_examples=200, deadline=None)
def test_every_format_quarantines_never_raises(data, fmt):
    """The whole extension gate under fuzz: arbitrary bytes through
    EVERY supported format must produce a well-formed result row
    (spans list + metrics), never an exception — the per-task
    quarantine contract that keeps one hostile document from killing
    a 1000-executor wave."""
    out = extract_document("fz", fmt, data)
    assert isinstance(out["spans"], list)
    assert out["metrics"]["parse_errors"] in (0, 1)
    if out["parse_error"] is not None:
        assert out["spans"] == [] and out["metrics"]["spans_out"] == 0


@given(st.text(max_size=3000))
@settings(max_examples=150, deadline=None)
def test_org_never_raises_and_spans_well_formed(text):
    """Any unicode input parses through the org scanner: no exception,
    well-formed triples, rectangular grids."""
    from machine_readability_checker_spark.core.org import (
        extract_org_spans,
        extract_org_tables,
    )

    spans, err = extract_org_spans(text.encode("utf-8"))
    assert err is None
    for kind, body, ref in spans:
        assert kind in {
            "title", "heading", "main", "boilerplate", "code", "math",
            "media", "caption", "line",
        }
    for grid in extract_org_tables(text.encode("utf-8")):
        assert grid and all(len(r) == len(grid[0]) for r in grid)


@given(st.text(max_size=3000))
@settings(max_examples=150, deadline=None)
def test_fwtext_never_raises_and_grids_rectangular(text):
    from machine_readability_checker_spark.core.fwtext import (
        extract_fw_tables,
        extract_txt_spans,
    )

    spans, err = extract_txt_spans(text.encode("utf-8"))
    assert err is None
    for kind, body, ref in spans:
        assert kind in {"main", "boilerplate", "line"}
        assert ref == ""
    for grid in extract_fw_tables(text.encode("utf-8")):
        assert grid and all(len(r) == len(grid[0]) for r in grid)


@given(st.binary(max_size=2000))
@settings(max_examples=200, deadline=None)
def test_tiff_decode_never_hangs_or_segfaults(data):
    """Arbitrary bytes through the TIFF decoder either decode or raise
    ValueError — never any other exception, never a hang (the IFD
    walker bounds chains and strip reads)."""
    from machine_readability_checker_spark.core.tiff import (
        decode_tiff_pages,
    )

    for blob in (data, b"II*\x00" + data, b"MM\x00*" + data):
        try:
            pages = decode_tiff_pages(blob)
            for w, h, ch, px in pages:
                assert len(px) == w * h * ch
        except ValueError:
            pass
