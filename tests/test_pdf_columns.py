"""Multi-column PDF reading order (recursive XY-cut in ``core/pdf.py::
order_columns``).

The reference has no PDF path at all; this implements the north-star
"layout-aware PDF parsing … reading-order sort" requirement for the
multi-column layouts real documents (papers, brochures, government
reports) actually use.

Covers:
- two columns reorder column-major (aligned and ragged baselines);
- a spanning title/footer acts as a horizontal band separator
  (title → left column → right column → footer);
- three columns resolve through recursion;
- x-aligned TABLES are never torn into fake columns (short cells fail
  the column-fill test), including the page-mid band-separator path;
- a table inside one column of a two-column layout stays a table;
- CJK columns (1-em width estimate) reorder identically;
- single-column prose is untouched;
- the spans lane and the grid lane agree after reordering.
"""

from __future__ import annotations

from machine_readability_checker_spark.core.pdf import (
    extract_pdf_spans,
    extract_pdf_tables,
    write_pdf,
)


def col_items(texts, x, y0, size=11, dy=16):
    return [
        {"text": t, "x": x, "y": y0 - k * dy, "size": size}
        for k, t in enumerate(texts)
    ]


LEFT = [f"left col line {i} padding words" for i in range(5)]
RIGHT = [f"right col line {i} extra words" for i in range(5)]


def test_two_columns_reorder_column_major():
    spans, err = extract_pdf_spans(
        write_pdf(col_items(LEFT, 72, 720) + col_items(RIGHT, 330, 720))
    )
    assert err is None
    assert [t for _, t, _ in spans] == LEFT + RIGHT


def test_title_and_footer_band_separators():
    title = "A Spanning Title Across Both Columns Of The Page"
    footer = "a full width footer line that spans both columns of this page"
    items = (
        [{"text": title, "x": 72, "y": 760, "size": 20}]
        + col_items(LEFT, 72, 720)
        + col_items(RIGHT, 330, 720)
        + [{"text": footer, "x": 72, "y": 600}]
    )
    spans, err = extract_pdf_spans(write_pdf(items, compress=True))
    assert err is None
    assert [t for _, t, _ in spans] == [title] + LEFT + RIGHT + [footer]
    assert spans[0][0] == "heading"


def test_three_columns_recurse():
    c1 = [f"first column body line {i} here" for i in range(4)]
    c2 = [f"second column body line {i} yes" for i in range(4)]
    c3 = [f"third column body line {i} okk" for i in range(4)]
    spans, err = extract_pdf_spans(
        write_pdf(
            col_items(c1, 60, 700)
            + col_items(c2, 240, 700)
            + col_items(c3, 420, 700)
        )
    )
    assert err is None
    assert [t for _, t, _ in spans] == c1 + c2 + c3


def test_ragged_columns():
    left = [f"left body line {i} some padding" for i in range(6)]
    right = [f"right body line {i} words here" for i in range(3)]
    spans, err = extract_pdf_spans(
        write_pdf(col_items(left, 72, 720) + col_items(right, 330, 720))
    )
    assert err is None
    assert [t for _, t, _ in spans] == left + right


def test_single_column_untouched():
    prose = [f"just a normal prose line number {i}" for i in range(6)]
    spans, err = extract_pdf_spans(write_pdf(col_items(prose, 72, 720)))
    assert err is None
    assert [t for _, t, _ in spans] == prose


def _table_items(rows, xs=(72, 200, 330), y0=700, dy=20):
    items = []
    y = y0
    for row in rows:
        for x, c in zip(xs, row):
            items.append({"text": c, "x": x, "y": y})
        y -= dy
    return items


def test_table_never_torn_into_columns():
    rows = [("item", "qty", "price"), ("aa", "1", "100"),
            ("bb", "2", "200"), ("cc", "3", "300")]
    pdf = write_pdf(_table_items(rows))
    grids, err = extract_pdf_tables(pdf)
    assert err is None
    assert grids == [[list(r) for r in rows]]
    spans, err = extract_pdf_spans(pdf)
    assert err is None
    assert all(k == "cell" for k, _, _ in spans)
    # rows stay row-major: first cell line is the header row
    assert spans[0][1] == "item\tqty\tprice"


def test_table_with_prose_context_not_torn():
    """Prose lines above/below a table cross the page mid (band
    separators) — the table band between them must still read
    row-major."""
    rows = [("name", "count"), ("aaa", "1"), ("bbb", "2"), ("ccc", "3")]
    items = (
        [{"text": "This paragraph introduces the following table.",
          "x": 72, "y": 740}]
        + _table_items(rows, xs=(72, 260), y0=700)
        + [{"text": "And this closing sentence follows the table here.",
            "x": 72, "y": 600}]
    )
    spans, err = extract_pdf_spans(write_pdf(items))
    assert err is None
    got = [(k, t) for k, t, _ in spans]
    assert got == (
        [("line", "This paragraph introduces the following table.")]
        + [("cell", "\t".join(r)) for r in rows]
        + [("line", "And this closing sentence follows the table here.")]
    )


def test_table_inside_left_column():
    """Unpaired sides (3-row table left, 5-line prose right): the split
    fires on the filled prose side and the table stays a table inside
    its column."""
    tab = _table_items(
        [("alpha", "11"), ("beta", "22"), ("gamma", "33")],
        xs=(72, 150), y0=720, dy=16,
    )
    rcol = [f"right column prose line {i} filling" for i in range(5)]
    spans, err = extract_pdf_spans(write_pdf(tab + col_items(rcol, 330, 720)))
    assert err is None
    assert [(k, t) for k, t, _ in spans] == (
        [("cell", "alpha\t11"), ("cell", "beta\t22"), ("cell", "gamma\t33")]
        + [("line", t) for t in rcol]
    )


def test_cjk_columns():
    l2 = [f"日本語の左段落の行その{i}" for i in range(4)]
    r2 = [f"右段落のテキスト行番号{i}" for i in range(4)]
    spans, err = extract_pdf_spans(
        write_pdf(col_items(l2, 72, 720) + col_items(r2, 260, 720),
                  compress=True)
    )
    assert err is None
    assert [t for _, t, _ in spans] == l2 + r2


def test_grid_lane_sees_column_local_tables():
    """extract_pdf_tables runs the same reordering: a table inside the
    right column densifies as its own grid."""
    lcol = [f"left column prose line {i} fills" for i in range(5)]
    tab = _table_items(
        [("k", "v"), ("a", "1"), ("b", "2")], xs=(330, 420), y0=720, dy=16
    )
    grids, err = extract_pdf_tables(
        write_pdf(col_items(lcol, 72, 720) + tab)
    )
    assert err is None
    assert grids == [[["k", "v"], ["a", "1"], ["b", "2"]]]


def test_driver_column_variant_pins():
    """The constructive pin behind the ``pdf_columns_extract`` oracle
    literals: the single-node core reproduces the exact ordered span
    sequence for every variant."""
    import __spark_entry__ as entry

    for v, expected in entry._COL_VARIANT_SPANS.items():
        spans, err = extract_pdf_spans(
            write_pdf(entry._col_variant_items(v), compress=True)
        )
        assert err is None, (v, err)
        assert [(k, t) for k, t, _ in spans] == expected, v
