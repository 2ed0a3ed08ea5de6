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
