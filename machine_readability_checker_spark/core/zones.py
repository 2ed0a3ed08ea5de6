"""Zone splitter — the core structure-extraction operator (P1–P3).

Partitions every sheet's rows, in document order, into:

    upper annotations | header rows | data body | lower annotations

with the same bounds math, validity rules, multi-row header merge
("(空白)" placeholder + left forward-fill per level) and column-count
reconciliation (synthesized ``Col{i}`` names) the reference implements in
``src/processor/loader.py:19-143``.  Adds the header auto-detection the
reference leaves to UI input, using the reference's own header-likeness
heuristic (non-numeric ratio ≥ 0.5 of non-empty cells —
``level1_checker.py:310-318``).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, List, Optional, Tuple

BLANK_HEADER_PLACEHOLDER = "(空白)"


def is_empty_cell(val: Any) -> bool:
    if val is None:
        return True
    if isinstance(val, float) and math.isnan(val):
        return True
    if isinstance(val, str) and val.strip() == "":
        return True
    return False


def _is_numeric_like(s: str) -> bool:
    """Header-likeness numeric test: digits after stripping '.' and '-'."""
    return s.replace(".", "").replace("-", "").isdigit()


def row_is_header_like(row: List[Any]) -> Optional[bool]:
    """True if <50% of the row's non-empty cells look numeric; None if the
    row is entirely empty."""
    vals = [str(v).strip() for v in row if not is_empty_cell(v)]
    if not vals:
        return None
    numeric = sum(1 for v in vals if _is_numeric_like(v))
    return numeric / len(vals) < 0.5


def detect_header_row(rows: List[List[Any]]) -> int:
    """1-based index of the first header-like row; defaults to 1."""
    for i, row in enumerate(rows):
        hl = row_is_header_like(row)
        if hl:
            return i + 1
        if hl is False:
            # data rows before any header-like row → treat row 1 as header
            # (the reference default when the user keeps header_row=1)
            return 1
    return 1


@dataclass
class ZoneContext:
    """Spark-side analog of the reference's ``TableContext``."""

    sheet_name: str
    valid: bool
    column_rows: List[int] = field(default_factory=list)   # 0-based header rows
    columns: List[str] = field(default_factory=list)       # merged, flattened
    raw_column_levels: List[List[str]] = field(default_factory=list)
    data_start: int = 0          # 0-based inclusive
    data_end: int = -1           # 0-based inclusive
    upper_rows: List[Tuple[int, List[Any]]] = field(default_factory=list)
    lower_rows: List[Tuple[int, List[Any]]] = field(default_factory=list)
    data_rows: List[List[Any]] = field(default_factory=list)
    n_cols: int = 0
    header_mismatch: bool = False


def _merge_header_levels(levels: List[List[str]]) -> List[List[str]]:
    """Per header row, forward-fill blanks from the left; a blank with no
    left neighbor becomes the literal placeholder."""
    fixed_levels: List[List[str]] = []
    for level in levels:
        fixed: List[str] = []
        last_val = ""
        for val in level:
            if val == "":
                val = last_val or BLANK_HEADER_PLACEHOLDER
            else:
                last_val = val
            fixed.append(val)
        fixed_levels.append(fixed)
    return fixed_levels


def _cell_to_header_str(val: Any) -> str:
    """Header cell rendering = fillna("") + astype(str) semantics."""
    if val is None or (isinstance(val, float) and math.isnan(val)):
        return ""
    if isinstance(val, float) and val.is_integer():
        # pandas astype(str) renders 2.0 as "2.0"; we keep that here for
        # parity with the reference's header text
        return str(val)
    return str(val)


def extract_zones(
    rows: List[List[Any]],
    sheet_name: str,
    header_start_row: int = 0,
    header_end_row: int = 0,
    data_start_row: int = 0,
    data_end_row: int = 0,
) -> ZoneContext:
    """Split a sheet grid into ordered structural zones.

    All *_row arguments are 1-based; 0 = auto.  Auto header = single header
    row found by ``detect_header_row``; auto data range = header_end+1 …
    last row (the reference's defaults).
    """
    total_rows = len(rows)
    n_cols = max((len(r) for r in rows), default=0)
    # normalize ragged rows (xlsx grids are dense already; csv may vary)
    norm = [list(r) + [None] * (n_cols - len(r)) for r in rows]

    if header_start_row <= 0:
        auto = detect_header_row(norm) if total_rows else 1
        header_start_row = auto
        if header_end_row <= 0:
            header_end_row = auto
    elif header_end_row <= 0:
        header_end_row = header_start_row

    h_start = header_start_row - 1
    h_end = header_end_row - 1
    data_start = data_start_row - 1 if data_start_row > 0 else h_end + 1
    data_end = data_end_row - 1 if data_end_row > 0 else total_rows - 1

    if total_rows == 0 or h_start < 0 or h_end < h_start or h_end >= total_rows:
        # invalid-context path: empty body, columns from first row if any
        cols = [_cell_to_header_str(v) for v in norm[0]] if total_rows else []
        return ZoneContext(
            sheet_name=sheet_name,
            valid=False,
            columns=cols,
            column_rows=[],
            data_start=0,
            data_end=-1,
            n_cols=n_cols,
        )

    column_rows = list(range(h_start, h_end + 1))

    upper = [
        (i, norm[i])
        for i in range(h_start)
        if not all(is_empty_cell(v) for v in norm[i])
    ]
    lower = (
        [
            (i, norm[i])
            for i in range(data_end + 1, total_rows)
            if not all(is_empty_cell(v) for v in norm[i])
        ]
        if data_end < total_rows - 1
        else []
    )

    levels = [[_cell_to_header_str(v) for v in norm[i]] for i in column_rows]
    if len(column_rows) > 1:
        fixed = _merge_header_levels(levels)
        columns = ["/".join(parts) for parts in zip(*fixed)]
        raw_levels = fixed
    else:
        columns = levels[0] if levels else []
        raw_levels = levels

    if data_start <= data_end and data_start < total_rows:
        data_rows = [norm[i] for i in range(data_start, min(data_end, total_rows - 1) + 1)]
    else:
        data_rows = []

    header_mismatch = False
    if data_rows and len(columns) != n_cols:
        header_mismatch = True
        columns = [f"Col{i + 1}" for i in range(n_cols)]

    return ZoneContext(
        sheet_name=sheet_name,
        valid=True,
        column_rows=column_rows,
        columns=columns,
        raw_column_levels=raw_levels,
        data_start=data_start,
        data_end=data_end,
        upper_rows=upper,
        lower_rows=lower,
        data_rows=data_rows,
        n_cols=n_cols,
        header_mismatch=header_mismatch,
    )
