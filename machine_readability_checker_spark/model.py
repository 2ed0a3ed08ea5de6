"""Schemas and constants shared across the engine.

The span data model follows the target shape: each document is an ordered
array of ``(kind, text, media_ref, offset)`` structs.  Span kinds mirror the
reference's zone partition of a sheet (upper annotations / header / data
body / lower annotations — reference ``src/processor/loader.py:73-124``)
plus ``media`` for embedded drawing/object parts (reference
``src/checker/level1_checker.py:68-90``) and the HTML-lane kinds.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- span kinds ---------------------------------------------------------
KIND_ANNOTATION_UPPER = "annotation_upper"
KIND_HEADER = "header"
KIND_CELL = "cell"
KIND_ANNOTATION_LOWER = "annotation_lower"
KIND_MEDIA = "media"
# HTML lane (no reference analog — Boilerpipe/Readability-style labels)
KIND_TITLE = "title"
KIND_HEADING = "heading"
KIND_MAIN = "main"
KIND_BOILERPLATE = "boilerplate"

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),
    ]
)

# documents_spans(doc_id, spans) — the canonical interleaved text+media table
SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

# docs_raw(doc_id, fmt, content, n_bytes) — ingest-lane table of raw bytes
RAW_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("content", T.BinaryType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        # 1-based structure hints mirroring the reference UI inputs
        # (reference src/app/app.py:88-133); 0 = auto-detect.
        T.StructField("header_start_row", T.IntegerType(), True),
        T.StructField("header_end_row", T.IntegerType(), True),
        T.StructField("data_start_row", T.IntegerType(), True),
        T.StructField("data_end_row", T.IntegerType(), True),
        # 0-based index of the sheet the rule checks target, mirroring the
        # reference's sheet picker (src/app/app.py:80-133); NULL/0 = first
        # sheet.  Spans are still emitted for every sheet — this selects
        # which sheet the rule results describe.
        T.StructField("sheet_idx", T.IntegerType(), True),
    ]
)

# rule-check results (reference src/app/app.py:257-264 record shape)
RESULT_STRUCT = T.StructType(
    [
        T.StructField("rule_id", T.StringType(), False),
        T.StructField("passed", T.BooleanType(), False),
        T.StructField("message", T.StringType(), True),
    ]
)

# per-document extraction metrics (lineage side table)
METRICS_STRUCT = T.StructType(
    [
        T.StructField("spans_out", T.IntegerType(), False),
        T.StructField("parse_errors", T.IntegerType(), False),
        T.StructField("encoding", T.StringType(), True),
        T.StructField("block_count", T.IntegerType(), True),
        T.StructField("merged_cells", T.IntegerType(), True),
        T.StructField("hidden_rows", T.IntegerType(), True),
        T.StructField("hidden_cols", T.IntegerType(), True),
        T.StructField("format_flags", T.IntegerType(), True),
        T.StructField("n_sheets", T.IntegerType(), True),
        T.StructField("layout", T.StringType(), True),
        T.StructField("wall_ms", T.DoubleType(), True),
    ]
)

# combined kernel output: one row per document, all three facets at once so
# the expensive parse runs exactly once per document per pass (mirrors the
# reference loading the workbook once and passing it to every check —
# src/app/app.py:156-167).
EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
        T.StructField("results", T.ArrayType(RESULT_STRUCT), False),
        T.StructField("metrics", METRICS_STRUCT, False),
        T.StructField("partition_id", T.IntegerType(), False),
    ]
)

# per-partition lineage rows (north-rule requirement)
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("docs_in", T.LongType(), False),
        T.StructField("spans_out", T.LongType(), False),
        T.StructField("parse_errors", T.LongType(), False),
        T.StructField("encoding_fallbacks", T.LongType(), False),
        T.StructField("wall_ms", T.DoubleType(), False),
    ]
)

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
