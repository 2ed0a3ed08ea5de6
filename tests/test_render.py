"""Span-array → training-text renderer (operators/render.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F, types as T

from machine_readability_checker_spark.model import SPAN_STRUCT
from machine_readability_checker_spark.operators.render import (
    main_text,
    render_training_text,
)

SPANS_T = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT)),
    ]
)


def _mk(spans):
    return [
        {"kind": k, "text": t, "media_ref": m, "offset": i}
        for i, (k, t, m) in enumerate(spans)
    ]


def _df(spark, spans):
    return spark.createDataFrame([("d1", _mk(spans))], SPANS_T)


def test_plain_keeps_content_kinds_in_order(spark):
    spans = [
        ("title", "T", ""),
        ("main", "alpha", ""),
        ("boilerplate", "nav", ""),
        ("line", "a\tb", ""),
        ("cell", "42", ""),
        ("media", "", "x.png"),
    ]
    out = render_training_text(_df(spark, spans), style="plain")
    assert out.first()["text"] == "alpha a\tb 42"


def test_plain_order_is_array_order_not_alphabetical(spark):
    spans = [("main", "zebra", ""), ("main", "apple", ""),
             ("main", "mango", "")]
    out = render_training_text(_df(spark, spans), style="plain")
    assert out.first()["text"] == "zebra apple mango"


def test_markdown_block_mapping(spark):
    spans = [
        ("title", "Doc", ""),
        ("heading", "Sec", ""),
        ("main", "prose", ""),
        ("code", "x = 1", ""),
        ("math", "E=mc^2", ""),
        ("caption", "Fig 1", ""),
        ("media", "alt", "img.png"),
        ("line", "a\tb", ""),
        ("output", "42", ""),
        ("boilerplate", "footer", ""),       # dropped
        ("annotation_upper", "note", ""),    # dropped
    ]
    out = render_training_text(_df(spark, spans), style="markdown")
    assert out.first()["text"] == (
        "# Doc\n\n## Sec\n\nprose\n\n```\nx = 1\n```\n\n$$E=mc^2$$"
        "\n\n*Fig 1*\n\n![alt](img.png)\n\na\tb\n\n42"
    )


def test_markdown_consecutive_table_rows_stay_adjacent(spark):
    spans = [
        ("main", "intro", ""),
        ("line", "h1\th2", ""),
        ("line", "a\t1", ""),
        ("line", "b\t2", ""),
        ("main", "outro", ""),
    ]
    out = render_training_text(_df(spark, spans), style="markdown")
    assert out.first()["text"] == (
        "intro\n\nh1\th2\na\t1\nb\t2\n\noutro"
    )


def test_media_with_null_text_renders_empty_alt(spark):
    spans = [("media", None, "x.png"), ("main", "body", "")]
    out = render_training_text(_df(spark, spans), style="markdown")
    assert out.first()["text"] == "![](x.png)\n\nbody"


def test_custom_kinds_and_unknown_style(spark):
    df = _df(spark, [("main", "a", ""), ("heading", "h", "")])
    out = render_training_text(df, style="plain", kinds=("heading",))
    assert out.first()["text"] == "h"
    with pytest.raises(ValueError):
        render_training_text(df, style="nope")


def test_renderer_plan_is_narrow_jvm_only(spark, tmp_path):
    """The extraction→text bridge must stay zero-exchange zero-Python —
    the explode→groupBy→collect_list spelling it replaced shuffled the
    corpus AND had no ordering guarantee."""
    path = str(tmp_path / "spans.parquet")
    _df(spark, [("main", "a", ""), ("line", "b", "")]).write.parquet(path)
    plan = (
        render_training_text(spark.read.parquet(path), style="plain")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan  # no Arrow/Batch Python stages
    assert "Generate" not in plan    # no explode
