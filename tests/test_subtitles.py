"""Subtitle lane (core/subtitles.py) + transcript windows
(operators/transcripts.py).

The driver-lane variant docs are pinned here byte-for-byte, so the
constructive `subtitle_extract` oracle and these tests can never
drift apart silently.
"""

from __future__ import annotations

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.subtitles import (
    extract_subtitle_spans,
    parse_srt_cues,
    parse_vtt_cues,
)


def _entry_variants():
    import __spark_entry__ as E

    return E._SUBTITLE_VARIANT_DOCS, E._SUBTITLE_VARIANT_SPANS


def test_variant_docs_match_pinned_spans():
    docs, expected = _entry_variants()
    assert len(docs) == len(expected) == 3
    for v, ((fmt, doc), want) in enumerate(zip(docs, expected)):
        spans, err = extract_subtitle_spans(doc.encode("utf-8"), fmt)
        assert err is None, (v, err)
        assert spans == want, (v, spans)


def test_srt_basic_and_lenient_timestamps():
    srt = (
        "1\n00:00:01,000 --> 00:00:02,500\nhello there\n\n"
        "2\n00:00:03.000 --> 00:01:04,20\nsecond cue\nsecond line\n"
    )
    assert parse_srt_cues(srt) == [
        (1000, 2500, "hello there"),
        (3000, 64200, "second cue\nsecond line"),
    ]


def test_srt_index_line_optional_and_bom():
    srt = "﻿00:00:00,500 --> 00:00:01,000\nno index\n"
    assert parse_srt_cues(srt) == [(500, 1000, "no index")]


def test_srt_tag_and_ass_override_strip():
    srt = (
        "1\n00:00:01,000 --> 00:00:02,000\n"
        "{\\an8}<i>styled</i> &amp; <font color=\"red\">plain</font>\n"
    )
    assert parse_srt_cues(srt) == [(1000, 2000, "styled & plain")]


def test_vtt_magic_required():
    spans, err = extract_subtitle_spans(
        b"00:00:01.000 --> 00:00:02.000\nx\n", "vtt"
    )
    assert spans == [] and "WEBVTT" in err


def test_vtt_notes_ids_settings_and_short_timestamps():
    vtt = (
        "WEBVTT\n\n"
        "NOTE a comment\nspanning lines\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "intro-cue\n00:05.000 --> 00:07.250 align:start position:10%\n"
        "<v Speaker>short form</v>\n\n"
        "01:00:00.000 --> 01:00:01.000\n<c.yellow>tail</c>\n"
    )
    assert parse_vtt_cues(vtt) == [
        (5000, 7250, "short form"),
        (3600000, 3601000, "tail"),
    ]


def test_cue_order_is_file_order_not_time_order():
    srt = (
        "1\n00:00:10,000 --> 00:00:11,000\nlater\n\n"
        "2\n00:00:01,000 --> 00:00:02,000\nearlier\n"
    )
    spans, err = extract_subtitle_spans(srt.encode(), "srt")
    assert err is None
    assert [s[1] for s in spans] == ["later", "earlier"]
    assert [s[2] for s in spans] == ["t=10000-11000", "t=1000-2000"]


def test_extract_document_dispatch_and_quarantine():
    out = extract_document(
        "d1", "vtt", b"WEBVTT\n\n00:00:01.000 --> 00:00:02.000\nok\n"
    )
    assert out["parse_error"] is None
    assert out["spans"] == [
        {"kind": "caption", "text": "ok", "media_ref": "t=1000-2000",
         "offset": 0}
    ]
    bad = extract_document("d2", "srt", b"no cues here at all")
    assert bad["parse_error"] is not None
    assert bad["metrics"]["parse_errors"] == 1


def test_fixture_family_roundtrip_both_dialects():
    import numpy as np

    from machine_readability_checker_spark.sources.fixtures import (
        fam_subtitles,
    )

    for i in (4, 7):  # even → srt, odd → vtt
        d = fam_subtitles(np.random.RandomState(i), i)
        assert d["fmt"] == ("srt" if i % 2 == 0 else "vtt")
        out = extract_document("f", d["fmt"], d["content"])
        assert out["parse_error"] is None
        assert len(out["spans"]) >= 3
        assert all(s["kind"] == "caption" for s in out["spans"])
        # timings are strictly increasing in the fixture by design
        starts = [
            int(s["media_ref"].split("=")[1].split("-")[0])
            for s in out["spans"]
        ]
        assert starts == sorted(starts)


def test_transcript_windows_spark(spark):
    from machine_readability_checker_spark.operators.transcripts import (
        caption_cues,
        transcript_windows,
    )

    rows = [
        (
            "v1",
            [
                {"kind": "caption", "text": "a", "media_ref": "t=0-1000",
                 "offset": 0},
                {"kind": "caption", "text": "b", "media_ref": "t=2000-2900",
                 "offset": 1},
                # starts in window 1 even though it began before a gap
                {"kind": "caption", "text": "c", "media_ref": "t=30000-31000",
                 "offset": 2},
                {"kind": "main", "text": "not a cue", "media_ref": "",
                 "offset": 3},
            ],
        ),
        (
            "v2",
            [
                # file order ≠ time order: window text must follow cue
                # (file) order within the window
                {"kind": "caption", "text": "late", "media_ref": "t=5000-6000",
                 "offset": 0},
                {"kind": "caption", "text": "early",
                 "media_ref": "t=1000-2000", "offset": 1},
            ],
        ),
    ]
    from machine_readability_checker_spark.model import SPANS_SCHEMA

    df = spark.createDataFrame(rows, SPANS_SCHEMA)
    cues = caption_cues(df)
    assert cues.where(cues.text == "not a cue").count() == 0
    got = {
        (r.doc_id, r.window_id): (r.t_start_ms, r.t_end_ms, r.n_cues, r.text)
        for r in transcript_windows(df, window_ms=30_000).collect()
    }
    assert got == {
        ("v1", 0): (0, 2900, 2, "a\nb"),
        ("v1", 1): (30000, 31000, 1, "c"),
        ("v2", 0): (1000, 6000, 2, "late\nearly"),
    }


def test_transcript_windows_plan_single_exchange(spark):
    """One shuffle (the groupBy); ordering happens inside the aggregate
    via array_sort, so no window function / second exchange appears."""
    from machine_readability_checker_spark.model import SPANS_SCHEMA
    from machine_readability_checker_spark.operators.transcripts import (
        transcript_windows,
    )

    df = spark.createDataFrame([], SPANS_SCHEMA)
    plan = (
        transcript_windows(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan
