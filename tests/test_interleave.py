"""Interleaved text+media segment assembly (operators/interleave.py).

The MMC4/OBELICS export shape: ordered typed segments where runs of
consecutive kept text spans collapse into one text segment and every
media span is its own segment.  No counterpart in the reference repo
(single-process, text-only output)."""

from __future__ import annotations

import glob
import gzip
import json
import os

import pytest
from pyspark.sql import functions as F, types as T

from machine_readability_checker_spark.model import SPAN_STRUCT
from machine_readability_checker_spark.operators.interleave import (
    interleaved_segments,
    media_refs,
    read_interleaved_shards,
    resolve_media_segments,
    write_interleaved_shards,
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


def _df(spark, spans, doc="d1"):
    return spark.createDataFrame([(doc, _mk(spans))], SPANS_T)


def _segs(df):
    return [
        (s["type"], s["text"], s["media_ref"])
        for s in df.first()["segments"]
    ]


def test_text_runs_merge_and_media_splits(spark):
    spans = [
        ("title", "T", ""),
        ("main", "alpha", ""),
        ("media", "a cat", "x.png"),
        ("main", "beta", ""),
        ("main", "gamma", ""),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [
        ("text", "T\n\nalpha", None),
        ("media", "a cat", "x.png"),
        ("text", "beta\n\ngamma", None),
    ]


def test_leading_trailing_and_consecutive_media(spark):
    spans = [
        ("media", "", "a.png"),
        ("media", "", "b.png"),
        ("main", "mid", ""),
        ("media", "", "c.png"),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [
        ("media", "", "a.png"),
        ("media", "", "b.png"),
        ("text", "mid", None),
        ("media", "", "c.png"),
    ]


def test_non_text_kinds_and_empty_texts_dropped(spark):
    spans = [
        ("boilerplate", "nav nav", ""),
        ("main", "", ""),  # empty text span drops
        ("main", "kept", ""),
        ("footer", "(c) corp", ""),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert _segs(out) == [("text", "kept", None)]


def test_no_media_one_segment_and_media_only(spark):
    out = interleaved_segments(
        _df(spark, [("main", "a", ""), ("line", "b", "")])
    )
    assert _segs(out) == [("text", "a\n\nb", None)]
    out = interleaved_segments(_df(spark, [("media", "", "x.png")]))
    assert _segs(out) == [("media", "", "x.png")]


def test_empty_span_array_yields_empty_segments(spark):
    out = interleaved_segments(_df(spark, []))
    assert out.first()["segments"] == []


def test_media_refs_ordered(spark):
    spans = [
        ("media", "", "z.png"),
        ("main", "t", ""),
        ("media", "", "a.png"),
    ]
    out = interleaved_segments(_df(spark, spans))
    assert out.select(
        media_refs().alias("r")
    ).first()["r"] == ["z.png", "a.png"]


def test_segment_assembly_is_zero_exchange(spark):
    df = interleaved_segments(_df(spark, [("main", "a", "")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    # and the fold stays JVM-side: no Python evaluation nodes
    assert "Python" not in plan


def test_shard_writer_byte_deterministic(spark, tmp_path):
    rows = [
        (
            f"doc{i:03d}",
            _mk(
                [("main", f"text {i}", ""), ("media", "", f"m{i}.png")]
                * (1 + i % 3)
            ),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, SPANS_T)
    seg = interleaved_segments(df).select("doc_id", "segments")

    def run(p):
        man = write_interleaved_shards(seg, str(p), n_shards=4).collect()
        files = sorted(glob.glob(os.path.join(str(p), "*.jsonl.gz")))
        return man, [open(f, "rb").read() for f in files]

    man1, b1 = run(tmp_path / "a")
    man2, b2 = run(tmp_path / "b")
    assert b1 == b2 and len(b1) == 4
    assert sum(m["n_docs"] for m in man1) == 40
    assert {m["shard"] for m in man1} == {0, 1, 2, 3}
    key = lambda m: (m["shard"], m["n_docs"], m["n_bytes"])  # noqa: E731
    assert sorted(map(key, man1)) == sorted(map(key, man2))
    # lines parse back to the segment shape, docs are disjoint
    seen = set()
    for blob in b1:
        for line in gzip.decompress(blob).splitlines():
            d = json.loads(line)
            seen.add(d["doc_id"])
            for s in d["segments"]:
                assert s["type"] in ("text", "media")
                if s["type"] == "media":
                    assert s["media_ref"].endswith(".png")
    assert len(seen) == 40


# ------------------------------------------------- loader (read side)


def test_shards_round_trip_through_jvm_json_read(spark, tmp_path):
    rows = [
        (
            f"doc{i:03d}",
            _mk(
                [
                    ("main", f"text {i}\nwith newline", ""),
                    ("media", f"alt {i}", f"m{i}.png"),
                    ("main", 'quote " and \\ backslash', ""),
                ]
            ),
        )
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, SPANS_T)
    seg = interleaved_segments(df).select("doc_id", "segments")
    write_interleaved_shards(seg, str(tmp_path), n_shards=3).collect()
    back = read_interleaved_shards(
        spark, os.path.join(str(tmp_path), "*.jsonl.gz")
    )
    # the loader plan is JVM-only: no Python eval in the scan
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    want = {r["doc_id"]: r["segments"] for r in seg.collect()}
    got = {r["doc_id"]: r["segments"] for r in back.collect()}
    assert got == want


def test_resolve_media_from_deduplicated_sidecar(spark, tmp_path):
    from machine_readability_checker_spark.sources.warcsink import (
        build_cdxj,
        write_warc_resources,
    )

    # 6 docs; docs 0/2/4 share one payload (revisit-deduplicated in
    # the sidecar), 1/3/5 have distinct payloads; doc 5's second ref
    # is absent from the store → must quarantine, not drop
    blob_shared = b"\x89PNG\r\n\x1a\nshared-bytes"
    store_rows = []
    span_rows = []
    for i in range(6):
        doc = f"d{i}"
        content = blob_shared if i % 2 == 0 else f"payload-{i}".encode()
        store_rows.append((doc, "m.bin", bytearray(content)))
        spans = [("main", f"txt {i}", ""), ("media", "", "m.bin")]
        if i == 5:
            spans.append(("media", "", "ghost.bin"))
        span_rows.append((doc, _mk(spans)))
    store = spark.createDataFrame(
        store_rows, "doc_id string, media_ref string, content binary"
    )
    seg = interleaved_segments(
        spark.createDataFrame(span_rows, SPANS_T)
    ).select("doc_id", "segments")

    warc_dir = str(tmp_path / "sidecar")
    man = write_warc_resources(
        store, warc_dir, n_shards=2, dedup=True
    ).collect()
    assert sum(m["n_docs"] for m in man) == 6
    idx = build_cdxj(spark, os.path.join(warc_dir, "*.warc.gz"))
    assert idx.filter(F.col("mime") == "warc/revisit").count() == 2

    got = resolve_media_segments(spark, seg, idx, warc_dir)
    rows = {(r["doc_id"], r["media_ref"]): r for r in got.collect()}
    assert len(rows) == 7  # 6 store refs + the ghost
    for i in range(6):
        r = rows[(f"d{i}", "m.bin")]
        assert r["error"] is None
        want = blob_shared if i % 2 == 0 else f"payload-{i}".encode()
        assert bytes(r["content"]) == want
    ghost = rows[("d5", "ghost.bin")]
    assert ghost["content"] is None
    assert ghost["error"] == "not in sidecar index"


# --------------------------------------------- doc-level quality stats


def test_interleaved_stats_counts_and_runs(spark):
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_stats,
    )

    spans = [
        ("main", "abcde", ""),        # text seg "abcde" (5 chars)
        ("media", "", "a.png"),
        ("media", "", "b.png"),
        ("media", "", "a.png"),       # dup ref, run of 3
        ("main", "xy", ""),           # text seg "xy" (2 chars)
        ("media", "", "c.png"),
    ]
    r = interleaved_stats(
        interleaved_segments(_df(spark, spans))
    ).first()
    assert r["n_segments"] == 6
    assert r["n_media_segments"] == 4
    assert r["n_text_segments"] == 2
    assert r["text_chars"] == 7
    assert r["distinct_media_refs"] == 3
    assert r["dup_media_refs"] == 1
    assert r["max_media_run"] == 3
    assert r["media_frac"] == round(4 / 6, 6)


def test_interleaved_stats_empty_and_no_media(spark):
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_stats,
    )

    r = interleaved_stats(interleaved_segments(_df(spark, []))).first()
    assert (
        r["n_segments"], r["n_media_segments"], r["text_chars"],
        r["max_media_run"], r["media_frac"],
    ) == (0, 0, 0, 0, 0.0)
    r2 = interleaved_stats(
        interleaved_segments(_df(spark, [("main", "hi", "")]))
    ).first()
    assert r2["max_media_run"] == 0 and r2["media_frac"] == 0.0


def test_interleaved_filter_flags(spark):
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_filter,
    )

    rows = [
        # healthy: text + 1 image
        ("ok", _mk([("main", "body text", ""), ("media", "", "m.png")])),
        # image-only page (no text)
        ("notext", _mk([("media", "", "x.png"), ("media", "", "y.png")])),
        # repeated-image spam
        ("spam", _mk(
            [("main", "t", "")]
            + [("media", "", "same.png")] * 5
        )),
    ]
    df = interleaved_filter(
        interleaved_segments(spark.createDataFrame(rows, SPANS_T))
    )
    got = {r["doc_id"]: r for r in df.collect()}
    assert got["ok"]["il_keep"] is True
    assert got["notext"]["il_text_ok"] is False
    assert got["notext"]["il_media_frac_ok"] is False
    assert got["notext"]["il_keep"] is False
    assert got["spam"]["il_dup_media_ok"] is False
    assert got["spam"]["il_keep"] is False


def test_interleaved_stats_zero_exchange(spark):
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_filter,
    )

    df = interleaved_filter(
        interleaved_segments(_df(spark, [("main", "a", "")]))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


# ------------------------------------------ multimodal WebDataset sink


def test_interleaved_webdataset_layout_and_determinism(spark, tmp_path):
    import tarfile

    from machine_readability_checker_spark.operators.interleave import (
        write_interleaved_webdataset,
    )

    png = b"\x89PNG\r\n\x1a\n" + b"px"  # sniffs image/png
    rows, media = [], []
    for i in range(12):
        doc = f"d{i:02d}"
        spans = [("main", f"text {i}", ""), ("media", "alt", "a.png")]
        media.append((doc, "a.png", bytearray(png + str(i).encode())))
        if i == 3:  # second media whose bytes are missing from the store
            spans.append(("media", "", "lost.bin"))
        rows.append((doc, _mk(spans)))
    seg = interleaved_segments(
        spark.createDataFrame(rows, SPANS_T)
    ).select("doc_id", "segments")
    store = spark.createDataFrame(
        media, "doc_id string, media_ref string, content binary"
    )

    def run(p):
        man = write_interleaved_webdataset(
            seg, store, str(p), n_shards=2
        ).collect()
        files = sorted(glob.glob(os.path.join(str(p), "*.tar")))
        return man, [open(f, "rb").read() for f in files]

    man1, b1 = run(tmp_path / "a")
    man2, b2 = run(tmp_path / "b")
    assert b1 == b2 and len(b1) == 2
    assert sum(m["n_docs"] for m in man1) == 12
    assert sum(m["n_media"] for m in man1) == 13  # 12 pngs + 1 missing

    # member layout: {key}.json then {key}.{j}.{ext}, grouped by key,
    # bytes equal the store's, missing ref ships as a 0-byte .missing
    samples = {}
    for blob in b1:
        with tarfile.open(fileobj=__import__("io").BytesIO(blob)) as tf:
            names = tf.getnames()
            for n in names:
                key = n.split(".", 1)[0]
                samples.setdefault(key, []).append(
                    (n, tf.extractfile(n).read())
                )
    assert len(samples) == 12
    for key, members in samples.items():
        assert members[0][0] == f"{key}.json"  # json leads its group
        d = json.loads(members[0][1])
        n_media = sum(1 for s in d["segments"] if s["type"] == "media")
        assert len(members) == 1 + n_media
        if d["doc_id"] == "d03":
            exts = sorted(m[0].rsplit(".", 1)[1] for m in members[1:])
            assert exts == ["missing", "png"]
            lost = [m for m in members if m[0].endswith(".missing")][0]
            assert lost[1] == b""
        png_member = [m for m in members if m[0].endswith(".png")][0]
        i = int(d["doc_id"][1:])
        assert png_member[1] == png + str(i).encode()
        # the j suffix is the media position among the doc's media segs
        assert png_member[0].split(".")[1] == "0"


# --------------------------------------------- multimodal token budget


def test_interleaved_token_counts(spark):
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_token_counts,
    )

    spans = [
        ("main", "three word text", ""),
        ("media", "alt text ignored for text count", "a.png"),
        ("main", "two\nmore", ""),   # \n is a token boundary
    ]
    r = interleaved_token_counts(
        interleaved_segments(_df(spark, spans)), tokens_per_image=100
    ).first()
    assert r["text_tokens"] == 5
    assert r["media_tokens"] == 100
    assert r["total_tokens"] == 105


def test_pack_interleaved_prefix_budget(spark):
    from machine_readability_checker_spark.operators.interleave import (
        pack_interleaved,
    )

    # 10 docs, each 2 text tokens + 1 image at 8 tokens = 10 total;
    # budget 25 → shards of floor(prefix/25): docs 0-2 shard 0, ...
    rows = [
        (f"d{i}", _mk([("main", "a b", ""), ("media", "", "m.png")]))
        for i in range(10)
    ]
    seg = interleaved_segments(spark.createDataFrame(rows, SPANS_T))
    out = pack_interleaved(
        seg, budget_tokens=25, tokens_per_image=8
    ).orderBy("doc_id").collect()
    assert [r["total_tokens"] for r in out] == [10] * 10
    assert [r["shard"] for r in out] == [
        (i * 10) // 25 for i in range(10)
    ]


# ----------------------------------------------------- streaming twin


def test_stream_interleaved_segments_matches_batch(spark, tmp_path):
    """interleaved_segments is a stateless narrow projection, so it
    rides Structured Streaming unchanged — the streaming output must
    equal the batch output row-for-row."""
    from machine_readability_checker_spark.operators.interleave import (
        interleaved_stats,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rows = [
        (
            f"doc{i:03d}",
            _mk(
                [("main", f"text {i}", ""), ("media", "alt", "m.png")]
                * (1 + i % 2)
            ),
        )
        for i in range(30)
    ]
    spark.createDataFrame(rows, SPANS_T).write.parquet(in_dir)

    stream = spark.readStream.schema(SPANS_T).parquet(in_dir)
    q = (
        interleaved_stats(interleaved_segments(stream))
        .drop("spans")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    batch = (
        interleaved_stats(
            interleaved_segments(spark.read.schema(SPANS_T).parquet(in_dir))
        )
        .drop("spans")
    )
    got = {r["doc_id"]: r.asDict() for r in spark.read.parquet(out_dir).collect()}
    want = {r["doc_id"]: r.asDict() for r in batch.collect()}
    assert got == want and len(got) == 30


# -------------------------------------------- frequent-media removal


def test_drop_frequent_media_and_remerge(spark):
    from machine_readability_checker_spark.operators.interleave import (
        drop_frequent_media,
    )

    # the "logo" payload rides in 4 docs (> max 3); each doc also has a
    # unique image that must survive
    rows, keys = [], []
    for i in range(5):
        doc = f"d{i}"
        spans = [
            ("main", "before", ""),
            ("media", "", "logo.png"),
            ("main", "after", ""),
            ("media", "", "photo.png"),
        ]
        rows.append((doc, _mk(spans)))
        if i < 4:
            keys.append((doc, "logo.png", "digest-logo"))
        else:  # doc 4's "logo.png" ref holds DIFFERENT bytes
            keys.append((doc, "logo.png", "digest-unique-logo"))
        keys.append((doc, "photo.png", f"digest-photo-{i}"))
    seg = interleaved_segments(spark.createDataFrame(rows, SPANS_T))
    mk = spark.createDataFrame(
        keys, "doc_id string, media_ref string, key string"
    )
    out = drop_frequent_media(seg, mk, max_occurrences=3)
    got = {r["doc_id"]: r for r in out.collect()}
    for i in range(4):
        r = got[f"d{i}"]
        assert r["n_media_dropped"] == 1
        # text re-merged around the removed logo; unique photo kept
        assert [
            (s["type"], s["text"], s["media_ref"]) for s in r["segments"]
        ] == [
            ("text", "before\n\nafter", None),
            ("media", "", "photo.png"),
        ]
    # doc 4's logo bytes are unique → nothing dropped
    r4 = got["d4"]
    assert r4["n_media_dropped"] == 0
    assert [s["type"] for s in r4["segments"]] == [
        "text", "media", "text", "media",
    ]
    # invariant: no two consecutive text segments anywhere
    for r in got.values():
        types = [s["type"] for s in r["segments"]]
        assert all(
            not (a == b == "text") for a, b in zip(types, types[1:])
        )


# ---------------------------------------------- hypothesis properties


def _ref_fold(spans, text_kinds, joiner="\n\n"):
    """Single-node reference of interleaved_segments' semantics."""
    kept = [
        s for s in spans
        if s["kind"] == "media"
        or (s["kind"] in text_kinds and s["text"])
    ]
    out, run = [], []

    def flush():
        if run:
            out.append(("text", joiner.join(run), None))
            run.clear()

    for s in kept:
        if s["kind"] == "media":
            flush()
            out.append(("media", s["text"], s["media_ref"]))
        else:
            run.append(s["text"])
    flush()
    return out


def test_fold_matches_reference_on_random_spans(spark):
    from hypothesis import given, settings, strategies as st

    from machine_readability_checker_spark.operators.interleave import (
        TEXT_KINDS,
    )

    kind = st.sampled_from(
        ["main", "media", "boilerplate", "title", "line"]
    )
    text = st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=6,
    )
    span = st.builds(
        lambda k, t, i: {
            "kind": k,
            "text": "" if k == "media" else t,
            "media_ref": f"m{i}.png" if k == "media" else "",
            "offset": 0,
        },
        kind, text, st.integers(0, 99),
    )
    cases = []

    @settings(max_examples=60, deadline=None)
    @given(st.lists(span, max_size=12))
    def collect(spans):
        cases.append(
            [dict(s, offset=i) for i, s in enumerate(spans)]
        )

    collect()
    # one Spark job for all generated cases (per-example Spark jobs
    # would take minutes); equality is still per-case
    df = spark.createDataFrame(
        [(str(i), c) for i, c in enumerate(cases)], SPANS_T
    )
    got = {
        r["doc_id"]: [
            (s["type"], s["text"], s["media_ref"])
            for s in r["segments"]
        ]
        for r in interleaved_segments(df).collect()
    }
    for i, c in enumerate(cases):
        assert got[str(i)] == _ref_fold(c, TEXT_KINDS), (i, c)


def test_drop_low_quality_media(spark):
    """LAION-style gate: undecodable / tiny / extreme-aspect images
    drop; healthy ones survive; text re-merges around removals."""
    from machine_readability_checker_spark.operators.interleave import (
        drop_low_quality_media,
    )

    spans = [
        ("main", "a", ""),
        ("media", "", "good.png"),
        ("main", "b", ""),
        ("media", "", "tiny.png"),
        ("main", "c", ""),
        ("media", "", "banner.png"),
        ("media", "", "broken.png"),
        ("media", "", "audio.wav"),  # no dims, no error → passes
    ]
    seg = interleaved_segments(_df(spark, spans))
    feats = spark.createDataFrame(
        [
            ("d1", "good.png", 128, 128, None),
            ("d1", "tiny.png", 10, 128, None),
            ("d1", "banner.png", 600, 100, None),
            ("d1", "broken.png", None, None, "bad huffman"),
            ("d1", "audio.wav", None, None, None),
        ],
        "doc_id string, media_ref string, width int, height int,"
        " decode_error string",
    )
    out = drop_low_quality_media(
        seg, feats, min_width=64, min_height=64, max_aspect=4.0
    ).first()
    assert out["n_media_dropped"] == 3
    assert [
        (s["type"], s["text"], s["media_ref"]) for s in out["segments"]
    ] == [
        ("text", "a", None),
        ("media", "", "good.png"),
        ("text", "b\n\nc", None),
        ("media", "", "audio.wav"),
    ]


def test_pair_webdataset_layout(spark, tmp_path):
    """img2dataset sample layout: {key}.<ext> + {key}.txt + {key}.json
    per pair, deterministic bytes, metadata round-trips."""
    import io
    import tarfile

    from machine_readability_checker_spark.operators.interleave import (
        write_pair_webdataset,
    )

    png = b"\x89PNG\r\n\x1a\npx"
    pairs = spark.createDataFrame(
        [
            (f"p{i}", f"a caption {i}", bytearray(png + str(i).encode()),
             f"d{i}", f"m{i}.png")
            for i in range(10)
        ],
        "pair_id string, caption string, content binary,"
        " doc_id string, media_ref string",
    )

    def run(p):
        man = write_pair_webdataset(pairs, str(p), n_shards=2).collect()
        files = sorted(glob.glob(os.path.join(str(p), "*.tar")))
        return man, [open(f, "rb").read() for f in files]

    man1, b1 = run(tmp_path / "a")
    man2, b2 = run(tmp_path / "b")
    assert b1 == b2 and len(b1) == 2
    assert sum(m["n_pairs"] for m in man1) == 10

    seen = 0
    for blob in b1:
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            names = tf.getnames()
            keys = sorted({n.split(".", 1)[0] for n in names})
            for key in keys:
                group = sorted(n for n in names if n.startswith(key + "."))
                exts = [g.rsplit(".", 1)[1] for g in group]
                assert sorted(exts) == ["json", "png", "txt"]
                meta = json.loads(
                    tf.extractfile(f"{key}.json").read()
                )
                i = int(meta["doc_id"][1:])
                assert meta["media_ref"] == f"m{i}.png"
                assert tf.extractfile(f"{key}.txt").read().decode() == \
                    f"a caption {i}"
                assert tf.extractfile(f"{key}.png").read() == \
                    png + str(i).encode()
                seen += 1
    assert seen == 10


def test_media_context_pairs_real_extraction_kinds(spark):
    """Regression: context mining must see the real extraction kinds
    (main/title/line...), not only a literal 'text' kind — the bug made
    every real-corpus context silently empty."""
    from machine_readability_checker_spark.operators.multimodal import (
        media_context_pairs,
    )

    spans = [
        ("title", "Page Title", ""),
        ("main", "before text", ""),
        ("media", "alt here", "m.png"),
        ("line", "after text", ""),
        ("boilerplate", "nav junk", ""),  # never context
    ]
    out = media_context_pairs(_df(spark, spans), window=3).first()
    assert out["alt_text"] == "alt here"
    assert out["context_before"] == "Page Title before text"
    assert out["context_after"] == "after text"


def test_stream_interleaved_export_generations(spark, tmp_path):
    """Streaming export writes one deterministic generation directory
    per micro-batch; a re-run with the same checkpoint adds nothing,
    and the union of generations holds every doc exactly once."""
    from machine_readability_checker_spark.streaming.stream_extract import (
        stream_interleaved_export,
    )

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def feed(lo, hi):
        rows = [
            (f"doc{i:03d}", _mk([("main", f"t{i}", ""),
                                 ("media", "", "m.png")]))
            for i in range(lo, hi)
        ]
        spark.createDataFrame(rows, SPANS_T).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    feed(0, 15)
    q = stream_interleaved_export(spark, in_dir, out_dir, ckpt, n_shards=2)
    q.awaitTermination(120)
    gens1 = sorted(
        d for d in os.listdir(out_dir) if d.startswith("gen-")
    )
    assert gens1  # at least one generation landed

    feed(15, 25)
    q2 = stream_interleaved_export(spark, in_dir, out_dir, ckpt, n_shards=2)
    q2.awaitTermination(120)
    gens2 = sorted(
        d for d in os.listdir(out_dir) if d.startswith("gen-")
    )
    assert len(gens2) > len(gens1)  # the delta landed as NEW generations

    # a third run with nothing new adds no generations
    q3 = stream_interleaved_export(spark, in_dir, out_dir, ckpt, n_shards=2)
    q3.awaitTermination(120)
    assert sorted(
        d for d in os.listdir(out_dir) if d.startswith("gen-")
    ) == gens2

    seen = []
    for g in gens2:
        for f in glob.glob(os.path.join(out_dir, g, "*.jsonl.gz")):
            for line in gzip.open(f, "rt"):
                seen.append(json.loads(line)["doc_id"])
    assert sorted(seen) == [f"doc{i:03d}" for i in range(25)]


def test_resolve_media_tampered_sidecar_quarantines(spark, tmp_path):
    """Integrity: if an archived payload is corrupted on disk after
    indexing, the digest join must NOT attach the wrong bytes — the
    affected refs come back as quarantine rows."""
    from machine_readability_checker_spark.sources.warcsink import (
        build_cdxj,
        write_warc_resources,
    )

    rows = [
        (f"d{i}", _mk([("main", "t", ""), ("media", "", "m.bin")]))
        for i in range(3)
    ]
    seg = interleaved_segments(
        spark.createDataFrame(rows, SPANS_T)
    ).select("doc_id", "segments")
    store = spark.createDataFrame(
        [(f"d{i}", "m.bin", bytearray(f"payload-{i}".encode()))
         for i in range(3)],
        "doc_id string, media_ref string, content binary",
    )
    warc_dir = str(tmp_path / "w")
    write_warc_resources(store, warc_dir, n_shards=1).collect()
    # materialize the index the way a consumer holds it (build_cdxj is
    # lazy — an unmaterialized frame would rescan the tampered file)
    lazy = build_cdxj(spark, os.path.join(warc_dir, "*.warc.gz"))
    idx = spark.createDataFrame(lazy.collect(), lazy.schema)

    # corrupt ONE record's gzip member mid-file (flip bytes inside the
    # first capture's span) AFTER the index was built
    f = glob.glob(os.path.join(warc_dir, "*.warc.gz"))[0]
    cap = min(idx.collect(), key=lambda r: r["offset"])
    data = bytearray(open(f, "rb").read())
    mid = cap["offset"] + cap["length"] // 2
    data[mid] ^= 0xFF
    data[mid + 1] ^= 0xFF
    open(f, "wb").write(bytes(data))

    got = {
        r["doc_id"]: r
        for r in resolve_media_segments(spark, seg, idx, warc_dir).collect()
    }
    assert len(got) == 3
    bad = [r for r in got.values() if r["error"] is not None]
    ok = [r for r in got.values() if r["error"] is None]
    # exactly the tampered record fails; the others still byte-match
    assert len(bad) == 1
    assert bad[0]["error"] == "indexed payload not fetched"
    assert bad[0]["content"] is None
    for r in ok:
        assert bytes(r["content"]) == f"payload-{r['doc_id'][1]}".encode()


def test_drop_and_remerge_matches_reference_on_random_inputs(spark):
    """Property: for random segment arrays and random drop sets, the
    rewrite equals dropping the refs in Python and re-folding — and
    the no-two-consecutive-text invariant always holds."""
    from hypothesis import given, settings, strategies as st

    from machine_readability_checker_spark.operators.interleave import (
        TEXT_KINDS,
        _drop_and_remerge,
    )

    span = st.one_of(
        st.builds(
            lambda t: ("main", t, ""),
            st.text(alphabet="abc xyz", min_size=1, max_size=4).filter(
                lambda s: s.strip()
            ),
        ),
        st.builds(
            lambda i: ("media", "", f"m{i}.png"), st.integers(0, 5)
        ),
    )
    cases = []

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(span, max_size=10),
        st.sets(st.integers(0, 5), max_size=4),
    )
    def collect(spans, drop_ids):
        cases.append((spans, {f"m{i}.png" for i in drop_ids}))

    collect()
    rows = [
        (str(i), _mk(c[0])) for i, (c) in enumerate(cases)
    ]
    seg = interleaved_segments(
        spark.createDataFrame(rows, SPANS_T)
    ).select("doc_id", "segments")
    drop_pairs = spark.createDataFrame(
        [
            (str(i), ref)
            for i, (spans, drops) in enumerate(cases)
            for ref in sorted(drops)
        ]
        or [("none", "never.png")],
        "doc_id string, media_ref string",
    )
    got = {
        r["doc_id"]: r
        for r in _drop_and_remerge(seg, drop_pairs).collect()
    }
    for i, (spans, drops) in enumerate(cases):
        kept = [
            s for s in spans
            if not (s[0] == "media" and s[2] in drops)
        ]
        want = _ref_fold(
            [
                {"kind": k, "text": t, "media_ref": m, "offset": j}
                for j, (k, t, m) in enumerate(kept)
            ],
            TEXT_KINDS,
        )
        r = got[str(i)]
        have = [
            (s["type"], s["text"], s["media_ref"])
            for s in r["segments"]
        ]
        assert have == want, (i, spans, drops)
        n_dropped = sum(
            1 for s in spans if s[0] == "media" and s[2] in drops
        )
        assert r["n_media_dropped"] == n_dropped
        types = [t for t, _, _ in have]
        assert all(
            not (a == b == "text") for a, b in zip(types, types[1:])
        )
