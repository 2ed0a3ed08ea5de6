"""C4 line battery (Raffel et al. 2020 §2.2): line filters, page
gates, funnel integration."""

from __future__ import annotations

import pyspark.sql.functions as F

from machine_readability_checker_spark.operators import textstats as TS

GOOD = "This is a good sentence number one."
QUESTION = "Is this not a question worth asking?"
FOX = "The quick brown fox jumps over the dog."


def _stats(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r["doc_id"]: r for r in TS.with_c4_line_stats(df).collect()}


def test_line_filters(spark):
    out = _stats(
        spark,
        [
            (0, "\n".join([GOOD, "short line", QUESTION])),
            (1, "\n".join(["Enable javascript to view.", GOOD])),
            (2, "\n".join(["We use cookies on this site.", GOOD])),
            (3, "\n".join(["Buy now!", GOOD])),
            (4, "He said “stop right there.”"),  # closing quote terminal
        ],
    )
    assert out[0]["c4_text"] == "\n".join([GOOD, QUESTION])
    assert out[0]["c4_n_lines"] == 3 and out[0]["c4_n_kept"] == 2
    assert out[1]["c4_text"] == GOOD  # javascript line removed
    assert out[2]["c4_text"] == GOOD  # cookie boilerplate removed
    assert out[3]["c4_text"] == GOOD  # 2-word line removed
    assert out[4]["c4_n_kept"] == 1


def test_page_gates(spark):
    five = "\n".join([GOOD, QUESTION, FOX, GOOD, QUESTION])
    out = _stats(
        spark,
        [
            (0, five),
            (1, five + "\nif (x) { return; }"),
            (2, five + "\nLorem Ipsum dolor sit amet."),
            (3, "\n".join([GOOD, QUESTION])),  # 2 sentences < 5
        ],
    )
    assert out[0]["c4_keep"] is True and out[0]["c4_n_sentences"] == 5
    assert out[1]["c4_keep"] is False  # brace page gate
    assert out[2]["c4_keep"] is False  # lorem ipsum, case-insensitive
    assert out[3]["c4_keep"] is False  # sentence floor


def test_c4_clean_rewrites_and_drops(spark):
    five = "\n".join([GOOD, "noise", QUESTION, FOX, GOOD, QUESTION])
    df = spark.createDataFrame(
        [(0, five), (1, "too { short.")], "doc_id long, text string"
    )
    out = TS.c4_clean(df).collect()
    assert len(out) == 1
    assert out[0]["text"] == "\n".join([GOOD, QUESTION, FOX, GOOD, QUESTION])
    assert out[0].asDict().keys() == {"doc_id", "text"}


def test_null_and_empty_text_do_not_crash(spark):
    df = spark.createDataFrame(
        [(0, None), (1, ""), (2, "   \n  ")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in TS.with_c4_line_stats(df).collect()}
    assert out[0]["c4_keep"] is False
    assert out[1]["c4_keep"] is False and out[1]["c4_n_kept"] == 0
    assert out[2]["c4_keep"] is False and out[2]["c4_n_kept"] == 0


def test_funnel_stage_and_rewrite(spark):
    five = "\n".join([GOOD, QUESTION, FOX, GOOD, QUESTION])
    rows = [
        (0, five + "\njunk line"),  # survives, text rewritten
        (1, "Lorem ipsum dolor sit amet.\n" + five),  # c4 page drop
        (2, five + "\njunk line"),  # exact dup of 0 → stage 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    lab = TS.label_drop_stage(
        df, require_known_lang=False, c4_lines=True
    )
    drops = {r["doc_id"]: r["_drop"] for r in lab.collect()}
    assert drops[0] is None
    assert drops[1] == 4  # the c4 stage sits after min_tokens
    assert drops[2] == 1  # exact dedup fires first
    # survivors carry the line-filtered text
    kept = lab.filter(F.col("_drop").isNull()).collect()
    assert kept[0]["text"] == five
    names = TS.stage_names(require_known_lang=False, c4_lines=True)
    assert names == ["raw", "exact_dedup", "normalized_dedup",
                     "min_tokens", "c4_lines"]
    funnel = {
        r["stage"]: r["n_docs"]
        for r in TS.funnel_from_labels(
            lab, require_known_lang=False, c4_lines=True
        ).collect()
    }
    assert funnel == {
        "raw": 3, "exact_dedup": 2, "normalized_dedup": 2,
        "min_tokens": 2, "c4_lines": 1,
    }


# ------------------------------------------------------ badwords gate


def test_blocklist_hit_word_boundaries(spark):
    from pyspark.sql import functions as F

    from machine_readability_checker_spark.operators.textstats import (
        blocklist_hit,
    )

    rows = [
        (1, "this has SPAMWORD inside", True),
        (2, "notspamword is different", False),
        (3, "spamword", True),
        (4, "a scam ALERT today", True),
        (5, "scamalert fused", False),
        (6, "clean text only", False),
        (7, "edge spamword, punctuation", True),
        (9, "multi\nline spamword\nhere", True),
        (10, "日本語のspamword混在", True),  # CJK context is non-letter? NO
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _ in rows], ["id", "text"]
    )
    got = {
        r["id"]: r["hit"]
        for r in df.select(
            "id",
            blocklist_hit(
                F.col("text"), ["spamword", "scam alert"]
            ).alias("hit"),
        ).collect()
    }
    for i, _, want in rows:
        if i == 10:
            continue  # asserted separately below
        assert got[i] is want, (i, got[i])
    # \p{L} covers CJK: embedded in Japanese LETTERS is still inside a
    # "word", so the boundary rule does NOT fire — same as RE2
    assert got[10] is False


def test_blocklist_chunking_past_100(spark):
    from pyspark.sql import functions as F

    from machine_readability_checker_spark.operators.textstats import (
        blocklist_hit,
    )

    words = [f"w{i}x" for i in range(250)] + ["needle"]
    df = spark.createDataFrame(
        [(1, "hay hay needle hay"), (2, "hay only"), (3, "w137x here")],
        ["id", "text"],
    )
    got = {
        r["id"]: r["hit"]
        for r in df.select(
            "id", blocklist_hit(F.col("text"), words).alias("hit")
        ).collect()
    }
    assert got == {1: True, 2: False, 3: True}


def test_badwords_funnel_stage(spark):
    from pyspark.sql import functions as F

    from machine_readability_checker_spark.operators import textstats as TS

    rows = [(i, t) for i, t in enumerate([
        "this is a clean document with enough tokens to survive here",
        "this one mentions spamword among its many other normal tokens",
        "another clean document with plenty of words to pass the floor",
        "the scam alert phrase appears in this otherwise fine document",
        "notspamword should never trigger the gate in this document",
    ])]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    lab = TS.label_drop_stage(
        df, id_col="doc_id", require_known_lang=False,
        badwords=["spamword", "scam alert"],
    )
    f = TS.funnel_from_labels(lab, require_known_lang=False, badwords=True)
    out = [(r["stage_idx"], r["stage"], r["n_docs"]) for r in f.collect()]
    assert out[-1] == (4, "badwords_ok", 3), out
    survivors = sorted(
        r["doc_id"] for r in lab.filter(F.col("_drop").isNull()).collect()
    )
    assert survivors == [0, 2, 4]
