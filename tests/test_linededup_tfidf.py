"""Line-level corpus dedup (CCNet-style) and TF-IDF top terms."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.linededup import (
    dup_lines,
    strip_dup_lines,
)
from machine_readability_checker_spark.operators.textstats import (
    tfidf_top_terms,
)


def _docs(spark):
    rows = [
        (0, "unique alpha line\nSUBSCRIBE NOW\nmore unique prose"),
        (1, "SUBSCRIBE NOW\nanother one-off sentence"),
        (2, "totally different\nSUBSCRIBE NOW\nshared tail\nok"),
        (3, "shared tail\nsolo"),
        (4, "SUBSCRIBE NOW"),  # document that is pure boilerplate
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dup_lines_counts(spark):
    got = {
        r.line: (r.n_occurrences, r.n_docs)
        for r in dup_lines(_docs(spark)).collect()
    }
    assert got == {"SUBSCRIBE NOW": (4, 4), "shared tail": (2, 2)}


def test_strip_dup_lines_semantics(spark):
    out = {
        r.doc_id: (r.text, r.n_lines, r.n_kept)
        for r in strip_dup_lines(_docs(spark)).collect()
    }
    assert out[0] == ("unique alpha line\nmore unique prose", 3, 2)
    assert out[1] == ("another one-off sentence", 2, 1)
    assert out[2] == ("totally different\nok", 4, 2)
    assert out[3] == ("solo", 2, 1)
    # every copy dies — the pure-boilerplate doc survives as a row
    # with empty text, so downstream length filters can drop it
    assert out[4] == ("", 1, 0)


def test_strip_dup_lines_min_line_len_exemption(spark):
    docs = spark.createDataFrame(
        [(0, "ok\nlong duplicated line"), (1, "ok\nlong duplicated line x")],
        "doc_id long, text string",
    )
    # "ok" repeats but is below min_line_len → exempt, kept everywhere
    out = {
        r.doc_id: r.text
        for r in strip_dup_lines(docs, min_line_len=5).collect()
    }
    assert out[0] == "ok\nlong duplicated line"
    assert out[1] == "ok\nlong duplicated line x"


def test_strip_dup_lines_partition_invariant(spark):
    docs = _docs(spark)
    a = sorted(strip_dup_lines(docs.repartition(1)).collect())
    b = sorted(strip_dup_lines(docs.repartition(7)).collect())
    assert a == b


# ------------------------------------------------------------------ tfidf


def test_tfidf_matches_sequential(spark):
    rows = [
        (0, "apple banana apple cherry"),
        (1, "banana banana date"),
        (2, "cherry date elderberry elderberry elderberry"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.doc_id, r.term, r.tf, r.score, r.rn)
        for r in tfidf_top_terms(docs, k=2)
        .orderBy("doc_id", "rn")
        .collect()
    ]

    texts = {i: t.split() for i, t in rows}
    n = len(rows)
    df = {}
    for toks in texts.values():
        for t in set(toks):
            df[t] = df.get(t, 0) + 1

    def score(doc, term):
        tf = texts[doc].count(term)
        return tf * (math.log((n + 1.0) / (df[term] + 1.0)) + 1.0)

    for doc_id, term, tf, sc, rn in got:
        assert tf == texts[doc_id].count(term)
        assert math.isclose(sc, round(score(doc_id, term), 6), abs_tol=1e-9)
    # per-doc ordering: score desc, term asc, exactly k rows
    by_doc = {}
    for doc_id, term, tf, sc, rn in got:
        by_doc.setdefault(doc_id, []).append((sc, term, rn))
    for doc_id, lst in by_doc.items():
        assert [r for _, _, r in lst] == list(range(1, len(lst) + 1))
        assert lst == sorted(lst, key=lambda x: (-x[0], x[1]))
        assert len(lst) == 2


def test_tfidf_deterministic_tiebreak(spark):
    docs = spark.createDataFrame(
        [(0, "zz aa"), (1, "qq")], "doc_id long, text string"
    )
    # zz and aa: same tf, same df → identical score → term-ASC order
    got = [
        (r.term, r.rn)
        for r in tfidf_top_terms(docs, k=2)
        .filter(F.col("doc_id") == 0)
        .orderBy("rn")
        .collect()
    ]
    assert got == [("aa", 1), ("zz", 2)]


def test_compression_ratio_signal(spark):
    import zlib

    from machine_readability_checker_spark.operators.textstats import (
        with_compression_ratio,
    )

    prose = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "magistrates deliberated an entirely unrelated question of law"
    )
    spammy = "buy now " * 60
    rows = [(0, prose), (1, spammy), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.compression_ratio for r in with_compression_ratio(df).collect()}
    # exact agreement with a driver-side zlib call
    for i, t in rows[:2]:
        want = len(zlib.compress(t.encode(), 6)) / len(t.encode())
        assert abs(got[i] - want) < 1e-12
    # ordering property: spam compresses far better than prose
    assert got[1] < got[0]
    assert got[2] is None


def test_compression_funnel_stage(spark):
    """compression_ok drops exactly the below-threshold documents at
    its own stage index, between repetition and the model stages."""
    from machine_readability_checker_spark.operators.textstats import (
        funnel_from_labels,
        label_drop_stage,
        stage_names,
    )

    prose = (
        "seventeen magistrates deliberated an entirely unrelated "
        "question of law beside the quiet harbor"
    )
    spam = "buy now best price deal " * 40
    rows = [(0, prose), (1, spam), (2, prose + " extended further")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    lab = label_drop_stage(
        docs, require_known_lang=False, min_compression_ratio=0.35
    )
    names = stage_names(require_known_lang=False, compression=True)
    assert names == [
        "raw", "exact_dedup", "normalized_dedup", "min_tokens",
        "compression_ok",
    ]
    funnel = {
        r["stage"]: r["n_docs"]
        for r in funnel_from_labels(
            lab, require_known_lang=False, compression=True
        ).collect()
    }
    assert funnel["raw"] == 3
    assert funnel["min_tokens"] == 3
    assert funnel["compression_ok"] == 2  # the spam doc dies here
    dropped = {r.doc_id for r in lab.collect() if r._drop == 4}
    assert dropped == {1}


def test_normalize_text_forms(spark):
    import unicodedata

    from machine_readability_checker_spark.operators.textstats import (
        normalize_text,
    )

    decomposed = "café"          # e + combining acute
    compat = "ﬁle １２"   # fi-ligature, full-width digits
    ctrl = "a\x00b\x07c\td"            # NULs/bell stripped, tab kept
    rows = [(0, decomposed), (1, compat), (2, ctrl), (3, "  a   b  ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    nfc = {
        r.doc_id: r.norm_text
        for r in normalize_text(df, form="NFC", strip_controls=False).collect()
    }
    assert nfc[0] == unicodedata.normalize("NFC", decomposed) == "café"
    assert nfc[1] == compat  # NFC leaves compatibility chars alone

    nfkc = {
        r.doc_id: r.norm_text
        for r in normalize_text(df, form="NFKC", collapse_ws=True).collect()
    }
    assert nfkc[1] == "file 12"
    assert nfkc[2] == "abc d"  # controls stripped, tab collapsed
    assert nfkc[3] == "a b"

    with pytest.raises(ValueError):
        normalize_text(df, form="NFX")


def test_readability_hand_computed(spark):
    from machine_readability_checker_spark.operators.textstats import (
        readability_scores,
    )

    text = "The cat sat. The dog ran away quickly!"
    df = spark.createDataFrame([(text,), ("",)], "text string")
    rows = df.select(readability_scores(F.col("text")).alias("r")).collect()
    r = rows[0].r
    # 8 words, 2 sentences, syllables: 6x1 + away(2) + quickly(2) = 10
    assert (r.n_words, r.n_sentences, r.n_syllables) == (8, 2, 10)
    assert abs(r.reading_ease - (206.835 - 1.015 * 4 - 84.6 * 1.25)) < 1e-9
    assert abs(r.fk_grade - (0.39 * 4 + 11.8 * 1.25 - 15.59)) < 1e-9
    # silent-e discount: "table" is 2 vowel groups minus the silent e
    one = spark.createDataFrame([("table",)], "text string").select(
        readability_scores(F.col("text")).alias("r")
    ).collect()[0].r
    assert one.n_syllables == 1
    empty = rows[1].r
    assert empty.n_words == 0 and empty.reading_ease is None


# ------------------------------------------------ site-scoped boilerplate


def _site_docs(spark):
    # site a: 4 pages, nav on all 4 (frac 1.0), "promo x" on 2 (0.5),
    # "rare y" on 1 (0.25); site b: 2 pages, the SAME "promo x" line on
    # both (frac 1.0), plus unique prose
    rows = [
        (0, "a", "nav bar\nalpha prose\npromo x"),
        (1, "a", "nav bar\nbeta prose"),
        (2, "a", "nav bar\npromo x\nrare y"),
        (3, "a", "nav bar\ngamma prose"),
        (10, "b", "promo x\ndelta prose"),
        (11, "b", "promo x\nepsilon prose"),
    ]
    return spark.createDataFrame(rows, "doc_id long, site string, text string")


def test_site_boilerplate_lines_fraction(spark):
    from machine_readability_checker_spark.operators.linededup import (
        site_boilerplate_lines,
    )

    got = {
        (r.site, r.line): (r.n_pages, r.site_pages)
        for r in site_boilerplate_lines(
            _site_docs(spark), site_col="site", min_frac=0.5
        ).collect()
    }
    # nav dies on a (4/4); promo dies on BOTH sites independently
    # (2/4 = 0.5 on a, 2/2 on b); rare survives (1/4, and below
    # min_pages anyway)
    assert got == {
        ("a", "nav bar"): (4, 4),
        ("a", "promo x"): (2, 4),
        ("b", "promo x"): (2, 2),
    }


def test_strip_site_boilerplate_is_site_scoped(spark):
    from machine_readability_checker_spark.operators.linededup import (
        strip_site_boilerplate,
    )

    out = {
        r.doc_id: (r.site, r.text, r.n_lines, r.n_kept)
        for r in strip_site_boilerplate(
            _site_docs(spark), site_col="site", min_frac=0.6
        ).collect()
    }
    # at 0.6 the a-site promo (0.5) SURVIVES on a but dies on b (1.0):
    # the same line gets a per-site verdict
    assert out[0] == ("a", "alpha prose\npromo x", 3, 2)
    assert out[1] == ("a", "beta prose", 2, 1)
    assert out[2] == ("a", "promo x\nrare y", 3, 2)
    assert out[3] == ("a", "gamma prose", 2, 1)
    assert out[10] == ("b", "delta prose", 2, 1)
    assert out[11] == ("b", "epsilon prose", 2, 1)


def test_strip_site_boilerplate_min_pages_floor(spark):
    from machine_readability_checker_spark.operators.linededup import (
        strip_site_boilerplate,
    )

    # a single-page site can never accuse its own lines (min_pages=2
    # default), even though every line trivially has frac 1.0
    docs = spark.createDataFrame(
        [(0, "solo", "only page\nnav bar")],
        "doc_id long, site string, text string",
    )
    out = strip_site_boilerplate(docs, site_col="site").collect()[0]
    assert (out.text, out.n_lines, out.n_kept) == ("only page\nnav bar", 2, 2)


def test_strip_site_boilerplate_partition_invariant(spark):
    from machine_readability_checker_spark.operators.linededup import (
        strip_site_boilerplate,
    )

    docs = _site_docs(spark)
    a = sorted(
        (r.doc_id, r.text)
        for r in strip_site_boilerplate(
            docs.repartition(1), site_col="site"
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.text)
        for r in strip_site_boilerplate(
            docs.repartition(7), site_col="site"
        ).collect()
    )
    assert a == b
