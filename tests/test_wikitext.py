"""MediaWiki wikitext lane + dump source.

The grid pin is cross-LANE: the wiki variant tables must densify to
grids byte-identical to the HTML variants' (`operators/webtables.py`),
which is what lets the driver's wiki_table_rules lane reuse the
hand-derived HTML verdict literals verbatim.
"""

from __future__ import annotations

import bz2

import pytest

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.html import extract_html_tables
from machine_readability_checker_spark.core.wikitext import (
    extract_wiki_spans,
    extract_wiki_tables,
)
from machine_readability_checker_spark.sources.wikidump import (
    _decompress_multistream,
    iter_dump_pages,
    write_dump_xml,
)

LONG = "This sentence is long enough to classify as main body content."


# ------------------------------------------------------------ wikitext


def test_template_strip_nested_and_unclosed():
    spans, err = extract_wiki_spans(
        f"{{{{Infobox |a={{{{nested|x}}}} }}}}\n{LONG}\n".encode()
    )
    assert err is None and spans == [("main", LONG, "")]
    spans, err = extract_wiki_spans(
        f"{LONG}\n\n{{{{runaway template never closes".encode()
    )
    assert spans == [("main", LONG, "")]


def test_links_and_refs():
    spans, _ = extract_wiki_spans(
        "'''Alpha''' is a [[city]] in the [[United States|US]]"
        "<ref name=a>x</ref> and [[Category:Cities]] it thrives."
        .encode()
    )
    assert spans == [
        ("main", "Alpha is a city in the US and it thrives.", "")
    ]


def test_pipe_trick():
    spans, _ = extract_wiki_spans(
        "See [[Springfield (fictional city)|]] and "
        "[[Help:Contents|]] for everything else worth reading."
        .encode()
    )
    assert spans[0][1] == (
        "See Springfield and Contents for everything else worth reading."
    )


def test_file_link_caption_to_media():
    spans, _ = extract_wiki_spans(
        "[[File:A.png|thumb|right|250px|alt=desc|The caption here]]\n\n"
        f"{LONG}\n".encode()
    )
    assert spans == [
        ("media", "The caption here", "File:A.png"),
        ("main", LONG, ""),
    ]


def test_headings_title_promotion_and_redirect():
    spans, _ = extract_wiki_spans(
        f"= Page =\n\n== Section ==\n{LONG}\n".encode()
    )
    assert spans == [
        ("title", "Page", ""),
        ("heading", "Section", ""),
        ("main", LONG, ""),
    ]
    spans, _ = extract_wiki_spans("#REDIRECT [[Target Page]]".encode())
    assert spans == [("boilerplate", "#REDIRECT Target Page", "")]


def test_math_code_nowiki():
    spans, _ = extract_wiki_spans(
        "<math>x^2</math>\n\n<pre>raw\ncode</pre>\n\n"
        "<nowiki>{{not a template}}</nowiki> survives in prose flow."
        .encode()
    )
    assert spans == [
        ("math", "x^2", ""),
        ("code", "raw\ncode", ""),
        ("main", "{{not a template}} survives in prose flow.", ""),
    ]


def test_comment_and_magic_strip():
    spans, _ = extract_wiki_spans(
        f"<!-- note -->__TOC__\n{LONG}<!-- unclosed".encode()
    )
    assert spans == [("main", LONG, "")]


def test_table_caption_and_rows():
    spans, _ = extract_wiki_spans(
        "{|\n|+ Pop by year\n! y !! n\n|-\n| 1900 || 10\n|}\n".encode()
    )
    assert spans == [
        ("caption", "Pop by year", ""),
        ("line", "y\tn", ""),
        ("line", "1900\t10", ""),
    ]


def test_nested_table_dropped_whole():
    grids = extract_wiki_tables(
        "{|\n| a || b\n|-\n| c ||\n{|\n| inner\n|}\n|-\n| d || e\n|}\n"
        .encode()
    )
    assert len(grids) == 1
    flat = [c for row in grids[0] for c in row]
    assert "inner" not in flat and "a" in flat and "e" in flat


def test_wiki_grids_equal_html_grids():
    from machine_readability_checker_spark.operators.webtables import (
        VARIANT_TABLES,
        WIKI_VARIANT_TABLES,
        wiki_variant_doc,
    )

    for v in (0, 1, 2):
        html_grids, _enc = extract_html_tables(
            VARIANT_TABLES[v].encode(), ""
        )
        assert extract_wiki_tables(WIKI_VARIANT_TABLES[v].encode()) == (
            html_grids
        )
        # and through the full variant doc (prose must never leak into
        # the grid)
        assert extract_wiki_tables(
            wiki_variant_doc(v, "prose | with [[bad]] {{chars}}")
        ) == html_grids


def test_extract_document_integration():
    out = extract_document("w1", "wiki", f"= T =\n\n{LONG}\n".encode())
    assert out["parse_error"] is None
    assert [s["kind"] for s in out["spans"]] == ["title", "main"]


# ---------------------------------------------------------- dump source


def _pages():
    return [
        ("1", "Alpha", 0, f"'''Alpha''' lead. {LONG}", False),
        ("2", "Talk:Alpha", 1, "talk chatter", False),
        ("3", "Redir", 0, "#REDIRECT [[Alpha]]", True),
        ("4", "Beta", 0, f"== Intro ==\n{LONG}", False),
    ]


def test_dump_iter_filters_ns_and_redirects():
    xml = write_dump_xml(_pages())
    got = [(p, t) for p, t, _, _ in iter_dump_pages(xml)]
    assert got == [("1", "Alpha"), ("4", "Beta")]
    kept = [p for p, *_ in iter_dump_pages(xml, keep_redirects=True)]
    assert kept == ["1", "3", "4"]
    all_ns = [p for p, *_ in iter_dump_pages(xml, namespaces=(0, 1))]
    assert all_ns == ["1", "2", "4"]


def test_dump_first_id_wins():
    """revision/contributor <id> elements must not clobber the page
    id (the fixture writer emits both)."""
    xml = write_dump_xml([("7", "Only", 0, "x", False)])
    assert [p for p, *_ in iter_dump_pages(xml)] == ["7"]


def test_dump_bz2_and_multistream():
    xml = write_dump_xml(_pages())
    assert [p for p, *_ in iter_dump_pages(bz2.compress(xml))] == ["1", "4"]
    assert _decompress_multistream(
        bz2.compress(b"hello ") + bz2.compress(b"world")
    ) == b"hello world"


def test_dump_source_spark(spark, tmp_path):
    from pyspark.sql import functions as F

    from machine_readability_checker_spark.sources.wikidump import (
        read_wikidump,
    )

    p = tmp_path / "part1.xml.bz2"
    p.write_bytes(bz2.compress(write_dump_xml(_pages())))
    raw = read_wikidump(spark, str(tmp_path / "*.xml.bz2"))
    rows = {r["doc_id"]: r for r in raw.collect()}
    assert set(rows) == {"part1.xml.bz2!1", "part1.xml.bz2!4"}
    assert all(r["fmt"] == "wiki" for r in rows.values())
    # title prepended as the level-1 heading → title span downstream
    body = bytes(rows["part1.xml.bz2!1"]["content"]).decode()
    assert body.startswith("= Alpha =\n\n")
    out = extract_document("x", "wiki", body.encode())
    assert out["spans"][0]["kind"] == "title"
    assert out["spans"][0]["text"] == "Alpha"

    # corrupt part → one quarantine row, not a task failure
    (tmp_path / "bad.xml").write_bytes(b"<mediawiki><page>")
    raw2 = read_wikidump(spark, str(tmp_path / "bad.xml"))
    bad = raw2.collect()
    assert len(bad) == 1 and bad[0]["fmt"] == "__wikidump_error__"


# ---------------------------------------------------------- link graph


def test_extract_wiki_links_matrix():
    from machine_readability_checker_spark.core.wikitext import (
        extract_wiki_links,
    )

    art = (
        "{{Infobox|of=[[Hidden In Template]]}}\n"
        "'''X''' links [[alpha beta]] and [[Gamma_Delta#frag|the δs]] "
        "and [[alpha beta]] again.<ref>[[In Ref]]</ref>\n"
        "[[File:pic.png|thumb|[[Nested In Caption]]]]\n"
        "[[Category:Things]] [[#section-only]] [[werewolf]]\n"
    )
    got = extract_wiki_links(art.encode())
    assert got == [
        ("Alpha beta", "alpha beta"),
        ("Gamma Delta", "the δs"),          # underscores + fragment
        ("Alpha beta", "alpha beta"),        # duplicate mention kept
        ("Werewolf", "werewolf"),            # first-letter capitalized
    ]


def test_wiki_edges_feed_linkgraph_family(spark):
    from pyspark.sql import types as T

    from machine_readability_checker_spark.operators.linkgraph import (
        degree_stats,
        extract_wiki_edges,
        graph_edges,
    )

    rows = [
        ("A", "links to [[B]] and [[C|see]] and [[B]]".encode()),
        ("B", "links to [[C]]".encode()),
        ("C", "no links".encode()),
    ]
    df = spark.createDataFrame(
        rows,
        T.StructType([
            T.StructField("title", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]),
    )
    edges = extract_wiki_edges(df)
    assert edges.count() == 4  # duplicate A->B mention kept
    graph = graph_edges(edges)
    assert graph.count() == 3  # deduped
    deg = {r["node"]: (r["out_degree"], r["in_degree"])
           for r in degree_stats(graph).collect()}
    assert deg["A"] == (2, 0) and deg["B"] == (1, 1) and deg["C"] == (0, 2)
