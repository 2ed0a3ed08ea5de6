"""JSON-LD + microdata harvest: parser semantics and the Spark kernel."""

from __future__ import annotations

from machine_readability_checker_spark.core.structdata import (
    parse_structured_data,
)
from machine_readability_checker_spark.operators.structdata import (
    structured_data,
)


def _parse(html: str):
    return parse_structured_data(html.encode("utf-8"))


def test_jsonld_scalar_props():
    items = _parse(
        '<html><head><script type="application/ld+json">'
        '{"@context":"https://schema.org","@type":"Product",'
        '"name":"Widget","price":12,"inStock":true}'
        "</script></head><body></body></html>"
    )
    assert len(items) == 1
    it = items[0]
    assert it["format"] == "jsonld" and it["type"] == "Product"
    assert it["props"] == [
        ("name", "Widget"), ("price", "12"), ("inStock", "true")
    ]


def test_jsonld_array_graph_and_nesting():
    items = _parse(
        '<script type="application/ld+json">'
        '{"@graph":[{"@type":"Article","headline":"H",'
        '"author":{"@type":"Person","name":"A"}},'
        '{"@type":["Review","Thing"],"rating":["5","4"]}]}'
        "</script>"
    )
    types = [(i["type"], i["props"]) for i in items]
    # graph root (no @type, no scalar props besides @graph) comes first
    assert types[0] == (None, [])
    assert types[1] == ("Article", [("headline", "H"), ("author", "Person")])
    assert types[2] == ("Person", [("name", "A")])  # nested after parent
    assert types[3] == ("Review", [("rating", "5"), ("rating", "4")])


def test_jsonld_malformed_is_skipped():
    items = _parse(
        '<script type="application/ld+json">{not json</script>'
        '<script type="application/ld+json">{"@type":"Thing","a":"b"}'
        "</script>"
    )
    assert len(items) == 1 and items[0]["type"] == "Thing"


def test_microdata_value_sources_and_text():
    items = _parse(
        '<div itemscope itemtype="https://schema.org/Person">'
        '<span itemprop="name">Jane   <b>Q</b> Doe</span>'
        '<a itemprop="url" href="/jane">home</a>'
        '<meta itemprop="age" content="44">'
        '<time itemprop="born" datetime="1980-01-02">Jan 1980</time>'
        "</div>"
    )
    assert len(items) == 1
    it = items[0]
    assert it["format"] == "microdata"
    assert it["type"] == "https://schema.org/Person"
    # document order: each property lands when its element completes
    assert it["props"] == [
        ("name", "Jane Q Doe"),
        ("url", "/jane"),
        ("age", "44"),
        ("born", "1980-01-02"),
    ]


def test_microdata_nested_item_and_multi_names():
    items = _parse(
        '<div itemscope itemtype="T1">'
        '<span itemprop="a b">v</span>'
        '<div itemprop="child" itemscope itemtype="T2">'
        '<span itemprop="x">y</span></div>'
        "</div>"
    )
    assert len(items) == 2
    parent, child = items
    assert parent["type"] == "T1"
    assert ("child", "T2") in parent["props"]
    assert ("a", "v") in parent["props"] and ("b", "v") in parent["props"]
    assert child["type"] == "T2" and child["props"] == [("x", "y")]


def test_orphan_itemprop_and_tag_soup():
    # itemprop outside any itemscope is ignored; unclosed junk never raises
    items = _parse(
        '<span itemprop="lost">v</span><div itemscope><p itemprop="k">w'
    )
    assert len(items) == 1
    # unclosed capture is dropped with the truncated markup
    assert items[0]["props"] == []


def test_spark_kernel(spark):
    html = (
        '<script type="application/ld+json">{"@type":"Product","name":"W"}'
        '</script><div itemscope itemtype="P"><i itemprop="n">x</i></div>'
    )
    df = spark.createDataFrame(
        [("d0", "https://e.com/p", bytearray(html.encode()))],
        "doc_id string, url string, content binary",
    )
    rows = sorted(
        structured_data(df).collect(),
        key=lambda r: (r["item_id"], r["prop_idx"]),
    )
    assert [
        (r["item_id"], r["format"], r["item_type"], r["prop"], r["value"])
        for r in rows
    ] == [
        (0, "jsonld", "Product", "name", "W"),
        (1, "microdata", "P", "n", "x"),
    ]
    assert rows[0]["url"] == "https://e.com/p"
