"""CSV delimiter-dialect handling (.tsv + semicolon/pipe sniffing).

PARITY GUARD pin: a sample containing ANY comma keeps the reference's
pandas-default comma behavior — sniffing can only fire on comma-free
files, so every reference-parity CSV fixture is untouched.
"""

from __future__ import annotations

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.core.grid import (
    _sniff_delimiter,
    parse_csv,
    parse_document,
)


def test_sniffer_matrix():
    assert _sniff_delimiter("a,b\n1,2\n") == ","
    assert _sniff_delimiter("a;b\n1;2\n") == ";"
    assert _sniff_delimiter("a\tb\n1\t2\n") == "\t"
    assert _sniff_delimiter("a|b\n1|2\n") == "|"
    # parity guard: one comma anywhere wins over many semicolons
    assert _sniff_delimiter("a;b;c,\n1;2;3\n") == ","
    # quoted separators don't count
    assert _sniff_delimiter('a;"x,y"\n1;"2,3"\n') == ";"
    # nothing tabular → comma (pandas default, single column)
    assert _sniff_delimiter("plain prose line\nanother\n") == ","


def test_semicolon_csv_parses_as_grid():
    doc = parse_csv("id;name\n1;alpha\n2;beta\n".encode())
    assert doc.parse_error is None
    assert doc.sheets[0].rows[0] == ["id", "name"]
    assert doc.sheets[0].rows[1][1] == "alpha"


def test_tsv_format_and_rule_battery():
    out = extract_document(
        "t", "tsv", "id\tname\n1\talpha\n2\tbeta\n".encode()
    )
    assert out["parse_error"] is None
    kinds = [s["kind"] for s in out["spans"]]
    assert kinds == ["header", "header", "cell", "cell"]
    rules = {r["rule_id"]: r for r in out["results"]}
    l101 = rules["L1-01"]
    assert l101["passed"] and ".tsv" in l101["message"]
    # the embedded-newline CSV rule applies to tsv too (same risk)
    assert any(
        "改行" in r["message"] for r in out["results"] if r["passed"]
    )


def test_tsv_with_commas_in_cells_stays_tab_split():
    doc = parse_document("tsv", "a\tb\nx,y\t2\n".encode())
    assert doc.sheets[0].rows[1] == ["x,y", "2"]


def test_comma_file_with_stray_semicolons_keeps_comma():
    doc = parse_csv("a,b\nx;y,2\n".encode())
    assert doc.sheets[0].rows[1] == ["x;y", "2"]
