"""Code-corpus curation: license detection tiers, quality geometry,
and the StarCoder-style keep verdict."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import codestats as CS


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_detect_license_tiers(spark):
    rows = [
        ("spdx", "# SPDX-License-Identifier: Apache-2.0\ncode()"),
        ("mit", "Permission is hereby granted, free of charge, to any"),
        ("apache", "licensed under the apache license, version 2.0"),
        ("gpl", "under the GNU Lesser General Public License as"),
        ("bsd", "Redistribution and use in source and binary forms"),
        ("none", "def main():\n    return 42"),
        # SPDX tag wins over a phrase appearing later
        ("both", "SPDX-License-Identifier: MIT\n...GNU General Public License..."),
    ]
    got = {
        r.doc_id: r.license
        for r in _df(spark, rows)
        .select("doc_id", CS.detect_license(F.col("text")).alias("license"))
        .collect()
    }
    assert got["spdx"] == "apache-2.0"
    assert got["mit"] == "mit"
    assert got["apache"] == "apache-2.0"
    assert got["gpl"] == "gpl"
    assert got["bsd"] == "bsd"
    assert got["none"] is None
    assert got["both"] == "mit"


def test_code_quality_geometry_and_keep(spark):
    rows = [
        ("ok", "def f(x):\n    return x + 1\n"),
        ("longline", "x = '" + "a" * 1200 + "'"),
        ("minified", ";".join(["f()"] * 40)),  # one 159-char line
        ("blob", "0 1 2 3 4 5 6 7 8 9 " * 50),  # alpha_frac 0
        ("gen", "# This file is auto-generated. Do not edit.\npass"),
    ]
    got = {r.doc_id: r for r in CS.code_quality_stats(_df(spark, rows)).collect()}
    ok = got["ok"]
    assert ok.n_lines == 3 and ok.keep is True
    assert ok.max_line_len == len("    return x + 1")
    assert got["longline"].keep is False  # max_line_len > 1000
    assert got["longline"].max_line_len == 1200 + len("x = ''")
    # single 159-char line: under the max-line cap but over the
    # mean-line cap — exactly the minified-file signal the rule targets
    assert got["minified"].max_line_len == 159
    assert got["minified"].keep is False
    assert got["blob"].alpha_frac == 0.0 and got["blob"].keep is False
    assert got["gen"].autogen is True and got["gen"].keep is False
    # mean line length hand-check
    assert ok.mean_line_len == pytest.approx(
        (len("def f(x):") + len("    return x + 1") + 0) / 3, abs=1e-3
    )


def test_license_counts_inventory(spark):
    rows = [
        ("a", "SPDX-License-Identifier: MIT\n"),
        ("b", "Permission is hereby granted, free of charge"),
        ("c", "plain text"),
        ("d", "more plain text"),
    ]
    got = {
        r.license: r.n_docs
        for r in CS.license_counts(_df(spark, rows)).collect()
    }
    assert got == {"mit": 2, "none": 2}


def test_code_filters_funnel_stage(spark):
    """code_filters=True adds a `code_ok` stage to the one-pass funnel:
    geometry/autogen failures drop there, survivors flow on, and the
    stage is absent when the flag is off."""
    from machine_readability_checker_spark.operators import textstats as TS

    rows = [
        ("a", "def ok():\n    return 1 yes fine good"),
        ("b", "x = '" + "a" * 1500 + "' plus more words"),  # long line
        ("c", "# auto-generated do not edit\npass it is"),
        ("d", "also a perfectly normal prose line here"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    lab = TS.label_drop_stage(
        df, require_known_lang=False, code_filters=True
    )
    funnel = {
        r.stage: r.n_docs
        for r in TS.funnel_from_labels(
            lab, require_known_lang=False, code_filters=True
        ).collect()
    }
    assert funnel["raw"] == 4
    assert funnel["min_tokens"] == 4
    assert funnel["code_ok"] == 2  # b (geometry) and c (autogen) drop
    off = {
        r.stage
        for r in TS.funnel_from_labels(
            TS.label_drop_stage(df, require_known_lang=False),
            require_known_lang=False,
        ).collect()
    }
    assert "code_ok" not in off
