"""Corpus data card: hand-computed aggregate values, exact-vs-approx
percentile modes, missing-lang handling, JSON artifact round trip."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import datacard as DC


def _docs(spark):
    rows = [
        ("0", "a b c", "en"),        # 3 tokens
        ("1", "a b", "en"),          # 2
        ("2", "x", "de"),            # 1
        ("3", "p q r s", None),      # 4, lang missing → und
        ("4", "m n o p q", "en"),    # 5
    ]
    return spark.createDataFrame(
        rows, "doc_id string, text string, lang string"
    )


def test_datacard_values_hand_computed(spark):
    row = DC.corpus_datacard(_docs(spark)).first()
    assert row.n_docs == 5
    assert row.n_tokens == 15
    assert row.n_chars == sum(len(t) for t in ["a b c", "a b", "x", "p q r s", "m n o p q"])
    assert row.mean_tokens == pytest.approx(3.0)
    assert row.p50_tokens == pytest.approx(3.0)   # sorted [1,2,3,4,5]
    assert row.p90_tokens == pytest.approx(4.6)   # (n-1)*0.9 interp
    assert row.n_langs == 3
    assert row.top_lang == "en"
    assert row.top_lang_frac == pytest.approx(0.6)


def test_datacard_approx_mode_same_columns(spark):
    exact = DC.corpus_datacard(_docs(spark), exact_percentiles=True).first()
    approx = DC.corpus_datacard(_docs(spark), exact_percentiles=False).first()
    assert set(exact.asDict()) == set(approx.asDict())
    # tiny corpus: the sketch is exact here
    assert approx.p50_tokens == exact.p50_tokens


def test_datacard_without_lang_column(spark):
    docs = _docs(spark).drop("lang")
    row = DC.corpus_datacard(docs).first()
    assert row.n_langs == 1 and row.top_lang == "und"
    assert row.top_lang_frac == pytest.approx(1.0)


def test_write_datacard_artifact(spark, tmp_path):
    path = str(tmp_path / "cards" / "datacard.json")
    out = DC.write_datacard(
        DC.corpus_datacard(_docs(spark)),
        path,
        extra={"funnel": {"raw": 5}, "ppl_threshold": None},
    )
    back = json.loads(open(path, encoding="utf-8").read())
    assert back == json.loads(json.dumps(out))
    assert back["corpus"]["n_docs"] == 5
    assert back["provenance"]["funnel"]["raw"] == 5
