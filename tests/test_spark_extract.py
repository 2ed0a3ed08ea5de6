"""End-to-end distributed extraction: Spark kernel output must equal the
single-node oracle exactly (span tuple sequences per document), and must be
invariant to partition count (1 / 8 / 32) — SURVEY.md §5 lane 1."""

from __future__ import annotations

import pandas as pd
import pytest

from machine_readability_checker_spark.core.extract import extract_document
from machine_readability_checker_spark.model import RAW_SCHEMA
from machine_readability_checker_spark.operators.extract import (
    extract,
    lineage_table,
    metrics_table,
    results_table,
    summarize_results,
)
from machine_readability_checker_spark.operators.repartition import salted_repartition
from machine_readability_checker_spark.sources.fixtures import gen_corpus

N_DOCS = 60


@pytest.fixture(scope="module")
def corpus() -> pd.DataFrame:
    return gen_corpus(N_DOCS)


@pytest.fixture(scope="module")
def oracle_spans(corpus):
    out = {}
    for row in corpus.itertuples(index=False):
        r = extract_document(
            row.doc_id, row.fmt, bytes(row.content),
            row.header_start_row, row.header_end_row,
            row.data_start_row, row.data_end_row,
        )
        out[row.doc_id] = [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
    return out


def _spark_spans(spark, corpus, num_partitions):
    df_raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    df_raw = salted_repartition(df_raw, num_partitions)
    extracted = extract(df_raw)
    rows = extracted.select("doc_id", "spans").collect()
    return {
        r["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans"]
        ]
        for r in rows
    }


@pytest.mark.parametrize("num_partitions", [1, 8, 32])
def test_span_equality_partition_invariant(spark, corpus, oracle_spans, num_partitions):
    got = _spark_spans(spark, corpus, num_partitions)
    assert set(got) == set(oracle_spans)
    for doc_id, expected in oracle_spans.items():
        assert got[doc_id] == expected, f"span mismatch for {doc_id}"


def test_offsets_strictly_increasing(spark, corpus):
    df_raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    extracted = extract(df_raw)
    for r in extracted.select("spans").collect():
        offs = [s["offset"] for s in r["spans"]]
        assert offs == list(range(len(offs)))


def test_side_tables(spark, corpus):
    df_raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    extracted = extract(salted_repartition(df_raw, 8)).cache()
    try:
        res = results_table(extracted)
        # every grid doc yields the full 22-rule catalog
        from machine_readability_checker_spark.core.grid import GRID_FORMATS

        n_grid = sum(1 for f in corpus["fmt"] if f in GRID_FORMATS)
        assert res.count() == n_grid * 22

        met = metrics_table(extracted)
        assert met.filter("parse_errors > 0").count() == 0
        assert met.count() == N_DOCS

        lin = lineage_table(extracted)
        lin_rows = lin.collect()
        assert sum(r["docs_in"] for r in lin_rows) == N_DOCS
        # partition lineage must cover >1 partition when repartitioned to 8
        assert len(lin_rows) > 1

        summary = summarize_results(res).collect()
        levels = {r["level"]: r for r in summary}
        assert "L1" in levels and levels["L1"]["total"] == n_grid * 15
    finally:
        extracted.unpersist()


def test_media_spans_present(spark, corpus):
    df_raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    from pyspark.sql import functions as F

    spans = extract(df_raw).select(
        "doc_id", F.explode("spans").alias("s")
    )
    media = spans.filter(F.col("s.kind") == "media")
    refs = [r["s"]["media_ref"] for r in media.collect()]
    assert any(ref.startswith("xl/drawings/") for ref in refs)
    assert any(ref.endswith(".png") for ref in refs)


def test_per_document_reports(spark):
    """Report sink: one markdown report per document, rendered JVM-side
    with a broadcast rule-catalog join; matches the driver-side renderer
    line for line."""
    from machine_readability_checker_spark.model import RAW_SCHEMA
    from machine_readability_checker_spark.operators.extract import (
        extract,
        results_table,
    )
    from pyspark.sql import functions as F

    from machine_readability_checker_spark.operators import report as R
    from machine_readability_checker_spark.sources.fixtures import gen_corpus

    corpus = gen_corpus(12)
    csv_rows = corpus[corpus["fmt"] == "csv"]
    raw = spark.createDataFrame(csv_rows, schema=RAW_SCHEMA)
    results = results_table(extract(raw))

    reports = {r["doc_id"]: r["report"]
               for r in R.per_document_reports(results).collect()}
    assert len(reports) == len(csv_rows)

    # plan property: the rule catalog rides a broadcast join
    plan = R.per_document_reports(results)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    # line-for-line agreement with the driver-side renderer
    rows = results.filter(F.col("rule_id").startswith("L1-")).collect()
    catalog = {rid: desc for rid, desc, _ in __import__(
        "machine_readability_checker_spark.core.checks", fromlist=["RULES"]
    ).RULES}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append({
            "id": r["rule_id"],
            "description": catalog[r["rule_id"]],
            "result": "✓" if r["passed"] else "✗",
            "message": r["message"],
        })
    for doc_id, checks in by_doc.items():
        checks.sort(key=lambda c: c["id"])
        expected = R.render_report(doc_id, checks)
        assert reports[doc_id] == expected, doc_id
    sample = next(iter(reports.values()))
    assert sample.startswith("# 機械可読性チェックレポート（レベル1）")
    assert "## LEVEL1：" in sample and "### LEVEL1 チェック詳細" in sample


def test_sheet_targeted_rule_results(spark):
    """A multi-sheet workbook whose problem cells live on sheet 2 must
    produce sheet-2 rule results when the RAW_SCHEMA sheet_idx hint says
    so — mirroring the reference's sheet picker (the app runs checks on
    the user-selected sheet, src/app/app.py:80-133)."""
    from machine_readability_checker_spark.core.extract import extract_document
    from machine_readability_checker_spark.core.xlsx import write_xlsx
    from machine_readability_checker_spark.model import RAW_SCHEMA
    from machine_readability_checker_spark.operators.extract import (
        extract,
        results_table,
    )

    clean_rows = [["id", "name", "val"]] + [
        [str(r), f"item{r}", str(r * 10)] for r in range(1, 6)
    ]
    messy_rows = [["code", "label", "amount"]] + [
        [str(r), f"row{r}", str(r)] for r in range(1, 6)
    ]
    content = write_xlsx(
        [
            {"name": "Clean", "rows": clean_rows},
            {
                "name": "Messy",
                "rows": messy_rows,
                "merged": [(2, 0, 3, 0)],
                "hidden_rows": [4],
            },
        ]
    )

    # core oracle: selected sheet flips L1-12 (merged) / L1-13 (hidden)
    def rules(sheet_idx):
        res = extract_document("d1", "xlsx", content, sheet_idx=sheet_idx)
        return {r["rule_id"]: r["passed"] for r in res["results"]}, res

    r0, full0 = rules(0)
    r1, full1 = rules(1)
    assert r0["L1-12"] and r0["L1-13"]
    assert not r1["L1-12"] and not r1["L1-13"]
    assert full0["metrics"]["merged_cells"] == 0
    assert full1["metrics"]["merged_cells"] == 1
    # spans cover every sheet regardless of the selected one
    assert [s["text"] for s in full0["spans"]] == [
        s["text"] for s in full1["spans"]
    ]
    # out-of-range hint falls back to sheet 0
    assert rules(7)[0] == r0

    # Spark lane: the hint column flows through the kernel
    raw = spark.createDataFrame(
        [
            ("docA", "xlsx", bytearray(content), len(content), 0, 0, 0, 0, 0),
            ("docB", "xlsx", bytearray(content), len(content), 0, 0, 0, 0, 1),
        ],
        schema=RAW_SCHEMA,
    )
    got = {
        (r["doc_id"], r["rule_id"]): r["passed"]
        for r in results_table(extract(raw)).collect()
    }
    assert got[("docA", "L1-12")] and got[("docA", "L1-13")]
    assert not got[("docB", "L1-12")] and not got[("docB", "L1-13")]
