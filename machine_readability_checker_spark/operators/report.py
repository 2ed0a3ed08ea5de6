"""Human-readable report sink — the reference's markdown report
(``src/app/app.py:331-350``) and summary table
(``src/processor/summary.py:1-26``) re-expressed over the distributed
results table.

The reference renders one report per interactive session; here
``per_document_reports`` renders one markdown report PER DOCUMENT as a
DataFrame column, entirely in native expressions: the rule catalog is a
broadcast dimension join, per-document assembly is
``sort_array(collect_list(struct(...)))`` → ``transform`` →
``array_join`` — no Python in the loop, so report generation scales
like any other aggregation.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from pyspark.sql import DataFrame, functions as F

from ..core.checks import RULES

REPORT_TITLE = "# 機械可読性チェックレポート（レベル1）"
OVERALL_COMMENT = (
    "診断は完了しました。詳細は各チェック項目の結果を確認してください。"
)


def rule_catalog(spark) -> DataFrame:
    """The rule catalog as a (tiny) dimension table."""
    return spark.createDataFrame(
        [(rule_id, desc) for rule_id, desc, _fn in RULES],
        ["rule_id", "description"],
    )


def summary_table_md(checks: List[Dict[str, str]], level: str = "level1") -> str:
    """The reference's summary table (``summary.py:9-24``): header row,
    per-level passed/total/rate with ``{:.0f}%`` formatting, ``N/A`` on
    empty."""
    total = len(checks)
    passed = sum(1 for c in checks if c["result"] == "✓")
    rate = f"{(passed / total * 100):.0f}%" if total > 0 else "N/A"
    lines = [
        "| チェックレベル | 合格数 | 全体数 | 合格率 |",
        "|----------------|--------|--------|--------|",
        f"| {level.upper()} | {passed} | {total} | {rate} |",
    ]
    return "### チェック結果サマリー\n\n" + "\n".join(lines)


def render_report(
    file_name: str, checks: List[Dict[str, str]], level: str = "level1"
) -> str:
    """One document's markdown report with the reference's exact line
    structure (``app.py:331-350``): title, file name, 総評, the
    ``## LEVEL1：p/t 合格`` summary line, then per-rule detail blocks."""
    passed = sum(1 for c in checks if c["result"] == "✓")
    lines = [
        REPORT_TITLE,
        f"ファイル名: {file_name}",
        "",
        "## 総評",
        OVERALL_COMMENT,
        "",
        f"## {level.upper()}：{passed}/{len(checks)} 合格",
        f"\n### {level.upper()} チェック詳細",
    ]
    for item in checks:
        lines.append(f"#### {item['id']} – {item['description']}")
        lines.append(f"- 判定: {item['result']}")
        lines.append(f"- 詳細: {item['message']}\n")
    return "\n".join(lines)


def per_document_reports(
    results: DataFrame, level_prefix: str = "L1-"
) -> DataFrame:
    """(doc_id, report): the reference's markdown report rendered for
    every document, JVM-side.  ``results`` is the exploded
    (doc_id, rule_id, passed, message) table."""
    spark = results.sparkSession
    l1 = results.filter(F.col("rule_id").startswith(level_prefix))
    joined = l1.join(F.broadcast(rule_catalog(spark)), "rule_id")

    item = F.struct(
        F.col("rule_id"),
        F.col("description"),
        F.when(F.col("passed"), "✓").otherwise("✗").alias("result"),
        F.col("message"),
    )
    per_doc = joined.groupBy("doc_id").agg(
        F.sort_array(F.collect_list(item)).alias("items"),
        F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("n_passed"),
        F.count("*").alias("n_total"),
    )
    block = F.transform(
        F.col("items"),
        lambda it: F.concat(
            F.lit("#### "), it["rule_id"], F.lit(" – "), it["description"],
            F.lit("\n- 判定: "), it["result"],
            F.lit("\n- 詳細: "), it["message"], F.lit("\n"),
        ),
    )
    report = F.concat(
        F.lit(REPORT_TITLE + "\n"),
        F.lit("ファイル名: "), F.col("doc_id"),
        F.lit("\n\n## 総評\n" + OVERALL_COMMENT + "\n\n"),
        F.lit("## LEVEL1："), F.col("n_passed").cast("string"),
        F.lit("/"), F.col("n_total").cast("string"), F.lit(" 合格\n"),
        F.lit("\n### LEVEL1 チェック詳細\n"),
        F.array_join(block, "\n"),
    )
    return per_doc.select("doc_id", report.alias("report"))
