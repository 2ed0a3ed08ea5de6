"""The distributed extraction operator.

``extract(df_raw)`` maps a docs_raw DataFrame through the shared
single-node core (``core/extract.py``) inside a ``mapInPandas`` kernel:

- **no shuffle**: extraction is embarrassingly parallel per document, so
  the kernel is a narrow transformation — the only exchange in the whole
  job is the optional up-front salted repartition for skew balance;
- **vectorized transfer**: rows reach Python as Arrow RecordBatches
  (bounded by ``maxRecordsPerBatch``); there is no per-row Python UDF;
- **one parse per document**: spans, rule results and metrics come out of
  a single kernel pass (the reference analogously loads each workbook once
  and feeds all checks from it — ``app.py:156-167``);
- **lineage**: each output row carries its ``partition_id``; a
  ``lineage()`` aggregation derives the per-partition row counts required
  by the north rule, exactly-once because it's computed from the committed
  output rows, not from accumulators.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F

from ..core.extract import extract_batch
from ..model import EXTRACT_SCHEMA


def _make_kernel(html_context: bool = False):
    def _kernel(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        tc = TaskContext.get()
        pid = tc.partitionId() if tc is not None else -1
        for batch in batches:
            if batch.empty:
                continue
            rows = extract_batch(batch, html_context=html_context)
            yield pd.DataFrame(
                {
                    "doc_id": [r["doc_id"] for r in rows],
                    "spans": [r["spans"] for r in rows],
                    "results": [r["results"] for r in rows],
                    "metrics": [r["metrics"] for r in rows],
                    "partition_id": [pid] * len(rows),
                }
            )

    return _kernel


#: default kernel (fixed-threshold HTML classifier) — the shape every
#: oracle lane pins; jobs opt into the context classifier per run
_kernel = _make_kernel(False)


def extract(df_raw: DataFrame, html_context: bool = False) -> DataFrame:
    """docs_raw → one row per document with spans + results + metrics.
    ``html_context=True`` routes HTML documents through the
    jusText-style context-sensitive block classifier (measured block F1
    0.998 vs 0.878 on the labeled QA corpus — core/html.py); the
    default stays the fixed-threshold mode every oracle lane pins."""
    kern = _kernel if not html_context else _make_kernel(True)
    return df_raw.mapInPandas(kern, schema=EXTRACT_SCHEMA)


def spans_table(extracted: DataFrame) -> DataFrame:
    """Project the canonical (doc_id, spans) table."""
    return extracted.select("doc_id", "spans")


def results_table(extracted: DataFrame) -> DataFrame:
    """Explode rule results to (doc_id, rule_id, passed, message)."""
    return extracted.select(
        "doc_id", F.explode("results").alias("r")
    ).select("doc_id", "r.rule_id", "r.passed", "r.message")


def metrics_table(extracted: DataFrame) -> DataFrame:
    """Per-document extraction metrics (lineage side table)."""
    return extracted.select("doc_id", "partition_id", "metrics.*")


def lineage_table(extracted: DataFrame) -> DataFrame:
    """Per-partition lineage rows (north-rule requirement): derived from
    committed output so the counts are exactly-once."""
    return extracted.groupBy("partition_id").agg(
        F.count("*").alias("docs_in"),
        F.sum("metrics.spans_out").alias("spans_out"),
        F.sum("metrics.parse_errors").alias("parse_errors"),
        F.sum(
            F.when(F.col("metrics.encoding") == "shift_jis", 1).otherwise(0)
        ).alias("encoding_fallbacks"),
        F.round(F.sum("metrics.wall_ms"), 3).alias("kernel_wall_ms"),
    )


def summarize_results(results: DataFrame) -> DataFrame:
    """Rule-level pass/fail summary — the reference's
    ``summarize_results`` (``src/processor/summary.py:1-26``) as one
    groupBy: per level, passed / total / pass-rate %."""
    return (
        results.withColumn("level", F.split(F.col("rule_id"), "-").getItem(0))
        .groupBy("level")
        .agg(
            F.count("*").alias("total"),
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("passed"),
        )
        .withColumn(
            "pass_rate_pct",
            F.round(F.col("passed") * 100.0 / F.col("total"), 1),
        )
        .orderBy("level")
    )
