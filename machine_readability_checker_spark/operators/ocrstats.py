"""OCR quality signals over hOCR documents.

OCR'd corpora need a confidence gate before training (garbled scans
poison a language model faster than web boilerplate), and the signal
is already in the bytes: hOCR carries a per-word ``x_wconf``.  This
operator turns each document's words into the three signals cleaning
policies actually use — word count, mean confidence, low-confidence
fraction — leaving the THRESHOLD decision to the funnel (same
parse-vs-policy split as the Gopher/C4 stages in
``operators/textstats.py``).

Scale shape (100 TB): one narrow Arrow-batched ``mapInPandas`` kernel,
zero shuffle — parallelism is the input partitioning, identical to the
extraction kernel's contract.  The per-doc output is three scalars, so
the operator is also a safe first stage before any wide join.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OCR_STATS_SCHEMA = (
    "doc_id string, n_pages int, n_words int, mean_conf double, "
    "frac_low double"
)


def ocr_conf_stats(
    df_docs: DataFrame, low_conf: float = 60.0
) -> DataFrame:
    """docs(doc_id, content=hOCR bytes) → per-doc confidence stats.

    ``mean_conf``/``frac_low`` are NULL for wordless documents (a
    scanned blank page is not a 0%%-confidence page)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..core.hocr import extract_hocr_blocks

        for batch in batches:
            rows = []
            for row in batch.itertuples(index=False):
                did = str(row.doc_id)
                try:
                    blocks, n_pages = extract_hocr_blocks(
                        bytes(row.content)
                    )
                except Exception:
                    rows.append((did, 0, 0, None, None))
                    continue
                confs = [c for _r, _t, _m, cs in blocks for c in cs]
                if not confs:
                    rows.append((did, n_pages, 0, None, None))
                    continue
                mean = sum(confs) / len(confs)
                frac = sum(1 for c in confs if c < low_conf) / len(confs)
                rows.append(
                    (did, n_pages, len(confs), float(mean), float(frac))
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "n_pages", "n_words", "mean_conf",
                         "frac_low"],
            )

    return df_docs.mapInPandas(kernel, schema=OCR_STATS_SCHEMA)
