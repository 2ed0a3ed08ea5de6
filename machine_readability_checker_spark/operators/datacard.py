"""Corpus data card: the dataset-documentation aggregate.

Published corpora ship a "data card" (Datasheets for Datasets, Gebru
et al. 2018; the HF dataset card): corpus size, token totals, length
distribution, language mix — the numbers a consumer checks before
training on the data.  At pipeline scale that documentation must be
COMPUTED, not hand-written, and regenerated with every corpus build.

``corpus_datacard`` is ONE aggregate scan (exact percentiles ride the
same aggregate; at 10^12 documents swap them for approx_percentile —
the one-line change is documented on the parameter).  ``write_datacard``
renders the row plus caller-supplied provenance (funnel counts,
thresholds, build id) as a stable-key JSON file next to the corpus.

Reference parity note: no analog in the reference repo; this documents
the training-corpus output the reference never produces.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

from pyspark.sql import DataFrame, functions as F

from .textstats import tokens


def corpus_datacard(
    df: DataFrame,
    text_col: str = "text",
    lang_col: Optional[str] = "lang",
    exact_percentiles: bool = True,
) -> DataFrame:
    """One-row corpus summary: doc/char/token totals, token-length
    mean/median/p90, and the language mix (count of distinct languages
    + the dominant one with its share).  ``exact_percentiles=True``
    (default, and what the SQL oracle checks) buffers per-group values
    in the aggregate — fine up to memory; at full corpus scale pass
    False to ride ``approx_percentile`` instead (same columns, sketch
    error documented by Spark).

    One aggregate job; the language mode is a second tiny aggregate
    over the per-language counts (group-count rows, not corpus rows)."""
    n_tok = F.size(tokens(F.col(text_col)))
    base = df.select(
        n_tok.alias("_nt"),
        F.length(F.col(text_col)).alias("_nc"),
        *(
            [F.coalesce(F.col(lang_col), F.lit("und")).alias("_lang")]
            if lang_col and lang_col in df.columns
            else [F.lit("und").alias("_lang")]
        ),
    )
    if exact_percentiles:
        p50 = F.percentile(F.col("_nt"), F.lit(0.5))
        p90 = F.percentile(F.col("_nt"), F.lit(0.9))
    else:
        p50 = F.percentile_approx(F.col("_nt"), F.lit(0.5), F.lit(10_000))
        p90 = F.percentile_approx(F.col("_nt"), F.lit(0.9), F.lit(10_000))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(F.sum("_nc"), F.lit(0)).alias("n_chars"),
        F.coalesce(F.sum("_nt"), F.lit(0)).alias("n_tokens"),
        F.round(F.avg("_nt"), 4).alias("mean_tokens"),
        F.round(p50, 4).alias("p50_tokens"),
        F.round(p90, 4).alias("p90_tokens"),
    )
    langs = (
        base.groupBy("_lang")
        .agg(F.count(F.lit(1)).alias("_n"))
        .agg(
            F.count(F.lit(1)).alias("n_langs"),
            F.max(F.struct(F.col("_n"), F.col("_lang"))).alias("_top"),
            F.sum("_n").alias("_total"),
        )
        .select(
            "n_langs",
            F.col("_top._lang").alias("top_lang"),
            F.round(
                F.col("_top._n") / F.col("_total"), 6
            ).alias("top_lang_frac"),
        )
    )
    return stats.crossJoin(F.broadcast(langs))


def write_datacard(
    card: DataFrame, path: str, extra: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Render the one-row card (+ caller provenance under
    ``provenance``) as sorted-key JSON at ``path``; returns the dict.
    Atomic write (temp + rename)."""
    import tempfile

    row = card.first().asDict()
    out: Dict[str, Any] = {"corpus": row}
    if extra:
        out["provenance"] = extra
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d)
    with os.fdopen(fd, "w", encoding="utf-8") as f:
        json.dump(out, f, ensure_ascii=False, sort_keys=True, indent=2)
        f.write("\n")
    os.replace(tmp, path)
    return out
