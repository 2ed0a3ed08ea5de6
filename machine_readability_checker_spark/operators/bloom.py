"""Bloom-filter two-tier incremental dedup (the "seen set" problem).

An incremental crawl/ingest loop needs to answer "which of this
batch's keys have we EVER seen?" against a corpus that is orders of
magnitude larger than the batch.  The exact answer is an anti-join —
but a naive batch⋈corpus anti-join shuffles (or at least scans +
broadcasts against) the full corpus key set every cycle.  The classic
fix is a Bloom filter built over the seen keys:

1. ``build_bloom``: ONE narrow pass over the seen keys — k xxhash64
   probes per key (JVM, codegen) exploded to (word, mask) pairs — then
   one ``bit_or`` aggregate keyed on the 64-bit word index (map-side
   partial combine, so at most ``m/64`` rows cross the shuffle no
   matter how many keys went in), assembled into a ONE-ROW dense
   ``array<long>`` via map_from_entries + a sequence transform.  The
   filter never touches Python and never lands on the driver.
2. ``might_contain``: broadcast the 1-row filter, cross-join, and fold
   the k bit tests over the array column — a narrow map over the
   batch, zero Python, zero shuffle of the batch.
3. ``incremental_new_keys``: rows failing the filter are DEFINITELY
   new (Bloom filters have no false negatives) and bypass the join
   entirely; only the (small) candidate set that PASSES the filter is
   exactly re-checked with a LEFT ANTI join against the seen keys.
   The final answer is therefore EXACT — the filter only decides how
   little work the join does.

At 100 TB: the seen side is scanned once per build (and the build is
incremental-friendly: ``bit_or`` of two filters with equal (m, k) is
their union, see ``merge_blooms``); the batch-side membership test is
a broadcast of ``m/64`` longs (1 MiB at m=2^23).  Sizing follows the
standard formulas (``bloom_parameters``): for n=1e9 keys at 1% fpp
m≈9.6e9 bits — beyond the single-array comfort zone, so shard the key
space (hash-prefix → one filter per shard) rather than grow one array;
this module keeps one array and documents the cap.

No reference analog (the reference audits one uploaded workbook at a
time, `src/app/app.py:51-295`); this is the training-pipeline
extension mandated by the build brief, same family as the
index-probed batch dedup in `jobs/ingest.py`.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame, functions as F


def bloom_parameters(n_items: int, fpp: float = 0.01) -> Tuple[int, int]:
    """Optimal (m_bits, k_hashes) for ``n_items`` keys at target false
    positive rate ``fpp`` — the standard formulas m = -n·ln(p)/ln(2)^2
    and k = (m/n)·ln(2); m is rounded up to a multiple of 64 so the
    filter is a whole number of words."""
    n = max(n_items, 1)
    m = int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2)))
    m = max(((m + 63) // 64) * 64, 64)
    k = max(int(round(m / n * math.log(2))), 1)
    return m, k


def _probe_positions(key: Column, m_bits: int, k: int) -> list:
    """The k probe bit-positions for a key: pmod(xxhash64(key, i), m).
    Seeding with the probe index keeps the k hashes independent while
    staying pure JVM (xxhash64 is codegen)."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def _word_and_mask(pos: Column) -> Tuple[Column, Column]:
    word = F.floor(pos / F.lit(64)).cast("long")
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )
    return word, mask


def build_bloom(
    seen: DataFrame, key_col: str, m_bits: int, k: int
) -> DataFrame:
    """Seen keys → a ONE-ROW DataFrame ``(bloom: array<long>)`` of
    ``m_bits/64`` words.  Plan: narrow probe projection → explode to
    (word, mask) → ``bit_or`` aggregate on word (map-side combine caps
    the shuffle at m/64 rows per task) → map_from_entries + a
    sequence transform densifies the sparse words.  Nothing collects
    to the driver; the row is meant to be ``F.broadcast``-cross-joined
    by ``might_contain``."""
    n_words = m_bits // 64
    key = F.col(key_col)
    pairs = []
    for pos in _probe_positions(key, m_bits, k):
        w, msk = _word_and_mask(pos)
        pairs.append(F.struct(w.alias("word"), msk.alias("mask")))
    words = (
        seen.select(F.explode(F.array(*pairs)).alias("p"))
        .select(F.col("p.word").alias("word"), F.col("p.mask").alias("mask"))
        .groupBy("word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word", "bits"))
        ).alias("_mp")
    ).select(
        F.transform(
            F.sequence(F.lit(0).cast("long"), F.lit(n_words - 1).cast("long")),
            lambda i: F.coalesce(
                F.try_element_at(F.col("_mp"), i), F.lit(0).cast("long")
            ),
        ).alias("bloom")
    )


def merge_blooms(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of two filters with identical (m, k): element-wise OR of
    the word arrays — this is what makes the build incremental (build
    a filter per ingest batch, fold them instead of rescanning the
    corpus)."""
    return (
        a.select(F.col("bloom").alias("_a"))
        .crossJoin(F.broadcast(b.select(F.col("bloom").alias("_b"))))
        .select(
            F.zip_with(
                F.col("_a"), F.col("_b"), lambda x, y: x.bitwiseOR(y)
            ).alias("bloom")
        )
    )


def _membership_expr(key: Column, bloom: Column, m_bits: int, k: int) -> Column:
    cond = F.lit(True)
    for pos in _probe_positions(key, m_bits, k):
        w, msk = _word_and_mask(pos)
        hit = (
            F.try_element_at(bloom, (w + 1).cast("int")).bitwiseAND(msk)
            != 0
        )
        cond = cond & hit
    return cond


def might_contain(
    batch: DataFrame,
    bloom_row: DataFrame,
    key_col: str,
    m_bits: int,
    k: int,
    out_col: str = "might_contain",
) -> DataFrame:
    """Attach the Bloom membership verdict to every batch row: the
    1-row filter is broadcast-cross-joined (the batch side is NEVER
    shuffled) and the k bit tests fold over the array column — pure
    JVM expressions end to end.  ``True`` means "possibly seen"
    (false-positive rate ≈ fpp), ``False`` means "definitely new"."""
    return (
        batch.crossJoin(F.broadcast(bloom_row))
        .withColumn(
            out_col, _membership_expr(F.col(key_col), F.col("bloom"), m_bits, k)
        )
        .drop("bloom")
    )


def incremental_new_keys(
    batch: DataFrame,
    seen: DataFrame,
    key_col: str,
    fpp: float = 0.01,
    expected_items: Optional[int] = None,
    m_bits: Optional[int] = None,
    k: Optional[int] = None,
) -> DataFrame:
    """EXACT incremental dedup: the batch rows whose key does not
    appear in ``seen`` — two-tier, so the expensive exact check only
    runs on the sliver the Bloom filter could not rule out.

    - rows with ``might_contain = False`` are definitely new (no
      false negatives) and skip the join;
    - rows with ``might_contain = True`` (true hits + ~fpp false
      positives) are re-checked with a LEFT ANTI join against the
      distinct seen keys — at a realistic overlap this candidate set
      is a tiny fraction of the batch, so the join's shuffle moves
      almost nothing.

    ``expected_items`` sizes the filter (defaults to a count of the
    seen side — pass it when you already know the cardinality to save
    the action); explicit ``m_bits``/``k`` override sizing entirely.
    The result is exact for ANY filter parameters — fpp only moves
    work between the two tiers."""
    if m_bits is None or k is None:
        n = expected_items if expected_items is not None else seen.count()
        m_bits, k = bloom_parameters(n, fpp)
    bloom_row = build_bloom(seen, key_col, m_bits, k)
    flagged = might_contain(
        batch, bloom_row, key_col, m_bits, k, out_col="_mc"
    )
    definite_new = flagged.filter(~F.col("_mc")).drop("_mc")
    candidates = flagged.filter(F.col("_mc")).drop("_mc")
    seen_keys = seen.select(F.col(key_col).alias(key_col)).distinct()
    rechecked = candidates.join(seen_keys, key_col, "left_anti")
    return definite_new.unionByName(rechecked)
