"""Content-defined chunking (FastCDC) — sub-file dedup for media blobs.

Whole-payload digests (the WARC revisit dedup) only deduplicate
IDENTICAL blobs; real media stores are full of *nearly* identical
ones — re-encoded thumbnails aside, the classic case is a large file
re-crawled with a few bytes inserted, which shifts every fixed-size
block and defeats block-level dedup entirely.  Content-defined
chunking (Muthitacharoen et al. 2001 LBFS; Xia et al. 2016 FastCDC)
cuts each blob where a rolling hash of the CONTENT crosses a
threshold, so an insertion only disturbs the chunk it lands in:
downstream chunks re-align and their digests still match.

The boundary rule here is FastCDC's gear hash: h = (h << 1 + gear[b])
mod 2^64 with a 256-entry random-looking (but FIXED, seeded) gear
table; a boundary fires when ``h & mask == 0`` once ``min_size`` is
reached, and ``max_size`` force-cuts pathological content.  Chunks are
reported as (offset, length, sha256) rows — the chunk-store view; the
corpus-level dedup ratio is one aggregate over chunk digests.

On CONSTANT byte runs the rolling hash converges to a fixed point and
boundaries stop firing — the known CDC behavior on zero-filled
regions — which is exactly what ``max_size`` force-cuts bound: a
constant region chunks at max_size, deduplicating perfectly against
any other constant region of the same byte.

Spark shape: one Arrow-batched kernel over the binary column (the
rolling hash is per-byte Python-loop work on bytes objects — exactly
the vectorized-batch case, never per-row ``F.udf``); everything after
the kernel is plain aggregates.  No SQL oracle exists for a per-byte
rolling hash, so verification is pytest: determinism, the
insertion-resilience property itself, and size-bound invariants.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, List, Tuple

from pyspark.sql import DataFrame, functions as F

#: fixed gear table — seeded stdlib RNG, frozen at import so every
#: executor and every run cuts identical boundaries
def _gear_table(seed: int = 0x3FA9) -> List[int]:
    import random

    rng = random.Random(seed)
    return [rng.getrandbits(64) for _ in range(256)]


_GEAR = _gear_table()
_MASK64 = (1 << 64) - 1


def cdc_boundaries(
    data: bytes,
    avg_size: int = 4096,
    min_size: int = 1024,
    max_size: int = 16384,
) -> List[Tuple[int, int]]:
    """(offset, length) chunk spans for one blob.  ``avg_size`` must
    be a power of two (the boundary mask is avg_size − 1, giving an
    expected chunk length of avg_size past the minimum)."""
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    mask = avg_size - 1
    out: List[Tuple[int, int]] = []
    n = len(data)
    start = 0
    while start < n:
        end = min(start + max_size, n)
        cut = end
        h = 0
        i = start
        limit_min = min(start + min_size, end)
        # warm the hash through the minimum region without testing
        while i < limit_min:
            h = ((h << 1) + _GEAR[data[i]]) & _MASK64
            i += 1
        while i < end:
            h = ((h << 1) + _GEAR[data[i]]) & _MASK64
            i += 1
            if h & mask == 0:
                cut = i
                break
        out.append((start, cut - start))
        start = cut
    return out


def chunk_blobs(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "doc_id",
    avg_size: int = 4096,
    min_size: int = 1024,
    max_size: int = 16384,
) -> DataFrame:
    """Blob table → chunk table: (id, chunk_idx, offset, length,
    sha256) via one Arrow-batched kernel; NULL/empty blobs yield no
    rows (they have no content to share)."""
    import pandas as pd

    schema = (
        f"{id_col} string, chunk_idx int, offset long, length long, "
        "sha256 string"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                id_col: [], "chunk_idx": [], "offset": [],
                "length": [], "sha256": [],
            }
            for rid, blob in zip(batch[id_col], batch[content_col]):
                if blob is None or len(blob) == 0:
                    continue
                b = bytes(blob)
                for j, (off, ln) in enumerate(
                    cdc_boundaries(b, avg_size, min_size, max_size)
                ):
                    out[id_col].append(str(rid))
                    out["chunk_idx"].append(j)
                    out["offset"].append(off)
                    out["length"].append(ln)
                    out["sha256"].append(
                        hashlib.sha256(b[off:off + ln]).hexdigest()
                    )
            yield pd.DataFrame(out)

    return df.select(id_col, content_col).mapInPandas(kernel, schema=schema)


def chunk_dedup_stats(chunks: DataFrame) -> DataFrame:
    """One-row storage answer over a chunk table: total vs distinct
    chunk bytes and the dedup ratio (bytes the chunk store would NOT
    have to hold again).  Distinct bytes count each sha256 once —
    one aggregate over (sha256, length) pairs."""
    per_digest = chunks.groupBy("sha256").agg(
        F.first("length").alias("_len"),
        F.count(F.lit(1)).alias("_refs"),
    )
    return per_digest.agg(
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum("_refs").alias("total_chunks"),
        F.sum(F.col("_len") * F.col("_refs")).alias("total_bytes"),
        F.sum("_len").alias("distinct_bytes"),
    ).select(
        "distinct_chunks",
        "total_chunks",
        "total_bytes",
        "distinct_bytes",
        F.round(
            1.0
            - F.try_divide(F.col("distinct_bytes"), F.col("total_bytes")),
            6,
        ).alias("dedup_ratio"),
    )
