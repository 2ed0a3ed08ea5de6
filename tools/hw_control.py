"""Spark-free hardware-ceiling control for the scaling bench.

Runs the identical extraction kernel (``core/extract.py:extract_batch``)
over the identical corpus through a bare ``multiprocessing.Pool`` — no
JVM, no shuffle, no scheduler — so any throughput ratio below ideal
between two worker counts measures the *host* (turbo frequency, memory
bandwidth, hypervisor steal shared across both "clusters" of the
sandbox proxy), not the pipeline.  BENCH/BASELINE.md reports
(Spark efficiency / control efficiency) as the pipeline-attributable
scaling.

Usage:
    taskset -c 0-7  python tools/hw_control.py 8  [input_parquet_dir]
    taskset -c 0-31 python tools/hw_control.py 32 [input_parquet_dir]

Prints one JSON line {"workers": N, "docs": D, "wall_sec": W,
"docs_per_sec": R}.  Pin with taskset externally so workers inherit the
same core set the Spark run used.  The corpus is loaded once in the
parent; fork-start workers read it copy-on-write (no pickling of the
content blobs).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK_DOCS = 100
_DF = None


def _run_chunk(args):
    start, n = args
    from machine_readability_checker_spark.core.extract import extract_batch

    return len(extract_batch(_DF.iloc[start : start + n]))


def main() -> None:
    global _DF
    workers = int(sys.argv[1])
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/mrc_scale_input"

    import pyarrow.dataset as ds

    _DF = ds.dataset(path).to_table().to_pandas()
    total = len(_DF)
    chunks = [
        (start, min(CHUNK_DOCS, total - start))
        for start in range(0, total, CHUNK_DOCS)
    ]

    if len(chunks) < workers * 4:
        print(
            f"warning: only {len(chunks)} work units for {workers} workers "
            "— use a larger corpus or the control under-utilizes the pool",
            file=sys.stderr,
        )
    ctx = mp.get_context("fork")
    t0 = time.time()
    with ctx.Pool(workers) as pool:
        # chunksize=1: grouping dispatch units starves workers on small
        # corpora and invalidates the ceiling measurement
        done = sum(pool.imap_unordered(_run_chunk, chunks, chunksize=1))
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "workers": workers,
                "docs": done,
                "wall_sec": round(wall, 1),
                "docs_per_sec": round(done / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
