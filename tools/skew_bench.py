"""Whale-document skew evidence (VERDICT r2 "Next round" #5): measure
per-partition kernel time for the extraction job over a whale-planted
corpus, with the salted repartition ON vs OFF.

The OFF scenario models the realistic worst case — a size-ordered
corpus layout (crawl dumps arrive roughly sorted by source, and range
partitioning by size co-locates the giants), expressed as
``repartitionByRange(n, n_bytes)`` which lands every whale in the same
partition.  The ON scenario is the engine's default
``salted_repartition`` (hash(doc_id, salt) + log2-size bucket).

Per-partition "task time" is the sum of the kernel's own per-document
``metrics.wall_ms`` grouped by the lineage ``partition_id`` — measured
inside the job, so hypervisor noise on other partitions cannot pollute
the comparison.

Usage:  python tools/skew_bench.py [n_normal] [n_whales]
Prints one JSON line with max/median partition-time and wall time per
scenario.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from machine_readability_checker_spark.model import RAW_SCHEMA  # noqa: E402
from machine_readability_checker_spark.operators.extract import extract  # noqa: E402
from machine_readability_checker_spark.operators.repartition import (  # noqa: E402
    salted_repartition,
)
from machine_readability_checker_spark.session import get_spark  # noqa: E402
from machine_readability_checker_spark.sources import fixtures as FX  # noqa: E402


def build_corpus(spark, n_normal: int, n_whales: int):
    normal = FX.gen_corpus(n_normal, whale_every=None)
    whales = pd.DataFrame(
        [
            {
                **FX.fam_whale(np.random.RandomState(FX.SEED + i), i),
                "sheet_idx": 0,
            }
            for i in range(n_whales)
        ]
    )
    whales["doc_id"] = "planted_" + whales["doc_id"]
    return spark.createDataFrame(
        pd.concat([normal, whales], ignore_index=True), schema=RAW_SCHEMA
    )


def partition_times(extracted) -> list:
    rows = (
        extracted.groupBy("partition_id")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("metrics.wall_ms") / 1000.0).alias("task_s"),
        )
        .collect()
    )
    return sorted(float(r["task_s"]) for r in rows)


def run_scenario(df, parts: int, salted: bool) -> dict:
    if salted:
        part = salted_repartition(df, parts)
    else:
        part = df.repartitionByRange(parts, F.col("n_bytes"))
    t0 = time.time()
    ext = extract(part).localCheckpoint(eager=False)
    times = partition_times(ext)
    wall = time.time() - t0
    return {
        "wall_s": round(wall, 3),
        "n_partitions": len(times),
        "max_task_s": round(times[-1], 3),
        "median_task_s": round(times[len(times) // 2], 3),
        "straggler_ratio": round(times[-1] / max(times[len(times) // 2], 1e-9), 1),
    }


def main() -> None:
    n_normal = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    n_whales = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "mrc-skew-bench", master=f"local[{cpus}]", shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.createDataFrame(
        build_corpus(spark, n_normal, n_whales).toPandas(), schema=RAW_SCHEMA
    ).persist()
    df.count()
    # warmup spawns workers/codegen so neither scenario pays it
    extract(df.limit(64)).write.format("noop").mode("overwrite").save()
    out = {
        "n_normal": n_normal,
        "n_whales": n_whales,
        "cores": cpus,
        "unsalted_rangepart": run_scenario(df, cpus, salted=False),
        "salted": run_scenario(df, cpus, salted=True),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
