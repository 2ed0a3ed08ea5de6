"""spark-submit helper: materialize the deterministic fixture corpus to
parquet, generated distributed (one RNG stream per document index)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from machine_readability_checker_spark.session import get_spark  # noqa: E402
from machine_readability_checker_spark.sources.fixtures import (  # noqa: E402
    gen_corpus_spark,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument(
        "--splits", type=int, default=0,
        help="pre-bucket the corpus by split_id(doc_id) and write it "
        "partitioned by split — the Iceberg bucket(N, doc_id) layout; "
        "downstream wave filters then read only their splits (partition "
        "pruning) instead of re-scanning the whole corpus per wave",
    )
    args = ap.parse_args()

    spark = get_spark("mrc-gen-corpus")
    spark.sparkContext.setLogLevel("WARN")
    corpus = gen_corpus_spark(spark, args.n, partitions=args.partitions)
    if args.splits:
        from machine_readability_checker_spark.operators.repartition import split_id

        corpus = corpus.withColumn("split", split_id("doc_id", args.splits))
    writer = corpus.write.mode("overwrite")
    if args.splits:
        writer = writer.partitionBy("split")
    writer.parquet(args.out)
    print(args.out)
    spark.stop()


if __name__ == "__main__":
    main()
