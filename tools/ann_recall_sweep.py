"""Shortlist-size vs recall sweep for the PQ-family refine stage.

Quantifies the remaining headroom of the FAISS-style exact re-rank
(``pq_topk_refined`` / ``query_ivfpq_index_refined``): for each
shortlist size C the sweep measures recall@10 against exact squared-L2
ground truth and best-of-N query wall time, on the same deterministic
clustered corpus family the recall regression gates use
(``tests/test_pipeline_ops.py::test_ann_family_recall_floors``) scaled
up.  The cost model is visible in the numbers: the refine stage adds C
exact distance evaluations (corpus-size independent), so recall climbs
with C while query time grows only marginally until C approaches the
pruned-partition row count.

Usage: python tools/ann_recall_sweep.py [n_vectors] [dim]
Prints ONE JSON line:
  {"n": ..., "dim": ..., "queries": 5, "k": 10,
   "pq": {"C": {"recall": r, "sec": t}, ...},
   "ivfpq": {...}, "adc_only": {"pq": r0, "ivfpq": r0}}
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from machine_readability_checker_spark.operators import similarity  # noqa: E402
from machine_readability_checker_spark.session import get_spark  # noqa: E402

SHORTLISTS = [20, 40, 80, 160, 320]
K = 10
N_QUERIES = 5
BEST_OF = 3


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark()

    rng = np.random.RandomState(11)
    n_clusters = 16
    centers = rng.randn(n_clusters, dim) * 4
    mat = np.stack(
        [centers[i % n_clusters] + rng.randn(dim) * 0.6 for i in range(n)]
    )
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"]).cache()
    corpus.count()
    qids = [int(q) for q in rng.choice(n, N_QUERIES, replace=False)]

    def l2_truth(qid: int) -> set:
        d = np.sum((mat - mat[qid]) ** 2, axis=1)
        return set(np.argsort(d, kind="stable")[:K].tolist())

    def recall(ids_by_q: dict) -> float:
        hits = sum(len(ids_by_q[q] & l2_truth(q)) for q in qids)
        return hits / (K * len(qids))

    def timed(fn) -> tuple:
        best = float("inf")
        ids = None
        for _ in range(BEST_OF):
            t0 = time.perf_counter()
            ids = fn()
            best = min(best, time.perf_counter() - t0)
        return ids, best

    # --- PQ (full-scan ADC) -------------------------------------------
    cbs = similarity.pq_train(corpus, m=8, k=16, iters=3, assign="join")
    enc = similarity.pq_encode_join(corpus, cbs).cache()
    enc.count()

    out: dict = {
        "n": n, "dim": dim, "queries": N_QUERIES, "k": K,
        "pq": {}, "ivfpq": {}, "adc_only": {},
    }

    pq_ids, _ = timed(lambda: {
        q: {r["vec_id"]
            for r in similarity.pq_topk(enc, rows[q][1], cbs, k=K).collect()}
        for q in qids
    })
    out["adc_only"]["pq"] = recall(pq_ids)

    for c in SHORTLISTS:
        ids, sec = timed(lambda c=c: {
            q: {r["vec_id"]
                for r in similarity.pq_topk_refined(
                    enc, corpus, rows[q][1], cbs, k=K, shortlist=c
                ).collect()}
            for q in qids
        })
        out["pq"][str(c)] = {
            "recall": recall(ids), "sec": round(sec / N_QUERIES, 4)
        }

    # --- IVF-PQ (residual codes, partition-pruned) --------------------
    cents, cb2 = similarity.train_ivfpq(
        corpus, n_cells=n_clusters, m=4, k=16, cell_iters=3, pq_iters=3
    )
    path = os.path.join(tempfile.gettempdir(), "ann_sweep_ivfpq")
    similarity.write_ivfpq_index(corpus, path, cents, cb2, store_vectors=True)

    ivfpq_ids, _ = timed(lambda: {
        q: {r["vec_id"]
            for r in similarity.query_ivfpq_index(
                spark, path, rows[q][1], cents, cb2, k=K, n_probe=2
            ).collect()}
        for q in qids
    })
    out["adc_only"]["ivfpq"] = recall(ivfpq_ids)

    for c in SHORTLISTS:
        ids, sec = timed(lambda c=c: {
            q: {r["vec_id"]
                for r in similarity.query_ivfpq_index_refined(
                    spark, path, rows[q][1], cents, cb2,
                    k=K, n_probe=2, shortlist=c,
                ).collect()}
            for q in qids
        })
        out["ivfpq"][str(c)] = {
            "recall": recall(ids), "sec": round(sec / N_QUERIES, 4)
        }

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
