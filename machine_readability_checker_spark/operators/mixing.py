"""Domain mixture optimization (training-data lane).

DoReMi (Xie et al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up
Language Model Pretraining") chooses per-domain sampling weights by
Group DRO over a small proxy model: domains where the proxy's loss
exceeds a reference model's loss ("excess loss") get upweighted via
multiplicative weights, and the final mixture is the time-average of
the per-step weight vectors.  The data-engine half of that loop is:

1. ONE hash aggregate over the corpus turning per-example (domain,
   proxy_loss, ref_loss) rows into per-domain mean excess loss — the
   only pass that touches the data, map-side combinable, output is
   #domains rows;
2. the exponentiated-gradient fold over those #domains rows — pure
   O(domains × steps) arithmetic, run driver-side on the collected
   aggregate (bounded: a training mixture has tens of domains, not
   millions — documented driver traffic, same class as the k-means
   seed collect in similarity.py).

The fold is DETERMINISTIC (no RNG) and, with a static excess-loss
vector, has the closed form α_t = softmax(η·t·λ) — which is what the
DuckDB oracle lane recomputes independently, pinning the update
algebra rather than the code.

Scale shape: the corpus is touched exactly once by an aggregate; the
weights table is broadcast-sized and feeds ``sampling.temperature_mix``
-style threshold application (``apply_mixture_weights`` below) as one
tiny broadcast join + narrow filter — the corpus never shuffles.

Reference parity note: no analog in the reference repo; this extends
the sampling/mixing family (sampling.py) with the published
mixture-optimization step.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

from .sampling import HASH_BUCKETS, hash_bucket


def domain_excess_loss(
    df: DataFrame,
    domain_col: str = "domain",
    proxy_col: str = "loss_proxy",
    ref_col: str = "loss_ref",
) -> DataFrame:
    """Per-domain Group-DRO excess loss: mean over the domain's
    examples of max(proxy − ref, 0) (DoReMi §3 step 2; the clip keeps
    domains the proxy already beats the reference on from pulling
    weights negative).  One aggregate scan; output is #domains rows:
    (domain, n_examples, excess_loss)."""
    ex = F.greatest(F.col(proxy_col) - F.col(ref_col), F.lit(0.0))
    return df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("n_examples"),
        F.avg(ex).alias("excess_loss"),
    )


def doremi_weights(
    excess: DataFrame,
    steps: int = 100,
    lr: float = 0.1,
    smoothing: float = 1e-3,
) -> DataFrame:
    """Multiplicative-weights fold over the per-domain excess-loss
    table (DoReMi Algorithm 1 with a static λ): starting uniform,
    α_t ∝ α_{t−1}·exp(lr·λ) renormalized each step; each step's
    mixture is smoothed toward uniform, α'_t = (1−c)·α_t + c/K; the
    returned weight is the time-average (1/T)·Σ_t α'_t — the paper's
    ᾱ, which damps the fold's drift toward a one-hot on the
    worst-excess domain.  The smoothing floor guarantees every domain
    keeps ≥ c/K mass, so no domain is starved out of the mixture.

    Runs driver-side on the collected aggregate (#domains rows —
    bounded by construction, see module docstring).  Returns
    (domain, excess_loss, weight) with Σ weight = 1."""
    rows: List[Tuple[str, float]] = sorted(
        (r["domain"], float(r["excess_loss"] or 0.0))
        for r in excess.select("domain", "excess_loss").collect()
    )
    if not rows:
        raise ValueError("excess-loss table is empty")
    k = len(rows)
    lam = [v for _, v in rows]
    state = [1.0 / k] * k
    acc = [0.0] * k
    for _ in range(steps):
        unnorm = [s * math.exp(lr * l) for s, l in zip(state, lam)]
        z = sum(unnorm)
        state = [u / z for u in unnorm]
        for i in range(k):
            acc[i] += (1.0 - smoothing) * state[i] + smoothing / k
    spark = excess.sparkSession
    out = spark.createDataFrame(
        [
            (d, l, a / steps)
            for (d, l), a in zip(rows, acc)
        ],
        "domain string, excess_loss double, weight double",
    )
    return out


def doremi_weights_rounds(
    excess_rounds: List[DataFrame],
    steps_per_round: int = 10,
    lr: float = 0.1,
    smoothing: float = 1e-3,
) -> "DataFrame":
    """The multi-round form of the fold — DoReMi Algorithm 1 with a
    REFRESHED excess-loss vector per round (as the proxy model trains,
    its per-domain excess changes; each round's table comes from one
    new ``domain_excess_loss`` aggregate over the latest losses).
    Multiplicative-weights state carries ACROSS rounds; the returned
    weight is the time-average over every step of every round.  Each
    round's collect is #domains rows, same boundedness argument as
    ``doremi_weights``; with a single round this reduces exactly to it
    (pinned in tests).

    Domains must be consistent across rounds (a domain absent from a
    later table keeps its state but contributes zero excess —
    spelled out rather than silently dropped)."""
    if not excess_rounds:
        raise ValueError("need at least one excess-loss table")
    lam_rounds: List[Dict[str, float]] = []
    domains: List[str] = []
    seen = set()
    for ex in excess_rounds:
        lam = {
            r["domain"]: float(r["excess_loss"] or 0.0)
            for r in ex.select("domain", "excess_loss").collect()
        }
        lam_rounds.append(lam)
        for d in sorted(lam):
            if d not in seen:
                seen.add(d)
                domains.append(d)
    domains = sorted(domains)
    k = len(domains)
    state = [1.0 / k] * k
    acc = [0.0] * k
    total_steps = 0
    for lam in lam_rounds:
        lvec = [lam.get(d, 0.0) for d in domains]
        for _ in range(steps_per_round):
            unnorm = [s * math.exp(lr * l) for s, l in zip(state, lvec)]
            z = sum(unnorm)
            state = [u / z for u in unnorm]
            for i in range(k):
                acc[i] += (1.0 - smoothing) * state[i] + smoothing / k
            total_steps += 1
    spark = excess_rounds[0].sparkSession
    last = lam_rounds[-1]
    return spark.createDataFrame(
        [
            (d, last.get(d, 0.0), a / total_steps)
            for d, a in zip(domains, acc)
        ],
        "domain string, excess_loss double, weight double",
    )


def apply_mixture_weights(
    df: DataFrame,
    weights: DataFrame,
    domain_col: str = "domain",
    id_col: str = "doc_id",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Subsample the corpus toward a target mixture without
    upsampling: the largest corpus consistent with weights w keeps
    c_k = min over domains of (n_k / w_k) · w_k examples of domain k,
    i.e. per-row keep rate (w_k / n_k) · min_j(n_j / w_j) — the same
    deterministic md5-bucket thresholding as
    ``sampling.temperature_mix`` (a row survives iff its hash bucket
    clears the domain's integer threshold: reproducible across
    runs/engines, nested under weight increases).  Plan: per-domain
    counts (tiny) ⋈ weights, broadcast back onto a narrow filter scan
    — the corpus never shuffles."""
    counts = df.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).alias("_n")
    )
    wc = counts.join(weights.select("domain", "weight"), "domain")
    scale = wc.agg(
        F.min(F.try_divide(F.col("_n"), F.col("weight"))).alias("_scale")
    )
    thresh = wc.crossJoin(F.broadcast(scale)).select(
        F.col("domain").alias(domain_col),
        F.round(
            F.least(
                F.lit(1.0),
                F.try_divide(
                    F.col("weight") * F.col("_scale"), F.col("_n")
                ),
            )
            * buckets
        )
        .cast("long")
        .alias("_thresh"),
    )
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    return (
        df.join(F.broadcast(thresh), domain_col)
        .filter(b < F.col("_thresh"))
        .drop("_thresh")
    )
