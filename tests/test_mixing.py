"""DoReMi mixture optimization: aggregate semantics, the
multiplicative-weights fold vs its closed form, and the broadcast
mixture-application plan."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import mixing as MX


def _losses(spark):
    # three domains with known mean excess: a=0.3, b=0.0 (clipped), c=0.1
    rows = [
        ("a", 0.8, 0.5),
        ("a", 0.9, 0.6),
        ("b", 0.2, 0.5),  # proxy beats ref → clips to 0
        ("b", 0.5, 0.5),
        ("c", 0.6, 0.5),
        ("c", 0.5, 0.4),
    ]
    return spark.createDataFrame(
        rows, "domain string, loss_proxy double, loss_ref double"
    )


def test_domain_excess_loss_clips_and_averages(spark):
    got = {
        r.domain: (r.n_examples, r.excess_loss)
        for r in MX.domain_excess_loss(_losses(spark)).collect()
    }
    assert got["a"] == (2, pytest.approx(0.3))
    assert got["b"] == (2, pytest.approx(0.0))
    assert got["c"] == (2, pytest.approx(0.1))


def test_doremi_weights_match_closed_form(spark):
    """With a static excess vector the normalized fold collapses to
    α_t = softmax(lr·t·λ); the iterative implementation must agree to
    float precision."""
    ex = MX.domain_excess_loss(_losses(spark))
    steps, lr, c = 50, 0.2, 1e-3
    got = {
        r.domain: r.weight
        for r in MX.doremi_weights(
            ex, steps=steps, lr=lr, smoothing=c
        ).collect()
    }
    lam = {"a": 0.3, "b": 0.0, "c": 0.1}
    doms = sorted(lam)
    want = {d: 0.0 for d in doms}
    for t in range(1, steps + 1):
        u = [math.exp(lr * t * lam[d]) for d in doms]
        z = sum(u)
        for d, ui in zip(doms, u):
            want[d] += (1 - c) * (ui / z) + c / len(doms)
    want = {d: v / steps for d, v in want.items()}
    for d in doms:
        assert got[d] == pytest.approx(want[d], rel=1e-9)


def test_doremi_weights_properties(spark):
    ex = MX.domain_excess_loss(_losses(spark))
    rows = MX.doremi_weights(ex, steps=100, lr=0.5).collect()
    w = {r.domain: r.weight for r in rows}
    assert sum(w.values()) == pytest.approx(1.0, abs=1e-9)
    assert w["a"] > w["c"] > w["b"]  # monotone in excess loss
    assert all(v >= 1e-3 / 3 for v in w.values())  # smoothing floor
    # lr=0 → uniform regardless of losses
    uni = MX.doremi_weights(ex, steps=10, lr=0.0).collect()
    assert all(r.weight == pytest.approx(1 / 3) for r in uni)


def test_apply_mixture_weights_subsamples_to_target(spark):
    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 800, F.lit("en"))
        .when(F.col("id") < 950, F.lit("de"))
        .otherwise(F.lit("rare"))
        .alias("domain"),
    )
    w = spark.createDataFrame(
        [("en", 1 / 3), ("de", 1 / 3), ("rare", 1 / 3)],
        "domain string, weight double",
    )
    kept = MX.apply_mixture_weights(docs, w).collect()
    by_dom: dict = {}
    for r in kept:
        by_dom.setdefault(r.domain, set()).add(r.doc_id)
    # scale = min(n_k/w_k) = 150 → target 50 per domain; rarest whole
    assert len(by_dom["rare"]) == 50
    assert 35 <= len(by_dom["en"]) <= 65
    assert 35 <= len(by_dom["de"]) <= 65
    # upweighting a domain only adds its documents (nested thresholds)
    w2 = spark.createDataFrame(
        [("en", 0.5), ("de", 0.25), ("rare", 0.25)],
        "domain string, weight double",
    )
    kept2 = {
        (r.domain, r.doc_id)
        for r in MX.apply_mixture_weights(docs, w2).collect()
    }
    assert {("en", d) for d in by_dom["en"]} <= kept2


def test_mixing_plans_never_shuffle_the_corpus(spark):
    docs = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("domain"),
        (F.col("id") / 100).alias("loss_proxy"),
        F.lit(0.3).alias("loss_ref"),
    )
    # excess aggregate: exactly one exchange (the groupBy)
    plan = (
        MX.domain_excess_loss(docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange") == 1
    # mixture application: broadcast join + filter, no window/sort
    w = spark.createDataFrame(
        [("0", 0.4), ("1", 0.3), ("2", 0.3)], "domain string, weight double"
    )
    plan2 = (
        MX.apply_mixture_weights(docs, w)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan2
    assert "BroadcastHashJoin" in plan2


def test_doremi_rounds_reduce_to_single_and_track_shifts(spark):
    """One round == doremi_weights exactly; across rounds the state
    carries forward, so a domain whose excess collapses in round 2
    ends below where the static fold would put it."""
    ex1 = MX.domain_excess_loss(_losses(spark))
    single = {
        r.domain: r.weight
        for r in MX.doremi_weights(
            ex1, steps=10, lr=0.3, smoothing=1e-3
        ).collect()
    }
    one_round = {
        r.domain: r.weight
        for r in MX.doremi_weights_rounds(
            [ex1], steps_per_round=10, lr=0.3, smoothing=1e-3
        ).collect()
    }
    for d in single:
        assert one_round[d] == pytest.approx(single[d], rel=1e-12)

    # round 2: domain a's excess collapses to zero (proxy caught up)
    ex2 = spark.createDataFrame(
        [("a", 2, 0.0), ("b", 2, 0.0), ("c", 2, 0.1)],
        "domain string, n_examples long, excess_loss double",
    )
    multi = {
        r.domain: r.weight
        for r in MX.doremi_weights_rounds(
            [ex1, ex2], steps_per_round=10, lr=0.3
        ).collect()
    }
    static = {
        r.domain: r.weight
        for r in MX.doremi_weights(ex1, steps=20, lr=0.3).collect()
    }
    assert multi["a"] < static["a"]  # refreshed losses pull a back down
    assert sum(multi.values()) == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(ValueError):
        MX.doremi_weights_rounds([])
