"""Bloom-filter two-tier incremental dedup (operators/bloom.py).

Correctness contract: NO false negatives ever (a seen key always
flags might_contain), false-positive rate near the sized fpp, and
``incremental_new_keys`` EXACTLY equal to the plain anti-join no
matter what the filter says.  Scale contract: membership is pure JVM
(no Python eval in the plan) and the batch side never shuffles for
the filter test.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from machine_readability_checker_spark.operators import bloom as B


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _keys(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "key string")


def test_bloom_parameters_formulas():
    m, k = B.bloom_parameters(1000, 0.01)
    assert m % 64 == 0
    assert 9000 <= m <= 10000  # ~9.59 bits/key at 1% fpp
    assert k in (6, 7)
    # degenerate inputs stay sane
    m0, k0 = B.bloom_parameters(0, 0.01)
    assert m0 >= 64 and k0 >= 1


def test_no_false_negatives_and_fpp_band(spark):
    seen_vals = [f"seen-{i}" for i in range(2000)]
    fresh_vals = [f"fresh-{i}" for i in range(2000)]
    m, k = B.bloom_parameters(len(seen_vals), 0.01)
    bloom = B.build_bloom(_keys(spark, seen_vals), "key", m, k)

    flagged_seen = B.might_contain(_keys(spark, seen_vals), bloom, "key", m, k)
    assert flagged_seen.filter(~F.col("might_contain")).count() == 0

    fp = (
        B.might_contain(_keys(spark, fresh_vals), bloom, "key", m, k)
        .filter(F.col("might_contain"))
        .count()
    )
    # sized for 1%; allow slack for hash variance on 2000 trials
    assert fp / len(fresh_vals) < 0.05


def test_incremental_new_keys_exact_vs_anti_join(spark):
    seen = _keys(spark, [f"k{i}" for i in range(0, 3000, 2)])  # evens
    batch = _keys(spark, [f"k{i}" for i in range(1000, 4000)])
    got = sorted(
        r.key for r in B.incremental_new_keys(batch, seen, "key").collect()
    )
    want = sorted(
        r.key for r in batch.join(seen, "key", "left_anti").collect()
    )
    assert got == want and len(want) > 0


def test_empty_seen_passes_everything(spark):
    seen = _keys(spark, []).filter(F.lit(False))
    batch = _keys(spark, ["a", "b", "c"])
    out = B.incremental_new_keys(batch, seen, "key", expected_items=1)
    assert sorted(r.key for r in out.collect()) == ["a", "b", "c"]


def test_merge_blooms_is_union(spark):
    a_vals = [f"a{i}" for i in range(500)]
    b_vals = [f"b{i}" for i in range(500)]
    m, k = B.bloom_parameters(1000, 0.01)
    merged = B.merge_blooms(
        B.build_bloom(_keys(spark, a_vals), "key", m, k),
        B.build_bloom(_keys(spark, b_vals), "key", m, k),
    )
    whole = B.build_bloom(_keys(spark, a_vals + b_vals), "key", m, k)
    assert merged.head()["bloom"] == whole.head()["bloom"]


def test_membership_is_jvm_only_and_batch_never_shuffles(spark):
    seen = _keys(spark, [f"s{i}" for i in range(100)])
    batch = _keys(spark, [f"b{i}" for i in range(100)])
    m, k = B.bloom_parameters(100, 0.01)
    bloom = B.build_bloom(seen, "key", m, k)
    plan = _plan(B.might_contain(batch, bloom, "key", m, k))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only join is the broadcast of the 1-row filter; the batch
    # side must not hash-shuffle for the membership test
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    batch_side = plan.split("BroadcastExchange")[0]
    assert "Exchange hashpartitioning" not in batch_side
