"""Politeness-aware frontier scheduling (operators/frontier.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.frontier import (
    schedule_frontier,
)


def _frontier(spark):
    rows = [
        # one hot domain (4 urls), one small (2), one singleton
        ("hot.example", "http://hot.example/a", 0.9),
        ("hot.example", "http://hot.example/b", 0.9),  # tie → url order
        ("hot.example", "http://hot.example/c", 0.5),
        ("hot.example", "http://hot.example/d", 0.1),
        ("small.example", "http://small.example/x", 0.2),
        ("small.example", "http://small.example/y", 0.8),
        ("solo.example", "http://solo.example/", 0.0),
    ]
    return spark.createDataFrame(
        rows, "domain string, url string, priority double"
    )


def test_waves_interleave_hosts_and_respect_priority(spark):
    out = schedule_frontier(_frontier(spark), delay_s=2.0).collect()
    by_url = {r.url: r for r in out}
    # within-domain priority order, url tiebreak
    assert by_url["http://hot.example/a"].host_rank == 0
    assert by_url["http://hot.example/b"].host_rank == 1
    assert by_url["http://hot.example/c"].host_rank == 2
    assert by_url["http://hot.example/d"].host_rank == 3
    assert by_url["http://small.example/y"].host_rank == 0
    # wave 0 holds one URL per domain: fetchable concurrently
    wave0 = [r.url for r in out if r.fetch_wave == 0]
    assert len(wave0) == 3
    assert len({u.split("/")[2] for u in wave0}) == 3
    assert by_url["http://hot.example/d"].eta_s == 6.0


def test_slots_per_wave_packs_multiple_per_host(spark):
    out = schedule_frontier(_frontier(spark), slots_per_wave=2).collect()
    hot = sorted(
        (r for r in out if r.domain == "hot.example"),
        key=lambda r: r.host_rank,
    )
    assert [r.fetch_wave for r in hot] == [0, 0, 1, 1]


def test_slots_guard():
    with pytest.raises(ValueError):
        schedule_frontier(None, slots_per_wave=0)


def test_single_exchange_on_domain(spark):
    plan = (
        schedule_frontier(_frontier(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "SinglePartition" not in plan  # never a global sort
    assert "EvalPython" not in plan


def test_snapshot_delta_and_recrawl_workset(spark):
    """Hand-built two-snapshot matrix: one of each status; the recrawl
    workset is exactly the added+changed rows of the NEW snapshot (the
    unchanged majority never reaches extraction)."""
    from machine_readability_checker_spark.operators.frontier import (
        recrawl_workset,
        snapshot_delta,
    )

    old = spark.createDataFrame(
        [("u/keep", "same text"), ("u/gone", "bye"), ("u/edit", "old body")],
        ["url", "text"],
    )
    new = spark.createDataFrame(
        [("u/keep", "same text"), ("u/edit", "new body"), ("u/new", "hi")],
        ["url", "text"],
    )
    verdict = {r["url"]: r["status"] for r in snapshot_delta(old, new).collect()}
    assert verdict == {
        "u/keep": "unchanged",
        "u/gone": "removed",
        "u/edit": "changed",
        "u/new": "added",
    }
    work = sorted(r["url"] for r in recrawl_workset(old, new).collect())
    assert work == ["u/edit", "u/new"]
