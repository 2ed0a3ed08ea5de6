"""Winnowing fingerprints (Schleimer 2003): brute-force equality, the
w+k-1 guarantee, density, match pairs."""

from __future__ import annotations

import hashlib

from machine_readability_checker_spark.operators.dedup import (
    winnow_fingerprints,
    winnow_match_pairs,
)

K, W = 3, 4


def _bf(tokens, k=K, w=W):
    """Independent brute-force winnowing with the portable hashes."""
    th = [
        int(hashlib.md5(t.encode()).hexdigest()[:7], 16) for t in tokens
    ]
    if len(th) < k:
        return set()
    grams = []
    for i in range(len(th) - k + 1):
        h = th[i]
        for j in range(1, k):
            h = h * 33 + th[i + j]
        grams.append(h)
    sel = set()
    for e in range(w - 1, len(grams)):
        lo = e - w + 1
        m = min(grams[lo : e + 1])
        pos = max(j for j in range(lo, e + 1) if grams[j] == m)
        sel.add((pos, m))
    return sel


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def test_matches_brute_force_exactly(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "aa bb aa bb aa bb aa bb aa bb",  # repeated grams → ties
        "one two three four five",
        "tiny doc",  # below k+w-1 → no fingerprints
    ]
    got = {}
    rows = winnow_fingerprints(
        _docs(spark, texts), k=K, w=W, portable=True
    ).collect()
    for r in rows:
        got.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _bf(t.split()), f"doc {i}"


def test_shared_run_guarantee(spark):
    """Any shared token run of length >= w+k-1 (6 here) must share a
    fingerprint VALUE between the two documents."""
    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+k-1
    texts = [
        f"completely unrelated prefix words here {shared} and a tail",
        f"{shared} totally different continuation of the second doc",
    ]
    rows = winnow_fingerprints(
        _docs(spark, texts), k=K, w=W, portable=True
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[0] & by_doc[1], "guarantee violated"


def test_density_bound(spark):
    toks = [f"tok{i}" for i in range(400)]
    rows = winnow_fingerprints(
        _docs(spark, [" ".join(toks)]), k=K, w=W, portable=True
    ).collect()
    n_grams = len(toks) - K + 1
    # expected density 2/(w+1) = 0.4; all-distinct hashes keep it near
    # that, never above 1 per window start nor below 1 per window
    assert n_grams / W <= len(rows) <= n_grams
    assert len(rows) < 0.6 * n_grams


def test_match_pairs_and_hot_cap(spark):
    shared = "lorem ipsum dolor sit amet consectetur adipiscing elit"
    texts = [
        f"{shared} first document tail words",
        f"second document head words {shared}",
        "nothing in common with the others at all here",
    ]
    fps = winnow_fingerprints(
        _docs(spark, texts), k=K, w=W, portable=True
    )
    pairs = winnow_match_pairs(fps, min_shared=2).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    # a max_df of 1 kills every fingerprint present in 2+ docs → no pairs
    assert winnow_match_pairs(fps, min_shared=1, max_df=1).count() == 0


def test_partition_invariance(spark):
    texts = [f"doc {i} body " + " ".join(f"w{j}" for j in range(30))
             for i in range(20)]
    a = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(
            _docs(spark, texts).repartition(1), portable=True
        ).collect()
    )
    b = sorted(
        (r.doc_id, r.pos, r.fp)
        for r in winnow_fingerprints(
            _docs(spark, texts).repartition(7), portable=True
        ).collect()
    )
    assert a == b
