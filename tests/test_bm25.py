"""BM25 retrieval tests: hand-computed scores, batch==single equality,
materialized index partition pruning, and the driver-side Murmur3
bucket twin vs Spark's own hash()."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from machine_readability_checker_spark.operators.bm25 import (
    DEFAULT_B,
    DEFAULT_K1,
    bm25_build,
    bm25_stats,
    bm25_topk,
    bm25_topk_batch,
    hash_bucket,
    read_bm25_index,
    tokenize_query,
    write_bm25_index,
)

DOCS = [
    ("d1", "the quick brown fox jumps over the lazy dog"),
    ("d2", "the quick red fox"),
    ("d3", "lazy afternoons with a sleepy dog and a lazy cat"),
    ("d4", "quantum flux capacitors"),
    ("d5", "dog dog dog dog"),
]


@pytest.fixture(scope="module")
def postings(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, text string")
    p = bm25_build(docs).cache()
    p.count()
    return p


def _expected_scores(query):
    """Independent plain-Python BM25 over DOCS."""
    toks = {d: t.lower().split() for d, t in DOCS}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(DOCS)
    avgdl = sum(dl.values()) / n
    scores = {}
    for d, t in toks.items():
        s = 0.0
        hit = 0
        for term in set(tokenize_query(query)):
            tf = t.count(term)
            if tf == 0:
                continue
            hit += 1
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (DEFAULT_K1 + 1) / (
                tf + DEFAULT_K1 * (1 - DEFAULT_B + DEFAULT_B * dl[d] / avgdl)
            )
        if hit:
            scores[d] = (s, hit)
    return scores


def test_build_and_stats(postings):
    rows = {(r["term"], r["doc_id"]): (r["tf"], r["dl"])
            for r in postings.collect()}
    assert rows[("dog", "d5")] == (4, 4)
    assert rows[("the", "d1")] == (2, 9)
    st = bm25_stats(postings).collect()[0]
    assert st["n_docs"] == 5
    assert abs(st["avgdl"] - (9 + 4 + 10 + 3 + 4) / 5) < 1e-12


@pytest.mark.parametrize("query", ["lazy dog", "quick fox", "quantum",
                                   "the dog", "DOG  lazy"])
def test_topk_matches_hand_computed(postings, query):
    got = bm25_topk(postings, query, k=10).collect()
    exp = _expected_scores(query)
    assert len(got) == len(exp)
    for r in got:
        s, hit = exp[r["doc_id"]]
        assert abs(r["score"] - s) < 1e-9, (query, r["doc_id"])
        assert r["n_terms_hit"] == hit
    # descending by score
    scores = [r["score"] for r in got]
    assert scores == sorted(scores, reverse=True)


def test_batch_equals_single(spark, postings):
    queries = spark.createDataFrame(
        [("q1", "lazy dog"), ("q2", "quick fox"), ("q3", "quantum")],
        "query_id string, query string",
    )
    batch = bm25_topk_batch(postings, queries, k=3).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, qtext in [("q1", "lazy dog"), ("q2", "quick fox"),
                       ("q3", "quantum")]:
        single = bm25_topk(postings, qtext, k=3).collect()
        got = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in single]
        for g, s in zip(got, single):
            assert abs(g["score"] - s["score"]) < 1e-9


def test_hash_bucket_matches_spark(spark):
    terms = ["dog", "lazy", "quantum", "日本語", "", "a", "ab", "abc",
             "abcd", "abcde", "<s>", "x" * 100]
    df = spark.createDataFrame([(t,) for t in terms], "term string")
    got = {
        r["term"]: r["b"]
        for r in df.select(
            "term", F.pmod(F.hash("term"), F.lit(64)).alias("b")
        ).collect()
    }
    for t in terms:
        assert hash_bucket(t, 64) == got[t], repr(t)


def test_materialized_index_prunes_partitions(spark, postings, tmp_path):
    path = str(tmp_path / "bm25_idx")
    write_bm25_index(postings, path, n_buckets=16)
    idx = read_bm25_index(spark, path)
    out = bm25_topk(idx, "lazy dog", k=5, n_buckets=16)
    exp = _expected_scores("lazy dog")
    got = {r["doc_id"]: r["score"] for r in out.collect()}
    assert got.keys() == exp.keys()
    for d, s in got.items():
        assert abs(s - exp[d][0]) < 1e-9
    # the pruned scan must carry PartitionFilters on term_bucket —
    # note: bm25_stats intentionally scans ALL partitions (corpus
    # scalars), so assert on the hits-side scan via the filtered frame
    plan = (
        idx.filter(F.col("term_bucket").isin(
            sorted({hash_bucket(t, 16) for t in ["lazy", "dog"]})
        ))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan


def test_empty_query_raises(postings):
    with pytest.raises(ValueError):
        bm25_topk(postings, "   ")


def test_materialized_stats_match_and_skip_corpus_scan(
    spark, postings, tmp_path
):
    from machine_readability_checker_spark.operators.bm25 import (
        read_bm25_stats,
    )

    path = str(tmp_path / "bm25_idx2")
    write_bm25_index(postings, path, n_buckets=16)
    idx = read_bm25_index(spark, path)
    stats = read_bm25_stats(spark, path)
    # the underscore dir is invisible to the postings reader
    assert "term_bucket" in idx.columns and "avgdl" not in idx.columns
    live = bm25_stats(postings).collect()[0]
    mat = stats.collect()[0]
    assert mat["n_docs"] == live["n_docs"]
    assert abs(mat["avgdl"] - live["avgdl"]) < 1e-12

    # scoring with materialized stats == scoring with live stats
    a = bm25_topk(idx, "lazy dog", k=5, n_buckets=16).collect()
    b = bm25_topk(idx, "lazy dog", k=5, n_buckets=16, stats=stats).collect()
    assert [(r.doc_id, round(r.score, 10)) for r in a] == [
        (r.doc_id, round(r.score, 10)) for r in b
    ]
    # batch path accepts both materialized artifacts; the df table
    # must produce the same scores as the live aggregate
    from machine_readability_checker_spark.operators.bm25 import (
        read_bm25_df,
    )

    dft = read_bm25_df(spark, path)
    live_df = {
        r.term: r.df
        for r in postings.groupBy("term")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    }
    assert {r.term: r.df for r in dft.collect()} == live_df
    q = spark.createDataFrame(
        [("q1", "lazy dog")], "query_id string, query string"
    )
    c = bm25_topk_batch(idx, q, k=5, stats=stats, df_table=dft).collect()
    assert [(r.doc_id, round(r.score, 10)) for r in c] == [
        (r.doc_id, round(r.score, 10)) for r in a
    ]


# ----------------------------------------------------------- RRF fusion


def test_rrf_fuse_hand_computed(spark):
    from machine_readability_checker_spark.operators.fusion import rrf_fuse

    lex = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
    )
    dense = spark.createDataFrame(
        [(11, 1), (13, 2), (10, 3)], "doc_id long, rank long"
    )
    out = {
        r.doc_id: (r.rrf_score, r.n_systems, r.rank)
        for r in rrf_fuse([lex, dense], k=60).collect()
    }
    # doc 11: 1/62 + 1/61; doc 10: 1/61 + 1/63; doc 13: 1/62; doc 12: 1/63
    assert out[11][0] == pytest.approx(1 / 62 + 1 / 61)
    assert out[10][0] == pytest.approx(1 / 61 + 1 / 63)
    assert out[13][0] == pytest.approx(1 / 62)
    assert out[12][0] == pytest.approx(1 / 63)
    assert out[11][1:] == (2, 1)
    assert out[10][1:] == (2, 2)
    # single-system docs rank below every two-system doc here
    assert out[13][2] == 3 and out[12][2] == 4


def test_rrf_fuse_per_query_and_topk(spark):
    from machine_readability_checker_spark.operators.fusion import rrf_fuse

    a = spark.createDataFrame(
        [("q0", 1, 1), ("q0", 2, 2), ("q1", 3, 1)],
        "query_id string, doc_id long, rank long",
    )
    b = spark.createDataFrame(
        [("q0", 2, 1), ("q1", 4, 1), ("q1", 3, 2)],
        "query_id string, doc_id long, rank long",
    )
    out = rrf_fuse([a, b], k=60, query_col="query_id", top_k=1).collect()
    got = {(r.query_id, r.doc_id): r.rank for r in out}
    # q0: doc 2 fuses rank2+rank1 and beats doc 1; q1: doc 3 (1+2) beats 4
    assert got == {("q0", 2): 1, ("q1", 3): 1}


def test_ranked_from_ordered_tiebreak(spark):
    from machine_readability_checker_spark.operators.fusion import (
        ranked_from_ordered,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(5, 1.0), (3, 1.0), (7, 2.0)], "doc_id long, score double"
    )
    got = {
        r.doc_id: r.rank
        for r in ranked_from_ordered(
            df, [F.desc("score"), "doc_id"]
        ).collect()
    }
    assert got == {7: 1, 3: 2, 5: 3}
