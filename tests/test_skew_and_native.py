"""Skew handling and native/kernel predicate consistency.

1. The salted size-bucketed repartition must spread whale documents so no
   partition carries a grossly disproportionate byte share (FIXTURES.md
   family 18; SURVEY.md §4.2).
2. The JVM Column predicates in ``functions/native.py`` must agree with
   their Python kernel twins in ``core/cells.py`` on adversarial strings —
   one semantics, two engines (SURVEY.md §2.3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from machine_readability_checker_spark.core import cells as C
from machine_readability_checker_spark.functions import native as N
from machine_readability_checker_spark.model import RAW_SCHEMA
from machine_readability_checker_spark.operators.repartition import (
    salted_repartition,
)
from machine_readability_checker_spark.sources.fixtures import gen_corpus


def test_whales_spread_across_partitions(spark):
    # every ~10th doc a whale → 30 whales over 300 docs
    corpus = gen_corpus(300, whale_every=10)
    raw = spark.createDataFrame(corpus, schema=RAW_SCHEMA)
    df = salted_repartition(raw, 16)
    per_part = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.sum("n_bytes").alias("part_bytes"), F.count("*").alias("docs"))
        .collect()
    )
    sizes = [r["part_bytes"] for r in per_part]
    total = sum(sizes)
    # with 30 whales ≈ 97% of total bytes, a single partition must not
    # hoard them: cap any partition at 3× the fair byte share
    assert len(per_part) > 8
    assert max(sizes) < 3 * (total / len(sizes)), sizes


ADVERSARIAL = [
    "", " ", "12.5", "-3", "1,000", "¥100", "1-2.3-", "0.0.1", ".", "-",
    "abc", "①テスト", "㈱会社", "※note", "a,b", "x;y", "p/q", "line\nbreak",
    "全角　空白", "不明", " 該当なし ", "N/A", "ＮＵＬＬ", "null", "none?",
    "その他: 自由", "備考: メモ", "そのほか-", "コメント：はい", "Unnamed: 3",
    "A", "B1", "123", "__", "ID", "長い列名です", "ー", "―", "?",
    # full-width digits: Python float() parses them, so the reference's
    # clean-numeric admits them — the native twin must agree (translate
    # + (?U) in functions/native.py)
    "１２３", "１.５", "１２３あ", "１２－３",
    # Unicode whitespace padding: Python strip() removes U+3000/NBSP/tabs,
    # Spark trim() removes only ASCII spaces — ustrip() closes the gap
    "　不明　", "\xa0該当なし\xa0", "\t不明\n", "　１２３　", "　A　",
    # full-width space between a free-text marker and its colon — needs
    # (?U) in FREE_TEXT_RLIKE so Java \s matches U+3000 like Python's
    "その他　: 自由", "備考　：メモ", "その他　（詳細）",
]


def test_native_predicates_match_kernel(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"s": ADVERSARIAL}), schema="s string"
    )
    got = df.select(
        "s",
        N.has_platform_chars(F.col("s")).alias("plat"),
        N.is_clean_numeric(F.col("s")).alias("clean"),
        N.is_missing_expression(F.col("s")).alias("miss"),
        N.has_multiple_values(F.col("s")).alias("multi"),
        N.has_fullwidth_space(F.col("s")).alias("fw"),
        N.is_free_text_marker(F.col("s")).alias("free"),
        N.is_unclear_header(F.col("s")).alias("unclear"),
    ).collect()
    for r in got:
        s = r["s"]
        assert r["plat"] == C.detect_platform_characters(s), ("plat", s)
        assert r["clean"] == C.is_clean_numeric(s), ("clean", s)
        assert r["miss"] == (s.strip().lower() in C.MISSING_VALUE_SET), ("miss", s)
        assert r["multi"] == bool(C._MULTI_VALUE_RE.search(s)), ("multi", s)
        assert r["fw"] == (C.FULL_WIDTH_SPACE in s), ("fw", s)
        assert r["free"] == bool(C.FREE_TEXT_PATTERN.search(s)), ("free", s)
        expected_unclear = C.is_unclear_header(s) or ("Unnamed" in s)
        assert r["unclear"] == expected_unclear, ("unclear", s)


def test_native_predicates_match_kernel_fuzz(spark):
    """Randomized parity fuzz over the reference's character domain
    (ASCII, Japanese, full-width digits/space, Unicode whitespace,
    platform-dependent chars, markers).  One Spark round-trip for the
    whole corpus — this is the net that catches Java-vs-Python regex
    semantic drift (ASCII \\s/\\d, trim vs strip) before it ships."""
    import random

    rng = random.Random(20260816)
    alphabet = (
        "abcXYZ019 \t\n\xa0　０１２３４５６７８９.,-;/:：()（）"
        "不明該当なし備考その他コメント①㈱※ーテスト長列名=\n"
    )
    corpus = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(400)
    ]
    corpus += [w + m + t for w in ("", "　", " ") for m in ("その他", "備考", "n/a")
               for t in ("", "：メモ", ": x", "　（詳細）")]

    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = df.select(
        "s",
        N.has_platform_chars(F.col("s")).alias("plat"),
        N.is_clean_numeric(F.col("s")).alias("clean"),
        N.is_missing_expression(F.col("s")).alias("miss"),
        N.has_multiple_values(F.col("s")).alias("multi"),
        N.has_fullwidth_space(F.col("s")).alias("fw"),
        N.is_free_text_marker(F.col("s")).alias("free"),
        N.is_unclear_header(F.col("s")).alias("unclear"),
    ).collect()
    for r in got:
        s = r["s"]
        assert r["plat"] == C.detect_platform_characters(s), ("plat", s)
        assert r["clean"] == C.is_clean_numeric(s), ("clean", s)
        assert r["miss"] == (s.strip().lower() in C.MISSING_VALUE_SET), ("miss", s)
        assert r["multi"] == bool(C._MULTI_VALUE_RE.search(s)), ("multi", s)
        assert r["fw"] == (C.FULL_WIDTH_SPACE in s), ("fw", s)
        assert r["free"] == bool(C.FREE_TEXT_PATTERN.search(s)), ("free", s)
        expected_unclear = C.is_unclear_header(s) or ("Unnamed" in s)
        assert r["unclear"] == expected_unclear, ("unclear", s)


def test_aqe_splits_skewed_join(spark):
    """Hot-key joins must not serialize through one task: with AQE skew
    handling on (session default), a join whose left side is dominated
    by a single key gets its skewed partition SPLIT at runtime — the
    final adaptive plan marks the sort-merge join ``skew=true``.  This
    is the executed plan, not a static property: the test drives the
    join and inspects the post-execution adaptive plan."""
    from pyspark.sql import functions as F

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
        # shrink the skew thresholds so the fixture-sized hot key (~8 MB
        # in one partition) is "skewed" the way a hot domain is at 100 TB
        conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "262144",
        )
        conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "131072")
        conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

        fact = spark.range(0, 80_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))  # 90% on key 0
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.concat(F.lit("x" * 120), F.col("id").cast("string")).alias(
                "payload"
            ),
        )
        dim = spark.range(0, 97).select(
            F.col("id").alias("k"),
            F.concat(F.lit("y" * 120), F.col("id").cast("string")).alias(
                "attr"
            ),
        )
        # the aggregate must CONSUME the payload columns — a count(*)
        # lets column pruning strip them before the join, deflating the
        # hot partition below the skew threshold
        joined = fact.join(dim, "k").agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload") + F.length("attr")).alias("bytes"),
        )
        [row] = joined.collect()
        assert row["n"] == 80_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan[:1500]}"
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)
