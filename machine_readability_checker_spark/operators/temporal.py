"""Temporal operators: as-of joins over event streams.

Spark has no native ASOF JOIN; the scalable formulation here is the
union + running-last trick — tag both sides, union them, and take the
last right-side value at-or-before each left row inside one window:

    one shuffle on (by, ts) total, fully parallel per key group.

The naive alternatives either broadcast a range join (explodes at
corpus scale) or theta-join on ``l.ts >= r.ts`` (O(n·m) per key).
DuckDB HAS a native ASOF JOIN, which is exactly what makes this
operator oracle-checkable: the driver gate proves the union+window
decomposition equals the textbook semantics.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    ts_col: str = "ts",
    by_col: str = "user_id",
    value_cols: List[str] = ("value",),
    prefix: str = "last_",
) -> DataFrame:
    """For every left row: the right row with the greatest ``ts_col``
    ≤ the left row's (same ``by_col``), inclusive — NULL columns when
    no right row precedes it.  Right-side ``value_cols`` are returned
    as ``{prefix}{col}``.

    All right-side values travel in ONE struct carrying a non-null
    ``_present`` marker, and the window takes ``last(ignorenulls)`` of
    the whole struct: the matched row's values are returned atomically
    (never stitched from different right rows), and a genuinely-NULL
    right value stays NULL instead of falling back to a staler non-NULL
    one — the failure mode of per-column running-last.

    Ties between a left and a right row at the identical timestamp
    resolve to the right row (tag ordering), matching ASOF's
    at-or-before contract; multiple right rows sharing (by, ts) are
    not ordered — pre-dedup the right side if that can occur."""
    value_cols = list(value_cols)
    lcols = left.columns
    rv_struct = F.struct(
        F.lit(1).alias("_present"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    l = left.withColumn("_tag", F.lit(1)).withColumn(
        "_rv",
        F.lit(None).cast(
            "struct<_present:int,"
            + ",".join(
                f"{c}:{right.schema[c].dataType.simpleString()}"
                for c in value_cols
            )
            + ">"
        ),
    )
    r = right.select(
        F.col(by_col), F.col(ts_col), F.lit(0).alias("_tag"),
        rv_struct.alias("_rv"),
    )
    for c in lcols:
        if c not in (by_col, ts_col):
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    u = l.select(*lcols, "_tag", "_rv").unionByName(
        r.select(*lcols, "_tag", "_rv")
    )
    w = (
        Window.partitionBy(by_col)
        .orderBy(ts_col, "_tag")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = u.withColumn("_last_rv", F.last("_rv", ignorenulls=True).over(w))
    return out.filter(F.col("_tag") == 1).select(
        *lcols,
        *[
            F.col(f"_last_rv.{c}").alias(f"{prefix}{c}")
            for c in value_cols
        ],
    )


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_width: int = 3600,
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Scalable interval (range) join: every (event, interval) pair
    with ``start ≤ ts ≤ end`` (inclusive both ends).

    Catalyst plans a raw ``l.ts BETWEEN r.start AND r.end`` predicate
    as a BroadcastNestedLoopJoin — O(|events|·|intervals|) compares,
    the non-equi-join cliff every engine that ships a dedicated RANGE
    JOIN optimization (Databricks runtime, DuckDB iejoin) exists to
    avoid.  The published bucketization turns it into an EQUI join:

    1. each interval explodes into the ``floor(ts / w)`` buckets it
       overlaps (sequence + explode, JVM-side);
    2. each event computes its single bucket;
    3. one shuffle each side on ``bucket``, SortMergeJoin, then the
       exact BETWEEN filter;
    4. a pair appears in exactly ONE bucket (the event's), so no
       dedup pass is needed.

    Cost: shuffle ∝ |events| + Σ interval_len/w.  Pick ``bucket_width``
    near the median interval length — w too small inflates the
    interval side, too large degrades each bucket toward the cross
    product.  ``max_buckets_per_interval`` guards the explode against
    pathological open-ended intervals (raise it deliberately, never
    silently): offenders are dropped with nothing matched, the
    documented contract for intervals longer than w × the cap.

    Column conflicts: callers rename; both frames' columns pass
    through (the lane and tests use disjoint names)."""
    w = int(bucket_width)
    ev = events.withColumn(
        "_b", F.floor(F.col(ts_col) / w).cast("long")
    )
    n_b = (
        F.floor(F.col(end_col) / w) - F.floor(F.col(start_col) / w) + 1
    )
    iv = (
        intervals.filter(
            (F.col(end_col) >= F.col(start_col))
            & (n_b <= max_buckets_per_interval)
        )
        .withColumn(
            "_b",
            F.explode(
                F.sequence(
                    F.floor(F.col(start_col) / w).cast("long"),
                    F.floor(F.col(end_col) / w).cast("long"),
                )
            ),
        )
    )
    return (
        ev.join(iv, "_b")
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) <= F.col(end_col))
        )
        .drop("_b")
    )
