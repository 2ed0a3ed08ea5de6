"""Z-order (Morton) layout for multi-column data skipping.

Parquet scans prune files by per-file min/max statistics; a corpus
sorted by ONE column gives tight bounds on that column only, so point
or range queries on a second column (fetch by domain AND date, by
cluster AND score band …) read every file.  Interleaving the bits of
two quantized keys — the Morton / Z-order curve (Morton 1966; the
OPTIMIZE ZORDER layout of the lakehouse engines) — makes file ranges
tight in BOTH dimensions at once: sorting by the interleaved key keeps
rows that are close in (a, b) space close on disk.

Everything is integer bit arithmetic on JVM columns — deterministic,
partition-invariant, and cross-engine expressible (the driver lane's
DuckDB oracle recomputes the interleave with the same shifts), and the
layout writer is just range-repartition + sortWithinPartitions on the
key, so the write path inherits Spark's existing machinery.
"""

from __future__ import annotations

from typing import Tuple

from pyspark.sql import Column, DataFrame, functions as F

#: default per-dimension resolution; 16+16 bits fit a BIGINT key with
#: room to spare and bound the curve's cell count at ~4 billion
DEFAULT_BITS = 16


def quantize(
    col: Column, lo: float, hi: float, bits: int = DEFAULT_BITS
) -> Column:
    """Value → integer cell in [0, 2**bits): linear quantization over
    the caller-supplied [lo, hi] domain, clamped (out-of-domain values
    land in the edge cells rather than corrupting the key)."""
    n = (1 << bits) - 1
    frac = (col.cast("double") - F.lit(float(lo))) / F.lit(
        float(hi) - float(lo)
    )
    cell = F.floor(frac * F.lit(float(n + 1))).cast("long")
    return F.greatest(F.lit(0).cast("long"), F.least(F.lit(n).cast("long"), cell))


def morton_key(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Bit-interleave two quantized non-negative ints: bit i of ``a``
    lands at position 2i, bit i of ``b`` at 2i+1.  Pure JVM shifts —
    one codegen expression, no shuffle."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    aa = a.cast("long")
    bb = b.cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(aa, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        z = z.bitwiseOR(
            F.shiftleft(
                F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def morton_key_n(cols, bits: int = DEFAULT_BITS) -> Column:
    """K-dimension generalization: bit i of column j lands at position
    i·k + j.  k·bits must fit a BIGINT (≤ 63); 2 columns reduces
    exactly to ``morton_key`` (pinned in tests)."""
    k = len(cols)
    if k < 2:
        raise ValueError("need at least 2 columns")
    if not 1 <= bits * k <= 63:
        raise ValueError(
            f"bits*columns must be in [1, 63], got {bits * k}"
        )
    z = F.lit(0).cast("long")
    longs = [c.cast("long") for c in cols]
    for i in range(bits):
        for j, c in enumerate(longs):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftright(c, i).bitwiseAND(F.lit(1)), i * k + j
                )
            )
    return z


def zorder_layout(
    df: DataFrame,
    col_a: str,
    col_b: str,
    range_a: Tuple[float, float],
    range_b: Tuple[float, float],
    n_files: int = 32,
    bits: int = DEFAULT_BITS,
) -> DataFrame:
    """The write layout: rows range-partitioned and sorted by the
    Morton key of (col_a, col_b), ready for ``.write.parquet`` — each
    output file then covers a compact curve segment, so its min/max
    stats are tight in both columns and either-dimension predicates
    prune files.  One range exchange (sampled boundaries), per-file
    local sort — the same cost as sorting by a single column."""
    z = morton_key(
        quantize(F.col(col_a), *range_a, bits=bits),
        quantize(F.col(col_b), *range_b, bits=bits),
        bits=bits,
    )
    return (
        df.withColumn("_zkey", z)
        .repartitionByRange(n_files, F.col("_zkey"))
        .sortWithinPartitions("_zkey")
    )


def file_bounds(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Per-partition min/max of both columns — the parquet footer
    statistics a scan planner would consult, surfaced as a DataFrame
    so layouts can be compared quantitatively (see the pruning test):
    (file_id, a_min, a_max, b_min, b_max)."""
    return (
        df.withColumn("_fid", F.spark_partition_id())
        .groupBy("_fid")
        .agg(
            F.min(col_a).alias("a_min"),
            F.max(col_a).alias("a_max"),
            F.min(col_b).alias("b_min"),
            F.max(col_b).alias("b_max"),
        )
        .withColumnRenamed("_fid", "file_id")
    )
