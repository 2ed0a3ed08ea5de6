"""Deduplication operator family (training-data pipeline lane).

Tokenize/shingle-hash runs JVM-side (codegen'd higher-order functions);
the per-document signature reductions (64 minhash permutations, 64 simhash
bit votes) run in Arrow-batched numpy pandas UDFs — vectorized C loops
over whole record batches, zero shuffle, no per-row Python.  Candidate
generation is pure DataFrame/Catalyst hash joins so AQE handles skewed
buckets.

- exact_dedup          : hash-groupBy, deterministic keeper (min doc_id)
- minhash_signatures   : k-token shingles → xxhash64 → (a·h+b) mod p mins
- minhash_lsh_pairs    : banded LSH bucket join → candidate pairs with
                         signature-estimated Jaccard
- simhash              : 64-bit token-hash bit voting
- simhash_pairs        : banded Hamming candidate join
- ngram_jaccard_pairs  : exact set-similarity join on shingles with a
                         document-frequency cap (prefix-filter analog)
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

MERSENNE_P = 2147483647  # 2^31 - 1


# --------------------------------------------------------------- exact


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep exactly one row per identical text (deterministic keeper: the
    minimum id).  One shuffle on the content hash; the hash is computed
    first so wide text never becomes the shuffle key."""
    h = F.md5(F.encode(F.col(text_col), "UTF-8")).alias("_h")
    w = Window.partitionBy("_h").orderBy(id_col)
    return (
        df.withColumn("_h", h)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def duplicate_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(content_hash, n_dups, doc_ids) for every text occurring > once."""
    return (
        df.groupBy(F.md5(F.encode(F.col(text_col), "UTF-8")).alias("content_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


# -------------------------------------------------------------- minhash


def _shingles(text: Column, k: int) -> Column:
    """k-token shingle hashes.

    Each shingle hash is a polynomial combination of the per-token
    xxhash64 values (wrapping 64-bit arithmetic) rather than a hash of the
    re-concatenated string: hashing tokens once and rolling integers is
    far cheaper than building k-token strings per position inside an
    interpreted higher-order function, and is equally collision-resistant
    for dedup purposes."""
    return _shingles_from_hashes(_token_hashes(text), k)


def _token_hashes(text: Column, portable: bool = False) -> Column:
    """Bounded per-token hashes (≤31 bits so the base-33 polynomial shingle
    combination below stays inside a signed 64-bit long for k ≤ 7 — ANSI
    mode throws on long overflow).

    ``portable=False`` (production): ``pmod(xxhash64(token), 2^31-1)`` —
    fastest JVM-side hash.  ``portable=True`` (oracle lane): the integer
    value of the first 7 hex chars of md5 (28 bits) — md5 is the one hash
    both Spark and DuckDB compute identically, so a DuckDB oracle can
    reproduce the signatures bit-for-bit."""
    from .textstats import tokens

    if portable:
        return F.transform(
            tokens(text),
            lambda t: F.conv(
                F.substring(F.md5(F.encode(t, "UTF-8")), 1, 7), 16, 10
            ).cast("long"),
        )
    return F.transform(
        tokens(text), lambda t: F.pmod(F.xxhash64(t), F.lit(2147483647))
    )


def _shingles_from_hashes(th: Column, k: int) -> Column:
    """k-token shingle hashes from a *materialized* token-hash array
    column.  IMPORTANT: pass a plain column reference, not a nested
    expression — interpreted higher-order functions re-evaluate
    subexpressions per element access, turning O(n·k) into O(n²·k)."""
    if not 1 <= k <= 7:
        # 31-bit token hashes × base-33 polynomial stay inside a signed
        # long only for k ≤ 7 (ANSI mode throws on overflow), and the
        # short-document fallback slices the first 7 hashes
        raise ValueError(f"shingle_k must be in [1, 7], got {k}")
    n = F.size(th)

    def _combo(i: Column) -> Column:
        h = F.element_at(th, i + 1)
        for j in range(1, k):
            h = h * F.lit(33) + F.element_at(th, i + 1 + j)
        return h

    return F.when(
        n >= k,
        F.transform(F.sequence(F.lit(0), n - k), _combo),
    ).otherwise(
        F.array(
            F.aggregate(
                F.slice(th, 1, 7),
                F.lit(0).cast("long"),
                lambda acc, h: acc * F.lit(33) + h,
            )
        )
    )


def _perm_params(num_perm: int, seed: int) -> Tuple[List[int], List[int]]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, MERSENNE_P - 1, size=num_perm).tolist()
    b = rng.randint(0, MERSENNE_P - 1, size=num_perm).tolist()
    return a, b


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    shingle_k: int = 5,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """(id, signature array<bigint>).

    Shingle hashes are produced JVM-side, then a numpy pandas UDF computes
    the ``num_perm`` permutation mins per document over the whole Arrow
    batch: ``(a·h + b) mod p`` as one vectorized outer product per doc.
    This keeps the reduction partition-local (zero shuffle) and beats both
    the 64-interpreted-HOF and the explode→64-codegen'd-min formulations
    measured head-to-head (~35× on the sf0.1 corpus); output is
    bit-identical to both.  ``array_distinct`` first: MinHash is a set
    statistic, duplicate shingles never change a min."""
    a, b = _perm_params(num_perm, seed)
    av = np.array(a, dtype=np.uint64)
    bv = np.array(b, dtype=np.uint64)
    p = np.uint64(MERSENNE_P)

    @F.pandas_udf(ArrayType(LongType()))
    def _sig(sh: pd.Series) -> pd.Series:
        out = []
        for arr in sh:
            vals = [x for x in arr if x is not None]  # defensive
            h = np.asarray(vals, dtype=np.int64).astype(np.uint64) % p
            mins = ((av[:, None] * h[None, :] + bv[:, None]) % p).min(axis=1)
            out.append(mins.astype(np.int64))
        return pd.Series(out)

    # NULL/empty text yields no tokens → no meaningful signature; drop
    # those docs here (a doc with no tokens cannot be a near-duplicate of
    # anything).  Without the filter a NULL text reaches the UDF as
    # [None] and kills the task.
    return (
        df.select(id_col, _token_hashes(F.col(text_col), portable).alias("_th"))
        .filter(F.size("_th") > 0)
        .select(
            id_col,
            F.array_distinct(_shingles_from_hashes(F.col("_th"), shingle_k)).alias(
                "_sh"
            ),
        )
        .select(id_col, _sig(F.col("_sh")).alias("signature"))
    )


def _band_key_expr(bi: int, rows_per_band: int, portable: bool) -> Column:
    """Band key for band ``bi`` over a ``signature`` column.  Production:
    xxhash64 of the dash-joined band tuple (slim 8-byte key); portable:
    the exact value string, so a DuckDB oracle can build the identical
    key (and the key is collision-free by construction)."""
    vals = [
        F.col("signature")[bi * rows_per_band + r] for r in range(rows_per_band)
    ]
    joined = F.concat_ws("-", *vals)
    return joined if portable else F.xxhash64(joined)


def _bands_struct_array(rows_per_band: int, bands: int, portable: bool) -> Column:
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(bi).alias("band"),
                    _band_key_expr(bi, rows_per_band, portable).alias(
                        "band_hash"
                    ),
                )
                for bi in range(bands)
            ]
        )
    ).alias("bb")


def _sig_jaccard_est(sig_a: Column, sig_b: Column, num_perm: int) -> Column:
    """MinHash Jaccard estimate = fraction of equal signature positions."""
    return (
        F.aggregate(
            F.zip_with(sig_a, sig_b, lambda x, y: F.when(x == y, 1).otherwise(0)),
            F.lit(0),
            lambda acc, v: acc + v,
        )
        / F.lit(num_perm)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate candidate pairs via banded MinHash LSH.

    signature → ``bands`` band hashes → explode → bucket self-join (the
    only shuffle, on the band hash) → per-pair Jaccard estimate = fraction
    of equal signature positions → filter ≥ threshold.

    ``portable=True`` switches to the md5-derived token hash AND keys the
    bucket join on the raw band-value string instead of its xxhash64 —
    both reproducible in a DuckDB oracle (and collision-free by
    construction, where the 64-bit band hash is merely collision-free in
    practice)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    # signatures feed three subtrees (bands + both verify joins) —
    # materialize once instead of recomputing the aggregation per subtree
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, shingle_k, seed, portable
    ).localCheckpoint(eager=False)

    # slim band table: (id, band, band_hash) only — shipping the full
    # 64-long signature 16× through the bucket shuffle would dominate IO
    band_entries = sigs.select(
        F.col(id_col),
        _bands_struct_array(rows_per_band, bands, portable),
    ).select(id_col, "bb.band", "bb.band_hash")

    left = band_entries.alias("l")
    right = band_entries.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    pairs = candidates.join(sa, "id_a").join(sb, "id_b")
    est = _sig_jaccard_est(
        F.col("sig_a"), F.col("sig_b"), num_perm
    ).alias("jaccard_est")
    return (
        pairs.select("id_a", "id_b", est)
        .filter(F.col("jaccard_est") >= threshold)
    )


def write_minhash_index(
    df: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    n_buckets: int = 64,
    portable: bool = False,
) -> None:
    """Materialize the banded-MinHash near-duplicate index: band entries
    written partitioned by ``band=K/bucket=M`` (bucket = band-hash mod
    n_buckets), each row carrying the document's full signature.

    ``portable=True`` uses the md5-derived token hash and value-string
    band keys (see ``minhash_lsh_pairs``) so a DuckDB oracle can
    reproduce index queries bit-for-bit; the bucket assignment stays
    xxhash64-based either way — it only places rows in partitions and a
    matching band key always lands in the same bucket on both sides of
    a query, so it never affects result semantics.

    This is the incremental-dedup shape at 100 TB: "is this NEW document
    a near-dup of anything in the corpus" becomes a partition-pruned
    read of the query's own ``bands × 1`` partitions instead of a corpus
    scan or a full LSH self-join (the text-side analog of
    ``similarity.write_bucketed_index``).  Storage trades 16× signature
    duplication for single-partition queries; at 64 perms that is
    ~8 KB/doc of index — index-build is a one-off batch job, and
    re-ingest batches query the index before appending to it."""
    entries = minhash_index_entries(
        df, text_col, id_col, num_perm, bands, shingle_k, seed, n_buckets,
        portable,
    )
    # cluster rows by their target directory before the partitioned
    # write: without this every task writes a file into every populated
    # band/bucket dir (tasks × dirs small files); with it each dir gets
    # one writer (split further only by maxRecordsPerFile at real scale)
    entries.repartition("band", "bucket").write.mode("overwrite").partitionBy(
        "band", "bucket"
    ).parquet(path)


def minhash_index_entries(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    seed: int = 42,
    n_buckets: int = 64,
    portable: bool = False,
) -> DataFrame:
    """The (id, signature, band, band_hash, bucket) rows of a
    ``write_minhash_index`` layout — exposed so incremental ingest can
    APPEND a new batch's entries to an existing index with the same
    parameters instead of rebuilding it (see ``jobs/ingest.py``)."""
    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(
        df, text_col, id_col, num_perm, shingle_k, seed, portable
    )
    return (
        sigs.select(
            F.col(id_col),
            F.col("signature"),
            _bands_struct_array(rows_per_band, bands, portable),
        )
        .select(id_col, "signature", "bb.band", "bb.band_hash")
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("band_hash").cast("string")), F.lit(n_buckets)),
        )
    )


def query_minhash_index(
    spark,
    path: str,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    seed: int = 42,
    n_buckets: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicates of the (small) query batch against a materialized
    ``write_minhash_index``: compute the queries' band keys, read ONLY
    the matching ``band=K/bucket=M`` partitions (the scan must list
    ``PartitionFilters`` — pruned, not a corpus scan), join on the exact
    band hash, verify with the signature Jaccard estimate.

    Returns (query_id, doc_id, jaccard_est).  The driver round-trip is
    bounded: ≤ n_queries × bands (band, bucket) literals, folded into at
    most ``bands`` IN-list disjuncts (a naive one-OR-per-pair predicate
    overflows the analyzer's stack past a few hundred pairs, and a large
    ingest batch legitimately produces thousands); when the batch's
    bands cover most partitions anyway, the filter is skipped — the
    bucket join prunes, and listing 90% of the partitions costs planner
    time for nothing."""
    from functools import reduce as _reduce

    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    qsigs = minhash_signatures(
        queries, text_col, id_col, num_perm, shingle_k, seed, portable
    )
    qband = (
        qsigs.select(
            F.col(id_col).alias("query_id"),
            F.col("signature").alias("qsig"),
            _bands_struct_array(rows_per_band, bands, portable),
        )
        .select("query_id", "qsig", "bb.band", "bb.band_hash")
        .withColumn(
            "bucket",
            F.pmod(F.xxhash64(F.col("band_hash").cast("string")), F.lit(n_buckets)),
        )
        # two consumers (the targets collect below + the broadcast join)
        # — checkpoint so the signature UDF + band explode run once
        .localCheckpoint(eager=False)
    )
    targets = {
        (r["band"], r["bucket"])
        for r in qband.select("band", "bucket").distinct().collect()
    }
    if not targets:
        # derive the id type from the queries frame — a hardcoded
        # string schema breaks union/join for bigint ids (ADVICE r2)
        from pyspark.sql.types import DoubleType, StructField, StructType

        id_type = queries.schema[id_col].dataType
        return spark.createDataFrame(
            [],
            StructType(
                [
                    StructField("query_id", id_type),
                    StructField("doc_id", id_type),
                    StructField("jaccard_est", DoubleType()),
                ]
            ),
        )
    idx = spark.read.parquet(path)
    if len(targets) < bands * n_buckets // 2:
        by_band: dict = {}
        for bd, bk in sorted(targets):
            by_band.setdefault(bd, []).append(bk)
        prune = _reduce(
            lambda a, b: a | b,
            [
                (F.col("band") == bd) & F.col("bucket").isin(bks)
                for bd, bks in sorted(by_band.items())
            ],
        )
        idx = idx.filter(prune)
    return (
        idx.join(F.broadcast(qband), ["band", "band_hash", "bucket"])
        .select(
            "query_id",
            F.col(id_col).alias("doc_id"),
            _sig_jaccard_est(F.col("qsig"), F.col("signature"), num_perm).alias(
                "jaccard_est"
            ),
        )
        .dropDuplicates(["query_id", "doc_id"])
        .filter(F.col("jaccard_est") >= threshold)
    )


# -------------------------------------------------------------- simhash


def simhash_votes(text: Column, bits: int = 64) -> Column:
    """Per-bit ±1 vote array over token xxhash64 values.  Shift amounts
    must be Python ints in the DataFrame API, so the bit loop is unrolled
    driver-side; the expression tree stays JVM-only."""
    from .textstats import tokens

    hashes = F.transform(tokens(text), lambda t: F.xxhash64(t))
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(0), bits),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                    ).otherwise(F.lit(-1))
                    for b in range(bits)
                ]
            ),
            lambda a, v: a + v,
        ),
    )


def pack_votes(votes: Column, bits: int = 64) -> Column:
    """Vote array → packed signed 64-bit SimHash value."""
    out = F.lit(0).cast("long")
    for b in range(bits):
        # two's-complement literal for the sign bit
        bit_val = (1 << b) if b < bits - 1 else -(1 << (bits - 1))
        out = out.bitwiseOR(
            F.when(F.element_at(votes, b + 1) > 0, F.lit(bit_val).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    return out


def simhash(text: Column, bits: int = 64) -> Column:
    """64-bit SimHash as a single Column expression.

    NOTE: the packing references the vote aggregate per bit; when hashing a
    whole corpus, prefer ``simhash_table`` which materializes the votes in
    their own projection so the aggregate is evaluated once per row."""
    return pack_votes(simhash_votes(text, bits), bits)


def simhash_table(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """(id, sh): token xxhash64 JVM-side, then a numpy pandas UDF does the
    per-document bit voting + packing over the Arrow batch — one C-level
    unpack/sum per doc, zero shuffle (same rationale + measured win as
    ``minhash_signatures``).  Documents with no tokens are dropped, matching
    the previous explode→groupBy formulation (no rows → no group).

    ``portable=True``: 32-bit md5-derived token hashes (first 8 hex chars)
    so a DuckDB oracle reproduces the exact SimHash values; pass
    ``bits=32`` with it (voting over bit positions the hash doesn't fill
    would just produce constant zeros)."""

    @F.pandas_udf(LongType())
    def _sh(hs: pd.Series) -> pd.Series:
        out = np.empty(len(hs), dtype=np.int64)
        shifts = np.arange(bits, dtype=np.uint64)
        for i, arr in enumerate(hs):
            h = np.asarray(arr, dtype=np.int64).astype(np.uint64)
            ones = ((h[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
            votes = 2 * ones.astype(np.int64) - len(h)  # (+1/-1 votes)
            packed = ((votes > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64)
            out[i] = packed.astype(np.int64)
        return pd.Series(out)

    from .textstats import tokens

    if portable:
        hashes = F.transform(
            tokens(F.col(text_col)),
            lambda t: F.conv(
                F.substring(F.md5(F.encode(t, "UTF-8")), 1, 8), 16, 10
            ).cast("long"),
        )
    else:
        hashes = F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t))
    return (
        df.select(id_col, hashes.alias("_hs"))
        .filter(F.size("_hs") > 0)
        .select(id_col, _sh(F.col("_hs")).alias("sh"))
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit longs: bit_count(xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    band_bits: Optional[int] = None,
    bits: int = 64,
    portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the ``bits``-wide hash into
    bits/band_bits chunks (pigeonhole: any pair within max_hamming shares
    ≥1 exact band when bands > max_hamming), bucket-join, verify true
    Hamming.  Because the banding is recall-COMPLETE under that guarantee,
    the result equals the plain all-pairs Hamming filter — which is what
    the DuckDB oracle computes for the portable lane.

    ``band_bits`` defaults to the largest width that still satisfies the
    pigeonhole guarantee (bands = bits//band_bits > max_hamming); passing
    a wider value explicitly is rejected rather than silently losing
    qualifying pairs."""
    if band_bits is None:
        band_bits = max(1, bits // (max_hamming + 1))
    n_bands = bits // band_bits
    if n_bands <= max_hamming:
        raise ValueError(
            f"{n_bands} bands of {band_bits} bits cannot guarantee recall "
            f"at max_hamming={max_hamming}: a pair may differ in every "
            "band (need bands > max_hamming)"
        )
    hashed = simhash_table(df, text_col, id_col, bits, portable)
    mask = (1 << band_bits) - 1
    bandsdf = hashed.select(
        id_col,
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftrightunsigned(F.col("sh"), bi * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_val"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "sh", "bb.band", "bb.band_val")
    l, r = bandsdf.alias("l"), bandsdf.alias("r")
    return (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_val") == F.col("r.band_val"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            hamming64(F.col("l.sh"), F.col("r.sh")).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs_prefix(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_df: Optional[int] = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard join with PPJoin-style prefix filtering
    (Xiao et al., "Efficient Similarity Joins for Near Duplicate
    Detection") — same output as ``ngram_jaccard_pairs``, far fewer
    candidates.

    Two sets with Jaccard ≥ t must share an element within the first
    ⌊(1-t)·|A|⌋+1 elements of any global canonical order, so only that
    prefix is exploded into the self-join (5× fewer candidate rows at
    t=0.8 on the sf0.1 corpus; the gap widens with t and document
    count — this is the feasibility trick at corpus scale).
    Verification joins the (small) candidate set back to the full
    sorted-array column and counts the intersection per pair.

    The array column is localCheckpoint'ed: it feeds three subtrees AND
    the barrier stops predicate pushdown from inlining the shingle HOF
    below the scan (the plan-shape trap documented above).

    ``max_df`` mirrors the plain operator's hot-shingle cap with the same
    semantics: shingles occurring in > max_df documents are removed from
    the sets before intersection counting, while set sizes stay those of
    the UNFILTERED sets (that is what ``ngram_jaccard_pairs`` computes).
    The hot set is provably small (≤ total_rows / max_df entries) and is
    removed by the same broadcast ANTI-join shape the plain operator
    uses (explode → anti-join → re-collect, fully distributed — no
    driver collect), then re-sorted so the prefix slice stays canonical.
    Prefix soundness is preserved: jaccard ≥ t on unfiltered sizes
    implies n_common ≥ t·|A| ≥ t·|A_filtered|, so the per-set prefix
    bound still holds on the filtered arrays."""
    arrs = (
        df.select(F.col(id_col), _token_hashes(F.col(text_col)).alias("_th"))
        .select(
            F.col(id_col),
            F.sort_array(
                F.array_distinct(_shingles_from_hashes(F.col("_th"), shingle_k))
            ).alias("arr"),
        )
        .localCheckpoint(eager=False)
    )
    arrs = arrs.select(id_col, "arr", F.size("arr").alias("orig_size"))
    if max_df is not None:
        ex = arrs.select(
            id_col, "orig_size", F.explode("arr").alias("shingle")
        )
        hot = (
            ex.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        # Documents whose every shingle is hot drop out of `arrs` here;
        # they cannot appear in `cands` (no surviving prefix rows) nor be
        # needed for verification, so the inner joins below are unaffected.
        arrs = (
            ex.join(F.broadcast(hot), "shingle", "left_anti")
            .groupBy(id_col, "orig_size")
            .agg(F.sort_array(F.collect_list("shingle")).alias("arr"))
            .select(id_col, "arr", "orig_size")
            .localCheckpoint(eager=False)
        )
    # prefix length = |A| - ceil(t·|A|) + 1.  The epsilon guards float
    # error in t·|A|: 0.8*5 evaluates to 4.000000000000001, whose plain
    # ceil is 5 — one element short, silently dropping qualifying pairs
    # whenever t·|A| lands on an integer.  Subtracting 1e-9 can only
    # lengthen the prefix (sound: more candidates, never fewer).
    required = F.ceil(F.lit(float(threshold)) * F.size("arr") - F.lit(1e-9))
    pref_len = (F.size("arr") - required + 1).cast("int")
    pref = arrs.select(
        F.col(id_col), F.explode(F.slice("arr", F.lit(1), pref_len)).alias("shingle")
    )
    l, r = pref.alias("l"), pref.alias("r")
    cands = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = arrs.select(
        F.col(id_col).alias("id_a"),
        F.col("arr").alias("arr_a"),
        F.col("orig_size").alias("size_a"),
    )
    b = arrs.select(
        F.col(id_col).alias("id_b"),
        F.col("arr").alias("arr_b"),
        F.col("orig_size").alias("size_b"),
    )
    return (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "n_common",
            F.size(F.array_intersect("arr_a", "arr_b")).cast("long"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# ----------------------------------------------- near-dup clustering


def near_dup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
) -> DataFrame:
    """Connected components over a near-duplicate pair graph
    ``(id_a, id_b)`` → ``(doc_id, cluster_id)`` with ``cluster_id`` = the
    minimum member id.  This is the canonical keep-one-per-cluster step
    after MinHash/SimHash candidate generation.

    Iterative min-label propagation: each round every vertex takes the
    min of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds (near-dup clusters are tiny and dense, so
    2-4 rounds in practice).  Each round localCheckpoints the label
    table — without the barrier the join lineage doubles per iteration
    and the plan blows up.  For adversarial web-scale graphs with long
    chains use ``near_dup_clusters_star`` below (the Kiveris et al.
    large-star/small-star formulation, O(log n) rounds); the API and
    output contract are identical."""
    edges = (
        pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(
            pairs.select(F.col("id_b").alias("u"), F.col("id_a").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    labels = (
        edges.select("u").distinct().select(F.col("u"), F.col("u").alias("label"))
    ).localCheckpoint(eager=False)

    for _ in range(max_iterations):
        # distinct column names end-to-end: labels derives from edges, so
        # attribute-based join conditions would be ambiguous self-joins
        neighbor_min = (
            edges.join(
                labels.select(
                    F.col("u").alias("_lu"), F.col("label").alias("_llabel")
                ),
                F.col("v") == F.col("_lu"),
            )
            .groupBy("u")
            .agg(F.min("_llabel").alias("_nlabel"))
        )
        new_labels = (
            labels.join(neighbor_min, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.select("u", F.col("label").alias("_new"))
            .join(labels, "u")
            .filter(F.col("_new") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    else:
        # silently returning half-propagated labels would under-dedup the
        # corpus (multiple "representatives" per true cluster) — refuse.
        raise RuntimeError(
            f"near_dup_clusters did not converge in {max_iterations} "
            "iterations — the pair graph has a component with diameter "
            "above the cap; raise max_iterations or use the "
            "large-star/small-star formulation for chain-shaped graphs"
        )
    return labels.select(F.col("u").alias("doc_id"), F.col("label").alias("cluster_id"))


def dedup_keep_list(df: DataFrame, clusters: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Rows of ``df`` surviving near-dup dedup: cluster members other than
    the canonical (minimum-id) representative are dropped; documents
    outside the pair graph survive untouched."""
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")


# -------------------------------------------------- exact n-gram jaccard


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_df: Optional[int] = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity join.

    Explode distinct shingle hashes, join on shingle, count the
    intersection per pair, Jaccard = |∩| / (|A|+|B|-|∩|).  ``max_df`` drops
    shingles occurring in more than that many documents before the join —
    the standard frequency-cap/prefix-filter trick that keeps the hot-key
    blowup bounded at corpus scale (a shingle shared by everyone generates
    O(n²) candidates but contributes nothing to *near*-duplicate
    detection)."""
    # PLAN-SHAPE WARNING (measured, not theoretical): the explode MUST be
    # applied to the shingle expression in the same select that consumes
    # the materialized `_th` column.  Exploding a separately-projected
    # `_sh` column looks cleaner but makes InferFiltersFromGenerate +
    # PushDownPredicates push a `size(shingles)>0` filter below BOTH
    # projections, substituting the token-hash `transform` into every
    # `element_at` — an O(n²·k) interpreted re-evaluation per row on each
    # join side (5-7× slower end-to-end at sf0.1).  Likewise, computing
    # set_size after the explode forces Generate to carry the whole array
    # per exploded row.  Hence the old-school shape below: explode-in-one-
    # select, sizes as their own aggregation, verify joins on the (small)
    # candidate-pair table.
    sh = (
        df.select(F.col(id_col), _token_hashes(F.col(text_col)).alias("_th"))
        .select(
            F.col(id_col),
            F.explode(
                F.array_distinct(_shingles_from_hashes(F.col("_th"), shingle_k))
            ).alias("shingle"),
        )
    )
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("set_size"))
    if max_df is not None:
        # Drop hot shingles by broadcast ANTI-join: a shingle is hot only
        # if it occurs > max_df times, so there are at most
        # total_rows / max_df distinct hot shingles (≤0.1% of the corpus
        # at max_df=1000) — always broadcastable, unlike the rare set
        # (≈ every shingle), which the previous formulation shuffled
        # through a full equi-join.
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(hot), "shingle", "left_anti")

    l, r = sh.alias("l"), sh.alias("r")
    common = (
        l.join(
            r,
            (F.col("l.shingle") == F.col("r.shingle"))
            & (F.col(f"l.{id_col}") < F.col(f"r.{id_col}")),
        )
        .groupBy(
            F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    # sizes is one slim row per document — too big to broadcast at corpus
    # scale, so let AQE pick the join strategy (it will broadcast when the
    # filtered side is actually small).
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common")
            / (F.col("size_a") + F.col("size_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )


# ------------------------------------------------- decontamination


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    min_common: int = 5,
    max_df: Optional[int] = 1000,
    portable: bool = False,
) -> DataFrame:
    """Benchmark-decontamination join: (corpus_id, bench_id, n_common)
    for every corpus document sharing ≥ ``min_common`` distinct k-token
    shingles with a benchmark document (the GPT-3/Pile-style n-gram
    overlap check, k=13 at production scale).

    Scale shape: the benchmark side is small by definition (eval sets),
    so its exploded shingle table is BROADCAST — the corpus is never
    shuffled for the join; only the matched (corpus_id, bench_id) rows
    (a tiny fraction) move for the count aggregation.  ``max_df`` drops
    corpus-hot shingles first (stopword n-grams match everything and
    signal nothing); the cap threshold applies to corpus frequency.

    ``portable=True`` switches to the md5-derived token hash so a DuckDB
    oracle reproduces the shingle sets exactly."""

    def _sh(df: DataFrame, out_id: str) -> DataFrame:
        # explode-in-one-select: see the plan-shape warning in
        # ngram_jaccard_pairs
        return df.select(
            F.col(id_col).alias(out_id),
            _token_hashes(F.col(text_col), portable).alias("_th"),
        ).select(
            out_id,
            F.explode(
                F.array_distinct(_shingles_from_hashes(F.col("_th"), shingle_k))
            ).alias("shingle"),
        )

    c = _sh(corpus, "corpus_id")
    b = _sh(benchmark, "bench_id")
    if max_df is not None:
        hot = (
            c.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") > max_df)
            .select("shingle")
        )
        c = c.join(F.broadcast(hot), "shingle", "left_anti")
        b = b.join(F.broadcast(hot), "shingle", "left_anti")
    return (
        c.join(F.broadcast(b), "shingle")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count("*").alias("n_common"))
        .filter(F.col("n_common") >= min_common)
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    min_common: int = 5,
    max_df: Optional[int] = 1000,
) -> DataFrame:
    """Corpus rows that do NOT overlap the benchmark (anti-join on the
    contaminated id set) — run before training-data export so eval
    questions never leak into the training corpus."""
    flagged = (
        contamination_pairs(
            corpus, benchmark, text_col, id_col, shingle_k, min_common, max_df
        )
        .select(F.col("corpus_id").alias(id_col))
        .distinct()
    )
    return corpus.join(flagged, id_col, "left_anti")


def near_dup_clusters_star(
    pairs: DataFrame,
    max_iterations: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond") — same contract as ``near_dup_clusters``
    (``(doc_id, cluster_id = min member)``) but O(log n) rounds instead
    of O(diameter): the formulation for adversarial web-scale pair
    graphs with long chains, where min-label propagation needs one
    round per hop.

    large-star: every node points its LARGER neighbors at the minimum
    of its closed neighborhood; small-star: every node and its smaller
    neighbors point at that minimum.  Both strictly shrink the total
    edge "potential", the fixpoint is a star per component centered on
    its minimum, and each round is one groupBy + one join — the same
    shuffle budget per round as propagation, far fewer rounds on
    chains.  Raises on non-convergence rather than returning
    half-contracted stars (same policy as ``near_dup_clusters``)."""
    # undirected edge set, kept asymmetric as (hi, lo) pairs
    e = (
        pairs.select(
            F.greatest("id_a", "id_b").alias("u"),
            F.least("id_a", "id_b").alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _sym(edges: DataFrame) -> DataFrame:
        return edges.select("u", "v").unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    for _ in range(max_iterations):
        # ---- large-star: u's neighbors > u  →  min(N(u) ∪ {u})
        sym = _sym(e)
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("_mv"))
            .select("u", F.least("_mv", F.col("u")).alias("m"))
        )
        e_ls = (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # ---- small-star: u and its neighbors ≤ u → min of that set
        sym2 = _sym(e_ls)
        small = sym2.filter(F.col("v") <= F.col("u"))
        smins = small.groupBy("u").agg(F.min("v").alias("m"))
        e_ss = (
            small.join(smins, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .unionByName(
                smins.select(F.col("u"), F.col("m").alias("v"))
            )
            .filter(F.col("u") != F.col("v"))
            .select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .distinct()
            .localCheckpoint(eager=False)
        )
        # converged when every edge points a node at a component min and
        # no node has two distinct parents (a star forest)
        multi_parent = (
            e_ss.groupBy("u").agg(F.countDistinct("v").alias("np"))
            .filter(F.col("np") > 1)
            .limit(1)
            .count()
        )
        # a parent that is itself a child of something else → not a root
        chained = (
            e_ss.alias("a")
            .join(
                e_ss.alias("b"), F.col("a.v") == F.col("b.u"), "left_semi"
            )
            .limit(1)
            .count()
        )
        e = e_ss
        if multi_parent == 0 and chained == 0:
            break
    else:
        raise RuntimeError(
            f"near_dup_clusters_star did not converge in {max_iterations} "
            "rounds — pathological input; raise max_iterations"
        )
    labels = e.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    return members.join(labels, "doc_id", "left").select(
        "doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id")
    )


# ------------------------------------- exact-substring (n-gram span) dedup


def duplicate_ngram_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_count: int = 2,
    portable: bool = False,
) -> DataFrame:
    """Duplicate-substring spans, the distributed analog of ExactSubstr
    dedup (Lee et al., "Deduplicating Training Data Makes Language
    Models Better"): any ``window``-token sequence occurring
    ``min_count``+ times ANYWHERE in the corpus (cross-document or
    self-repeat) marks its token range as duplicated; overlapping
    ranges merge into maximal spans per document.

    → (id_col, start_tok, end_tok): half-open token intervals.

    100 TB shape — the reason this formulation scales where a suffix
    array does not: the only corpus-wide shuffle is a *count* aggregate
    on the window key (map-side partial combine collapses hot windows,
    so a boilerplate sentence repeated a billion times costs one row
    per map partition, never a pair explosion), followed by one
    shuffle join of windows against the >=min_count keys and a per-doc
    gaps-and-islands window (partitioned by doc id, no skew beyond doc
    length, which the chunking operator bounds upstream).  Default
    keys are xxhash64(window-text) to shrink the shuffle; portable=True
    keeps the raw window string so a DuckDB oracle reproduces the lane
    bit-for-bit."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    base = df.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_nw", F.size("_toks") - F.lit(window - 1)
    )
    wins = (
        base.filter(F.col("_nw") > 0)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("_nw") - 1),
                    lambda i: F.concat_ws(
                        " ", F.slice("_toks", i + 1, window)
                    ),
                )
            ).alias("pos", "win"),
        )
        .withColumn(
            "key",
            F.col("win") if portable else F.xxhash64("win"),
        )
        .drop("win")
    )
    dup_keys = (
        wins.groupBy("key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("key")
    )
    dup_wins = wins.join(dup_keys, "key").select(id_col, "pos")
    # gaps-and-islands: a window opens a new span when it starts past
    # every previous window's end
    w = Window.partitionBy(id_col).orderBy("pos")
    prev_end = F.max(F.col("pos") + window).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = dup_wins.withColumn(
        "_new", F.when(prev_end.isNull() | (F.col("pos") > prev_end - 1), 1)
        .otherwise(0)
    ).withColumn(
        "_island",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        islands.groupBy(id_col, "_island")
        .agg(
            F.min("pos").alias("start_tok"),
            (F.max("pos") + window).alias("end_tok"),
        )
        .select(
            id_col,
            F.col("start_tok").cast("int").alias("start_tok"),
            F.col("end_tok").cast("int").alias("end_tok"),
        )
    )


def strip_duplicate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 10,
    min_count: int = 2,
    portable: bool = False,
) -> DataFrame:
    """ExactSubstr removal pass: drop every token covered by a duplicate
    span and report per-doc loss.  → (id_col, text_col [cleaned],
    n_tokens, n_dup_tokens).  One extra broadcast-free join of the span
    list back to the docs (spans per doc are few after merging); token
    filtering is a JVM higher-order function, no Python."""
    spans = (
        duplicate_ngram_spans(
            df, text_col, id_col, window, min_count, portable
        )
        .groupBy(id_col)
        .agg(
            F.collect_list(F.struct("start_tok", "end_tok")).alias("_spans")
        )
    )
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    no_spans = F.array().cast("array<struct<start_tok:int,end_tok:int>>")
    out = (
        df.select(id_col, toks.alias("_toks"))
        .join(spans, id_col, "left")
        .withColumn("_sp", F.coalesce(F.col("_spans"), no_spans))
        .withColumn(
            "_kept",
            F.filter(
                F.transform(
                    F.col("_toks"),
                    lambda t, i: F.struct(t.alias("t"), i.alias("i")),
                ),
                lambda s: ~F.exists(
                    "_sp",
                    lambda sp: (s["i"] >= sp["start_tok"])
                    & (s["i"] < sp["end_tok"]),
                ),
            ),
        )
    )
    return out.select(
        id_col,
        F.concat_ws(" ", F.transform("_kept", lambda s: s["t"])).alias(
            text_col
        ),
        F.size("_toks").cast("int").alias("n_tokens"),
        (F.size("_toks") - F.size("_kept")).cast("int").alias("n_dup_tokens"),
    )


def winnow_fingerprints(
    df: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    portable: bool = False,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide
    a window of ``w`` consecutive gram hashes, and record each window's
    minimum — RIGHTMOST position on ties.  The winnowing guarantee:
    any match of at least ``w + k - 1`` tokens between two documents
    shares at least one selected fingerprint, while only ~2/(w+1) of
    positions are kept — a density-guaranteed sparsification the plain
    MinHash/shingle family doesn't give (MinHash bounds RESEMBLANCE,
    winnowing bounds LOCAL containment).

    Returns one row per selected fingerprint: (id, pos, fp), distinct.
    Documents with fewer than ``k + w - 1`` tokens yield no rows (no
    full window exists — exactly the paper's domain).

    Scale shape: gram hashing is the materialized-token-hash rolling
    polynomial shared with MinHash (no per-position string building);
    the two window passes (``min`` + ``min_by``) share ONE frame over
    the per-document hash sequence, so the only exchange is the
    per-document hash partition and per-doc state is bounded by the
    document's own gram count.  ``portable=True`` swaps xxhash64 token
    hashes for the md5-prefix hashes a DuckDB oracle reproduces
    bit-for-bit."""
    # staged selects keep the token-hash array a bound column reference
    # inside the gram lambdas (the SCALE.md per-element re-evaluation
    # trap), and posexplode_OUTER + null filter avoids plain explode's
    # implicit size()>0 filter, whose full gram-building expression gets
    # pushed into the scan and re-evaluated per row interpreted (the
    # ngram_lm 54 s → 5 s lesson; measured 62 s → ~2 s here at sf0.1)
    grams = df.select(
        F.col(id_col),
        _token_hashes(F.col(text_col), portable=portable).alias("_th"),
    ).select(
        F.col(id_col), _shingles_from_hashes(F.col("_th"), k).alias("_g")
    )
    s = grams.select(
        F.col(id_col), F.posexplode_outer("_g").alias("pos", "h")
    ).filter(F.col("h").isNotNull())
    win = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(w - 1), 0)
    )
    # rightmost minimum: minimize (h, -pos) — ties in h resolve to the
    # later position, per the paper's robust-winnowing tie rule
    sel = (
        s.withColumn("_fp", F.min("h").over(win))
        .withColumn(
            "_fpos",
            F.min_by(
                F.col("pos"), F.struct(F.col("h"), (-F.col("pos")))
            ).over(win),
        )
        .filter(F.col("pos") >= w - 1)
        .select(
            F.col(id_col),
            F.col("_fpos").alias("pos"),
            F.col("_fp").alias("fp"),
        )
        .distinct()
    )
    return sel


def winnow_match_pairs(
    fps: DataFrame,
    id_col: str = "doc_id",
    min_shared: int = 2,
    max_df: Optional[int] = 1000,
) -> DataFrame:
    """Candidate near-dup/plagiarism pairs from winnowed fingerprints:
    documents sharing at least ``min_shared`` fingerprint VALUES.
    Same scale treatment as the shingle join: fingerprints appearing in
    more than ``max_df`` documents are dropped before the self-join
    (a fingerprint of boilerplate every page carries would otherwise
    quadratically explode its bucket — the hot-shingle cap)."""
    vals = fps.select(id_col, "fp").distinct()
    if max_df is not None:
        hot = (
            vals.groupBy("fp")
            .agg(F.countDistinct(id_col).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("fp")
        )
        vals = vals.join(hot, "fp", "left_anti")
    a = vals.select(F.col(id_col).alias("id_a"), "fp")
    b = vals.select(F.col(id_col).alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
