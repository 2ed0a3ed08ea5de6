"""Deterministic sampling and dataset splits (training-data lane).

RNG-free: every decision is a pure function of the document id via an
md5 hash bucket, so splits are reproducible across runs, engines and
cluster sizes (no seed drift between partitions, no dependence on row
order), new documents never reshuffle old ones between splits, and a
DuckDB oracle can recompute the assignment bit-for-bit.  All JVM-side
expressions — sampling a 100 TB corpus is a narrow scan, no shuffle.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame, functions as F

HASH_BUCKETS = 10_000


def hash_bucket(col: Column, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the integer value of
    the first 6 md5 hex chars of the (string) id — engine-portable (the
    DuckDB twin is ``_md5_int_sql``-style arithmetic), uniform enough
    for split assignment (24 bits ≫ 10⁴ buckets)."""
    return (
        F.conv(F.substring(F.md5(F.encode(col, "UTF-8")), 1, 6), 16, 10)
        .cast("long")
        % buckets
    )


def with_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_frac: float = 0.9,
    valid_frac: float = 0.05,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Attach ``split`` ∈ {train, valid, test} by hash-bucket range:
    bucket < train·B → train, < (train+valid)·B → valid, else test.
    Fractions are exact at bucket granularity (1/10⁴ by default)."""
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    t_hi = int(round(train_frac * buckets))
    v_hi = t_hi + int(round(valid_frac * buckets))
    return df.withColumn(
        "split",
        F.when(b < t_hi, F.lit("train"))
        .when(b < v_hi, F.lit("valid"))
        .otherwise(F.lit("test")),
    )


def stratified_sample(
    df: DataFrame,
    fractions: Dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_frac: float = 0.0,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic per-stratum downsampling (the training-mix shaper:
    e.g. keep 100% of rare languages, 10% of the dominant one).  A row
    survives iff its hash bucket < frac(stratum)·buckets — no RNG, so
    resampling with the same fractions returns the identical corpus,
    and raising a fraction strictly grows the sample (nested samples).
    The fraction map is a literal CASE chain — no join, no shuffle."""
    frac = F.lit(float(default_frac))
    for k, v in sorted(fractions.items()):
        frac = F.when(F.col(strata_col) == k, F.lit(float(v))).otherwise(frac)
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    return df.filter(b < F.round(frac * buckets).cast("long"))


def exclusive_prefix_sum(
    df: DataFrame,
    id_col: str,
    val_col: str,
    num_ranges: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """``df`` + a ``_prev_cum`` column holding the exclusive prefix sum
    of ``val_col`` in global ``id_col`` order — the two-phase parallel
    prefix sum shared by the packing operators.

    The naive ``Window.orderBy(id)`` running total drags the whole
    corpus through ONE task (the classic global-window bottleneck);
    this range-partitions by id, runs per-partition totals in parallel
    windows, then turns a ``num_ranges``-row driver round-trip into
    exclusive partition offsets mapped back as a literal CASE — no
    single-task stage anywhere."""
    from pyspark.sql import Window

    t = df.repartitionByRange(num_ranges, F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = t.withColumn("_lcum", F.sum(val_col).over(w))
    if checkpoint:
        # two consumers (totals collect + final select) — materialize
        # the window stage once
        t = t.localCheckpoint(eager=False)
    totals = {
        r["_pid"]: r["_t"]
        for r in t.groupBy("_pid").agg(F.max("_lcum").alias("_t")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    off = F.lit(0).cast("long")
    for pid, o in sorted(offsets.items()):
        off = F.when(F.col("_pid") == pid, F.lit(o).cast("long")).otherwise(off)
    return t.withColumn(
        "_prev_cum", off + F.col("_lcum") - F.col(val_col)
    ).drop("_pid", "_lcum")


def pack_shards(
    df: DataFrame,
    budget_tokens: int = 100_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """Assign each document a ``shard`` so consecutive documents (in
    id order) fill ~``budget_tokens`` per shard — the export step that
    turns a cleaned corpus into bounded training-data files.

    shard = floor(exclusive-prefix-sum(tokens) / budget): a document
    starts in the shard its running total lands in, so every shard
    except the last holds ≥ budget tokens and the assignment is a pure
    function of the global id order.

    Scale shape — see ``exclusive_prefix_sum`` (two-phase parallel
    prefix sum, no single-task stage anywhere)."""
    from .textstats import token_count

    t = df.select(
        F.col(id_col),
        # NULL text counts as 0 tokens (NULL would poison the
        # running totals on both engines differently)
        F.coalesce(token_count(F.col(text_col)), F.lit(0)).alias("_tc"),
    )
    t = exclusive_prefix_sum(t, id_col, "_tc", num_ranges, checkpoint)
    return t.select(
        id_col,
        F.col("_tc").alias("n_tokens"),
        F.floor(F.col("_prev_cum") / F.lit(budget_tokens))
        .cast("int")
        .alias("shard"),
    )


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_ranges: int = 32,
    count_col: Optional[str] = None,
) -> DataFrame:
    """Fixed-context sequence packing — the concat-and-chunk step that
    turns a cleaned corpus into training sequences of exactly
    ``seq_len`` tokens: documents are concatenated in global id order
    and the token stream is cut every ``seq_len`` tokens, so a document
    may span several sequences and a sequence may hold several document
    segments (the standard GPT-style pretraining layout; padding-free
    per Kosec et al. 2021 / T5's "pack" preprocessing).

    Returns one row per (sequence × document segment):
    ``(seq_id, doc_id, n_tokens, doc_start, seq_start)`` where
    ``doc_start`` is the segment's token offset inside the document and
    ``seq_start`` its offset inside the sequence; the last sequence may
    be short (callers drop or pad it).

    Scale shape — one ``exclusive_prefix_sum`` (two-phase, parallel)
    plus a per-doc ``sequence()`` explode whose width is
    ceil(doc_len/seq_len)+1 — output-proportional, never corpus²; all
    arithmetic JVM-side."""
    from .textstats import token_count

    # count_col: pack a PRE-TOKENIZED corpus (e.g. subword counts from
    # bpe_encode/unigram_encode) instead of re-tokenizing text here
    tc = (
        F.col(count_col).cast("long")
        if count_col
        else token_count(F.col(text_col))
    )
    t = df.select(
        F.col(id_col),
        F.coalesce(tc, F.lit(0)).alias("_tc"),
    ).filter(F.col("_tc") > 0)
    t = exclusive_prefix_sum(t, id_col, "_tc", num_ranges)
    L = F.lit(int(seq_len)).cast("long")
    first = F.floor(F.col("_prev_cum") / L)
    last = F.floor((F.col("_prev_cum") + F.col("_tc") - 1) / L)
    seg = t.select(
        F.col(id_col),
        F.col("_tc"),
        F.col("_prev_cum"),
        F.explode(F.sequence(first, last)).alias("seq_id"),
    )
    seg_start = F.greatest(F.col("_prev_cum"), F.col("seq_id") * L)
    seg_end = F.least(
        F.col("_prev_cum") + F.col("_tc"), (F.col("seq_id") + 1) * L
    )
    return seg.select(
        "seq_id",
        F.col(id_col),
        (seg_end - seg_start).cast("int").alias("n_tokens"),
        (seg_start - F.col("_prev_cum")).cast("int").alias("doc_start"),
        (seg_start - F.col("seq_id") * L).cast("int").alias("seq_start"),
    )


def split_manifest(
    df: DataFrame,
    strata_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    train_frac: float = 0.9,
    valid_frac: float = 0.05,
) -> DataFrame:
    """(split, stratum, n_docs, n_tokens) audit table for a split —
    the record a training run pins alongside the data."""
    from .textstats import token_count

    return (
        with_split(df, id_col, train_frac, valid_frac)
        .groupBy("split", F.col(strata_col).alias("stratum"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
        )
    )


def cap_per_key(
    df: DataFrame,
    key_col: str = "source",
    cap: int = 100,
    id_col: str = "doc_id",
    broadcast_hot: bool = True,
) -> DataFrame:
    """Per-domain document cap (RefinedWeb-style): keep at most ``cap``
    documents per key, chosen deterministically by md5 hash order (so the
    kept set is a pseudo-random, reproducible sample and lowering the cap
    yields a nested subset — same property as ``stratified_sample``).

    Skew-aware plan: the set of OVER-cap keys is at most
    total_rows / cap (bounded by construction), so it is computed first
    and broadcast; rows in under-cap keys pass through with a broadcast
    anti join and NEVER enter the window shuffle — on a web corpus where
    most domains are small, most of the data avoids the sort entirely.
    Only over-cap rows shuffle, partitioned by key with AQE free to
    split stragglers.  Set ``broadcast_hot=False`` to fall back to the
    plain single-window plan when the over-cap key set itself is huge
    (tiny cap over an enormous key space)."""
    from pyspark.sql import Window

    rank_key = hash_bucket(F.col(id_col).cast("string"))
    w = Window.partitionBy(key_col).orderBy(
        rank_key, F.col(id_col).cast("string")
    )
    if not broadcast_hot:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= cap)
            .drop("_rn")
        )
    hot = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(key_col)
    )
    cold_rows = df.join(F.broadcast(hot), key_col, "left_anti")
    hot_rows = (
        df.join(F.broadcast(hot), key_col, "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return cold_rows.unionByName(hot_rows)


def temperature_mix(
    df: DataFrame,
    group_col: str = "lang",
    alpha: float = 0.5,
    id_col: str = "doc_id",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-corpus
    standard: sample group g with probability ∝ n_g^α).  Without
    upsampling, the largest feasible such mix keeps
    c_g = min(n_g, n_min^(1-α) · n_g^α) documents, i.e. per-row keep
    rate min(1, (n_min / n_g)^(1-α)): the rarest group survives whole,
    dominant groups are flattened toward it.  α=1 keeps everything;
    α=0 caps every group at the rarest group's size (uniform mix).

    Deterministic: a row survives iff its md5 hash bucket clears the
    group's integer threshold — reproducible across runs/engines, and
    nested in α (raising α only adds documents).  Plan: one tiny
    per-group count aggregate broadcast back onto a narrow scan — the
    corpus itself never shuffles."""
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    n_min = counts.agg(F.min("_n").alias("_n_min"))
    rate = F.least(
        F.lit(1.0),
        F.pow(F.col("_n_min") / F.col("_n"), F.lit(1.0 - float(alpha))),
    )
    thresh = counts.crossJoin(F.broadcast(n_min)).select(
        group_col,
        F.round(rate * buckets).cast("long").alias("_thresh"),
    )
    b = hash_bucket(F.col(id_col).cast("string"), buckets)
    return (
        df.join(F.broadcast(thresh), group_col)
        .filter(b < F.col("_thresh"))
        .drop("_thresh")
    )


#: Spark simpleString → Arrow type for the IPC export (flat columns
#: only — the training-export payload shape)
_ARROW_TYPES = {
    "string": "string", "bigint": "int64", "int": "int32",
    "double": "float64", "float": "float32", "boolean": "bool_",
    "binary": "binary",
}


def write_arrow_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    columns: Optional[List[str]] = None,
    batch_rows: int = 4096,
) -> DataFrame:
    """Training-export sink: Arrow IPC file shards
    (``shard-00000.arrow``) — the zero-copy interchange format
    memory-mapping data loaders consume (the HuggingFace datasets
    on-disk format is Arrow).  Same distributed shape and determinism
    contract as ``write_jsonl_shards``: md5-derived shard + order, one
    task per shard partition, task-attempt temp + atomic rename,
    shared-filesystem requirement (see ``write_webdataset_shards``).
    Record-batch boundaries are fixed at ``batch_rows`` over the
    deterministic order, and the schema is built explicitly from the
    Spark schema with no pandas metadata — shard BYTES are
    reproducible run-to-run.

    Flat payload columns only (string/int/float/bool/binary); nested
    columns raise immediately rather than exporting a surprise
    encoding."""
    import os

    import pandas as pd
    import pyarrow as pa

    payload_cols = columns or [
        c for c in df.columns if c not in ("shard", "position")
    ]
    if id_col not in payload_cols:
        payload_cols = [id_col] + payload_cols
    fields = []
    by_name = {f.name: f for f in df.schema.fields}
    for c in payload_cols:
        st = by_name[c].dataType.simpleString()
        if st not in _ARROW_TYPES:
            raise ValueError(
                f"column {c}: type {st} is not a flat exportable type"
            )
        fields.append(pa.field(c, getattr(pa, _ARROW_TYPES[st])()))
    pa_schema = pa.schema(fields)

    ordered = training_order(df, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_docs long, n_bytes long, path string"

    def kernel(batches):
        import pyarrow as pa  # noqa: F811  (executor-side import)
        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        # shard -> [writer, sink, buffered rows (per-col lists),
        #           count, final_path, tmp]
        state: dict = {}

        def wr_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.arrow")
                tmp = f"{p}.attempt-{attempt}"
                sink = pa.OSFile(tmp, "wb")
                w = pa.ipc.new_file(sink, pa_schema)
                state[shard] = [w, sink, {c: [] for c in payload_cols},
                                0, p, tmp]
            return state[shard]

        def flush(entry) -> None:
            buf = entry[2]
            if not buf[payload_cols[0]]:
                return
            arrays = [
                pa.array(buf[c], type=pa_schema.field(c).type)
                for c in payload_cols
            ]
            entry[0].write_batch(
                pa.record_batch(arrays, schema=pa_schema)
            )
            for c in payload_cols:
                buf[c].clear()

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = wr_for(int(row.shard))
                for c in payload_cols:
                    entry[2][c].append(getattr(row, c))
                entry[3] += 1
                if len(entry[2][payload_cols[0]]) >= batch_rows:
                    flush(entry)
        rows = []
        for shard, entry in sorted(state.items()):
            flush(entry)
            entry[0].close()
            entry[1].close()
            os.replace(entry[5], entry[4])
            rows.append(
                {
                    "shard": shard,
                    "n_docs": entry[3],
                    "n_bytes": os.path.getsize(entry[4]),
                    "path": entry[4],
                }
            )
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_bytes", "path"]
        )

    manifest = (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select(*payload_cols, "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )
    return manifest


#: tercile bounds of the CCNet head/middle/tail split, as the exact
#: double literals both engines compare against
CCNET_BOUNDS = (1.0 / 3.0, 2.0 / 3.0)


def score_buckets(
    df: DataFrame,
    score_col: str = "perplexity",
    by: Optional[str] = "lang",
    bounds: tuple = CCNET_BOUNDS,
    labels: tuple = ("head", "middle", "tail"),
    mode: str = "thresholds",
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet-style quantile bucketing (Wenzek et al. 2020): split each
    group (per language, in CCNet) into head/middle/tail by the rank
    of a score column — LM perplexity in the original, any numeric
    score here (compose with ``ngram_lm.score_perplexity`` for the
    faithful pipeline).  Lower score = ``head`` (CCNet: head is the
    LOW-perplexity, Wikipedia-like tercile).

    Two plans for one definition (bucket = position of the row's score
    quantile against ``bounds``):

    - ``mode='thresholds'`` — the 100 TB path: ONE tiny per-group
      ``percentile_approx(score, bounds)`` aggregate, broadcast back
      onto a narrow scan; the corpus never shuffles.  Rows within the
      sketch's rank-error band of a cutoff may land on the other side
      of it — exactly the trade CCNet itself makes (its cutoffs come
      from a sampled histogram).
    - ``mode='window'`` — exact ``percent_rank`` per group; ties share
      a rank and therefore a bucket.  The whole group passes through
      one window partition, so this is for validation / bounded
      groups, not the full corpus (the thresholds plan is pinned
      against it in tests).

    Returns ``df`` + a ``bucket`` string column."""
    from pyspark.sql import Window

    b0, b1 = float(bounds[0]), float(bounds[1])
    if mode == "window":
        part = Window.partitionBy(by) if by else Window.partitionBy()
        pr = F.percent_rank().over(part.orderBy(F.col(score_col)))
        bucket = (
            F.when(pr < F.lit(b0), F.lit(labels[0]))
            .when(pr < F.lit(b1), F.lit(labels[1]))
            .otherwise(F.lit(labels[2]))
        )
        return df.withColumn("bucket", bucket)
    if mode != "thresholds":
        raise ValueError(f"mode must be 'window' or 'thresholds', got {mode}")
    keys = [by] if by else []
    cuts = df.groupBy(*keys).agg(
        F.percentile_approx(
            F.col(score_col), F.array(F.lit(b0), F.lit(b1)), F.lit(accuracy)
        ).alias("_cuts")
    )
    joined = (
        df.join(F.broadcast(cuts), keys)
        if keys
        else df.crossJoin(F.broadcast(cuts))
    )
    # percentile_approx returns an element OF the data, so `<=` keeps
    # the cut row itself in the lower bucket (matching percent_rank's
    # "strictly above the cut rank" upper side)
    bucket = (
        F.when(F.col(score_col) <= F.col("_cuts")[0], F.lit(labels[0]))
        .when(F.col(score_col) <= F.col("_cuts")[1], F.lit(labels[1]))
        .otherwise(F.lit(labels[2]))
    )
    return joined.withColumn("bucket", bucket).drop("_cuts")


def training_order(
    df: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic global training shuffle + sharding: every document
    gets a shard (md5 bucket mod ``n_shards``) and a position within its
    shard (rank by the full md5 hex, ties by id) — the fixed pseudo-random
    order data loaders consume, reproducible across runs/engines and
    independent of input partitioning.  One window exchange, parallel
    across shards (never a global single-partition sort); at 100 TB each
    shard sorts independently and `position` is contiguous per shard,
    which is what a per-worker data loader actually needs."""
    from pyspark.sql import Window

    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    shard = (hash_bucket(F.col(id_col).cast("string"), buckets) % n_shards).cast(
        "int"
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("_h"), F.col(id_col).cast("string")
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w))
        .drop("_h")
    )


def pack_documents(
    df: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    id_col: str = "doc_id",
    count_col: Optional[str] = None,
    n_shards: int = 64,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Document-boundary-respecting sequence packing: first-fit-
    decreasing within md5-assigned shards, NO document ever split
    across sequences — the alternative to ``pack_sequences`` when
    cross-document attention contamination matters (each sequence
    holds only whole documents; training masks per-document without
    segment bookkeeping).  Documents longer than ``seq_len`` are
    returned flagged (``overflow = true``, alone in their own
    sequence) rather than silently truncated — the caller chunks or
    drops them explicitly.

    Deterministic and partition-invariant: shard = md5 bucket (same
    rule as ``training_order``), and within a shard the FFD fold runs
    in (length desc, md5, id) order inside one Arrow-batched kernel —
    the sequential bin-packing heart is per-shard, so parallelism is
    ``n_shards`` and memory is one shard's (doc_id, length) list, not
    its text.  FFD wastes ≤ the largest-doc residual per bin and in
    practice fills ≥90% of each sequence; the fill rate is the
    caller-visible quality signal (vs pack_sequences' 1.0-by-splitting).

    Returns (seq_id string, doc_id, n_tokens, seq_fill long,
    overflow boolean) — one row per document."""
    import pandas as pd

    from .textstats import token_count

    tc = (
        F.col(count_col).cast("long")
        if count_col
        else token_count(F.col(text_col))
    )
    t = df.select(
        F.col(id_col).cast("string").alias("_id"),
        F.coalesce(tc, F.lit(0)).alias("_tc"),
    ).filter(F.col("_tc") > 0)
    t = t.withColumn(
        "_shard", (hash_bucket(F.col("_id"), buckets) % n_shards).cast("int")
    ).withColumn("_h", F.md5(F.encode(F.col("_id"), "UTF-8")))

    schema = (
        f"seq_id string, {id_col} string, n_tokens long, "
        "seq_fill long, overflow boolean"
    )
    cap = int(seq_len)

    def kernel(batches) -> "pd.DataFrame":
        # Arrow feeds a partition as MULTIPLE batches; a shard split
        # across batch boundaries must still see ONE fold, so buffer
        # the partition's (length, hash, id) rows — never the text —
        # before packing.
        parts = [b for b in batches if not b.empty]
        if not parts:
            yield pd.DataFrame(
                {
                    "seq_id": [], id_col: [], "n_tokens": [],
                    "seq_fill": [], "overflow": [],
                }
            )
            return
        whole = pd.concat(parts, ignore_index=True)
        out = {
            "seq_id": [], id_col: [], "n_tokens": [],
            "seq_fill": [], "overflow": [],
        }
        for shard, grp in whole.groupby("_shard", sort=True):
            docs = sorted(
                zip(grp["_tc"], grp["_h"], grp["_id"]),
                key=lambda x: (-x[0], x[1], x[2]),
            )
            bins: list = []  # [remaining, [(id, n, overflow)]]
            for n, _h, did in docs:
                if n > cap:
                    bins.append([0, [(did, n, True)]])
                    continue
                placed = False
                for b in bins:
                    if b[0] >= n:
                        b[0] -= n
                        b[1].append((did, n, False))
                        placed = True
                        break
                if not placed:
                    bins.append([cap - n, [(did, n, False)]])
            for i, (rem, members) in enumerate(bins):
                fill = sum(m[1] for m in members)
                sid = f"s{shard:05d}-{i:06d}"
                for did, n, ov in members:
                    out["seq_id"].append(sid)
                    out[id_col].append(did)
                    out["n_tokens"].append(n)
                    out["seq_fill"].append(fill)
                    out["overflow"].append(ov)
        yield pd.DataFrame(out)

    return (
        t.repartition(n_shards, F.col("_shard"))
        .sortWithinPartitions("_shard")
        .mapInPandas(kernel, schema=schema)
    )


def curriculum_order(
    df: DataFrame,
    score_col: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    ascending: bool = True,
    buckets: int = HASH_BUCKETS,
) -> DataFrame:
    """Deterministic curriculum training order (Bengio et al. 2009):
    same md5 shard assignment as ``training_order`` — a document's
    shard never depends on its score, so re-scoring moves positions,
    not shard membership — but position within each shard is primarily
    by the score (ascending = easy-first; flip for anti-curriculum),
    with the md5 hash then the id breaking score ties pseudo-randomly.
    Shards consumed sequentially by per-worker loaders then present
    the curriculum in every shard simultaneously, which is what a
    data-parallel run needs (a single global sort would both serialize
    the sort and give each worker a different difficulty band).

    One parallel window exchange, identical plan shape to
    ``training_order``."""
    from pyspark.sql import Window

    h = F.md5(F.encode(F.col(id_col).cast("string"), "UTF-8"))
    shard = (
        hash_bucket(F.col(id_col).cast("string"), buckets) % n_shards
    ).cast("int")
    score = F.col(score_col) if ascending else F.col(score_col).desc()
    w = Window.partitionBy("shard").orderBy(
        score, F.col("_h"), F.col(id_col).cast("string")
    )
    return (
        df.withColumn("_h", h)
        .withColumn("shard", shard)
        .withColumn("position", F.row_number().over(w))
        .drop("_h")
    )


def write_webdataset_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Training-export sink: the corpus written as WebDataset-style tar
    shards — ``shard-00000.tar`` holding one ``<doc_id>.txt`` member per
    document, documents in their deterministic ``training_order``
    position (data loaders stream tars sequentially, so on-disk order
    IS consumption order).

    Distributed shape: one task per shard (repartition on the shard
    column, sortWithinPartitions by position — no global sort), each
    task streaming its rows straight into one tar via an Arrow-batched
    ``mapInPandas`` (tarfile is pure stdlib); the returned manifest
    (shard, n_docs, n_bytes, path) is the only driver-visible data.
    Deterministic: fixed mtimes/uids, md5-derived membership/order.

    FILESYSTEM REQUIREMENT: ``path`` must be a filesystem visible to the
    driver AND every executor under the same name — local disk only
    works on single-node (local[*]) runs; on a multi-node cluster it
    must be a shared mount (NFS, FUSE-mounted object store, etc.),
    otherwise shards land on executor-local disks where the manifest's
    paths are unreachable from the driver.  Each executor task verifies
    the mount by creating its shard under ``path`` directly (open(2)
    fails fast on a missing mount); for object stores without a FUSE
    mount, write shards locally and upload in the same task instead."""
    import os

    import pandas as pd

    ordered = training_order(df, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_docs long, n_bytes long, path string"

    def kernel(batches):
        import io
        import tarfile

        from pyspark import TaskContext

        # task-attempt-suffixed temp + atomic rename on close: a retried
        # or speculatively-executed task never interleaves with another
        # attempt's partial file, and since the bytes are deterministic
        # the last rename winning is harmless
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        # executor-side makedirs: on a shared mount the driver-side call
        # above may have raced or the executor may see the mount fresh
        os.makedirs(path, exist_ok=True)
        state = {}  # shard -> [tarfile, fileobj, count, final_path, tmp]

        def tar_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.tar")
                tmp = f"{p}.attempt-{attempt}"
                f = open(tmp, "wb")
                state[shard] = [tarfile.open(fileobj=f, mode="w"), f, 0, p, tmp]
            return state[shard]

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = tar_for(int(row.shard))
                data = (getattr(row, text_col) or "").encode("utf-8")
                info = tarfile.TarInfo(name=f"{getattr(row, id_col)}.txt")
                info.size = len(data)
                info.mtime = 0  # deterministic bytes
                entry[0].addfile(info, io.BytesIO(data))
                entry[2] += 1
        rows = []
        for shard, (tf, f, count, p, tmp) in sorted(state.items()):
            tf.close()
            f.close()
            os.replace(tmp, p)
            rows.append(
                {
                    "shard": shard,
                    "n_docs": count,
                    "n_bytes": os.path.getsize(p),
                    "path": p,
                }
            )
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_bytes", "path"]
        )

    manifest = (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select(id_col, text_col, "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )
    return manifest


def write_jsonl_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    columns: Optional[List[str]] = None,
) -> DataFrame:
    """Training-export sink: gzipped-JSONL shards
    (``shard-00000.jsonl.gz``, one JSON object per document) — the
    de-facto interchange format of published pre-training corpora
    (C4/Dolma/RedPajama all ship jsonl.gz).  Same distributed shape,
    determinism contract (md5-derived shard+order, ``sort_keys``,
    gzip ``mtime=0`` so shard BYTES are reproducible), task-attempt
    temp + atomic rename, and shared-filesystem requirement as
    ``write_webdataset_shards`` (see that docstring).

    ``columns``: the payload columns (default: every column except the
    book-keeping shard/position); ``id_col`` is always included."""
    import os

    import pandas as pd

    payload_cols = columns or [
        c for c in df.columns if c not in ("shard", "position")
    ]
    if id_col not in payload_cols:
        payload_cols = [id_col] + payload_cols

    ordered = training_order(df, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_docs long, n_bytes long, path string"

    def kernel(batches):
        import gzip
        import json

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        state = {}  # shard -> [gzipfile, count, final_path, tmp]

        def gz_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.jsonl.gz")
                tmp = f"{p}.attempt-{attempt}"
                raw = open(tmp, "wb")
                # fileobj + empty filename: the gzip header carries NO
                # FNAME (a path-derived name would leak the attempt
                # suffix into the bytes) and mtime=0 pins the header —
                # shard bytes stay reproducible run-to-run
                f = gzip.GzipFile(
                    filename="", fileobj=raw, mode="wb", mtime=0
                )
                state[shard] = [f, 0, p, tmp, raw]
            return state[shard]

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = gz_for(int(row.shard))
                obj = {c: getattr(row, c) for c in payload_cols}
                line = json.dumps(
                    obj, ensure_ascii=False, sort_keys=True,
                    separators=(",", ":"),
                )
                entry[0].write(line.encode("utf-8") + b"\n")
                entry[1] += 1
        rows = []
        for shard, (f, count, p, tmp, raw) in sorted(state.items()):
            f.close()
            raw.close()
            os.replace(tmp, p)
            rows.append(
                {
                    "shard": shard,
                    "n_docs": count,
                    "n_bytes": os.path.getsize(p),
                    "path": p,
                }
            )
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_bytes", "path"]
        )

    manifest = (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select(*payload_cols, "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )
    return manifest
