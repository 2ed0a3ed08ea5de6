"""Interleaved text+media sequence assembly (the MMC4/OBELICS shape).

Multimodal pre-training corpora (MMC4, OBELICS) ship documents as an
ORDERED sequence of typed segments — text blocks interleaved with
image references — rather than one flat string.  This module projects
the extraction output (ordered ``(kind, text, media_ref, offset)``
span arrays) into that shape:

    segments: array<struct<type: "text"|"media", text, media_ref>>

where consecutive kept text spans merge into ONE text segment (joined
with a blank line) and every media span becomes its own segment
carrying the alt/caption text and the ``media_ref`` that resolves
against the media store / WARC resource sidecar.

Plan discipline: the whole projection is a NARROW JVM expression over
the span array — zero exchange, zero Python, document order preserved
by construction (same contract as ``operators/render.py``).  The fold
is LINEAR in the number of spans: media positions are computed once,
and each inter-media text chunk is one ``slice`` + ``array_join``.
An accumulator-array ``F.aggregate`` spelling would copy the growing
segment array per span (O(n²) — the HOF re-evaluation family of traps
documented in SCALE.md); intermediates are materialized as columns so
no lambda recomputes a derived array per element.

No counterpart in the reference repo (single-process, text-only
output); the segment shape follows the published MMC4/OBELICS dataset
formats.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: span kinds that contribute text to interleaved segments — the
#: layout-aware export set (render.MARKDOWN_KINDS minus media, which
#: becomes its own segment type)
TEXT_KINDS = (
    "title", "heading", "main", "line", "cell", "code", "math",
    "caption", "output",
)

_SEG_TYPE = "array<struct<type:string,text:string,media_ref:string>>"


def _text_seg(texts: Column, joiner: str) -> Column:
    return F.struct(
        F.lit("text").alias("type"),
        F.array_join(texts, joiner).alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def _media_seg(span: Column) -> Column:
    return F.struct(
        F.lit("media").alias("type"),
        span["text"].alias("text"),
        span["media_ref"].alias("media_ref"),
    )


def interleaved_segments(
    df: DataFrame,
    spans_col: str = "spans",
    out_col: str = "segments",
    text_kinds: Sequence[str] = TEXT_KINDS,
    joiner: str = "\n\n",
) -> DataFrame:
    """Attach the interleaved segment array.

    Kept spans are the media spans plus the non-empty ``text_kinds``
    spans; runs of consecutive text spans collapse into one ``text``
    segment (``joiner``-joined), each media span is one ``media``
    segment, and segment order is span order."""
    kept = F.filter(
        F.col(spans_col),
        lambda s: (s["kind"] == "media")
        | (
            s["kind"].isin(*text_kinds)
            & s["text"].isNotNull()
            & (s["text"] != "")
        ),
    )
    df = df.withColumn("_il_kept", kept)
    # 0-based positions of the media spans within the kept array
    pos = F.filter(
        F.transform(
            F.col("_il_kept"),
            lambda s, i: F.when(s["kind"] == "media", i),
        ),
        lambda x: x.isNotNull(),
    )
    df = df.withColumn("_il_pos", pos)
    # sentinel boundaries: -1, each media position, size(kept) — the
    # k-th text chunk is the kept spans strictly between bnd[k] and
    # bnd[k+1]
    bnd = F.concat(
        F.array(F.lit(-1)),
        F.col("_il_pos"),
        F.array(F.size(F.col("_il_kept"))),
    )
    df = df.withColumn("_il_bnd", bnd)

    kept_c = F.col("_il_kept")
    pos_c = F.col("_il_pos")
    bnd_c = F.col("_il_bnd")
    empty = F.array().cast(_SEG_TYPE)

    def chunk(k: Column) -> Column:
        lo = F.element_at(bnd_c, k + 1)  # bnd[k], element_at is 1-based
        hi = F.element_at(bnd_c, k + 2)  # bnd[k+1]
        n_text = hi - lo - 1
        texts = F.transform(
            F.slice(kept_c, lo + 2, n_text), lambda s: s["text"]
        )
        text_part = F.when(
            n_text > 0, F.array(_text_seg(texts, joiner))
        ).otherwise(empty)
        media_part = F.when(
            k < F.size(pos_c),
            F.array(
                _media_seg(
                    F.element_at(kept_c, F.element_at(pos_c, k + 1) + 1)
                )
            ),
        ).otherwise(empty)
        return F.concat(text_part, media_part)

    segs = F.flatten(
        F.transform(F.sequence(F.lit(0), F.size(pos_c)), chunk)
    )
    return df.withColumn(out_col, segs).drop(
        "_il_kept", "_il_pos", "_il_bnd"
    )


def media_refs(segments_col: str = "segments") -> Column:
    """The ordered media_refs of a segment array — the join key list
    against the media store / WARC resource sidecar."""
    return F.transform(
        F.filter(F.col(segments_col), lambda s: s["type"] == "media"),
        lambda s: s["media_ref"],
    )


def interleaved_stats(
    df: DataFrame, segments_col: str = "segments"
) -> DataFrame:
    """Per-document shape statistics of an interleaved segment array —
    the doc-level signals the published interleaved-corpus pipelines
    (MMC4, OBELICS) filter on: segment counts by type, text volume,
    repeated-image share, the longest run of consecutive media
    segments, and the media fraction.

    All columns are narrow JVM expressions over the array — zero
    exchange, zero Python.  The run-length fold's accumulator is a
    3-field scalar struct (prev, run, best), so it is LINEAR (the O(n²)
    HOF trap only bites when the accumulator itself is a growing
    array).  Lambdas reference only their own arguments, so nothing
    re-evaluates per element."""
    segs = F.col(segments_col)
    n_seg = F.size(segs)
    media = F.filter(segs, lambda s: s["type"] == "media")
    n_media = F.size(media)
    refs = F.transform(media, lambda s: s["media_ref"])
    text_chars = F.aggregate(
        F.transform(
            F.filter(segs, lambda s: s["type"] == "text"),
            lambda s: F.length(s["text"]).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pos = F.filter(
        F.transform(
            segs, lambda s, i: F.when(s["type"] == "media", i)
        ),
        lambda x: x.isNotNull(),
    )
    zero = F.lit(0).cast("int")
    acc0 = F.struct(
        F.lit(-2).cast("int").alias("prev"),
        zero.alias("run"),
        zero.alias("best"),
    )

    def step(a: Column, x: Column) -> Column:
        run = F.when(x == a["prev"] + 1, a["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.cast("int").alias("prev"),
            run.cast("int").alias("run"),
            F.greatest(a["best"], run).cast("int").alias("best"),
        )

    max_run = F.aggregate(pos, acc0, step, lambda a: a["best"])
    return (
        df.withColumn("n_segments", n_seg)
        .withColumn("n_media_segments", n_media)
        .withColumn("n_text_segments", n_seg - n_media)
        .withColumn("text_chars", text_chars)
        .withColumn("distinct_media_refs", F.size(F.array_distinct(refs)))
        .withColumn(
            "dup_media_refs", n_media - F.size(F.array_distinct(refs))
        )
        .withColumn("max_media_run", max_run)
        .withColumn(
            "media_frac",
            F.when(
                n_seg > 0,
                F.round(n_media.cast("double") / n_seg, 6),
            ).otherwise(F.lit(0.0)),
        )
    )


def _drop_and_remerge(
    df: DataFrame,
    drop_pairs: DataFrame,
    id_col: str = "doc_id",
    segments_col: str = "segments",
    joiner: str = "\n\n",
) -> DataFrame:
    """Shared rewrite for the media-removal family: ``drop_pairs`` is
    ``(id_col, media_ref)`` rows to remove; the per-doc drop list is
    one aggregate over the (small) drop side, media segments matching
    it are filtered out, and text segments left adjacent re-merge by
    re-running the segment fold on the kept rows as pseudo-spans — so
    the output preserves :func:`interleaved_segments`' no-two-
    consecutive-text invariant.  Adds ``n_media_dropped``."""
    drop_refs = drop_pairs.groupBy(id_col).agg(
        F.collect_set("media_ref").alias("_drop")
    )
    out = df.join(drop_refs, id_col, "left")
    segs = F.col(segments_col)
    dropc = F.coalesce(F.col("_drop"), F.array().cast("array<string>"))
    kept = F.filter(
        segs,
        lambda s: (s["type"] != "media")
        | ~F.array_contains(dropc, s["media_ref"]),
    )
    out = out.withColumn("_kept_segs", kept).withColumn(
        "n_media_dropped", (F.size(segs) - F.size(kept)).cast("int")
    )
    pseudo = F.transform(
        F.col("_kept_segs"),
        lambda s, i: F.struct(
            F.when(s["type"] == "media", F.lit("media"))
            .otherwise(F.lit("main"))
            .alias("kind"),
            s["text"].alias("text"),
            F.coalesce(s["media_ref"], F.lit("")).alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    out = out.withColumn("_pseudo", pseudo)
    out = interleaved_segments(
        out, spans_col="_pseudo", out_col=segments_col, joiner=joiner
    )
    return out.drop("_drop", "_kept_segs", "_pseudo")


def drop_low_quality_media(
    df: DataFrame,
    features_df: DataFrame,
    min_width: int = 64,
    min_height: int = 64,
    max_aspect: float = 4.0,
    id_col: str = "doc_id",
    segments_col: str = "segments",
    joiner: str = "\n\n",
) -> DataFrame:
    """LAION/DataComp-style image quality gate over interleaved docs:
    media that failed to decode, fall below the minimum dimensions, or
    exceed the aspect-ratio bound (both orientations) drop from every
    document's segment sequence, text re-merging around removals.
    ``features_df`` is :func:`~.multimodal.extract_media_features`
    output (``doc_id, media_ref, width, height, decode_error``) —
    non-image rows with NULL dimensions but no decode error pass.

    Plan: the bad set is a filter over the (already-computed) feature
    table; everything else is the shared hot-subset-sized rewrite."""
    w, h = F.col("width"), F.col("height")
    aspect_bad = (
        w.isNotNull()
        & h.isNotNull()
        & (h > 0)
        & (
            (w / h > float(max_aspect))
            | (h / w > float(max_aspect))
        )
    )
    dims_bad = (
        w.isNotNull() & h.isNotNull()
        & ((w < int(min_width)) | (h < int(min_height)))
    )
    bad = features_df.filter(
        F.col("decode_error").isNotNull() | dims_bad | aspect_bad
    ).select(id_col, "media_ref")
    return _drop_and_remerge(
        df, bad, id_col=id_col, segments_col=segments_col, joiner=joiner
    )


def drop_frequent_media(
    df: DataFrame,
    media_keys: DataFrame,
    max_occurrences: int = 10,
    id_col: str = "doc_id",
    segments_col: str = "segments",
    joiner: str = "\n\n",
) -> DataFrame:
    """OBELICS-style frequent-image removal: media whose corpus-wide
    occurrence count exceeds ``max_occurrences`` (logos, banners,
    tracking pixels — the repeated images of a web crawl) are dropped
    from every document's segment sequence, and text segments left
    adjacent by a removal re-merge so the output satisfies the same
    invariant as :func:`interleaved_segments` (no two consecutive text
    segments).  Adds ``n_media_dropped`` per document.

    ``media_keys`` maps each media segment to its cross-document
    identity: ``(doc_id, media_ref, key)`` where ``key`` is typically
    the payload digest from the media store / WARC sidecar index
    (``media_ref`` alone is only unique within a document).

    Plan: one aggregate on ``key`` finds the hot set (tiny — it IS the
    frequent tail); only documents carrying hot media enter the
    per-doc drop-list aggregate and the corpus join, so at 100 TB the
    corpus-wide shuffle is the key-count aggregate and everything else
    is hot-subset-sized."""
    counts = media_keys.groupBy("key").agg(
        F.count(F.lit(1)).alias("_n")
    )
    hot = counts.filter(F.col("_n") > max_occurrences).select("key")
    bad = media_keys.join(hot, "key", "left_semi").select(
        id_col, "media_ref"
    )
    return _drop_and_remerge(
        df, bad, id_col=id_col, segments_col=segments_col, joiner=joiner
    )


def interleaved_token_counts(
    df: DataFrame,
    segments_col: str = "segments",
    tokens_per_image: int = 576,
) -> DataFrame:
    """The token cost model multimodal training budgets by: whitespace
    text tokens plus a fixed per-media patch budget (default 576 — a
    ViT-L/14 image at 336px; audio/video segments are costed the same
    flat rate, callers override for their encoder).  Adds
    ``text_tokens`` / ``media_tokens`` / ``total_tokens`` as narrow JVM
    expressions — zero exchange, zero Python."""
    segs = F.col(segments_col)
    text_tokens = F.aggregate(
        F.transform(
            F.filter(segs, lambda s: s["type"] == "text"),
            lambda s: F.size(
                F.filter(F.split(s["text"], r"\s+"), lambda x: x != "")
            ).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    n_media = F.size(F.filter(segs, lambda s: s["type"] == "media"))
    return (
        df.withColumn("text_tokens", text_tokens)
        .withColumn(
            "media_tokens",
            (n_media * F.lit(tokens_per_image)).cast("long"),
        )
        .withColumn(
            "total_tokens", F.col("text_tokens") + F.col("media_tokens")
        )
    )


def pack_interleaved(
    df: DataFrame,
    budget_tokens: int = 1_000_000,
    id_col: str = "doc_id",
    segments_col: str = "segments",
    tokens_per_image: int = 576,
    num_ranges: int = 32,
    checkpoint: bool = True,
) -> DataFrame:
    """``sampling.pack_shards`` twin for interleaved documents: assign
    each doc a ``shard`` so consecutive docs (in global id order) fill
    ~``budget_tokens`` of MULTIMODAL cost — text tokens plus the
    per-media patch budget — per training file.  Same two-phase
    parallel prefix sum (no single-task stage; see
    ``sampling.exclusive_prefix_sum``)."""
    from .sampling import exclusive_prefix_sum

    t = interleaved_token_counts(
        df, segments_col=segments_col, tokens_per_image=tokens_per_image
    ).select(id_col, "text_tokens", "media_tokens", "total_tokens")
    t = exclusive_prefix_sum(t, id_col, "total_tokens", num_ranges, checkpoint)
    return t.select(
        id_col,
        "text_tokens",
        "media_tokens",
        "total_tokens",
        F.floor(F.col("_prev_cum") / F.lit(budget_tokens))
        .cast("int")
        .alias("shard"),
    )


def interleaved_filter(
    df: DataFrame,
    segments_col: str = "segments",
    max_images: int = 30,
    max_media_frac: float = 0.5,
    max_media_run: int = 8,
    min_text_chars: int = 1,
    max_dup_media_refs: int = 2,
) -> DataFrame:
    """Doc-level keep/drop flags in the style of the published
    interleaved-corpus filters (MMC4 caps images per document and drops
    image-free/text-free docs; OBELICS removes image-dominated and
    repeated-image spam pages).  Adds one boolean per rule plus
    ``il_keep`` (AND of all); callers drop or route on it.  Pure
    column logic over :func:`interleaved_stats` — still zero exchange."""
    out = interleaved_stats(df, segments_col=segments_col)
    rules = {
        "il_images_ok": F.col("n_media_segments") <= max_images,
        "il_media_frac_ok": F.col("media_frac") <= max_media_frac,
        "il_media_run_ok": F.col("max_media_run") <= max_media_run,
        "il_text_ok": F.col("text_chars") >= min_text_chars,
        "il_dup_media_ok": F.col("dup_media_refs") <= max_dup_media_refs,
    }
    keep = F.lit(True)
    for name, cond in rules.items():
        out = out.withColumn(name, cond)
        keep = keep & cond
    return out.withColumn("il_keep", keep)


#: URN scheme the WARC resource sidecar keys media blobs by (matches
#: sources/warcsink.write_warc_resources); doc_ids must not contain "/"
MEDIA_URN_PREFIX = "urn:mrc:media/"

SEGMENTS_DDL = (
    "doc_id string, segments array<struct"
    "<type:string,text:string,media_ref:string>>"
)


def media_urn(doc: Column, ref: Column) -> Column:
    return F.concat(F.lit(MEDIA_URN_PREFIX), doc, F.lit("/"), ref)


def read_interleaved_shards(spark, path_glob: str) -> DataFrame:
    """Load exported interleaved shards back to ``(doc_id, segments)``.

    The parse is JVM-native end to end: ``spark.read.json`` handles the
    ``.gz`` extension and the schema projection, so the loader path has
    zero Python.  Text segments come back with ``media_ref`` NULL
    (``to_json`` drops null fields on write) — byte-identical semantics
    to the pre-export frame.  Each shard file is one input split (gzip
    is not splittable), which matches the shard-per-loader-worker
    consumption pattern the export exists for."""
    return spark.read.schema(SEGMENTS_DDL).json(path_glob)


def resolve_media_segments(
    spark,
    seg_df: DataFrame,
    index_df: DataFrame,
    archive_dir: str,
    segments_col: str = "segments",
) -> DataFrame:
    """The loader's media path: every media segment's ``(doc_id,
    media_ref)`` → payload bytes, range-read out of the WARC resource
    sidecar via its CDX index.  Returns ``(doc_id, media_ref,
    content_type, content, error)`` — error rows (ref missing from the
    index, or an indexed payload that failed to fetch/verify) come back
    explicitly instead of dropping silently.

    Storage-deduplicated archives (``write_warc_resources(dedup=True)``)
    resolve by construction: requested refs map to payloads by DIGEST,
    so a revisit capture and its concrete original land on the same
    fetched bytes, and the digest join doubles as an integrity check
    (bytes that do not hash to the indexed digest never attach).

    Plan: the index side is ~0.1% of archive bytes; spans fetch one
    task per archive file in offset order (ranged GETs on object
    storage); each distinct payload is read and hashed ONCE however
    many refs share it; the segments frame itself never reshuffles."""
    from ..sources.warc import read_captures

    refs = (
        seg_df.select(
            "doc_id", F.explode(media_refs(segments_col)).alias("media_ref")
        )
        .distinct()
    )
    idx = index_df.select("url", "mime", "digest", "filename", "offset", "length")
    wanted = refs.join(
        idx.select("url", "digest"),
        media_urn(F.col("doc_id"), F.col("media_ref")) == F.col("url"),
        "left",
    ).select("doc_id", "media_ref", "digest")

    # fetch each needed digest once, from a concrete (non-revisit)
    # capture — left_semi prunes to the requested subset, so loading
    # 1% of the corpus reads 1% of the archive spans
    spans = (
        idx.filter(F.col("mime") != "warc/revisit")
        .join(
            wanted.select("digest").distinct(), "digest", "left_semi"
        )
        .select("filename", "offset", "length")
        .distinct()
    )
    fetched = read_captures(spark, spans, archive_dir)
    payloads = (
        fetched.filter(F.col("error").isNull() & F.col("content").isNotNull())
        .select(
            F.concat(F.lit("sha256:"), F.sha2("content", 256)).alias("digest"),
            "content_type",
            "content",
        )
        .dropDuplicates(["digest"])
    )
    out = wanted.join(payloads, "digest", "left")
    return out.select(
        "doc_id",
        "media_ref",
        "content_type",
        "content",
        F.when(F.col("digest").isNull(), "not in sidecar index")
        .when(F.col("content").isNull(), "indexed payload not fetched")
        .alias("error"),
    )


#: sniffed content-type → WebDataset member extension (anything else
#: ships as .bin; loaders key decode on the extension)
_WDS_EXT = {
    "image/png": "png",
    "image/jpeg": "jpg",
    "image/gif": "gif",
    "image/bmp": "bmp",
    "image/tiff": "tif",
    "audio/x-wav": "wav",
    "audio/wav": "wav",
    "video/x-msvideo": "avi",
}


def write_interleaved_webdataset(
    df: DataFrame,
    media_df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    segments_col: str = "segments",
) -> DataFrame:
    """Interleaved docs + their media bytes → WebDataset tar shards:
    per document one ``{key}.json`` member (the ordered segment
    sequence, doc_id inside) followed by ``{key}.{j}.{ext}`` members —
    the j-th media segment's bytes under the j-th suffix — which is the
    sample-group layout multimodal training loaders consume (members
    sharing a key prefix form one sample; on-disk order IS consumption
    order).  ``media_df`` needs ``(doc_id, media_ref, content)``; the
    member extension comes from the magic-byte sniffer so it describes
    the bytes.  A ref with no media row ships as a 0-byte ``.missing``
    member — visible to the loader, never silently dropped.

    Distributed shape: the per-doc blob list is ONE aggregate keyed by
    doc (memory bounded by one document's media), the join to segments
    is key-partitioned, and the tar write is the deterministic
    one-task-per-shard streaming kernel shared with the text
    WebDataset sink (md5 training order, mtime=0, task-attempt temp +
    atomic rename, shared-filesystem requirement as documented on
    ``sampling.write_webdataset_shards``)."""
    import os

    import pandas as pd

    from ..operators.mimetype import sniff_mime
    from .sampling import training_order

    media = sniff_mime(
        media_df.select(id_col, "media_ref", "content"),
        "content",
        out_col="_ct",
    )
    ext_map = F.create_map(
        *[F.lit(x) for kv in _WDS_EXT.items() for x in kv]
    )
    media = media.select(
        id_col,
        "media_ref",
        "content",
        F.coalesce(ext_map[F.col("_ct")], F.lit("bin")).alias("ext"),
    )
    refs = df.select(
        F.col(id_col),
        F.posexplode(media_refs(segments_col)).alias("j", "media_ref"),
    )
    blobs = (
        refs.join(media, [id_col, "media_ref"], "left")
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("j").cast("int").alias("j"),
                        F.coalesce("ext", F.lit("missing")).alias("ext"),
                        F.col("content").alias("content"),
                    )
                )
            ).alias("blobs")
        )
    )
    payload = df.select(
        F.col(id_col),
        F.to_json(
            F.struct(F.col(id_col), F.col(segments_col).alias("segments"))
        ).alias("il_line"),
    ).join(blobs, id_col, "left")
    ordered = training_order(payload, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_docs long, n_media long, n_bytes long, path string"

    def kernel(batches):
        import io
        import tarfile

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        state = {}  # shard -> [tar, fileobj, n_docs, n_media, final, tmp]

        def tar_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.tar")
                tmp = f"{p}.attempt-{attempt}"
                f = open(tmp, "wb")
                state[shard] = [
                    tarfile.open(fileobj=f, mode="w"), f, 0, 0, p, tmp,
                ]
            return state[shard]

        def add(tf, name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0  # deterministic bytes
            tf.addfile(info, io.BytesIO(data))

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = tar_for(int(row.shard))
                # globally-unique sample key: shard + in-shard position
                key = f"{int(row.shard):05d}-{int(row.position):09d}"
                add(entry[0], f"{key}.json", row.il_line.encode("utf-8"))
                entry[2] += 1
                for b in row.blobs if row.blobs is not None else []:
                    data = (
                        bytes(b["content"])
                        if b["content"] is not None
                        else b""
                    )
                    add(entry[0], f"{key}.{int(b['j'])}.{b['ext']}", data)
                    entry[3] += 1
        rows = []
        for shard, (tf, f, nd, nm, p, tmp) in sorted(state.items()):
            tf.close()
            f.close()
            os.replace(tmp, p)
            rows.append((shard, nd, nm, os.path.getsize(p), p))
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_media", "n_bytes", "path"]
        )

    return (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select("il_line", "blobs", "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )


def write_pair_webdataset(
    pairs: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "pair_id",
    caption_col: str = "caption",
    content_col: str = "content",
) -> DataFrame:
    """CLIP-style (media, caption) training export in the img2dataset
    sample layout: per pair one ``{key}.<ext>`` member (the raw bytes,
    extension from the magic-byte sniffer), ``{key}.txt`` (the
    caption), and ``{key}.json`` (pair metadata: every other column of
    ``pairs``) — the tar shape image-text trainers stream.  Keys are
    shard-prefixed positions (globally unique); same determinism
    contract as the other tar sinks (md5 training order, mtime=0,
    atomic rename, shared-filesystem requirement)."""
    import os

    import pandas as pd

    from ..operators.mimetype import sniff_mime
    from .sampling import training_order

    ext_map = F.create_map(
        *[F.lit(x) for kv in _WDS_EXT.items() for x in kv]
    )
    meta_cols = [
        c
        for c in pairs.columns
        if c not in (id_col, caption_col, content_col)
    ]
    sel = sniff_mime(pairs, content_col, out_col="_ct").select(
        F.col(id_col),
        F.coalesce(F.col(caption_col), F.lit("")).alias("cap"),
        F.col(content_col).alias("blob"),
        F.coalesce(ext_map[F.col("_ct")], F.lit("bin")).alias("ext"),
        F.to_json(F.struct(*[F.col(c) for c in meta_cols])).alias(
            "meta"
        ),
    )
    ordered = training_order(sel, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_pairs long, n_bytes long, path string"

    def kernel(batches):
        import io
        import tarfile

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        state = {}

        def tar_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.tar")
                tmp = f"{p}.attempt-{attempt}"
                f = open(tmp, "wb")
                state[shard] = [
                    tarfile.open(fileobj=f, mode="w"), f, 0, p, tmp,
                ]
            return state[shard]

        def add(tf, name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name=name)
            info.size = len(data)
            info.mtime = 0
            tf.addfile(info, io.BytesIO(data))

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = tar_for(int(row.shard))
                key = f"{int(row.shard):05d}-{int(row.position):09d}"
                add(
                    entry[0],
                    f"{key}.{row.ext}",
                    bytes(row.blob) if row.blob is not None else b"",
                )
                add(entry[0], f"{key}.txt", row.cap.encode("utf-8"))
                add(entry[0], f"{key}.json", row.meta.encode("utf-8"))
                entry[2] += 1
        rows = []
        for shard, (tf, f, n, p, tmp) in sorted(state.items()):
            tf.close()
            f.close()
            os.replace(tmp, p)
            rows.append((shard, n, os.path.getsize(p), p))
        yield pd.DataFrame(
            rows, columns=["shard", "n_pairs", "n_bytes", "path"]
        )

    return (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select("cap", "blob", "ext", "meta", "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )


def write_interleaved_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 16,
    id_col: str = "doc_id",
    segments_col: str = "segments",
) -> DataFrame:
    """Export ``(doc_id, segments)`` as gzipped-JSONL shards — one JSON
    object per document holding the ordered segment sequence, the
    published interchange shape of interleaved multimodal corpora.
    Media segments carry ``media_ref`` only; the bytes live in the
    (revisit-deduplicated) WARC resource sidecar and resolve via its
    CDXJ index.

    The JSON line is serialized JVM-SIDE (``to_json``), so the Python
    kernel only streams finished bytes; shard assignment/order is the
    md5-deterministic ``training_order`` and shard bytes are
    reproducible run-to-run (gzip mtime=0, no FNAME, atomic rename) —
    the same determinism contract as ``write_jsonl_shards``."""
    import os

    import pandas as pd

    from .sampling import training_order

    payload = df.select(
        F.col(id_col),
        F.to_json(
            F.struct(F.col(id_col), F.col(segments_col).alias("segments"))
        ).alias("il_line"),
    )
    ordered = training_order(payload, n_shards=n_shards, id_col=id_col)
    os.makedirs(path, exist_ok=True)
    schema = "shard int, n_docs long, n_bytes long, path string"

    def kernel(batches):
        import gzip

        from pyspark import TaskContext

        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx else os.getpid()
        os.makedirs(path, exist_ok=True)
        state = {}  # shard -> [gz, count, final, tmp, raw]

        def gz_for(shard: int):
            if shard not in state:
                p = os.path.join(path, f"shard-{shard:05d}.jsonl.gz")
                tmp = f"{p}.attempt-{attempt}"
                raw = open(tmp, "wb")
                f = gzip.GzipFile(
                    filename="", fileobj=raw, mode="wb", mtime=0
                )
                state[shard] = [f, 0, p, tmp, raw]
            return state[shard]

        for batch in batches:
            for row in batch.itertuples(index=False):
                entry = gz_for(int(row.shard))
                entry[0].write(row.il_line.encode("utf-8") + b"\n")
                entry[1] += 1
        rows = []
        for shard, (f, count, p, tmp, raw) in sorted(state.items()):
            f.close()
            raw.close()
            os.replace(tmp, p)
            rows.append((shard, count, os.path.getsize(p), p))
        yield pd.DataFrame(
            rows, columns=["shard", "n_docs", "n_bytes", "path"]
        )

    return (
        ordered.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "position")
        .select(F.col("il_line"), "shard", "position")
        .mapInPandas(kernel, schema=schema)
    )
