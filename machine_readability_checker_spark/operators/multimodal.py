"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata, processed by Arrow-batched ``mapInPandas`` kernels.

Every modality now has a REAL decode path, all dependency-free:

- **PNG** (``core/png.py``: chunk parse + zlib inflate + all five
  scanline filters; 8-bit gray/RGB/RGBA/gray-alpha/palette),
  golden-pixel tested.
- **JPEG** (``core/jpeg.py``: baseline T.81 — Huffman entropy decode,
  IDCT, chroma upsampling), cross-validated both directions against
  the JVM's ``javax.imageio``.
- **WAV** audio (``core/wav.py``: RIFF PCM, 8/16/24/32-bit).
- **AVI/MJPEG** video (``core/avi.py``: RIFF walk → JPEG frames).
- The deterministic **fake** image/video containers the older fixtures
  use remain accepted.

Anything else decodes to an error row (quarantine semantics, mirroring
the extraction kernel's parse_error lane).
"""

from __future__ import annotations

import struct
from typing import Iterator, NamedTuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..core.png import PNG_SIG, decode_png, encode_png

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), False),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)

FAKE_MAGIC = b"FAKEIMG"


def encode_fake_image(width: int, height: int, payload: bytes) -> bytes:
    return FAKE_MAGIC + struct.pack("<HH", width, height) + payload


class DecodedImage(NamedTuple):
    container: str  # "png" | "jpeg" | "gif" | "bmp" | "tiff" | "webp" | "fake"
    width: int
    height: int
    channels: int
    pixels: bytes  # row-major, channels interleaved, 8-bit


def decode_image(content: bytes) -> DecodedImage:
    """Decode one still-image blob, dispatching on container magic.
    Raises ``ValueError`` for unknown/corrupt bytes — the kernels turn
    that into a quarantine row."""
    if content.startswith(PNG_SIG):
        w, h, ch, px = decode_png(content)
        return DecodedImage("png", w, h, ch, px)
    if content.startswith(b"\xff\xd8\xff"):
        from ..core.jpeg import decode_jpeg

        w, h, ch, px = decode_jpeg(content)
        return DecodedImage("jpeg", w, h, ch, px)
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from ..core.gif import decode_gif

        w, h, ch, px, _meta = decode_gif(content)
        return DecodedImage("gif", w, h, ch, px)
    if content.startswith(b"BM"):
        from ..core.bmp import decode_bmp

        w, h, ch, px = decode_bmp(content)
        return DecodedImage("bmp", w, h, ch, px)
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        from ..core.tiff import decode_tiff

        w, h, ch, px = decode_tiff(content)
        return DecodedImage("tiff", w, h, ch, px)
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from ..core.webp import decode_webp

        w, h, ch, px = decode_webp(content)
        return DecodedImage("webp", w, h, ch, px)
    if content.startswith(FAKE_MAGIC):
        w, h = struct.unpack_from("<HH", content, len(FAKE_MAGIC))
        return DecodedImage(
            "fake", w, h, 1, bytes(content[len(FAKE_MAGIC) + 4 :])
        )
    raise ValueError("unknown media container")


def encode_image(img: DecodedImage) -> bytes:
    """Re-encode into the blob's original container (resize output keeps
    the input format)."""
    if img.container == "png":
        return encode_png(img.width, img.height, img.channels, img.pixels)
    if img.container == "jpeg":
        from ..core.jpeg import encode_jpeg

        if img.channels not in (1, 3):
            raise ValueError("jpeg container is gray or RGB")
        return encode_jpeg(img.width, img.height, img.channels, img.pixels)
    if img.container == "gif":
        from ..core.gif import encode_gif

        return encode_gif(img.width, img.height, img.channels, img.pixels)
    if img.container == "bmp":
        from ..core.bmp import encode_bmp

        return encode_bmp(img.width, img.height, img.channels, img.pixels)
    if img.container == "tiff":
        from ..core.tiff import encode_tiff

        return encode_tiff(
            img.width, img.height, img.channels, img.pixels,
            compression="lzw",
        )
    if img.container == "webp":
        from ..core.webp import encode_webp_lossless

        if img.channels not in (3, 4):
            raise ValueError("webp container is RGB or RGBA")
        return encode_webp_lossless(
            img.width, img.height, img.channels, img.pixels,
            use_rle=True,
        )
    if img.container == "fake":
        if img.channels != 1:
            raise ValueError("fake container is single-channel")
        return encode_fake_image(img.width, img.height, img.pixels)
    raise ValueError(f"unknown container {img.container}")


def decode_backend(content: bytes):
    """Back-compat 3-tuple view: (width, height, pixel bytes)."""
    d = decode_image(content)
    return d.width, d.height, d.pixels


def _features_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for batch in batches:
        out = {
            "doc_id": [], "media_ref": [], "width": [], "height": [],
            "channels": [], "n_bytes": [], "mean_byte": [],
            "decode_error": [],
        }
        for row in batch.itertuples(index=False):
            content = bytes(row.content)
            out["doc_id"].append(row.doc_id)
            out["media_ref"].append(row.media_ref)
            out["n_bytes"].append(len(content))
            try:
                img = decode_image(content)
                out["width"].append(img.width)
                out["height"].append(img.height)
                out["channels"].append(img.channels)
                out["mean_byte"].append(
                    float(sum(img.pixels)) / len(img.pixels)
                    if img.pixels
                    else 0.0
                )
                out["decode_error"].append(None)
            except Exception as e:
                out["width"].append(None)
                out["height"].append(None)
                out["channels"].append(None)
                out["mean_byte"].append(None)
                out["decode_error"].append(str(e))
        yield pd.DataFrame(out)


def extract_media_features(media_df: DataFrame) -> DataFrame:
    """media table → per-blob feature rows (Arrow-batched; decode errors
    become quarantine rows, never task failures)."""
    return media_df.mapInPandas(_features_kernel, schema=MEDIA_FEATURES_SCHEMA)


def media_from_spans(spans_df: DataFrame, media_store: DataFrame) -> DataFrame:
    """Join media spans of the canonical (doc_id, spans) table back to
    their blobs: explode → filter kind='media' → broadcast-free equi-join
    on (doc_id, media_ref)."""
    refs = (
        spans_df.select("doc_id", F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select("doc_id", F.col("s.media_ref").alias("media_ref"))
    )
    return refs.join(media_store, ["doc_id", "media_ref"])


FAKE_VIDEO_MAGIC = b"FAKEVID"


def encode_fake_video(frames: list[bytes]) -> bytes:
    """Fake video container: magic + frame count + length-prefixed frames
    (each frame is a fake-image blob)."""
    out = [FAKE_VIDEO_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def decode_video_frames(content: bytes) -> list:
    """Per-frame bytes from a video blob: real AVI/MJPEG (RIFF walk →
    JPEG frames, each decodable by ``decode_image``), animated GIF
    (disposal-composited canvases re-encoded as lossless BMP so each
    frame flows through the image feature kernel like any other blob),
    or the legacy fake length-prefixed container."""
    if content.startswith(b"RIFF") and content[8:12] == b"AVI ":
        from ..core.avi import decode_avi

        return decode_avi(content).frames
    if content[:6] in (b"GIF87a", b"GIF89a"):
        from ..core.bmp import encode_bmp
        from ..core.gif import decode_gif_frames

        sw, sh, canvases, _metas = decode_gif_frames(content)
        return [encode_bmp(sw, sh, 3, c) for c in canvases]
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        # multi-page scanned TIFF: one frame per page, re-encoded as
        # lossless BMP so each flows through the image kernels
        from ..core.bmp import encode_bmp
        from ..core.tiff import decode_tiff_pages

        frames = []
        for w, h, ch, px in decode_tiff_pages(content):
            if ch == 1:
                px = bytes(
                    b for v in px for b in (v, v, v)
                )
            frames.append(encode_bmp(w, h, 3, px))
        return frames
    return _decode_fake_frames(content)


def _decode_fake_frames(content: bytes) -> list:
    """Decode ALL frames up front, validating every length prefix — a
    truncated container must yield one quarantine row, never a mix of
    'good' frame rows and an error row for the same blob (the either-or
    contract of the other media kernels), and a lying length prefix must
    not silently produce short frame bytes."""
    if not content.startswith(FAKE_VIDEO_MAGIC):
        raise ValueError("unknown video container")
    off = len(FAKE_VIDEO_MAGIC)
    (n,) = struct.unpack_from("<I", content, off)
    off += 4
    frames = []
    for i in range(n):
        if off + 4 > len(content):
            raise ValueError(f"truncated container at frame {i}")
        (ln,) = struct.unpack_from("<I", content, off)
        off += 4
        if off + ln > len(content):
            raise ValueError(f"frame {i} length {ln} exceeds container")
        frames.append(content[off : off + ln])
        off += ln
    return frames


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def _resize_pixels(img: DecodedImage, tw: int, th: int) -> bytes:
    """Nearest-neighbor resample of a row-major interleaved image, any
    channel count.  NN is the format-preserving baseline (a production
    build swaps in an area/Lanczos numpy kernel); the distributed
    contract — binary in → binary out, bounded Arrow batches — is
    identical."""
    w, h, ch, px = img.width, img.height, img.channels, img.pixels
    if w <= 0 or h <= 0 or len(px) < w * h * ch:
        raise ValueError("payload does not match dimensions")
    rows = []
    for ty in range(th):
        sy = ty * h // th
        base = sy * w * ch
        row = bytearray(tw * ch)
        for tx in range(tw):
            sx = tx * w // tw
            row[tx * ch : (tx + 1) * ch] = px[
                base + sx * ch : base + (sx + 1) * ch
            ]
        rows.append(bytes(row))
    return b"".join(rows)


def resize_images(media_df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Image resize as an Arrow-batched kernel: decode → resample →
    re-encode; bad blobs become quarantine rows (decode_error set)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": [], "media_ref": [], "width": [], "height": [],
                "content": [], "decode_error": [],
            }
            for row in batch.itertuples(index=False):
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                try:
                    img = decode_image(bytes(row.content))
                    resized = DecodedImage(
                        img.container,
                        target_w,
                        target_h,
                        img.channels,
                        _resize_pixels(img, target_w, target_h),
                    )
                    out["width"].append(target_w)
                    out["height"].append(target_h)
                    out["content"].append(encode_image(resized))
                    out["decode_error"].append(None)
                except Exception as e:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["content"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema=RESIZED_SCHEMA)


def apply_orientation(img: DecodedImage, orientation: int) -> DecodedImage:
    """Apply an EXIF orientation tag (TIFF 6.0 / EXIF 2.3 values 1–8)
    to decoded pixels — the transform a correct decode pipeline must
    honor before any geometry-sensitive op (resize, dHash, feature
    extraction).  Exact numpy views, no resampling:

      1 identity · 2 mirror-H · 3 rotate 180 · 4 mirror-V ·
      5 transpose · 6 rotate 90 CW · 7 transverse · 8 rotate 90 CCW
    """
    import numpy as np

    if orientation in (None, 0, 1):
        return img
    if orientation not in range(2, 9):
        raise ValueError(f"bad EXIF orientation {orientation}")
    a = np.frombuffer(img.pixels, dtype=np.uint8)
    if len(a) != img.width * img.height * img.channels:
        raise ValueError("payload does not match dimensions")
    a = a.reshape(img.height, img.width, img.channels)
    if orientation == 2:
        a = a[:, ::-1]
    elif orientation == 3:
        a = a[::-1, ::-1]
    elif orientation == 4:
        a = a[::-1]
    elif orientation == 5:
        a = a.transpose(1, 0, 2)
    elif orientation == 6:
        a = np.rot90(a, k=-1)
    elif orientation == 7:
        a = a[::-1, ::-1].transpose(1, 0, 2)
    else:  # 8
        a = np.rot90(a, k=1)
    h2, w2 = a.shape[0], a.shape[1]
    return DecodedImage(
        img.container, w2, h2, img.channels, np.ascontiguousarray(a).tobytes()
    )


ORIENTED_FIELDS = [
    T.StructField("orientation", T.IntegerType(), True),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("content", T.BinaryType(), True),
    T.StructField("decode_error", T.StringType(), True),
]


def auto_orient_images(media_df: DataFrame) -> DataFrame:
    """Normalize every JPEG to upright pixels: read the EXIF
    orientation tag, apply its transform, re-encode, and scrub the
    metadata (the oriented bytes carry no stale tag a downstream
    consumer could double-apply).  Non-JPEG containers and tag-1/-less
    JPEGs pass through byte-identical with ``orientation`` null/1.
    Arrow-batched narrow map; malformed blobs quarantine.  Note the
    re-encode is lossy for JPEG (like every auto-orient that does not
    do lossless DCT-domain rotation) — geometry is exact, samples are
    within codec tolerance."""
    from ..core.exif import parse_exif, strip_jpeg_metadata

    in_fields = {f.name: f for f in media_df.schema.fields}
    out_schema = T.StructType(
        [in_fields["doc_id"], in_fields["media_ref"]] + ORIENTED_FIELDS
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": [], "media_ref": [], "orientation": [],
                "width": [], "height": [], "content": [],
                "decode_error": [],
            }
            for row in batch.itertuples(index=False):
                content = bytes(row.content)
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                try:
                    ori = None
                    if content.startswith(b"\xff\xd8"):
                        meta = parse_exif(content)
                        ori = meta["orientation"] if meta else None
                    if ori in (None, 0, 1):
                        img = decode_image(content)
                        out["orientation"].append(ori)
                        out["width"].append(img.width)
                        out["height"].append(img.height)
                        out["content"].append(content)
                    else:
                        img = apply_orientation(
                            decode_image(content), ori
                        )
                        out["orientation"].append(ori)
                        out["width"].append(img.width)
                        out["height"].append(img.height)
                        out["content"].append(
                            strip_jpeg_metadata(encode_image(img))
                        )
                    out["decode_error"].append(None)
                except Exception as e:
                    out["orientation"].append(None)
                    out["width"].append(None)
                    out["height"].append(None)
                    out["content"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.select(
        "doc_id", "media_ref", "content"
    ).mapInPandas(kernel, schema=out_schema)


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("frame_idx", T.IntegerType(), True),
        T.StructField("content", T.BinaryType(), True),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def sample_frames(media_df: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling as a flat-mapping Arrow kernel: one input blob
    → every k-th frame as its own row (table-generating, like explode but
    over binary containers).  Decode failures yield one quarantine row."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {
                "doc_id": [], "media_ref": [], "frame_idx": [],
                "content": [], "decode_error": [],
            }
            for row in batch.itertuples(index=False):
                try:
                    frames = decode_video_frames(bytes(row.content))
                    for i, frame in enumerate(frames):
                        if i % every_k:
                            continue
                        out["doc_id"].append(row.doc_id)
                        out["media_ref"].append(row.media_ref)
                        out["frame_idx"].append(i)
                        out["content"].append(frame)
                        out["decode_error"].append(None)
                except Exception as e:
                    out["doc_id"].append(row.doc_id)
                    out["media_ref"].append(row.media_ref)
                    out["frame_idx"].append(None)
                    out["content"].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema=FRAMES_SCHEMA)


def media_context_pairs(
    docs: DataFrame,
    window: int = 3,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """LAION-style image–text candidate mining over interleaved documents
    (``(doc_id, spans: array<struct<kind,text,media_ref,offset>>)``): for
    every media span, the concatenated text of up to ``window`` spans on
    each side plus the span's own text (alt text when the extractor
    captured one) — the (media_ref, caption-candidate) pairs a multimodal
    training pipeline joins against the media store.

    Pure JVM: posexplode + two windowed collect_list frames over
    (doc, offset); the only exchange is the per-document hash partition
    the window needs, and per-document state is bounded by the doc's own
    span count.  At 100 TB this runs as one pass over the spans table
    with no Python and no driver traffic."""
    from pyspark.sql import Window

    s = docs.select(F.col(id_col), F.posexplode(spans_col).alias("_i", "s")).select(
        id_col,
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.offset").alias("offset"),
    )
    w = Window.partitionBy(id_col).orderBy("offset")
    # context = any text-bearing span kind: the extraction lanes emit
    # title/heading/main/line/cell/... (never a literal 'text'), while
    # synthetic corpora may use 'text' — accept both (an == 'text' test
    # here once made every real-corpus context silently empty)
    from .interleave import TEXT_KINDS

    txt = F.when(
        F.col("kind").isin("text", *TEXT_KINDS)
        & (F.col("text") != ""),
        F.col("text"),
    )
    before = F.concat_ws(
        " ", F.collect_list(txt).over(w.rowsBetween(-window, -1))
    )
    after = F.concat_ws(
        " ", F.collect_list(txt).over(w.rowsBetween(1, window))
    )
    return (
        s.withColumn("context_before", before)
        .withColumn("context_after", after)
        .filter(F.col("kind") == "media")
        .select(
            id_col,
            "media_ref",
            "offset",
            F.col("text").alias("alt_text"),
            "context_before",
            "context_after",
        )
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("bits_per_sample", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("peak", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def extract_audio_features(media_df: DataFrame) -> DataFrame:
    """Real audio decode lane: WAV/RIFF PCM blobs → per-clip features
    (layout, duration, RMS loudness, absolute peak — silence/clipping
    screens for audio corpus curation).  Arrow-batched ``mapInPandas``
    with quarantine rows, same discipline as the image kernels."""
    from ..core.wav import decode_wav, samples_float

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for batch in batches:
            out = {k.name: [] for k in AUDIO_FEATURES_SCHEMA.fields}
            for row in batch.itertuples(index=False):
                content = bytes(row.content)
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                out["n_bytes"].append(len(content))
                try:
                    a = decode_wav(content)
                    x = samples_float(a)
                    out["sample_rate"].append(a.sample_rate)
                    out["channels"].append(a.channels)
                    out["bits_per_sample"].append(a.bits_per_sample)
                    out["n_frames"].append(a.n_frames)
                    out["duration_sec"].append(a.n_frames / a.sample_rate)
                    out["rms"].append(
                        float(np.sqrt(np.mean(np.square(x)))) if x.size else 0.0
                    )
                    out["peak"].append(
                        float(np.max(np.abs(x))) if x.size else 0.0
                    )
                    out["decode_error"].append(None)
                except Exception as e:
                    for k in (
                        "sample_rate", "channels", "bits_per_sample",
                        "n_frames", "duration_sec", "rms", "peak",
                    ):
                        out[k].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("media_ref", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("fps", T.DoubleType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("duration_sec", T.DoubleType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("decode_error", T.StringType(), True),
    ]
)


def extract_video_features(media_df: DataFrame) -> DataFrame:
    """Real video decode lane: AVI/MJPEG blobs → stream geometry, frame
    rate, duration.  The header claims are VERIFIED against the first
    frame (decoded through the JPEG codec) so a lying avih cannot pass
    as healthy.  Arrow-batched, quarantine rows on failure."""
    from ..core.avi import decode_avi

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = {k.name: [] for k in VIDEO_FEATURES_SCHEMA.fields}
            for row in batch.itertuples(index=False):
                content = bytes(row.content)
                out["doc_id"].append(row.doc_id)
                out["media_ref"].append(row.media_ref)
                out["n_bytes"].append(len(content))
                try:
                    v = decode_avi(content)
                    if v.frames:
                        img = decode_image(v.frames[0])
                        if (img.width, img.height) != (v.width, v.height):
                            raise ValueError(
                                "avih geometry disagrees with frame 0"
                            )
                    out["width"].append(v.width)
                    out["height"].append(v.height)
                    out["fps"].append(v.fps)
                    out["n_frames"].append(len(v.frames))
                    out["duration_sec"].append(v.duration_sec)
                    out["decode_error"].append(None)
                except Exception as e:
                    for k in ("width", "height", "fps", "n_frames",
                              "duration_sec"):
                        out[k].append(None)
                    out["decode_error"].append(str(e))
            yield pd.DataFrame(out)

    return media_df.mapInPandas(kernel, schema=VIDEO_FEATURES_SCHEMA)
