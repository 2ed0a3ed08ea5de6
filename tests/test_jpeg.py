"""Baseline JPEG codec: round-trip quality, zigzag/marker structure, and
— the part that keeps it honest — cross-validation of BOTH directions
against the JVM's ``javax.imageio`` through the SparkSession's py4j
gateway, so a shared spec misunderstanding between our encoder and our
decoder cannot cancel out."""

from __future__ import annotations

import numpy as np
import pytest

from machine_readability_checker_spark.core.jpeg import (
    decode_jpeg,
    encode_jpeg,
)


def _test_image(w: int = 48, h: int = 32) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    rgb = np.stack(
        [80 + c * 40 + 25 * np.sin(xx / 6) + 18 * np.cos(yy / 5) for c in range(3)],
        axis=-1,
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


def test_jpeg_roundtrip_gray_and_rgb():
    h, w = 24, 40
    gray = (np.add.outer(np.arange(h) * 3, np.arange(w) * 2) % 200).astype(
        np.uint8
    )
    W, H, C, px = decode_jpeg(encode_jpeg(w, h, 1, gray.tobytes(), quality=90))
    assert (W, H, C) == (w, h, 1)
    out = np.frombuffer(px, np.uint8).reshape(h, w)
    assert int(np.max(np.abs(out.astype(int) - gray.astype(int)))) <= 3

    rgb = _test_image()
    for sub in (False, True):
        blob = encode_jpeg(
            48, 32, 3, rgb.tobytes(), quality=90, subsample_420=sub
        )
        W, H, C, px = decode_jpeg(blob)
        assert (W, H, C) == (48, 32, 3)
        out = np.frombuffer(px, np.uint8).reshape(32, 48, 3)
        diff = out.astype(int) - rgb.astype(int)
        assert float(np.sqrt(np.mean(diff**2))) < 3.0  # smooth image, q90


def test_jpeg_non_multiple_of_8_and_solid_block():
    # 10x6: MCU padding must crop back exactly
    img = np.full((6, 10, 3), 77, dtype=np.uint8)
    W, H, C, px = decode_jpeg(encode_jpeg(10, 6, 3, img.tobytes(), quality=75))
    assert (W, H, C) == (10, 6, 3)
    out = np.frombuffer(px, np.uint8).reshape(6, 10, 3)
    # a solid color is DC-only: recovered within DC quantization rounding
    assert int(np.max(np.abs(out.astype(int) - 77))) <= 2


def test_jpeg_quality_knob_and_errors():
    rgb = _test_image()
    small = encode_jpeg(48, 32, 3, rgb.tobytes(), quality=20)
    big = encode_jpeg(48, 32, 3, rgb.tobytes(), quality=95)
    assert len(small) < len(big)
    for bad in [b"", b"\xff\xd8\xff\xe0junk", b"PNG not jpeg"]:
        with pytest.raises(ValueError):
            decode_jpeg(bad)
    # a baseline full-band scan header inside an SOF2 frame is
    # malformed progressive (DC scan must have Se=0) — refused, not
    # misparsed
    blob = bytearray(encode_jpeg(48, 32, 3, rgb.tobytes()))
    idx = blob.find(b"\xff\xc0")
    blob[idx + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))
    # genuinely unsupported SOFs still refuse by name
    blob[idx + 1] = 0xC3  # lossless sequential
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(blob))


def _imageio_decode(jvm, blob: bytes) -> np.ndarray:
    bais = jvm.java.io.ByteArrayInputStream(bytearray(blob))
    img = jvm.javax.imageio.ImageIO.read(bais)
    assert img is not None, "javax.imageio could not parse our bytes"
    w, h = img.getWidth(), img.getHeight()
    out = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            argb = img.getRGB(x, y)
            out[y, x] = [(argb >> 16) & 255, (argb >> 8) & 255, argb & 255]
    return out


def test_jpeg_cross_validates_against_javax_imageio(spark):
    """Independent-oracle test: (1) our encoder's bytes must decode
    under javax.imageio to pixels matching our own decoder within ±1
    (both sub-samplings); (2) a javax.imageio-WRITTEN jpeg (its own
    tables, its own subsampling choice) must decode here to within ±1
    of ImageIO's own reading of it."""
    jvm = spark._jvm
    rgb = _test_image(32, 24)

    for sub in (False, True):
        blob = encode_jpeg(
            32, 24, 3, rgb.tobytes(), quality=90, subsample_420=sub
        )
        ref = _imageio_decode(jvm, blob)
        W, H, C, px = decode_jpeg(blob)
        ours = np.frombuffer(px, np.uint8).reshape(H, W, 3)
        assert int(np.max(np.abs(ref.astype(int) - ours.astype(int)))) <= 1
        assert int(np.max(np.abs(ref.astype(int) - rgb.astype(int)))) <= 4

    img = jvm.java.awt.image.BufferedImage(32, 24, 1)  # TYPE_INT_RGB
    for y in range(24):
        for x in range(32):
            r, g, b = (int(v) for v in rgb[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    baos = jvm.java.io.ByteArrayOutputStream()
    assert jvm.javax.imageio.ImageIO.write(img, "jpg", baos)
    blob2 = bytes(baos.toByteArray())
    ref2 = _imageio_decode(jvm, blob2)
    W, H, C, px = decode_jpeg(blob2)
    ours2 = np.frombuffer(px, np.uint8).reshape(H, W, 3)
    assert int(np.max(np.abs(ours2.astype(int) - ref2.astype(int)))) <= 1


def test_progressive_decode_matches_baseline_bit_for_bit():
    """Spectral-selection progressive encode of the same pixels carries
    the SAME quantized coefficients as the baseline encode, so both
    must decode bit-identically — pins DC-scan interleaving, AC band
    scans, EOB handling and the coefficient-accumulate-then-render
    pipeline with zero tolerance."""
    rng = np.random.RandomState(7)
    for (w, h, ch) in [(16, 16, 3), (8, 8, 1), (23, 17, 3), (9, 31, 1)]:
        px = rng.randint(0, 256, size=(h, w, ch)).astype(np.uint8)
        base = encode_jpeg(w, h, ch, px.tobytes(), quality=80)
        prog = encode_jpeg(
            w, h, ch, px.tobytes(), quality=80, progressive=True
        )
        assert b"\xff\xc2" in prog and b"\xff\xc2" not in base
        assert decode_jpeg(prog) == decode_jpeg(base)
    with pytest.raises(ValueError):
        encode_jpeg(8, 8, 3, bytes(192), progressive=True,
                    subsample_420=True)


def test_progressive_cross_validates_against_javax_imageio(spark):
    """Successive approximation: javax.imageio's progressive writer
    emits the full multi-scan script (DC first+refine, AC first+refine,
    subsampled chroma) — our decoder must match ImageIO's own reading
    of those bytes within ±1.  Reverse direction: our SOF2 bytes must
    decode under ImageIO to our own pixels within ±1."""
    jvm = spark._jvm
    rgb = _test_image(32, 24)
    img = jvm.java.awt.image.BufferedImage(32, 24, 1)  # TYPE_INT_RGB
    for y in range(24):
        for x in range(32):
            r, g, b = (int(v) for v in rgb[y, x])
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
    writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName(
        "jpg"
    ).next()
    param = writer.getDefaultWriteParam()
    param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
    baos = jvm.java.io.ByteArrayOutputStream()
    ios = jvm.javax.imageio.ImageIO.createImageOutputStream(baos)
    writer.setOutput(ios)
    writer.write(None, jvm.javax.imageio.IIOImage(img, None, None), param)
    ios.flush()
    writer.dispose()
    blob = bytes(baos.toByteArray())
    assert b"\xff\xc2" in blob  # actually progressive
    ref = _imageio_decode(jvm, blob)
    W, H, C, px = decode_jpeg(blob)
    ours = np.frombuffer(px, np.uint8).reshape(H, W, 3)
    assert int(np.max(np.abs(ref.astype(int) - ours.astype(int)))) <= 1

    mine = encode_jpeg(32, 24, 3, rgb.tobytes(), quality=90,
                       progressive=True)
    ref2 = _imageio_decode(jvm, mine)
    W, H, C, px = decode_jpeg(mine)
    ours2 = np.frombuffer(px, np.uint8).reshape(H, W, 3)
    assert int(np.max(np.abs(ref2.astype(int) - ours2.astype(int)))) <= 1


def test_jpeg_flows_through_media_kernel(spark):
    from machine_readability_checker_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    rgb = _test_image(16, 16)
    rows = [
        (
            "d1",
            "img/a.jpg",
            "image",
            bytearray(encode_jpeg(16, 16, 3, rgb.tobytes())),
        ),
        ("d2", "img/bad.jpg", "image", bytearray(b"\xff\xd8\xffgarbage")),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    out = {r["media_ref"]: r for r in extract_media_features(df).collect()}
    a = out["img/a.jpg"]
    assert (a["width"], a["height"], a["channels"]) == (16, 16, 3)
    assert a["decode_error"] is None
    assert out["img/bad.jpg"]["decode_error"] is not None


# --- AVI / MJPEG video ---------------------------------------------------


def test_avi_mjpeg_roundtrip_and_frame_sampling(spark):
    """Real video: encode 6 JPEG frames into an AVI, decode the
    container, sample every 2nd frame through the Spark kernel, and
    decode a sampled frame back to pixels via the JPEG codec."""
    from machine_readability_checker_spark.core.avi import (
        decode_avi,
        encode_avi,
    )
    from machine_readability_checker_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image,
        extract_video_features,
        sample_frames,
    )

    frames = []
    for i in range(6):
        img = np.full((16, 16, 3), 40 * i, dtype=np.uint8)
        frames.append(encode_jpeg(16, 16, 3, img.tobytes(), quality=90))
    blob = encode_avi(16, 16, 10.0, frames)

    v = decode_avi(blob)
    assert (v.width, v.height, len(v.frames)) == (16, 16, 6)
    assert v.fps == pytest.approx(10.0)
    assert v.duration_sec == pytest.approx(0.6)
    assert v.frames == frames  # byte-exact through the container

    rows = [
        ("d1", "vid/a.avi", "video", bytearray(blob)),
        ("d2", "vid/bad.avi", "video", bytearray(b"RIFF\x10\x00\x00\x00AVI junk!!")),
    ]
    df = spark.createDataFrame(rows, schema=MEDIA_SCHEMA)
    feat = {r["media_ref"]: r for r in extract_video_features(df).collect()}
    a = feat["vid/a.avi"]
    assert (a["width"], a["height"], a["n_frames"]) == (16, 16, 6)
    assert a["fps"] == pytest.approx(10.0)
    assert feat["vid/bad.avi"]["decode_error"] is not None

    sampled = sample_frames(df.filter("doc_id = 'd1'"), every_k=2)
    got = sorted(
        (r["frame_idx"], bytes(r["content"])) for r in sampled.collect()
    )
    assert [i for i, _ in got] == [0, 2, 4]
    # a sampled frame is a real JPEG: decode to pixels
    img0 = decode_image(got[1][1])
    assert (img0.width, img0.height, img0.channels) == (16, 16, 3)
    px = np.frombuffer(img0.pixels, np.uint8)
    assert abs(int(px.mean()) - 80) <= 2  # frame 2 was solid 80


def test_avi_header_frame_mismatch_quarantines():
    """A lying avih (declared frames != movi chunks) must raise, and the
    video-features kernel must reject geometry that disagrees with the
    actual first frame."""
    import struct as _s

    from machine_readability_checker_spark.core.avi import (
        decode_avi,
        encode_avi,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    frames = [encode_jpeg(8, 8, 3, img.tobytes())]
    blob = bytearray(encode_avi(8, 8, 5.0, frames))
    # declared_frames lives 16 bytes into avih; avih body starts after
    # RIFF(12) + LIST hdr(8) + 'hdrl'(4) + 'avih'+size(8) = offset 32
    assert blob[24:28] == b"avih"
    _s.pack_into("<I", blob, 32 + 16, 7)
    with pytest.raises(ValueError, match="declares 7"):
        decode_avi(bytes(blob))


def test_avi_tolerates_unreliable_declared_frames():
    """Real-world writers (OpenDML, streamed captures) leave avih
    dwTotalFrames zero or slightly stale; the movi walk is ground truth,
    so those must decode — only a wildly-off nonzero count quarantines."""
    import struct as _s

    from machine_readability_checker_spark.core.avi import (
        decode_avi,
        encode_avi,
    )

    img = np.zeros((8, 8, 3), dtype=np.uint8)
    frames = [encode_jpeg(8, 8, 3, img.tobytes()) for _ in range(4)]
    blob = bytearray(encode_avi(8, 8, 5.0, frames))
    assert blob[24:28] == b"avih"
    # zero declared count (streamed writer): decodes, metadata says 0
    _s.pack_into("<I", blob, 32 + 16, 0)
    v = decode_avi(bytes(blob))
    assert len(v.frames) == 4 and v.declared_frames == 0
    # small drift (stale index, 3 vs 4): decodes, drift kept as metadata
    _s.pack_into("<I", blob, 32 + 16, 3)
    v = decode_avi(bytes(blob))
    assert len(v.frames) == 4 and v.declared_frames == 3


def test_interleaved_to_media_pipeline_end_to_end(spark):
    """The full multimodal path: HTML extraction produces interleaved
    media spans → media_from_spans joins the canonical spans table to a
    media store holding REAL containers (JPEG image, WAV audio, MJPEG
    AVI video) → each modality's feature kernel decodes actual bytes."""
    from machine_readability_checker_spark.core.avi import encode_avi
    from machine_readability_checker_spark.core.extract import (
        extract_document,
    )
    from machine_readability_checker_spark.core.wav import encode_wav
    from machine_readability_checker_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_audio_features,
        extract_media_features,
        extract_video_features,
        media_from_spans,
    )

    html = (
        b"<html><body><p>"
        + b"an opening paragraph long enough to classify as main content"
        + b'</p><img src="img/photo.jpg"><p>words</p>'
        + b'<img src="media/clip.wav"><img src="media/clip.avi">'
        + b"</body></html>"
    )
    doc = extract_document("d1", "html", html)
    assert doc["metrics"]["parse_errors"] == 0
    refs = [s["media_ref"] for s in doc["spans"] if s["kind"] == "media"]
    assert refs == ["img/photo.jpg", "media/clip.wav", "media/clip.avi"]

    spans_df = spark.createDataFrame(
        [("d1", doc["spans"])],
        schema="doc_id string, spans array<struct"
        "<kind:string,text:string,media_ref:string,offset:int>>",
    )

    rgb = _test_image(16, 16)
    jpg = encode_jpeg(16, 16, 3, rgb.tobytes())
    wavb = encode_wav(8000, 1, 16, np.zeros(80, dtype="<i2").tobytes())
    avib = encode_avi(16, 16, 5.0, [jpg, jpg])
    store = spark.createDataFrame(
        [
            ("d1", "img/photo.jpg", "image", bytearray(jpg)),
            ("d1", "media/clip.wav", "audio", bytearray(wavb)),
            ("d1", "media/clip.avi", "video", bytearray(avib)),
            ("d2", "img/photo.jpg", "image", bytearray(jpg)),  # other doc
        ],
        schema=MEDIA_SCHEMA,
    )
    joined = media_from_spans(spans_df, store)
    assert joined.count() == 3  # d2's blob not pulled in

    img_rows = extract_media_features(
        joined.filter("media_type = 'image'")
    ).collect()
    assert len(img_rows) == 1 and img_rows[0]["width"] == 16
    aud_rows = extract_audio_features(
        joined.filter("media_type = 'audio'")
    ).collect()
    assert len(aud_rows) == 1 and aud_rows[0]["duration_sec"] == pytest.approx(0.01)
    vid_rows = extract_video_features(
        joined.filter("media_type = 'video'")
    ).collect()
    assert len(vid_rows) == 1 and vid_rows[0]["n_frames"] == 2
