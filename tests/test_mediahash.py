"""Audio + video perceptual fingerprints (operators/mediahash.py)."""

from __future__ import annotations

import numpy as np
import pytest

from machine_readability_checker_spark.core.gif import encode_gif_animation
from machine_readability_checker_spark.core.wav import encode_wav
from machine_readability_checker_spark.operators import imagehash as IH
from machine_readability_checker_spark.operators import mediahash as MH


def _tone_pcm(freqs, sr=8000, secs=0.5, amp=0.6):
    """Concatenated pure-tone segments, one per entry of freqs, as
    16-bit PCM bytes (deterministic)."""
    segs = []
    n = int(sr * secs)
    for f in freqs:
        t = np.arange(n) / sr
        segs.append(np.sin(2 * np.pi * f * t) * amp)
    x = np.concatenate(segs)
    return (x * 32767).astype("<i2").tobytes()


_PATTERN = [200, 200, 1800, 1800, 200, 3400, 3400, 200, 900]


def _wav(bits=16, channels=1, amp=0.6):
    pcm16 = _tone_pcm(_PATTERN, amp=amp)
    x = np.frombuffer(pcm16, dtype="<i2").astype(np.float64) / 32768.0
    if bits == 16:
        frames = (x * 32767).astype("<i2")
    elif bits == 32:
        frames = (x * (2**31 - 1)).astype("<i4")
    elif bits == 8:
        frames = (np.round(x * 127) + 128).astype(np.uint8)
    else:
        raise AssertionError(bits)
    if channels == 2:
        frames = np.repeat(frames, 2)
    return encode_wav(8000, channels, bits, frames.tobytes())


def test_audio_gain_invariance():
    assert MH.audio_fingerprint(_wav(amp=0.6)) == MH.audio_fingerprint(
        _wav(amp=0.3)
    )


def test_audio_bit_depth_and_stereo_invariance():
    ref = MH.audio_fingerprint(_wav(bits=16))
    assert MH.audio_fingerprint(_wav(bits=32)) == ref
    assert MH.audio_fingerprint(_wav(bits=16, channels=2)) == ref
    # 8-bit re-quantization stays within a small Hamming distance
    d = bin(
        (MH.audio_fingerprint(_wav(bits=8)) ^ ref) & ((1 << 64) - 1)
    ).count("1")
    assert d <= 4, d


def test_audio_distinguishes_signals():
    other = encode_wav(
        8000, 1, 16, _tone_pcm(list(reversed(_PATTERN)))
    )
    a, b = MH.audio_fingerprint(_wav()), MH.audio_fingerprint(other)
    d = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    assert d > 8, d


def test_audio_short_clip_rejected():
    with pytest.raises(ValueError):
        MH.audio_fingerprint(encode_wav(8000, 1, 16, b"\x00\x01" * 20))


def _gif_of_hashes(hashes):
    """Animated GIF whose frame dHashes are exactly `hashes`."""
    frames = []
    for h in hashes:
        gray = IH.dhash_target_image(h)
        rgb = np.repeat(gray.reshape(8, 9, 1), 3, axis=2)
        frames.append(
            {"left": 0, "top": 0, "w": 9, "h": 8, "rgb": rgb.tobytes()}
        )
    return encode_gif_animation(9, 8, frames)


def test_video_fold_is_frame_majority():
    h = 0x1234_5678_9ABC_DEF0
    fold, n = MH.video_fold(_gif_of_hashes([h, h, h ^ 0b101]))
    assert n == 3
    assert fold == h  # 2-of-3 majority on every bit


def test_video_fold_even_tie_breaks_to_zero():
    fold, _ = MH.video_fold(_gif_of_hashes([0, 1]))
    assert fold == 0  # 1 vs 1 on bit 0 → tie → 0


def test_media_near_dups_pairs_within_modality_only(spark):
    h = 0x0F0F_0F0F_0F0F_0F0F
    rows = [
        ("v1", "video", bytearray(_gif_of_hashes([h, h, h]))),
        ("v2", "video", bytearray(_gif_of_hashes([h, h, h ^ 1]))),
        ("a1", "audio", bytearray(_wav(amp=0.6))),
        ("a2", "audio", bytearray(_wav(amp=0.3))),
        ("i1", "image", bytearray(
            # a still image with the same dHash as the videos must NOT
            # pair with them (modality boundary)
            __import__(
                "machine_readability_checker_spark.core.png",
                fromlist=["encode_png"],
            ).encode_png(9, 8, 1, IH.dhash_target_image(h).tobytes())
        )),
        ("bad", "audio", bytearray(b"junk")),
    ]
    df = spark.createDataFrame(
        rows, "media_ref string, media_type string, content binary"
    )
    pairs = MH.media_near_dups(df, max_hamming=4).collect()
    got = {(p.media_type, p.id_a, p.id_b, p.hamming) for p in pairs}
    assert got == {("video", "v1", "v2", 0), ("audio", "a1", "a2", 0)}


def test_media_near_dups_single_fingerprint_pass(spark):
    """The store decodes ONCE: one band join keyed on media_type, not
    one filtered branch per modality (≤2 Arrow kernels in the plan —
    the self-join's two sides; no 3x branch multiplication)."""
    df = spark.createDataFrame(
        [("a", "audio", bytearray(_wav()))],
        "media_ref string, media_type string, content binary",
    )
    plan = (
        MH.media_near_dups(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ArrowEvalPython") <= 2, plan.count("ArrowEvalPython")
    assert "Union" not in plan


def test_fingerprint_kernel_quarantines(spark):
    df = spark.createDataFrame(
        [("x", "video", bytearray(b"not a video"))],
        "media_ref string, media_type string, content binary",
    )
    row = MH.media_fingerprints(df).head()
    assert row.fingerprint is None and row.decode_error is not None
